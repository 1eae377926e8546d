"""Weak-scaling measurement over the trajectory-sharded mesh.

BASELINE.md's north star asks for ≥0.8 scaling efficiency at 2+ hosts.
The reference has no distributed story at all (its only parallelism is
``@threadsif`` shared-memory threads, ``/root/reference/src/optimize.jl:720``);
here the measurement runs the SAME sharded fg program the driver uses, at
a fixed per-device trajectory count, over growing meshes.  On real
hardware the mesh spans chips (and hosts, after
``parallel.init_distributed``); on a virtual
``--xla_force_host_platform_device_count`` CPU mesh the numbers are only a
smoke test of the code path (the "devices" share one machine).
"""

import time

import numpy as np

__all__ = ["measure_weak_scaling"]


def _ensemble_cp(K, dim, n_steps, dtype=None):
    from ..functionals import J_T_sm
    from ..fg import compile_problem
    from ..models import transmon_ensemble_trajectories

    if dim < 3:
        # TLS detuning ensemble
        from ..generators import hamiltonian
        from ..shapes import flattop
        from ..trajectory import Trajectory

        T = 5.0

        def eps(t):
            return 0.2 * float(flattop(t, T=T, t_rise=0.3, func="blackman"))

        sz = np.array([[1, 0], [0, -1]], dtype=complex)
        sx = np.array([[0, 1], [1, 0]], dtype=complex)
        base = hamiltonian(-0.5 * sz, (sx, eps))
        shared = base.terms[0][1]
        trajs = [
            Trajectory(
                [1, 0],
                hamiltonian(-0.5 * (1 + 0.01 * k) * sz, (sx, shared)),
                target_state=[0, 1],
            )
            for k in range(K)
        ]
        tlist = np.linspace(0, T, n_steps + 1)
    else:
        trajs = transmon_ensemble_trajectories(K, d=dim, T=4.0)
        tlist = np.linspace(0, 4.0, n_steps + 1)
    return compile_problem(trajs, tlist, J_T=J_T_sm, dtype=dtype)


def measure_weak_scaling(n_devices_list=(1, 2, 4, 8), traj_per_device=8,
                         dim=3, n_steps=100, n_iter=3, dtype=None):
    """Time the sharded fg program at ``K = traj_per_device · n_devices``
    for each mesh size; returns a list of dicts with ``steps_per_s`` and
    ``efficiency`` (relative to the 1-device per-device throughput)."""
    import jax

    from .mesh import build_fg_sharded, make_mesh

    rows = []
    base_per_dev = None
    for n_dev in n_devices_list:
        if n_dev > len(jax.devices()):
            break
        K = traj_per_device * n_dev
        cp = _ensemble_cp(K, dim, n_steps, dtype=dtype)
        mesh = make_mesh(n_dev)
        fg, _ = build_fg_sharded(cp, mesh)
        x = cp.guess_pulsevals.reshape(-1)
        float(fg(x)[0])  # warmup (compile; scalar transfer = hard sync)
        t0 = time.perf_counter()
        for _ in range(n_iter):
            float(fg(x)[0])
        dt = (time.perf_counter() - t0) / n_iter
        steps_per_s = K * n_steps / dt
        per_dev = steps_per_s / n_dev
        if base_per_dev is None:
            base_per_dev = per_dev
        rows.append({
            "n_devices": n_dev,
            "n_traj": K,
            "steps_per_s": steps_per_s,
            "efficiency": per_dev / base_per_dev,
        })
    return rows
