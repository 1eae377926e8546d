"""Multi-chip trajectory parallelism.

The reference's only parallel strategy is shared-memory trajectory
parallelism (``@threadsif wrk.use_threads for k = 1:N`` around the
forward/backward loops, ``/root/reference/src/optimize.jl:720,876`` and the
serial ``Σ_k`` gradient reduction at ``src/optimize.jl:574-584``).  The
TPU-native counterpart shards the trajectory axis ``K`` over a
``jax.sharding.Mesh``:

- all per-trajectory arrays (``psi0``, ``H0``, ``ops``, forward storage,
  co-states, ``tau_grads``) carry a ``P('traj')`` sharding on their ``K``
  axis, so each chip propagates its shard of the ensemble;
- the cross-trajectory reductions (``Σ_k ∇τ_knl``, ``J_parts``, ``tau``)
  lower to ``psum``/``all-reduce`` collectives over ICI (DCN across hosts),
  inserted by XLA's SPMD partitioner from the sharding annotations;
- the pulse vector is replicated: the host-side L-BFGS-B consumes the fully
  reduced gradient, exactly mirroring where the reference splits work
  between ``fg!`` and the Fortran ``setulb`` loop.

Works identically on a virtual CPU mesh
(``--xla_force_host_platform_device_count``) and a real TPU slice.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fg import CompiledProblem, build_fg
from ..trajectory import Trajectory

__all__ = [
    "make_mesh", "shard_problem", "build_fg_sharded", "ensemble_trajectories",
]


def make_mesh(n_devices=None, axis="traj", devices=None):
    """A 1D device mesh over the trajectory axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_problem(cp: CompiledProblem, mesh, axis="traj"):
    """Place the per-trajectory arrays of a compiled problem on `mesh`,
    sharded along ``K``.  ``K`` must be divisible by the mesh size."""
    n_dev = mesh.devices.size
    if cp.n_traj % n_dev != 0:
        raise ValueError(
            f"number of trajectories ({cp.n_traj}) must be divisible by "
            f"the mesh size ({n_dev}); pad the ensemble with zero-weight "
            f"trajectories"
        )
    traj_sharding = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    import dataclasses

    return dataclasses.replace(
        cp,
        psi0=jax.device_put(cp.psi0, traj_sharding),
        H0=jax.device_put(cp.H0, traj_sharding),
        ops=jax.device_put(cp.ops, traj_sharding),
        M=jax.device_put(cp.M, repl),
        tlist=jax.device_put(cp.tlist, repl),
    )


def build_fg_sharded(cp: CompiledProblem, mesh, axis="traj", amp_max=None):
    """The jitted fg program with explicit shardings: pulse vector
    replicated in, ``(J, grad)`` fully reduced (replicated) out.  XLA's SPMD
    partitioner propagates the ``P('traj')`` sharding of the problem arrays
    through the scans and inserts the cross-trajectory ``psum`` collectives
    for the ``Σ_k`` reductions."""
    cp = shard_problem(cp, mesh, axis=axis)
    fg = build_fg(cp, amp_max=amp_max)
    repl = NamedSharding(mesh, P())

    fg_sharded = jax.jit(
        lambda pulsevals: fg(pulsevals),
        in_shardings=repl,
        out_shardings=(repl, repl, None),
    )
    return fg_sharded, cp


def ensemble_trajectories(base_trajectory, generators, weights=None):
    """Build an ensemble (robustness-sampling) trajectory list: the same
    initial/target states evolving under perturbed generators — the
    reference's 'ensemble optimization' pattern (docs/src/tutorial.md)."""
    K = len(generators)
    if weights is None:
        weights = [1.0] * K
    return [
        Trajectory(
            base_trajectory.initial_state,
            gen,
            target_state=base_trajectory.target_state,
            weight=w,
        )
        for gen, w in zip(generators, weights)
    ]
