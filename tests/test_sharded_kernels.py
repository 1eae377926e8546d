"""Pallas kernels under mesh sharding (VERDICT round-3 item 2).

``optimize(mesh=...)`` builds previously dropped every Pallas kernel
(a Mosaic custom call has no GSPMD partitioning rule); the kernel
invocations now wrap themselves in per-call ``shard_map`` islands over
the trajectory axis (``fg._shmap``), so each shard runs the kernel on
its local trajectory block while the surrounding program stays
GSPMD-partitioned.  These tests assert on the 8-device virtual CPU mesh
(kernels in interpreter mode via ``use_pallas=True``):

- the sharded jaxpr demonstrably invokes the kernels (``pallas_call``
  inside a ``shard_map`` eqn), and
- the sharded (J, gradient) matches the unsharded build.

Reference anchor for the parallelized reduction: the ``Σ_k`` gradient
sum, ``/root/reference/src/optimize.jl:574-584``.
"""

import numpy as np
import jax
import pytest

from grape_tpu import Trajectory, hamiltonian
from grape_tpu.fg import build_fg, compile_problem
from grape_tpu.functionals import J_T_sm
from grape_tpu.parallel import build_fg_sharded, make_mesh
from grape_tpu.shapes import flattop


def _gate_problem(K=4, d=8):
    """Shared-generator problem: one random H, K basis states."""
    rng = np.random.default_rng(42)

    def eps(t):
        return 0.2 * float(flattop(t, T=4, t_rise=0.5, func="blackman"))

    A = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    H0 = 0.15 * (A + A.conj().T)
    B = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    Hc = 0.2 * (B + B.conj().T)
    gen = hamiltonian(H0, (Hc, eps))
    U_tgt = np.linalg.qr(
        rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    )[0]
    trajs = []
    for k in range(K):
        e_k = np.zeros(d, complex)
        e_k[k] = 1.0
        trajs.append(Trajectory(e_k, gen, target_state=U_tgt[:, k]))
    tlist = np.linspace(0, 4, 17)
    return trajs, tlist


def _ensemble_problem(K=8, d=16):
    """Per-trajectory generators: K distinct drifts, one shared control."""
    rng = np.random.default_rng(7)

    def eps(t):
        return 0.2 * np.cos(0.7 * t)

    B = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    Hc = 0.2 * (B + B.conj().T)
    trajs = []
    for k in range(K):
        A = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
        H0 = 0.15 * (A + A.conj().T) * (1 + 0.03 * k)
        p0 = np.zeros(d, complex)
        p0[0] = 1.0
        tg = np.zeros(d, complex)
        tg[1] = 1.0
        trajs.append(
            Trajectory(p0, hamiltonian(H0, (Hc, eps)), target_state=tg)
        )
    tlist = np.linspace(0, 3, 13)
    return trajs, tlist


@pytest.mark.parametrize(
    "problem,kernel_kind",
    [(_gate_problem, "shared"), (_ensemble_problem, "pertraj")],
)
def test_sharded_fg_invokes_kernels_and_matches(problem, kernel_kind):
    trajs, tlist = problem()
    n_dev = 4
    assert len(jax.devices()) >= n_dev
    mesh = make_mesh(n_dev)
    kwargs = dict(
        J_T=J_T_sm, gradient_method="gradgen", dtype=np.complex64,
        use_pallas=True,
    )
    cp = compile_problem(trajs, tlist, **kwargs)
    x = cp.guess_pulsevals.reshape(-1)

    # unsharded kernel build (interpret mode on CPU)
    J0, g0, _ = build_fg(cp)(x)
    # unsharded pure-XLA build (independent numeric reference)
    cp_x = compile_problem(trajs, tlist, **{
        **kwargs, "use_pallas": False,
    })
    Jx, gx, _ = build_fg(cp_x)(x)

    fg_sh, cp_sh = build_fg_sharded(cp, mesh)
    assert cp_sh.mesh is mesh

    # the sharded program demonstrably invokes the Pallas kernels: the
    # jaxpr contains pallas_call eqns inside shard_map islands
    jaxpr_str = str(jax.make_jaxpr(lambda p: fg_sh(p)[:2])(x))
    assert "pallas_call" in jaxpr_str
    assert "shard_map" in jaxpr_str

    J1, g1, _ = fg_sh(x)
    g0, g1, gx = np.asarray(g0), np.asarray(g1), np.asarray(gx)
    gs = max(np.max(np.abs(gx)), 1e-12)
    # sharded kernel build == unsharded kernel build (same kernels, the
    # only difference is the psum reduction order)
    assert abs(float(J1) - float(J0)) < 1e-6 * max(1.0, abs(float(J0)))
    assert np.max(np.abs(g1 - g0)) < 1e-5 * gs
    # and both agree with the independent XLA path
    assert abs(float(J1) - float(Jx)) < 1e-4 * max(1.0, abs(float(Jx)))
    assert np.max(np.abs(g1 - gx)) < 2e-3 * gs


def test_sharded_xla_fallback_unchanged():
    """``use_pallas=False`` sharded builds contain no kernel calls (the
    pre-existing GSPMD path is untouched)."""
    trajs, tlist = _gate_problem()
    mesh = make_mesh(4)
    cp = compile_problem(
        trajs, tlist, J_T=J_T_sm, gradient_method="gradgen",
        dtype=np.complex64, use_pallas=False,
    )
    fg_sh, _ = build_fg_sharded(cp, mesh)
    x = cp.guess_pulsevals.reshape(-1)
    jaxpr_str = str(jax.make_jaxpr(lambda p: fg_sh(p)[:2])(x))
    assert "pallas_call" not in jaxpr_str


def test_sharded_grouped_ensemble_matches():
    """Grouped-generator kernels under the mesh: when shard boundaries
    respect the groups (K_loc % group_size == 0) the grouped kernels run
    per shard; when they would straddle a group the build falls back to
    ungrouped gracefully — both match the unsharded build."""
    from grape_tpu.fg import _effective_group_size
    from grape_tpu.models import two_transmon_cz_ensemble_problem
    from grape_tpu.parallel import shard_problem

    problem = two_transmon_cz_ensemble_problem(
        n_samples=4, d=4, T=3.0, n_steps=12,
    )  # K=16, groups of 4, dim=16
    kwargs = dict(
        dtype=np.complex64, gradient_method="gradgen", use_pallas=True,
    )
    cp = compile_problem(
        problem.trajectories, problem.tlist, **kwargs, **problem.kwargs
    )
    assert cp.gen_group_size == 4
    x = cp.guess_pulsevals.reshape(-1)
    J0, g0, _ = build_fg(cp)(x)

    # groups divide shards: grouped kernels active per shard
    mesh4 = make_mesh(4)
    cp4 = shard_problem(cp, mesh4)
    assert _effective_group_size(cp4) == 4  # K_loc = 4 per shard
    fg4, _ = build_fg_sharded(cp, mesh4)
    J4, g4, _ = fg4(x)

    # groups straddle shards (K_loc = 2 < group_size): graceful fallback
    mesh8 = make_mesh(8)
    cp8 = shard_problem(cp, mesh8)
    assert _effective_group_size(cp8) == 1
    fg8, _ = build_fg_sharded(cp, mesh8)
    J8, g8, _ = fg8(x)

    g0 = np.asarray(g0)
    gs_ = max(np.max(np.abs(g0)), 1e-12)
    for J, g in ((J4, g4), (J8, g8)):
        assert abs(float(J) - float(J0)) < 1e-5 * max(1, abs(float(J0)))
        assert np.max(np.abs(np.asarray(g) - g0)) < 1e-4 * gs_
