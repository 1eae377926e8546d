"""Heterogeneous ensembles through the public API.

The reference accepts arbitrary per-trajectory generators (each trajectory
owns its propagators, ``/root/reference/src/workspace.jl:221-233``).  The
batched TPU design handles this two ways, both automatic in
``compile_problem`` (VERDICT round-2 item 3):

- differing term STRUCTURES (e.g. a crosstalk drive on some members) are
  auto-aligned to the amplitude union with zero-operator padding;
- differing amplitude SHAPES over the same control become per-trajectory
  coefficient tables ``M (K, N_T, T, L)`` (no operator-array blowup).
"""

import numpy as np
import jax
import pytest

from grape_tpu import (
    CustomAmplitude, ShapedAmplitude, Trajectory, hamiltonian, optimize,
)
from grape_tpu.fg import build_f, build_fg, compile_problem
from grape_tpu.functionals import J_T_sm
from grape_tpu.parallel import make_mesh

sx = np.array([[0, 1], [1, 0]], dtype=complex)
sy = np.array([[0, -1j], [1j, 0]], dtype=complex)
sz = np.array([[1, 0], [0, -1]], dtype=complex)


def _per_traj_shape_problem(n_steps=40, K=2):
    """K trajectories sharing ONE control but with per-trajectory
    amplitude shapes (e.g. per-qubit drive-line transfer functions)."""

    def eps(t):
        return 0.4 * np.sin(np.pi * t / 3.0)

    shapes = [
        (lambda t, k=k: float(np.sin(np.pi * t / 3.0) ** 2) * (1 + 0.2 * k))
        for k in range(K)
    ]
    trajs = [
        Trajectory(
            [1, 0],
            hamiltonian(
                -0.5 * (1 + 0.05 * k) * sz,
                (sx, ShapedAmplitude(eps, shapes[k])),
            ),
            target_state=[0, 1],
        )
        for k in range(K)
    ]
    tlist = np.linspace(0.0, 3.0, n_steps + 1)
    return trajs, tlist


@pytest.mark.parametrize("gradient_method", ["taylor", "gradgen"])
def test_per_traj_shapes_gradient(gradient_method):
    """Per-trajectory shape tables: compile succeeds (per_traj_coeffs) and
    the gradient agrees with 4th-order finite differences to 1e-10."""
    trajs, tlist = _per_traj_shape_problem()
    cp = compile_problem(
        trajs, tlist, J_T=J_T_sm, gradient_method=gradient_method
    )
    assert cp.per_traj_coeffs
    assert cp.M.shape == (2, cp.n_timesteps, 1, 1)
    fg = build_fg(cp)
    f = build_f(cp)
    rng = np.random.default_rng(3)
    x = 0.5 * rng.normal(size=cp.n_timesteps)
    _, G, _ = fg(x)
    G = np.asarray(G, dtype=np.float64)

    def J_of(xv):
        return float(f(xv)[0])

    for i in rng.choice(len(x), size=10, replace=False):
        e = np.zeros_like(x)
        e[i] = 1.0
        h = 1e-4
        fd = (
            8.0 * (J_of(x + h * e) - J_of(x - h * e))
            - (J_of(x + 2 * h * e) - J_of(x - 2 * h * e))
        ) / (12.0 * h)
        assert abs(G[i] - fd) < 1e-10, (i, G[i], fd)


@pytest.mark.parametrize("gradient_method", ["taylor", "gradgen"])
def test_per_traj_shapes_scan_fallback(gradient_method):
    """The per-step scan backward paths also honor per-trajectory
    coefficient tables."""
    trajs, tlist = _per_traj_shape_problem(n_steps=25)
    cp = compile_problem(
        trajs, tlist, J_T=J_T_sm, gradient_method=gradient_method,
        vectorize_backward=False, reuse_propagators=False,
    )
    assert cp.per_traj_coeffs
    cp_v = compile_problem(
        trajs, tlist, J_T=J_T_sm, gradient_method=gradient_method
    )
    rng = np.random.default_rng(5)
    x = 0.5 * rng.normal(size=cp.n_timesteps)
    J1, G1, _ = build_fg(cp)(x)
    J2, G2, _ = build_fg(cp_v)(x)
    np.testing.assert_allclose(float(J1), float(J2), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(G1), np.asarray(G2), atol=1e-10
    )


def test_per_traj_shapes_match_operator_encoding():
    """A per-trajectory CONSTANT shape factor is equivalent to scaling the
    operator: both encodings must give identical J and gradient."""

    def eps(t):
        return 0.3

    scales = [1.0, 1.5]
    trajs_shape = [
        Trajectory(
            [1, 0],
            hamiltonian(
                -0.5 * sz, (sx, ShapedAmplitude(eps, lambda t, s=s: s))
            ),
            target_state=[0, 1],
        )
        for s in scales
    ]
    trajs_op = [
        Trajectory(
            [1, 0], hamiltonian(-0.5 * sz, (s * sx, eps)),
            target_state=[0, 1],
        )
        for s in scales
    ]
    tlist = np.linspace(0.0, 3.0, 31)
    cp_shape = compile_problem(trajs_shape, tlist, J_T=J_T_sm)
    cp_op = compile_problem(trajs_op, tlist, J_T=J_T_sm)
    assert cp_shape.per_traj_coeffs and not cp_op.per_traj_coeffs
    rng = np.random.default_rng(11)
    x = 0.4 * rng.normal(size=cp_shape.n_timesteps)
    J1, G1, _ = build_fg(cp_shape)(x)
    J2, G2, _ = build_fg(cp_op)(x)
    np.testing.assert_allclose(float(J1), float(J2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(G1), np.asarray(G2), atol=1e-12)


def test_crosstalk_ensemble_optimizes_no_manual_step():
    """VERDICT item-3 done criterion: an ensemble where only some members
    carry a crosstalk term optimizes through the public API with no
    manual step."""

    def eps(t):
        return 0.3

    def crosstalk(t):
        return 0.02

    gens = [
        hamiltonian(-0.5 * sz, (sx, eps)),
        hamiltonian(-0.51 * sz, (sx, eps), (sy, crosstalk)),
        hamiltonian(-0.49 * sz, (sx, eps)),
        hamiltonian(-0.5 * sz, (sx, eps), (sy, crosstalk)),
    ]
    trajs = [
        Trajectory([1, 0], g, target_state=[0, 1]) for g in gens
    ]
    tlist = np.linspace(0, 5, 201)
    res = optimize(
        trajs, tlist, iter_stop=15, J_T=J_T_sm,
        rethrow_exceptions=True, print_iters=False,
    )
    assert res.J_T < 1e-2


def test_heterogeneous_sharded_matches_single_device():
    """Heterogeneous ensemble (auto-aligned structure + per-trajectory
    shapes) under optimize(mesh=...): J_T trace ≡ single-device."""
    assert len(jax.devices()) >= 8

    def eps(t):
        return 0.3

    def crosstalk(t):
        return 0.02

    gens = []
    for k in range(8):
        parts = [-0.5 * (1 + 0.01 * k) * sz,
                 (sx, ShapedAmplitude(eps, lambda t, k=k: 1.0 + 0.05 * k))]
        if k % 2:
            parts.append((sy, crosstalk))
        gens.append(hamiltonian(*parts))
    trajs = [
        Trajectory([1, 0], g, target_state=[0, 1]) for g in gens
    ]
    tlist = np.linspace(0, 5, 101)
    kwargs = dict(
        iter_stop=5, J_T=J_T_sm, print_iters=False,
        rethrow_exceptions=True,
    )
    trace1, trace2 = [], []

    def cb(store):
        return lambda wrk, it: store.append(wrk.result.J_T)

    res1 = optimize(trajs, tlist, callback=cb(trace1), **kwargs)
    res2 = optimize(
        trajs, tlist, mesh=make_mesh(8), callback=cb(trace2), **kwargs
    )
    assert res1.J_T < 0.5
    np.testing.assert_allclose(trace2, trace1, rtol=0, atol=1e-12)


@pytest.mark.parametrize("gradient_method", ["taylor", "gradgen"])
def test_per_traj_shapes_with_custom_amplitude(gradient_method):
    """Per-trajectory linear shapes composed with a shared nonlinear
    amplitude slot: gradient vs finite differences."""

    def eps(t):
        return 0.3

    def eps2(t):
        return 0.2

    amp = CustomAmplitude(lambda v, t: v[0] ** 2, eps2)
    trajs = [
        Trajectory(
            [1, 0],
            hamiltonian(
                -0.5 * sz,
                (sx, ShapedAmplitude(eps, lambda t, s=s: s)),
                (sy, amp),
            ),
            target_state=[0, 1],
        )
        for s in (1.0, 1.3)
    ]
    tlist = np.linspace(0.0, 3.0, 31)
    cp = compile_problem(
        trajs, tlist, J_T=J_T_sm, gradient_method=gradient_method
    )
    assert cp.per_traj_coeffs and cp.custom_terms
    fg = build_fg(cp)
    f = build_f(cp)
    rng = np.random.default_rng(13)
    x = 0.4 * rng.normal(size=2 * cp.n_timesteps)
    _, G, _ = fg(x)
    G = np.asarray(G, dtype=np.float64)

    def J_of(xv):
        return float(f(xv)[0])

    for i in rng.choice(len(x), size=10, replace=False):
        e = np.zeros_like(x)
        e[i] = 1.0
        h = 1e-4
        fd = (
            8.0 * (J_of(x + h * e) - J_of(x - h * e))
            - (J_of(x + 2 * h * e) - J_of(x - 2 * h * e))
        ) / (12.0 * h)
        assert abs(G[i] - fd) < 1e-10, (i, G[i], fd)


def test_per_trajectory_prop_settings():
    """Per-trajectory propagator settings (reference resolves
    ``prop_method`` etc. from trajectory attributes,
    `/root/reference/src/workspace.jl:216-233`, spec
    `src/docstring.jl:201-225`): a UNIFORM trajectory attribute is
    honored; heterogeneous (or partial) settings raise a clear
    NotImplementedError — the TPU build batches all trajectories through
    one program (documented deviation) — and a conflict with the global
    kwarg raises ValueError."""
    import pytest

    from grape_tpu import Trajectory, hamiltonian
    from grape_tpu.fg import compile_problem
    from grape_tpu.functionals import J_T_sm

    sz = np.array([[1, 0], [0, -1]], dtype=complex)
    sx = np.array([[0, 1], [1, 0]], dtype=complex)

    def eps(t):
        return 0.2 * np.cos(t)

    def mk(**kw):
        return Trajectory(
            [1, 0], hamiltonian(-0.5 * sz, (sx, eps)),
            target_state=[0, 1], **kw
        )

    tlist = np.linspace(0, 2, 11)

    # uniform attribute: adopted
    cp = compile_problem(
        [mk(prop_method="cheby"), mk(prop_method="cheby")], tlist,
        J_T=J_T_sm,
    )
    assert cp.fw_prop_method == "cheby"

    # heterogeneous: rejected with the documented deviation
    with pytest.raises(NotImplementedError, match="per-trajectory"):
        compile_problem(
            [mk(prop_method="cheby"), mk(prop_method="expprop")], tlist,
            J_T=J_T_sm,
        )
    # partial (some trajectories carry it, some not): rejected when the
    # carried value differs from what the others resolve to ...
    with pytest.raises(NotImplementedError, match="per-trajectory"):
        compile_problem(
            [mk(fw_prop_method="cheby"), mk()], tlist, J_T=J_T_sm,
        )
    # ... but accepted when it matches the effective default (all
    # trajectories resolve to the same method — homogeneous in effect)
    cp_part = compile_problem(
        [mk(prop_method="expprop"), mk()], tlist, J_T=J_T_sm,
    )
    assert cp_part.fw_prop_method == "expprop"
    cp_part2 = compile_problem(
        [mk(fw_prop_method="cheby"), mk()], tlist, J_T=J_T_sm,
        prop_method="cheby",
    )
    assert cp_part2.fw_prop_method == "cheby"
    # conflict with the global kwarg
    with pytest.raises(ValueError, match="conflicts with"):
        compile_problem(
            [mk(prop_method="cheby"), mk(prop_method="cheby")], tlist,
            J_T=J_T_sm, prop_method="expprop",
        )


def test_heterogeneous_prop_methods_grouped_compile():
    """Round 5 (VERDICT round-4 missing #1 / next #6): mixed
    per-trajectory propagator METHODS now optimize via the grouped
    compile — trajectories partition by effective settings, each
    partition runs its own propagators, and J_T/χ/gradient assemble
    globally.  The gradient agrees with the uniform all-ExpProp and
    all-Cheby builds, and a full mixed optimization converges
    (reference: per-trajectory propagator initialization,
    /root/reference/src/workspace.jl:216-233)."""
    import pytest

    from grape_tpu import Trajectory, hamiltonian, optimize
    from grape_tpu.fg import build_fg, compile_problem
    from grape_tpu.fg_hetero import (
        compile_heterogeneous, traj_prop_partition,
    )
    from grape_tpu.functionals import J_T_sm

    sz = np.array([[1, 0], [0, -1]], dtype=complex)
    sx = np.array([[0, 1], [1, 0]], dtype=complex)

    def eps(t):
        return 0.2 * np.cos(t)

    def mk(**kw):
        return Trajectory(
            [1, 0], hamiltonian(-0.5 * sz, (sx, eps)),
            target_state=[0, 1], **kw
        )

    tlist = np.linspace(0, 4, 41)
    trajs = [mk(prop_method="cheby"), mk(prop_method="expprop"), mk()]
    kw = {"J_T": J_T_sm}

    partition = traj_prop_partition(trajs, kw)
    assert partition is not None and len(partition) == 2
    hp = compile_heterogeneous(trajs, tlist, partition, **kw)
    assert len(hp.parts) == 2
    fg_h = build_fg(hp)  # dispatches to the hetero builder
    x = hp.guess_pulsevals.reshape(-1)
    J_h, g_h, aux_h = fg_h(x)

    # uniform reference builds (the problem is physically identical per
    # trajectory, so all-expprop and all-cheby must both agree)
    for method in ("expprop", "cheby"):
        cp_u = compile_problem(
            [mk(), mk(), mk()], tlist, prop_method=method, **kw
        )
        J_u, g_u, _ = build_fg(cp_u)(x)
        assert abs(float(J_h) - float(J_u)) < 1e-11, (method, J_h, J_u)
        scale = max(np.max(np.abs(np.asarray(g_u))), 1e-12)
        assert np.max(
            np.abs(np.asarray(g_h) - np.asarray(g_u))
        ) < 1e-9 * scale, method

    # full mixed optimization through the driver
    res = optimize(
        trajs, tlist, J_T=J_T_sm, iter_stop=5, print_iters=False,
        rethrow_exceptions=True,
    )
    assert res.J_T < 1e-3


def test_heterogeneous_grouped_compile_gradient_methods():
    """Mixed prop settings × both gradient methods agree (the
    reference's gradgen-vs-taylor anchor applied to the grouped
    compile)."""
    from grape_tpu import Trajectory, hamiltonian
    from grape_tpu.fg import build_fg
    from grape_tpu.fg_hetero import (
        compile_heterogeneous, traj_prop_partition,
    )
    from grape_tpu.functionals import J_T_re

    rng = np.random.default_rng(3)
    d = 6
    A = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    H0 = 0.2 * (A + A.conj().T)
    B = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    Hc = 0.2 * (B + B.conj().T)

    def eps(t):
        return 0.15 * np.sin(t)

    def mk(**kw):
        p0 = np.zeros(d, complex); p0[0] = 1
        tg = np.zeros(d, complex); tg[1] = 1
        return Trajectory(
            p0, hamiltonian(H0, (Hc, eps)), target_state=tg, **kw
        )

    tlist = np.linspace(0, 3, 31)
    trajs = [mk(fw_prop_method="cheby", bw_prop_method="cheby"), mk()]
    kw = {"J_T": J_T_re}
    partition = traj_prop_partition(trajs, kw)
    assert partition is not None
    grads = {}
    for method in ("taylor", "gradgen"):
        hp = compile_heterogeneous(
            trajs, tlist, partition, gradient_method=method, **kw
        )
        x = hp.guess_pulsevals.reshape(-1)
        _, g, _ = build_fg(hp)(x)
        grads[method] = np.asarray(g)
    scale = max(np.max(np.abs(grads["taylor"])), 1e-12)
    assert np.max(
        np.abs(grads["taylor"] - grads["gradgen"])
    ) < 1e-9 * scale
