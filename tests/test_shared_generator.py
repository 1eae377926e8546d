"""Shared-generator (gate-optimization) fast path: detection and exact
agreement with the generic per-trajectory batched path, plus non-uniform
time grids (the reference keeps general ``dt_n`` trapezoid weights,
``/root/reference/src/optimize.jl:726-750``)."""

import dataclasses

import numpy as np
import pytest

from grape_tpu import Trajectory, hamiltonian, optimize
from grape_tpu.fg import build_fg, compile_problem
from grape_tpu.functionals import J_T_sm
from grape_tpu.shapes import flattop
from grape_tpu.testing import cnot_problem, stirap_problem


def test_shared_generator_detection():
    """One generator + K basis states (gate problem) is detected; an
    ensemble with per-trajectory drift is not."""
    cz = cnot_problem()
    cp = compile_problem(cz.trajectories, cz.tlist, **cz.kwargs)
    assert cp.shared_generator

    def eps(t):
        return 0.2 * float(flattop(t, T=5, t_rise=0.3, func="blackman"))

    sz = np.array([[1, 0], [0, -1]], dtype=complex)
    sx = np.array([[0, 1], [1, 0]], dtype=complex)
    base = hamiltonian(-0.5 * sz, (sx, eps))
    shared_eps = base.terms[0][1]
    trajs = [
        Trajectory(
            [1, 0],
            hamiltonian(-0.5 * (1 + 0.01 * k) * sz, (sx, shared_eps)),
            target_state=[0, 1],
        )
        for k in range(3)
    ]
    tlist = np.linspace(0, 5, 51)
    cp2 = compile_problem(trajs, tlist, J_T=J_T_sm)
    assert not cp2.shared_generator


@pytest.mark.parametrize("method", ["gradgen", "taylor"])
def test_shared_path_matches_generic(method):
    """The K-fold-reduced shared path returns bitwise-level identical
    (J, grad) to the generic batched path — gradgen and taylor, with a
    state running cost (ξ inhomogeneity) in the mix."""
    problem = stirap_problem(lambda_b=0.4, n_steps=100)
    cp = compile_problem(
        problem.trajectories, problem.tlist, gradient_method=method,
        **problem.kwargs
    )
    assert cp.shared_generator  # single trajectory
    x = cp.guess_pulsevals.reshape(-1)
    J1, g1, _ = build_fg(cp)(x)
    cp_generic = dataclasses.replace(cp, shared_generator=False)
    J2, g2, _ = build_fg(cp_generic)(x)
    assert abs(float(J1) - float(J2)) < 1e-13
    assert np.max(np.abs(np.asarray(g1) - np.asarray(g2))) < 1e-12


def test_nonuniform_time_grid_optimization():
    """Optimization on a NON-uniform time grid: per-interval dt_n flows
    through the propagators, the trapezoid g_b weights, and the gradient;
    gradgen and taylor agree and the transfer converges."""

    def eps(t):
        return 0.2 * float(flattop(t, T=5, t_rise=0.3, func="blackman"))

    sz = np.array([[1, 0], [0, -1]], dtype=complex)
    sx = np.array([[0, 1], [1, 0]], dtype=complex)
    H = hamiltonian(-0.5 * sz, (sx, eps))
    # grid refined in the middle: dt varies by 3x across the grid
    t1 = np.linspace(0, 1.5, 76)
    t2 = np.linspace(1.5, 3.5, 301)
    t3 = np.linspace(3.5, 5.0, 76)
    tlist = np.unique(np.concatenate([t1, t2, t3]))
    assert np.diff(tlist).max() / np.diff(tlist).min() > 2.5
    traj = Trajectory([1, 0], H, target_state=[0, 1])
    res_g = optimize(
        [traj], tlist, iter_stop=5, J_T=J_T_sm,
        gradient_method="gradgen", print_iters=False,
        rethrow_exceptions=True,
    )
    res_t = optimize(
        [traj], tlist, iter_stop=5, J_T=J_T_sm,
        gradient_method="taylor", print_iters=False,
        rethrow_exceptions=True,
    )
    assert res_g.J_T < 1e-3
    assert abs(res_g.J_T - res_t.J_T) < 1e-10
    # the optimized control is defined on the same non-uniform grid
    assert len(res_g.optimized_controls[0]) == len(tlist)


def test_nonuniform_grid_gradient_matches_fd():
    """Gradient on a non-uniform grid checks out against central finite
    differences of the functional (both methods)."""
    def eps(t):
        return 0.3 * float(flattop(t, T=2, t_rise=0.2, func="blackman"))

    sz = np.array([[1, 0], [0, -1]], dtype=complex)
    sx = np.array([[0, 1], [1, 0]], dtype=complex)
    H = hamiltonian(-0.5 * sz, (sx, eps))
    rng = np.random.default_rng(3)
    ts = np.sort(rng.uniform(0.05, 1.95, size=30))
    tlist = np.concatenate([[0.0], ts, [2.0]])
    traj = Trajectory([1, 0], H, target_state=[0, 1])
    from grape_tpu.fg import build_f

    for method in ("gradgen", "taylor"):
        cp = compile_problem(
            [traj], tlist, J_T=J_T_sm, gradient_method=method
        )
        fg = build_fg(cp)
        f = build_f(cp)
        x = cp.guess_pulsevals.reshape(-1)
        _, grad, _ = fg(x)
        grad = np.asarray(grad)
        h = 1e-6
        for idx in (0, 7, 19, len(x) - 1):
            xp = x.copy(); xp[idx] += h
            xm = x.copy(); xm[idx] -= h
            fd = (float(f(xp)[0]) - float(f(xm)[0])) / (2 * h)
            assert abs(grad[idx] - fd) < 1e-7, (method, idx)


def test_envelope_bucket_policy():
    """Amplitude-envelope policy (round-2 review findings): a NEARBY box
    bound becomes the exact envelope (zero re-jits — L-BFGS-B iterates
    cannot exceed it); a LOOSE sanity bound does not over-provision the
    static orders; amplitudes beyond the bound still grow the envelope
    (optax probes / callback mutation don't depend on bound respect)."""
    from grape_tpu.workspace import GrapeWrk
    from grape_tpu.functionals import J_T_sm
    from grape_tpu.testing import tls_problem

    p = tls_problem(n_steps=50)

    def wrk_with(**kw):
        kwargs = dict(p.kwargs)
        kwargs.update(J_T=J_T_sm, gradient_method="taylor", **kw)
        return GrapeWrk(p.trajectories, p.tlist, kwargs)

    # nearby bound (guess max 0.2): envelope == bound exactly
    w1 = wrk_with(lower_bound=-0.7, upper_bound=0.7)
    assert w1._amp_bucket == (0.7,)
    w1._ensure_envelope(np.full(50, 0.69))
    assert w1._amp_bucket == (0.7,)  # within bound: no growth

    # loose sanity bound: power-of-two bucket, NOT the bound
    w2 = wrk_with(lower_bound=-50.0, upper_bound=50.0)
    assert w2._amp_bucket[0] < 1.0

    # out-of-bound amplitudes (callback mutation) grow past the cap
    w1._ensure_envelope(np.full(50, 1.5))
    assert w1._amp_bucket[0] >= 1.5
