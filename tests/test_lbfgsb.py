"""Native C++ L-BFGS-B backend tests: standalone solver quality vs scipy's
Fortran L-BFGS-B, box-constraint handling, reverse-communication semantics
(callback pulse mutation, introspection), and stopping-criterion messages."""

import numpy as np
import pytest
from scipy.optimize import minimize

from grape_tpu.optimizers.lbfgsb import (
    _load, _TASK_FG, _TASK_NEW_X, _TASK_CONVERGENCE,
)


def _solve(x0, func, lower=None, upper=None, factr=1e1, pgtol=1e-9,
           maxiter=2000, m=10):
    lib = _load()
    n = len(x0)
    x = np.ascontiguousarray(x0, dtype=np.float64)
    st = lib.lbfgsb_create(n, m)
    lo = np.zeros(n)
    hi = np.zeros(n)
    nbd = np.zeros(n, dtype=np.int32)
    if lower is not None:
        lo[:] = lower
        nbd[:] += 1
    if upper is not None:
        hi[:] = upper
        nbd[:] = np.where(nbd == 1, 2, 3)
    lib.lbfgsb_set_bounds(st, lo, hi, nbd)
    f = 0.0
    g = np.zeros(n)
    iters = 0
    evals = 0
    msg = ""
    while True:
        task = lib.lbfgsb_step(st, x, f, g, factr, pgtol)
        if task == _TASK_FG:
            f, g[:] = func(x)
            evals += 1
        elif task == _TASK_NEW_X:
            iters += 1
            if iters >= maxiter:
                msg = "MAXITER"
                break
        else:
            msg = lib.lbfgsb_task_msg(st).decode()
            break
    lib.lbfgsb_destroy(st)
    return x, f, msg, iters, evals


def rosen(x):
    f = np.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)
    g = np.zeros_like(x)
    g[:-1] = -400 * x[:-1] * (x[1:] - x[:-1] ** 2) - 2 * (1 - x[:-1])
    g[1:] += 200 * (x[1:] - x[:-1] ** 2)
    return f, g


def quad(x):
    return 0.5 * np.sum(x**2), x


def test_rosenbrock_matches_scipy_quality():
    """Converge on Rosenbrock with evaluation counts comparable to the
    Fortran L-BFGS-B (scipy)."""
    for n in (10, 50):
        x, f, msg, iters, evals = _solve(np.full(n, -1.2), rosen)
        ref = minimize(
            rosen, np.full(n, -1.2), jac=True, method="L-BFGS-B",
            options={"ftol": 1e-15, "gtol": 1e-9, "maxiter": 2000},
        )
        assert f < 1e-10, (n, msg)
        assert np.max(np.abs(x - 1.0)) < 1e-5
        assert evals < 2.0 * ref.nfev, (evals, ref.nfev)


def test_bounded_matches_scipy_minimum():
    x, f, msg, iters, evals = _solve(
        np.zeros(4), rosen, lower=-2.0, upper=0.5
    )
    ref = minimize(
        rosen, np.zeros(4), jac=True, method="L-BFGS-B",
        bounds=[(-2.0, 0.5)] * 4,
        options={"ftol": 1e-15, "gtol": 1e-9},
    )
    assert abs(f - ref.fun) < 1e-8
    assert np.max(np.abs(x - ref.x)) < 1e-5
    assert np.all(x <= 0.5 + 1e-12) and np.all(x >= -2.0 - 1e-12)


def test_start_at_bound_with_outward_gradient():
    """Variables at a bound with the gradient pushing outward must stay put
    (t=0 breakpoints)."""

    def f_lin(x):
        return -np.sum(x), -np.ones_like(x)  # push everything to +inf

    x, f, msg, iters, evals = _solve(
        np.full(5, 1.0), f_lin, lower=-1.0, upper=1.0, pgtol=1e-8
    )
    assert np.allclose(x, 1.0)
    assert "NORM_OF_PROJECTED_GRADIENT" in msg


def test_pgtol_convergence_message():
    x, f, msg, iters, evals = _solve(np.arange(1.0, 6.0), quad, pgtol=1e-10)
    assert "CONVERGENCE: NORM_OF_PROJECTED_GRADIENT_<=_PGTOL" in msg
    assert f < 1e-18


def test_factr_convergence_message():
    """Loose factr stops early on relative f-reduction."""
    x, f, msg, iters, evals = _solve(
        np.full(8, -1.2), rosen, factr=1e12, pgtol=0.0
    )
    assert "REL_REDUCTION_OF_F" in msg
    # loose tolerance: must NOT have fully converged
    xt, ft, msgt, _, _ = _solve(np.full(8, -1.2), rosen, factr=1e1, pgtol=0.0)
    assert ft < f


def test_grape_callback_pulse_mutation():
    """In-callback mutation of the pulse vector takes effect on the next
    iteration (reference `test/test_iterations.jl:128-145` semantics:
    reverse communication aliases the iterate)."""
    from grape_tpu import Trajectory, hamiltonian, optimize
    from grape_tpu.functionals import J_T_sm
    from grape_tpu.shapes import flattop

    def eps(t):
        return 0.2 * float(flattop(t, T=5, t_rise=0.3, func="blackman"))

    sz = np.array([[1, 0], [0, -1]], dtype=complex)
    sx = np.array([[0, 1], [1, 0]], dtype=complex)
    H = hamiltonian(-0.5 * sz, (sx, eps))
    tlist = np.linspace(0, 5, 501)
    traj = Trajectory([1, 0], H, target_state=[0, 1])

    seen = {}

    def scale_callback(wrk, iteration):
        if iteration == 2:
            wrk.pulsevals *= 0.8
            seen["scaled_to"] = np.max(np.abs(wrk.pulsevals))
        if iteration == 3:
            # the mutation must be visible as the new guess
            seen["next_guess_max"] = np.max(np.abs(wrk.pulsevals_guess))
        return ()

    optimize(
        [traj], tlist, iter_stop=4, J_T=J_T_sm, callback=scale_callback,
        rethrow_exceptions=True, print_iters=False,
    )
    assert "scaled_to" in seen and "next_guess_max" in seen
    # guess for iter 3 is the mutated vector of iter 2 (updated by the
    # optimizer in between, but norms should reflect the x0.8 scaling
    # having been applied: the guess equals the accepted iterate which
    # started from the mutated x)
    assert seen["next_guess_max"] < 1.5 * seen["scaled_to"]


def test_grape_introspection():
    """Reference ls_info_hook invariants (`test/test_tls_optimization.jl:106-124`):
    for iter > 1, pulse_update ≈ α · search_direction."""
    from grape_tpu import (
        Trajectory, hamiltonian, optimize, pulse_update, search_direction,
        step_width, vec_angle,
    )
    from grape_tpu.functionals import J_T_sm
    from grape_tpu.shapes import flattop

    def eps(t):
        return 0.2 * float(flattop(t, T=5, t_rise=0.3, func="blackman"))

    sz = np.array([[1, 0], [0, -1]], dtype=complex)
    sx = np.array([[0, 1], [1, 0]], dtype=complex)
    H = hamiltonian(-0.5 * sz, (sx, eps))
    tlist = np.linspace(0, 5, 501)
    traj = Trajectory([1, 0], H, target_state=[0, 1])

    checks = []

    def hook(wrk, iteration):
        if iteration > 1:
            du = pulse_update(wrk)
            s = search_direction(wrk)
            alpha = step_width(wrk)
            checks.append(
                (np.abs(vec_angle(du, s)), np.linalg.norm(du - alpha * s))
            )
        return ()

    optimize(
        [traj], tlist, iter_stop=4, J_T=J_T_sm, callback=hook,
        rethrow_exceptions=True, print_iters=False,
    )
    assert len(checks) >= 2
    for angle, resid in checks:
        assert angle < 1e-8
        assert resid < 1e-8


def test_lbfgsb_trace_output(capsys):
    """lbfgsb_iprint=100 dumps a per-iteration optimizer trace
    (`ext/GRAPELBFGSBExt.jl:29-30,150-192` analog)."""
    from grape_tpu import Trajectory, hamiltonian, optimize
    from grape_tpu.functionals import J_T_sm
    from grape_tpu.shapes import flattop

    def eps(t):
        return 0.2 * float(flattop(t, T=5, t_rise=0.3, func="blackman"))

    sz = np.array([[1, 0], [0, -1]], dtype=complex)
    sx = np.array([[0, 1], [1, 0]], dtype=complex)
    H = hamiltonian(-0.5 * sz, (sx, eps))
    tlist = np.linspace(0, 5, 101)
    traj = Trajectory([1, 0], H, target_state=[0, 1])
    optimize(
        [traj], tlist, iter_stop=2, J_T=J_T_sm, lbfgsb_iprint=100,
        rethrow_exceptions=True, print_iters=False,
    )
    out = capsys.readouterr().out
    # annotated internals dump (the reference's isave/dsave analog)
    assert "end of task loop: FG -> NEW_X" in out
    assert "number of the current iteration" in out
    assert "relative step length in the line search" in out
    assert "infinity norm of the projected gradient" in out
    assert "free variables at the Cauchy point" in out
    assert "limited-memory (s, y) pairs currently stored" in out
