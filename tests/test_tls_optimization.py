"""End-to-end TLS optimization tests (port of the reference's
``test/test_tls_optimization.jl``): standalone API, ControlProblem API,
gradgen-vs-taylor agreement, box bounds, warm-restart continuation."""

import numpy as np
import pytest

from grape_tpu import (
    ControlProblem, Trajectory, hamiltonian, optimize, optimize_problem,
)
from grape_tpu.functionals import J_T_sm
from grape_tpu.shapes import flattop


def guess_eps(t):
    return 0.2 * float(flattop(t, T=5, t_rise=0.3, func="blackman"))


def tls_hamiltonian(Omega=1.0, eps=guess_eps):
    sz = np.array([[1, 0], [0, -1]], dtype=complex)
    sx = np.array([[0, 1], [1, 0]], dtype=complex)
    return hamiltonian(-0.5 * Omega * sz, (sx, eps))


@pytest.fixture
def tls_setup():
    H = tls_hamiltonian()
    tlist = np.linspace(0, 5, 501)
    traj = Trajectory([1, 0], H, target_state=[0, 1])
    return [traj], tlist


def test_grape_optimize(tls_setup, capsys):
    """Reference anchor (`test/test_tls_optimization.jl:159,169-170`):
    J_T < 1e-3 after ≤5 iterations; max|ε_opt| ∈ (0.75, 0.85)."""
    trajectories, tlist = tls_setup
    res = optimize(
        trajectories, tlist, iter_stop=5, J_T=J_T_sm,
        rethrow_exceptions=True,
    )
    assert res.J_T < 1e-3
    assert 0.75 < np.max(np.abs(res.optimized_controls[0])) < 0.85
    assert res.iter == 5
    assert res.converged
    out = capsys.readouterr().out
    assert "iter." in out and "J_T" in out  # info table printed


def test_control_problem_api(tls_setup):
    trajectories, tlist = tls_setup
    problem = ControlProblem(
        trajectories, tlist, iter_stop=5, J_T=J_T_sm,
        rethrow_exceptions=True, print_iters=False,
    )
    res = optimize_problem(problem)
    assert res.J_T < 1e-3


def test_taylor_vs_gradgen(tls_setup):
    """Reference anchor (`test/test_tls_optimization.jl:229`):
    |ΔJ_T| < 1e-10 between the two gradient methods."""
    trajectories, tlist = tls_setup
    common = dict(
        iter_stop=5, J_T=J_T_sm, rethrow_exceptions=True, print_iters=False,
    )
    res_gradgen = optimize(
        trajectories, tlist, gradient_method="gradgen", **common
    )
    res_taylor = optimize(
        trajectories, tlist, gradient_method="taylor", **common
    )
    assert res_gradgen.J_T < 1e-3
    assert abs(res_gradgen.J_T - res_taylor.J_T) < 1e-10


def test_bounds(tls_setup):
    """Reference anchor (`test/test_tls_optimization.jl:247-260`): with box
    bounds ±0.7, J_T < 1e-3 in 10 iterations and max|ε| ≤ 0.700001."""
    trajectories, tlist = tls_setup
    res = optimize(
        trajectories, tlist, iter_stop=10, J_T=J_T_sm,
        lower_bound=-0.7, upper_bound=0.7,
        rethrow_exceptions=True, print_iters=False,
    )
    assert res.J_T < 1e-3
    amax = np.max(np.abs(res.optimized_controls[0]))
    assert 0.65 < amax <= 0.700001


def test_continue_from(tls_setup):
    """Warm restart via `continue_from` continues reducing J_T."""
    trajectories, tlist = tls_setup
    res1 = optimize(
        trajectories, tlist, iter_stop=2, J_T=J_T_sm,
        rethrow_exceptions=True, print_iters=False,
    )
    J_T_1 = res1.J_T
    iter_1 = res1.iter
    # NOTE: like the reference (src/workspace.jl:167-186), continue_from
    # adopts (and further mutates) the passed result object.
    res2 = optimize(
        trajectories, tlist, iter_stop=4, J_T=J_T_sm,
        continue_from=res1, rethrow_exceptions=True, print_iters=False,
    )
    assert iter_1 == 2
    assert res2.J_T < J_T_1
    assert res2.iter <= 4


def test_guess_pulse_immutability(tls_setup):
    """The guess control must not be mutated by the optimization
    (`test/test_pulse_optimization.jl:36-44`)."""
    trajectories, tlist = tls_setup
    guess_before = np.array([guess_eps(t) for t in tlist])
    res = optimize(
        trajectories, tlist, iter_stop=3, J_T=J_T_sm,
        rethrow_exceptions=True, print_iters=False,
    )
    assert np.allclose(res.guess_controls[0], guess_before)
    assert not np.allclose(res.optimized_controls[0], guess_before)


def test_continue_from_other_method(tls_setup):
    """Cross-method continuation: `continue_from` accepts a result-like
    object from a different optimization method (the reference's
    Krotov→GRAPE continuation, `test/test_tls_optimization.jl:417-482` /
    `src/result.jl:137-147`)."""

    class OtherMethodResult:
        """Duck-typed result from some other optimizer (e.g. Krotov)."""

        def __init__(self, tlist, optimized_controls, J_T, iteration):
            self.tlist = tlist
            self.optimized_controls = optimized_controls
            self.J_T = J_T
            self.J_T_prev = 1.0
            self.iter = iteration
            self.message = "converged by other method"
            self.converged = True
            self.records = [("other", 1)]

    trajectories, tlist = tls_setup
    # pretend another method produced a mildly improved pulse
    improved = np.array([1.5 * guess_eps(t) for t in tlist])
    other = OtherMethodResult(tlist, [improved], J_T=0.5, iteration=7)
    res = optimize(
        trajectories, tlist, iter_stop=12, J_T=J_T_sm,
        continue_from=other, rethrow_exceptions=True, print_iters=False,
    )
    assert res.J_T < 1e-3          # GRAPE continues from the warm start
    assert res.iter > 7            # iteration numbering continues
    # the other method's records are preserved (record continuity)
    assert res.records[0] == ("other", 1)
    # and the warm-start pulse IS the optimization's starting point:
    from grape_tpu.controls import discretize_on_midpoints
    from grape_tpu.workspace import GrapeWrk

    other2 = OtherMethodResult(tlist, [improved], J_T=0.5, iteration=7)
    wrk = GrapeWrk(trajectories, tlist, dict(J_T=J_T_sm,
                                             continue_from=other2))
    assert np.allclose(
        wrk.pulsevals, discretize_on_midpoints(improved, tlist)
    )
