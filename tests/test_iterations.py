"""Iteration windows, callbacks, records merging, and the info-table stdout
format (port of the reference's ``test/test_iterations.jl``)."""

import numpy as np
import pytest

from grape_tpu import optimize_problem
from grape_tpu.functionals import J_T_ss
from grape_tpu.testing import dummy_control_problem


def _problem(rng=None, **kwargs):
    rng = rng or np.random.default_rng(1244568944)
    return dummy_control_problem(N=2, rng=rng, **kwargs)


def test_iter_start_stop(capsys):
    """iter_start/iter_stop restrict iteration numbering: with
    iter_start=10, iter_stop=12 the records show [0, 11, 12]
    (reference `test/test_iterations.jl:18-40`)."""
    problem = _problem(
        iter_start=10, J_T=J_T_ss, store_iter_info=["iter.", "J_T"],
        rethrow_exceptions=True,
    )
    res = optimize_problem(problem, iter_stop=12)
    assert res.converged
    assert res.iter_start == 10
    assert res.iter_stop == 12
    iters = [rec[0] for rec in res.records]
    assert iters == [0, 11, 12]


def test_callbacks(capsys):
    def callback1(wrk, iteration):
        print(f"This is callback 1 for iter {iteration}")

    def callback2(wrk, iteration):
        print(f"This is callback 2 for iter {iteration}")
        return ("cb2", iteration)

    problem = _problem(J_T=J_T_ss, callback=callback1,
                       rethrow_exceptions=True)

    res = optimize_problem(problem, iter_stop=1)
    out = capsys.readouterr().out
    assert "This is callback 1 for iter 0\n iter. " in out
    assert "This is callback 1 for iter 1\n     1" in out

    # callback passed to optimize overrides the problem's callback
    res = optimize_problem(problem, iter_stop=1, callback=callback2)
    out = capsys.readouterr().out
    assert res.converged
    assert "This is callback 1 for iter 0" not in out
    assert "This is callback 2 for iter 0" in out
    assert "This is callback 2 for iter 1" in out

    # tuple of callbacks; records from return values
    res = optimize_problem(
        problem, iter_stop=1, callback=(callback1, callback2),
        print_iters=False,
    )
    out = capsys.readouterr().out
    assert res.converged
    assert (
        "This is callback 1 for iter 0\n"
        "This is callback 2 for iter 0\n"
        "This is callback 1 for iter 1\n"
        "This is callback 2 for iter 1\n"
    ) in out
    assert res.records == [("cb2", 0), ("cb2", 1)]

    # callbacks + store_iter_info merge into one record tuple
    res = optimize_problem(
        problem, iter_stop=1, callback=(callback1, callback2),
        store_iter_info=["J_T"],
    )
    capsys.readouterr()
    assert res.converged
    assert len(res.records) == 2
    assert len(res.records[0]) == 3
    assert res.records[0][0] == "cb2"
    assert res.records[0][1] == 0
    assert isinstance(res.records[0][2], float)


def test_callback_pulse_mutation():
    """Scaling the pulses in a callback takes effect on the next guess
    (reference `test/test_iterations.jl:128-145`)."""

    def reduce_pulse(wrk, iteration):
        r0 = np.linalg.norm(wrk.pulsevals_guess)
        r1 = np.linalg.norm(wrk.pulsevals)
        wrk.pulsevals *= 0.8
        r2 = np.linalg.norm(wrk.pulsevals)
        return (r0, r1, r2)

    problem = _problem(J_T=J_T_ss, rethrow_exceptions=True)
    res = optimize_problem(
        problem, iter_stop=3, callback=reduce_pulse,
        store_iter_info=["iter.", "J_T"], print_iters=False,
    )
    for i in range(1, len(res.records)):
        nrm_guess, nrm_upd, nrm_upd_scaled, iteration, J_T = res.records[i]
        assert nrm_upd_scaled == pytest.approx(0.8 * nrm_upd)
        if i >= 2:
            nrm_upd_scaled_prev = res.records[i - 1][2]
            assert nrm_guess == pytest.approx(nrm_upd_scaled_prev)


def test_print_iter_info_full_columns(capsys):
    """All-column header renders with the reference's fixed widths
    (`test/test_iterations.jl:150-201`)."""
    problem = _problem(
        J_T=J_T_ss,
        print_iter_info=[
            "iter.", "J_T", "J_a", "λ_a⋅J_a", "J", "ǁ∇J_Tǁ", "ǁ∇J_aǁ",
            "λ_aǁ∇J_aǁ", "λ_a⋅ΔJ_a", "ǁ∇Jǁ", "ǁΔϵǁ", "ǁϵǁ", "max|Δϵ|",
            "max|ϵ|", "ǁΔϵǁ/ǁϵǁ", "∫Δϵ²dt", "ǁsǁ", "∠°", "α", "ΔJ_T",
            "ΔJ_a", "λ_a⋅ΔJ_a", "ΔJ", "FG(F)",
        ],
        rethrow_exceptions=True,
    )
    optimize_problem(problem, iter_stop=3)
    out = capsys.readouterr().out
    assert (
        "iter.        J_T        J_a    λ_a⋅J_a          J     ǁ∇J_Tǁ"
        "     ǁ∇J_aǁ  λ_aǁ∇J_aǁ   λ_a⋅ΔJ_a       ǁ∇Jǁ       ǁΔϵǁ"
        "        ǁϵǁ    max|Δϵ|     max|ϵ|   ǁΔϵǁ/ǁϵǁ     ∫Δϵ²dt"
        "        ǁsǁ     ∠°          α       ΔJ_T       ΔJ_a"
        "   λ_a⋅ΔJ_a         ΔJ   FG(F)"
    ) in out
    # delta columns are n/a at iteration 0
    assert (
        "        n/a        n/a        n/a    n/a        n/a        n/a"
        "        n/a        n/a        n/a    1(0)"
    ) in out
