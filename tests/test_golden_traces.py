"""Golden convergence-trace regression tests (VERDICT.md round-1 item 3).

Endpoint thresholds alone let the round-1 f75b359 numeric regression
through; these tests pin the ENTIRE per-iteration J_T (and J_b) series of
four reference-anchored problems against in-tree golden data
(``tests/golden/traces.json``, regenerate with
``python -m tests.golden.record`` after an INTENTIONAL numeric change).

The traces are bitwise-reproducible on a fixed software stack (measured:
0.0 max deviation across runs); the assertion band (rtol 1e-3) allows
benign environment drift while catching any gradient-level numeric change,
which compounds over L-BFGS-B iterations.  The seeded dummy problem also
pins its exact convergence iteration, like the reference pins iter == 17
(``/root/reference/test/test_convergence_checks.jl:34``).
"""

import json
import os

import numpy as np
import pytest

from grape_tpu import optimize_problem
from grape_tpu.functionals import J_T_ss
from grape_tpu.testing import (
    cnot_problem, dummy_control_problem, stirap_problem, tls_problem,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "traces.json")

with open(GOLDEN) as f:
    TRACES = json.load(f)


def _run(problem, **updates):
    trace, trace_b = [], []

    def cb(wrk, iteration):
        trace.append(float(wrk.result.J_T))
        trace_b.append(float(wrk.result.J_b))

    res = optimize_problem(
        problem, callback=cb, print_iters=False, rethrow_exceptions=True,
        **updates
    )
    return trace, trace_b, res


def _check(name, trace, trace_b, res):
    ref = TRACES[name]
    assert len(trace) == len(ref["J_T_trace"]), (
        f"{name}: trace length {len(trace)} != golden "
        f"{len(ref['J_T_trace'])}"
    )
    np.testing.assert_allclose(
        trace, ref["J_T_trace"], rtol=1e-3, atol=1e-10,
        err_msg=f"{name}: J_T trace deviates from golden",
    )
    np.testing.assert_allclose(
        trace_b, ref["J_b_trace"], rtol=1e-3, atol=1e-10,
        err_msg=f"{name}: J_b trace deviates from golden",
    )
    assert res.iter == ref["iter"]
    assert res.converged == ref["converged"]


@pytest.mark.parametrize("method", ["gradgen", "taylor"])
def test_tls_trace(method):
    """TLS |0>->|1> 501-point grid (reference
    test/test_tls_optimization.jl:148-173): 5-iteration J_T series."""
    trace, trace_b, res = _run(
        tls_problem(iter_stop=5), gradient_method=method
    )
    _check(f"tls_{method}", trace, trace_b, res)
    assert res.J_T < 1e-3  # reference endpoint anchor


def test_stirap_running_cost_trace():
    """STIRAP with the intermediate-population running cost — the exact
    configuration whose taylor gradient regressed in round 1."""
    trace, trace_b, res = _run(
        stirap_problem(lambda_b=0.4, iter_stop=25),
        gradient_method="taylor",
    )
    _check("stirap_running_cost", trace, trace_b, res)


def test_cnot_cheby_trace():
    """2-qubit CNOT under Chebyshev propagation, first 15 iterations."""
    trace, trace_b, res = _run(cnot_problem(iter_stop=15))
    _check("cnot_cheby", trace, trace_b, res)


def test_dummy_seeded_trace_and_pinned_iteration():
    """Seeded random problem to convergence: the J_T series AND the exact
    convergence iteration are pinned (the reference's iter == 17 analog)."""
    trace, trace_b, res = _run(
        dummy_control_problem(
            N=2, rng=np.random.default_rng(1244538994), iter_stop=100
        ),
        J_T=J_T_ss,
        check_convergence=lambda r: ("J_T < 10⁻⁵" if r.J_T < 1e-5 else ""),
    )
    _check("dummy_seeded", trace, trace_b, res)
    assert res.iter == TRACES["dummy_seeded"]["iter"] == 20
    assert res.message == "J_T < 10⁻⁵"


def test_lindblad_tls_trace():
    """Dissipative Lindblad TLS (vectorized Liouville propagation): the
    open-system path is regression-pinned (VERDICT round-2 item 8)."""
    from grape_tpu.models import dissipative_tls_problem

    trace, trace_b, res = _run(
        dissipative_tls_problem(gamma=0.05, n_steps=200, iter_stop=15)
    )
    _check("lindblad_tls", trace, trace_b, res)
    assert res.J_T < 0.1  # beats the gamma=0.05 decay


def test_subspace_gate_trace():
    """Fat-batch subspace-gate synthesis (round-3 model family): K=6
    basis states under one shared generator toward a seeded random
    subspace unitary — pins the shared-generator gate fast path and the
    length-1 operator storage."""
    from grape_tpu.models import two_transmon_subspace_gate_problem

    trace, trace_b, res = _run(
        two_transmon_subspace_gate_problem(
            d=3, n_basis=6, n_steps=50, T=10.0, E0=0.2, J=0.3,
            iter_stop=15,
        )
    )
    _check("subspace_gate", trace, trace_b, res)
    assert trace[-1] < 0.6 * trace[0]  # real optimization progress
