"""Krotov's method (the second in-repo optimization method) and REAL
cross-method continuation.

The reference ecosystem tests Krotov→GRAPE and GRAPE→Krotov
continuation with record continuity
(``/root/reference/test/test_tls_optimization.jl:417-482``); GRAPE.jl
converts foreign results via ``Base.convert(GrapeResult, r)``
(``/root/reference/src/result.jl:137-147``).  Until round 5b this repo
only exercised a duck-typed stand-in; these tests run the actual
second method."""

import numpy as np
import pytest

from grape_tpu import (
    KrotovResult, Trajectory, hamiltonian, optimize, optimize_krotov,
)
from grape_tpu.functionals import J_T_sm
from grape_tpu.shapes import flattop


def guess_eps(t):
    return 0.2 * float(flattop(t, T=5.0, t_rise=0.3, func="blackman"))


@pytest.fixture
def tls_setup():
    sz = np.array([[1, 0], [0, -1]], dtype=complex)
    sx = np.array([[0, 1], [1, 0]], dtype=complex)
    H = hamiltonian(-0.5 * sz, (sx, guess_eps))
    tlist = np.linspace(0, 5, 501)
    return [Trajectory([1, 0], H, target_state=[0, 1])], tlist


def test_krotov_tls_monotonic_convergence(tls_setup):
    """TLS |0⟩→|1⟩: monotonic descent to J_T < 1e-3 (first-order
    Krotov's defining property; the reference's TLS anchor problem,
    ``/root/reference/test/test_tls_optimization.jl:148-173``)."""
    trajectories, tlist = tls_setup
    Js = []

    def cb(res, iteration):
        Js.append(res.J_T)

    res = optimize_krotov(
        trajectories, tlist, J_T=J_T_sm, lambda_a=2.0, iter_stop=10,
        callback=cb, print_iters=False, rethrow_exceptions=True,
    )
    assert res.J_T < 1e-3
    assert res.iter == 10
    assert Js[0] > 0.9  # guess functional recorded at iteration 0
    assert all(b <= a + 1e-12 for a, b in zip(Js, Js[1:])), Js
    # guess must be immutable (same invariant as GRAPE,
    # test/test_pulse_optimization.jl:36-44)
    assert np.allclose(
        res.guess_controls[0], [guess_eps(t) for t in tlist]
    )
    assert not np.allclose(res.optimized_controls[0],
                           res.guess_controls[0])


def test_krotov_to_grape_continuation(tls_setup):
    """Krotov→GRAPE: GRAPE continues from the real KrotovResult —
    warm-start pulse adopted, iteration numbering continues, records
    preserved (``test/test_tls_optimization.jl:417-457``)."""
    trajectories, tlist = tls_setup
    kres = optimize_krotov(
        trajectories, tlist, J_T=J_T_sm, lambda_a=2.0, iter_stop=3,
        store_iter_info=["iter.", "J_T"], print_iters=False,
        rethrow_exceptions=True,
    )
    assert isinstance(kres, KrotovResult)
    assert kres.iter == 3
    J_k = kres.J_T
    assert 1e-6 < J_k < 0.9
    records_before = list(kres.records)
    n_rec = len(records_before)
    assert n_rec == 4  # iterations 0..3

    res = optimize(
        trajectories, tlist, J_T=J_T_sm, iter_stop=8,
        continue_from=kres, store_iter_info=["iter.", "J_T"],
        print_iters=False, rethrow_exceptions=True,
    )
    assert res.J_T < 1e-3
    assert res.J_T < J_k
    assert res.iter > 3
    # record continuity (NOTE: like the reference, continue_from adopts
    # the passed result object — kres IS res here): the Krotov records
    # are preserved as the prefix, and the continued run's iteration-0
    # row shows the warm-start functional == Krotov's final J_T (the
    # reference's continuity assertion,
    # test/test_tls_optimization.jl:445: records[1][1] == res_krotov.J_T)
    assert res.records[:n_rec] == records_before
    assert len(res.records) > n_rec
    first_grape_row = res.records[n_rec]
    assert abs(first_grape_row[1] - J_k) < 1e-12


def test_grape_to_krotov_continuation(tls_setup):
    """GRAPE→Krotov: the other direction
    (``test/test_tls_optimization.jl:459-482``)."""
    trajectories, tlist = tls_setup
    gres = optimize(
        trajectories, tlist, J_T=J_T_sm, iter_stop=2,
        print_iters=False, rethrow_exceptions=True,
    )
    J_g = gres.J_T
    assert J_g < 0.9
    res = optimize_krotov(
        trajectories, tlist, J_T=J_T_sm, lambda_a=2.0, iter_stop=6,
        continue_from=gres, print_iters=False, rethrow_exceptions=True,
    )
    assert isinstance(res, KrotovResult)
    assert res.J_T < J_g
    assert res.iter > 2


def test_krotov_update_shape_gates_update(tls_setup):
    """S(t) ≡ 0 freezes the pulse; a flattop S keeps the endpoints at
    their guess values (Krotov.jl's update_shape semantics)."""
    trajectories, tlist = tls_setup
    from grape_tpu.controls import discretize_on_midpoints

    # the working representation is the midpoint pulse (reference pulse
    # layout); guess POINT values are callable samples, so comparisons
    # go through the midpoint grid
    guess_mid = discretize_on_midpoints(guess_eps, tlist)
    res0 = optimize_krotov(
        trajectories, tlist, J_T=J_T_sm, lambda_a=2.0, iter_stop=2,
        update_shape=lambda t: 0.0, print_iters=False,
        rethrow_exceptions=True,
    )
    assert np.allclose(
        discretize_on_midpoints(res0.optimized_controls[0], tlist),
        guess_mid,
    )

    res1 = optimize_krotov(
        trajectories, tlist, J_T=J_T_sm, lambda_a=2.0, iter_stop=4,
        update_shape=lambda t: float(
            flattop(t, T=5.0, t_rise=0.5, func="blackman")
        ),
        print_iters=False, rethrow_exceptions=True,
    )
    # endpoints: the first/last interval's shape value is sampled AT
    # t=0 / t=T (the midpoint-grid endpoint convention), where the
    # flattop S vanishes -> those interval updates are exactly zero
    du = (
        discretize_on_midpoints(res1.optimized_controls[0], tlist)
        - guess_mid
    )
    assert abs(du[0]) < 1e-10 and abs(du[-1]) < 1e-10
    assert np.max(np.abs(du)) > 1e-3


def test_krotov_ensemble_per_traj_generators():
    """Per-trajectory generators (robustness ensemble): the update sums
    the co-state overlaps over all trajectories (the reference's Σ_k,
    ``/root/reference/src/optimize.jl:574-584`` in the GRAPE analog)."""
    from grape_tpu.models import transmon_ensemble_trajectories

    trajs = transmon_ensemble_trajectories(4, d=3, T=4.0)
    tlist = np.linspace(0.0, 4.0, 41)
    Js = []
    res = optimize_krotov(
        trajs, tlist, J_T=J_T_sm, lambda_a=0.5, iter_stop=12,
        callback=lambda r, i: Js.append(r.J_T),
        print_iters=False, rethrow_exceptions=True,
    )
    assert np.isfinite(res.J_T)
    assert res.J_T < 0.5 * Js[0]  # halves the guess infidelity
    assert all(b <= a + 1e-12 for a, b in zip(Js, Js[1:])), Js


def test_krotov_rejects_state_running_cost(tls_setup):
    trajectories, tlist = tls_setup

    def g_b(Psi, trajectories, tlist_, n):
        return np.zeros(len(trajectories))

    with pytest.raises(NotImplementedError):
        optimize_krotov(
            trajectories, tlist, J_T=J_T_sm, g_b=g_b, lambda_b=1.0,
            print_iters=False,
        )


def test_krotov_exception_capture(tls_setup):
    """Reference exception-capture semantics (src/optimize.jl:125-135)."""
    trajectories, tlist = tls_setup

    def bad_cb(res, iteration):
        if iteration >= 1:
            raise RuntimeError("boom")

    res = optimize_krotov(
        trajectories, tlist, J_T=J_T_sm, iter_stop=3, callback=bad_cb,
        print_iters=False,
    )
    assert res.message.startswith("Exception:")
    with pytest.raises(RuntimeError):
        optimize_krotov(
            trajectories, tlist, J_T=J_T_sm, iter_stop=3,
            callback=bad_cb, print_iters=False,
            rethrow_exceptions=True,
        )


def test_optimize_problem_method_dispatch(tls_setup):
    """Framework-level method selection
    (``QuantumControl.optimize(problem; method=...)``,
    ``/root/reference/src/optimize.jl:63-68``)."""
    from grape_tpu import ControlProblem, optimize_problem

    trajectories, tlist = tls_setup
    problem = ControlProblem(trajectories, tlist, J_T=J_T_sm)
    res = optimize_problem(
        problem, method="krotov", lambda_a=2.0, iter_stop=2,
        print_iters=False, rethrow_exceptions=True,
    )
    assert isinstance(res, KrotovResult)
    assert res.iter == 2
    with pytest.raises(ValueError, match="Unknown optimization method"):
        optimize_problem(problem, method="qaoa")


def test_krotov_shared_generator_gate():
    """Shared-generator gate problem (K=4 tomography-complete basis
    states under ONE generator, 2 controls): the broadcast/shared fast
    path of the sweep (the reference's gate-optimization pattern,
    ``/root/reference/test/test_lbfgsb_saddle_point.jl``)."""
    from grape_tpu.models import tls_xgate_problem

    problem = tls_xgate_problem(n_steps=200)
    Js = []
    res = optimize_krotov(
        problem.trajectories, problem.tlist, J_T=J_T_sm,
        lambda_a=1.0, iter_stop=15,
        callback=lambda r, i: Js.append(r.J_T),
        print_iters=False, rethrow_exceptions=True,
    )
    assert res.J_T < 0.05, res.J_T
    assert all(b <= a + 1e-12 for a, b in zip(Js, Js[1:])), Js
