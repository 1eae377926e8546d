"""Guess-pulse immutability and no-controls error (ports of the reference's
``test/test_pulse_optimization.jl`` and ``test/test_empty_optimization.jl``)."""

import numpy as np
import pytest

from grape_tpu import (
    ControlProblem, Trajectory, discretize_on_midpoints, get_controls,
    optimize, optimize_problem,
)
from grape_tpu.functionals import J_T_re
from grape_tpu.testing import (
    dummy_control_problem, random_matrix, random_state_vector,
)
from grape_tpu.generators import Generator


def test_optimization_does_not_mutate_guess():
    """The optimization must never mutate the controls stored in the user's
    generator (reference `test/test_pulse_optimization.jl:36-44`)."""
    rng = np.random.default_rng(1244561944)
    problem = dummy_control_problem(rng=rng)
    nt = len(problem.tlist)
    guess_pulse = get_controls(
        [t.generator for t in problem.trajectories]
    )[0]
    assert len(guess_pulse) == nt - 1
    guess_pulse_copy = np.array(guess_pulse, copy=True)

    res = optimize_problem(
        problem, J_T=J_T_re, iter_stop=2, print_iters=False,
        rethrow_exceptions=True,
    )
    opt_control = res.optimized_controls[0]
    assert len(opt_control) == nt  # optimized_controls are always ON tlist
    opt_pulse = discretize_on_midpoints(opt_control, problem.tlist)
    post_pulse = get_controls([t.generator for t in problem.trajectories])[0]

    assert post_pulse is guess_pulse  # same object in the generator
    assert np.linalg.norm(guess_pulse_copy - np.asarray(guess_pulse)) == 0.0
    assert np.linalg.norm(np.asarray(post_pulse) - opt_pulse) > 0.1


def test_empty_optimization_raises():
    """Zero controls must raise a meaningful error
    (reference `test/test_empty_optimization.jl:36-37`)."""
    rng = np.random.default_rng(2264511904)
    N = 10
    H = Generator(random_matrix(N, rng), [])
    trajectories = [
        Trajectory(
            random_state_vector(N, rng), H,
            target_state=random_state_vector(N, rng),
        )
    ]
    assert len(get_controls([H])) == 0
    tlist = np.arange(0, 1001, 1.0)
    problem = ControlProblem(trajectories, tlist, J_T=J_T_re)
    with pytest.raises(ValueError, match="no controls in trajectories"):
        optimize_problem(problem, rethrow_exceptions=True)


def test_fw_prop_callback_observables():
    """Per-step forward-propagation observables (reference fw_prop
    callback, src/optimize.jl:733-737): the jitted program evaluates the
    observables over the stored states and the host callback receives all
    per-step values once per evaluation (documented deviation)."""
    import jax.numpy as jnp

    from grape_tpu import propagate, substitute, get_controls
    from grape_tpu.testing import tls_problem
    from grape_tpu import optimize_problem

    problem = tls_problem(n_steps=100, iter_stop=2)
    calls = []

    def pop1(Psi, tlist, n):
        return jnp.abs(Psi[..., 1]) ** 2  # (K,)

    def cb(values, tlist):
        calls.append(values)

    res = optimize_problem(
        problem, fw_prop_callback=cb, fw_prop_observables=[pop1],
        print_iters=False, rethrow_exceptions=True,
    )
    assert len(calls) >= 3  # one per fg/f evaluation
    vals = calls[-1]
    assert len(vals) == 1
    assert vals[0].shape == (101, 1)  # (N_T+1, K)
    # cross-check against an independent propagation of the final pulse
    H = problem.trajectories[0].generator
    H_opt = substitute(
        H, list(zip(get_controls(H), res.optimized_controls))
    )
    tlist = problem.tlist
    dyn = propagate([1, 0], H_opt, tlist, storage=True)
    want = np.abs(dyn[:, 1]) ** 2
    got = np.real(vals[0][:, 0])
    # the last callback fired for the final accepted iterate
    np.testing.assert_allclose(got, want, atol=1e-9)
    assert abs(got[-1] - (1.0 - res.J_T)) < 1e-6

    # default observables: the stored states themselves
    calls2 = []
    optimize_problem(
        problem, fw_prop_callback=lambda v, t: calls2.append(v),
        iter_stop=1, print_iters=False, rethrow_exceptions=True,
    )
    assert calls2[-1][0].shape == (101, 1, 2)  # (N_T+1, K, d)

    # recompute storage cannot serve per-step observables
    import pytest

    with pytest.raises(ValueError, match="storage_mode"):
        optimize_problem(
            problem, fw_prop_callback=cb, storage_mode="recompute",
            rethrow_exceptions=True,
        )

    # the F-only program (line-search probes) also carries the
    # observables — round-2 review regression: build_f referenced
    # undefined storage when fw_prop_callback was set
    from grape_tpu.workspace import GrapeWrk

    kwargs = dict(problem.kwargs)
    kwargs.update(fw_prop_callback=cb, fw_prop_observables=[pop1])
    wrk = GrapeWrk(problem.trajectories, problem.tlist, kwargs)
    n_before = len(calls)
    J = wrk.evaluate_functional(wrk.pulsevals)
    assert np.isfinite(J)
    assert len(calls) == n_before + 1
    assert calls[-1][0].shape == (101, 1)
