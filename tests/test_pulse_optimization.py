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
