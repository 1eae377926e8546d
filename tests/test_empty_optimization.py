"""Optimizing a problem without any controls raises a meaningful error
(port of the reference's ``test/test_empty_optimization.jl``)."""

import numpy as np
import pytest

from grape_tpu import ControlProblem, Trajectory, optimize, optimize_problem
from grape_tpu.controls import get_controls
from grape_tpu.functionals import J_T_re


def _random_problem(rng):
    """A trajectory whose generator is a static (control-free) matrix."""
    N = 10
    A = rng.standard_normal((N, N)) + 1j * rng.standard_normal((N, N))
    H = 0.5 * (A + A.conj().T)

    def random_state():
        psi = rng.standard_normal(N) + 1j * rng.standard_normal(N)
        return psi / np.linalg.norm(psi)

    traj = Trajectory(random_state(), H, target_state=random_state())
    tlist = np.arange(0.0, 1001.0, 1.0)
    return [traj], tlist


def test_empty_optimization_raises():
    """Reference anchor (`test/test_empty_optimization.jl:14-38`): a
    static generator exposes zero controls and `optimize` raises with a
    message naming the problem."""
    rng = np.random.default_rng(2264511904)
    trajectories, tlist = _random_problem(rng)

    assert len(get_controls([t.generator for t in trajectories])) == 0

    with pytest.raises(
        ValueError,
        match="no controls in trajectories: cannot optimize",
    ):
        optimize(
            trajectories, tlist, J_T=J_T_re, rethrow_exceptions=True,
            print_iters=False,
        )

    problem = ControlProblem(trajectories, tlist, J_T=J_T_re)
    with pytest.raises(
        ValueError,
        match="no controls in trajectories: cannot optimize",
    ):
        optimize_problem(problem, rethrow_exceptions=True, print_iters=False)


def test_propagate_static_matrix_generator():
    """`propagate` accepts a plain static matrix as the generator and
    matches the exact exponential ``exp(-i H T)``."""
    from scipy.linalg import expm as scipy_expm

    from grape_tpu.propagate import propagate

    rng = np.random.default_rng(7)
    N = 6
    A = rng.standard_normal((N, N)) + 1j * rng.standard_normal((N, N))
    H = 0.5 * (A + A.conj().T)
    psi0 = rng.standard_normal(N) + 1j * rng.standard_normal(N)
    psi0 /= np.linalg.norm(psi0)
    tlist = np.linspace(0.0, 2.0, 21)

    psi = np.asarray(propagate(psi0, H, tlist))
    exact = scipy_expm(-2.0j * H) @ psi0
    np.testing.assert_allclose(psi, exact, atol=1e-10)


def test_empty_trajectories_raises():
    """Zero trajectories is rejected up front rather than crashing later."""
    tlist = np.linspace(0.0, 1.0, 11)
    with pytest.raises(ValueError, match="no trajectories"):
        optimize([], tlist, J_T=J_T_re, rethrow_exceptions=True,
                 print_iters=False)
