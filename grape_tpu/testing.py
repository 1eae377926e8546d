"""Randomized test fixtures.

Analog of ``QuantumControlTestUtils`` (``dummy_control_problem``,
``random_matrix``, ``random_state_vector``) as used throughout the reference
test suite (e.g. ``test/test_pulse_optimization.jl:9,23-25``,
``test/test_convergence_checks.jl:10,16-26``): deterministic seeded random
Hamiltonians, states, and control problems.
"""

import numpy as np

from .generators import hamiltonian
from .trajectory import ControlProblem, Trajectory

__all__ = [
    "random_matrix", "random_state_vector", "dummy_control_problem",
    "tls_problem", "stirap_problem", "cnot_problem",
]


def random_matrix(N, rng=None, hermitian=False):
    rng = rng or np.random.default_rng()
    A = (rng.normal(size=(N, N)) + 1j * rng.normal(size=(N, N))) / np.sqrt(N)
    if hermitian:
        A = 0.5 * (A + A.conj().T)
    return A


def random_state_vector(N, rng=None):
    rng = rng or np.random.default_rng()
    psi = rng.normal(size=N) + 1j * rng.normal(size=N)
    return psi / np.linalg.norm(psi)


def dummy_control_problem(
    N=10,
    n_trajectories=1,
    n_controls=1,
    n_steps=50,
    t_max=1.0,
    rng=None,
    **kwargs,
):
    """Deterministic random control problem: Hermitian drift + `n_controls`
    Hermitian control operators shared across `n_trajectories`, random
    normalized initial/target states, random small guess pulses on the
    interval midpoints."""
    rng = rng or np.random.default_rng(1244538994)
    tlist = np.linspace(0.0, t_max, n_steps + 1)
    H0 = random_matrix(N, rng, hermitian=True)
    Hc = [random_matrix(N, rng, hermitian=True) for _ in range(n_controls)]
    pulses = [rng.normal(size=n_steps) * 0.1 for _ in range(n_controls)]
    gen = hamiltonian(H0, *[(Hc[l], pulses[l]) for l in range(n_controls)])
    trajectories = [
        Trajectory(
            random_state_vector(N, rng), gen,
            target_state=random_state_vector(N, rng),
        )
        for _ in range(n_trajectories)
    ]
    return ControlProblem(trajectories, tlist, **kwargs)
