"""Open-system (Liouville space) support: vectorized density matrices
propagated under a Liouvillian are "just states" to the GRAPE engine
(background.md "Open Quantum Systems" tip — the reference treats density
matrices as vectorized states with the same machinery)."""

import numpy as np
import scipy.linalg
import jax.numpy as jnp

from grape_tpu import (
    Trajectory, hamiltonian, liouvillian, optimize, propagate,
)
from grape_tpu.functionals import J_T_re
from grape_tpu.shapes import flattop


def test_liouvillian_matches_mesolve():
    """exp(-i L dt) on vec(ρ) reproduces the direct Lindblad solution."""
    rng = np.random.default_rng(2)
    sz = np.array([[1, 0], [0, -1]], dtype=complex)
    sx = np.array([[0, 1], [1, 0]], dtype=complex)
    sm = np.array([[0, 1], [0, 0]], dtype=complex)  # decay |1> -> |0>
    H = -0.5 * sz + 0.3 * sx
    gamma = 0.4
    c = np.sqrt(gamma) * sm
    Lgen = liouvillian(hamiltonian(H, (np.zeros((2, 2)), lambda t: 0.0)),
                       c_ops=[c])
    rho0 = np.array([[0, 0], [0, 1]], dtype=complex)  # excited state
    t = 0.7
    tlist = np.linspace(0, t, 141)
    vec_rho_T = propagate(rho0.T.reshape(-1), Lgen, tlist)
    rho_T = np.asarray(vec_rho_T).reshape(2, 2).T
    # direct integration of the Lindblad master equation
    from scipy.integrate import solve_ivp

    def rhs(_, y):
        rho = y.reshape(2, 2)
        drho = -1j * (H @ rho - rho @ H)
        drho += c @ rho @ c.conj().T - 0.5 * (
            c.conj().T @ c @ rho + rho @ c.conj().T @ c
        )
        return drho.reshape(-1)

    sol = solve_ivp(
        rhs, (0, t), rho0.reshape(-1).astype(complex), rtol=1e-10,
        atol=1e-12,
    )
    rho_ref = sol.y[:, -1].reshape(2, 2)
    assert np.linalg.norm(rho_T - rho_ref) < 1e-6
    assert abs(np.trace(rho_T) - 1.0) < 1e-8  # trace preserving


def test_open_system_optimization():
    """Optimize a dissipative TLS state transfer in Liouville space."""
    sz = np.array([[1, 0], [0, -1]], dtype=complex)
    sx = np.array([[0, 1], [1, 0]], dtype=complex)
    sm = np.array([[0, 1], [0, 0]], dtype=complex)
    gamma = 0.01

    def eps(t):
        return 0.2 * float(flattop(t, T=5, t_rise=0.3, func="blackman"))

    Hgen = hamiltonian(-0.5 * sz, (sx, eps))
    Lgen = liouvillian(Hgen, c_ops=[np.sqrt(gamma) * sm])
    tlist = np.linspace(0, 5, 201)
    rho0 = np.array([[1, 0], [0, 0]], dtype=complex)
    rho_tgt = np.array([[0, 0], [0, 1]], dtype=complex)
    traj = Trajectory(
        rho0.T.reshape(-1), Lgen, target_state=rho_tgt.T.reshape(-1)
    )
    # J_T_re with Hilbert-Schmidt overlap tau = tr(rho_tgt† rho(T))
    res = optimize(
        [traj], tlist, iter_stop=8, J_T=J_T_re,
        rethrow_exceptions=True, print_iters=False,
    )
    # can't reach exactly rho_tgt due to decay, but should come close
    assert res.J_T < 0.05
    assert res.J_T < res.J_T_prev


def test_dissipative_tls_model_optimization():
    """Open-system model family: dissipative TLS transfer under amplitude
    damping — both gradient methods work on the NON-Hermitian Liouvillian
    and agree; the optimized pulse beats the decay.  Reference anchors:
    the "Open Quantum Systems" vectorized-density-matrix treatment
    (`/root/reference/docs/src/background.md`) and the non-Hermitian
    taylor kernel test (`/root/reference/test/test_taylor_grad.jl:33-48`,
    random non-Hermitian generators)."""
    from grape_tpu.models import dissipative_tls_problem
    from grape_tpu import optimize_problem, substitute, get_controls

    problem = dissipative_tls_problem(gamma=0.05, iter_stop=10)
    res_g = optimize_problem(
        problem, gradient_method="gradgen", print_iters=False,
        rethrow_exceptions=True,
    )
    res_t = optimize_problem(
        problem, gradient_method="taylor", print_iters=False,
        rethrow_exceptions=True,
    )
    # transfer P1(T) = 1 - J_T > 0.95 despite gamma*T = 0.25 of decay
    assert res_g.J_T < 0.05
    assert abs(res_g.J_T - res_t.J_T) < 1e-9
    # the propagated density matrix stays physical (trace preserved)
    L = problem.trajectories[0].generator
    L_opt = substitute(
        L, list(zip(get_controls(L), res_g.optimized_controls))
    )
    vec_rho = propagate(
        problem.trajectories[0].initial_state, L_opt, problem.tlist
    )
    rho_T = np.asarray(vec_rho).reshape(2, 2).T
    assert abs(np.trace(rho_T) - 1.0) < 1e-8
    assert np.real(rho_T[1, 1]) > 0.95
