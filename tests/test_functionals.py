"""Functionals and semi-AD chi tests.

Verifies the jax.grad Wirtinger convention of `make_chi` against the
analytic chis (the reference's AD-vs-analytic agreement anchors, e.g.
``test/test_state_running_cost.jl:174-176``, ‖Δ‖ < 1e-14)."""

import numpy as np
import jax.numpy as jnp

from grape_tpu import Trajectory, hamiltonian
from grape_tpu.functionals import (
    J_T_re, J_T_sm, J_T_ss, J_a_fluence, chi_re, chi_sm, chi_ss,
    grad_J_a_fluence, make_chi, make_grad_J_a, make_xi,
    gate_functional, make_gate_chi, taus,
)


def _random_problem(K=3, d=4, seed=1):
    rng = np.random.default_rng(seed)
    H = hamiltonian(np.eye(d), (rng.normal(size=(d, d)), lambda t: 0.5))
    trajs = []
    for _ in range(K):
        psi0 = rng.normal(size=d) + 1j * rng.normal(size=d)
        tgt = rng.normal(size=d) + 1j * rng.normal(size=d)
        trajs.append(
            Trajectory(
                psi0 / np.linalg.norm(psi0), H,
                target_state=tgt / np.linalg.norm(tgt),
            )
        )
    Psi = rng.normal(size=(K, d)) + 1j * rng.normal(size=(K, d))
    return trajs, jnp.asarray(Psi)


def test_ad_chi_matches_analytic():
    trajs, Psi = _random_problem()
    for J_T, chi_analytic in (
        (J_T_sm, chi_sm), (J_T_re, chi_re), (J_T_ss, chi_ss),
    ):
        chi_ad = make_chi(J_T, trajs, mode="automatic")
        got = np.asarray(chi_ad(Psi, trajs))
        want = np.asarray(chi_analytic(Psi, trajs))
        assert np.linalg.norm(got - want) < 1e-13, J_T.__name__


def test_make_chi_prefers_analytic():
    trajs, _ = _random_problem()
    assert make_chi(J_T_sm, trajs) is chi_sm


def test_fluence_gradient():
    tlist = np.linspace(0, 2, 11)
    rng = np.random.default_rng(0)
    eps = rng.normal(size=(2, 10))
    # AD grad of J_a_fluence equals analytic grad
    grad_fn = make_grad_J_a(J_a_fluence, tlist)
    import jax
    ad = jax.grad(lambda p: J_a_fluence(p, tlist))(jnp.asarray(eps))
    assert np.allclose(np.asarray(ad), grad_J_a_fluence(eps, tlist))
    assert np.allclose(np.asarray(grad_fn(eps, tlist)), np.asarray(ad))


def test_make_xi_matches_analytic():
    """g_b = ⟨Ψ|D|Ψ⟩ (observable cost) → ξ = -D|Ψ⟩
    (reference ``test/test_state_running_cost.jl:174-176``)."""
    rng = np.random.default_rng(4)
    K, d = 2, 5
    Dh = rng.normal(size=(d, d))
    Dh = Dh + Dh.T  # Hermitian observable
    D = jnp.asarray(Dh, dtype=complex)
    trajs, Psi = _random_problem(K=K, d=d)
    tlist = jnp.linspace(0, 1, 11)

    def g_b(P, trajectories, tl, n):
        return jnp.real(
            jnp.einsum("ki,ij,kj->k", jnp.conj(P), D, P)
        )

    xi = make_xi(g_b, trajs)
    got = np.asarray(xi(Psi, trajs, tlist, 3))
    want = -np.einsum("ij,kj->ki", Dh, np.asarray(Psi))
    assert np.linalg.norm(got - want) < 1e-13


def test_gate_functional_and_chi():
    """Gate-lifted J_T and its AD chi agree with direct evaluation/AD."""
    rng = np.random.default_rng(8)
    d = 4
    # orthonormal basis trajectories
    basis = np.linalg.qr(
        rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    )[0]
    O = np.linalg.qr(
        rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    )[0]
    H = hamiltonian(np.eye(d), (np.eye(d), lambda t: 0.0))
    trajs = [
        Trajectory(basis[:, k], H, target_state=O @ basis[:, k])
        for k in range(d)
    ]

    def J_T_U(U_L):
        # gate infidelity in terms of the logical gate
        O_L = jnp.asarray(
            np.array([
                [np.vdot(basis[:, i], O @ basis[:, j]) for j in range(d)]
                for i in range(d)
            ])
        )
        f = jnp.trace(jnp.conj(O_L).T @ U_L) / d
        return 1.0 - jnp.abs(f) ** 2

    J_T = gate_functional(J_T_U)
    chi_gate = make_gate_chi(J_T_U, trajs)
    chi_ad = make_chi(J_T, trajs, mode="automatic")
    Psi = jnp.asarray(
        (rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d)))
    )
    got = np.asarray(chi_gate(Psi, trajs))
    want = np.asarray(chi_ad(Psi, trajs))
    assert np.linalg.norm(got - want) < 1e-13
    # J_T via gate equals J_T_sm-style direct evaluation at perfect gate
    Psi_perfect = jnp.asarray((O @ basis).T)
    assert abs(float(J_T(Psi_perfect, trajs))) < 1e-12


def test_J_b_helper_matches_optimizer_value():
    """The standalone `J_b` helper reproduces the J_b tracked by the
    optimization (reference in-callback invariant,
    `test/test_state_running_cost.jl:41-48`)."""
    import numpy as np
    from grape_tpu import Trajectory, hamiltonian, propagate
    from grape_tpu.functionals import J_b
    from grape_tpu import optimize
    from grape_tpu.shapes import flattop

    def eps(t):
        return 0.2 * float(flattop(t, T=5, t_rise=0.3, func="blackman"))

    sz = np.array([[1, 0], [0, -1]], dtype=complex)
    sx = np.array([[0, 1], [1, 0]], dtype=complex)
    H = hamiltonian(-0.5 * sz, (sx, eps))
    tlist = np.linspace(0, 5, 101)
    traj = Trajectory([1, 0], H, target_state=[0, 1])
    D = jnp.asarray(np.diag([0.0, 1.0]).astype(complex))

    def g_b(Psi, trajectories, tl, n):
        return jnp.real(jnp.einsum("ki,ij,kj->k", jnp.conj(Psi), D, Psi))

    res = optimize(
        [traj], tlist, iter_stop=2, J_T=J_T_re, g_b=g_b, lambda_b=0.3,
        print_iters=False, rethrow_exceptions=True,
    )
    # recompute J_b from a standalone propagation of the optimized pulses
    from grape_tpu import get_controls, substitute

    H_opt = substitute(H, list(zip(get_controls(H), res.optimized_controls)))
    storage = propagate(traj.initial_state, H_opt, tlist, storage=True)
    J_b_val = float(J_b(jnp.asarray(storage)[:, None, :], [traj],
                        tlist, g_b))
    assert abs(J_b_val - res.J_b) < 1e-8


def test_ensemble_gate_functional_phase_invariance():
    """make_ensemble_gate_functional: per-sample coherent, cross-sample
    incoherent — per-sample PERFECT gates with different global phases
    give J_T = 0, where the global J_T_sm destructively interferes
    (the robust-ensemble stall this functional fixes; reference gate
    functionals per member, docs/src/background.md:552-610)."""
    import jax.numpy as jnp

    from grape_tpu.functionals import (
        J_T_sm, make_ensemble_gate_functional,
    )

    class _T:
        def __init__(self, tgt, weight=1.0):
            self.target_state = tgt
            self.weight = weight

    d, nb, S = 4, 4, 3
    rng = np.random.default_rng(0)
    trajs = []
    Psi = []
    phases = [1.0, np.exp(1j * 1.1), np.exp(-1j * 2.3)]
    for s in range(S):
        for k in range(nb):
            tgt = np.zeros(d, complex)
            tgt[k] = 1.0
            trajs.append(_T(tgt))
            Psi.append(phases[s] * tgt)  # perfect gate up to sample phase
    Psi = jnp.asarray(np.stack(Psi))
    J_ens = float(make_ensemble_gate_functional(nb)(Psi, trajs))
    assert abs(J_ens) < 1e-12
    J_glob = float(J_T_sm(Psi, trajs))
    assert J_glob > 0.3  # cross-sample interference

    # within-sample phase errors ARE penalized (a CZ phase flip)
    Psi_bad = np.asarray(Psi).copy()
    Psi_bad[3] *= -1.0  # wrong relative phase inside sample 0
    J_bad = float(
        make_ensemble_gate_functional(nb)(jnp.asarray(Psi_bad), trajs)
    )
    assert J_bad > 0.05

    # per-sample weights normalize
    trajs_w = [
        _T(t.target_state, weight=2.0 if i < nb else 1.0)
        for i, t in enumerate(trajs)
    ]
    J_w = float(
        make_ensemble_gate_functional(nb)(jnp.asarray(Psi_bad), trajs_w)
    )
    assert J_w > J_bad  # the bad sample carries more weight
