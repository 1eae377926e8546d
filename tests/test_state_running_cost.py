"""State-dependent running costs (port of the reference's
``test/test_state_running_cost.jl``): manual vs AD xi, in-callback J_b
invariants, λ_b=0 path, the STIRAP physics regression (intermediate-level
population suppressed 10×), taylor-vs-gradgen agreement, and the
wrong-sign-xi non-convergence guard."""

import warnings

import numpy as np
import jax.numpy as jnp
import pytest

from grape_tpu import (
    ControlProblem, Trajectory, hamiltonian, optimize, optimize_problem,
    propagate, substitute, get_controls,
)
from grape_tpu.functionals import J_T_re, J_T_ss, make_xi
from grape_tpu.shapes import blackman
from grape_tpu.testing import dummy_control_problem


def test_state_running_cost_with_manual_xi():
    rng = np.random.default_rng(1244561944)
    N = 10
    problem = dummy_control_problem(N=N, n_controls=2, rng=rng)
    A = rng.normal(size=(N, N)) + 1j * rng.normal(size=(N, N))
    D = A @ A.conj().T / N  # PSD => g_b >= 0
    Dj = jnp.asarray(D)

    def g_b(Psi, trajectories, tlist, n):
        return jnp.real(jnp.einsum("ki,ij,kj->k", jnp.conj(Psi), Dj, Psi))

    def xi_manual(Psi, trajectories, tlist, n):
        return -jnp.einsum("ij,kj->ki", Dj, Psi)

    checked = []

    def check_J_b(wrk, iteration):
        lambda_b = wrk.kwargs.get("lambda_b", 1.0)
        # J_parts[2] is λ_b * J_b
        checked.append((wrk.J_parts[2], lambda_b * wrk.result.J_b))
        return ()

    res = optimize_problem(
        problem,
        J_T=J_T_re,
        g_b=g_b,
        xi=xi_manual,
        lambda_b=0.5,
        iter_stop=5,
        callback=check_J_b,
        print_iters=False,
        rethrow_exceptions=True,
    )
    assert res.converged
    assert res.J_T < 1.0
    assert res.J_b >= 0.0
    for got, want in checked[1:]:
        assert abs(got - want) < 1e-12


def test_auto_xi_matches_manual():
    """make_xi (jax.grad) equals the analytic -D Psi to 1e-14
    (reference anchor `test/test_state_running_cost.jl:174-176`)."""
    rng = np.random.default_rng(5)
    N, K = 6, 2
    A = rng.normal(size=(N, N)) + 1j * rng.normal(size=(N, N))
    D = A @ A.conj().T / N
    Dj = jnp.asarray(D)

    def g_b(Psi, trajectories, tlist, n):
        return jnp.real(jnp.einsum("ki,ij,kj->k", jnp.conj(Psi), Dj, Psi))

    xi_auto = make_xi(g_b, None)
    Psi = jnp.asarray(
        rng.normal(size=(K, N)) + 1j * rng.normal(size=(K, N))
    )
    tlist = jnp.linspace(0, 1, 11)
    got = np.asarray(xi_auto(Psi, None, tlist, 1))
    want = -np.einsum("ij,kj->ki", D, np.asarray(Psi))
    assert np.linalg.norm(got - want) < 1e-14


def test_gb_label_warnings():
    """Requesting the wrong gradient label emits the reference's warnings
    (`src/optimize.jl:383-401`)."""
    rng = np.random.default_rng(1)
    problem = dummy_control_problem(N=4, rng=rng)

    def g_b(Psi, trajectories, tlist, n):
        return jnp.sum(jnp.abs(Psi) ** 2, axis=-1)

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        optimize_problem(
            problem, J_T=J_T_re, g_b=g_b, lambda_b=1e-3, iter_stop=1,
            print_iter_info=["iter.", "J_T", "ǁ∇J_Tǁ"],
            rethrow_exceptions=True,
        )
    assert any('ǁ∇(J_T+λ_b·J_b)ǁ' in str(w.message) for w in caught)

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        optimize_problem(
            problem, J_T=J_T_re, iter_stop=1,
            print_iter_info=["iter.", "J_T", "ǁ∇(J_T+λ_b·J_b)ǁ"],
            rethrow_exceptions=True,
        )
    assert any(
        "does not include a state-dependent" in str(w.message) for w in caught
    )


class TestSTIRAP:
    """STIRAP 3-level ladder system (reference
    `test/test_state_running_cost.jl:180-353`)."""

    @pytest.fixture(scope="class")
    def setup(self):
        w1, w2, w3 = 0.0, 10.0, 5.0
        wP, wS = 9.5, 4.5
        dP = (w2 - w1) - wP
        dS = (w2 - w3) - wS
        H0 = np.diag([0.0, dP, dP - dS]).astype(complex)
        H1P_re = 0.5 * np.array(
            [[0, 1, 0], [1, 0, 0], [0, 0, 0]], dtype=complex
        )
        H1P_im = 0.5 * np.array(
            [[0, 1j, 0], [-1j, 0, 0], [0, 0, 0]], dtype=complex
        )
        H1S_re = 0.5 * np.array(
            [[0, 0, 0], [0, 0, 1], [0, 1, 0]], dtype=complex
        )
        H1S_im = 0.5 * np.array(
            [[0, 0, 0], [0, 0, 1j], [0, -1j, 0]], dtype=complex
        )

        def eps_P(t):
            return float(blackman(t, 1.0, 5.0))

        def eps_P_im(t):
            return 0.0

        def eps_S(t):
            return float(blackman(t, 0.0, 4.0))

        def eps_S_im(t):
            return 0.0

        H = hamiltonian(
            H0, (H1P_re, eps_P), (H1P_im, eps_P_im),
            (H1S_re, eps_S), (H1S_im, eps_S_im),
        )
        tlist = np.linspace(0, 5, 501)
        ket1 = np.array([1, 0, 0], dtype=complex)
        ket3 = np.array([0, 0, 1], dtype=complex)
        trajectory = Trajectory(ket1, H, target_state=ket3)

        def g_b(Psi, trajectories, tl, n):
            return jnp.abs(Psi[..., 1]) ** 2

        def xi(Psi, trajectories, tl, n):
            out = jnp.zeros_like(Psi)
            return out.at[..., 1].set(-Psi[..., 1])

        return dict(
            H=H, tlist=tlist, trajectory=trajectory, g_b=g_b, xi=xi,
            ket1=ket1,
        )

    def _pmax2(self, setup, result):
        H_opt = substitute(
            setup["H"],
            list(zip(get_controls(setup["H"]), result.optimized_controls)),
        )
        dyn = propagate(
            setup["ket1"], H_opt, setup["tlist"], storage=True
        )
        return float(np.max(np.abs(dyn[:, 1]) ** 2))

    @pytest.fixture(scope="class")
    def result1(self, setup):
        problem1 = ControlProblem(
            [setup["trajectory"]], setup["tlist"],
            J_T=J_T_ss, iter_stop=50,
            g_b=setup["g_b"], lambda_b=0.0,
            check_convergence=lambda res: (
                "J_T < 10⁻²" if res.J_T <= 1e-2 else ""
            ),
            print_iters=False, rethrow_exceptions=True,
        )
        return optimize_problem(problem1)

    @pytest.fixture(scope="class")
    def problem2(self, setup):
        return ControlProblem(
            [setup["trajectory"]], setup["tlist"],
            J_T=J_T_ss, iter_stop=100,
            check_convergence=lambda res: (
                res.J_T <= 1e-2 and res.J_b <= 1e-2
            ),
            g_b=setup["g_b"], xi=setup["xi"], lambda_b=4e-1,
            store_iter_info=["J", "J_T", "J_b", "λ_b⋅J_b", "ǁ∇Jǁ", "ΔJ"],
            print_iters=False, rethrow_exceptions=True,
        )

    def test_without_running_cost(self, setup, result1):
        assert result1.J_b == 0.0
        assert result1.J_b_prev == 0.0
        assert result1.converged
        Pmax1 = self._pmax2(setup, result1)
        assert Pmax1 > 0.5

    def test_running_cost_suppresses_population(
        self, setup, result1, problem2
    ):
        result2 = optimize_problem(problem2)
        assert result2.iter > result1.iter + 10
        assert result2.converged
        assert result2.message == "Convergence check returned true"
        assert result2.J_b > 0.0
        assert result2.J_b_prev > 0.0
        # monotonic convergence: ΔJ < 0 after iteration 0
        deltas = [rec[-1] for rec in result2.records][1:]
        assert max(deltas) < 0
        Pmax1 = self._pmax2(setup, result1)
        Pmax2 = self._pmax2(setup, result2)
        assert Pmax2 / Pmax1 < 1e-1

        # taylor gradient method agrees within 15%
        result3 = optimize_problem(problem2, gradient_method="taylor")
        assert result3.converged
        Pmax3 = self._pmax2(setup, result3)
        assert abs(Pmax3 - Pmax2) / Pmax3 < 0.15

    def test_wrong_sign_xi_does_not_converge(self, setup, problem2):
        def xi_wrong(Psi, trajectories, tl, n):
            out = jnp.zeros_like(Psi)
            return out.at[..., 1].set(Psi[..., 1])  # incorrect sign

        result4 = optimize_problem(problem2, xi=xi_wrong)
        assert not result4.converged
