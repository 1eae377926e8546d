"""Chebyshev propagator tests: series vs dense expm, and full GRAPE parity
between prop_method='cheby' and 'expprop' on the TLS benchmark (reference
uses Cheby at `test/test_lbfgsb_saddle_point.jl:109` and in the STIRAP
tutorial)."""

import numpy as np
import scipy.linalg
import jax.numpy as jnp
import pytest

from grape_tpu import Trajectory, hamiltonian, optimize
from grape_tpu.functionals import J_T_sm
from grape_tpu.ops.cheby import cheby_apply, cheby_coeffs, spectral_envelope
from grape_tpu.shapes import flattop


@pytest.mark.parametrize("dt", [0.1, 1.7, -0.6])
def test_cheby_vs_expm(dt):
    rng = np.random.default_rng(17)
    d = 12
    A = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    H = 0.5 * (A + A.conj().T)
    w = np.linalg.eigvalsh(H)
    E_min, E_max = w[0] - 0.1, w[-1] + 0.1
    dE = E_max - E_min
    shift = E_max + E_min
    Hn = jnp.asarray((2 * H - shift * np.eye(d)) / dE)
    alpha = 0.5 * dE * dt
    coeffs = cheby_coeffs(alpha)
    phase = np.exp(-1j * 0.5 * shift * dt)
    psi = rng.normal(size=d) + 1j * rng.normal(size=d)
    psi /= np.linalg.norm(psi)
    got = np.asarray(
        cheby_apply(lambda v: Hn @ v, jnp.asarray(psi), coeffs, phase)
    )
    want = scipy.linalg.expm(-1j * H * dt) @ psi
    assert np.linalg.norm(got - want) < 1e-12


def test_spectral_envelope_contains_spectrum():
    rng = np.random.default_rng(3)
    d = 6
    H0 = rng.normal(size=(1, d, d))
    H0 = 0.5 * (H0 + np.swapaxes(H0, -1, -2))
    ops = rng.normal(size=(1, 2, d, d))
    ops = 0.5 * (ops + np.swapaxes(ops, -1, -2))
    E_min, E_max = spectral_envelope(H0, ops, [-1.5, -0.5], [1.5, 0.5])
    for c1 in (-1.5, 0, 1.5):
        for c2 in (-0.5, 0, 0.5):
            w = np.linalg.eigvalsh(H0[0] + c1 * ops[0, 0] + c2 * ops[0, 1])
            assert w[0] >= E_min and w[-1] <= E_max


@pytest.mark.parametrize("gradient_method", ["gradgen", "taylor"])
def test_tls_with_cheby(gradient_method):
    """Full GRAPE with the Chebyshev propagator reproduces the ExpProp
    result (J_T < 1e-3 in 5 iterations, amplitude window)."""

    def eps(t):
        return 0.2 * float(flattop(t, T=5, t_rise=0.3, func="blackman"))

    sz = np.array([[1, 0], [0, -1]], dtype=complex)
    sx = np.array([[0, 1], [1, 0]], dtype=complex)
    H = hamiltonian(-0.5 * sz, (sx, eps))
    tlist = np.linspace(0, 5, 501)
    traj = Trajectory([1, 0], H, target_state=[0, 1])
    res = optimize(
        [traj], tlist, iter_stop=5, J_T=J_T_sm, prop_method="cheby",
        gradient_method=gradient_method,
        rethrow_exceptions=True, print_iters=False,
    )
    assert res.J_T < 1e-3
    assert 0.75 < np.max(np.abs(res.optimized_controls[0])) < 0.85

    res_exp = optimize(
        [traj], tlist, iter_stop=5, J_T=J_T_sm, prop_method="expprop",
        gradient_method=gradient_method,
        rethrow_exceptions=True, print_iters=False,
    )
    # same physics; final J_T in close agreement
    assert abs(res.J_T - res_exp.J_T) < 1e-6


@pytest.mark.parametrize("gradient_method", ["gradgen", "taylor"])
def test_large_dim_cheby_gradient_agreement(gradient_method):
    """Large-dim agreement pin for the Chebyshev-propagated gradients
    (VERDICT round-2 item 7: the dim-256/1024 sweep rows now include
    gradgen; this anchors the extended-state cheby gradgen path at a
    CPU-tractable dim=36 against the exact ExpProp gradient)."""
    from grape_tpu.fg import build_fg, compile_problem
    from grape_tpu.models import two_transmon_cz_problem

    problem = two_transmon_cz_problem(d=6, n_steps=40, T=5.0)
    kw = dict(problem.kwargs)
    kw.pop("prop_method", None)
    cp_exp = compile_problem(
        problem.trajectories, problem.tlist,
        gradient_method=gradient_method, **kw
    )
    cp_cheb = compile_problem(
        problem.trajectories, problem.tlist,
        gradient_method=gradient_method, prop_method="cheby", **kw
    )
    assert cp_exp.dim == 36
    x = cp_exp.guess_pulsevals.reshape(-1)
    J_e, G_e, _ = build_fg(cp_exp)(x)
    J_c, G_c, _ = build_fg(cp_cheb)(x)
    np.testing.assert_allclose(float(J_c), float(J_e), atol=1e-10)
    scale = np.max(np.abs(np.asarray(G_e)))
    np.testing.assert_allclose(
        np.asarray(G_c), np.asarray(G_e), atol=1e-9 * max(scale, 1.0)
    )
