"""Gold-standard kernel test (port of the reference's
``test/test_taylor_grad.jl``): verify the Taylor-recursion and
augmented-expm gradient kernels against an *independent* operator-level
Taylor/commutator series for ``∂/∂ε exp(-i H dt)`` (de Fouquières et al.,
JMR 212, 412 (2011), Eq. (14)), on random non-Hermitian matrices, forward
and backward dt."""

import numpy as np
import scipy.linalg

from grape_tpu.ops import gradgen_step, taylor_grad_step


def random_matrix(N, rng):
    return (rng.normal(size=(N, N)) + 1j * rng.normal(size=(N, N))) / np.sqrt(N)


def random_state(N, rng):
    psi = rng.normal(size=N) + 1j * rng.normal(size=N)
    return psi / np.linalg.norm(psi)


def U_grad(H, mu, dt):
    """∂/∂ε exp(-i H dt) via the independent operator series (Eq. 14)."""
    U = scipy.linalg.expm(-1j * H * dt)
    C = mu
    terms = [(-1j * dt) * C]
    n = 2
    fact = 1.0
    while True:
        C = H @ C - C @ H
        fact *= n
        term = -((1j * dt) ** n / fact) * C
        terms.append(term)
        if np.linalg.norm(term) < 1e-16:
            break
        n += 1
        assert n < 200
    return U @ sum(terms)


def test_taylor_grad_step():
    rng = np.random.default_rng(3991576559)
    N = 10
    H0 = random_matrix(N, rng)
    H1 = random_matrix(N, rng)
    H2 = random_matrix(N, rng)
    H = H0 + H1 + H2  # both controls at value 1.0
    psi = random_state(N, rng)
    mus = np.stack([H1, H2])

    for dt in (1.25, -1.25):
        expected = np.stack([U_grad(H, H1, dt) @ psi, U_grad(H, H2, dt) @ psi])
        got = np.asarray(
            taylor_grad_step(
                H[None], mus[None], psi[None], dt,
                max_order=200, tolerance=1e-16,
            )
        )[0]
        assert np.linalg.norm(expected - got) < 1e-12, f"dt={dt}"


def test_gradgen_step_vs_operator_series():
    """The augmented-expm (gradgen) kernel must agree with the same series."""
    rng = np.random.default_rng(12345)
    N = 8
    H = random_matrix(N, rng)
    mu = random_matrix(N, rng)
    psi = random_state(N, rng)
    for dt in (0.8, -0.8):
        expected = U_grad(H, mu, dt) @ psi
        chi_prime, chi_new = gradgen_step(
            H[None], mu[None, None], psi[None], dt
        )
        got = np.asarray(chi_prime)[0, 0]
        assert np.linalg.norm(expected - got) < 1e-12, f"dt={dt}"
        U = scipy.linalg.expm(-1j * H * dt)
        assert np.linalg.norm(np.asarray(chi_new)[0] - U @ psi) < 1e-12


def test_taylor_vs_gradgen():
    """The two gradient engines agree (reference anchors 1e-10 agreement)."""
    rng = np.random.default_rng(99)
    K, L, N = 3, 2, 6
    H = np.stack([random_matrix(N, rng) for _ in range(K)])
    mu = np.stack(
        [np.stack([random_matrix(N, rng) for _ in range(L)]) for _ in range(K)]
    )
    chi = np.stack([random_state(N, rng) for _ in range(K)])
    dt = -0.3
    cp_taylor = np.asarray(
        taylor_grad_step(H, mu, chi, dt, max_order=100, tolerance=1e-16)
    )
    cp_gradgen, _ = gradgen_step(H, mu, chi, dt)
    assert np.linalg.norm(cp_taylor - np.asarray(cp_gradgen)) < 1e-12
