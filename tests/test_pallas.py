"""Pallas fused forward-propagation kernel: interpret-mode correctness
against the XLA expm path (the real-TPU path is exercised by bench.py).
The kernel is the TPU-native replacement for the reference's ExpProp
forward propagation loop (``/root/reference/src/optimize.jl:731-738``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grape_tpu.ops.expm import expm
from grape_tpu.ops.pallas_prop import forward_scan_pallas


def test_forward_scan_pallas_interpret():
    rng = np.random.default_rng(0)
    K, d, T, N_T = 2, 8, 3, 5
    H0 = rng.normal(size=(K, d, d))
    H0 = (H0 + np.swapaxes(H0, -1, -2)) + 0j
    ops = rng.normal(size=(K, T, d, d))
    ops = (ops + np.swapaxes(ops, -1, -2)) + 0j
    coeffs = rng.normal(size=(N_T, T)).astype(np.float32) * 0.3
    dts = np.full(N_T, 0.1, dtype=np.float32)
    psi0 = rng.normal(size=(K, d)) + 1j * rng.normal(size=(K, d))
    psi0 /= np.linalg.norm(psi0, axis=1, keepdims=True)

    st = np.asarray(
        forward_scan_pallas(
            jnp.asarray(H0, dtype=jnp.complex64),
            jnp.asarray(ops, dtype=jnp.complex64),
            coeffs, dts, jnp.asarray(psi0, dtype=jnp.complex64),
            n_squarings=2, interpret=True,
        )
    )
    psi = psi0.copy()
    ref = [psi0.copy()]
    for n in range(N_T):
        H = H0 + np.einsum("t,ktij->kij", coeffs[n], ops)
        U = np.asarray(expm((-1j * dts[n] * H).astype(np.complex64)))
        psi = np.einsum("kij,kj->ki", U, psi)
        ref.append(psi.copy())
    assert np.max(np.abs(st - np.stack(ref))) < 1e-5
    # norms preserved (unitary propagation)
    assert np.allclose(
        np.linalg.norm(st[-1], axis=-1), 1.0, atol=1e-5
    )


def test_forward_scan_pallas_time_grid_interpret():
    """The (N_T,)-grid variant (trajectories unrolled in-kernel) matches
    the (K, N_T)-grid kernel exactly."""
    from grape_tpu.ops.pallas_prop import forward_scan_pallas_time

    rng = np.random.default_rng(3)
    K, d, T, N_T = 3, 8, 2, 6
    H0 = rng.normal(size=(K, d, d))
    H0 = (H0 + np.swapaxes(H0, -1, -2)) + 0j
    ops = rng.normal(size=(K, T, d, d))
    ops = (ops + np.swapaxes(ops, -1, -2)) + 0j
    coeffs = rng.normal(size=(N_T, T)).astype(np.float32) * 0.3
    dts = np.full(N_T, 0.1, dtype=np.float32)
    psi0 = rng.normal(size=(K, d)) + 1j * rng.normal(size=(K, d))
    psi0 /= np.linalg.norm(psi0, axis=1, keepdims=True)
    args = (
        jnp.asarray(H0, dtype=jnp.complex64),
        jnp.asarray(ops, dtype=jnp.complex64),
        coeffs, dts, jnp.asarray(psi0, dtype=jnp.complex64),
    )
    a = np.asarray(
        forward_scan_pallas_time(*args, n_squarings=2, interpret=True)
    )
    b = np.asarray(forward_scan_pallas(*args, n_squarings=2, interpret=True))
    assert np.max(np.abs(a - b)) < 1e-6


def test_backward_scan_pallas_interpret():
    """The fused backward kernel reproduces the XLA taylor branch
    (taylor_grad_step + expm co-state propagation, reference semantics at
    ``/root/reference/src/optimize.jl:913-994``): per-step
    grad[n,l] = <chi'_l(t_n)|psi(t_n)> over a random NON-Hermitian
    generator, locked term included."""
    from grape_tpu.ops.frechet import taylor_grad_step
    from grape_tpu.ops.pallas_prop import (
        backward_scan_pallas, taylor_order_for_bound,
    )

    rng = np.random.default_rng(7)
    K, d, T, N_T, L = 2, 8, 3, 6, 2
    ctl_idx = (0, 1, None)  # term 2 is locked (no control)
    H0 = rng.normal(size=(K, d, d)) + 1j * rng.normal(size=(K, d, d))
    ops = rng.normal(size=(K, T, d, d)) + 1j * rng.normal(size=(K, T, d, d))
    H0 *= 0.5
    ops *= 0.5
    coeffs = (rng.normal(size=(N_T, T)) * 0.3).astype(np.float32)
    mmu = (rng.uniform(0.5, 1.0, size=(N_T, T))).astype(np.float32)
    mmu[:, 2] = 0.0  # locked term exposes no control derivative
    dts = np.full(N_T, 0.1, dtype=np.float32)
    psi = rng.normal(size=(2, K, N_T + 1, d)).astype(np.float32)
    chi = rng.normal(size=(2, K, d)).astype(np.float32)

    order = taylor_order_for_bound(1.5, tolerance=1e-9)
    gradr, gradi = backward_scan_pallas(
        jnp.asarray(H0, dtype=jnp.complex64),
        jnp.asarray(ops, dtype=jnp.complex64),
        coeffs, mmu, ctl_idx, dts, psi, chi,
        n_squarings=1, taylor_order=order, interpret=True,
    )
    got = np.asarray(gradr) + 1j * np.asarray(gradi)  # (K, N_T, L)

    # independent reference: the XLA taylor branch step by step
    chi_c = (chi[0] + 1j * chi[1]).astype(np.complex128)
    psi_c = (psi[0] + 1j * psi[1]).astype(np.complex128)
    ref = np.zeros((K, N_T, L), dtype=np.complex128)
    for n in range(N_T - 1, -1, -1):
        H = H0 + np.einsum("t,ktij->kij", coeffs[n], ops)
        Hd = np.conj(np.swapaxes(H, -1, -2))
        mu = np.zeros((K, L, d, d), dtype=complex)
        for j, l in enumerate(ctl_idx):
            if l is not None:
                mu[:, l] += mmu[n, j] * ops[:, j]
        mud = np.conj(np.swapaxes(mu, -1, -2))
        chi_prime = np.asarray(taylor_grad_step(
            jnp.asarray(Hd), jnp.asarray(mud), jnp.asarray(chi_c),
            -float(dts[n]), tolerance=1e-14,
        ))
        ref[:, n, :] = np.einsum(
            "kli,ki->kl", np.conj(chi_prime), psi_c[:, n, :]
        )
        import scipy.linalg
        for k in range(K):
            U = scipy.linalg.expm(1j * float(dts[n]) * Hd[k])
            chi_c[k] = U @ chi_c[k]
    assert np.max(np.abs(got - ref)) < 5e-5
