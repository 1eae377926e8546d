"""Exact per-time-step gradient kernels.

TPU-native replacements for the reference's two gradient engines:

- ``gradgen_step``: the augmented-matrix ("gradient generator" / Van Loan)
  scheme.  The reference backward-propagates an extended state of dimension
  ``N(L+1)`` under a block generator (QuantumGradientGenerators; structure at
  ``/root/reference/docs/src/background.md:443-496``).  On TPU we instead
  batch ``L`` independent ``2d x 2d`` augmented exponentials
  ``exp([[A, B_l], [0, A]])`` whose top-right block is the Fréchet derivative
  ``L(A, B_l)`` — an MXU-friendly batched-matmul workload that yields
  ``U†χ`` and all ``(∂U†/∂ε_l)χ`` in one fused call.

- ``taylor_grad_step``: the Taylor-recursion scheme of Kuprov & Rogers
  Eq. (20), mirroring ``taylor_grad_step!`` at
  ``/root/reference/src/optimize.jl:587-653``: matvec-only, preferable for
  large dimensions.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .expm import expm

__all__ = ["gradgen_step", "taylor_grad_step", "expm_frechet"]


def expm_frechet(A, B):
    """``(expm(A), L(A, B))`` via the augmented block matrix.

    ``A (..., d, d)``, ``B (..., L, d, d)`` (or ``(..., d, d)``).  Returns
    ``E = expm(A)`` and the Fréchet derivative(s) ``L(A, B)``, batched over
    the leading/``L`` axes.
    """
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    squeeze = False
    if B.ndim == A.ndim:
        B = B[..., None, :, :]
        squeeze = True
    d = A.shape[-1]
    Ab = jnp.broadcast_to(A[..., None, :, :], B.shape)
    zero = jnp.zeros_like(Ab)
    top = jnp.concatenate([Ab, B], axis=-1)
    bot = jnp.concatenate([zero, Ab], axis=-1)
    M = jnp.concatenate([top, bot], axis=-2)  # (..., L, 2d, 2d)
    EM = expm(M)
    E = EM[..., 0, :d, :d]
    Lf = EM[..., :d, d:]
    if squeeze:
        Lf = Lf[..., 0, :, :]
    return E, Lf


def gradgen_step(H, mu, chi, dt):
    """One backward gradient-generator step.

    Given the (already adjoint) generator ``H (..., d, d)``, control
    derivatives ``mu (..., L, d, d)``, co-state ``chi (..., d)`` and the
    *backward* step ``dt`` (so the propagator applied is
    ``exp(-1j * H * dt)`` with ``dt < 0`` for backward propagation of the
    adjoint generator), returns ``(chi_prime, chi_new)`` where

    - ``chi_new (..., d)``   = ``exp(-1j H dt) @ chi``
    - ``chi_prime (..., L, d)`` = ``(∂/∂ε_l exp(-1j H dt)) @ chi``

    matching the reference's extended-state step (background.md Eq. for
    ``|χ'_l(t_{n-1})⟩``).
    """
    A = -1j * dt * H
    B = -1j * dt * mu
    E, Lf = expm_frechet(A, B)
    chi_new = jnp.einsum("...ij,...j->...i", E, chi)
    chi_prime = jnp.einsum("...lij,...j->...li", Lf, chi)
    return chi_prime, chi_new


def taylor_grad_step(H, mu, chi, dt, max_order=100, tolerance=1e-16,
                     check_convergence=True, with_status=False, scale=None):
    """Taylor-series evaluation of ``(∂/∂ε exp(-1j H dt)) @ chi``.

    Recursion (reference ``src/optimize.jl:604-653`` / Kuprov & Rogers (20)):

        chi' = Σ_{m≥1} (-1j dt)^m / m! · Φ_m
        Φ_1 = mu @ chi
        Φ_m = mu @ H^{m-1} @ chi + H @ Φ_{m-1}

    ``H (..., d, d)``, ``mu (..., L, d, d)``, ``chi (..., d)``.  Returns
    ``chi_prime (..., L, d)``.  With ``check_convergence``, the series stops
    once the norm of the added term (max over the batch) falls below
    ``tolerance``; otherwise exactly ``max_order`` terms are used.  The series
    runs under ``lax.while_loop`` with a static ``max_order`` bound.

    ``scale`` (a static host-side bound on the norm of ``H``) rescales the
    recursion to iterate with ``H/scale``: the iterates stay O(1) and the
    series weight ``(-i dt scale)^m/m!`` stays in f32 normal range.  The
    unscaled recursion drives ``Φ_m ~ ‖H‖^m`` toward overflow while the
    coefficient underflows — on TPU (flush-to-zero, no denormals) that
    silently truncates the series early.  Mathematically identical.
    """
    A = jnp.asarray(H)
    mu = jnp.asarray(mu)
    chi = jnp.asarray(chi)
    if scale is not None and float(scale) > 0:
        h = float(scale)
        A = A / np.dtype(A.dtype).type(h)
        cdt = jnp.asarray(-1j * dt * h, dtype=A.dtype)
        inv_h = np.dtype(A.dtype).type(1.0 / h)
    else:
        h = 1.0
        cdt = jnp.asarray(-1j * dt, dtype=A.dtype)
        inv_h = np.dtype(A.dtype).type(1.0)
    tolerance = tolerance * h  # terms below are scaled by h

    Hchi0 = chi  # (H/h)^{m-1} chi for m=1 -> identity
    phi1 = jnp.einsum("...lij,...j->...li", mu, chi)
    acc = cdt * phi1  # m=1 term (scaled by h)
    coeff = cdt

    def cond(state):
        m, _, _, _, _, done = state
        return jnp.logical_and(m <= max_order, jnp.logical_not(done))

    def body(state):
        m, Hm_chi, phi_prev, acc, coeff, _ = state
        # H^{m-1} chi for current m
        Hm_chi = jnp.einsum("...ij,...j->...i", A, Hm_chi)
        phi = (
            jnp.einsum("...lij,...j->...li", mu, Hm_chi)
            + jnp.einsum("...ij,...lj->...li", A, phi_prev)
        )
        coeff = coeff * cdt / m
        term = coeff * phi
        acc_new = acc + term
        if check_convergence:
            term_norm = jnp.sqrt(jnp.max(jnp.sum(jnp.abs(term) ** 2, axis=-1)))
            done = term_norm < tolerance
        else:
            done = jnp.asarray(False)
        return (m + 1, Hm_chi, phi, acc_new, coeff, done)

    init = (jnp.asarray(2), Hchi0, phi1, acc, coeff, jnp.asarray(False))
    m_final, _, _, acc, _, done = lax.while_loop(cond, body, init)
    acc = acc * inv_h
    if with_status:
        # converged iff the tolerance stop fired (not the max_order cap);
        # the reference raises on non-convergence (src/optimize.jl:640-646)
        converged = jnp.logical_or(
            jnp.logical_not(jnp.asarray(check_convergence)), done
        )
        return acc, converged
    return acc
