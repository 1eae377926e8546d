"""Krylov/Newton propagator tests: Arnoldi expmv accuracy (non-Hermitian),
full GRAPE parity on the TLS anchors, and the per-direction propagator
prefix overrides (reference ``src/docstring.jl:201-225``)."""

import numpy as np
import scipy.linalg
import jax.numpy as jnp
import pytest

from grape_tpu import Trajectory, hamiltonian, optimize
from grape_tpu.functionals import J_T_sm
from grape_tpu.ops.newton import arnoldi_expmv
from grape_tpu.shapes import flattop


def test_arnoldi_expmv_non_hermitian():
    rng = np.random.default_rng(0)
    K, d = 3, 20
    A = rng.normal(size=(K, d, d)) + 1j * rng.normal(size=(K, d, d))
    A = -1j * 0.3 * A  # generic non-Hermitian (Cheby would not apply)
    psi = rng.normal(size=(K, d)) + 1j * rng.normal(size=(K, d))
    psi /= np.linalg.norm(psi, axis=1, keepdims=True)
    Aj = jnp.asarray(A)
    out = np.asarray(
        arnoldi_expmv(
            lambda v: jnp.einsum("kij,kj->ki", Aj, v), jnp.asarray(psi),
            m=30,
        )
    )
    ref = np.stack([scipy.linalg.expm(A[k]) @ psi[k] for k in range(K)])
    assert np.max(np.abs(out - ref)) < 1e-12


def test_arnoldi_expmv_substeps():
    rng = np.random.default_rng(1)
    K, d = 2, 12
    A = -1j * 2.0 * (
        rng.normal(size=(K, d, d)) + 1j * rng.normal(size=(K, d, d))
    )
    psi = rng.normal(size=(K, d)) + 1j * rng.normal(size=(K, d))
    Aj = jnp.asarray(A)
    out = np.asarray(
        arnoldi_expmv(
            lambda v: jnp.einsum("kij,kj->ki", Aj, v), jnp.asarray(psi),
            m=30, substeps=4,
        )
    )
    ref = np.stack([scipy.linalg.expm(A[k]) @ psi[k] for k in range(K)])
    assert np.max(np.abs(out - ref)) / np.max(np.abs(ref)) < 1e-9


def _tls():
    def eps(t):
        return 0.2 * float(flattop(t, T=5, t_rise=0.3, func="blackman"))

    sz = np.array([[1, 0], [0, -1]], dtype=complex)
    sx = np.array([[0, 1], [1, 0]], dtype=complex)
    H = hamiltonian(-0.5 * sz, (sx, eps))
    tlist = np.linspace(0, 5, 501)
    return [Trajectory([1, 0], H, target_state=[0, 1])], tlist


@pytest.mark.parametrize("gradient_method", ["gradgen", "taylor"])
def test_tls_with_newton(gradient_method):
    trajs, tlist = _tls()
    res = optimize(
        trajs, tlist, iter_stop=5, J_T=J_T_sm, prop_method="newton",
        newton_m=6, gradient_method=gradient_method,
        rethrow_exceptions=True, print_iters=False,
    )
    assert res.J_T < 1e-3
    assert 0.75 < np.max(np.abs(res.optimized_controls[0])) < 0.85


def test_per_direction_prop_methods():
    """Mixed propagators per direction: expprop forward, newton backward,
    cheby gradient-generator (the reference's fw_prop_/bw_prop_/grad_prop_
    prefix system)."""
    trajs, tlist = _tls()
    res = optimize(
        trajs, tlist, iter_stop=5, J_T=J_T_sm,
        fw_prop_method="expprop", bw_prop_method="newton",
        grad_prop_method="cheby", newton_m=8,
        gradient_method="taylor",  # chi prop via newton
        rethrow_exceptions=True, print_iters=False,
    )
    assert res.J_T < 1e-3

    res2 = optimize(
        trajs, tlist, iter_stop=5, J_T=J_T_sm,
        fw_prop_method="cheby", grad_prop_method="newton", newton_m=8,
        gradient_method="gradgen",  # extended prop via newton
        rethrow_exceptions=True, print_iters=False,
    )
    assert res2.J_T < 1e-3
    assert abs(res.J_T - res2.J_T) < 1e-6
