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




def test_forward_scan_pallas_shared_interpret():
    """The shared-generator forward kernel (one expm per step applied to
    the (K, d) state block, with U streaming) matches per-step dense
    expm propagation (the reference's ExpProp semantics,
    `/root/reference/README.md:38`; gate problems = K basis trajectories
    under one generator as in `/root/reference/test/test_lbfgsb_saddle_point.jl:40-47`)."""
    from grape_tpu.ops.expm import expm
    from grape_tpu.ops.pallas_prop import forward_scan_pallas_shared

    rng = np.random.default_rng(11)
    K, d, T, N_T = 3, 8, 2, 5
    H0 = (rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d)))
    H0 = (0.5 * (H0 + H0.conj().T)).astype(np.complex64)
    ops = rng.normal(size=(T, d, d)) + 1j * rng.normal(size=(T, d, d))
    ops = (0.5 * (ops + np.conj(np.swapaxes(ops, -1, -2)))).astype(
        np.complex64
    )
    coeffs = (rng.normal(size=(N_T, T)) * 0.3).astype(np.float32)
    dts = np.full(N_T, 0.1, dtype=np.float32)
    psi0 = (rng.normal(size=(K, d)) + 1j * rng.normal(size=(K, d)))
    psi0 = (psi0 / np.linalg.norm(psi0, axis=1, keepdims=True)).astype(
        np.complex64
    )
    st, U = forward_scan_pallas_shared(
        H0, ops, coeffs, dts, jnp.asarray(psi0),
        n_squarings=1, with_propagators=True, interpret=True,
    )
    psi = psi0.astype(np.complex128)
    for n in range(N_T):
        H = H0.astype(np.complex128) + np.einsum(
            "t,tij->ij", coeffs[n], ops.astype(np.complex128)
        )
        Un = np.asarray(expm(jnp.asarray(-1j * float(dts[n]) * H)))
        psi = psi @ Un.T
        assert np.abs(np.asarray(U[n]) - Un).max() < 1e-5
        assert np.abs(np.asarray(st[n + 1]) - psi).max() < 1e-5


def test_forward_scan_pallas_smalld_interpret():
    """The small-dim ensemble kernel ((d², K) lane layout, per-trajectory
    generators) matches per-step dense expm propagation — the ensemble
    robustness-sampling pattern (reference ensemble usage per
    `/root/reference/docs/src/tutorial.md`; ExpProp semantics,
    `/root/reference/README.md:38`)."""
    import scipy.linalg as sla

    from grape_tpu.ops.pallas_prop import forward_scan_pallas_smalld

    rng = np.random.default_rng(5)
    K, d, T, N_T = 8, 3, 2, 4
    H0 = rng.normal(size=(K, d, d)) + 1j * rng.normal(size=(K, d, d))
    H0 = (0.5 * (H0 + np.conj(np.swapaxes(H0, -1, -2)))).astype(
        np.complex64
    )
    ops = rng.normal(size=(K, T, d, d)) + 1j * rng.normal(size=(K, T, d, d))
    ops = (0.5 * (ops + np.conj(np.swapaxes(ops, -1, -2)))).astype(
        np.complex64
    )
    coeffs = (rng.normal(size=(N_T, T)) * 0.3).astype(np.float32)
    dts = np.full(N_T, 0.1, dtype=np.float32)
    psi0 = rng.normal(size=(K, d)) + 1j * rng.normal(size=(K, d))
    psi0 = (psi0 / np.linalg.norm(psi0, axis=1, keepdims=True)).astype(
        np.complex64
    )
    st, U = forward_scan_pallas_smalld(
        H0, ops, coeffs, dts, jnp.asarray(psi0),
        n_squarings=1, with_propagators=True, interpret=True,
    )
    psi = psi0.astype(np.complex128)
    for n in range(N_T):
        for k in range(K):
            H = H0[k].astype(np.complex128) + np.einsum(
                "t,tij->ij", coeffs[n], ops[k].astype(np.complex128)
            )
            Un = sla.expm(-1j * float(dts[n]) * H)
            assert np.abs(np.asarray(U[n, k]) - Un).max() < 1e-5
            psi[k] = Un @ psi[k]
        assert np.abs(np.asarray(st[n + 1]) - psi).max() < 1e-5


def test_chi_scan_pallas_shared_interpret():
    """The fused χ-chain kernel reproduces the sequential adjoint
    propagation χ(t_n) = U_n†χ(t_{n+1}) with stored shared propagators
    (the backward co-state loop of `/root/reference/src/optimize.jl:920-922`
    with the exact-adjoint reuse identity)."""
    from grape_tpu.ops.pallas_prop import chi_scan_pallas_shared

    rng = np.random.default_rng(3)
    N_T, K, d = 7, 4, 8
    Us = (
        (rng.normal(size=(N_T, d, d)) + 1j * rng.normal(size=(N_T, d, d)))
        / np.sqrt(2 * d)
    ).astype(np.complex64)
    chi = (rng.normal(size=(K, d)) + 1j * rng.normal(size=(K, d))).astype(
        np.complex64
    )
    got = np.asarray(
        chi_scan_pallas_shared(jnp.asarray(Us), jnp.asarray(chi),
                               interpret=True)
    )
    c = chi.astype(np.complex128)
    ref = np.zeros((N_T, K, d), complex)
    for n in range(N_T - 1, -1, -1):
        ref[n] = c
        c = c @ np.conj(Us[n])
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-6


def test_frechet_trace_pallas_shared_interpret():
    """Fused rank-1 Fréchet trace kernel vs the XLA expm_frechet path
    (the gradgen backward's per-step math, VERDICT round-3 item 1)."""
    from grape_tpu.ops.frechet import expm_frechet
    from grape_tpu.ops.pallas_frechet import frechet_trace_pallas_shared

    rng = np.random.default_rng(1)
    d, K, T, N_T, s = 8, 3, 2, 4, 2
    H0 = rng.normal(size=(d, d))
    H0 = (H0 + H0.T) + 0j
    ops = rng.normal(size=(T, d, d))
    ops = (ops + np.swapaxes(ops, -1, -2)) + 0j
    coeffs = (0.3 * rng.normal(size=(N_T, T))).astype(np.float32)
    dts = np.full(N_T, 0.1, dtype=np.float32)
    psis = (rng.normal(size=(N_T, K, d))
            + 1j * rng.normal(size=(N_T, K, d))).astype(np.complex64)
    chis = (rng.normal(size=(N_T, K, d))
            + 1j * rng.normal(size=(N_T, K, d))).astype(np.complex64)

    trj = np.asarray(frechet_trace_pallas_shared(
        jnp.asarray(H0, dtype=jnp.complex64),
        jnp.asarray(ops, dtype=jnp.complex64),
        coeffs, dts, jnp.asarray(psis), jnp.asarray(chis),
        n_squarings=s, interpret=True,
    ))
    assert trj.shape == (N_T, K, T)

    # reference: expm_frechet in the rank-1 directions, trace with ops
    for n in range(N_T):
        H = (H0 + np.einsum("t,tij->ij", coeffs[n], ops)).astype(
            np.complex64
        )
        A = -1j * dts[n] * H
        R = np.einsum("kb,ka->kba", psis[n], np.conj(chis[n]))
        _, G = expm_frechet(
            jnp.asarray(A)[None], jnp.asarray(R)[None], squarings=s
        )
        ref = np.einsum("tab,kba->kt", ops, np.asarray(G[0]))
        scale = max(np.max(np.abs(ref)), 1.0)
        assert np.max(np.abs(trj[n] - ref)) < 2e-5 * scale, n


def test_frechet_trace_pallas_pertraj_interpret():
    """Per-trajectory-generator fused Fréchet trace kernel vs the XLA
    expm_frechet path — the robust-ensemble (K distinct H_k) gradgen
    backward (reference per-trajectory loop,
    `/root/reference/src/optimize.jl:876-911`; VERDICT round-3 item 1)."""
    from grape_tpu.ops.frechet import expm_frechet
    from grape_tpu.ops.pallas_frechet import frechet_trace_pallas_pertraj

    rng = np.random.default_rng(13)
    d, K, T, N_T, s = 8, 3, 2, 4, 2
    H0 = rng.normal(size=(K, d, d))
    H0 = (H0 + np.swapaxes(H0, -1, -2)) + 0j
    ops = rng.normal(size=(K, T, d, d))
    ops = (ops + np.swapaxes(ops, -1, -2)) + 0j
    coeffs = (0.3 * rng.normal(size=(N_T, T))).astype(np.float32)
    dts = np.full(N_T, 0.1, dtype=np.float32)
    psis = (rng.normal(size=(N_T, K, d))
            + 1j * rng.normal(size=(N_T, K, d))).astype(np.complex64)
    chis = (rng.normal(size=(N_T, K, d))
            + 1j * rng.normal(size=(N_T, K, d))).astype(np.complex64)

    args = (
        jnp.asarray(H0, dtype=jnp.complex64),
        jnp.asarray(ops, dtype=jnp.complex64),
        coeffs, dts, jnp.asarray(psis), jnp.asarray(chis),
    )
    trj = np.asarray(frechet_trace_pallas_pertraj(
        *args, n_squarings=s, interpret=True, precision="highest",
    ))
    assert trj.shape == (N_T, K, T)
    # the default 3-pass bf16 scheme ("high") stays within its ~2^-21
    # per-matmul accumulation noise of the full-precision kernel
    trj_high = np.asarray(frechet_trace_pallas_pertraj(
        *args, n_squarings=s, interpret=True, precision="high",
    ))
    ref_scale = max(np.max(np.abs(trj)), 1.0)
    assert np.max(np.abs(trj_high - trj)) < 1e-3 * ref_scale

    # reference: per-k expm_frechet in the rank-1 direction, trace with
    # the k-specific operators
    for n in range(N_T):
        for k in range(K):
            H = (H0[k] + np.einsum("t,tij->ij", coeffs[n], ops[k])).astype(
                np.complex64
            )
            A = -1j * dts[n] * H
            R = np.outer(psis[n, k], np.conj(chis[n, k]))
            _, G = expm_frechet(
                jnp.asarray(A)[None], jnp.asarray(R)[None, None],
                squarings=s,
            )
            ref = np.einsum("tab,ba->t", ops[k], np.asarray(G[0, 0]))
            scale = max(np.max(np.abs(ref)), 1.0)
            assert np.max(np.abs(trj[n, k] - ref)) < 2e-5 * scale, (n, k)


def test_fg_pertraj_kernel_matches_xla():
    """Through ``build_fg``: the per-trajectory-generator fused-kernel
    path (``use_pallas=True`` runs interpret off-TPU) produces the same
    (J, gradient) as the XLA chunked ``expm_frechet`` path for a robust
    ensemble with K distinct Hamiltonians (BASELINE config-5 pattern;
    reference per-trajectory backward loop
    `/root/reference/src/optimize.jl:876-911`) — including the U-free
    phase-A route used when the U storage exceeds its byte budget."""
    import dataclasses

    from grape_tpu import Trajectory, hamiltonian
    from grape_tpu.fg import (
        build_fg, compile_problem, _pallas_gradgen_pertraj_enabled,
    )
    import grape_tpu.fg as fgmod
    from grape_tpu.functionals import J_T_sm

    rng = np.random.default_rng(21)
    d, K = 16, 3

    def eps(t):
        return 0.2 * np.cos(0.7 * t)

    def eps2(t):
        return 0.1 * np.sin(0.9 * t)

    ctl_ops = []
    for _ in range(2):
        A = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
        ctl_ops.append(0.5 * (A + A.conj().T))
    trajs = []
    for k in range(K):
        A = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
        H0 = 0.5 * (A + A.conj().T) * 0.3 * (1 + 0.05 * k)
        psi0 = rng.normal(size=d) + 1j * rng.normal(size=d)
        tgt = rng.normal(size=d) + 1j * rng.normal(size=d)
        trajs.append(Trajectory(
            psi0 / np.linalg.norm(psi0),
            hamiltonian(H0, (ctl_ops[0], eps), (ctl_ops[1], eps2)),
            target_state=tgt / np.linalg.norm(tgt),
        ))
    tlist = np.linspace(0, 2.0, 21)
    kwargs = dict(J_T=J_T_sm, gradient_method="gradgen",
                  dtype=np.complex64)
    cp_k = compile_problem(trajs, tlist, use_pallas=True, **kwargs)
    assert not cp_k.shared_generator and not cp_k.per_traj_coeffs
    assert _pallas_gradgen_pertraj_enabled(cp_k)
    cp_x = compile_problem(trajs, tlist, use_pallas=False, **kwargs)
    x = cp_k.guess_pulsevals.reshape(-1)
    J1, g1, _ = build_fg(cp_k)(x)
    J2, g2, _ = build_fg(cp_x)(x)
    g1, g2 = np.asarray(g1), np.asarray(g2)
    gs = max(np.max(np.abs(g2)), 1e-12)
    assert abs(float(J1) - float(J2)) < 1e-5 * max(1.0, abs(float(J2)))
    assert np.max(np.abs(g1 - g2)) < 2e-3 * gs

    # U-free phase A (the route taken when N_T*K*d^2 exceeds the
    # U-storage budget): _chi_prop_scan instead of stored propagators
    orig = fgmod._gg_u_bytes_ok
    fgmod._gg_u_bytes_ok = lambda cp: False
    try:
        cp_nf = dataclasses.replace(cp_k, env_cache={})
        J3, g3, _ = build_fg(cp_nf)(x)
    finally:
        fgmod._gg_u_bytes_ok = orig
    assert abs(float(J3) - float(J2)) < 1e-5 * max(1.0, abs(float(J2)))
    assert np.max(np.abs(np.asarray(g3) - g2)) < 2e-3 * gs


def test_frechet_trace_pallas_k_blocked_interpret():
    """K > k_block folds direction blocks onto the kernel grid (fat-batch
    gradgen regime, K = n_basis gate bases); the blocked result must match
    the single-block kernel exactly, including a K that is NOT a multiple
    of the block size (zero-direction padding)."""
    from grape_tpu.ops.pallas_frechet import frechet_trace_pallas_shared

    rng = np.random.default_rng(7)
    d, T, N_T, s = 8, 2, 3, 1
    H0 = rng.normal(size=(d, d))
    H0 = (H0 + H0.T) + 0j
    ops = rng.normal(size=(T, d, d))
    ops = (ops + np.swapaxes(ops, -1, -2)) + 0j
    coeffs = (0.3 * rng.normal(size=(N_T, T))).astype(np.float32)
    dts = np.full(N_T, 0.1, dtype=np.float32)
    for K in (8, 11):  # exact block multiple + zero-padded remainder
        psis = (rng.normal(size=(N_T, K, d))
                + 1j * rng.normal(size=(N_T, K, d))).astype(np.complex64)
        chis = (rng.normal(size=(N_T, K, d))
                + 1j * rng.normal(size=(N_T, K, d))).astype(np.complex64)
        args = (
            jnp.asarray(H0, dtype=jnp.complex64),
            jnp.asarray(ops, dtype=jnp.complex64),
            coeffs, dts, jnp.asarray(psis), jnp.asarray(chis),
        )
        blocked = np.asarray(frechet_trace_pallas_shared(
            *args, n_squarings=s, interpret=True, k_block=4,
        ))
        assert blocked.shape == (N_T, K, T)
        one_block = np.asarray(frechet_trace_pallas_shared(
            *args, n_squarings=s, interpret=True, k_block=K,
        ))
        assert np.max(np.abs(blocked - one_block)) < 1e-6


def test_frechet_trace_pallas_pertraj_coeffs_interpret():
    """Per-trajectory COEFFICIENT tables ((K, N_T, T), heterogeneous
    amplitude shapes) through the pertraj kernel: each (n, k) step must
    use its own k-specific coefficients (verified against per-k
    expm_frechet)."""
    from grape_tpu.ops.frechet import expm_frechet
    from grape_tpu.ops.pallas_frechet import frechet_trace_pallas_pertraj

    rng = np.random.default_rng(29)
    d, K, T, N_T, s = 8, 3, 2, 4, 1
    H0 = rng.normal(size=(K, d, d))
    H0 = (H0 + np.swapaxes(H0, -1, -2)) + 0j
    ops = rng.normal(size=(K, T, d, d))
    ops = (ops + np.swapaxes(ops, -1, -2)) + 0j
    coeffs = (0.3 * rng.normal(size=(K, N_T, T))).astype(np.float32)
    dts = np.full(N_T, 0.1, dtype=np.float32)
    psis = (rng.normal(size=(N_T, K, d))
            + 1j * rng.normal(size=(N_T, K, d))).astype(np.complex64)
    chis = (rng.normal(size=(N_T, K, d))
            + 1j * rng.normal(size=(N_T, K, d))).astype(np.complex64)

    trj = np.asarray(frechet_trace_pallas_pertraj(
        jnp.asarray(H0, dtype=jnp.complex64),
        jnp.asarray(ops, dtype=jnp.complex64),
        coeffs, dts, jnp.asarray(psis), jnp.asarray(chis),
        n_squarings=s, interpret=True, precision="highest",
    ))
    for n in range(N_T):
        for k in range(K):
            H = (H0[k] + np.einsum(
                "t,tij->ij", coeffs[k, n], ops[k]
            )).astype(np.complex64)
            A = -1j * dts[n] * H
            R = np.outer(psis[n, k], np.conj(chis[n, k]))
            _, G = expm_frechet(
                jnp.asarray(A)[None], jnp.asarray(R)[None, None],
                squarings=s,
            )
            ref = np.einsum("tab,ba->t", ops[k], np.asarray(G[0, 0]))
            scale = max(np.max(np.abs(ref)), 1.0)
            assert np.max(np.abs(trj[n, k] - ref)) < 2e-5 * scale, (n, k)


def test_fg_pertraj_coeffs_kernel_matches_xla():
    """Through build_fg: a heterogeneous-SHAPES ensemble (per-trajectory
    coefficient tables) on the kernel path (use_pallas=True, interpret)
    matches the XLA path."""
    from grape_tpu import ShapedAmplitude, Trajectory, hamiltonian
    from grape_tpu.fg import (
        build_fg, compile_problem, _pallas_gradgen_pertraj_enabled,
    )
    from grape_tpu.functionals import J_T_sm

    rng = np.random.default_rng(31)
    d, K = 16, 3

    def eps(t):
        return 0.2 * np.cos(0.5 * t)

    A = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    Hc = 0.2 * (A + A.conj().T)
    B = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    H0 = 0.15 * (B + B.conj().T)
    trajs = []
    for k in range(K):
        p0 = rng.normal(size=d) + 1j * rng.normal(size=d)
        tg = rng.normal(size=d) + 1j * rng.normal(size=d)
        trajs.append(Trajectory(
            p0 / np.linalg.norm(p0),
            hamiltonian(
                H0,
                (Hc, ShapedAmplitude(eps, lambda t, k=k: 1.0 + 0.1 * k)),
            ),
            target_state=tg / np.linalg.norm(tg),
        ))
    tlist = np.linspace(0, 2.0, 13)
    kwargs = dict(J_T=J_T_sm, gradient_method="gradgen",
                  dtype=np.complex64)
    cp_k = compile_problem(trajs, tlist, use_pallas=True, **kwargs)
    assert cp_k.per_traj_coeffs
    assert _pallas_gradgen_pertraj_enabled(cp_k)
    cp_x = compile_problem(trajs, tlist, use_pallas=False, **kwargs)
    x = cp_k.guess_pulsevals.reshape(-1)
    J1, g1, _ = build_fg(cp_k)(x)
    J2, g2, _ = build_fg(cp_x)(x)
    g1, g2 = np.asarray(g1), np.asarray(g2)
    gs = max(np.max(np.abs(g2)), 1e-12)
    assert abs(float(J1) - float(J2)) < 1e-5 * max(1.0, abs(float(J2)))
    assert np.max(np.abs(g1 - g2)) < 2e-3 * gs


def test_frechet_trace_pallas_grouped_interpret():
    """Grouped mode (contiguous runs of group_size trajectories sharing
    one generator — gate ensembles): the grouped kernel equals the
    ungrouped per-trajectory kernel on tiled operator inputs."""
    from grape_tpu.ops.pallas_frechet import frechet_trace_pallas_pertraj

    rng = np.random.default_rng(37)
    d, G, gs, T, N_T, s = 8, 2, 4, 2, 3, 1
    K = G * gs
    H0g = rng.normal(size=(G, d, d))
    H0g = (H0g + np.swapaxes(H0g, -1, -2)) + 0j
    opsg = rng.normal(size=(G, T, d, d))
    opsg = (opsg + np.swapaxes(opsg, -1, -2)) + 0j
    coeffs = (0.3 * rng.normal(size=(N_T, T))).astype(np.float32)
    dts = np.full(N_T, 0.1, dtype=np.float32)
    psis = (rng.normal(size=(N_T, K, d))
            + 1j * rng.normal(size=(N_T, K, d))).astype(np.complex64)
    chis = (rng.normal(size=(N_T, K, d))
            + 1j * rng.normal(size=(N_T, K, d))).astype(np.complex64)

    grouped = np.asarray(frechet_trace_pallas_pertraj(
        jnp.asarray(H0g, dtype=jnp.complex64),
        jnp.asarray(opsg, dtype=jnp.complex64),
        coeffs, dts, jnp.asarray(psis), jnp.asarray(chis),
        n_squarings=s, interpret=True, precision="highest",
        group_size=gs,
    ))
    # ungrouped reference: tile the operators per trajectory
    H0k = np.repeat(H0g, gs, axis=0)
    opsk = np.repeat(opsg, gs, axis=0)
    ungrouped = np.asarray(frechet_trace_pallas_pertraj(
        jnp.asarray(H0k, dtype=jnp.complex64),
        jnp.asarray(opsk, dtype=jnp.complex64),
        coeffs, dts, jnp.asarray(psis), jnp.asarray(chis),
        n_squarings=s, interpret=True, precision="highest",
    ))
    assert grouped.shape == ungrouped.shape == (N_T, K, T)
    scale = max(np.max(np.abs(ungrouped)), 1.0)
    assert np.max(np.abs(grouped - ungrouped)) < 1e-5 * scale


def test_fg_grouped_ensemble_kernel_matches_xla():
    """Through build_fg on the robust-CZ ensemble model (each sample's 4
    basis trajectories share one generator): group size 4 is detected
    and the grouped kernel path matches the XLA path."""
    from grape_tpu.fg import (
        build_fg, compile_problem, _effective_group_size,
        _pallas_gradgen_pertraj_enabled,
    )
    from grape_tpu.models import two_transmon_cz_ensemble_problem

    problem = two_transmon_cz_ensemble_problem(
        n_samples=2, d=4, T=4.0, n_steps=12,
    )  # dim=16, K=8, groups of 4
    kwargs = dict(problem.kwargs)
    cp_k = compile_problem(
        problem.trajectories, problem.tlist, dtype=np.complex64,
        gradient_method="gradgen", use_pallas=True, **kwargs
    )
    assert cp_k.gen_group_size == 4
    assert _effective_group_size(cp_k) == 4
    assert _pallas_gradgen_pertraj_enabled(cp_k)
    cp_x = compile_problem(
        problem.trajectories, problem.tlist, dtype=np.complex64,
        gradient_method="gradgen", use_pallas=False, **kwargs
    )
    x = cp_k.guess_pulsevals.reshape(-1)
    J1, g1, _ = build_fg(cp_k)(x)
    J2, g2, _ = build_fg(cp_x)(x)
    g1, g2 = np.asarray(g1), np.asarray(g2)
    gs_ = max(np.max(np.abs(g2)), 1e-12)
    assert abs(float(J1) - float(J2)) < 1e-5 * max(1.0, abs(float(J2)))
    assert np.max(np.abs(g1 - g2)) < 2e-3 * gs_


def test_forward_scan_pallas_grouped_interpret():
    """Grouped forward kernel (one expm per (step, group)) matches the
    per-trajectory forward kernel on tiled operator inputs, including
    the per-group U stream."""
    from grape_tpu.ops.pallas_prop import (
        forward_scan_pallas, forward_scan_pallas_grouped,
    )

    rng = np.random.default_rng(41)
    d, G, gs, T, N_T = 8, 2, 3, 2, 5
    K = G * gs
    H0g = rng.normal(size=(G, d, d))
    H0g = ((H0g + np.swapaxes(H0g, -1, -2)) + 0j).astype(np.complex64)
    opsg = rng.normal(size=(G, T, d, d))
    opsg = ((opsg + np.swapaxes(opsg, -1, -2)) + 0j).astype(np.complex64)
    coeffs = (0.3 * rng.normal(size=(N_T, T))).astype(np.float32)
    dts = np.full(N_T, 0.1, dtype=np.float32)
    psi0 = rng.normal(size=(K, d)) + 1j * rng.normal(size=(K, d))
    psi0 = (psi0 / np.linalg.norm(psi0, axis=1, keepdims=True)).astype(
        np.complex64
    )
    st_g, U_g = forward_scan_pallas_grouped(
        jnp.asarray(H0g), jnp.asarray(opsg), coeffs, dts,
        jnp.asarray(psi0), group_size=gs, n_squarings=1,
        with_propagators=True, interpret=True,
    )
    st_k, U_k = forward_scan_pallas(
        jnp.asarray(np.repeat(H0g, gs, axis=0)),
        jnp.asarray(np.repeat(opsg, gs, axis=0)),
        coeffs, dts, jnp.asarray(psi0), n_squarings=1,
        with_propagators=True, interpret=True,
    )
    assert np.max(np.abs(np.asarray(st_g) - np.asarray(st_k))) < 1e-5
    # per-group U equals the (identical) per-trajectory U of each group
    U_k = np.asarray(U_k).reshape(N_T, G, gs, d, d)
    assert np.max(np.abs(np.asarray(U_g) - U_k[:, :, 0])) < 1e-6


def test_fg_grouped_us_per_step_backward():
    """Grouped stored propagators ((G, d, d) per step) through the
    per-step backward scan (vectorize_backward=False, taylor): the
    adjoint application must expand the group axis correctly."""
    from grape_tpu.fg import build_fg, compile_problem
    from grape_tpu.models import two_transmon_cz_ensemble_problem

    p = two_transmon_cz_ensemble_problem(n_samples=2, d=4, T=4.0,
                                         n_steps=10)
    kw = dict(p.kwargs)
    cp_k = compile_problem(
        p.trajectories, p.tlist, dtype=np.complex64,
        gradient_method="taylor", use_pallas=True,
        vectorize_backward=False, **kw
    )
    cp_x = compile_problem(
        p.trajectories, p.tlist, dtype=np.complex64,
        gradient_method="taylor", use_pallas=False,
        vectorize_backward=False, **kw
    )
    x = cp_k.guess_pulsevals.reshape(-1)
    J1, g1, _ = build_fg(cp_k)(x)
    J2, g2, _ = build_fg(cp_x)(x)
    gs_ = max(np.max(np.abs(np.asarray(g2))), 1e-12)
    assert abs(float(J1) - float(J2)) < 1e-5 * max(1, abs(float(J2)))
    assert np.max(np.abs(np.asarray(g1) - np.asarray(g2))) < 2e-3 * gs_


def test_frechet_trace_pallas_pertraj_non_hermitian_interpret():
    """The pertraj kernel makes no hermiticity assumption: random
    NON-Hermitian generators (open-system / Liouvillian regime — the
    reference's taylor kernel test also uses random non-Hermitian
    matrices, `/root/reference/test/test_taylor_grad.jl:13-71`)."""
    from grape_tpu.ops.frechet import expm_frechet
    from grape_tpu.ops.pallas_frechet import frechet_trace_pallas_pertraj

    rng = np.random.default_rng(43)
    d, K, T, N_T, s = 8, 2, 2, 3, 1
    H0 = (rng.normal(size=(K, d, d))
          + 1j * rng.normal(size=(K, d, d)))  # non-Hermitian
    ops = (rng.normal(size=(K, T, d, d))
           + 1j * rng.normal(size=(K, T, d, d)))
    coeffs = (0.2 * rng.normal(size=(N_T, T))).astype(np.float32)
    dts = np.full(N_T, 0.1, dtype=np.float32)
    psis = (rng.normal(size=(N_T, K, d))
            + 1j * rng.normal(size=(N_T, K, d))).astype(np.complex64)
    chis = (rng.normal(size=(N_T, K, d))
            + 1j * rng.normal(size=(N_T, K, d))).astype(np.complex64)
    trj = np.asarray(frechet_trace_pallas_pertraj(
        jnp.asarray(H0, dtype=jnp.complex64),
        jnp.asarray(ops, dtype=jnp.complex64),
        coeffs, dts, jnp.asarray(psis), jnp.asarray(chis),
        n_squarings=s, interpret=True, precision="highest",
    ))
    for n in range(N_T):
        for k in range(K):
            H = (H0[k] + np.einsum(
                "t,tij->ij", coeffs[n], ops[k]
            )).astype(np.complex64)
            A = -1j * dts[n] * H
            R = np.outer(psis[n, k], np.conj(chis[n, k]))
            _, G = expm_frechet(
                jnp.asarray(A)[None], jnp.asarray(R)[None, None],
                squarings=s,
            )
            ref = np.einsum("tab,ba->t", ops[k], np.asarray(G[0, 0]))
            scale = max(np.max(np.abs(ref)), 1.0)
            assert np.max(np.abs(trj[n, k] - ref)) < 3e-5 * scale, (n, k)
