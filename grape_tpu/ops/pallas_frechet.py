"""Fused Pallas kernel for the time-batched rank-1 Fréchet trace pass.

This is the gradgen backward's hot loop (``fg._backward_vectorized_gradgen``)
as ONE kernel: per time step, the Taylor-PS base of ``expm`` and its
Fréchet factors in the K rank-1 directions ``R_k = ψ_k χ_k†`` are computed
entirely in VMEM (the XLA path round-trips the (C, K, d, d) intermediates
through HBM between every one of the ~60-100 batched matmuls per step),
then reduced on-chip to the T trace scalars ``tr(Op_t · L(A_n, R_k))``
actually needed by the gradient — the (K, d, d) Fréchet factors never
touch HBM at all.

Addresses VERDICT round-2 "next" item 1: pack the per-step matmul chain
into the MXU with VMEM-resident operands; complex-as-planes Karatsuba
(3 real dots per complex matmul).

Shared-generator variant (gate optimizations: one H, K basis states) —
the base exponential work is shared by all K directions.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .expm import _FACT_INV

__all__ = ["frechet_trace_pallas_shared", "frechet_trace_pallas_pertraj"]

# "high" (3-pass bf16, ~2^-21 relative per matmul) is accurate for this
# kernel: each step's Fréchet factor is INDEPENDENT — unlike the forward
# scan, no error compounds across the N_T steps — and the trace-reduction
# output feeds a gradient where ~1e-6 relative noise is far below the
# line-search sensitivity.  Mosaic does not lower Precision.HIGH, so the
# 3-pass scheme is emulated explicitly: split each f32 operand into bf16
# hi+lo parts and take the three significant cross products (the lo·lo
# term is below 2^-16 relative — the pass "highest" adds).
def _make_dot(precision):
    if precision == "highest":
        def dot(a, b):
            return jnp.dot(
                a, b, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        return dot
    if precision == "default":
        def dot(a, b):
            return jnp.dot(
                a, b, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
        return dot
    if precision != "high":
        raise ValueError(f"unknown precision {precision!r}")

    def dot(a, b):
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        kw = dict(
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        return (
            jnp.dot(ah, bh, **kw)
            + (jnp.dot(ah, bl, **kw) + jnp.dot(al, bh, **kw))
        )

    return dot


def _frechet_kernel_shared(
    coeffs_ref, dts_ref,  # scalar-prefetch: (N_T, T), (N_T, 1)
    h0r_ref, h0i_ref, opsr_ref, opsi_ref,  # (1,d,d), (T,d,d) planes
    opstr_ref, opsti_ref,                  # ops pre-TRANSPOSED (T,d,d)
    psir_ref, psii_ref, chir_ref, chii_ref,  # (1, K, d) per-step blocks
    tjr_ref, tji_ref,                      # out (1, K, LANES) planes
    *, degree, n_squarings, n_terms, n_dirs, precision, n_grp=1,
    grid2d=False, coeffs_per_k=False,
):
    _dot = _make_dot(precision)

    def _cmatmul(ar, ai, br, bi):
        t1 = _dot(ar, br)
        t2 = _dot(ai, bi)
        t3 = _dot(ar + ai, br + bi)
        return t1 - t2, t3 - t1 - t2

    # k-blocked mode: n_grp direction blocks ride the grid per time step;
    # the scalar-prefetch tables stay (N_T, ·) — SMEM is 1 MB, repeating
    # them n_grp× overflows it (measured: 3.2 MB at N_T=800, n_grp=8).
    # grid2d (per-trajectory generators): grid is (K, N_T) with time
    # innermost — the k-specific operator blocks then stay VMEM-resident
    # across all N_T steps (their index maps are constant along the inner
    # axis, so they are fetched once per trajectory).
    if grid2d:
        n = pl.program_id(1)
        # per-trajectory coefficient tables (heterogeneous amplitude
        # shapes): the scalar-prefetch table is (K·N_T, T), k-major
        crow = (
            pl.program_id(0) * pl.num_programs(1) + n
            if coeffs_per_k else n
        )
    else:
        n = pl.program_id(0) // n_grp if n_grp > 1 else pl.program_id(0)
        crow = n
    scale = np.float32(2.0 ** (-n_squarings))

    # ---- A = -i·dt·H, pre-scaled by 2^-s --------------------------------
    hr = h0r_ref[0]
    hi = h0i_ref[0]
    for t in range(n_terms):
        c = coeffs_ref[crow, t]
        hr = hr + c * opsr_ref[t]
        hi = hi + c * opsi_ref[t]
    dt = dts_ref[n, 0]
    ar = (dt * scale) * hi
    ai = (-dt * scale) * hr

    # ---- base powers + E by Paterson-Stockmeyer --------------------------
    d = ar.shape[-1]
    ident = jnp.eye(d, dtype=jnp.float32)
    zero = jnp.zeros_like(ar)
    a2r, a2i = _cmatmul(ar, ai, ar, ai)
    a3r, a3i = _cmatmul(a2r, a2i, ar, ai)
    a4r, a4i = _cmatmul(a3r, a3i, ar, ai)
    pows = [(ident, zero), (ar, ai), (a2r, a2i), (a3r, a3i)]
    n_blocks = (degree + 1 + 3) // 4

    def ps_blk(b):
        blkr = zero
        blki = zero
        for r in range(4):
            k = 4 * b + r
            if k > degree:
                continue
            c = np.float32(_FACT_INV[k])
            blkr = blkr + c * pows[r][0]
            blki = blki + c * pows[r][1]
        return blkr, blki

    er = ei = None
    e_hist = []  # E value BEFORE each Horner update (reused by all dirs)
    for b in reversed(range(n_blocks)):
        blkr, blki = ps_blk(b)
        if er is None:
            er, ei = blkr, blki
        else:
            e_hist.append((er, ei))
            tr_, ti_ = _cmatmul(a4r, a4i, er, ei)
            er = blkr + tr_
            ei = blki + ti_
    # keep the E ladder for the pair doublings: E_j = E_base^(2^j)
    e_ladder = [(er, ei)]
    for _ in range(n_squarings):
        er, ei = _cmatmul(er, ei, er, ei)
        e_ladder.append((er, ei))

    # ---- per-direction Fréchet factor + trace reduction ------------------
    lanes = tjr_ref.shape[-1]
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    rows_r = []
    rows_i = []
    for k in range(n_dirs):
        # R_k = ψ_k χ_k† (scaled by 2^-s: L(A,B) is linear in B).
        # rows are (1, d); outer product via one rank-1 MXU dot each.
        pr = psir_ref[0, k : k + 1, :]
        pi = psii_ref[0, k : k + 1, :]
        cr = chir_ref[0, k : k + 1, :]
        ci = chii_ref[0, k : k + 1, :]
        prT = pr.T  # (d, 1)
        piT = pi.T
        # (ψr + iψi)(χr − iχi)† outer: Rr = ψr⊗χr + ψi⊗χi,
        #                              Ri = ψi⊗χr − ψr⊗χi
        rr = scale * (_dot(prT, cr) + _dot(piT, ci))
        ri = scale * (_dot(piT, cr) - _dot(prT, ci))

        # M-chain: M_j = dA^j[R]:  M1 = R, M_{j+1} = A·M_j + R·A^j
        m1r, m1i = rr, ri
        t1r, t1i = _cmatmul(ar, ai, m1r, m1i)
        t2r, t2i = _cmatmul(rr, ri, ar, ai)
        m2r, m2i = t1r + t2r, t1i + t2i
        t1r, t1i = _cmatmul(ar, ai, m2r, m2i)
        t2r, t2i = _cmatmul(rr, ri, a2r, a2i)
        m3r, m3i = t1r + t2r, t1i + t2i
        t1r, t1i = _cmatmul(ar, ai, m3r, m3i)
        t2r, t2i = _cmatmul(rr, ri, a3r, a3i)
        m4r, m4i = t1r + t2r, t1i + t2i
        dpows = [None, (m1r, m1i), (m2r, m2i), (m3r, m3i)]

        def dps_blk(b):
            dr = di = None
            for r in range(4):
                kk = 4 * b + r
                if kk > degree or dpows[r] is None:
                    continue
                c = np.float32(_FACT_INV[kk])
                if dr is None:
                    dr = c * dpows[r][0]
                    di = c * dpows[r][1]
                else:
                    dr = dr + c * dpows[r][0]
                    di = di + c * dpows[r][1]
            return dr, di

        # Horner in A⁴ for the Fréchet factor, mirroring
        # ops/frechet.py:_frechet_taylor_ps; the E partials are replayed
        # from e_hist (computed once, shared by all K directions)
        der = dei = None
        first = True
        for i, b in enumerate(reversed(range(n_blocks))):
            dblk = dps_blk(b)
            if first:
                first = False
                der, dei = dblk
            else:
                ehr, ehi = e_hist[i - 1]
                ndr, ndi = _cmatmul(m4r, m4i, ehr, ehi)
                if der is not None:
                    tr_, ti_ = _cmatmul(a4r, a4i, der, dei)
                    ndr = ndr + tr_
                    ndi = ndi + ti_
                if dblk[0] is not None:
                    ndr = ndr + dblk[0]
                    ndi = ndi + dblk[1]
                der, dei = ndr, ndi
        # pair doublings: L ← E_j·L + L·E_j
        for j in range(n_squarings):
            ejr, eji = e_ladder[j]
            t1r, t1i = _cmatmul(ejr, eji, der, dei)
            t2r, t2i = _cmatmul(der, dei, ejr, eji)
            der = t1r + t2r
            dei = t1i + t2i

        # trace reduction: tr(Op_t·G) = Σ_ab Op_t^T[b,a]·G[b,a]; the
        # scalars are masked into (1, LANES) rows (Mosaic cannot store
        # scalars to VMEM)
        row_r = jnp.zeros((1, lanes), jnp.float32)
        row_i = jnp.zeros((1, lanes), jnp.float32)
        for t in range(n_terms):
            otr = opstr_ref[t]
            oti = opsti_ref[t]
            sr = jnp.sum(otr * der) - jnp.sum(oti * dei)
            si = jnp.sum(otr * dei) + jnp.sum(oti * der)
            mask = lane_ids == t
            row_r = row_r + jnp.where(mask, sr, np.float32(0.0))
            row_i = row_i + jnp.where(mask, si, np.float32(0.0))
        rows_r.append(row_r)
        rows_i.append(row_i)
    tjr_ref[0] = jnp.concatenate(rows_r, axis=0)
    tji_ref[0] = jnp.concatenate(rows_i, axis=0)


def frechet_trace_pallas_shared(
    H0, ops, coeffs, dts, psis, chis, n_squarings, degree=16,
    interpret=False, precision="high", k_block=8,
):
    """``trj[n, k, t] = tr(Op_t · L(-i dt_n H_n, ψ_nk χ_nk†))`` fused.

    Args:
      H0:   (d, d) complex64 shared drift
      ops:  (T, d, d) complex64 shared control-term operators
      coeffs: (N_T, T) float32 per-step term coefficients
      dts:  (N_T,) float32
      psis: (N_T, K, d) complex64 forward states ψ(t_n)
      chis: (N_T, K, d) complex64 normalized co-states χ(t_{n+1})
      n_squarings: static squaring count (host amplitude envelope)
      k_block: max directions unrolled per kernel invocation.  Larger K
        is folded into the grid: the K axis is zero-padded to a multiple
        of ``k_block`` and the resulting blocks ride the time-grid axis,
        re-deriving the shared expm base per block (~6% extra matmuls at
        ``k_block=8`` — the base is ~15 of the ~255 per-block matmuls).
        Fat-batch problems (K = n_basis gate bases) stay in the fused
        VMEM regime instead of falling back to the HBM-streaming XLA
        chunked path.

    Returns trj (N_T, K, T) complex64.
    """
    N_T, K, d = psis.shape
    n_grp = 1
    K_full = K
    if K > k_block:
        # fold K-blocks onto the grid; the kernel maps grid step g to
        # time step g // n_grp, so the scalar-prefetch tables stay
        # (N_T, ·) (repeating them n_grp× overflows the 1 MB SMEM)
        n_grp = -(-K // k_block)  # ceil
        k_pad = n_grp * k_block
        if k_pad != K:
            # zero directions are exact (L(A, 0) = 0) and discarded below
            pad = ((0, 0), (0, k_pad - K), (0, 0))
            psis = jnp.pad(jnp.asarray(psis), pad)
            chis = jnp.pad(jnp.asarray(chis), pad)
        psis = jnp.asarray(psis).reshape(N_T * n_grp, k_block, d)
        chis = jnp.asarray(chis).reshape(N_T * n_grp, k_block, d)
        K = k_block
    T = ops.shape[0]
    f32 = jnp.float32
    LANES = 128  # padded trace-output lane dim (T ≤ LANES)
    assert T <= LANES

    h0r = jnp.real(jnp.asarray(H0)).astype(f32)[None]
    h0i = jnp.imag(jnp.asarray(H0)).astype(f32)[None]
    opsj = jnp.asarray(ops)
    opsr = jnp.real(opsj).astype(f32)
    opsi = jnp.imag(opsj).astype(f32)
    opstr = jnp.swapaxes(opsr, -1, -2)
    opsti = jnp.swapaxes(opsi, -1, -2)
    psir = jnp.real(psis).astype(f32)
    psii = jnp.imag(psis).astype(f32)
    chir = jnp.real(chis).astype(f32)
    chii = jnp.imag(chis).astype(f32)
    coeffs = jnp.asarray(coeffs, dtype=f32)
    dts2 = jnp.asarray(dts, dtype=f32).reshape(N_T, 1)

    kernel = functools.partial(
        _frechet_kernel_shared, degree=degree,
        n_squarings=int(n_squarings), n_terms=T, n_dirs=K,
        precision=precision, n_grp=n_grp,
    )
    n_grid = N_T * n_grp
    mat = pl.BlockSpec((1, d, d), lambda n, *_: (0, 0, 0))
    matT = pl.BlockSpec((T, d, d), lambda n, *_: (0, 0, 0))
    step = pl.BlockSpec((1, K, d), lambda n, *_: (n, 0, 0))
    outspec = pl.BlockSpec((1, K, LANES), lambda n, *_: (n, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_grid,),
        in_specs=[mat, mat, matT, matT, matT, matT, step, step, step, step],
        out_specs=[outspec, outspec],
    )
    tjr, tji = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((n_grid, K, LANES), f32),
            jax.ShapeDtypeStruct((n_grid, K, LANES), f32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(coeffs, dts2, h0r, h0i, opsr, opsi, opstr, opsti,
      psir, psii, chir, chii)
    trj = (tjr[..., :T] + 1j * tji[..., :T]).astype(jnp.complex64)
    if n_grp > 1:
        trj = trj.reshape(N_T, n_grp * K, T)[:, :K_full]
    return trj


def frechet_trace_pallas_pertraj(
    H0, ops, coeffs, dts, psis, chis, n_squarings, degree=16,
    interpret=False, precision="high", group_size=1,
):
    """``trj[n, k, t] = tr(Op_kt · L(-i dt_n H_kn, ψ_nk χ_nk†))`` with
    PER-TRAJECTORY generators (robust ensembles: K *distinct* H_k — the
    BASELINE config-5 north star; the reference's per-trajectory backward
    loop this replaces is ``/root/reference/src/optimize.jl:876-911``).

    Unlike the shared-generator kernel there is no expm base to amortize
    across directions, so the grid is ``(K, N_T)`` with the time axis
    innermost: each trajectory's operator planes are fetched into VMEM
    once and stay resident for all ``N_T`` steps (their BlockSpec index
    maps are constant along the inner grid axis).  Each grid step derives
    the k-specific Taylor-PS expm base, ONE rank-1 Fréchet factor, and
    the T trace reductions entirely in VMEM — the XLA chunked fallback
    streams every (C, K, d, d) intermediate through HBM instead.

    Args:
      H0:   (K, d, d) complex64 per-trajectory drifts
      ops:  (K, T, d, d) complex64 per-trajectory control-term operators
      coeffs: (N_T, T) float32 shared per-step term coefficients, or
        (K, N_T, T) per-trajectory tables (heterogeneous amplitude
        shapes; the whole table lives in SMEM — callers gate on
        K·N_T·T·4 bytes fitting the 1 MB budget)
      dts:  (N_T,) float32
      psis: (N_T, K, d) complex64 forward states ψ(t_n)
      chis: (N_T, K, d) complex64 normalized co-states χ(t_{n+1})
      n_squarings: static squaring count (host amplitude envelope)

    Returns trj (N_T, K, T) complex64.
    """
    N_T, K, d = psis.shape
    T = ops.shape[1]
    assert T >= 1
    f32 = jnp.float32
    LANES = 128  # padded trace-output lane dim (T ≤ LANES)
    assert T <= LANES
    # grouped mode (gate ensembles: contiguous runs of `group_size`
    # trajectories share ONE generator — e.g. the 4 logical basis states
    # of each robust-CZ ensemble sample).  The expm base is derived once
    # per (step, group) and shared by the group's directions (the base
    # is ~10 of the ~27 complex matmuls per direction in ungrouped
    # mode); H0/ops carry one entry per GROUP.
    gs = int(group_size)
    assert gs >= 1 and K % gs == 0
    G = K // gs
    assert H0.shape[0] == G and ops.shape[0] == G

    h0r = jnp.real(jnp.asarray(H0)).astype(f32)       # (G, d, d)
    h0i = jnp.imag(jnp.asarray(H0)).astype(f32)
    opsj = jnp.asarray(ops).reshape(G * T, d, d)      # group-major terms
    opsr = jnp.real(opsj).astype(f32)
    opsi = jnp.imag(opsj).astype(f32)
    opstr = jnp.swapaxes(opsr, -1, -2)
    opsti = jnp.swapaxes(opsi, -1, -2)
    # (N_T·G, gs, d) layout: Mosaic requires the last two BLOCK dims to
    # divide (8, 128) or EQUAL the array dims — a (1, gs, d) block over
    # (N_T, K, d) violates that (gs vs K on the sublane axis), over
    # (N_T·G, gs, d) it matches exactly (ungrouped: gs = 1)
    psis_f = jnp.asarray(psis).reshape(N_T * G, gs, d)
    chis_f = jnp.asarray(chis).reshape(N_T * G, gs, d)
    psir = jnp.real(psis_f).astype(f32)
    psii = jnp.imag(psis_f).astype(f32)
    chir = jnp.real(chis_f).astype(f32)
    chii = jnp.imag(chis_f).astype(f32)
    coeffs = jnp.asarray(coeffs, dtype=f32)
    coeffs_per_k = coeffs.ndim == 3  # (G, N_T, T): per-group tables
    if coeffs_per_k:
        assert coeffs.shape[0] == G
        coeffs = coeffs.reshape(G * N_T, T)
    dts2 = jnp.asarray(dts, dtype=f32).reshape(N_T, 1)

    kernel = functools.partial(
        _frechet_kernel_shared, degree=degree,
        n_squarings=int(n_squarings), n_terms=T, n_dirs=gs,
        precision=precision, n_grp=1, grid2d=True,
        coeffs_per_k=coeffs_per_k,
    )
    # block index maps: (g, n, *scalar_refs) -> block coords; the
    # group-only operator blocks are constant along the inner n axis
    # (fetched once per group), the per-step psi/chi/out blocks advance
    # with n
    mat_k = pl.BlockSpec((1, d, d), lambda g, n, *_: (g, 0, 0))
    ops_k = pl.BlockSpec((T, d, d), lambda g, n, *_: (g, 0, 0))
    step = pl.BlockSpec((1, gs, d), lambda g, n, *_: (n * G + g, 0, 0))
    outspec = pl.BlockSpec(
        (1, gs, LANES), lambda g, n, *_: (n * G + g, 0, 0)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G, N_T),
        in_specs=[mat_k, mat_k, ops_k, ops_k, ops_k, ops_k,
                  step, step, step, step],
        out_specs=[outspec, outspec],
    )
    tjr, tji = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((N_T * G, gs, LANES), f32),
            jax.ShapeDtypeStruct((N_T * G, gs, LANES), f32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(coeffs, dts2, h0r, h0i, opsr, opsi, opstr, opsti,
      psir, psii, chir, chii)
    trj = (tjr[..., :T] + 1j * tji[..., :T]).astype(jnp.complex64)
    return trj.reshape(N_T, K, T)
