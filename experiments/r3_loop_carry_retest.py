"""Re-test of platform-bug registry item 1 (docs/performance.md):
c64 loop-carry miscompilation on the axon TPU.

Round-2 measurement: carrying (N_T, K, L, d) complex64 tensors through
`lax.fori_loop`/`lax.scan` produced bit-identical WRONG values (6.6e-2
gradient error) where the unrolled identical body is exact; the
vectorized-taylor order loop is therefore unrolled (`fg.py`,
`_backward_vectorized`).

This probe reproduces the minimal pattern — a Taylor-style recursion
carrying a c64 tensor through `lax.fori_loop` vs the unrolled identical
body — and reports the deviation.  Run on the chip (serialized):

    python experiments/r3_loop_carry_retest.py

If max_rel ~ 1e-7 (f32 noise): the platform bug is FIXED — drop the
unroll in fg.py (compile time shrinks, envelope growth gets cheaper).
If max_rel ~ 1e-2: still broken; keep the unroll.
"""

import json

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

N_T, K, L, D = 50, 4, 4, 64
ORDERS = 25


def main():
    dev = jax.devices()[0]
    print(json.dumps({"platform": dev.platform,
                      "jax": jax.__version__}), flush=True)
    rng = np.random.default_rng(0)
    hr = rng.normal(size=(N_T, D, D)).astype(np.float32) / np.sqrt(D)
    hi = rng.normal(size=(N_T, D, D)).astype(np.float32) / np.sqrt(D)
    vr = rng.normal(size=(N_T, K, L, D)).astype(np.float32)
    vi = rng.normal(size=(N_T, K, L, D)).astype(np.float32)

    @jax.jit
    @jax.default_matmul_precision("highest")
    def looped(hr, hi, vr, vi):
        H = (hr + 1j * hi).astype(jnp.complex64)
        acc = v = (vr + 1j * vi).astype(jnp.complex64)
        c = jnp.complex64(0.1j)

        def body(m, carry):
            acc, v, coeff = carry
            v = jnp.einsum("nij,nklj->nkli", H, v)
            coeff = coeff * jnp.complex64(0.1j) / m
            return acc + coeff * v, v, coeff

        acc, _, _ = lax.fori_loop(2, ORDERS + 1, body, (acc, v, c))
        return jnp.stack([jnp.real(acc), jnp.imag(acc)])

    @jax.jit
    @jax.default_matmul_precision("highest")
    def unrolled(hr, hi, vr, vi):
        H = (hr + 1j * hi).astype(jnp.complex64)
        acc = v = (vr + 1j * vi).astype(jnp.complex64)
        coeff = jnp.complex64(0.1j)
        for m in range(2, ORDERS + 1):
            v = jnp.einsum("nij,nklj->nkli", H, v)
            coeff = coeff * jnp.complex64(0.1j) / m
            acc = acc + coeff * v
        return jnp.stack([jnp.real(acc), jnp.imag(acc)])

    a = np.asarray(jax.device_get(looped(hr, hi, vr, vi)), dtype=np.float64)
    b = np.asarray(
        jax.device_get(unrolled(hr, hi, vr, vi)), dtype=np.float64
    )
    scale = max(float(np.max(np.abs(b))), 1e-30)
    max_rel = float(np.max(np.abs(a - b))) / scale
    print(json.dumps({
        "probe": "c64_loop_carry",
        "max_rel_loop_vs_unrolled": max_rel,
        "verdict": "FIXED - drop the unroll" if max_rel < 1e-5
        else "still broken - keep the unroll",
    }), flush=True)


if __name__ == "__main__":
    main()
