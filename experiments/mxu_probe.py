"""Bare batched complex-matmul ceiling probe (VERDICT round-3 item 1).

Measures what the hardware actually delivers for the batched d=100/128
complex f32 matmuls that dominate the gradgen/cheby fg programs, under
three implementations:

1. XLA batched complex64 matmul (what the current fg programs lower to);
2. XLA Karatsuba on explicit real/imag f32 planes (3 real matmuls);
3. Pallas kernel: 128-padded Karatsuba with operands VMEM-resident.

Each is timed at `highest` (6-pass) and `high`/`default` (3-pass / bf16)
matmul precision where applicable.  The counted-FLOPs convention matches
bench.py: one complex multiply-add = 8 real FLOPs → 8·d³ per matmul of
the UNPADDED dimension d (padding waste shows up as lost MFU, which is
the honest accounting).

Run (serialized, on the chip):  python experiments/mxu_probe.py
Prints one JSON line per measurement.
"""

import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

BF16_PEAK = 197e12  # TPU v5e


def timeit(fn, *args, n=10):
    """fn must return a real f32 scalar (complex device->host transfers
    and eager complex ops are unimplemented on the axon platform)."""
    _ = float(fn(*args))  # warmup: compile + first-exec queue
    t0 = time.perf_counter()
    acc = 0.0
    for _i in range(n):
        acc += float(fn(*args))  # scalar host transfer = hard sync
    dt = (time.perf_counter() - t0) / n
    assert np.isfinite(acc)
    return dt


def report(name, dt, flops, extra=None):
    out = {
        "probe": name,
        "ms": round(dt * 1e3, 3),
        "tflops": round(flops / dt / 1e12, 2),
        "mfu_vs_bf16_peak": round(flops / dt / BF16_PEAK, 4),
    }
    if extra:
        out.update(extra)
    print(json.dumps(out), flush=True)


# --------------------------------------------------------------------------
# 1/2. XLA paths
# --------------------------------------------------------------------------

def xla_c64(precision):
    @jax.jit
    def f(ar, ai, br, bi):
        a = (ar + 1j * ai).astype(jnp.complex64)
        b = (br + 1j * bi).astype(jnp.complex64)
        with jax.default_matmul_precision(precision):
            c = a @ b
        return (
            jnp.sum(jnp.real(c)) + jnp.sum(jnp.imag(c))
        ).astype(jnp.float32)

    return f


def xla_karatsuba(precision):
    @jax.jit
    def f(ar, ai, br, bi):
        with jax.default_matmul_precision(precision):
            t1 = ar @ br
            t2 = ai @ bi
            t3 = (ar + ai) @ (br + bi)
        return (jnp.sum(t3 - t2 - t2) + jnp.sum(t1)).astype(jnp.float32)

    return f


# --------------------------------------------------------------------------
# 3. Pallas kernel: B-batched 128-padded Karatsuba, grid over batch
# --------------------------------------------------------------------------

def pallas_karatsuba(D, B, reps=1, precision="highest"):
    """One (D,D)x(D,D) complex matmul per grid step from VMEM-resident
    planes.  `reps` chains the product (C ← C@B) to raise arithmetic
    intensity like the fused expm kernels do (reps>1 measures the
    VMEM-resident matmul-chain rate — HBM traffic amortized away)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    prec = (
        jax.lax.Precision.HIGHEST if precision == "highest"
        else jax.lax.Precision.DEFAULT
    )

    def kernel(ar, ai, br, bi, or_, oi):
        cr, ci = ar[:], ai[:]
        for _ in range(reps):
            t1 = jnp.dot(cr, br[:], precision=prec,
                         preferred_element_type=jnp.float32)
            t2 = jnp.dot(ci, bi[:], precision=prec,
                         preferred_element_type=jnp.float32)
            t3 = jnp.dot(cr + ci, br[:] + bi[:], precision=prec,
                         preferred_element_type=jnp.float32)
            cr, ci = t1 - t2, t3 - t1 - t2
        or_[:] = cr
        oi[:] = ci

    spec = pl.BlockSpec((1, D, D), lambda b: (b, 0, 0))

    @jax.jit
    def f(ar, ai, br, bi):
        outr, outi = pl.pallas_call(
            lambda a1, a2, b1, b2, o1, o2: kernel(
                a1.at[0], a2.at[0], b1.at[0], b2.at[0],
                o1.at[0], o2.at[0],
            ),
            grid=(B,),
            in_specs=[spec, spec, spec, spec],
            out_specs=(spec, spec),
            out_shape=(
                jax.ShapeDtypeStruct((B, D, D), jnp.float32),
                jax.ShapeDtypeStruct((B, D, D), jnp.float32),
            ),
        )(ar, ai, br, bi)
        return (jnp.sum(outr) + jnp.sum(outi)).astype(jnp.float32)

    return f


def main():
    dev = jax.devices()[0]
    print(json.dumps({"platform": dev.platform,
                      "device": getattr(dev, "device_kind", "?")}),
          flush=True)
    rng = np.random.default_rng(0)
    B = 512
    for d in (100, 128):
        ar = rng.normal(size=(B, d, d)).astype(np.float32)
        ai = rng.normal(size=(B, d, d)).astype(np.float32)
        br = rng.normal(size=(B, d, d)).astype(np.float32)
        bi = rng.normal(size=(B, d, d)).astype(np.float32)
        flops = 8.0 * d**3 * B

        for prec in ("highest", "default"):
            dt = timeit(xla_c64(prec), ar, ai, br, bi)
            report(f"xla_c64_d{d}_{prec}", dt, flops, {"batch": B})

            dt = timeit(xla_karatsuba(prec), ar, ai, br, bi)
            report(f"xla_karatsuba_d{d}_{prec}", dt, flops, {"batch": B})

    # Pallas: 128-padded planes (counted flops stay at d=100 for the
    # padded probe so the padding waste reads as lost MFU)
    D = 128
    ar = rng.normal(size=(B, D, D)).astype(np.float32)
    ai = rng.normal(size=(B, D, D)).astype(np.float32)
    br = rng.normal(size=(B, D, D)).astype(np.float32)
    bi = rng.normal(size=(B, D, D)).astype(np.float32)
    for prec in ("highest", "default"):
        for reps, tag in ((1, "stream"), (16, "vmem_chain")):
            f = pallas_karatsuba(D, B, reps=reps, precision=prec)
            dt = timeit(f, ar, ai, br, bi)
            flops_128 = 8.0 * D**3 * B * reps
            flops_100 = 8.0 * 100**3 * B * reps
            report(
                f"pallas_karatsuba_D128_{tag}_{prec}", dt, flops_128,
                {"batch": B, "reps": reps,
                 "mfu_if_d100_payload": round(
                     flops_100 / dt / BF16_PEAK, 4)},
            )


if __name__ == "__main__":
    main()
