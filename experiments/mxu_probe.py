"""Bare batched complex-matmul ceiling probe (VERDICT round-3 item 1).

Measures what the hardware actually delivers for the batched d=100/128
complex f32 matmuls that dominate the gradgen fg program:

1. XLA batched complex64 matmul chains (what the fg programs lower to);
2. XLA Karatsuba on explicit real/imag f32 planes (3 real matmuls);
3. Pallas kernel: 128-padded Karatsuba with operands VMEM-resident.

Measurement discipline for the axon platform: inputs are device_put ONCE
(argument re-transfer costs seconds through the tunnel), every timed
program chains `reps` products internally (per-call launch+sync costs
~25 ms, so per-call device work must dominate), and the B matrix is
scaled to spectral radius <1 so long chains neither overflow nor
underflow f32.

Counted FLOPs: 8·d³ per complex matmul of the UNPADDED d (the padding
waste reads as lost MFU — the honest accounting).  bf16 peak 197 TF/s.

Run (serialized, on the chip):  python experiments/mxu_probe.py
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

BF16_PEAK = 197e12


def timeit(fn, args, n=2):
    _ = float(fn(*args))  # warmup: compile + first-exec queue
    t0 = time.perf_counter()
    acc = 0.0
    for _i in range(n):
        acc += float(fn(*args))  # scalar host transfer = hard sync
    dt = (time.perf_counter() - t0) / n
    assert np.isfinite(acc), acc
    return dt


def report(name, dt, flops, extra=None):
    out = {
        "probe": name,
        "ms": round(dt * 1e3, 2),
        "tflops": round(flops / dt / 1e12, 2),
        "mfu_vs_bf16_peak": round(flops / dt / BF16_PEAK, 4),
    }
    if extra:
        out.update(extra)
    print(json.dumps(out), flush=True)


def xla_c64_chain(precision, reps):
    @jax.jit
    def f(ar, ai, br, bi):
        a = (ar + 1j * ai).astype(jnp.complex64)
        b = (br + 1j * bi).astype(jnp.complex64)
        with jax.default_matmul_precision(precision):
            def body(_, c):
                return c @ b

            c = jax.lax.fori_loop(0, reps, body, a)
        return (
            jnp.sum(jnp.real(c)) + jnp.sum(jnp.imag(c))
        ).astype(jnp.float32)

    return f


def xla_karatsuba_chain(precision, reps):
    @jax.jit
    def f(ar, ai, br, bi):
        with jax.default_matmul_precision(precision):
            def body(_, c):
                cr, ci = c
                t1 = cr @ br
                t2 = ci @ bi
                t3 = (cr + ci) @ (br + bi)
                return t1 - t2, t3 - t1 - t2

            cr, ci = jax.lax.fori_loop(0, reps, body, (ar, ai))
        return (jnp.sum(cr) + jnp.sum(ci)).astype(jnp.float32)

    return f


def pallas_karatsuba_chain(D, B, reps, precision):
    """Grid over the batch; each grid step runs a `reps`-long Karatsuba
    product chain with all operands VMEM-resident (the fused expm/Fréchet
    kernels' regime)."""
    from jax.experimental import pallas as pl

    prec = (
        jax.lax.Precision.HIGHEST if precision == "highest"
        else jax.lax.Precision.DEFAULT
    )

    def dot(a, b):
        return jnp.dot(a, b, precision=prec,
                       preferred_element_type=jnp.float32)

    def kernel(ar, ai, br, bi, or_, oi):
        cr, ci = ar[0], ai[0]
        brv, biv = br[0], bi[0]
        for _ in range(reps):
            t1 = dot(cr, brv)
            t2 = dot(ci, biv)
            t3 = dot(cr + ci, brv + biv)
            cr, ci = t1 - t2, t3 - t1 - t2
        or_[0] = cr
        oi[0] = ci

    spec = pl.BlockSpec((1, D, D), lambda b: (b, 0, 0))

    @jax.jit
    def f(ar, ai, br, bi):
        outr, outi = pl.pallas_call(
            kernel,
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


def _operands(rng, B, d):
    """Device-resident f32 planes; B scaled to spectral radius < 1."""
    a = [rng.normal(size=(B, d, d)).astype(np.float32) for _ in range(2)]
    s = np.float32(1.0 / (1.05 * np.sqrt(2.0 * d)))
    b = [
        (s * rng.normal(size=(B, d, d))).astype(np.float32)
        for _ in range(2)
    ]
    return [jax.device_put(x) for x in (a[0], a[1], b[0], b[1])]


def main():
    dev = jax.devices()[0]
    print(json.dumps({"platform": dev.platform,
                      "device": getattr(dev, "device_kind", "?")}),
          flush=True)
    rng = np.random.default_rng(0)

    # per-call floor (launch + scalar sync through the tunnel)
    @jax.jit
    def nop(x):
        return jnp.sum(x)

    xs = jax.device_put(np.ones(8, dtype=np.float32))
    floor = timeit(nop, (xs,), n=5)
    report("per_call_floor", floor, 0.0)

    # Work sized so device time >> the per-call floor (measured ~31 ms:
    # everything smaller reads as the floor, not the kernel)
    B, REPS = 512, 256
    for d in (100, 128):
        args = _operands(rng, B, d)
        flops = 8.0 * d**3 * B * REPS
        for prec in ("highest", "default"):
            dt = timeit(xla_c64_chain(prec, REPS), args)
            report(f"xla_c64_chain_d{d}_{prec}", dt, flops,
                   {"batch": B, "reps": REPS})
            dt = timeit(xla_karatsuba_chain(prec, REPS), args)
            report(f"xla_karatsuba_chain_d{d}_{prec}", dt, flops,
                   {"batch": B, "reps": REPS})

    # HBM-streaming batched matmul (reps=1, large batch): the regime the
    # XLA gradgen path runs in today
    B1 = 8192
    args = _operands(rng, B1, 128)
    dt = timeit(xla_c64_chain("highest", 1), args)
    report("xla_c64_stream_d128_highest", dt, 8.0 * 128**3 * B1,
           {"batch": B1, "reps": 1})

    # Pallas VMEM-resident chains (the fused-kernel regime), 128-padded
    D = 128
    args = _operands(rng, B, D)
    for prec in ("highest", "default"):
        f = pallas_karatsuba_chain(D, B, REPS, prec)
        dt = timeit(f, args)
        flops_128 = 8.0 * D**3 * B * REPS
        flops_100 = 8.0 * 100**3 * B * REPS
        report(
            f"pallas_karatsuba_chain_D128_{prec}", dt, flops_128,
            {"batch": B, "reps": REPS,
             "mfu_if_d100_payload": round(flops_100 / dt / BF16_PEAK, 4)},
        )

    # Pipelining: can N un-synced dispatches hide the per-call floor?
    f = xla_c64_chain("highest", 8)
    args = _operands(rng, 128, 128)
    _ = float(f(*args))
    n_pipe = 10
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(n_pipe)]
    mid = time.perf_counter() - t0
    acc = float(outs[-1]) + float(outs[0])
    dt_all = (time.perf_counter() - t0) / n_pipe
    assert np.isfinite(acc)
    dt_sync = timeit(f, args, n=4)
    print(json.dumps({
        "probe": "pipelining_10_dispatch_1_sync",
        "ms_per_call_pipelined": round(dt_all * 1e3, 2),
        "ms_dispatch_only": round(mid / n_pipe * 1e3, 2),
        "ms_per_call_synced": round(dt_sync * 1e3, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
