"""Large-dim (d=1024) Chebyshev-regime probe.

The dim-1024 CZ sweep rows sit at ~3.2% device-time MFU.  This probe
separates the three candidate explanations:

1. **Thin-row MXU geometry.**  The CZ config propagates K=4 states under
   a shared generator, so every cheby-term matvec is a (4, 1024) @
   (1024, 1024) matmul — at most 4/128 = 3.1% of the MXU's rows are
   live.  Probe: bare thin-chain vs fat-chain (K=64/256) term
   applications, both precisions.
2. **HBM streaming of the per-step tables.**  The 5 static operator
   planes are re-read per term application unless XLA keeps them
   VMEM-resident.  Probe: one-matrix chain vs 5-term chain (traffic x5,
   FLOPs x5 — if time scales x5 the bound is compute, if more it is
   traffic).
3. **The backward (time-vectorized taylor) share.**  fg - f timing of
   the actual dim-1024 bench config.

Run (serialized, on the chip):  python experiments/r3_dim1024_probe.py
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

BF16_PEAK = 197e12
D = 1024
T_TERMS = 5  # the CZ static-op count (H0 + 4 control ops)


def timeit(fn, args, n=2):
    _ = float(fn(*args))  # warmup: compile + first-exec queue
    t0 = time.perf_counter()
    acc = 0.0
    for _i in range(n):
        acc += float(fn(*args))
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


def term_chain(n_terms, reps, precision):
    """x <- sum_t c_t (x @ B_t): the cheby H_norm application with
    `n_terms` static operators, chained `reps` times (c64)."""

    @jax.jit
    def f(x, B, c):
        with jax.default_matmul_precision(precision):
            def body(_, v):
                y = jnp.einsum("t,ktd->kd", c,
                               jnp.einsum("kd,tde->kte", v, B))
                return y

            v = jax.lax.fori_loop(0, reps, body, x)
        return (jnp.sum(jnp.real(v)) + jnp.sum(jnp.imag(v))).astype(
            jnp.float32)

    return f


def single_chain(reps, precision):
    @jax.jit
    def f(x, B, c):
        with jax.default_matmul_precision(precision):
            def body(_, v):
                return v @ B[0]

            v = jax.lax.fori_loop(0, reps, body, x)
        return (jnp.sum(jnp.real(v)) + jnp.sum(jnp.imag(v))).astype(
            jnp.float32)

    return f


def _operands(rng, K, n_terms):
    # complex inputs must be assembled ON DEVICE (host->device complex
    # transfers are unimplemented on this platform): pass planes
    xr = rng.normal(size=(K, D)).astype(np.float32)
    s = np.float32(1.0 / (1.02 * np.sqrt(2.0 * D) * max(n_terms, 1)))
    Br = (s * rng.normal(size=(n_terms, D, D))).astype(np.float32)
    Bi = (s * rng.normal(size=(n_terms, D, D))).astype(np.float32)
    c = np.ones(n_terms, dtype=np.float32)

    @jax.jit
    def pack(xr, Br, Bi, c):
        return (xr + 0j).astype(jnp.complex64), \
            (Br + 1j * Bi).astype(jnp.complex64), \
            (c + 0j).astype(jnp.complex64)

    x, B, cc = pack(*[jax.device_put(a) for a in (xr, Br, Bi, c)])
    x.block_until_ready()
    return x, B, cc


def bench_fg_decomposition():
    """f (forward-only) vs fg of the actual dim-1024 bench config."""
    from grape_tpu.fg import build_f, build_fg, compile_problem
    from grape_tpu.models import two_transmon_cz_problem

    problem = two_transmon_cz_problem(d=32, n_steps=100, T=1.0)
    kw = {k: v for k, v in problem.kwargs.items() if k != "prop_method"}
    cp = compile_problem(
        problem.trajectories, problem.tlist, dtype=np.complex64,
        gradient_method="taylor", prop_method="cheby", **kw)
    x = cp.guess_pulsevals.reshape(-1)
    f, fg = build_f(cp), build_fg(cp)

    def f_scalar(xx):
        return f(xx)[0]

    def fg_scalar(xx):
        return fg(xx)[0]

    dt_f = timeit(f_scalar, (x,))
    dt_fg = timeit(fg_scalar, (x,))
    print(json.dumps({
        "probe": "dim1024_cz_fg_decomposition",
        "ms_f_forward_only": round(dt_f * 1e3, 2),
        "ms_fg": round(dt_fg * 1e3, 2),
        "ms_backward_share": round((dt_fg - dt_f) * 1e3, 2),
    }), flush=True)


def main():
    dev = jax.devices()[0]
    print(json.dumps({"platform": dev.platform,
                      "device": getattr(dev, "device_kind", "?")}),
          flush=True)
    rng = np.random.default_rng(0)

    # reps sized so device time >> per-call floor; the CZ dim-1024
    # config does N_T(100) x (n_c-1)(~26) = 2600 term applications
    REPS = 2600
    for K in (4, 64, 256):
        x, B, c = _operands(rng, K, T_TERMS)
        flops = 8.0 * K * D * D * T_TERMS * REPS
        for prec in ("highest", "default"):
            dt = timeit(term_chain(T_TERMS, REPS, prec), (x, B, c))
            report(f"term5_chain_K{K}_{prec}", dt, flops,
                   {"K": K, "reps": REPS})
        # single-matrix chain: x5 less traffic AND x5 less compute;
        # ratio vs term5 separates traffic-bound from compute-bound
        flops1 = 8.0 * K * D * D * REPS
        dt = timeit(single_chain(REPS, "highest"), (x, B, c))
        report(f"single_chain_K{K}_highest", dt, flops1,
               {"K": K, "reps": REPS})

    bench_fg_decomposition()


if __name__ == "__main__":
    main()
