"""On-chip A/B for the streaming-operator Chebyshev kernel (round 5b).

The resident cheby kernel (`cheby_scan_pallas_shared`) is VMEM-gated to
~d ≤ 360 at T=4 (2T+6 resident planes ≤ 40 MB); the d=1024
reference-shaped gate (`/root/reference/test/test_lbfgsb_saddle_point.jl`
scaled up) therefore fell back to the XLA scan at 0.87-3.2% MFU
(VERDICT round-4 weak #3).  `cheby_scan_pallas_stream` streams the T+1
operator planes per step into an accumulated VMEM H_n and runs the full
recursion on-chip — ~(n_c+T+2)/(T+1)× less HBM traffic.

Measures (one JSON line per config, incremental):
- dim-1024 CZ cheby+taylor: XLA vs stream kernel (fwd + χ-chain)
- dim-1024 CZ cheby+gradgen: stream kernel serves the forward
- dim-1024 fat-batch subspace gate (K=64): stream kernel
Run SERIALIZED on the chip.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from grape_tpu.fg import (  # noqa: E402
    _pallas_cheby_mode, _prop_data, build_fg, compile_problem,
)
from grape_tpu.flops import fg_flops  # noqa: E402

BF16_PEAK = 197e12


def build_cz(d, n_steps, method, T=1.0, **kw_extra):
    from grape_tpu.models import two_transmon_cz_problem

    problem = two_transmon_cz_problem(d=d, n_steps=n_steps, T=T)
    kw = dict(problem.kwargs)
    kw["prop_method"] = "cheby"
    kw.update(kw_extra)
    cp = compile_problem(
        problem.trajectories, problem.tlist, dtype=np.complex64,
        gradient_method=method, **kw
    )
    return build_fg(cp), cp


def build_subspace(d, n_basis, n_steps, T, method, **kw_extra):
    from grape_tpu.models import two_transmon_subspace_gate_problem

    problem = two_transmon_subspace_gate_problem(
        d=d, n_basis=n_basis, n_steps=n_steps, T=T
    )
    kw = dict(problem.kwargs)
    kw["prop_method"] = "cheby"
    kw.update(kw_extra)
    cp = compile_problem(
        problem.trajectories, problem.tlist, dtype=np.complex64,
        gradient_method=method, **kw
    )
    return build_fg(cp), cp


def time_fg(fg, x, n=3):
    t_warm0 = time.perf_counter()
    J = float(fg(x)[0])
    warm_s = time.perf_counter() - t_warm0
    assert np.isfinite(J)
    t0 = time.perf_counter()
    for _i in range(n):
        J = float(fg(x)[0])
    dt = (time.perf_counter() - t0) / n
    # pipelined: drain, then n un-synced dispatches + one sync
    outs = [fg(x) for _i in range(n)]
    _ = float(outs[-1][0])
    t0 = time.perf_counter()
    outs = [fg(x) for _i in range(n)]
    acc = float(outs[-1][0])
    dt_pipe = (time.perf_counter() - t0) / n
    assert np.isfinite(acc)
    return dt, warm_s, dt_pipe, J


def entry(name, builder, n_steps, k_traj, n=3, grad_ref=None):
    fg, cp = builder()
    pd = _prop_data(cp, np.array([1.0]))
    pd_fw = pd["fw"] if isinstance(pd, dict) and "fw" in pd else pd
    mode = _pallas_cheby_mode(cp, pd_fw)
    x = cp.guess_pulsevals.reshape(-1)
    dt, warm_s, dt_pipe, J = time_fg(fg, x, n=n)
    flops = fg_flops(cp)
    out = {
        "config": name,
        "dim": cp.dim,
        "cheby_kernel_mode": mode,
        "ms_per_eval": round(dt * 1e3, 2),
        "ms_per_eval_pipelined": round(dt_pipe * 1e3, 2),
        "warmup_s": round(warm_s, 1),
        "J": J,
        "traj_steps_per_s": round(n_steps * k_traj / dt, 1),
        "flops_per_eval": flops,
        "mfu_vs_bf16_peak": round(flops / dt / BF16_PEAK, 4),
        "mfu_device_time": round(flops / dt_pipe / BF16_PEAK, 4),
    }
    G = np.asarray(jax.device_get(fg(x)[1]), dtype=np.float64)
    if grad_ref is not None:
        rel = float(
            np.max(np.abs(G - grad_ref))
            / max(np.max(np.abs(grad_ref)), 1e-30)
        )
        out["grad_rel_err_vs_ref"] = rel
    print("ENTRY " + json.dumps(out), flush=True)
    return G


def main():
    which = set(sys.argv[1:]) or None

    def want(name):
        return which is None or name in which

    g_ref = None
    if want("dim1024_cheby_taylor_xla") or want("dim1024_cheby_taylor_stream"):
        g_ref = entry(
            "dim1024_cheby_taylor_xla",
            lambda: build_cz(32, 100, "taylor", use_pallas=False),
            100, 4,
        )
    if want("dim1024_cheby_taylor_stream"):
        entry(
            "dim1024_cheby_taylor_stream",
            lambda: build_cz(32, 100, "taylor", use_pallas=True),
            100, 4, grad_ref=g_ref,
        )
    g_ref_gg = None
    if want("dim1024_cheby_gradgen_xla") or want("dim1024_cheby_gradgen_stream"):
        g_ref_gg = entry(
            "dim1024_cheby_gradgen_xla",
            lambda: build_cz(32, 100, "gradgen", use_pallas=False),
            100, 4,
        )
    if want("dim1024_cheby_gradgen_stream"):
        entry(
            "dim1024_cheby_gradgen_stream",
            lambda: build_cz(32, 100, "gradgen", use_pallas=True),
            100, 4, grad_ref=g_ref_gg,
        )
    if want("dim1024_subspace_K64_stream"):
        entry(
            "dim1024_subspace_K64_stream",
            lambda: build_subspace(32, 64, 100, 1.0, "taylor"),
            100, 64,
        )
    if want("dim1024_subspace_K64_xla"):
        entry(
            "dim1024_subspace_K64_xla",
            lambda: build_subspace(
                32, 64, 100, 1.0, "taylor", use_pallas=False
            ),
            100, 64,
        )


if __name__ == "__main__":
    main()
