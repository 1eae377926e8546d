"""Round-3 on-chip fg measurements (run serialized on the TPU).

Measures the VERDICT round-3 perf items at the fg level:
- gradgen dim=100 CZ with the fused Pallas Fréchet-trace kernel vs the
  XLA chunked path (agreement + speed + MFU);
- large-dim cheby rows (static-operator H-apply decomposition);
- new cheby+gradgen rows (dim 256 / 1024).

Prints one JSON line per config (incremental, so partial runs are
usable).  Analytic FLOPs from grape_tpu.flops.
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

from grape_tpu.fg import build_fg, compile_problem  # noqa: E402
from grape_tpu.flops import fg_flops  # noqa: E402
from grape_tpu.models import two_transmon_cz_problem  # noqa: E402

BF16_PEAK = 197e12


def build_cz(d, n_steps, method, prop="expprop", T=50.0, **kw_extra):
    problem = two_transmon_cz_problem(d=d, n_steps=n_steps, T=T)
    kw = dict(problem.kwargs)
    if prop != "expprop":
        kw["prop_method"] = prop
    kw.update(kw_extra)
    cp = compile_problem(
        problem.trajectories, problem.tlist, dtype=np.complex64,
        gradient_method=method, **kw
    )
    return build_fg(cp), cp


def time_fg(fg, x, n=5):
    t_warm0 = time.perf_counter()
    J, G, _ = fg(x)
    J = float(J)
    warm_s = time.perf_counter() - t_warm0
    assert np.isfinite(J)
    t0 = time.perf_counter()
    for _i in range(n):
        J = float(fg(x)[0])
    dt = (time.perf_counter() - t0) / n
    # pipelined: n dispatches, ONE sync — amortizes the per-call
    # launch+sync floor (~31 ms via the tunnel), isolating device time.
    # The warm batch MUST be drained before the timer starts: an
    # un-synced warm batch is still executing on device when the timed
    # dispatches queue behind it, inflating dt_pipe ~2x for
    # compute-bound configs (measured: dim-1024 fat-batch "pipelined"
    # 1677 ms vs 861 ms synced before this fix).
    outs = [fg(x) for _i in range(n)]
    _ = float(outs[-1][0])  # drain the device queue
    t0 = time.perf_counter()
    outs = [fg(x) for _i in range(n)]
    acc = float(outs[-1][0])
    dt_pipe = (time.perf_counter() - t0) / n
    assert np.isfinite(acc)
    return dt, warm_s, dt_pipe


def entry(name, builder, n_steps, k_traj, n=5, grad_ref=None):
    fg, cp = builder()
    x = cp.guess_pulsevals.reshape(-1)
    dt, warm_s, dt_pipe = time_fg(fg, x, n=n)
    flops = fg_flops(cp)
    out = {
        "config": name,
        "dim": cp.dim,
        "ms_per_eval": round(dt * 1e3, 2),
        "ms_per_eval_pipelined": round(dt_pipe * 1e3, 2),
        "warmup_s": round(warm_s, 1),
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
    if want("cz100_gradgen_xla") or want("cz100_gradgen_pallas"):
        g_ref = entry(
            "cz100_gradgen_xla",
            lambda: build_cz(10, 800, "gradgen", use_pallas=False),
            800, 4,
        )
    if want("cz100_gradgen_pallas"):
        entry(
            "cz100_gradgen_pallas",
            lambda: build_cz(10, 800, "gradgen"),
            800, 4, grad_ref=g_ref,
        )
    if want("cz100_gradgen_pallas_highest"):
        entry(
            "cz100_gradgen_pallas_highest",
            lambda: build_cz(
                10, 800, "gradgen", gradgen_pallas_precision="highest"
            ),
            800, 4, grad_ref=g_ref,
        )
    if want("cz100_taylor"):
        entry("cz100_taylor", lambda: build_cz(10, 800, "taylor"), 800, 4)
    if want("dim256_cheby_taylor"):
        entry(
            "dim256_cheby_taylor",
            lambda: build_cz(16, 200, "taylor", "cheby", T=5.0), 200, 4,
        )
    if want("dim1024_cheby_taylor"):
        entry(
            "dim1024_cheby_taylor",
            lambda: build_cz(32, 100, "taylor", "cheby", T=1.0), 100, 4,
            n=3,
        )
    if want("dim256_cheby_gradgen"):
        entry(
            "dim256_cheby_gradgen",
            lambda: build_cz(16, 200, "gradgen", "cheby", T=5.0), 200, 4,
        )
    if want("dim1024_cheby_gradgen"):
        entry(
            "dim1024_cheby_gradgen",
            lambda: build_cz(32, 100, "gradgen", "cheby", T=1.0), 100, 4,
            n=3,
        )
    def build_subspace(d, n_basis, n_steps, T, method, prop, **kw_extra):
        # fat-batch regime: K=n_basis basis-state trajectories, one
        # shared generator -> (K, dim)@(dim, dim) term matvecs
        from grape_tpu.models import two_transmon_subspace_gate_problem

        problem = two_transmon_subspace_gate_problem(
            d=d, n_basis=n_basis, n_steps=n_steps, T=T
        )
        kw = dict(problem.kwargs)
        if prop != "expprop":
            kw["prop_method"] = prop
        kw.update(kw_extra)
        cp = compile_problem(
            problem.trajectories, problem.tlist, dtype=np.complex64,
            gradient_method=method, **kw
        )
        return build_fg(cp), cp

    if want("dim1024_subspace_K64"):
        entry(
            "dim1024_subspace_K64",
            lambda: build_subspace(32, 64, 100, 1.0, "taylor", "cheby"),
            100, 64, n=3,
        )
    if want("dim100_subspace_K64_taylor"):
        entry(
            "dim100_subspace_K64_taylor",
            lambda: build_subspace(10, 64, 800, 50.0, "taylor", "expprop"),
            800, 64, n=3,
        )
    g_ref64 = None
    if want("dim100_subspace_K64_gradgen_xla"):
        g_ref64 = entry(
            "dim100_subspace_K64_gradgen_xla",
            lambda: build_subspace(
                10, 64, 800, 50.0, "gradgen", "expprop", use_pallas=False
            ),
            800, 64, n=3,
        )
    if want("dim100_subspace_K64_gradgen"):
        # k-blocked fused Fréchet kernel (K=64 rides the grid in blocks
        # of 8; gate opened round-3b)
        entry(
            "dim100_subspace_K64_gradgen",
            lambda: build_subspace(10, 64, 800, 50.0, "gradgen", "expprop"),
            800, 64, n=3, grad_ref=g_ref64,
        )


if __name__ == "__main__":
    main()
