"""Round-4 on-chip fg measurements (run serialized on the TPU).

Measures the VERDICT round-3 "next" items at the fg level:

1. per-trajectory-generator fused Fréchet-trace kernel vs the XLA
   chunked path on the robust-CZ ensemble (dim=100, K distinct H —
   BASELINE config-5 shape; the ≥3x claim + gradient agreement);
2. Pallas kernels under a 1-device mesh (shard_map islands on real
   hardware): sharded-vs-unsharded time + J/grad agreement;
3. the shared-generator kernel rows re-run for round-over-round
   comparability.

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
from grape_tpu.models import (  # noqa: E402
    two_transmon_cz_ensemble_problem, two_transmon_cz_problem,
)

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


def build_ens(n_samples, n_steps, method="gradgen", T=50.0, **kw_extra):
    problem = two_transmon_cz_ensemble_problem(
        n_samples=n_samples, d=10, n_steps=n_steps, T=T
    )
    kw = dict(problem.kwargs)
    kw.update(kw_extra)
    cp = compile_problem(
        problem.trajectories, problem.tlist, dtype=np.complex64,
        gradient_method=method, **kw
    )
    return build_fg(cp), cp


def time_fg(fg, x, n=5):
    t_warm0 = time.perf_counter()
    J = float(fg(x)[0])
    warm_s = time.perf_counter() - t_warm0
    assert np.isfinite(J)
    ts = []
    for _i in range(n):
        t1 = time.perf_counter()
        J = float(fg(x)[0])
        ts.append(time.perf_counter() - t1)
    dt = float(np.mean(ts))
    std = float(np.std(ts))
    # drain the queue before the pipelined batch (see r3_fg_bench note)
    outs = [fg(x) for _i in range(n)]
    _ = float(outs[-1][0])
    t0 = time.perf_counter()
    outs = [fg(x) for _i in range(n)]
    acc = float(outs[-1][0])
    dt_pipe = (time.perf_counter() - t0) / n
    assert np.isfinite(acc)
    return dt, std, warm_s, dt_pipe


def entry(name, builder, n_steps, k_traj, n=5, grad_ref=None):
    fg, cp = builder()
    x = cp.guess_pulsevals.reshape(-1)
    dt, std, warm_s, dt_pipe = time_fg(fg, x, n=n)
    flops = fg_flops(cp)
    out = {
        "config": name,
        "platform": jax.devices()[0].platform,
        "device_kind": getattr(jax.devices()[0], "device_kind", ""),
        "dim": cp.dim,
        "n_traj": cp.n_traj,
        "n_reps": n,
        "ms_per_eval": round(dt * 1e3, 2),
        "ms_std": round(std * 1e3, 2),
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


def sharded_entry(name, builder, n=10):
    """Sharded (1-device mesh, kernels via shard_map islands) vs
    unsharded fg: times, dispersion, and J/grad agreement."""
    from grape_tpu.parallel import build_fg_sharded, make_mesh

    fg, cp = builder()
    x = cp.guess_pulsevals.reshape(-1)
    dt_u, std_u, _w, _p = time_fg(fg, x, n=n)
    J_u = float(fg(x)[0])
    G_u = np.asarray(jax.device_get(fg(x)[1]), dtype=np.float64)
    fg_sh, cp_sh = build_fg_sharded(cp, make_mesh(1))
    dt_s, std_s, warm_s, _p = time_fg(fg_sh, x, n=n)
    J_s = float(fg_sh(x)[0])
    G_s = np.asarray(jax.device_get(fg_sh(x)[1]), dtype=np.float64)
    from grape_tpu import fg as _fg

    out = {
        "config": name,
        "platform": jax.devices()[0].platform,
        "device_kind": getattr(jax.devices()[0], "device_kind", ""),
        "dim": cp.dim,
        "n_traj": cp.n_traj,
        "n_reps": n,
        "ms_unsharded": round(dt_u * 1e3, 2),
        "ms_std_unsharded": round(std_u * 1e3, 2),
        "ms_sharded_1dev": round(dt_s * 1e3, 2),
        "ms_std_sharded_1dev": round(std_s * 1e3, 2),
        "overhead_frac": round(dt_s / dt_u - 1.0, 4),
        "warmup_s_sharded": round(warm_s, 1),
        "kernels_active_sharded": bool(
            _fg._pallas_forward_enabled(cp_sh, None)
            or _fg._pallas_gradgen_enabled(cp_sh)
            or _fg._pallas_gradgen_pertraj_enabled(cp_sh)
        ),
        "dJ": abs(J_s - J_u),
        "dG_rel": float(
            np.max(np.abs(G_s - G_u)) / max(np.max(np.abs(G_u)), 1e-30)
        ),
    }
    print("ENTRY " + json.dumps(out), flush=True)


def main():
    which = set(sys.argv[1:]) or None

    def want(name):
        return which is None or name in which

    # --- item 1: per-trajectory-generator kernel ------------------------
    g_ref = None
    if want("ensK32_gradgen_xla") or want("ensK32_gradgen_pallas"):
        g_ref = entry(
            "ensK32_gradgen_xla",
            lambda: build_ens(8, 800, use_pallas=False),
            800, 32,
        )
    if want("ensK32_gradgen_pallas"):
        entry(
            "ensK32_gradgen_pallas",
            lambda: build_ens(8, 800),
            800, 32, grad_ref=g_ref,
        )
    g_ref8 = None
    if want("ensK8_gradgen_xla") or want("ensK8_gradgen_pallas"):
        g_ref8 = entry(
            "ensK8_gradgen_xla",
            lambda: build_ens(2, 800, use_pallas=False),
            800, 8,
        )
    if want("ensK8_gradgen_pallas"):
        entry(
            "ensK8_gradgen_pallas",
            lambda: build_ens(2, 800),
            800, 8, grad_ref=g_ref8,
        )
    # --- item 2: kernels under the mesh --------------------------------
    if want("sharded1_cz_gradgen"):
        sharded_entry(
            "sharded1_cz_gradgen",
            lambda: build_cz(10, 800, "gradgen"),
        )
    if want("sharded1_ensK32_gradgen"):
        sharded_entry(
            "sharded1_ensK32_gradgen",
            lambda: build_ens(8, 800),
        )
    # --- comparability rows ---------------------------------------------
    if want("cz100_gradgen_pallas"):
        entry(
            "cz100_gradgen_pallas",
            lambda: build_cz(10, 800, "gradgen"),
            800, 4,
        )
    if want("cz100_taylor"):
        entry("cz100_taylor", lambda: build_cz(10, 800, "taylor"), 800, 4)


if __name__ == "__main__":
    main()
