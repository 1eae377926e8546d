"""Is the fused-kernel gradient noise free? (VERDICT round-4 next #5)

The fused Fréchet-trace kernels agree with the XLA paths to ~1e-4
relative (documented f32/Karatsuba noise, shared by precision "high"
and "highest").  The open question was whether that noise costs
L-BFGS iterations: line-search branch decisions amplify fp noise (the
reference itself tolerates 15% trace deviation for this reason,
``/root/reference/test/test_state_running_cost.jl:341-344``).

This experiment runs the SAME on-chip solve (CZ gate and robust-CZ
ensemble, device-resident native L-BFGS) with
  (a) kernels on, precision "high"   (the default),
  (b) kernels on, precision "highest" (3x the matmul passes),
  (c) kernels off (pure XLA),
and compares the iteration count to a fixed J_T target plus the final
J_T at a fixed iteration budget.

Prints one JSON line per (config, variant).
"""

import argparse
import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

TARGET = 1e-3


def solve(problem, label, variant, iter_stop, **overrides):
    from grape_tpu import optimize_problem

    trace = []

    def cb(wrk, iteration):
        trace.append(float(wrk.result.J_T))

    t0 = time.perf_counter()
    res = optimize_problem(
        problem, dtype=np.complex64, gradient_method="gradgen",
        optimizer="device-lbfgs", device_loop_iters=8,
        upper_bound=0.5, lower_bound=-0.5,
        iter_stop=iter_stop, callback=cb, print_iters=False,
        rethrow_exceptions=True,
        check_convergence=lambda r: (
            "target" if r.J_T < TARGET else ""
        ),
        **overrides,
    )
    hit = next((i for i, j in enumerate(trace) if j < TARGET), None)
    print("AB " + json.dumps({
        "config": label,
        "variant": variant,
        "iters_to_target": hit,
        "final_iter": int(res.iter),
        "final_J_T": float(res.J_T),
        "fg_calls": int(res.fg_calls),
        "wall_s": round(time.perf_counter() - t0, 1),
        "trace_head": [round(j, 6) for j in trace[:12]],
    }), flush=True)
    return hit, res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=48)
    ap.add_argument("--configs", default="cz,ens")
    args = ap.parse_args()

    from grape_tpu.models import (
        two_transmon_cz_ensemble_problem, two_transmon_cz_problem,
    )

    variants = [
        ("kernels_high", dict(use_pallas="auto",
                              gradgen_pallas_precision="high")),
        ("kernels_highest", dict(use_pallas="auto",
                                 gradgen_pallas_precision="highest")),
        ("xla", dict(use_pallas=False)),
    ]
    for label in args.configs.split(","):
        if label == "cz":
            problem = two_transmon_cz_problem(d=10, n_steps=800, T=50.0)
        else:
            problem = two_transmon_cz_ensemble_problem(
                n_samples=8, d=10, n_steps=800, T=50.0
            )
        for vname, over in variants:
            solve(problem, label, vname, args.iters, **over)


if __name__ == "__main__":
    main()
