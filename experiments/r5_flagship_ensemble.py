"""BASELINE config-5 at the letter: 1024-sample robust-CZ ensemble.

Spec (BASELINE.json configs[4]): dim=100 two-transmon CZ, 2000 time
steps, 1024 Hamiltonian-parameter samples → K = 4096 trajectories with
1024 distinct generators (4 logical basis states each), one shared set
of 4 drive controls, solve to J_T < 1e-3.

Round-4 evidence stopped at 8 samples (VERDICT round-4 weak #1): the
full-storage pass needs ~6.6 GB of ψ storage alone and the pertraj
kernel gated off at 1024 local trajectories.  Round 5 runs the letter
through the segment-vectorized recompute backward: ~O(sqrt(N_T))
state/checkpoint memory, the fused per-trajectory Fréchet kernel per
segment window, group-level operator storage (1024 entries, not 4096).

Usage (on the TPU chip; run SERIALIZED — concurrent processes queue):
    python experiments/r5_flagship_ensemble.py --samples 1024 --steps 2000
    python experiments/r5_flagship_ensemble.py --samples 64 --solve-iters 32

Prints one JSON line per phase (memory math, fg timing, solve trace).
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


def memory_math(cp):
    """Device/constant memory budget of the compiled problem (bytes)."""
    from grape_tpu import fg as _fg

    item = np.dtype(cp.psi0.dtype).itemsize
    d, K, N_T = cp.dim, cp.n_traj, cp.n_timesteps
    S = max(cp.storage_segments, 1)
    seg_len = N_T // S
    out = {
        "ops_constants": int(
            cp.H0.nbytes + cp.ops.nbytes
        ),
        "ops_grouped": bool(cp.ops_grouped),
        "storage_segments": int(cp.storage_segments),
        "seg_len": int(seg_len),
        "checkpoints": int(S * K * d * item),
        "seg_psis": int(seg_len * K * d * item),
        "seg_chis": int(seg_len * K * d * item),
        "seg_trace_out": int(seg_len * K * 128 * 8),
        "seg_u_stored": bool(_fg._seg_reuse_U(cp)),
        "full_storage_would_be": int((N_T + 1) * K * d * item),
        "full_u_would_be": int(
            N_T * _fg._stored_u_entries(cp) * d * d * item
        ),
        "pertraj_kernel_seg": bool(
            _fg._pallas_gradgen_pertraj_enabled(cp, n_steps=seg_len)
        ),
        "vec_gradgen": bool(_fg._vec_gradgen_enabled(cp)),
    }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--d", type=int, default=10)
    ap.add_argument("--T", type=float, default=50.0)
    ap.add_argument("--storage", default="recompute",
                    choices=["recompute", "full"])
    ap.add_argument("--segments", type=int, default=None)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--solve-iters", type=int, default=0,
                    help="device-loop solve iterations (0 = fg timing only)")
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--use-pallas", default="auto")
    ap.add_argument("--forward-only", action="store_true",
                    help="time build_f (no gradient) — phase bisection")
    ap.add_argument("--calls", type=int, default=1,
                    help="split fg across N+1 device calls (the axon "
                         "platform kills executions beyond ~1 min)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from grape_tpu.fg import build_fg, compile_problem
    from grape_tpu.flops import fg_flops
    from grape_tpu.models import two_transmon_cz_ensemble_problem

    t0 = time.perf_counter()
    problem = two_transmon_cz_ensemble_problem(
        n_samples=args.samples, d=args.d, n_steps=args.steps, T=args.T,
    )
    use_pallas = {"auto": "auto", "1": True, "0": False}[str(args.use_pallas)]
    cp = compile_problem(
        problem.trajectories, problem.tlist, dtype=np.complex64,
        gradient_method="gradgen", storage_mode=args.storage,
        storage_segments=args.segments,
        use_pallas=use_pallas, **problem.kwargs,
    )
    mem = memory_math(cp)
    print("MEM " + json.dumps({
        "samples": args.samples, "K": cp.n_traj, "dim": cp.dim,
        "n_steps": cp.n_timesteps, "storage": args.storage, **mem,
    }), flush=True)

    if args.solve_iters:
        from grape_tpu import optimize_problem

        stamps = []

        def cb(wrk, iteration):
            stamps.append((iteration, time.perf_counter(),
                           float(wrk.result.J_T)))
            # one line per iteration so partial traces survive a kill
            print("ITER " + json.dumps({
                "iter": int(iteration),
                "J_T": float(wrk.result.J_T),
                "fg_calls": int(wrk.result.fg_calls),
                "wall_s": round(time.perf_counter() - t0, 1),
            }), flush=True)

        solver_kw = (
            dict(optimizer="device-lbfgs", device_loop_iters=args.chunk)
            if args.calls <= 1 else
            dict(optimizer="lbfgsb", eval_device_calls=args.calls)
        )
        res = optimize_problem(
            problem, dtype=np.complex64, gradient_method="gradgen",
            storage_mode=args.storage, storage_segments=args.segments,
            use_pallas=use_pallas,
            upper_bound=0.5, lower_bound=-0.5,
            iter_stop=args.solve_iters, callback=cb, print_iters=False,
            rethrow_exceptions=True, **solver_kw,
        )
        t_by = {it: t for it, t, _ in stamps}
        last = stamps[-1][0]
        rate = None
        if last > args.chunk and args.chunk in t_by:
            rate = (last - args.chunk) / (t_by[last] - t_by[args.chunk])
        print("SOLVE " + json.dumps({
            "samples": args.samples, "K": cp.n_traj,
            "n_steps": cp.n_timesteps, "iters": int(res.iter),
            "fg_calls": int(res.fg_calls),
            "J_T_guess": stamps[0][2] if stamps else None,
            "J_T": float(res.J_T),
            "grape_iters_per_s": round(rate, 4) if rate else None,
            "trace": [
                [it, round(j, 6)] for it, _, j in stamps
            ],
            "wall_s": round(time.perf_counter() - t0, 1),
        }), flush=True)
        return

    op_bytes = cp.H0.nbytes + cp.ops.nbytes
    if args.calls > 1:
        from grape_tpu.fg import build_fg_multicall

        if op_bytes > 256 * 1024**2:
            from grape_tpu.parallel import make_mesh, shard_problem

            cp = shard_problem(cp, make_mesh(1))
        fg = build_fg_multicall(cp, n_calls=args.calls)
        print(f"BUILD multicall ({args.calls} backward blocks; operator "
              f"arrays {op_bytes / 1e6:.0f} MB"
              + (" as device arguments)" if op_bytes > 256 * 1024**2
                 else " embedded)"), flush=True)
    elif op_bytes > 256 * 1024**2:
        # constants past the compile server's request limit: 1-device
        # mesh build passes the operator arrays as device arguments
        from grape_tpu.parallel import (
            build_f_sharded, build_fg_sharded, make_mesh,
        )

        if args.forward_only:
            fg, cp = build_f_sharded(cp, make_mesh(1))
        else:
            fg, cp = build_fg_sharded(cp, make_mesh(1))
        print(f"BUILD device-args (1-device mesh): operator arrays "
              f"{op_bytes / 1e6:.0f} MB as arguments "
              f"(forward_only={args.forward_only})", flush=True)
    elif args.forward_only:
        from grape_tpu.fg import build_f

        fg = build_f(cp)
    else:
        fg = build_fg(cp)
    x = cp.guess_pulsevals.reshape(-1)
    tw0 = time.perf_counter()
    J = float(fg(x)[0])
    warm = time.perf_counter() - tw0
    assert np.isfinite(J), J
    ts = []
    rng = np.random.default_rng(0)
    for _ in range(args.reps):
        xi = x + 0.01 * rng.normal(size=x.shape)
        t1 = time.perf_counter()
        v = float(fg(xi)[0])
        ts.append(time.perf_counter() - t1)
        assert np.isfinite(v)
    flops = fg_flops(cp)
    dt = float(np.mean(ts))
    print("FG " + json.dumps({
        "samples": args.samples, "K": cp.n_traj, "dim": cp.dim,
        "n_steps": cp.n_timesteps, "storage": args.storage,
        "platform": jax.devices()[0].platform,
        "warmup_s": round(warm, 1),
        "ms_per_eval": round(dt * 1000, 1),
        "ms_std": round(float(np.std(ts)) * 1000, 1),
        "n_reps": args.reps,
        "traj_steps_per_s": round(cp.n_timesteps * cp.n_traj / dt, 1),
        "flops_per_eval": flops,
        "flops_per_s": round(flops / dt, 1),
        "mfu_vs_bf16_peak": round(flops / dt / 197e12, 4),
        "J": J,
        "wall_s": round(time.perf_counter() - t0, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
