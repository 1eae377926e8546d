"""GRAPE benchmark — prints ONE JSON line.

Headline metric (BASELINE.json): propagation steps/s/chip for the fused
function-and-gradient evaluation (forward expm scan + backward
Fréchet-gradient scan) on the two-transmon CZ configuration (dim=100,
4 trajectories, 4 drive controls).  ``vs_baseline`` is the speedup of the
accelerator (TPU, complex64) over the same program on one CPU host in
float64 — a proxy for the reference, which is a CPU/Float64 code with no
published numbers (BASELINE.md).

Platform notes (axon TPU): async dispatch cannot be trusted before the
first host sync, so every timed evaluation is synced by transferring the
scalar J to host; the first execution of a program pays a large server-side
compile/queue cost, which is excluded via a warmup evaluation.
"""

import json
import os
import sys
import time

import numpy as np

# Persistent XLA compilation cache: the axon TPU platform's first
# execution of a program pays a large server-side compile cost; the cache
# makes repeat benchmark runs start warm.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ["JAX_COMPILATION_CACHE_DIR"],
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

N_STEPS = 800
K_TRAJ = 4


def _build(n_steps, dtype):
    from grape_tpu.fg import build_fg, compile_problem
    from grape_tpu.models import two_transmon_cz_problem

    problem = two_transmon_cz_problem(d=10, n_steps=n_steps, T=50.0)
    cp = compile_problem(
        problem.trajectories, problem.tlist, dtype=dtype,
        gradient_method="taylor",  # matvec gradient: the right choice at
                                   # dim=100 (3.6x faster than gradgen here)
        **problem.kwargs
    )
    return build_fg(cp), cp.guess_pulsevals.reshape(-1)


def _time_fg(fg, x, n_iter):
    rng = np.random.default_rng(0)
    J = float(fg(x)[0])  # warmup: trace + device compile + first execution
    assert np.isfinite(J)
    xs = [x + 0.01 * rng.normal(size=x.shape) for _ in range(n_iter)]
    t0 = time.perf_counter()
    acc = 0.0
    for xi in xs:
        acc += float(fg(xi)[0])  # scalar host transfer = hard sync
    dt = (time.perf_counter() - t0) / n_iter
    assert np.isfinite(acc)
    return dt


def main():
    import jax

    platform = jax.devices()[0].platform
    fg, x = _build(N_STEPS, dtype=np.complex64)
    dt_accel = _time_fg(fg, x, n_iter=5)
    steps_per_s = N_STEPS * K_TRAJ / dt_accel

    # CPU float64 reference proxy (scaled config; per-step cost is
    # N_T-independent, so steps/s extrapolates)
    cpu = jax.devices("cpu")[0]
    n_cpu = 25
    jax.config.update("jax_enable_x64", True)  # true f64 on the CPU side
    with jax.default_device(cpu):
        fg_c, x_c = _build(n_cpu, dtype=np.complex128)
        dt_cpu = _time_fg(fg_c, x_c, n_iter=2)
    cpu_steps_per_s = n_cpu * K_TRAJ / dt_cpu
    vs_baseline = steps_per_s / cpu_steps_per_s

    print(json.dumps({
        "metric": (
            "two-transmon CZ dim=100 fused fg (expm+taylor-grad) "
            f"propagation throughput on {platform}"
        ),
        "value": round(steps_per_s, 1),
        "unit": "traj-steps/s",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    main()
