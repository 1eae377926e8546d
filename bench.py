"""GRAPE benchmark — prints ONE JSON line.

Headline metric (BASELINE.json): propagation steps/s/chip for the fused
function-and-gradient evaluation (forward expm scan + backward
Fréchet-gradient scan) on the two-transmon CZ configuration (dim=100,
4 trajectories, multi-control).  ``vs_baseline`` is the speedup of the
accelerator (TPU, complex64) over the same program on one CPU host in
float64 — a proxy for the reference, which is a CPU/Float64 code with no
published numbers (BASELINE.md).
"""

import json
import sys
import time

import numpy as np


def _build(n_steps, dtype):
    from grape_tpu.fg import build_fg, compile_problem
    from grape_tpu.models import two_transmon_cz_problem

    problem = two_transmon_cz_problem(d=10, n_steps=n_steps, T=50.0)
    cp = compile_problem(
        problem.trajectories, problem.tlist, dtype=dtype, **problem.kwargs
    )
    fg = build_fg(cp)
    x = cp.guess_pulsevals.reshape(-1)
    return fg, x, cp


def _time_fg(fg, x, n_iter):
    import jax

    J, g, aux = fg(x)  # warmup/compile
    jax.block_until_ready((J, g))
    rng = np.random.default_rng(0)
    xs = [x + 0.01 * rng.normal(size=x.shape) for _ in range(n_iter)]
    t0 = time.perf_counter()
    outs = []
    for xi in xs:
        J, g, aux = fg(xi)
        outs.append((J, g))
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n_iter, float(J)


def main():
    import jax

    platform = jax.devices()[0].platform
    on_accel = platform not in ("cpu",)

    # --- accelerator measurement (complex64 on TPU) ---
    n_steps = 2000
    K = 4
    if on_accel:
        fg, x, cp = _build(n_steps, dtype=np.complex64)
        dt_accel, J = _time_fg(fg, x, n_iter=3)
    else:
        # no accelerator available: measure CPU as the "device"
        fg, x, cp = _build(n_steps, dtype=np.complex64)
        dt_accel, J = _time_fg(fg, x, n_iter=1)
    steps_per_s = n_steps * K / dt_accel

    # --- CPU float64 reference proxy (scaled config, extrapolated) ---
    cpu = jax.devices("cpu")[0]
    n_cpu = 50
    with jax.default_device(cpu):
        jax.config.update("jax_enable_x64", True)
        fg_c, x_c, _ = _build(n_cpu, dtype=np.complex128)
        dt_cpu, _ = _time_fg(fg_c, x_c, n_iter=1)
    cpu_steps_per_s = n_cpu * K / dt_cpu
    vs_baseline = steps_per_s / cpu_steps_per_s

    print(json.dumps({
        "metric": "CZ dim=100 fused fg propagation steps/s/chip (expm+grad)",
        "value": round(steps_per_s, 1),
        "unit": "traj-steps/s",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    main()
