"""Weak-scaling measurement over REAL multi-process Gloo collectives.

BASELINE.md's north star asks for ≥0.8 multi-host scaling efficiency —
structurally unmeasurable on this one-chip rig, so round 4 recorded a
latency model plus a virtual-mesh smoke (VERDICT round-4 "also noted").
This experiment records the actually-measurable slice (VERDICT round-4
next #8): the per-device fg throughput of the PRODUCTION sharded
program when the trajectory-axis ``psum`` crosses real process
boundaries (Gloo CPU collectives), at a fixed per-process trajectory
count (weak scaling).

Caveats recorded with the numbers: the host has 2 physical cores, so
only P ∈ {1, 2} measure genuine parallel hardware; P = 4 is
oversubscribed (2 processes per core) and bounds collective+scheduling
overhead only.

Usage:
  python experiments/r5_multiproc_scaling.py            # orchestrate
  python experiments/r5_multiproc_scaling.py worker P N PORT  # internal
"""

import json
import os
import subprocess
import sys
import time

TRAJ_PER_PROC = 32
DIM = 12
N_STEPS = 200
N_ITER = 5


def worker(pid, nproc, port, independent=False):
    # ONE compute thread per process (including the 1-process baseline):
    # without this the baseline uses every core and "efficiency" would
    # conflate core-splitting with collective overhead
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=1 "
        "--xla_cpu_multi_thread_eigen=false "
        "intra_op_parallelism_threads=1"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import numpy as np

    from grape_tpu.fg import build_fg, compile_problem
    from grape_tpu.functionals import J_T_sm
    from grape_tpu.models import transmon_ensemble_trajectories
    from grape_tpu.parallel import (
        build_fg_sharded, init_distributed, make_host_chip_mesh,
    )

    if independent:
        # concurrency baseline: same LOCAL work, no distribution — the
        # per-process rate here isolates pure core contention, so
        # distributed/independent is the collective overhead proper
        K = TRAJ_PER_PROC
        trajs = transmon_ensemble_trajectories(K, d=DIM, T=4.0)
        tlist = np.linspace(0.0, 4.0, N_STEPS + 1)
        cp = compile_problem(trajs, tlist, J_T=J_T_sm)
        fg = build_fg(cp)
    else:
        devices = init_distributed(
            coordinator_address=f"localhost:{port}",
            num_processes=nproc,
            process_id=pid,
        )
        assert len(devices) == nproc  # 1 device per process
        K = TRAJ_PER_PROC * nproc
        trajs = transmon_ensemble_trajectories(K, d=DIM, T=4.0)
        tlist = np.linspace(0.0, 4.0, N_STEPS + 1)
        cp = compile_problem(trajs, tlist, J_T=J_T_sm)
        mesh = make_host_chip_mesh(n_hosts=nproc)
        fg, _ = build_fg_sharded(cp, mesh)
    x = cp.guess_pulsevals.reshape(-1)
    float(fg(x)[0])  # warmup: compile + first collective round
    t0 = time.perf_counter()
    for _ in range(N_ITER):
        float(fg(x)[0])
    dt = (time.perf_counter() - t0) / N_ITER
    print("ROW " + json.dumps({
        "pid": pid,
        "n_processes": nproc,
        "independent": bool(independent),
        "n_traj": K,
        "ms_per_eval": round(dt * 1000, 2),
        "traj_steps_per_s": round(K * N_STEPS / dt, 1),
    }), flush=True)


def orchestrate():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    def launch(nproc, port, independent):
        mode = ["indep"] if independent else []
        procs = [
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "worker",
                 str(pid), str(nproc), port] + mode,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, cwd=here, env=env,
            )
            for pid in range(nproc)
        ]
        row = None
        ok = True
        for p in procs:
            try:
                out, _ = p.communicate(timeout=600)
            except subprocess.TimeoutExpired:
                p.kill()
                ok = False
                continue
            if p.returncode != 0:
                ok = False
                sys.stderr.write(out[-1500:] + "\n")
                continue
            for line in out.splitlines():
                if line.startswith("ROW "):
                    r = json.loads(line[len("ROW "):])
                    if r["pid"] == 0:
                        row = r
        return row if ok else None

    rows = []
    base_per_proc = None
    indep_rate = {}
    for i, nproc in enumerate((1, 2, 4)):
        if nproc > 1:
            # concurrency baseline: nproc INDEPENDENT single-process
            # runs of the same local work (no collectives)
            r_ind = launch(nproc, str(29561 + i), independent=True)
            if r_ind is not None:
                indep_rate[nproc] = r_ind["traj_steps_per_s"]
        row = launch(nproc, str(29531 + i), independent=False)
        if row is None:
            rows.append({"n_processes": nproc, "skipped": "worker failed"})
            continue
        per_proc = row["traj_steps_per_s"] / nproc
        if base_per_proc is None:
            base_per_proc = per_proc
        row["per_process_steps_per_s"] = round(per_proc, 1)
        row["efficiency_vs_1proc"] = round(per_proc / base_per_proc, 3)
        if nproc in indep_rate:
            # collective overhead proper: distributed per-process rate
            # over the same-concurrency independent per-process rate
            row["indep_per_process_steps_per_s"] = round(
                indep_rate[nproc], 1
            )
            row["collective_efficiency"] = round(
                per_proc / indep_rate[nproc], 3
            )
        row["oversubscribed"] = nproc > 2  # host has 2 physical cores
        del row["pid"]
        rows.append(row)
    print("MULTIPROC_SCALING " + json.dumps(rows))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(
            int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
            independent=(len(sys.argv) > 5 and sys.argv[5] == "indep"),
        )
    else:
        orchestrate()
