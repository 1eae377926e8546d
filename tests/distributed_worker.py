"""Multi-process distributed worker (launched by ``test_distributed.py``).

Runs the PRODUCTION ``optimize(..., mesh=...)`` loop as one process of a
multi-controller JAX job: ``jax.distributed.initialize`` (Gloo CPU
collectives), a global 2D ``(host, chip)`` mesh spanning both processes,
trajectory axis sharded across processes, cross-process ``psum`` for the
``Σ_k`` gradient reduction, and the host-side C++ L-BFGS-B consuming the
fully-reduced gradient in lockstep on every process (the SPMD
multi-controller model: identical inputs → identical iterates).

This is the closest an 8-vCPU single host gets to the reference's
multi-host deployment story (BASELINE config 5): the collectives are
REAL inter-process communication, not a virtual single-process mesh.

Usage:  python -m tests.distributed_worker <pid> <nproc> <port>
"""

import json
import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import numpy as np

    from grape_tpu import optimize
    from grape_tpu.functionals import J_T_sm
    from grape_tpu.parallel import init_distributed, make_host_chip_mesh

    devices = init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc
    assert len(devices) == 4 * nproc  # global device view

    from grape_tpu.models import transmon_ensemble_trajectories

    trajectories = transmon_ensemble_trajectories(16, d=3, T=4.0)
    tlist = np.linspace(0.0, 4.0, 17)
    mesh = make_host_chip_mesh(n_hosts=nproc)
    trace = []

    res = optimize(
        trajectories, tlist, mesh=mesh, J_T=J_T_sm, iter_stop=5,
        callback=lambda wrk, it: trace.append(float(wrk.result.J_T)),
        print_iters=False, rethrow_exceptions=True,
    )
    print("RESULT " + json.dumps({
        "pid": pid,
        "n_processes": jax.process_count(),
        "n_devices": len(devices),
        "trace": trace,
        "iter": int(res.iter),
        "J_T": float(res.J_T),
    }), flush=True)


if __name__ == "__main__":
    main()
