"""Record golden J_T convergence traces (run manually to regenerate):

    python -m tests.golden.record

Regenerate ONLY after an intentional numeric change, and say so in the
commit message.  The traces pin the per-iteration J_T series of four
reference-anchored problems; `tests/test_golden_traces.py` asserts every
iteration stays within a tolerance band — endpoint thresholds alone let
the round-1 f75b359 numeric regression through (VERDICT.md item 3).
"""

import json
import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from grape_tpu import optimize_problem  # noqa: E402
from grape_tpu.functionals import J_T_ss  # noqa: E402
from grape_tpu.testing import (  # noqa: E402
    cnot_problem, dummy_control_problem, stirap_problem, tls_problem,
)

HERE = os.path.dirname(os.path.abspath(__file__))


def _trace(problem, **updates):
    trace = []
    trace_b = []

    def cb(wrk, iteration):
        trace.append(float(wrk.result.J_T))
        trace_b.append(float(wrk.result.J_b))

    res = optimize_problem(
        problem, callback=cb, print_iters=False, rethrow_exceptions=True,
        **updates
    )
    return trace, trace_b, res


CONFIGS = {
    # TLS |0>->|1>, 501 grid points, both gradient methods
    "tls_gradgen": lambda: _trace(
        tls_problem(iter_stop=5), gradient_method="gradgen"
    ),
    "tls_taylor": lambda: _trace(
        tls_problem(iter_stop=5), gradient_method="taylor"
    ),
    # STIRAP with the intermediate-level running cost (the config that
    # regressed in round 1)
    "stirap_running_cost": lambda: _trace(
        stirap_problem(lambda_b=0.4, iter_stop=25),
        gradient_method="taylor",
    ),
    # CNOT under Chebyshev propagation (fixed 15 iterations: the full
    # saddle-escape run lives in test_lbfgsb_saddle_point.py)
    "cnot_cheby": lambda: _trace(cnot_problem(iter_stop=15)),
    # seeded dummy problem run to convergence: the golden data pins the
    # exact convergence iteration (reference pins iter == 17,
    # test/test_convergence_checks.jl:34)
    "dummy_seeded": lambda: _trace(
        dummy_control_problem(
            N=2, rng=np.random.default_rng(1244538994), iter_stop=100
        ),
        J_T=J_T_ss,
        check_convergence=lambda r: (
            "J_T < 10⁻⁵" if r.J_T < 1e-5 else ""
        ),
    ),
    # dissipative Lindblad TLS (vectorized Liouville propagation): pins
    # the open-system path (VERDICT round-2 item 8)
    "lindblad_tls": lambda: _trace(_lindblad_problem()),
    # fat-batch subspace-gate synthesis (round-3 model family: K basis
    # states under one shared generator, seeded random target unitary)
    "subspace_gate": lambda: _trace(_subspace_problem()),
}


def _subspace_problem():
    from grape_tpu.models import two_transmon_subspace_gate_problem

    return two_transmon_subspace_gate_problem(
        d=3, n_basis=6, n_steps=50, T=10.0, E0=0.2, J=0.3, iter_stop=15
    )


def _lindblad_problem():
    from grape_tpu.models import dissipative_tls_problem

    return dissipative_tls_problem(gamma=0.05, n_steps=200, iter_stop=15)


def main(only=None):
    """Record traces (all configs, or just the names in ``only``) and
    merge into the existing traces.json — selective regeneration after an
    intentional numeric change never perturbs unrelated pinned traces."""
    path = os.path.join(HERE, "traces.json")
    out = {}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    for name, run in CONFIGS.items():
        if only and name not in only:
            continue
        trace, trace_b, res = run()
        out[name] = {
            "J_T_trace": trace,
            "J_b_trace": trace_b,
            "iter": int(res.iter),
            "converged": bool(res.converged),
            "message": res.message,
        }
        print(f"{name}: {len(trace)} entries, final J_T={trace[-1]:.6e}, "
              f"iter={res.iter}")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    import sys

    main(only=sys.argv[1:] or None)
