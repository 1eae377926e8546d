"""Gate optimization with per-step observables: a TLS X-gate over the
tomography-complete basis {|0⟩, |1⟩, |+⟩, |+i⟩} (BASELINE config 2),
with a fluence running cost and a forward-propagation callback recording
the excited-state population of every trajectory at every time step.

Gate problems (K basis states, ONE Hamiltonian) are detected
automatically and run the shared-generator fast path: one matrix
exponential per time step instead of K.

Run:  python examples/04_xgate_observables.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from grape_tpu import optimize_problem
from grape_tpu.models import tls_xgate_problem


def main():
    problem = tls_xgate_problem(n_steps=500, lambda_a=1e-4, iter_stop=20)

    # per-step observable, evaluated inside the jitted program over the
    # stored forward states; the callback receives all per-step values
    # once per evaluation (fw_prop_ callback analog)
    def pop1(Psi, tlist, n):
        return jnp.abs(Psi[..., 1]) ** 2  # (K,)

    traces = []

    def record(values, tlist):
        traces.append(np.real(values[0]))  # (N_T+1, K)

    result = optimize_problem(
        problem,
        fw_prop_callback=record,
        fw_prop_observables=[pop1],
        check_convergence=lambda r: (
            "J_T < 10⁻⁴" if r.J_T < 1e-4 else ""
        ),
        rethrow_exceptions=True,
    )
    print(result)
    print(f"\ngate infidelity J_T = {result.J_T:.3e} "
          f"after {result.iter} iterations (J_a fluence = {result.J_a:.3f})")
    pops = traces[-1]  # final accepted iterate: (N_T+1, K)
    print("final |1⟩ populations at T per basis state:",
          np.round(pops[-1], 4))
    print(f"peak |1⟩ population during the gate: {pops.max():.4f}")


if __name__ == "__main__":
    main()
