"""Nonlinear control parametrization with CustomAmplitude.

The physical drive is a(ε, t) = A·sin(ε(t)): bounded by ±A for ANY value
of the optimized pulse ε — a trig-bounded parametrization (an alternative
to box constraints that keeps the optimization unconstrained).  The GRAPE
gradient picks up the chain-rule factor ∂a/∂ε = A·cos(ε) exactly (the
reference evaluates control-derivative operators per step with the
current pulse values; here the coefficient tables are traced functions
of the pulse).

Run:  python examples/05_nonlinear_amplitude.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from grape_tpu import CustomAmplitude, Trajectory, hamiltonian, optimize
from grape_tpu.functionals import J_T_ss
from grape_tpu.shapes import flattop

A_MAX = 1.2  # hard physical drive limit enforced by the parametrization


def main():
    def guess(t):
        return 0.3 * float(flattop(t, T=5.0, t_rise=0.3, func="blackman"))

    amp = CustomAmplitude(
        lambda v, t: A_MAX * jnp.sin(v[0]),
        guess,
        # analytic envelope (optional; sampled otherwise): |a| <= A,
        # |da/deps| <= A
        bound=lambda amp_max: (A_MAX, np.asarray([A_MAX])),
    )
    sz = np.array([[1, 0], [0, -1]], dtype=complex)
    sx = np.array([[0, 1], [1, 0]], dtype=complex)
    H = hamiltonian(-0.5 * sz, (sx, amp))
    tlist = np.linspace(0, 5, 501)
    traj = Trajectory([1, 0], H, target_state=[0, 1])
    result = optimize([traj], tlist, J_T=J_T_ss, iter_stop=25)
    eps_opt = np.asarray(result.optimized_controls[0])
    drive = A_MAX * np.sin(eps_opt)
    print(result)
    print(f"J_T = {result.J_T:.3e}")
    print(f"max |physical drive| = {np.max(np.abs(drive)):.4f} "
          f"(hard limit {A_MAX})")
    assert result.J_T < 1e-3
    assert np.max(np.abs(drive)) <= A_MAX


if __name__ == "__main__":
    main()
