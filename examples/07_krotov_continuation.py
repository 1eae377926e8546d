"""Krotov's method and cross-method continuation (Krotov → GRAPE).

The reference ecosystem pairs GRAPE.jl with Krotov.jl: Krotov's
monotonic first-order updates are robust far from the optimum, while
GRAPE's quasi-Newton steps converge faster near it — the canonical
workflow warm-starts GRAPE from a few Krotov iterations
(`/root/reference/test/test_tls_optimization.jl:417-457`).

Run:  python examples/07_krotov_continuation.py
"""

import jax

jax.config.update("jax_platforms", "cpu")  # small problem
jax.config.update("jax_enable_x64", True)

import numpy as np

from grape_tpu import Trajectory, hamiltonian, optimize, optimize_krotov
from grape_tpu.functionals import J_T_sm
from grape_tpu.shapes import flattop


T = 5.0


def guess_pulse(t):
    return 0.2 * float(flattop(t, T=T, t_rise=0.3, func="blackman"))


def update_shape(t):
    """S(t) ∈ [0, 1]: freeze the pulse ends, update the interior."""
    return float(flattop(t, T=T, t_rise=0.3, func="blackman"))


def main():
    sigma_z = np.array([[1, 0], [0, -1]], dtype=complex)
    sigma_x = np.array([[0, 1], [1, 0]], dtype=complex)
    H = hamiltonian(-0.5 * sigma_z, (sigma_x, guess_pulse))
    tlist = np.linspace(0, T, 501)
    trajectory = Trajectory([1, 0], H, target_state=[0, 1])

    print("== Krotov (monotonic first-order updates) ==")
    kres = optimize_krotov(
        [trajectory], tlist, J_T=J_T_sm,
        lambda_a=2.0, update_shape=update_shape, iter_stop=4,
        rethrow_exceptions=True,
    )
    assert kres.iter == 4
    J_krotov = kres.J_T
    assert J_krotov < 0.5, J_krotov  # well off the guess's 0.95

    print("\n== GRAPE continuation (quasi-Newton finish) ==")
    res = optimize(
        [trajectory], tlist, J_T=J_T_sm,
        continue_from=kres, iter_stop=10,
        rethrow_exceptions=True,
    )
    assert res.J_T < 1e-3, res.J_T
    assert res.iter > 4  # iteration numbering continues
    # the pulse ends stayed at the guess through the Krotov phase
    print(f"\nKrotov J_T {J_krotov:.3e} -> GRAPE J_T {res.J_T:.3e}")
    print("OK")


if __name__ == "__main__":
    main()
