"""Amplitude types: ShapedAmplitude and LockedAmplitude (analogs of
``QuantumPropagators.Amplitudes`` as exercised by the reference at
``/root/reference/test/test_lbfgsb_saddle_point.jl:9,59-63`` and
``docs/src/tutorial.md:77-108``)."""

import numpy as np
import pytest

from grape_tpu import (
    LockedAmplitude, ShapedAmplitude, Trajectory, get_controls, hamiltonian,
    optimize, propagate,
)
from grape_tpu.functionals import J_T_ss
from grape_tpu.shapes import blackman


def test_locked_amplitude_contributes_but_is_not_optimized():
    """LockedAmplitude terms act on the dynamics but expose no control
    (``QuantumPropagators.Amplitudes.LockedAmplitude`` semantics)."""

    H0 = np.diag([0.0, 0.5, 0.0]).astype(complex)
    HP = 0.5 * np.array([[0, 1, 0], [1, 0, 0], [0, 0, 0]], dtype=complex)
    HS = 0.5 * np.array([[0, 0, 0], [0, 0, 1], [0, 1, 0]], dtype=complex)
    pump = LockedAmplitude(lambda t: 2.0 * float(blackman(t, 1.0, 5.0)))

    def stokes(t):
        return 2.0 * float(blackman(t, 0.0, 4.0))

    H = hamiltonian(H0, (HP, pump), (HS, stokes))
    assert len(get_controls(H)) == 1  # pump exposes no control
    tlist = np.linspace(0, 5, 201)
    traj = Trajectory([1, 0, 0], H, target_state=[0, 0, 1])
    J0 = float(J_T_ss(
        np.asarray([propagate(traj.initial_state, H, tlist)]), [traj]
    ))
    res = optimize(
        [traj], tlist, iter_stop=20, J_T=J_T_ss,
        rethrow_exceptions=True, print_iters=False,
    )
    assert len(res.optimized_controls) == 1  # only the Stokes pulse
    assert res.J_T < 0.5 * J0  # meaningful optimization with pump locked

    # the locked pump must actually act: without it no population transfer
    H_nopump = hamiltonian(H0, (HS, stokes))
    psi_T = propagate(traj.initial_state, H_nopump, tlist)
    assert abs(psi_T[2]) ** 2 < 1e-3  # no route |1>->|3> without pump
    psi_T_pump = propagate(traj.initial_state, H, tlist)
    assert abs(psi_T_pump[2]) ** 2 > 1e-3


def test_shaped_amplitude_zero_endpoints():
    """A ShapedAmplitude with a box/blackman shape keeps optimized pulses
    zero where the shape vanishes (switch-on/off enforcement)."""
    sz = np.array([[1, 0], [0, -1]], dtype=complex)
    sx = np.array([[0, 1], [1, 0]], dtype=complex)
    T = 5.0

    def shape(t):
        return float(blackman(t, 0.0, T))

    def guess(t):
        return 0.2

    amp = ShapedAmplitude(guess, shape)
    H = hamiltonian(-0.5 * sz, (sx, amp))
    tlist = np.linspace(0, T, 101)
    traj = Trajectory([1, 0], H, target_state=[0, 1])
    from grape_tpu.functionals import J_T_sm

    res = optimize(
        [traj], tlist, iter_stop=10, J_T=J_T_sm,
        rethrow_exceptions=True, print_iters=False,
    )
    assert res.J_T < 1e-2
    # the optimized CONTROL may be nonzero at the edges, but the PHYSICAL
    # coefficient shape(t_n)*eps_n entering H must vanish where the shape
    # does: check the compiled coefficient table directly
    from grape_tpu.fg import compile_problem

    cp = compile_problem([traj], tlist, J_T=J_T_sm)
    eps_any = np.ones(cp.n_timesteps)
    coeff_first = cp.M[0] @ np.atleast_1d(eps_any[0]) + cp.Mfix[0]
    coeff_last = cp.M[-1] @ np.atleast_1d(eps_any[-1]) + cp.Mfix[-1]
    assert np.max(np.abs(coeff_first)) < 1e-12  # shape(0) = 0
    assert np.max(np.abs(coeff_last)) < 1e-12   # shape(T) = 0
    # and mid-pulse the coefficient is NOT suppressed
    mid = cp.n_timesteps // 2
    assert np.max(np.abs(cp.M[mid] @ np.atleast_1d(1.0))) > 0.5
