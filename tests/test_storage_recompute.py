"""Checkpoint/recompute storage mode: O(sqrt(N_T)) memory with gradients
identical to full storage."""

import numpy as np
import jax.numpy as jnp
import pytest

from grape_tpu import Trajectory, hamiltonian, optimize
from grape_tpu.fg import build_fg, compile_problem, _pick_segments
from grape_tpu.functionals import J_T_sm, J_T_re
from grape_tpu.shapes import flattop


def _tls(n_steps=100):
    def eps(t):
        return 0.2 * float(flattop(t, T=5, t_rise=0.3, func="blackman"))

    sz = np.array([[1, 0], [0, -1]], dtype=complex)
    sx = np.array([[0, 1], [1, 0]], dtype=complex)
    H = hamiltonian(-0.5 * sz, (sx, eps))
    tlist = np.linspace(0, 5, n_steps + 1)
    return [Trajectory([1, 0], H, target_state=[0, 1])], tlist


def test_pick_segments():
    assert _pick_segments("full", None, 100) == 0
    assert _pick_segments("recompute", None, 100) == 10
    assert _pick_segments("recompute", 25, 100) == 25
    assert _pick_segments("recompute", None, 2000) in (40, 50)
    with pytest.raises(ValueError, match="divide"):
        _pick_segments("recompute", 7, 100)


def test_recompute_matches_full():
    trajs, tlist = _tls(100)
    x = None
    results = {}
    for mode in ("full", "recompute"):
        cp = compile_problem(
            trajs, tlist, J_T=J_T_sm, storage_mode=mode,
        )
        fg = build_fg(cp)
        if x is None:
            x = cp.guess_pulsevals.reshape(-1)
        J, g, aux = fg(x)
        results[mode] = (float(J), np.asarray(g))
    assert abs(results["full"][0] - results["recompute"][0]) < 1e-14
    assert np.linalg.norm(
        results["full"][1] - results["recompute"][1]
    ) < 1e-13


def test_recompute_with_state_cost():
    """J_b (inline trapezoid) and the xi inhomogeneity agree between modes."""
    trajs, tlist = _tls(100)
    D = jnp.asarray(np.diag([0.0, 1.0]).astype(complex))

    def g_b(Psi, trajectories, tl, n):
        return jnp.real(jnp.einsum("ki,ij,kj->k", jnp.conj(Psi), D, Psi))

    results = {}
    for mode in ("full", "recompute"):
        cp = compile_problem(
            trajs, tlist, J_T=J_T_re, g_b=g_b, lambda_b=0.3,
            storage_mode=mode,
        )
        fg = build_fg(cp)
        x = cp.guess_pulsevals.reshape(-1)
        J, g, aux = fg(x)
        results[mode] = (
            float(J), np.asarray(g), np.asarray(aux["J_parts"]),
        )
    assert abs(results["full"][0] - results["recompute"][0]) < 1e-13
    assert np.allclose(results["full"][2], results["recompute"][2])
    assert np.linalg.norm(
        results["full"][1] - results["recompute"][1]
    ) < 1e-12


def test_recompute_optimization():
    """Full optimization under recompute mode hits the TLS anchors."""
    trajs, tlist = _tls(500)
    res = optimize(
        trajs, tlist, iter_stop=5, J_T=J_T_sm, storage_mode="recompute",
        rethrow_exceptions=True, print_iters=False,
    )
    assert res.J_T < 1e-3
    assert 0.75 < np.max(np.abs(res.optimized_controls[0])) < 0.85
