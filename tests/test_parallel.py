"""Multi-chip sharding tests on the 8-device virtual CPU mesh: the sharded
fg program must produce bitwise-equivalent results to the single-device one,
and a sharded ensemble optimization must converge."""

import numpy as np
import jax
import pytest

from grape_tpu import Trajectory, hamiltonian, optimize
from grape_tpu.fg import build_fg, compile_problem
from grape_tpu.functionals import J_T_sm
from grape_tpu.parallel import (
    build_fg_sharded, ensemble_trajectories, make_mesh,
)
from grape_tpu.shapes import flattop


def _ensemble_problem(K=8):
    """TLS ensemble with per-sample detuning (robustness samples)."""

    def eps(t):
        return 0.2 * float(flattop(t, T=5, t_rise=0.3, func="blackman"))

    sz = np.array([[1, 0], [0, -1]], dtype=complex)
    sx = np.array([[0, 1], [1, 0]], dtype=complex)
    base = Trajectory([1, 0], None, target_state=[0, 1])
    gens = [
        hamiltonian(-0.5 * (1.0 + 0.01 * k) * sz, (sx, eps))
        for k in range(K)
    ]
    # NOTE: ensemble trajectories must share the control object
    shared_eps = gens[0].terms[0][1]
    gens = [
        hamiltonian(-0.5 * (1.0 + 0.01 * k) * sz, (sx, shared_eps))
        for k in range(K)
    ]
    trajs = ensemble_trajectories(base, gens)
    tlist = np.linspace(0, 5, 101)
    return trajs, tlist


def test_sharded_fg_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    trajs, tlist = _ensemble_problem(K=8)
    cp = compile_problem(trajs, tlist, J_T=J_T_sm)
    fg_single = build_fg(cp)
    mesh = make_mesh(8)
    fg_sharded, cp_sharded = build_fg_sharded(cp, mesh)
    x = cp.guess_pulsevals.reshape(-1)
    J1, g1, _ = fg_single(x)
    J2, g2, _ = fg_sharded(x)
    assert abs(float(J1) - float(J2)) < 1e-12
    assert np.linalg.norm(np.asarray(g1) - np.asarray(g2)) < 1e-12


def test_sharded_arrays_are_distributed():
    trajs, tlist = _ensemble_problem(K=8)
    cp = compile_problem(trajs, tlist, J_T=J_T_sm)
    mesh = make_mesh(8)
    from grape_tpu.parallel import shard_problem

    cp_sh = shard_problem(cp, mesh)
    # each device holds exactly one trajectory's slice
    shards = cp_sh.psi0.addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape == (1, 2)


def test_indivisible_ensemble_raises():
    trajs, tlist = _ensemble_problem(K=6)
    cp = compile_problem(trajs, tlist, J_T=J_T_sm)
    mesh = make_mesh(8)
    with pytest.raises(ValueError, match="divisible"):
        build_fg_sharded(cp, mesh)


def test_ensemble_optimization_converges():
    """Robust ensemble GRAPE over detuning samples converges (the sharded
    path is exercised by the driver's dryrun; here we check the ensemble
    physics end-to-end on one device)."""
    trajs, tlist = _ensemble_problem(K=8)
    res = optimize(
        trajs, tlist, iter_stop=10, J_T=J_T_sm,
        rethrow_exceptions=True, print_iters=False,
    )
    assert res.J_T < 1e-2  # robust transfer across ±8% detuning spread
