"""``gradient_method="auto"``: measurement-backed method selection.

The reference exposes ``gradient_method`` as ``:gradgen``/``:taylor``
(`/root/reference/src/docstring.jl:118-130`) and leaves the choice to
the user; its docs note taylor is preferable at large dimension.  The
TPU build adds ``"auto"``: gradgen wherever the time-vectorized rank-1
Fréchet path (and its fused kernels) serves — ExpProp propagation, full
storage, dim ≤ 128 — else taylor (BENCH.md: dim-1024 cheby gradgen runs
at 0.5% device MFU vs taylor's 3.2%; at dim ≤ 128 the fused gradgen
kernel is the fastest path at 18.4% MFU)."""

import numpy as np

from grape_tpu import optimize
from grape_tpu.fg import compile_problem
from grape_tpu.testing import tls_problem


def test_auto_resolves_gradgen_on_expprop():
    p = tls_problem(n_steps=50)
    cp = compile_problem(
        p.trajectories, p.tlist, gradient_method="auto", **p.kwargs
    )
    assert cp.gradient_method == "gradgen"


def test_auto_resolves_taylor_under_cheby():
    p = tls_problem(n_steps=50)
    cp = compile_problem(
        p.trajectories, p.tlist, gradient_method="auto",
        prop_method="cheby", **p.kwargs
    )
    assert cp.gradient_method == "taylor"


def test_auto_keeps_gradgen_on_recompute_storage():
    """Round 5: the recompute backward runs segment-vectorized (with the
    fused Fréchet kernels per segment window), so auto keeps gradgen
    under recompute storage — the round-4 taylor downgrade is gone."""
    p = tls_problem(n_steps=50)
    cp = compile_problem(
        p.trajectories, p.tlist, gradient_method="auto",
        storage_mode="recompute", **p.kwargs
    )
    assert cp.gradient_method == "gradgen"


def test_auto_optimizes_to_reference_anchor():
    """End-to-end with auto: the TLS anchor (J_T < 1e-3 in ≤ 5 iters,
    `/root/reference/test/test_tls_optimization.jl:159`)."""
    p = tls_problem()
    res = optimize(
        p.trajectories, p.tlist, iter_stop=5, gradient_method="auto",
        print_iters=False, rethrow_exceptions=True, **p.kwargs
    )
    assert res.J_T < 1e-3
    mx = np.max(np.abs(res.optimized_controls[0]))
    assert 0.75 < mx < 0.85
