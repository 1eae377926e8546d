"""Analytic FLOP model (auditable bench MFU, VERDICT round-2 item 6).

The per-kernel matmul constants are pinned against the COMPILED programs
(HLO dot-op counts), and the fg-level model is exercised on the bench
sweep shapes (every entry must be positive and scale linearly with the
time grid)."""

import numpy as np
import jax
import jax.numpy as jnp

from grape_tpu.fg import compile_problem
from grape_tpu.flops import _EXPM_F32_MATMULS, fg_flops
from grape_tpu.functionals import J_T_sm
from grape_tpu import Trajectory, hamiltonian


def _count_dots(fn, *args):
    hlo = jax.jit(fn).lower(*args).compiler_ir(dialect="hlo").as_hlo_text()
    return sum(
        1 for line in hlo.splitlines() if " dot(" in line or " = dot" in line
    )


def test_expm_taylor_ps_matmul_count():
    """The degree-16 Taylor-PS expm compiles to exactly the 7 matmuls the
    model charges (3 powers + 4 Horner blocks)."""
    from grape_tpu.ops.expm import expm_taylor_ps

    A = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 8)), dtype=jnp.complex64
    )
    # complex matmuls lower to >=1 dot each; count unique dot ops per
    # complex product by running on a REAL input (1 dot per matmul)
    Ar = jnp.real(A).astype(jnp.float32)
    assert _count_dots(expm_taylor_ps, Ar) == _EXPM_F32_MATMULS


def test_frechet_taylor_ps_matmul_count():
    """The Fréchet Taylor-PS base costs 7 + 13·Ldir matmul-equivalents;
    the Ldir direction axis batches into single HLO dots, so the compiled
    program has exactly 20 dot ops: 7 (E side) + 13 (direction side)."""
    from grape_tpu.ops.frechet import _frechet_taylor_ps

    rng = np.random.default_rng(1)
    for L in (1, 3):
        A = jnp.asarray(rng.normal(size=(6, 6)), dtype=jnp.float32)
        B = jnp.asarray(rng.normal(size=(L, 6, 6)), dtype=jnp.float32)
        assert _count_dots(_frechet_taylor_ps, A, B) == 20


def _problem(K=2, n_steps=50, shared=True, **kwargs):
    sz = np.array([[1, 0], [0, -1]], dtype=complex)
    sx = np.array([[0, 1], [1, 0]], dtype=complex)

    def eps(t):
        return 0.3

    if shared:
        H = hamiltonian(-0.5 * sz, (sx, eps))
        trajs = [
            Trajectory(e, H, target_state=t)
            for e, t in (([1, 0], [0, 1]), ([0, 1], [1, 0]))
        ]
    else:
        trajs = [
            Trajectory(
                [1, 0],
                hamiltonian(-0.5 * (1 + 0.01 * k) * sz, (sx, eps)),
                target_state=[0, 1],
            )
            for k in range(K)
        ]
    # constant dt: per-step work (cheby order, squarings) stays fixed, so
    # total flops must be exactly linear in the number of steps
    tlist = np.linspace(0, 0.1 * n_steps, n_steps + 1)
    return compile_problem(trajs, tlist, J_T=J_T_sm, **kwargs)


def test_fg_flops_positive_and_linear_in_time():
    for kwargs in (
        dict(gradient_method="taylor"),
        dict(gradient_method="gradgen"),
        dict(gradient_method="taylor", prop_method="cheby"),
        dict(gradient_method="taylor", vectorize_backward=False,
             reuse_propagators=False),
        dict(gradient_method="gradgen", vectorize_backward=False,
             reuse_propagators=False),
        dict(gradient_method="taylor", storage_mode="recompute"),
    ):
        f1 = fg_flops(_problem(n_steps=50, **kwargs))
        f2 = fg_flops(_problem(n_steps=100, **kwargs))
        assert f1 > 0
        np.testing.assert_allclose(f2 / f1, 2.0, rtol=0.05), kwargs


def test_fg_flops_shared_generator_cheaper():
    """The shared-generator fast path drops the per-trajectory expm work;
    the model must reflect it."""
    f_shared = fg_flops(_problem(shared=True))
    f_separate = fg_flops(_problem(shared=False))
    assert f_separate > f_shared
