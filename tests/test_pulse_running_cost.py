"""Pulse-dependent running costs (port of the reference's
``test/test_pulse_running_cost.jl``)."""

import numpy as np
import jax.numpy as jnp

from grape_tpu import optimize_problem
from grape_tpu.functionals import J_T_re, J_a_fluence
from grape_tpu.testing import dummy_control_problem


def _J_a_smoothness(pulsevals, tlist):
    """0.5 Σ_l Σ_n (ε_{nl} - ε_{n-1,l})² over the flat l-major layout."""
    N = len(tlist) - 1
    eps = jnp.reshape(pulsevals, (-1, N))
    return 0.5 * jnp.sum((eps[:, 1:] - eps[:, :-1]) ** 2)


def _grad_J_a_smoothness(pulsevals, tlist):
    # NOTE: runs inside the jitted fg program, so it must be jnp-traceable
    N = len(tlist) - 1
    eps = jnp.reshape(pulsevals, (-1, N))
    g = jnp.zeros_like(eps)
    g = g.at[:, 1:].add(eps[:, 1:] - eps[:, :-1])
    g = g.at[:, :-1].add(eps[:, :-1] - eps[:, 1:])
    return jnp.reshape(g, jnp.shape(pulsevals))


def test_running_cost_with_manual_gradient():
    rng = np.random.default_rng(1244561944)
    problem = dummy_control_problem(n_controls=2, rng=rng)
    res = optimize_problem(
        problem,
        J_a=_J_a_smoothness,
        grad_J_a=_grad_J_a_smoothness,
        lambda_a=0.1,
        J_T=J_T_re,
        iter_stop=2,
        print_iters=False,
        rethrow_exceptions=True,
    )
    assert res.converged
    assert res.J_T < res.J_T_prev


def test_manual_gradient_matches_ad():
    """The hand-written smoothness gradient equals the jax.grad one."""
    import jax

    tlist = np.linspace(0, 1, 21)
    rng = np.random.default_rng(7)
    x = rng.normal(size=2 * 20)
    ad = np.asarray(jax.grad(lambda p: _J_a_smoothness(p, tlist))(x))
    assert np.allclose(ad, _grad_J_a_smoothness(x, tlist), atol=1e-12)


def test_fluence_running_cost_shrinks_pulses():
    """`J_a_fluence` must shrink the optimized pulse norms
    (reference `test/test_pulse_running_cost.jl:69-80`)."""
    rng = np.random.default_rng(1244561944)
    problem = dummy_control_problem(n_controls=2, rng=rng)
    res0 = optimize_problem(
        problem, J_T=J_T_re, iter_stop=2, print_iters=False,
        rethrow_exceptions=True,
    )
    res = optimize_problem(
        problem, J_a=J_a_fluence, J_T=J_T_re, iter_stop=2,
        print_iters=False, rethrow_exceptions=True,
    )
    assert res0.converged and res.converged
    assert sum(np.linalg.norm(c) for c in res.optimized_controls) < sum(
        np.linalg.norm(c) for c in res0.optimized_controls
    )
