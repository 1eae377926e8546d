"""Unit tests for the traced L-BFGS + Moré-Thuente line search
(``optimizers/jax_lbfgs.py`` — the device-resident loop's optimizer;
ports the algorithms of ``native/lbfgsb.cpp``:93-250, themselves the
published Byrd-Lu-Nocedal-Zhu / MINPACK-2 procedures behind the
reference's Fortran ``setulb``, ``/root/reference/ext/GRAPELBFGSBExt.jl:70-143``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grape_tpu.optimizers.jax_lbfgs import (
    lbfgs_direction, make_lbfgs_iter, morethuente_linesearch,
)


def _dense_inverse_hessian(S, Y, pairs, n, gamma):
    """Textbook dense BFGS inverse-Hessian reconstruction
    H_{k+1} = V^T H_k V + rho s s^T (Nocedal & Wright eq. 7.16)."""
    H = gamma * np.eye(n)
    for s, y in pairs:
        rho = 1.0 / np.dot(y, s)
        V = np.eye(n) - rho * np.outer(y, s)
        H = V.T @ H @ V + rho * np.outer(s, s)
    return H


def test_two_loop_matches_dense_bfgs():
    """The two-loop recursion equals the dense inverse-Hessian product
    -H·g for full and for wrapped (circular-buffer) histories."""
    rng = np.random.default_rng(0)
    n, m = 6, 4
    for n_pairs in (1, 3, 4, 7):  # incl. buffer wrap (7 > m)
        S = np.zeros((m, n))
        Y = np.zeros((m, n))
        rho = np.zeros(m)
        pairs = []
        for i in range(n_pairs):
            s = rng.normal(size=n)
            y = s + 0.3 * rng.normal(size=n)
            if np.dot(y, s) < 0:  # ensure curvature
                y = -y
            slot = i % m
            S[slot] = s
            Y[slot] = y
            rho[slot] = 1.0 / np.dot(y, s)
            pairs.append((s, y))
        g = rng.normal(size=n)
        d = np.asarray(lbfgs_direction(
            jnp.asarray(g), jnp.asarray(S), jnp.asarray(Y),
            jnp.asarray(rho), jnp.asarray(n_pairs), m,
        ))
        kept = pairs[-min(n_pairs, m):]
        s_new, y_new = kept[-1]
        gamma = np.dot(s_new, y_new) / np.dot(y_new, y_new)
        H = _dense_inverse_hessian(S, Y, kept, n, gamma)
        ref = -H @ g
        assert np.max(np.abs(d - ref)) < 1e-10 * max(np.max(np.abs(ref)), 1)


def test_morethuente_strong_wolfe():
    """On a non-quadratic 1D objective the accepted step satisfies the
    strong Wolfe conditions (sufficient decrease + curvature)."""

    def fg(x):
        # f(t) = t^4/4 - t^2/2 - 0.1 t along d=(1,): minimum near t≈1.05
        t = x[0]
        f = 0.25 * t**4 - 0.5 * t**2 - 0.1 * t
        g = jnp.array([t**3 - t - 0.1])
        return f, g, {"z": jnp.zeros(())}

    x = jnp.zeros(1, dtype=jnp.float64)
    f0, g0, aux0 = fg(x)
    d = -g0
    dg0 = float(jnp.dot(g0, d))
    stp, f, g, _aux, nfev, ok = morethuente_linesearch(
        fg, x, d, f0, dg0, 1.0 / max(abs(dg0) ** 0.5, 1e-12), aux0, g0
    )
    stp, f, nfev = float(stp), float(f), int(nfev)
    dg = float(jnp.dot(g, d))
    assert bool(ok)
    assert f <= float(f0) + 1e-4 * stp * dg0  # sufficient decrease
    assert abs(dg) <= 0.9 * abs(dg0)          # curvature
    assert 1 <= nfev <= 20


def test_lbfgs_iter_converges_rosenbrock():
    """The full iteration (direction + line search + history update)
    drives the 2-D Rosenbrock function to its minimum — the classic
    ill-conditioned curved-valley stress test for the line search."""

    def fg(x):
        a, b = x[0], x[1]
        f = (1 - a) ** 2 + 100.0 * (b - a**2) ** 2
        g = jnp.array([
            -2 * (1 - a) - 400.0 * a * (b - a**2),
            200.0 * (b - a**2),
        ])
        return f, g, {"z": jnp.zeros(())}

    init_state, step = make_lbfgs_iter(fg, n=2, m=10)
    x = jnp.array([-1.2, 1.0], dtype=jnp.float64)
    st = init_state(x)
    f, g, aux = fg(x)
    for _ in range(60):
        x, st, f, g, aux, _alpha, _nfev = step(x, st, f, g, aux)
    assert float(f) < 1e-12
    assert np.max(np.abs(np.asarray(x) - 1.0)) < 1e-6


def test_lbfgs_iter_respects_bounds():
    """Box bounds via projection: the iterate never leaves the box and
    the bound-constrained quadratic converges to the boundary optimum."""
    A = jnp.asarray(np.diag([1.0, 10.0]))
    b = jnp.asarray(np.array([3.0, 3.0]))

    def fg(x):
        f = 0.5 * x @ A @ x - b @ x  # unconstrained opt at (3, 0.3)
        g = A @ x - b
        return f, g, {"z": jnp.zeros(())}

    lower = jnp.asarray(np.array([-1.0, -1.0]))
    upper = jnp.asarray(np.array([1.0, 1.0]))
    init_state, step = make_lbfgs_iter(
        fg, n=2, m=10, lower=lower, upper=upper
    )
    x = jnp.zeros(2, dtype=jnp.float64)
    st = init_state(x)
    f, g, aux = fg(x)
    for _ in range(25):
        x, st, f, g, aux, _a, _n = step(x, st, f, g, aux)
        assert np.all(np.asarray(x) >= -1.0 - 1e-12)
        assert np.all(np.asarray(x) <= 1.0 + 1e-12)
    # constrained optimum: x0 clamps to 1, x1 = b1/A11 = 0.3 interior
    assert abs(float(x[0]) - 1.0) < 1e-6
    assert abs(float(x[1]) - 0.3) < 1e-6


def test_morethuente_vs_scipy_dcsrch():
    """Differential check of the traced Moré-Thuente port against
    scipy's MINPACK-2 ``dcsrch`` wrapper (``scalar_search_wolfe1`` — the
    same Fortran the reference's L-BFGS-B uses): on a battery of 1-D
    objectives, both must accept strong-Wolfe points; where both
    converge cleanly the accepted objective values agree to the line
    search's own tolerance class."""
    from scipy.optimize._linesearch import scalar_search_wolfe1

    cases = [
        # (phi, dphi): scalar objective along the search direction
        (lambda t: 0.25 * t**4 - 0.5 * t**2 - 0.1 * t,
         lambda t: t**3 - t - 0.1),
        (lambda t: (t - 1.7) ** 2, lambda t: 2 * (t - 1.7)),
        (lambda t: -t + 50.0 * t**2 / 2, lambda t: -1 + 50.0 * t),
        (lambda t: jnp.cos(t + 0.3), lambda t: -jnp.sin(t + 0.3)),
    ]
    for i, (phi, dphi) in enumerate(cases):
        f0, dg0 = float(phi(0.0)), float(dphi(0.0))
        assert dg0 < 0  # descent

        def fg(x, _phi=phi, _dphi=dphi):
            t = x[0]
            return _phi(t), jnp.array([_dphi(t)]), {"z": jnp.zeros(())}

        x = jnp.zeros(1, dtype=jnp.float64)
        d = jnp.ones(1, dtype=jnp.float64)
        _, g0v, aux0 = fg(x)
        stp, f, g, _aux, nfev, ok = morethuente_linesearch(
            fg, x, d, f0, dg0, 1.0, aux0, g0v
        )
        stp, f = float(stp), float(f)
        assert bool(ok), i
        # strong Wolfe at the accepted point
        dg = float(dphi(stp))
        assert f <= f0 + 1e-4 * stp * dg0 + 1e-12, i
        assert abs(dg) <= 0.9 * abs(dg0) + 1e-12, i

        s_stp, s_f, _ = scalar_search_wolfe1(
            phi, dphi, phi0=f0, derphi0=dg0, c1=1e-4, c2=0.9
        )
        assert s_stp is not None, i
        # both satisfy the same conditions; the accepted objective
        # values are comparable (the conditions admit an interval, so
        # compare f, not stp)
        assert f <= float(s_f) + 0.1 * (f0 - float(s_f) + 1e-12), i
