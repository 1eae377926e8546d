"""Optax optimizer backend.

Third optimizer backend (pluggable-optimizer parity with the reference's
Optim.jl weakdep extension, ``/root/reference/ext/GRAPEOptimExt.jl``): drive
the GRAPE fg evaluations with any optax ``GradientTransformation`` (adam,
sgd with momentum, lbfgs, ...).  Box bounds are honored by projection after
each update (optax has no native bound support; the reference's Optim
backend likewise rejects bounds, ``ext/GRAPEOptimExt.jl:26-28``)."""

import numpy as np


class OptaxBackend:
    def __init__(self, transformation, project_bounds=True):
        import optax

        # uniform extra-args interface (optax.lbfgs needs value/grad/value_fn)
        self.tx = optax.with_extra_args_support(transformation)
        self.project_bounds = project_bounds

    def run(self, wrk, fg, callback, check_convergence):
        import jax.numpy as jnp
        from ..optimize import apply_convergence_check, update_result

        x = np.asarray(wrk.pulsevals, dtype=np.float64)
        wrk.pulsevals = x
        state = self.tx.init(jnp.asarray(x))
        g = np.zeros_like(x)

        # iteration 0
        f = fg(0.0, g, x)
        wrk.gradient_guess[:] = g
        update_result(wrk, 0)
        rec = callback(wrk, 0)
        wrk.fg_count[:] = 0
        if rec:
            wrk.result.records.append(rec)

        has_bounds = np.any(np.isfinite(wrk.lower_bounds)) or np.any(
            np.isfinite(wrk.upper_bounds)
        )
        while True:
            # value_fn must be traceable (optax.lbfgs jits its linesearch):
            # use the pure jitted functional directly (F-only line-search
            # probes therefore do not increment f_calls on this backend)
            updates, state = self.tx.update(
                jnp.asarray(g), state, jnp.asarray(x),
                value=jnp.asarray(f), grad=jnp.asarray(g),
                value_fn=lambda p: wrk.f(p)[0],
            )
            step = np.asarray(updates)
            wrk.searchdirection[:] = step
            wrk.alpha = 1.0
            x += step
            if has_bounds and self.project_bounds:
                np.clip(x, wrk.lower_bounds, wrk.upper_bounds, out=x)
            f = fg(0.0, g, x)
            it = wrk.result.iter + 1
            update_result(wrk, it)
            rec = callback(wrk, wrk.result.iter)
            wrk.fg_count[:] = 0
            if rec:
                wrk.result.records.append(rec)
            apply_convergence_check(wrk.result, check_convergence)
            if wrk.result.converged:
                break
            wrk.pulsevals_guess[:] = x
            wrk.gradient_guess[:] = g
        return None
