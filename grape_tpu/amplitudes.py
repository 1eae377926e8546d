"""Control amplitudes.

Analog of ``QuantumPropagators.Amplitudes`` as used by the reference
(``ShapedAmplitude`` at ``/root/reference/test/test_lbfgsb_saddle_point.jl:9,59-63``
and ``docs/src/tutorial.md:77-108``): an *amplitude* maps the value of an
underlying control ``ε_l(t)`` to the coefficient ``a(ε, t)`` multiplying a
Hamiltonian term.  The optimization always acts on the control values; the
amplitude (and its derivative ``∂a/∂ε``) enters the Hamiltonian evaluation and
the control-derivative operators ``μ_l = ∂H/∂ε_l``.

For the jitted device program, each amplitude is compiled to a pair of static
per-interval arrays / closures via :meth:`compile` — no Python dispatch inside
the time scan.
"""

import numpy as np

from .controls import discretize_on_midpoints

__all__ = ["ShapedAmplitude", "LockedAmplitude"]


class LockedAmplitude:
    """A fixed (non-optimized) time-dependent amplitude ``a(t) = shape(t)``.

    Analog of ``QuantumPropagators.Amplitudes.LockedAmplitude``: the term
    contributes shape(t)·Op to the generator but exposes no control, so the
    optimization never touches it (e.g. a fixed pump pulse while optimizing
    the Stokes pulse).
    """

    def __init__(self, shape):
        self.shape = shape

    def get_controls(self):
        return ()

    def compile(self, tlist):
        return discretize_on_midpoints(self.shape, tlist)


class ShapedAmplitude:
    """Amplitude ``a(t) = shape(t) * ε(t)`` for a control ``ε``.

    ``shape`` is a static function of time (or a vector on the time grid /
    midpoints); ``control`` is the optimizable control.  The derivative
    ``∂a/∂ε`` at interval ``n`` is ``shape(t_n)``.
    """

    def __init__(self, control, shape):
        self.control = control
        self.shape = shape

    def get_controls(self):
        return (self.control,)

    def compile(self, tlist):
        """Static per-interval shape values ``(N_T,)``."""
        return discretize_on_midpoints(self.shape, tlist)
