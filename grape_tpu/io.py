"""Result persistence and disk checkpointing.

Analog of the reference's ``@optimize_or_load`` / ``load_optimization``
workflow (``/root/reference/README.md:66-78``,
``test/test_readme_example.jl:8-41``) and the atexit crash-dump
(``src/optimize.jl:114-124``): results are serialized as NPZ+pickle files and
can be reloaded and used as ``continue_from`` warm starts.
"""

import os
import pickle

import numpy as np

__all__ = ["save_result", "load_result", "optimize_or_load", "load_optimization"]


def save_result(result, filename):
    """Serialize a :class:`GrapeResult` to disk."""
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    with open(filename, "wb") as fh:
        pickle.dump(result.to_dict(), fh)


class _LoadedResult:
    """A result reloaded from disk (duck-types GrapeResult for
    ``continue_from`` and attribute access)."""

    def __init__(self, data):
        for key, val in data.items():
            setattr(self, key, val)

    def __repr__(self):
        return f"GrapeResult<{self.message}> (loaded)"


def load_result(filename):
    with open(filename, "rb") as fh:
        data = pickle.load(fh)
    return _LoadedResult(data)


def load_optimization(filename):
    """Reference ``load_optimization`` analog."""
    return load_result(filename)


def optimize_or_load(filename, trajectories, tlist, **kwargs):
    """Run :func:`grape_tpu.optimize` and persist the result to `filename`;
    if `filename` already holds a result, load and return it instead
    (``@optimize_or_load`` analog).  The optimization runs with
    ``atexit_filename`` set so that a crash still dumps the in-progress
    result (``src/optimize.jl:114-124``)."""
    from .optimize import optimize

    if os.path.exists(filename):
        return load_result(filename)
    result = optimize(
        trajectories, tlist, atexit_filename=filename, **kwargs
    )
    save_result(result, filename)
    return result
