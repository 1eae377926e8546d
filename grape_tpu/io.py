"""Result persistence and disk checkpointing.

Analog of the reference's ``@optimize_or_load`` / ``load_optimization``
workflow (``/root/reference/README.md:66-78``,
``test/test_readme_example.jl:8-41``) and the atexit crash-dump
(``src/optimize.jl:114-124``): results are serialized as NPZ+pickle files and
can be reloaded and used as ``continue_from`` warm starts.

``optimize_or_load`` is config-aware: a digest of the problem
configuration is stored with the result, and a checkpoint produced by a
DIFFERENT configuration triggers a warning and a re-run instead of
silently returning the stale result (the reference ties the JLD2 file to
the producing config through DrWatson's config-keyed workflow,
README.md:66-78).
"""

import hashlib
import os
import pickle

import numpy as np

__all__ = [
    "save_result", "load_result", "optimize_or_load", "load_optimization",
    "config_digest",
]


def _describe(v):
    """Stable, address-free description of one config value for the
    digest.  Callables hash by qualified name (a changed lambda BODY
    under the same name is not detected — the reference's JLD2 workflow
    has the same blind spot); arrays hash by content."""
    if callable(v):
        mod = getattr(v, "__module__", "?")
        qn = getattr(v, "__qualname__", type(v).__name__)
        return f"fn:{mod}.{qn}"
    if isinstance(v, np.ndarray):
        return (
            f"ndarray{v.shape}:"
            + hashlib.sha1(np.ascontiguousarray(v).tobytes()).hexdigest()[:16]
        )
    if isinstance(v, dict):
        inner = ",".join(
            f"{k}={_describe(v[k])}" for k in sorted(v, key=str)
        )
        return "{" + inner + "}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_describe(u) for u in v) + "]"
    return repr(v)


# presentation/observation kwargs that do not change the produced
# result: excluded from the digest so toggling them does not invalidate
# a checkpoint
_DIGEST_EXCLUDE = frozenset({
    "print_iters", "print_iter_info", "store_iter_info", "verbose",
    "rethrow_exceptions", "callback", "atexit_filename", "profile_dir",
})


def _describe_trajectory(t):
    """Content description of one trajectory: states, weight, and the
    generator's operator content + amplitude identities — the part of
    the configuration most likely to change between runs (perturbed
    Hamiltonians, new targets)."""
    parts = [f"psi0={_describe(np.asarray(t.initial_state))}"]
    tgt = getattr(t, "target_state", None)
    parts.append(
        "tgt=" + (_describe(np.asarray(tgt)) if tgt is not None else "None")
    )
    parts.append(f"w={getattr(t, 'weight', 1.0)!r}")
    gen = getattr(t, "generator", None)
    if gen is not None and hasattr(gen, "terms"):
        parts.append("H0=" + _describe(np.asarray(gen.drift)))
        for op, amp in gen.terms:
            parts.append(
                "term=" + _describe(np.asarray(op)) + ":" + _describe(amp)
            )
    elif gen is not None:
        parts.append("gen=" + _describe(gen))
    return ";".join(parts)


def config_digest(trajectories, tlist, kwargs):
    """Digest of the optimization configuration — trajectory CONTENT
    (states, weights, generator operators/amplitudes), the full time
    grid, and all result-affecting kwargs — used by
    :func:`optimize_or_load` to detect a stale checkpoint."""
    tlist = np.asarray(tlist, dtype=float)
    parts = [
        f"n_traj={len(list(trajectories))}",
        "tlist=" + _describe(tlist),
    ]
    for t in trajectories:
        parts.append(_describe_trajectory(t))
    for key in sorted(kwargs, key=str):
        if key in _DIGEST_EXCLUDE:
            continue
        parts.append(f"{key}={_describe(kwargs[key])}")
    return hashlib.sha1("|".join(parts).encode()).hexdigest()


def save_result(result, filename, config_digest=None):
    """Serialize a :class:`GrapeResult` to disk (optionally tagged with
    the producing configuration's digest)."""
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    data = result.to_dict()
    if config_digest is not None:
        data["config_digest"] = config_digest
    with open(filename, "wb") as fh:
        pickle.dump(data, fh)


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


def optimize_or_load(filename, trajectories, tlist, force=False, **kwargs):
    """Run :func:`grape_tpu.optimize` and persist the result to `filename`;
    if `filename` already holds a result FROM THE SAME CONFIGURATION,
    load and return it instead (``@optimize_or_load`` analog).  A
    checkpoint whose stored config digest differs from the current
    arguments is stale: a warning is emitted and the optimization
    re-runs, overwriting the file (``force=True`` always re-runs).
    Files written before digests existed load unconditionally.  The
    optimization runs with ``atexit_filename`` set so that a crash still
    dumps the in-progress result (``src/optimize.jl:114-124``)."""
    from .optimize import optimize

    digest = config_digest(trajectories, tlist, kwargs)
    if os.path.exists(filename) and not force:
        loaded = load_result(filename)
        stored = getattr(loaded, "config_digest", None)
        if stored is None or stored == digest:
            return loaded
        import warnings

        warnings.warn(
            f"checkpoint {filename} was produced by a different "
            "configuration (config digest mismatch); re-running the "
            "optimization and overwriting it"
        )
    result = optimize(
        trajectories, tlist, atexit_filename=filename, **kwargs
    )
    save_result(result, filename, config_digest=digest)
    return result
