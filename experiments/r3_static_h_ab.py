"""A/B the static-operator H-apply decomposition at dim 1024 (one
process, so only the first program pays the big first-exec queue)."""

import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)

import grape_tpu.fg as fgmod  # noqa: E402
from grape_tpu.fg import build_fg, compile_problem  # noqa: E402
from grape_tpu.models import two_transmon_cz_problem  # noqa: E402


def build(d, n_steps, T):
    problem = two_transmon_cz_problem(d=d, n_steps=n_steps, T=T)
    kw = dict(problem.kwargs)
    kw["prop_method"] = "cheby"
    return compile_problem(
        problem.trajectories, problem.tlist, dtype=np.complex64,
        gradient_method="taylor", **kw
    )


def timefg(fg, x, n=3):
    J = float(fg(x)[0])
    assert np.isfinite(J)
    t0 = time.perf_counter()
    for _ in range(n):
        J = float(fg(x)[0])
    return (time.perf_counter() - t0) / n


def main():
    grads = {}
    for label, min_dim in (("on", 128), ("off", 10**9)):
        fgmod._STATIC_H_MIN_DIM = min_dim
        for d, n_steps, T, name in (
            (32, 100, 1.0, "dim1024"), (16, 200, 5.0, "dim256"),
        ):
            cp = build(d, n_steps, T)
            x = cp.guess_pulsevals.reshape(-1)
            fg = build_fg(cp)
            dt = timefg(fg, x)
            G = np.asarray(jax.device_get(fg(x)[1]), dtype=np.float64)
            grads.setdefault(name, {})[label] = G
            print(json.dumps({
                "config": f"{name}_cheby_taylor_static_h_{label}",
                "ms_per_eval": round(dt * 1e3, 2),
            }), flush=True)
    for name, g in grads.items():
        rel = float(np.max(np.abs(g["on"] - g["off"]))
                    / max(np.max(np.abs(g["off"])), 1e-30))
        print(json.dumps({"config": f"{name}_grad_rel_diff",
                          "value": rel}), flush=True)


if __name__ == "__main__":
    main()
