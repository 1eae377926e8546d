"""Execute the code blocks of ``docs/tutorial.md`` (doc-rot protection).

The reference runs its documentation examples as tests
(``/root/reference/test/generate_example_tests.jl``); this is the same
guard for the tutorial walkthrough: every ``python`` fenced block runs
in one shared namespace, with the single ``gate = ...`` placeholder
filled in and the iteration budget reduced for CI speed.
"""

import pathlib
import re

import numpy as np

DOC = pathlib.Path(__file__).resolve().parents[1] / "docs" / "tutorial.md"


def _python_blocks(text):
    return re.findall(r"```python\n(.*?)```", text, flags=re.DOTALL)


def test_tutorial_blocks_execute():
    blocks = _python_blocks(DOC.read_text())
    assert len(blocks) >= 6, "tutorial lost its code blocks"
    src = "\n".join(blocks)
    assert "gate = ..." in src, (
        "placeholder moved — update this test along with the tutorial"
    )
    # Fill the one placeholder (a CZ on the computational subspace) and
    # shrink the optimization so the walkthrough runs in CI time.
    src = src.replace(
        "gate = ...",
        "gate = np.diag([1, 1, 1, -1]).astype(complex)",
    )
    # each replace target must exist: a silent no-op would run the full
    # 100-iteration walkthrough (doc drift weakens the guard)
    assert "iter_stop=100" in src, "tutorial text drifted: iter_stop"
    src = src.replace("iter_stop=100", "iter_stop=3")
    assert '"J_T < 10⁻³" if r.J_T < 1e-3' in src, (
        "tutorial text drifted: convergence message"
    )
    src = src.replace('"J_T < 10⁻³" if r.J_T < 1e-3',
                      '"J_T < 0.5" if r.J_T < 0.5')
    ns = {}
    exec(compile(src, str(DOC), "exec"), ns)

    result = ns["result"]
    # The walkthrough must produce a real optimization step: J decreased
    # from the guess and the result surface is intact.  (1 <= iter <= 3:
    # early convergence or a line-search stop must not flake the guard.)
    assert 1 <= result.iter <= 3
    assert result.J_T < result.records[0]["J_T"] if result.records else True
    assert len(ns["eps_opt"]) == len(ns["tlist"])
    assert result.fg_calls >= 3
    bound = 0.5 + 1e-6
    assert float(np.max(np.abs(result.optimized_controls[0]))) <= bound
