"""The shipped examples run end to end (the reference CI runs its
notebooks via a `test_examples` nox session -- noxfile.py:190)."""

import os
import pathlib
import subprocess
import sys

import pytest

EXAMPLES = pathlib.Path(__file__).parent.parent / "examples"


@pytest.mark.parametrize(
    "script",
    ["next_quickstart.py", "unstructured_fvm.py", "laplacian_cartesian_vs_next.py", "cartesian_tutorial.py"],
)
def test_example_runs(script):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, str(EXAMPLES / script)],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
    )
    assert r.returncode == 0, f"{script} failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
