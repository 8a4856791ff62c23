"""The documented example scripts stay runnable — they are the first
thing a reference user tries (README points at both)."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
@pytest.mark.parametrize("script", ["quickstart.py", "parallelism.py"])
def test_example_script_runs(script):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", script)],
        env=env, capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, (r.stdout[-2000:] + "\n" + r.stderr[-2000:])
    assert "done" in r.stdout
