"""Each examples/ script runs end-to-end at sf0.001 as a subprocess
(fresh interpreter, like a user would)."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = sorted(
    f for f in os.listdir(os.path.join(ROOT, "examples")) if f.endswith(".py")
)


@pytest.mark.parametrize("script", SCRIPTS)
def test_example_runs(script):
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", script),
         "/root/testdata/sf0.001"],
        capture_output=True, text=True, timeout=300, cwd=ROOT,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.strip(), "script produced no output"
