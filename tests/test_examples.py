"""Entry-script smoke tests: every example parses args and reaches its
--help screen (catches import and CLI wiring breakage without datasets)."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = ["infer.py", "pretrain.py", "train.py", "eval.py", "refine.py",
           "sketchify.py", "tikzero/pretrain.py", "tikzero/train.py"]


@pytest.mark.parametrize("script", SCRIPTS)
def test_example_help(script):
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu",
               DETIKZIFY_TPU_COMPILER="fake")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), "--help"],
        capture_output=True, text=True, timeout=300, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "usage" in out.stdout.lower()
