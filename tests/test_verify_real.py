"""Runbook self-test (round-4 VERDICT directive #5).

``tools/verify_real.py`` is the one-command real-weights verification for
the networked round (HF import -> processor/logit parity vs the actual
reference -> export gate -> serving load -> spec acceptance -> bench ->
eval smoke). Nothing else in the suite imports it, so any engine/loader
API change could silently rot the one artifact that matters when real
checkpoints become reachable -- this test runs its hermetic
``--make-tiny --cpu`` path end-to-end (the tiny checkpoint is saved by
the ACTUAL reference implementation) and pins every step's verdict.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXPECTED_STEPS = (
    "import", "processor_parity", "logit_parity", "export_gate",
    "serve_load", "spec_acceptance", "bench", "eval_smoke",
)


def test_verify_real_make_tiny_cpu(tmp_path):
    out = tmp_path / "verdict.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # run production-like: no test-harness virtual-device flag
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "verify_real.py"),
         "--make-tiny", str(tmp_path / "ck"), "--cpu",
         "--workdir", str(tmp_path / "work"),
         "--output", str(out)],
        capture_output=True, text=True, timeout=1500, cwd=REPO, env=env)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-3000:])
    verdict = json.loads(out.read_text())
    assert verdict["verdict"] == "pass", verdict
    steps = verdict["checkpoints"]["tiny"]
    for name in EXPECTED_STEPS:
        assert steps.get(name, {}).get("ok") is True, (name, steps)
    # the parity gates really measured something
    assert steps["logit_parity"]["logit_max_diff"] <= 3e-4
    assert steps["bench"]["decode_tok_s"] > 0
    assert steps["eval_smoke"]["metrics"] >= 8
