"""DCN multi-slice: two jax.distributed CPU processes form one global
mesh; retrieval merge + dp train step + TP forward across the process
boundary (SURVEY.md §5.8; scripts/dcn_dryrun.py). No hardware needed."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dcn_dryrun_two_slices():
    env = dict(os.environ)
    env["RAGMEUP_PLATFORM"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "dcn_dryrun.py"),
         "--num-slices", "2", "--devices-per-slice", "4"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=500)
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-3000:]
    assert "dcn retrieval ok" in out
    assert "dcn train ok" in out
    assert "DCN DRYRUN PASS" in out
