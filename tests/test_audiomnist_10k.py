"""Staged corpus-scale recipe (egs/audiomnist_10k/run.py) at smoke
scale: all four stages through a real subprocess, WER report written,
stage resume works.  Full scale (>=10k utts) runs on the chip via
bench.py / the egs runner."""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
RUNNER = REPO / "egs" / "audiomnist_10k" / "run.py"


def _run(exp, stage=0, extra=()):
    env = dict(os.environ)
    env["KHG_PLATFORM"] = "cpu"
    env.pop("JAX_PLATFORMS", None)
    return subprocess.run(
        [sys.executable, str(RUNNER), "--exp-dir", str(exp),
         "--stage", str(stage),
         "--num-utts", "60", "--num-test", "12", "--num-iters", "8",
         "--total-gauss", "150", "--max-iter-inc", "4", "--stretch", "2",
         "--batch-size", "16", *extra],
        cwd=str(REPO), env=env, capture_output=True, text=True,
        timeout=540,
    )


def test_staged_runner_end_to_end(tmp_path):
    exp = tmp_path / "exp"
    p = _run(exp)
    assert p.returncode == 0, p.stdout[-3000:] + p.stderr[-3000:]
    wer = (exp / "wer.txt").read_text().splitlines()[0]
    assert "%WER" in wer
    # synthetic digits are cleanly separable: expect near-zero WER
    pct = float(wer.split("%WER")[1].split("%")[0])
    assert pct <= 5.0, wer
    assert (exp / "final.ckpt").exists()
    assert (exp / "final.txt").exists()

    # stage resume: re-run decode only, same report
    p2 = _run(exp, stage=3)
    assert p2.returncode == 0, p2.stdout[-3000:] + p2.stderr[-3000:]
    wer2 = (exp / "wer.txt").read_text().splitlines()[0]
    assert wer2 == wer
