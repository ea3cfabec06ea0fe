"""examples/examplify_sim.py — the reference's live accuracy-measurement
loop (_examplify_live.py), hermetic: synthesized frames through the real
receiver + UDP collect, per-setting pass-rate CSV."""

import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_examplify_sim_csv(tmp_path):
    out = tmp_path / "results.csv"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "examplify_sim.py"),
         "--sfs", "7", "--crs", "4/5", "--times", "3", "--seed", "11",
         "--out", str(out)],
        capture_output=True, text=True, timeout=580, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr
    lines = out.read_text().strip().splitlines()
    assert lines[0] == "SF,CR,PASSED,TOTAL,RATE"
    sf, cr, passed, total, rate = lines[1].split(",")
    assert (sf, cr, passed, total, rate) == ("7", "4/5", "3", "3", "100.00")
