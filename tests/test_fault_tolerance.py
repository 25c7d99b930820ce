"""Task-retry determinism (see scripts/fault_injection_check.py).

Runs as a subprocess because retries need a ``local[8,4]`` master
(maxFailures=4) and one JVM can hold only one SparkContext — the
shared test session's ``local[8]`` would die on the first injected
failure instead of retrying it."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_results_survive_task_retry():
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "fault_injection_check.py")],
        capture_output=True,
        text=True,
        timeout=240,
        cwd=REPO,
    )
    line = next(
        (ln for ln in reversed(proc.stdout.splitlines()) if ln.startswith("{")),
        None,
    )
    assert proc.returncode == 0 and line, (
        f"probe failed rc={proc.returncode}\nstdout tail: {proc.stdout[-500:]}\n"
        f"stderr tail: {proc.stderr[-500:]}"
    )
    out = json.loads(line)
    assert out["retries"] >= 1, "injected failure never fired — equality check is vacuous"
    assert out["match"], f"results changed under task retry: {out}"
