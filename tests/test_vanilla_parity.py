"""Every registered query must ANALYZE under the driver's session.

Runs tools/vanilla_parity.py in a subprocess (a fresh process is the
point: an in-process "vanilla" builder would getOrCreate the suite's
already-tuned session and hide exactly the divergence this guards —
the round-2 TIMESTAMP_NTZ driver failure)."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_all_queries_analyze_under_vanilla_session():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "vanilla_parity.py"),
         "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"vanilla-session parity failed:\n{proc.stdout[-4000:]}\n{proc.stderr[-2000:]}"
    )
