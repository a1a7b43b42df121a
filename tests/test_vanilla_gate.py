"""Every queries() entry must analyze under a VANILLA SparkSession.

The driver harness builds its session with no engine confs; round 2
shipped 4 queries that only analyzed under the engine session (the
TIMESTAMP_NTZ/unix_millis family). This runs tools/vanilla_gate.py in a
subprocess — a fresh JVM with a truly vanilla session — so the
configured session owned by the pytest process cannot mask a failure.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_all_queries_analyze_under_vanilla_session():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "vanilla_gate.py")],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"vanilla-session gate failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-4000:]}"
    )
