"""r11 (verdict item 4): the degenerate-input probe is a round-end
GATE, not just a tool — a new operator with an unguarded degenerate
shape (zero vectors, empty/NULL frames, all-equal corpora, k > n)
fails the suite the same way the scale gate catches magnitude bugs.

Subprocess for the same reason tools/vanilla_gate.py is one: the
probe builds its own session with its own conf, and a shared-JVM
session would mask conf-dependent crashes (ANSI mode is the whole
point — the cosine zero-norm family only crashed under ANSI)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_degenerate_probe_has_no_engine_crash_findings():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "degenerate_probe.py")],
        capture_output=True,
        text=True,
        # r12: ~60 doc ops x 10 frames (incl. the line-heavy frame) +
        # emb/event sweeps ran ~15 min on a calm host — headroom for
        # the drift-1.3 band so the gate never flakes on a slow host
        timeout=2700,
        cwd=REPO,
    )
    tail = "\n".join(proc.stdout.splitlines()[-40:])
    assert proc.returncode == 0, (
        f"degenerate probe found engine crashes (rc={proc.returncode}):\n"
        f"{tail}\n--- stderr tail ---\n"
        + "\n".join(proc.stderr.splitlines()[-10:])
    )
    assert "=== 0 engine-crash findings ===" in proc.stdout, tail
