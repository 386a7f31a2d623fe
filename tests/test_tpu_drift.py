"""TPU-platform drift gate wrapper (slow; auto-skips without a TPU).

The conftest pins the test process to CPU, so the gate runs as a
subprocess on the default (TPU) platform: scripts/tpu_drift_gate.py
asserts the engine's TPU FENs sit within the documented marginal-square
band of the committed CPU goldens (identical found flags, ≤ 2 squares per
board, ≥ 35/38 exact — RESULTS.md round 4; the curated model measures 37/38)."""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
from pathlib import Path

import pytest


@pytest.mark.slow
def test_tpu_fens_within_band_of_cpu_goldens() -> None:
    repo = Path(__file__).parent.parent
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # drop the conftest's virtual-device flag so the subprocess sees the
    # real TPU topology
    env["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "", env.get("XLA_FLAGS", "")
    ).strip()
    proc = subprocess.run(
        [sys.executable, str(repo / "scripts" / "tpu_drift_gate.py")],
        capture_output=True,
        text=True,
        timeout=3000,
        cwd=str(repo),
    )
    if proc.returncode == 42:
        pytest.skip("no TPU backend available")
    last = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "{}"
    try:
        summary = json.loads(last)
    except json.JSONDecodeError:
        summary = {"raw": proc.stdout[-2000:], "stderr": proc.stderr[-2000:]}
    assert proc.returncode == 0, f"TPU FEN drift gate failed: {summary}"
    assert summary.get("exact", 0) >= 35
