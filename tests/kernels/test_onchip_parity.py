"""Compiled-on-chip parity as a committed gate (SURVEY.md §5.2, VERDICT r2
item 3): under PRALINE_PERF=1 on a real TPU, every compiled kernel —
Pallas two-kernel, fully fused, int8 one-hot scoring, on-device replay —
must be bit-identical to the compiled XLA scan / oracle, all modes x gap
series.  Runs in a subprocess because the suite's conftest pins this
process to the simulated CPU mesh."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

requires_perf = pytest.mark.skipif(
    os.environ.get("PRALINE_PERF") != "1", reason="set PRALINE_PERF=1 on TPU"
)

TOOL = Path(__file__).resolve().parents[2] / "tools" / "onchip_parity.py"


@requires_perf
def test_onchip_compiled_parity():
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, str(TOOL)],
        capture_output=True, text=True, timeout=1800, env=env,
        cwd=str(TOOL.parents[1]),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "ONCHIP_PARITY_OK" in proc.stdout, proc.stdout[-2000:]
