"""Performance-regression floors (SURVEY.md §5.7) — only asserted when
PRALINE_PERF=1 (requires a real TPU; plain CI runs skip).

The suite's conftest pins the pytest process itself to the simulated CPU
mesh, so each floor measures in a SUBPROCESS with the TPU platform
restored (bench.py prints one JSON line per config).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

requires_perf = pytest.mark.skipif(
    os.environ.get("PRALINE_PERF") != "1", reason="set PRALINE_PERF=1 on TPU"
)

BENCH = Path(__file__).resolve().parents[2] / "bench.py"


def _run_bench(config: str, timeout: int = 1200) -> dict:
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env.pop("XLA_FLAGS", None)  # no forced CPU device count
    proc = subprocess.run(
        [sys.executable, str(BENCH), config],
        capture_output=True, text=True, timeout=timeout, env=env,
        cwd=str(BENCH.parent),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


@requires_perf
def test_cells_per_second_floor():
    # Floor: the driver target is 1e9 cells/s/chip end-to-end [B:5]; fail
    # CI-perf if we regress below it.
    result = _run_bench("cells")
    assert result["value"] >= 1.0e9, result


@requires_perf
def test_msa_wallclock_floor():
    """End-to-end floor (VERDICT r1 item 9): the progressive-MSA product
    path, where host-side regressions live — not just the headline kernel.
    Round-2 measured 1.0s steady-state on the v5e (was 18s in round 1);
    floor at 5s leaves room for relay-state variance."""
    result = _run_bench("msa")
    assert result["value"] <= 5.0, result


@requires_perf
def test_preprofile_wallclock_floor():
    """Config-4 floor: global master-slave preprofiles end to end.
    Round-2 measured 2.0s steady-state on the v5e (was 55s in round 1)."""
    result = _run_bench("preprofile")
    assert result["value"] <= 8.0, result
