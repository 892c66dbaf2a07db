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


# Floors sit ~2x off measured steady state (VERDICT r2 item 9: the old
# 10x-slack floors could not catch a real regression), with the slack
# covering relay-latency variance, not code regressions.  Measured on the
# v5e, round 4 (strip route): cells 10.2e9, msa 0.42 s, preprofile 0.80 s,
# allpairs 0.084 s.


@requires_perf
def test_cells_per_second_floor():
    # Driver target is 1e9 cells/s/chip [B:5]; round-5 measured 12.2e9
    # (strip shaves + production-tile pull amortization + tolist unpack;
    # compute-only rate 14.3e9, tools/onchip_latency.py).
    result = _run_bench("cells")
    assert result["value"] >= 6.0e9, result


@requires_perf
def test_msa_wallclock_floor():
    """End-to-end floor (VERDICT r1 item 9): the progressive-MSA product
    path, where host-side regressions live — not just the headline kernel.
    Round-4 measured 0.42 s steady-state on the v5e (was 18 s in round 1)."""
    result = _run_bench("msa")
    assert result["value"] <= 1.0, result


@requires_perf
def test_preprofile_wallclock_floor():
    """Config-4 floor: global master-slave preprofiles end to end.
    Round-4 measured 0.80 s steady-state on the v5e (was 55 s in round 1)."""
    result = _run_bench("preprofile")
    assert result["value"] <= 2.0, result


@requires_perf
def test_allpairs100_wallclock_floor():
    """Config-2 floor: the 4950-pair distance stage in one indexed
    dispatch; round-4 measured 0.084 s steady-state on the v5e."""
    result = _run_bench("allpairs100")
    assert result["value"] <= 0.25, result


@requires_perf
def test_tracks_cells_per_second_floor():
    """Multi-track composite floor (round 5: the strip route + MXU tier
    took tracksets from 0.4-0.8e9/OOM to 1.7-2.5e9 driver-level)."""
    result = _run_bench("tracks")
    assert result["value"] >= 0.8e9, result
