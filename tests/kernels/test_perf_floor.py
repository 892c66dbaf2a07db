"""Performance-regression floors (SURVEY.md §5.7) — only asserted when
PRALINE_PERF=1 (requires a real TPU; plain CI runs skip)."""

import os

import pytest

requires_perf = pytest.mark.skipif(
    os.environ.get("PRALINE_PERF") != "1", reason="set PRALINE_PERF=1 on TPU"
)


@requires_perf
def test_cells_per_second_floor():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    from bench import bench

    result = bench(iters=4)
    # Floor: the driver target is 1e9 cells/s/chip end-to-end [B:5]; fail
    # CI-perf if we regress below it.
    assert result["value"] >= 1.0e9, result


@requires_perf
def test_msa_wallclock_floor():
    """End-to-end floor (VERDICT r1 item 9): the progressive-MSA product
    path, where host-side regressions live — not just the headline kernel.
    Round-2 measured 3.8s on the v5e (was 18s in round 1); floor at 8s."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    from bench import bench_msa

    result = bench_msa()
    assert result["value"] <= 8.0, result


@requires_perf
def test_preprofile_wallclock_floor():
    """Config-4 floor: global master-slave preprofiles end to end.
    Round-2 measured 6.9s warm on the v5e (was 55s in round 1)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    from bench import bench_msa

    result = bench_msa("global")
    assert result["value"] <= 15.0, result
