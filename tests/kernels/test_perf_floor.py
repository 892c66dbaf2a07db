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
