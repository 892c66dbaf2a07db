"""Register-tiled multi-diagonal DP (kernels.pallas_dp_tiled): bit parity
with the classic kernel on the body layout, all modes x gap series.

The tiled kernel is an EXPERIMENT kept for documentation: measured SLOWER
than the classic per-diagonal kernel on the v5e (tools/onchip_tiled.py —
2.1-2.5 vs 3.1-4.1e9 cells/s end-to-end at every (T, Bblk) swept), which is
the measurement that established the DP as op-issue bound rather than
VMEM-traffic bound.  The batch driver never routes to it; parity coverage
keeps it honest for any future platform where the trade flips."""

import numpy as np
import pytest

from praline_tpu import ALPHABET_AA, builtin_score_matrix
from praline_tpu.kernels.pallas_dp import wavefront_dp_pallas
from praline_tpu.kernels.pallas_dp_tiled import wavefront_dp_tiled
from praline_tpu.kernels.scores import skewed_pair_scores

B62 = builtin_score_matrix("blosum62")
A = ALPHABET_AA.size


def _body(rng, B, Lx, Ly):
    cx = rng.integers(0, 3, size=(B, Lx, A)).astype(np.float32)
    cx[:, :, 0] += 1
    cy = rng.integers(0, 3, size=(B, Ly, A)).astype(np.float32)
    cy[:, :, 0] += 1
    ivx = (np.float32(1.0) / np.maximum(cx.sum(-1), 1)).astype(np.float32)
    ivy = (np.float32(1.0) / np.maximum(cy.sum(-1), 1)).astype(np.float32)
    lx = rng.integers(1, Lx + 1, size=B).astype(np.int32)
    ly = rng.integers(1, Ly + 1, size=B).astype(np.int32)
    hs = np.asarray(skewed_pair_scores(cx, ivx, cy, ivy, B62.as_f32()))
    D, Lp = Lx + Ly + 1, Lx + 1
    LpT = -(-Lp // 128) * 128
    rows = -(-(D - 2) // 128) * 128
    body = np.zeros((rows, B, LpT), np.float32)
    body[: D - 2, :, :Lp] = hs[2:]
    return body, lx, ly, D


@pytest.mark.parametrize("gap", [(11, 1), (5,)])
@pytest.mark.parametrize("mode", ["global", "semiglobal", "local"])
@pytest.mark.parametrize("traceback", [False, True])
def test_tiled_matches_classic(gap, mode, traceback):
    rng = np.random.default_rng(hash((gap, mode, traceback)) % 2**32)
    body, lx, ly, D = _body(rng, 5, 150, 120)
    want = wavefront_dp_pallas(body, lx, ly, gap_series=gap, mode=mode,
                               traceback=traceback, hs_body=True, total_d=D)
    got = wavefront_dp_tiled(body, lx, ly, gap_series=gap, mode=mode,
                             traceback=traceback, steps_per_visit=8, total_d=D)
    for k in ("score", "length", "ti", "tj", "tcode"):
        np.testing.assert_array_equal(np.asarray(want[k]), np.asarray(got[k]), k)
    if traceback:
        np.testing.assert_array_equal(np.asarray(want["tb"]), np.asarray(got["tb"]))


def test_tiled_rejects_long_series():
    rng = np.random.default_rng(0)
    body, lx, ly, D = _body(rng, 2, 20, 20)
    with pytest.raises(ValueError):
        wavefront_dp_tiled(body, lx, ly, gap_series=(13, 7, 1), total_d=D)
