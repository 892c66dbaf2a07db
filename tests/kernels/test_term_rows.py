"""Terminal-accumulation rows (round 4): both terminal-tracking forms of
the Pallas kernel are bit-identical to the XLA scan in every mode — the
batch driver picks per mode by measurement (global: rows; semi/local:
scalar trackers), but BOTH must stay correct."""

import numpy as np
import pytest

from praline_tpu import ALPHABET_AA, builtin_score_matrix
from praline_tpu.kernels.pallas_dp import wavefront_dp_pallas
from praline_tpu.kernels.scan import wavefront_dp
from praline_tpu.kernels.scores import skewed_pair_scores

B62 = builtin_score_matrix("blosum62")
A = ALPHABET_AA.size


def _inputs(rng, B, Lx, Ly):
    cx = rng.integers(0, 3, size=(B, Lx, A)).astype(np.float32)
    cx[:, :, 0] += 1
    cy = rng.integers(0, 3, size=(B, Ly, A)).astype(np.float32)
    cy[:, :, 0] += 1
    ivx = (np.float32(1.0) / np.maximum(cx.sum(-1), 1)).astype(np.float32)
    ivy = (np.float32(1.0) / np.maximum(cy.sum(-1), 1)).astype(np.float32)
    # Length-1 problems hit the diagonal-1 terminal seeds.
    lx = rng.integers(1, Lx + 1, size=B).astype(np.int32)
    ly = rng.integers(1, Ly + 1, size=B).astype(np.int32)
    return cx, ivx, cy, ivy, lx, ly


@pytest.mark.parametrize("mode", ["global", "semiglobal", "local"])
@pytest.mark.parametrize("traceback", [False, True])
@pytest.mark.parametrize("term_rows", [False, True])
def test_term_rows_matches_scan(mode, traceback, term_rows):
    rng = np.random.default_rng(hash((mode, traceback, term_rows)) % 2**32)
    cx, ivx, cy, ivy, lx, ly = _inputs(rng, 6, 40, 33)
    hs = skewed_pair_scores(cx, ivx, cy, ivy, B62.as_f32())
    want = wavefront_dp(hs, lx, ly, gap_series=(11, 1), mode=mode,
                        traceback=traceback)
    got = wavefront_dp_pallas(hs, lx, ly, gap_series=(11, 1), mode=mode,
                              traceback=traceback, term_rows=term_rows)
    # tcode/length are zeros when the respective pallas carries are
    # disabled (module docstring) — compare only the live outputs.
    for k in ("score", "ti", "tj"):
        np.testing.assert_array_equal(np.asarray(want[k]), np.asarray(got[k]), k)
    if not traceback:
        np.testing.assert_array_equal(
            np.asarray(want["length"]), np.asarray(got["length"])
        )
    else:
        np.testing.assert_array_equal(
            np.asarray(want["tcode"]), np.asarray(got["tcode"])
        )
        np.testing.assert_array_equal(np.asarray(want["tb"]), np.asarray(got["tb"]))


def test_term_rows_tie_breaks_exhaustive():
    """Zero matrix + zero-ish gaps manufacture massive terminal ties; the
    row-form reduction must reproduce the scan's §8.4 tie-breaks exactly."""
    rng = np.random.default_rng(3)
    B, Lx, Ly = 4, 9, 7
    cx = np.zeros((B, Lx, A), np.float32)
    cx[:, :, 1] = 1
    cy = np.zeros((B, Ly, A), np.float32)
    cy[:, :, 1] = 1
    ivx = np.ones((B, Lx), np.float32)
    ivy = np.ones((B, Ly), np.float32)
    lx = rng.integers(1, Lx + 1, size=B).astype(np.int32)
    ly = rng.integers(1, Ly + 1, size=B).astype(np.int32)
    s = np.zeros((A, A), np.float32)
    hs = skewed_pair_scores(cx, ivx, cy, ivy, s)
    for mode in ("global", "semiglobal", "local"):
        want = wavefront_dp(hs, lx, ly, gap_series=(0, 0), mode=mode,
                            traceback=True)
        got = wavefront_dp_pallas(hs, lx, ly, gap_series=(0, 0), mode=mode,
                                  traceback=True, term_rows=True)
        for k in ("score", "ti", "tj", "tcode"):
            np.testing.assert_array_equal(
                np.asarray(want[k]), np.asarray(got[k]), f"{mode}:{k}"
            )
