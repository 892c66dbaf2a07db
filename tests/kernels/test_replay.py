"""Device-replay parity (kernels.replay vs the host pointer walk).

align_pairs_batched already routes global/semiglobal traceback through the
on-device move-tape replay, so the batched parity suite covers it end to
end; these tests pin the replay component directly against the host
replay_traceback walk on the same bit tensors, including deep gap series
(border-run re-leveling) and ragged lengths.
"""

import numpy as np
import pytest

from praline_tpu import ALPHABET_AA, builtin_score_matrix
from praline_tpu.kernels.replay import moves_to_result, replay_moves
from praline_tpu.kernels.scan import wavefront_dp
from praline_tpu.kernels.scores import skewed_pair_scores
from praline_tpu.kernels.traceback import replay_traceback
from praline_tpu.oracle.score import column_inverses
from praline_tpu.types import Profile

B62 = builtin_score_matrix("blosum62")


def _batch(rng, B, L):
    A = ALPHABET_AA.size
    cx = np.zeros((B, L, A), np.float32)
    cy = np.zeros((B, L, A), np.float32)
    lx = rng.integers(1, L + 1, size=B).astype(np.int32)
    ly = rng.integers(1, L + 1, size=B).astype(np.int32)
    profs_x, profs_y = [], []
    for b in range(B):
        px = Profile.from_tokens(rng.integers(0, 20, size=int(lx[b])).astype(np.int32), ALPHABET_AA)
        py = Profile.from_tokens(rng.integers(0, 20, size=int(ly[b])).astype(np.int32), ALPHABET_AA)
        cx[b, : px.length] = px.counts
        cy[b, : py.length] = py.counts
        profs_x.append(px)
        profs_y.append(py)
    inv_x = np.ones((B, L), np.float32)
    inv_y = np.ones((B, L), np.float32)
    for b in range(B):
        inv_x[b, : lx[b]] = column_inverses(profs_x[b])
        inv_y[b, : ly[b]] = column_inverses(profs_y[b])
    return cx, inv_x, cy, inv_y, lx, ly


@pytest.mark.parametrize("mode", ["global", "semiglobal"])
@pytest.mark.parametrize("gap_series", [(11, 1), (3,), (5, 3, 1), (9, 5, 2, 1)])
def test_device_replay_matches_host_walk(mode, gap_series):
    rng = np.random.default_rng(42)
    B, L = 16, 24
    cx, inv_x, cy, inv_y, lx, ly = _batch(rng, B, L)
    s = B62.as_f32()
    hs = skewed_pair_scores(cx, inv_x, cy, inv_y, s)
    out = wavefront_dp(hs, lx, ly, gap_series=gap_series, mode=mode, traceback=True)
    tb = np.asarray(out["tb"])
    ti = np.asarray(out["ti"])
    tj = np.asarray(out["tj"])
    tcode = np.asarray(out["tcode"])
    score = np.asarray(out["score"])

    moves, n = replay_moves(
        out["tb"], out["ti"], out["tj"], out["tcode"],
        gap_series=gap_series, mode=mode, steps=2 * L,
    )
    moves = np.asarray(moves)
    n = np.asarray(n)

    for b in range(B):
        host = replay_traceback(
            tb[:, b, :], None, float(score[b]), int(ti[b]), int(tj[b]),
            int(tcode[b]), int(lx[b]), int(ly[b]), gap_series, mode,
        )
        dev = moves_to_result(
            moves[b], int(n[b]), float(score[b]), int(ti[b]), int(tj[b]),
            int(lx[b]), int(ly[b]), mode,
        )
        np.testing.assert_array_equal(dev.cols_x, host.cols_x)
        np.testing.assert_array_equal(dev.cols_y, host.cols_y)
        assert dev.x_range == host.x_range and dev.y_range == host.y_range
