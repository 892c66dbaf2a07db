"""Moderate-size fuzz parity: XLA scan vs native C++ kernel.

The brute-force tests pin correctness at tiny sizes; this widens coverage to
realistic lengths where border runs, level transitions and terminal
tie-breaks interact, using the fast native kernel as the reference.
"""

import shutil

import zlib

import numpy as np
import pytest

from praline_tpu import ALPHABET_AA, builtin_score_matrix
from praline_tpu.kernels import align_pairs_batched
from praline_tpu.oracle.score import pair_score_matrix
from praline_tpu.types import Profile

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="needs g++")

B62 = builtin_score_matrix("blosum62")


@pytest.mark.parametrize("mode", ["global", "semiglobal", "local"])
@pytest.mark.parametrize("gap_series", [(11, 1), (5, 3, 1)])
def test_fuzz_scan_vs_native(mode, gap_series):
    from praline_tpu.native import native_align_scores

    rng = np.random.default_rng(zlib.crc32(repr(("fuzz", mode, gap_series)).encode()))
    pairs = []
    for _ in range(6):
        lx = int(rng.integers(50, 400))
        ly = int(rng.integers(50, 400))
        x = rng.integers(0, 20, size=lx).astype(np.int32)
        if rng.random() < 0.5:  # related pair: mutated copy
            y = x.copy()
            y[rng.integers(0, lx, size=lx // 5)] = rng.integers(0, 20, size=lx // 5)
            y = np.ascontiguousarray(np.delete(y, rng.choice(lx, size=min(7, lx // 10), replace=False)))
        else:
            y = rng.integers(0, 20, size=ly).astype(np.int32)
        pairs.append(
            (Profile.from_tokens(x, ALPHABET_AA), Profile.from_tokens(y, ALPHABET_AA))
        )

    got = align_pairs_batched(
        pairs, B62, gap_series, mode, traceback=True, batch_pairs=6
    )
    for (px, py), r in zip(pairs, got):
        nat = native_align_scores(pair_score_matrix(px, py, B62), gap_series, mode)
        assert r.score == nat.score, (mode, gap_series, px.length, py.length)
        np.testing.assert_array_equal(r.cols_x, nat.cols_x)
        np.testing.assert_array_equal(r.cols_y, nat.cols_y)
