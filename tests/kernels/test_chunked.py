"""Chunked diagonal execution == single dispatch, bit-exact (SURVEY.md
§3.2 SP row: boundary-carry chaining over the diagonal axis)."""

import zlib

import numpy as np
import pytest

from praline_tpu import ALPHABET_AA, builtin_score_matrix
from praline_tpu.kernels.chunked import wavefront_dp_chunked
from praline_tpu.kernels.fused_scores import fused_skewed_scores
from praline_tpu.kernels.pallas_dp import wavefront_dp_pallas

B62 = builtin_score_matrix("blosum62")
A = ALPHABET_AA.size


def make_inputs(rng, B, Lx, Ly):
    cx = rng.integers(0, 3, size=(B, Lx, A)).astype(np.float32)
    cx[:, :, 0] += 1
    cy = rng.integers(0, 3, size=(B, Ly, A)).astype(np.float32)
    cy[:, :, 0] += 1
    ivx = (np.float32(1.0) / np.maximum(cx.sum(-1), 1)).astype(np.float32)
    ivy = (np.float32(1.0) / np.maximum(cy.sum(-1), 1)).astype(np.float32)
    lx = rng.integers(Lx // 2, Lx + 1, size=B).astype(np.int32)
    ly = rng.integers(Ly // 2, Ly + 1, size=B).astype(np.int32)
    return cx, ivx, cy, ivy, lx, ly


@pytest.mark.parametrize("mode", ["global", "semiglobal", "local"])
def test_chunked_matches_single_dispatch(mode):
    rng = np.random.default_rng(zlib.crc32(repr(("chunk", mode)).encode()))
    B, Lx, Ly = 2, 100, 500  # 5 bands -> 3 chunks of 2
    cx, ivx, cy, ivy, lx, ly = make_inputs(rng, B, Lx, Ly)
    s = B62.as_f32()

    body = fused_skewed_scores(cx, ivx, cy, ivy, s)
    want = wavefront_dp_pallas(
        body, lx, ly, gap_series=(11, 1), mode=mode, traceback=True,
        lengths=True, hs_body=True,
    )
    got = wavefront_dp_chunked(
        cx, ivx, cy, ivy, s, lx, ly, gap_series=(11, 1), mode=mode,
        traceback=True, chunk_bands=2,
    )
    for key in ("score", "length", "ti", "tj", "tcode"):
        np.testing.assert_array_equal(
            np.asarray(want[key]), np.asarray(got[key]), key
        )
    tb = np.concatenate(got["tb_chunks"], axis=0)
    np.testing.assert_array_equal(np.asarray(want["tb"]), tb[: want["tb"].shape[0]])


def test_chunked_uneven_tail():
    rng = np.random.default_rng(1)
    B, Lx, Ly = 2, 60, 330  # 4 bands, chunk 3 -> chunks of 3 + 1
    cx, ivx, cy, ivy, lx, ly = make_inputs(rng, B, Lx, Ly)
    s = B62.as_f32()
    body = fused_skewed_scores(cx, ivx, cy, ivy, s)
    want = wavefront_dp_pallas(
        body, lx, ly, gap_series=(5, 3, 1), mode="global", hs_body=True, lengths=True
    )
    got = wavefront_dp_chunked(
        cx, ivx, cy, ivy, s, lx, ly, gap_series=(5, 3, 1), chunk_bands=3
    )
    np.testing.assert_array_equal(np.asarray(want["score"]), np.asarray(got["score"]))
    np.testing.assert_array_equal(np.asarray(want["length"]), np.asarray(got["length"]))


def test_batch_driver_routes_oversized_targets_through_chunks():
    """align_pairs_batched with a huge-target problem (beyond the largest
    bucket) uses the chunked path and still matches the oracle exactly."""
    from praline_tpu.kernels import align_pairs_batched
    from praline_tpu.oracle import align_profiles
    from praline_tpu.types import Profile

    rng = np.random.default_rng(3)
    x = rng.integers(0, 20, size=45).astype(np.int32)
    y = rng.integers(0, 20, size=400).astype(np.int32)
    y[200:245] = x  # planted hit
    px = Profile.from_tokens(x, ALPHABET_AA)
    py = Profile.from_tokens(np.ascontiguousarray(y), ALPHABET_AA)
    for mode in ("local", "semiglobal"):
        (r,) = align_pairs_batched(
            [(px, py)], B62, (11, 1), mode, traceback=True,
            bucket_sizes=(63,), backend="pallas",
        )
        want = align_profiles(px, py, B62, (11, 1), mode)
        assert r.score == want.score, mode
        np.testing.assert_array_equal(r.cols_x, want.cols_x)
        np.testing.assert_array_equal(r.cols_y, want.cols_y)
