"""Fused H+skew producer == XLA gather path, bit-exact (kernels.fused_scores)."""

import zlib

import numpy as np
import pytest

import jax.numpy as jnp

from praline_tpu import ALPHABET_AA, builtin_score_matrix
from praline_tpu.kernels.fused_scores import fused_skewed_scores
from praline_tpu.kernels.pallas_dp import wavefront_dp_pallas
from praline_tpu.kernels.scan import wavefront_dp
from praline_tpu.kernels.scores import skewed_pair_scores

B62 = builtin_score_matrix("blosum62")
A = ALPHABET_AA.size


def make_profiles(rng, B, Lx, Ly, hi=3):
    cx = rng.integers(0, hi, size=(B, Lx, A)).astype(np.float32)
    cx[:, :, 0] += 1
    cy = rng.integers(0, hi, size=(B, Ly, A)).astype(np.float32)
    cy[:, :, 0] += 1
    ivx = (np.float32(1.0) / np.maximum(cx.sum(-1), 1)).astype(np.float32)
    ivy = (np.float32(1.0) / np.maximum(cy.sum(-1), 1)).astype(np.float32)
    return cx, ivx, cy, ivy


@pytest.mark.parametrize(
    "B,Lx,Ly", [(2, 5, 7), (1, 129, 131), (2, 200, 64), (1, 64, 200)]
)
def test_fused_producer_bit_equal(B, Lx, Ly):
    rng = np.random.default_rng(zlib.crc32(repr((B, Lx, Ly)).encode()))
    cx, ivx, cy, ivy = make_profiles(rng, B, Lx, Ly)
    s = B62.as_f32()
    want = np.asarray(skewed_pair_scores(cx, ivx, cy, ivy, s))
    got = np.asarray(fused_skewed_scores(cx, ivx, cy, ivy, s))
    D, _, Lp = want.shape
    np.testing.assert_array_equal(want[2:], got[: D - 2, :, :Lp])


def test_fused_producer_unscaled_int8():
    rng = np.random.default_rng(9)
    B, Lx, Ly = 2, 70, 90
    cx = np.zeros((B, Lx, A), np.float32)
    cy = np.zeros((B, Ly, A), np.float32)
    for b in range(B):
        cx[b, np.arange(Lx), rng.integers(0, 20, size=Lx)] = 1.0
        cy[b, np.arange(Ly), rng.integers(0, 20, size=Ly)] = 1.0
    ones_x = np.ones((B, Lx), np.float32)
    ones_y = np.ones((B, Ly), np.float32)
    s = B62.as_f32()
    want = np.asarray(skewed_pair_scores(cx, ones_x, cy, ones_y, s))
    got = np.asarray(
        fused_skewed_scores(cx, ones_x, cy, ones_y, s, out_dtype=jnp.int8, scaled=False)
    )
    D, _, Lp = want.shape
    np.testing.assert_array_equal(want[2:], got[: D - 2, :, :Lp].astype(np.float32))


@pytest.mark.parametrize("mode", ["global", "semiglobal", "local"])
def test_fused_body_layout_through_dp(mode):
    rng = np.random.default_rng(zlib.crc32(repr(("body", mode)).encode()))
    B, Lx, Ly = 3, 150, 140
    cx, ivx, cy, ivy = make_profiles(rng, B, Lx, Ly)
    lx = rng.integers(Lx // 2, Lx + 1, size=B).astype(np.int32)
    ly = rng.integers(Ly // 2, Ly + 1, size=B).astype(np.int32)
    s = B62.as_f32()
    hs = skewed_pair_scores(cx, ivx, cy, ivy, s)
    body = fused_skewed_scores(cx, ivx, cy, ivy, s)
    a = wavefront_dp(hs, lx, ly, gap_series=(11, 1), mode=mode, traceback=True)
    p = wavefront_dp_pallas(
        body, lx, ly, gap_series=(11, 1), mode=mode, traceback=True,
        lengths=True, hs_body=True,
    )
    for key in ("score", "length", "ti", "tj", "tcode"):
        np.testing.assert_array_equal(np.asarray(a[key]), np.asarray(p[key]), key)
    ta = np.asarray(a["tb"])
    tp_ = np.asarray(p["tb"])
    np.testing.assert_array_equal(ta, tp_[: ta.shape[0], :, : ta.shape[2]])


@pytest.mark.parametrize("mode", ["global", "semiglobal", "local"])
def test_unrolled_dp_matches(mode):
    """unroll=2 over the body layout is bit-identical to unroll=1."""
    rng = np.random.default_rng(zlib.crc32(repr(("unroll", mode)).encode()))
    B, Lx, Ly = 3, 150, 140
    cx, ivx, cy, ivy = make_profiles(rng, B, Lx, Ly)
    lx = rng.integers(Lx // 2, Lx + 1, size=B).astype(np.int32)
    ly = rng.integers(Ly // 2, Ly + 1, size=B).astype(np.int32)
    s = B62.as_f32()
    body = fused_skewed_scores(cx, ivx, cy, ivy, s)
    a = wavefront_dp_pallas(
        body, lx, ly, gap_series=(11, 1), mode=mode, traceback=True,
        lengths=True, hs_body=True,
    )
    b = wavefront_dp_pallas(
        body, lx, ly, gap_series=(11, 1), mode=mode, traceback=True,
        lengths=True, hs_body=True, unroll=2,
    )
    for key in ("score", "length", "ti", "tj", "tcode", "tb"):
        np.testing.assert_array_equal(np.asarray(a[key]), np.asarray(b[key]), key)
