"""Pallas kernel == XLA scan parity (interpret mode on CPU; the same cases
run compiled on a real TPU chip via the verify flow)."""

import zlib

import numpy as np
import pytest

import jax.numpy as jnp

from praline_tpu.kernels.pallas_dp import wavefront_dp_pallas
from praline_tpu.kernels.scan import wavefront_dp


def make_case(rng, B, Lx, Ly):
    D, Lp = Lx + Ly + 1, Lx + 1
    hs = np.zeros((D, B, Lp), np.float32)
    h = rng.integers(-4, 6, size=(B, Lx, Ly)).astype(np.float32)
    for b in range(B):
        for i in range(1, Lx + 1):
            for j in range(1, Ly + 1):
                hs[i + j, b, i] = h[b, i - 1, j - 1]
    lx = rng.integers(1, Lx + 1, size=B).astype(np.int32)
    ly = rng.integers(1, Ly + 1, size=B).astype(np.int32)
    return jnp.asarray(hs), jnp.asarray(lx), jnp.asarray(ly)


@pytest.mark.parametrize("mode", ["global", "semiglobal", "local"])
@pytest.mark.parametrize("gap_series", [(11, 1), (3,), (5, 3, 1)])
def test_pallas_matches_scan(mode, gap_series):
    rng = np.random.default_rng(zlib.crc32(repr((mode, gap_series)).encode()))
    hs, lx, ly = make_case(rng, B=3, Lx=9, Ly=7)
    a = wavefront_dp(hs, lx, ly, gap_series=gap_series, mode=mode, traceback=True)
    # lengths=True forced so the length output is comparable too.
    p = wavefront_dp_pallas(
        hs, lx, ly, gap_series=gap_series, mode=mode, traceback=True, lengths=True
    )
    for key in ("score", "length", "ti", "tj", "tcode", "tb"):
        np.testing.assert_array_equal(
            np.asarray(a[key]), np.asarray(p[key]), err_msg=f"{mode} {gap_series} {key}"
        )


@pytest.mark.parametrize("mode", ["global", "semiglobal", "local"])
def test_pallas_gated_carries(mode):
    """Scores mode (no code carries) and traceback mode (no length carries)
    still agree with the full scan on everything they produce."""
    rng = np.random.default_rng(zlib.crc32(repr(("gate", mode)).encode()))
    hs, lx, ly = make_case(rng, B=4, Lx=8, Ly=8)
    a = wavefront_dp(hs, lx, ly, gap_series=(11, 1), mode=mode, traceback=True)
    scores_only = wavefront_dp_pallas(hs, lx, ly, gap_series=(11, 1), mode=mode)
    for key in ("score", "length", "ti", "tj"):
        np.testing.assert_array_equal(np.asarray(a[key]), np.asarray(scores_only[key]), key)
    tb_mode = wavefront_dp_pallas(hs, lx, ly, gap_series=(11, 1), mode=mode, traceback=True)
    for key in ("score", "ti", "tj", "tcode", "tb"):
        np.testing.assert_array_equal(np.asarray(a[key]), np.asarray(tb_mode[key]), key)


def test_pallas_batch_block_padding():
    rng = np.random.default_rng(0)
    hs, lx, ly = make_case(rng, B=5, Lx=6, Ly=6)  # 5 not divisible by block
    a = wavefront_dp(hs, lx, ly, gap_series=(4, 1), mode="global")
    p = wavefront_dp_pallas(hs, lx, ly, gap_series=(4, 1), mode="global", block_b=8)
    np.testing.assert_array_equal(np.asarray(a["score"]), np.asarray(p["score"]))


@pytest.mark.parametrize("qdtype", ["int8", "int16"])
@pytest.mark.parametrize("mode", ["global", "semiglobal", "local"])
def test_quantized_scores_bit_equal(mode, qdtype):
    """Scale-free int8/int16 skewed scores (one-hot profiles) == f32 path."""
    import zlib

    from praline_tpu import ALPHABET_AA, builtin_score_matrix
    from praline_tpu.kernels.scores import (
        skewed_pair_scores,
        skewed_pair_scores_int,
    )

    rng = np.random.default_rng(zlib.crc32(repr((mode, qdtype)).encode()))
    B62 = builtin_score_matrix("blosum62")
    B, Lx, Ly = 4, 12, 10
    A = ALPHABET_AA.size
    cx = np.zeros((B, Lx, A), np.float32)
    cy = np.zeros((B, Ly, A), np.float32)
    lx = rng.integers(2, Lx + 1, size=B).astype(np.int32)
    ly = rng.integers(2, Ly + 1, size=B).astype(np.int32)
    for b in range(B):
        cx[b, np.arange(lx[b]), rng.integers(0, 20, size=lx[b])] = 1.0
        cy[b, np.arange(ly[b]), rng.integers(0, 20, size=ly[b])] = 1.0
    ones_x = np.ones((B, Lx), np.float32)
    ones_y = np.ones((B, Ly), np.float32)
    s = B62.as_f32()

    hs_f = skewed_pair_scores(cx, ones_x, cy, ones_y, s)
    a = wavefront_dp(hs_f, lx, ly, gap_series=(11, 1), mode=mode, traceback=True)

    qd = jnp.int8 if qdtype == "int8" else jnp.int16
    hs_q = skewed_pair_scores_int(cx, cy, s, qdtype=qd)
    p = wavefront_dp_pallas(
        hs_q, lx, ly, gap_series=(11, 1), mode=mode, traceback=True, lengths=True
    )
    for key in ("score", "length", "ti", "tj", "tcode", "tb"):
        np.testing.assert_array_equal(
            np.asarray(a[key]), np.asarray(p[key]), err_msg=f"{mode} {qdtype} {key}"
        )


def test_unrolled_grid_matches_scan():
    """The dispatch's unroll=8 grid (8 diagonals per Mosaic step) is
    bit-identical to the per-diagonal form — terminals AND tb bits."""
    import numpy as np
    import jax.numpy as jnp

    from praline_tpu.kernels.fused_scores import fused_skewed_scores
    from praline_tpu.kernels.pallas_dp import wavefront_dp_pallas
    from praline_tpu.kernels.scan import wavefront_dp
    from praline_tpu.kernels.scores import skewed_pair_scores

    rng = np.random.default_rng(4)
    B, Lx, Ly, A = 4, 45, 61, 23
    cx = (rng.integers(0, 3, size=(B, Lx, A)) + (np.arange(A) == 0)).astype(np.float32)
    cy = (rng.integers(0, 3, size=(B, Ly, A)) + (np.arange(A) == 0)).astype(np.float32)
    ivx = (1.0 / np.maximum(cx.sum(-1), 1)).astype(np.float32)
    ivy = (1.0 / np.maximum(cy.sum(-1), 1)).astype(np.float32)
    lx = rng.integers(20, Lx + 1, size=B).astype(np.int32)
    ly = rng.integers(30, Ly + 1, size=B).astype(np.int32)
    from praline_tpu import builtin_score_matrix

    s = jnp.asarray(builtin_score_matrix("blosum62").as_f32())
    args = tuple(map(jnp.asarray, (cx, ivx, cy, ivy)))
    for mode in ("global", "semiglobal", "local"):
        want = wavefront_dp(
            skewed_pair_scores(*args, s), jnp.asarray(lx), jnp.asarray(ly),
            mode=mode, traceback=True,
        )
        hs = fused_skewed_scores(*args, s)
        got = wavefront_dp_pallas(
            hs, jnp.asarray(lx), jnp.asarray(ly), mode=mode,
            traceback=True, hs_body=True, unroll=8,
        )
        tbw = np.asarray(want["tb"])
        for key in ("score", "ti", "tj", "tcode"):
            np.testing.assert_array_equal(
                np.asarray(want[key]), np.asarray(got[key]), err_msg=f"{mode}:{key}"
            )
        np.testing.assert_array_equal(
            tbw, np.asarray(got["tb"])[: tbw.shape[0], :, : tbw.shape[2]],
            err_msg=f"{mode}:tb",
        )
