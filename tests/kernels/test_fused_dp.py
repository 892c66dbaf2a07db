"""Fully fused producer+DP kernel (kernels.fused_dp): bit-parity with the
scan path across modes/gap series/ragged batches, and batch-driver routing
for scores-only pallas dispatches."""

import numpy as np
import pytest

import jax.numpy as jnp

from praline_tpu import ALPHABET_AA, builtin_score_matrix
from praline_tpu.kernels import align_pairs_batched
from praline_tpu.kernels.fused_dp import max_lanes_fused, wavefront_dp_fused
from praline_tpu.kernels.scan import wavefront_dp
from praline_tpu.kernels.scores import skewed_pair_scores
from praline_tpu.oracle import align_profiles
from praline_tpu.types import Profile

B62 = builtin_score_matrix("blosum62")


def _rand(rng, B, Lx, Ly, A=23):
    cx = (rng.integers(0, 3, size=(B, Lx, A)) + (np.arange(A) == 0)).astype(np.float32)
    cy = (rng.integers(0, 3, size=(B, Ly, A)) + (np.arange(A) == 0)).astype(np.float32)
    ivx = (1.0 / np.maximum(cx.sum(-1), 1)).astype(np.float32)
    ivy = (1.0 / np.maximum(cy.sum(-1), 1)).astype(np.float32)
    lx = rng.integers(max(1, Lx // 2), Lx + 1, size=B).astype(np.int32)
    ly = rng.integers(max(1, Ly // 2), Ly + 1, size=B).astype(np.int32)
    return cx, ivx, cy, ivy, lx, ly


@pytest.mark.parametrize("mode", ["global", "semiglobal", "local"])
@pytest.mark.parametrize("gs", [(11, 1), (13, 7, 1), (5,)])
def test_fused_dp_matches_scan(mode, gs):
    rng = np.random.default_rng(len(mode) * 31 + len(gs))
    cx, ivx, cy, ivy, lx, ly = _rand(rng, 5, 61, 44)
    s = np.asarray(B62.as_f32())
    hs = skewed_pair_scores(*map(jnp.asarray, (cx, ivx, cy, ivy, s)))
    want = wavefront_dp(hs, jnp.asarray(lx), jnp.asarray(ly),
                        gap_series=gs, mode=mode)
    got = wavefront_dp_fused(
        *map(jnp.asarray, (cx, ivx, cy, ivy, s, lx, ly)),
        gap_series=gs, mode=mode,
    )
    for key in ("score", "length", "ti", "tj"):
        np.testing.assert_array_equal(
            np.asarray(want[key]), np.asarray(got[key]), err_msg=key
        )


@pytest.mark.parametrize("mode", ["global", "semiglobal", "local"])
def test_fused_dp_length_one_sides(mode):
    """lx=1 / ly=1 problems hit the diag-1 border/terminal seeding."""
    rng = np.random.default_rng(2)
    cx, ivx, cy, ivy, _, _ = _rand(rng, 4, 20, 20)
    lx = np.array([1, 1, 20, 7], np.int32)
    ly = np.array([1, 20, 1, 9], np.int32)
    s = np.asarray(B62.as_f32())
    hs = skewed_pair_scores(*map(jnp.asarray, (cx, ivx, cy, ivy, s)))
    want = wavefront_dp(hs, jnp.asarray(lx), jnp.asarray(ly), mode=mode,
                        traceback=True)
    got = wavefront_dp_fused(
        *map(jnp.asarray, (cx, ivx, cy, ivy, s, lx, ly)), mode=mode,
        traceback=True,
    )
    for key in ("score", "ti", "tj", "tcode"):
        np.testing.assert_array_equal(
            np.asarray(want[key]), np.asarray(got[key]), err_msg=key
        )
    tbw, tbg = np.asarray(want["tb"]), np.asarray(got["tb"])
    np.testing.assert_array_equal(tbw, tbg[:, :, : tbw.shape[2]])


def test_fused_dp_multiband_and_padding():
    """Several 128-diagonal bands, batch not a multiple of the block."""
    rng = np.random.default_rng(7)
    cx, ivx, cy, ivy, lx, ly = _rand(rng, 9, 140, 250)
    s = np.asarray(B62.as_f32())
    hs = skewed_pair_scores(*map(jnp.asarray, (cx, ivx, cy, ivy, s)))
    want = wavefront_dp(hs, jnp.asarray(lx), jnp.asarray(ly))
    got = wavefront_dp_fused(*map(jnp.asarray, (cx, ivx, cy, ivy, s, lx, ly)))
    for key in ("score", "length", "ti", "tj"):
        np.testing.assert_array_equal(
            np.asarray(want[key]), np.asarray(got[key]), err_msg=key
        )


def test_gate_env_override(monkeypatch):
    from praline_tpu.kernels.batch import _fused_dp_enabled

    monkeypatch.setenv("PRALINE_FUSED_DP", "0")
    assert _fused_dp_enabled() is False
    monkeypatch.setenv("PRALINE_FUSED_DP", "1")
    assert _fused_dp_enabled() is True
    monkeypatch.delenv("PRALINE_FUSED_DP")
    assert _fused_dp_enabled() is True  # CPU test session default: on


def test_gate_off_two_kernel_parity(monkeypatch):
    """With the gate forced off, the two-kernel route must serve the same
    results (the fallback stays live while the fused default rolls out)."""
    monkeypatch.setenv("PRALINE_FUSED_DP", "0")
    rng = np.random.default_rng(3)

    def mk(L):
        return Profile.from_tokens(
            rng.integers(0, 20, size=L).astype(np.int32), ALPHABET_AA
        )

    pairs = [(mk(30), mk(25))]
    got = align_pairs_batched(pairs, B62, (11, 1), "global", traceback=True,
                              backend="pallas")
    want = align_profiles(pairs[0][0], pairs[0][1], B62, (11, 1), "global")
    assert got[0].score == want.score
    np.testing.assert_array_equal(got[0].cols_x, want.cols_x)


def test_lane_router_bound():
    assert 1024 <= max_lanes_fused((11, 1)) <= 8192
    rng = np.random.default_rng(0)
    with pytest.raises(ValueError):
        wavefront_dp_fused(
            *map(jnp.asarray, _rand(rng, 1, max_lanes_fused((11, 1)) + 128, 9)[:4]),
            jnp.asarray(np.asarray(B62.as_f32())),
            jnp.ones(1, jnp.int32), jnp.ones(1, jnp.int32),
        )


@pytest.mark.parametrize("mode", ["global", "semiglobal", "local"])
@pytest.mark.parametrize("gs", [(11, 1), (13, 7, 1)])
def test_fused_dp_traceback_bits_match_scan(mode, gs):
    rng = np.random.default_rng(len(mode) + len(gs) * 17)
    cx, ivx, cy, ivy, lx, ly = _rand(rng, 4, 55, 140)
    s = np.asarray(B62.as_f32())
    hs = skewed_pair_scores(*map(jnp.asarray, (cx, ivx, cy, ivy, s)))
    want = wavefront_dp(hs, jnp.asarray(lx), jnp.asarray(ly),
                        gap_series=gs, mode=mode, traceback=True)
    got = wavefront_dp_fused(
        *map(jnp.asarray, (cx, ivx, cy, ivy, s, lx, ly)),
        gap_series=gs, mode=mode, traceback=True,
    )
    for key in ("score", "ti", "tj", "tcode"):
        np.testing.assert_array_equal(
            np.asarray(want[key]), np.asarray(got[key]), err_msg=key
        )
    tbw, tbg = np.asarray(want["tb"]), np.asarray(got["tb"])
    np.testing.assert_array_equal(tbw, tbg[:, :, : tbw.shape[2]])


@pytest.mark.parametrize("mode", ["global", "semiglobal", "local"])
def test_batch_driver_traceback_route(mode):
    """Traceback pallas dispatches route fused (CPU default-on) and stay
    oracle-exact including full paths."""
    rng = np.random.default_rng(23)

    def mk(L):
        return Profile.from_tokens(
            rng.integers(0, 20, size=L).astype(np.int32), ALPHABET_AA
        )

    pairs = [(mk(40), mk(35)), (mk(12), mk(50))]
    got = align_pairs_batched(pairs, B62, (11, 1), mode, traceback=True,
                              backend="pallas")
    for (px, py), r in zip(pairs, got):
        want = align_profiles(px, py, B62, (11, 1), mode)
        assert r.score == want.score
        np.testing.assert_array_equal(r.cols_x, want.cols_x)
        np.testing.assert_array_equal(r.cols_y, want.cols_y)


@pytest.mark.parametrize("mode", ["global", "semiglobal", "local"])
def test_batch_driver_scores_route(mode):
    """Scores-only pallas dispatches route through the fused kernel and
    stay oracle-exact (score AND length)."""
    rng = np.random.default_rng(11)

    def mk(L):
        return Profile.from_tokens(
            rng.integers(0, 20, size=L).astype(np.int32), ALPHABET_AA
        )

    pairs = [(mk(40), mk(35)), (mk(12), mk(50)), (mk(25), mk(25))]
    got = align_pairs_batched(pairs, B62, (11, 1), mode, backend="pallas")
    for (px, py), r in zip(pairs, got):
        want = align_profiles(px, py, B62, (11, 1), mode)
        assert r.score == want.score and r.length == want.length
