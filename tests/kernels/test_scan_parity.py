"""Kernel == oracle parity (SURVEY.md §5.2/§5.3): exact score, length and
traceback-path equality across modes x gap series x ragged lengths x
padding buckets, batched."""

import zlib

import numpy as np
import pytest

from praline_tpu import ALPHABET_AA, builtin_score_matrix
from praline_tpu.kernels import align_pairs_batched
from praline_tpu.oracle import align_profiles
from praline_tpu.types import Profile

B62 = builtin_score_matrix("blosum62")

MODES = ["global", "semiglobal", "local"]
SERIES = [(11, 1), (3,), (5, 3, 1)]


def random_profile(rng, L, max_count=3):
    A = ALPHABET_AA.size
    counts = rng.integers(0, max_count + 1, size=(L, A)).astype(np.float32)
    # ensure no all-zero columns (a residue is always present)
    zero = counts.sum(axis=1) == 0
    counts[zero, 0] = 1.0
    gaps = rng.integers(0, 3, size=L).astype(np.float32)
    return Profile(counts, gaps, ALPHABET_AA)


def random_onehot(rng, L):
    toks = rng.integers(0, 20, size=L).astype(np.int32)
    return Profile.from_tokens(toks, ALPHABET_AA)


def make_pairs(rng, n, lmin=1, lmax=40, profiles=False):
    gen = random_profile if profiles else random_onehot
    return [
        (gen(rng, int(rng.integers(lmin, lmax))), gen(rng, int(rng.integers(lmin, lmax))))
        for _ in range(n)
    ]


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("gap_series", SERIES)
def test_scores_and_lengths_match_oracle(mode, gap_series):
    rng = np.random.default_rng(zlib.crc32(repr((mode, gap_series)).encode()))
    pairs = make_pairs(rng, 12) + make_pairs(rng, 6, profiles=True)
    got = align_pairs_batched(
        pairs, B62, gap_series, mode, bucket_sizes=(15, 31, 63), batch_pairs=5
    )
    for (px, py), r in zip(pairs, got):
        want = align_profiles(px, py, B62, gap_series, mode)
        assert r.score == want.score, (mode, gap_series, px.length, py.length)
        assert r.length == want.length, (mode, gap_series, px.length, py.length)


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("gap_series", [(11, 1), (5, 3, 1)])
def test_traceback_paths_match_oracle(mode, gap_series):
    rng = np.random.default_rng(zlib.crc32(repr(("tb", mode, gap_series)).encode()))
    pairs = make_pairs(rng, 8) + make_pairs(rng, 4, profiles=True)
    got = align_pairs_batched(
        pairs,
        B62,
        gap_series,
        mode,
        traceback=True,
        bucket_sizes=(15, 31, 63),
        batch_pairs=4,
    )
    for (px, py), r in zip(pairs, got):
        want = align_profiles(px, py, B62, gap_series, mode)
        assert r.score == want.score
        np.testing.assert_array_equal(r.cols_x, want.cols_x)
        np.testing.assert_array_equal(r.cols_y, want.cols_y)
        assert r.x_range == want.x_range
        assert r.y_range == want.y_range


def test_batch_composition_invariance():
    """Identical problems give bitwise-identical results regardless of batch
    packing or bucket choice (SURVEY.md §5.3/§5.6)."""
    rng = np.random.default_rng(99)
    pairs = make_pairs(rng, 10, lmax=30)
    a = align_pairs_batched(pairs, B62, (11, 1), "global", bucket_sizes=(31,), batch_pairs=10)
    b = align_pairs_batched(pairs, B62, (11, 1), "global", bucket_sizes=(63,), batch_pairs=3)
    c = align_pairs_batched(
        list(reversed(pairs)), B62, (11, 1), "global", bucket_sizes=(31, 63), batch_pairs=4
    )
    for r1, r2, r3 in zip(a, b, reversed(c)):
        assert r1.score == r2.score == r3.score
        assert r1.length == r2.length == r3.length


def test_identical_sequences_tight_diagonal():
    toks = np.arange(20, dtype=np.int32) % 20
    p = Profile.from_tokens(toks, ALPHABET_AA)
    (r,) = align_pairs_batched([(p, p)], B62, (11, 1), "global", traceback=True)
    assert np.array_equal(r.cols_x, np.arange(20))
    assert np.array_equal(r.cols_y, np.arange(20))


def test_extreme_length_ratio():
    rng = np.random.default_rng(5)
    long = random_onehot(rng, 60)
    short = random_onehot(rng, 2)
    for mode in MODES:
        (r,) = align_pairs_batched([(long, short)], B62, (11, 1), mode)
        want = align_profiles(long, short, B62, (11, 1), mode)
        assert r.score == want.score
        assert r.length == want.length


def test_empty_profile_degenerates():
    rng = np.random.default_rng(6)
    p = random_onehot(rng, 5)
    e = Profile(np.zeros((0, ALPHABET_AA.size), np.float32), np.zeros(0, np.float32), ALPHABET_AA)
    (r,) = align_pairs_batched([(p, e)], B62, (11, 1), "global")
    assert r.score == -15.0  # 5 gap columns: 11 + 4*1
