"""Oracle invariants on realistic inputs (SURVEY.md §5.1)."""

import numpy as np
import pytest

from praline_tpu import ALPHABET_AA, builtin_score_matrix
from praline_tpu.oracle import (
    align_profiles,
    align_tokens,
    gap_cost_prefix,
    pair_score_matrix,
    seq_score_matrix,
)
from praline_tpu.types import Profile, Sequence

B62 = builtin_score_matrix("blosum62")


def rand_seq(rng, L):
    return rng.integers(0, 20, size=L).astype(np.int32)  # canonical residues


def test_global_self_alignment_is_identity():
    rng = np.random.default_rng(0)
    for _ in range(10):
        x = rand_seq(rng, int(rng.integers(5, 40)))
        res = align_tokens(x, x, B62, (11, 1), "global")
        assert np.array_equal(res.cols_x, np.arange(len(x)))
        assert np.array_equal(res.cols_y, np.arange(len(x)))
        assert res.score == pytest.approx(sum(B62.score(a, a) for a in x))


def test_mode_score_ordering():
    """local >= semiglobal >= global for identical inputs (more freedom)."""
    rng = np.random.default_rng(1)
    for _ in range(10):
        x = rand_seq(rng, int(rng.integers(5, 30)))
        y = rand_seq(rng, int(rng.integers(5, 30)))
        g = align_tokens(x, y, B62, (11, 1), "global").score
        s = align_tokens(x, y, B62, (11, 1), "semiglobal").score
        l = align_tokens(x, y, B62, (11, 1), "local").score
        assert s >= g
        assert l >= s or l >= 0 >= s


def test_swap_symmetry_of_scores():
    rng = np.random.default_rng(2)
    for mode in ("global", "semiglobal", "local"):
        for _ in range(8):
            x = rand_seq(rng, int(rng.integers(3, 25)))
            y = rand_seq(rng, int(rng.integers(3, 25)))
            a = align_tokens(x, y, B62, (11, 1), mode).score
            b = align_tokens(y, x, B62, (11, 1), mode).score
            assert a == pytest.approx(b)


def test_semiglobal_contained_sequence():
    """An exact substring aligns gap-free at full self-score."""
    rng = np.random.default_rng(3)
    x = rand_seq(rng, 30)
    y = x[8:19]
    res = align_tokens(x, y, B62, (11, 1), "semiglobal")
    assert res.score == pytest.approx(sum(B62.score(a, a) for a in y))
    # path covers both sequences entirely
    assert np.sum(res.cols_x != -1) == 30
    assert np.sum(res.cols_y != -1) == 11


def test_one_hot_profile_equals_tokens():
    rng = np.random.default_rng(4)
    x = rand_seq(rng, 17)
    y = rand_seq(rng, 23)
    px = Profile.from_tokens(x, ALPHABET_AA)
    py = Profile.from_tokens(y, ALPHABET_AA)
    h1 = pair_score_matrix(px, py, B62)
    h2 = seq_score_matrix(x, y, B62)
    assert np.array_equal(h1, h2)
    for mode in ("global", "semiglobal", "local"):
        a = align_tokens(x, y, B62, (11, 1), mode)
        b = align_profiles(px, py, B62, (11, 1), mode)
        assert a.score == b.score
        assert np.array_equal(a.cols_x, b.cols_x)
        assert np.array_equal(a.cols_y, b.cols_y)


def test_gap_cost_prefix_series():
    cum = gap_cost_prefix((5, 3, 1), 6)
    assert cum.tolist() == [0, 5, 8, 9, 10, 11, 12]
    cum2 = gap_cost_prefix((11, 1), 4)
    assert cum2.tolist() == [0, 11, 12, 13, 14]


def test_profile_scoring_is_exact_and_order_independent():
    """Integer count-space dot stays exact in f32 (the parity trick)."""
    rng = np.random.default_rng(5)
    A = ALPHABET_AA.size
    # Column totals stay under the 992 rescale limit (profile.py) so the
    # integer dot is exact.
    c1 = rng.integers(0, 20, size=(7, A)).astype(np.float32)
    c2 = rng.integers(0, 20, size=(9, A)).astype(np.float32)
    p1 = Profile(c1, np.zeros(7, np.float32), ALPHABET_AA)
    p2 = Profile(c2, np.zeros(9, np.float32), ALPHABET_AA)
    h = pair_score_matrix(p1, p2, B62)
    # float64 recomputation of the integer dot matches exactly after the
    # same two pinned f32 multiplies
    d64 = c1.astype(np.float64) @ B62.scores.astype(np.float64) @ c2.astype(np.float64).T
    inv1 = (np.float32(1.0) / np.maximum(c1.sum(1), 1).astype(np.float32)).astype(np.float32)
    inv2 = (np.float32(1.0) / np.maximum(c2.sum(1), 1).astype(np.float32)).astype(np.float32)
    want = (d64.astype(np.float32) * inv1[:, None]) * inv2[None, :]
    assert np.array_equal(h, want.astype(np.float32))


def test_sequence_roundtrip():
    s = Sequence.from_str("toy", "MKVLAW", ALPHABET_AA)
    assert s.text() == "MKVLAW"
    assert len(s) == 6
