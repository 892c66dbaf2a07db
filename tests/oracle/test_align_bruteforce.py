"""Oracle DP == exhaustive path enumeration on tiny random cases
(SURVEY.md §5.1)."""

import zlib

import numpy as np
import pytest

from praline_tpu.oracle import align_scores

from .bruteforce import brute_global, brute_local, brute_semiglobal

GAP_SERIES = [(3,), (11, 1), (4, 2), (5, 3, 1), (7, 4, 2, 1)]


def random_case(rng, L1, L2):
    # Integer scores in a range where gaps genuinely compete with matches.
    return rng.integers(-6, 7, size=(L1, L2)).astype(np.float32)


@pytest.mark.parametrize("gap_series", GAP_SERIES)
@pytest.mark.parametrize("mode,brute", [
    ("global", brute_global),
    ("semiglobal", brute_semiglobal),
    ("local", brute_local),
])
def test_dp_matches_bruteforce(mode, brute, gap_series):
    rng = np.random.default_rng(zlib.crc32(repr((mode, gap_series)).encode()))
    for trial in range(30):
        L1 = int(rng.integers(1, 6))
        L2 = int(rng.integers(1, 6))
        h = random_case(rng, L1, L2)
        got = align_scores(h, gap_series, mode)
        want = brute(h, gap_series)
        assert got.score == pytest.approx(want), (
            f"trial {trial}: {mode} {gap_series} L={L1}x{L2}\n{h}"
        )


@pytest.mark.parametrize("mode,brute", [
    ("global", brute_global),
    ("semiglobal", brute_semiglobal),
    ("local", brute_local),
])
def test_dp_matches_bruteforce_rectangular(mode, brute):
    rng = np.random.default_rng(7)
    for L1, L2 in [(1, 5), (5, 1), (2, 6), (6, 2), (1, 1)]:
        h = random_case(rng, L1, L2)
        got = align_scores(h, (11, 1), mode)
        assert got.score == pytest.approx(brute(h, (11, 1)))


def test_path_is_consistent_with_score():
    """Recomputing the emitted path's cost reproduces the DP score."""
    rng = np.random.default_rng(42)
    for mode in ("global", "semiglobal", "local"):
        for gap_series in [(3,), (11, 1), (5, 3, 1)]:
            for _ in range(20):
                L1 = int(rng.integers(1, 8))
                L2 = int(rng.integers(1, 8))
                h = random_case(rng, L1, L2)
                res = align_scores(h, gap_series, mode)
                k = len(gap_series)
                score = 0.0
                run = 0
                run_dir = None
                free = set()
                if mode == "semiglobal":
                    # Leading/trailing border gap runs are free; each run has
                    # a single direction (X = gap in y, Y = gap in x).
                    C = res.length

                    def col_dir(c):
                        if res.cols_x[c] == -1:
                            return "Y"
                        if res.cols_y[c] == -1:
                            return "X"
                        return None

                    c = 0
                    lead = col_dir(0) if C else None
                    while c < C and lead is not None and col_dir(c) == lead:
                        free.add(c)
                        c += 1
                    c = C - 1
                    tail = col_dir(c) if C else None
                    while c >= 0 and tail is not None and col_dir(c) == tail:
                        free.add(c)
                        c -= 1
                for c in range(res.length):
                    x, y = int(res.cols_x[c]), int(res.cols_y[c])
                    if x != -1 and y != -1:
                        score += float(h[x, y])
                        run, run_dir = 0, None
                    else:
                        d = "X" if y == -1 else "Y"
                        run = run + 1 if run_dir == d else 1
                        run_dir = d
                        if mode != "semiglobal" or c not in free:
                            score -= gap_series[min(run, k) - 1]
                assert score == pytest.approx(res.score), (mode, gap_series, h)


def test_local_path_bounds_and_positive():
    rng = np.random.default_rng(3)
    for _ in range(50):
        h = random_case(rng, int(rng.integers(1, 7)), int(rng.integers(1, 7)))
        res = align_scores(h, (4, 1), "local")
        assert res.score >= 0.0
        if res.length:
            # local paths start and end on match columns
            assert res.cols_x[0] != -1 and res.cols_y[0] != -1
            assert res.cols_x[-1] != -1 and res.cols_y[-1] != -1


def test_gap_series_singleton_equals_flat_pair():
    """Series (g,) (linear) == series (g, g) (affine with open==extend)."""
    rng = np.random.default_rng(11)
    for mode in ("global", "semiglobal", "local"):
        for _ in range(20):
            h = random_case(rng, int(rng.integers(1, 7)), int(rng.integers(1, 7)))
            a = align_scores(h, (4,), mode)
            b = align_scores(h, (4, 4), mode)
            assert a.score == pytest.approx(b.score)
