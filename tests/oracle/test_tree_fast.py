"""Production O(N^2) guide-tree builder == pinned brute-force reference.

VERDICT r1 item 8: Lance-Williams incremental linkage with the same pinned
tie-breaks (SURVEY.md §8.4), property-tested against the brute-force
contract implementation on random and tie-heavy matrices.
"""

import time

import numpy as np
import pytest

from praline_tpu.oracle.tree import build_guide_tree, build_guide_tree_reference

LINKAGES = ("single", "complete", "average")


def _sym(rng, n, integer=False):
    if integer:
        a = rng.integers(-5, 6, size=(n, n)).astype(np.float64)
    else:
        a = rng.normal(size=(n, n))
    a = (a + a.T) / (1 if integer else 2)
    np.fill_diagonal(a, 0.0)
    return a


@pytest.mark.parametrize("linkage", LINKAGES)
def test_random_matrices_match_reference(linkage):
    rng = np.random.default_rng(42)
    for n in (2, 3, 5, 8, 13, 21):
        for _ in range(4):
            sim = _sym(rng, n)
            fast = build_guide_tree(sim, linkage)
            ref = build_guide_tree_reference(sim, linkage)
            assert fast.joins == ref.joins, (linkage, n, sim)


@pytest.mark.parametrize("linkage", LINKAGES)
def test_tie_heavy_integer_matrices_match_reference(linkage):
    # Small-integer similarities force exact linkage ties (average stays
    # exact in float64: integer sums < 2^53), exercising the pinned
    # lexicographic (min_id, max_id) rule on both builders.
    rng = np.random.default_rng(7)
    for n in (3, 6, 10, 16):
        for _ in range(6):
            sim = _sym(rng, n, integer=True)
            fast = build_guide_tree(sim, linkage)
            ref = build_guide_tree_reference(sim, linkage)
            assert fast.joins == ref.joins, (linkage, n, sim)


def test_all_equal_similarities_join_lexicographically():
    sim = np.ones((6, 6))
    np.fill_diagonal(sim, 0.0)
    for linkage in LINKAGES:
        tree = build_guide_tree(sim, linkage)
        assert tree.joins == build_guide_tree_reference(sim, linkage).joins
        # first join must be (0, 1) by the pinned tie-break
        assert tree.joins[0] == (0, 1)


def test_validation_errors():
    with pytest.raises(ValueError):
        build_guide_tree(np.zeros((2, 3)))
    with pytest.raises(ValueError):
        build_guide_tree(np.zeros((0, 0)))
    with pytest.raises(ValueError):
        build_guide_tree(np.zeros((2, 2)), "ward")
    t = build_guide_tree(np.zeros((1, 1)))
    assert t.num_leaves == 1 and t.joins == ()


def test_n2000_in_seconds():
    # VERDICT done-bar: N=2000 tree in seconds (was O(N^3)-O(N^4)).
    rng = np.random.default_rng(0)
    sim = _sym(rng, 2000)
    t0 = time.perf_counter()
    tree = build_guide_tree(sim, "average")
    dt = time.perf_counter() - t0
    assert len(tree.joins) == 1999
    # ~0.6s typical; the bound only needs to catch an O(N^3)+ regression
    # (minutes), not CI load spikes (observed 11s under a saturated box).
    assert dt < 60.0, f"guide tree for N=2000 took {dt:.1f}s"
