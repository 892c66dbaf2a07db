"""Guide-tree construction (SURVEY.md C16, §4.3, §8.4).

Hierarchical agglomerative joining over a similarity matrix (larger = more
similar), kept on the host: it is O(N^2)-O(N^3) cheap scalar work next to the
O(N^2 L^2) DP stage (SURVEY.md §9 hard part 4).

Pinned semantics (§8.4):

* similarity(i, j) = pairwise alignment score, optionally divided by the
  pairwise alignment length (``score_normalization == "length"``),
* linkage over original leaf-pair similarities: ``single`` (max),
  ``complete`` (min), ``average`` (arithmetic mean in float64),
* at each step join the pair with maximal linkage; ties -> lexicographically
  smallest ``(min(node_id), max(node_id))``.
"""

from __future__ import annotations

import numpy as np

from ..types import SequenceTree


def build_guide_tree(similarity: np.ndarray, linkage: str = "average") -> SequenceTree:
    sim = np.asarray(similarity, dtype=np.float64)
    n = sim.shape[0]
    if sim.shape != (n, n):
        raise ValueError("similarity matrix must be square")
    if n == 0:
        raise ValueError("need at least one sequence")
    if linkage not in ("single", "complete", "average"):
        raise ValueError(f"unknown linkage {linkage!r}")
    if n == 1:
        return SequenceTree(1, ())

    # Active cluster -> member leaf indices; cluster ids are tree node ids.
    members: dict[int, list[int]] = {i: [i] for i in range(n)}
    joins: list[tuple[int, int]] = []

    def link(a: int, b: int) -> float:
        block = sim[np.ix_(members[a], members[b])]
        if linkage == "single":
            return float(block.max())
        if linkage == "complete":
            return float(block.min())
        return float(block.mean())

    for step in range(n - 1):
        active = sorted(members)
        best: tuple[float, int, int] | None = None
        for ai in range(len(active)):
            for bi in range(ai + 1, len(active)):
                a, b = active[ai], active[bi]
                v = link(a, b)
                # Ties resolve to the lexicographically smallest (a, b);
                # iteration order already visits pairs in that order, so
                # only strictly-better candidates replace.
                if best is None or v > best[0]:
                    best = (v, a, b)
        _, a, b = best  # type: ignore[misc]
        new_id = n + step
        members[new_id] = members.pop(a) + members.pop(b)
        joins.append((a, b))
    return SequenceTree(n, tuple(joins))


def similarity_from_scores(
    scores: np.ndarray, lengths: np.ndarray, normalization: str = "length"
) -> np.ndarray:
    """N x N similarity from pairwise (score, alignment-length) results."""
    scores = np.asarray(scores, dtype=np.float64)
    if normalization == "none":
        return scores
    if normalization == "length":
        return scores / np.maximum(np.asarray(lengths, dtype=np.float64), 1.0)
    raise ValueError(f"unknown score normalization {normalization!r}")
