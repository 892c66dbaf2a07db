"""Independent brute-force alignment enumerator for tiny cases.

Enumerates alignments as move strings over {D (match), X (gap in y, consume
x), Y (gap in x, consume y)} with the pinned state-machine restriction that X
and Y moves are never adjacent (no Ix <-> Iy transitions), and the pinned gap
cost model: a maximal run of m same-direction gap moves costs
``sum_{t=1..m} G[min(t, k) - 1]``.

Deliberately shares no code with praline_tpu.oracle.align.
"""

from __future__ import annotations

import numpy as np


def run_cost(m: int, gap_series: tuple[int, ...]) -> float:
    k = len(gap_series)
    return float(sum(gap_series[min(t, k) - 1] for t in range(1, m + 1)))


def brute_global(h: np.ndarray, gap_series: tuple[int, ...]) -> float:
    """Best global alignment score by exhaustive path enumeration."""
    L1, L2 = h.shape

    best = [-np.inf]

    def rec2(i: int, j: int, last: str, run: int, score: float) -> None:
        if i == L1 and j == L2:
            best[0] = max(best[0], score)
            return
        k = len(gap_series)
        if i < L1 and j < L2:
            rec2(i + 1, j + 1, "D", 0, score + float(h[i, j]))
        if i < L1 and last != "Y":
            nrun = run + 1 if last == "X" else 1
            rec2(i + 1, j, "X", nrun, score - gap_series[min(nrun, k) - 1])
        if j < L2 and last != "X":
            nrun = run + 1 if last == "Y" else 1
            rec2(i, j + 1, "Y", nrun, score - gap_series[min(nrun, k) - 1])

    rec2(0, 0, "D", 0, 0.0)
    return best[0]


def brute_local(h: np.ndarray, gap_series: tuple[int, ...]) -> float:
    """Best local score: max over sub-paths that start and end with a D move
    (plus the empty alignment, score 0)."""
    L1, L2 = h.shape
    best = [0.0]

    def rec(i: int, j: int, last: str, run: int, score: float) -> None:
        if last == "D":
            best[0] = max(best[0], score)
        k = len(gap_series)
        if i < L1 and j < L2:
            rec(i + 1, j + 1, "D", 0, score + float(h[i, j]))
        if i < L1 and last != "Y":
            nrun = run + 1 if last == "X" else 1
            rec(i + 1, j, "X", nrun, score - gap_series[min(nrun, k) - 1])
        if j < L2 and last != "X":
            nrun = run + 1 if last == "Y" else 1
            rec(i, j + 1, "Y", nrun, score - gap_series[min(nrun, k) - 1])

    for i0 in range(L1):
        for j0 in range(L2):
            rec(i0 + 1, j0 + 1, "D", 0, float(h[i0, j0]))
    return best[0]


def brute_semiglobal(h: np.ndarray, gap_series: tuple[int, ...]) -> float:
    """Best semiglobal score: free single-direction leading run, interior
    path under the adjacency rule, free trailing remainder once one sequence
    is exhausted (mirrors §8.3 terminal-on-last-row/col semantics)."""
    L1, L2 = h.shape
    best = [0.0]  # the all-gap path scores 0

    def rec(i: int, j: int, last: str, run: int, score: float) -> None:
        if i == L1 or j == L2:
            best[0] = max(best[0], score)  # remainder is free
        k = len(gap_series)
        if i < L1 and j < L2:
            rec(i + 1, j + 1, "D", 0, score + float(h[i, j]))
        if i < L1 and last != "Y":
            nrun = run + 1 if last == "X" else 1
            rec(i + 1, j, "X", nrun, score - gap_series[min(nrun, k) - 1])
        if j < L2 and last != "X":
            nrun = run + 1 if last == "Y" else 1
            rec(i, j + 1, "Y", nrun, score - gap_series[min(nrun, k) - 1])

    # Leading free gaps: start on the left border (i0, 0) or top border
    # (0, j0).  A leading X run cannot be followed directly by a Y move (the
    # DP has no Ix -> Iy transition), so seed `last` accordingly.
    rec(0, 0, "D", 0, 0.0)
    for i0 in range(1, L1 + 1):
        rec(i0, 0, "X", 0, 0.0)
    for j0 in range(1, L2 + 1):
        rec(0, j0, "Y", 0, 0.0)
    return best[0]
