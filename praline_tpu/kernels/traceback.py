"""Host-side traceback replay from packed direction bits (SURVEY.md §9 P2).

The wavefront kernels emit 1 byte per interior DP cell in skewed layout
(``tb[d - 2, i]`` = bits of cell (i, d - i); see kernels.scan docstring) plus
the terminal (score, ti, tj, state code).  Replaying the pointers is O(L1+L2)
sequential pointer-chasing — host work by design (SURVEY.md §9 hard part 2).

The walk mirrors praline_tpu.oracle.align._traceback exactly, including the
border-run handling and the local-mode stop-at-zero rule; for the latter the
cell value is carried backward (M value = score at terminal; stepping off an
M cell subtracts its column score, stepping off a gap state adds the level
cost back), which is exact because all kernel arithmetic is pinned-exact.
"""

from __future__ import annotations

import numpy as np

from ..types import GAP
from ..oracle.align import AlignResult, _empty_result

PTR_NONE = 31


def replay_traceback(
    tb: np.ndarray,  # uint8[Dscan, Lp] bits for ONE problem (lane i, diag d-2)
    h: np.ndarray | None,  # f32[lx, ly] column scores; only local mode reads it
    score: float,
    ti: int,
    tj: int,
    tcode: int,
    lx: int,
    ly: int,
    gap_series: tuple[int, ...],
    mode: str,
) -> AlignResult:
    k = len(gap_series)
    g = gap_series
    local = mode == "local"
    if local and h is None:
        raise ValueError("local-mode replay requires the cell score matrix h")

    def mptr(i: int, j: int) -> int:
        return int(tb[i + j - 2, i]) & 31

    def stay_x(i: int, j: int) -> int:
        return (int(tb[i + j - 2, i]) >> 5) & 1

    def stay_y(i: int, j: int) -> int:
        return (int(tb[i + j - 2, i]) >> 6) & 1

    # Decode terminal state.
    if tcode == 0:
        state, lvl = "M", 0
    elif tcode <= k:
        state, lvl = "IX", tcode
    else:
        state, lvl = "IY", tcode - k

    i, j = ti, tj
    val = float(score)
    rx: list[int] = []
    ry: list[int] = []

    if mode == "semiglobal":
        for ii in range(lx, i, -1):
            rx.append(ii - 1)
            ry.append(GAP)
        for jj in range(ly, j, -1):
            rx.append(GAP)
            ry.append(jj - 1)

    if mode == "local" and score <= 0.0:
        return _empty_result(mode)

    while True:
        if state == "M":
            if i == 0 and j == 0:
                break
            if mode == "local" and val <= 0.0:
                break
            rx.append(i - 1)
            ry.append(j - 1)
            ptr = mptr(i, j)
            if local:
                val = val - float(h[i - 1, j - 1])
            i -= 1
            j -= 1
            if ptr == PTR_NONE:
                break
            if ptr == 0:
                state = "M"
            elif ptr <= k:
                state, lvl = "IX", ptr
            else:
                state, lvl = "IY", ptr - k
        elif state == "IX":
            rx.append(i - 1)
            ry.append(GAP)
            if j == 0:
                i -= 1
                if i == 0:
                    break
                lvl = min(i, k)
                continue
            if local:
                val = val + float(g[lvl - 1])
            if lvl == 1 and k == 1:
                stay = stay_x(i, j)
                i -= 1
                state, lvl = ("IX", 1) if stay else ("M", 0)
            elif lvl == 1:
                i -= 1
                state = "M"
            elif lvl < k:
                i -= 1
                lvl -= 1
            else:
                stay = stay_x(i, j)
                i -= 1
                lvl = k if stay else k - 1
            if state == "M" and i == 0 and j == 0:
                break
        else:  # IY
            rx.append(GAP)
            ry.append(j - 1)
            if i == 0:
                j -= 1
                if j == 0:
                    break
                lvl = min(j, k)
                continue
            if local:
                val = val + float(g[lvl - 1])
            if lvl == 1 and k == 1:
                stay = stay_y(i, j)
                j -= 1
                state, lvl = ("IY", 1) if stay else ("M", 0)
            elif lvl == 1:
                j -= 1
                state = "M"
            elif lvl < k:
                j -= 1
                lvl -= 1
            else:
                stay = stay_y(i, j)
                j -= 1
                lvl = k if stay else k - 1
            if state == "M" and i == 0 and j == 0:
                break

    cols_x = np.asarray(rx[::-1], dtype=np.int32)
    cols_y = np.asarray(ry[::-1], dtype=np.int32)
    xs = cols_x[cols_x != GAP]
    ys = cols_y[cols_y != GAP]
    x_range = (int(xs.min()), int(xs.max()) + 1) if xs.size else (0, 0)
    y_range = (int(ys.min()), int(ys.max()) + 1) if ys.size else (0, 0)
    return AlignResult(float(score), cols_x, cols_y, x_range, y_range, mode)
