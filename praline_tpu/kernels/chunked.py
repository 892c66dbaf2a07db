"""Chunked (unbounded-length) wavefront execution (SURVEY.md §3.2 SP row,
§9 hard part 1 "boundary-carry chaining").

The DP runs over the diagonal axis in band chunks: for each chunk the fused
producer (kernels.fused_scores) materializes only that chunk's skewed score
bands — the pair score matrix never exists in HBM — and the wavefront kernel
resumes from the previous chunk's carried state (diagonal state vectors,
best-state reduce buffers, terminal trackers), so peak memory is
O(chunk * B * Lx) regardless of Ly.  This removes the hs-tensor HBM ceiling:
Lx is bounded by VMEM lane state (~20k residues), Ly is unbounded —
e.g. scanning a protein along a genome-scale sequence in semiglobal/local
mode.

Results are bit-identical to the single-dispatch path (parity-tested),
including traceback bits, which stream back chunk by chunk.
"""

from __future__ import annotations

import numpy as np

from .fused_scores import TILE, fused_skewed_scores
from .pallas_dp import wavefront_dp_pallas


def wavefront_dp_chunked(
    cx,  # f32[B, Lx, A] integer-valued counts
    inv_x,  # f32[B, Lx]
    cy,  # f32[B, Ly, A]
    inv_y,  # f32[B, Ly]
    s,  # f32[A, A]
    lx,  # int32[B]
    ly,  # int32[B]
    gap_series: tuple[int, ...] = (11, 1),
    mode: str = "global",
    traceback: bool = False,
    chunk_bands: int = 16,
    interpret: bool | None = None,
):
    """Chunked equivalent of (fused_skewed_scores -> wavefront_dp_pallas).

    Returns the usual terminal dict; with ``traceback`` the bits come as a
    list of per-chunk numpy arrays (``tb_chunks``) whose concatenation along
    axis 0 is the body-layout bit tensor (row t = diagonal t + 2).
    """
    import jax

    B, Lx, A = cx.shape
    Ly = cy.shape[1]
    D = Lx + Ly + 1
    total_bands = -(-(D - 2) // TILE)
    total_d = 2 + total_bands * TILE

    carry = None
    tb_chunks: list[np.ndarray] = []
    out = None
    for b0 in range(0, total_bands, chunk_bands):
        nb = min(chunk_bands, total_bands - b0)
        hs = fused_skewed_scores(
            cx, inv_x, cy, inv_y, s,
            band_start=b0, n_bands=nb, interpret=interpret,
        )
        out = wavefront_dp_pallas(
            hs,
            lx,
            ly,
            gap_series=tuple(gap_series),
            mode=mode,
            traceback=traceback,
            lengths=True,
            hs_body=True,
            chunked=True,
            first=(b0 == 0),
            d_base=2 + b0 * TILE,
            total_d=total_d,
            carry_in=carry,
            interpret=interpret,
        )
        carry = out["carry"]
        if traceback:
            tb_chunks.append(np.asarray(out["tb"]))

    result = {k: out[k] for k in ("score", "length", "ti", "tj", "tcode")}
    if traceback:
        result["tb_chunks"] = tb_chunks
    return result
