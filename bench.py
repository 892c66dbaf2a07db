#!/usr/bin/env python
"""Headline benchmark: profile-profile DP cells/s on one chip.

Prints ONE JSON line:
  {"metric": "dp_cells_per_s_chip", "value": N, "unit": "cells/s",
   "vs_baseline": N}

``vs_baseline`` is measured throughput divided by 1e6 cells/s — the upper end
of the documented estimate for the reference's interpreted per-cell Python DP
loop (BASELINE.md: the reference publishes no numbers; ~1e5-1e6 cells/s,
single CPU core).  Driver target is >= 1e9 cells/s/chip (BASELINE.json:5).

Measures the full production dispatch: exact-integer score matmuls + skew +
batched wavefront scan, scores+lengths mode (the all-pairs distance
configuration), steady state after one warmup compile.
"""

from __future__ import annotations

import json
import time

# Reference estimate: interpreted Python per-cell loop, single core.
BASELINE_CELLS_PER_S = 1.0e6


def bench(B: int = 512, L: int = 511, iters: int = 8) -> dict:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from praline_tpu.io import builtin_score_matrix
    from praline_tpu.kernels.scan import wavefront_dp
    from praline_tpu.kernels.scores import skewed_pair_scores

    rng = np.random.default_rng(0)
    cx, inv_x, cy, inv_y, lx, ly = _example_batch(rng, B=B, Lx=L, Ly=L)
    s = builtin_score_matrix("blosum62").as_f32()
    args = tuple(jnp.asarray(a) for a in (cx, inv_x, cy, inv_y, s, lx, ly))

    @jax.jit
    def run(cx, inv_x, cy, inv_y, s, lx, ly):
        hs = skewed_pair_scores(cx, inv_x, cy, inv_y, s)
        out = wavefront_dp(hs, lx, ly, gap_series=(11, 1), mode="global")
        return out["score"], out["length"]

    # Warmup / compile.
    score, length = run(*args)
    score.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(iters):
        score, length = run(*args)
    score.block_until_ready()
    dt = time.perf_counter() - t0

    cells = B * L * L * iters
    value = cells / dt
    return {
        "metric": "dp_cells_per_s_chip",
        "value": value,
        "unit": "cells/s",
        "vs_baseline": value / BASELINE_CELLS_PER_S,
    }


if __name__ == "__main__":
    print(json.dumps(bench()))
