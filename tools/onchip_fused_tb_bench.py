"""On-chip throughput: fused vs two-kernel in TRACEBACK mode.

Complements tools/onchip_fused_validation.py (scores mode): decides whether
the PRALINE_FUSED_DP default should be on for traceback dispatches on TPU.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _example_batch
from praline_tpu import builtin_score_matrix
from praline_tpu.kernels.fused_dp import wavefront_dp_fused
from praline_tpu.kernels.fused_scores import fused_skewed_scores
from praline_tpu.kernels.pallas_dp import wavefront_dp_pallas

assert jax.default_backend() == "tpu", jax.devices()
rng = np.random.default_rng(0)
s = np.asarray(builtin_score_matrix("blosum62").as_f32())

B, L = 256, 511  # merge/preprofile-shaped traceback batch
sets = []
cells = 0.0
for k in range(3):
    cx, ivx, cy, ivy, _, _ = _example_batch(rng, B=B, Lx=L, Ly=L)
    lx = rng.integers(L // 2, L + 1, size=B).astype(np.int32)
    ly = rng.integers(L // 2, L + 1, size=B).astype(np.int32)
    cells += float((lx.astype(np.float64) * ly).sum())
    sets.append(tuple(jnp.asarray(a) for a in (cx, ivx, cy, ivy, jnp.asarray(s), lx, ly)))


@jax.jit
def two_kernel(cx, ivx, cy, ivy, s, lx, ly):
    hs = fused_skewed_scores(cx, ivx, cy, ivy, s)
    out = wavefront_dp_pallas(hs, lx, ly, gap_series=(11, 1), mode="global",
                              hs_body=True, traceback=True)
    return out["score"], out["tb"]


@jax.jit
def fused(cx, ivx, cy, ivy, s, lx, ly):
    out = wavefront_dp_fused(cx, ivx, cy, ivy, s, lx, ly,
                             gap_series=(11, 1), mode="global",
                             traceback=True, interpret=False)
    return out["score"], out["tb"]


for name, fn in (("two-kernel+tb", two_kernel), ("fused+tb", fused)):
    outs = [fn(*a) for a in sets]
    jax.block_until_ready(outs)
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        outs = [fn(*a) for a in sets]
        sink = [float(sc[0]) + int(np.asarray(tb[0, 0, 0])) for sc, tb in outs]
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    print(f"{name}: {dt:.3f}s -> {cells/dt/1e9:.2f}e9 cells/s")
