"""On-chip validation + measurement of the fused producer+DP kernel.

Run on the real TPU (no JAX_PLATFORMS override). Steps:
1. bit parity: fused vs scan terminals + tb bits, compiled on chip;
2. batch-API parity vs oracle with PRALINE_FUSED_DP=1 (scores + traceback);
3. throughput: fused vs two-kernel at the bench shape (B=512, L=1023).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ["PRALINE_FUSED_DP"] = "1"

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _example_batch
from praline_tpu import ALPHABET_AA, builtin_score_matrix
from praline_tpu.kernels import align_pairs_batched
from praline_tpu.kernels.fused_dp import wavefront_dp_fused
from praline_tpu.kernels.fused_scores import fused_skewed_scores
from praline_tpu.kernels.pallas_dp import wavefront_dp_pallas
from praline_tpu.kernels.scan import wavefront_dp
from praline_tpu.kernels.scores import skewed_pair_scores
from praline_tpu.oracle import align_profiles
from praline_tpu.types import Profile

assert jax.default_backend() == "tpu", jax.devices()
rng = np.random.default_rng(0)
m = builtin_score_matrix("blosum62")
s = np.asarray(m.as_f32())

# ---- 1. compiled bit parity ----
for mode in ("global", "semiglobal", "local"):
    for gs in ((11, 1), (13, 7, 1)):
        cx, ivx, cy, ivy, _, _ = _example_batch(rng, B=5, Lx=61, Ly=144)
        lx = rng.integers(30, 62, size=5).astype(np.int32)
        ly = rng.integers(70, 145, size=5).astype(np.int32)
        hs = skewed_pair_scores(*map(jnp.asarray, (cx, ivx, cy, ivy, s)))
        want = wavefront_dp(hs, jnp.asarray(lx), jnp.asarray(ly),
                            gap_series=gs, mode=mode, traceback=True)
        got = wavefront_dp_fused(
            *map(jnp.asarray, (cx, ivx, cy, ivy, s, lx, ly)),
            gap_series=gs, mode=mode, traceback=True, interpret=False,
        )
        for key in ("score", "ti", "tj", "tcode"):
            np.testing.assert_array_equal(
                np.asarray(want[key]), np.asarray(got[key]),
                err_msg=f"{mode}/{gs}:{key}")
        tbw, tbg = np.asarray(want["tb"]), np.asarray(got["tb"])
        np.testing.assert_array_equal(tbw, tbg[:, :, : tbw.shape[2]],
                                      err_msg=f"{mode}/{gs}:tb")
print("1. ON-CHIP bit parity OK (terminals + tb bits, all modes)")

# ---- 2. batch API vs oracle ----
mk = lambda L: Profile.from_tokens(
    rng.integers(0, 20, size=L).astype(np.int32), ALPHABET_AA)
pairs = [(mk(40), mk(35)), (mk(120), mk(90)), (mk(12), mk(50))]
for tb in (False, True):
    got = align_pairs_batched(pairs, m, (11, 1), "global", traceback=tb,
                              backend="pallas")
    for (px, py), r in zip(pairs, got):
        want = align_profiles(px, py, m, (11, 1), "global")
        assert r.score == want.score, (r.score, want.score)
        if tb:
            assert (r.cols_x == want.cols_x).all()
print("2. batch API (PRALINE_FUSED_DP=1) oracle parity OK")

# ---- 3. throughput ----
B, L = 512, 1023
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
                              hs_body=True)
    return out["score"], out["length"]

@jax.jit
def fused(cx, ivx, cy, ivy, s, lx, ly):
    out = wavefront_dp_fused(cx, ivx, cy, ivy, s, lx, ly,
                             gap_series=(11, 1), mode="global",
                             interpret=False)
    return out["score"], out["length"]

for name, fn in (("two-kernel", two_kernel), ("fused", fused)):
    outs = [fn(*a) for a in sets]
    jax.block_until_ready(outs)
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        outs = [fn(*a) for a in sets]
        sink = [float(sc[0]) + float(ln[-1]) for sc, ln in outs]
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    print(f"3. {name}: {dt:.3f}s -> {cells/dt/1e9:.2f}e9 cells/s")
