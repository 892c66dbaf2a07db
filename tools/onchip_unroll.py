"""Measure the Pallas DP's grid-step overhead: unroll > 1 runs several
diagonals per grid step (fewer Mosaic grid iterations + fewer hs DMA
waits).  Decides whether the dispatch should enable unroll."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _example_batch
from praline_tpu.io import builtin_score_matrix
from praline_tpu.kernels.fused_scores import fused_skewed_scores
from praline_tpu.kernels.pallas_dp import wavefront_dp_pallas

assert jax.default_backend() == "tpu", jax.devices()
jax.config.update("jax_compilation_cache_dir", "/tmp/praline_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

B, L = 1024, 1023
rng = np.random.default_rng(0)
s = np.asarray(builtin_score_matrix("blosum62").as_f32())
sets = []
cells = 0.0
for _ in range(2):
    cx, ivx, cy, ivy, _, _ = _example_batch(rng, B=B, Lx=L, Ly=L)
    lx = rng.integers(L // 2, L + 1, size=B).astype(np.int32)
    ly = rng.integers(L // 2, L + 1, size=B).astype(np.int32)
    cells += float((lx.astype(np.float64) * ly).sum())
    sets.append(tuple(jnp.asarray(a) for a in (cx, ivx, cy, ivy, jnp.asarray(s), lx, ly)))


def make(unroll):
    @jax.jit
    def run(cx, ivx, cy, ivy, s, lx, ly):
        hs = fused_skewed_scores(cx, ivx, cy, ivy, s)
        out = wavefront_dp_pallas(
            hs, lx, ly, gap_series=(11, 1), mode="global", hs_body=True,
            unroll=unroll,
        )
        return out["score"], out["length"]

    return run


ref = None
for u in (1, 2, 4, 8):
    fn = make(u)
    outs = [fn(*a) for a in sets]
    jax.block_until_ready(outs)
    got = np.asarray(outs[0][0])
    if ref is None:
        ref = got
    else:
        np.testing.assert_array_equal(ref, got)  # parity across unrolls
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        outs = [fn(*a) for a in sets]
        sink = [float(sc[0]) + float(ln[-1]) for sc, ln in outs]
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts) // 2]
    print(f"unroll={u}: {dt*1e3:8.1f} ms  {cells/dt/1e9:6.2f}e9 cells/s")
