"""On-chip wall-clock breakdown of the traceback-mode dispatch.

Times, on the same merge/preprofile-shaped workload:
  1. scores-only (producer + DP, no tb bits)
  2. producer + DP with traceback bit emission (no replay)
  3. full path: producer + DP + device replay (move tapes out)

Decides where the 5x scores-vs-traceback throughput gap lives.
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _example_batch
from praline_tpu import builtin_score_matrix
from praline_tpu.kernels.fused_scores import fused_skewed_scores
from praline_tpu.kernels.pallas_dp import wavefront_dp_pallas
from praline_tpu.kernels.replay import replay_moves

assert jax.default_backend() == "tpu", jax.devices()
jax.config.update("jax_compilation_cache_dir", "/tmp/praline_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

rng = np.random.default_rng(0)
s = np.asarray(builtin_score_matrix("blosum62").as_f32())

B, L = 256, 511
sets = []
cells = 0.0
for k in range(3):
    cx, ivx, cy, ivy, _, _ = _example_batch(rng, B=B, Lx=L, Ly=L)
    lx = rng.integers(L // 2, L + 1, size=B).astype(np.int32)
    ly = rng.integers(L // 2, L + 1, size=B).astype(np.int32)
    cells += float((lx.astype(np.float64) * ly).sum())
    sets.append(tuple(jnp.asarray(a) for a in (cx, ivx, cy, ivy, jnp.asarray(s), lx, ly)))


@jax.jit
def scores_only(cx, ivx, cy, ivy, s, lx, ly):
    hs = fused_skewed_scores(cx, ivx, cy, ivy, s)
    out = wavefront_dp_pallas(hs, lx, ly, gap_series=(11, 1), mode="global",
                              hs_body=True)
    return out["score"]


@jax.jit
def tb_no_replay(cx, ivx, cy, ivy, s, lx, ly):
    hs = fused_skewed_scores(cx, ivx, cy, ivy, s)
    out = wavefront_dp_pallas(hs, lx, ly, gap_series=(11, 1), mode="global",
                              hs_body=True, traceback=True)
    # reduce the tb tensor so it is live but only a scalar returns
    return out["score"], jnp.sum(out["tb"].astype(jnp.int32))


@jax.jit
def tb_full(cx, ivx, cy, ivy, s, lx, ly):
    hs = fused_skewed_scores(cx, ivx, cy, ivy, s)
    out = wavefront_dp_pallas(hs, lx, ly, gap_series=(11, 1), mode="global",
                              hs_body=True, traceback=True)
    moves, n = replay_moves(out["tb"], lx, ly, jnp.zeros_like(lx),
                            gap_series=(11, 1), mode="global",
                            steps=2 * L + 2)
    return out["score"], moves, n


@jax.jit
def tb_materialize(cx, ivx, cy, ivy, s, lx, ly):
    hs = fused_skewed_scores(cx, ivx, cy, ivy, s)
    out = wavefront_dp_pallas(hs, lx, ly, gap_series=(11, 1), mode="global",
                              hs_body=True, traceback=True)
    return out["score"], out["tb"]


def timeit(fn, label):
    # warmup/compile
    r = fn(*sets[0])
    jax.block_until_ready(r)
    ts = []
    for it in range(6):
        a = sets[it % len(sets)]
        t0 = time.perf_counter()
        r = fn(*a)
        jax.block_until_ready(r)
        # force a host pull of a scalar so "ready" is honest on this runtime
        np.asarray(jax.tree_util.tree_leaves(r)[0][:1])
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{label:18s} med {med*1e3:8.2f} ms  {cells/3/med/1e9:6.2f}e9 cells/s")
    return med


t1 = timeit(scores_only, "scores-only")
t2 = timeit(tb_no_replay, "tb-bits (sum)")
t3 = timeit(tb_full, "tb+replay")
t4 = timeit(tb_materialize, "tb-bits (mat.)")
print(f"bit-emission overhead: {(t2-t1)*1e3:.2f} ms; replay overhead: "
      f"{(t3-t2)*1e3:.2f} ms; tb materialize (no replay): {(t4-t1)*1e3:.2f} ms")
