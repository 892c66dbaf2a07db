"""Producer cost-structure probe (round 4): where do the b-major producer's
~55 ms/set go?  Variants (PERF-ONLY, some intentionally wrong-valued):

* full        — the shipped b-major producer
* norolls     — barrel roll skipped (wrong values; isolates roll cost)
* nomm        — matmul replaced by a broadcast (wrong values; isolates MXU)
* pb64        — PB=64 (half the grid iterations; VMEM permitting)

Each variant's delta vs `full` attributes that block's wall share."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _example_batch
from praline_tpu.io import builtin_score_matrix
from praline_tpu.kernels import fused_scores as fs

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
    sets.append(tuple(jnp.asarray(a) for a in (cx, ivx, cy, ivy, jnp.asarray(s))))


def make(variant):
    @jax.jit
    def run(cx, ivx, cy, ivy, s):
        hs = fs.fused_skewed_scores(cx, ivx, cy, ivy, s, layout="bmajor")
        return jnp.sum(hs[..., 0]), jnp.sum(hs[..., 77])

    return run


def bench(name, fn):
    outs = [fn(*a) for a in sets]
    jax.block_until_ready(outs)
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        outs = [fn(*a) for a in sets]
        sink = [float(np.asarray(o[0])) for o in outs]
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts) // 2]
    print(f"{name:12s}: {dt*1e3:8.1f} ms  {cells/dt/1e9:6.2f}e9 cells/s", flush=True)


import unittest.mock as mock

bench("full", make("full"))

# norolls: neutralize the barrel roll (identity) via pltpu.roll patch.
real_roll = fs.pltpu.roll
with mock.patch.object(fs.pltpu, "roll", lambda x, amt, axis: x):
    fs.fused_skewed_scores.clear_cache()
    bench("norolls", make("norolls"))
fs.fused_skewed_scores.clear_cache()

# (an MXU-neutralizing variant is not Mosaic-legal to mock; the matmul is
# ~0.25 us/step by arithmetic — negligible)

# pb64 / pb16: grid-iteration count halves/doubles.
for pb in (64, 16):
    try:
        with mock.patch.object(fs, "PB", pb):
            fs.fused_skewed_scores.clear_cache()
            bench(f"pb{pb}", make(f"pb{pb}"))
    except Exception as e:
        print(f"pb{pb}: FAILED {type(e).__name__}: {str(e)[:160]}")
    fs.fused_skewed_scores.clear_cache()
