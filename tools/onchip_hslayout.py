"""A/B the fused producer's hs layouts on the v5e: d-major (original —
transpose per grid step, self-tiles refetched per band) vs b-major
(transpose-free MXU stack, (b, i, s) grid with resident self-tiles).
Measures producer-only and producer+DP, scores and traceback; asserts bit
parity on chip.  Decides the batch driver's default layout."""

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
TB = "--tb" in sys.argv
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


def make(layout, producer_only=False):
    @jax.jit
    def run(cx, ivx, cy, ivy, s, lx, ly):
        hs = fused_skewed_scores(cx, ivx, cy, ivy, s, layout=layout)
        if producer_only:
            # cheap device-side consumption so nothing dedups or elides
            return jnp.sum(hs[..., 0]), jnp.sum(hs[..., 77])
        out = wavefront_dp_pallas(
            hs, lx, ly, gap_series=(11, 1), mode="global",
            traceback=TB, hs_body=True, hs_layout=layout,
        )
        if TB:
            return out["score"], jnp.sum(out["tb"].astype(jnp.int32))
        return out["score"], out["length"]

    return run


def bench(name, fn, ref=None):
    outs = [fn(*a) for a in sets]
    jax.block_until_ready(outs)
    got = np.asarray(outs[0][0])
    if ref is not None:
        np.testing.assert_array_equal(ref, got)
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        outs = [fn(*a) for a in sets]
        sink = [float(np.asarray(o[1]).ravel()[0]) for o in outs]
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts) // 2]
    print(f"{name:28s}: {dt*1e3:8.1f} ms  {cells/dt/1e9:6.2f}e9 cells/s", flush=True)
    return got


p_ref = bench("producer dmajor", make("dmajor", True))
bench("producer bmajor", make("bmajor", True))
ref = bench("prod+dp dmajor", make("dmajor"))
bench("prod+dp bmajor", make("bmajor"), ref)
print("parity asserted: bmajor == dmajor terminals on chip")
