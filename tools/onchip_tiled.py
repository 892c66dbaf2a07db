"""Measure the register-tiled multi-diagonal DP (kernels.pallas_dp_tiled)
against the classic per-diagonal kernel at the production dispatch shape,
and assert bit parity compiled on the real chip.  Decides the batch
driver's routing default (PRALINE_TILED_DP overrides)."""

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
from praline_tpu.kernels.pallas_dp_tiled import wavefront_dp_tiled

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


MODE = "global"
for a in sys.argv[1:]:
    if a.startswith("--mode="):
        MODE = a.split("=", 1)[1]


def make(kind, T=8, bb=128):
    @jax.jit
    def run(cx, ivx, cy, ivy, s, lx, ly):
        hs = fused_skewed_scores(cx, ivx, cy, ivy, s)
        if kind in ("classic", "classic-scalar"):
            out = wavefront_dp_pallas(
                hs, lx, ly, gap_series=(11, 1), mode=MODE,
                traceback=TB, hs_body=True,
                term_rows=(kind == "classic"),
            )
        else:
            out = wavefront_dp_tiled(
                hs, lx, ly, gap_series=(11, 1), mode=MODE,
                traceback=TB, steps_per_visit=T, block_b=bb,
            )
        if TB:
            # reduce tb on device so the pull stays cheap but nothing dedups
            return out["score"], out["tcode"], jnp.sum(out["tb"].astype(jnp.int32))
        return out["score"], out["length"]

    return run


def bench(name, fn, ref):
    outs = [fn(*a) for a in sets]
    jax.block_until_ready(outs)
    got = np.asarray(outs[0][0])
    if ref is not None:
        np.testing.assert_array_equal(ref[0], got)
        np.testing.assert_array_equal(ref[1], np.asarray(outs[0][1]))
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        outs = [fn(*a) for a in sets]
        sink = [float(o[0][0]) + float(o[1][-1]) for o in outs]
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts) // 2]
    print(f"{name:24s}: {dt*1e3:8.1f} ms  {cells/dt/1e9:6.2f}e9 cells/s", flush=True)
    return (got, np.asarray(outs[0][1]))


sweep_args = [a for a in sys.argv[1:] if "=" in a and not a.startswith("--")]
SWEEP = [tuple(int(x) for x in a.split("=")) for a in sweep_args]

ref = bench("classic-scalar", make("classic-scalar"), None)
bench("classic term-rows", make("classic"), ref)
for T, bb in SWEEP:
    try:
        bench(f"tiled T={T} Bblk<={bb}", make("tiled", T, bb), ref)
    except Exception as e:  # compile failures should not kill the sweep
        print(f"tiled T={T} Bblk<={bb}: FAILED {type(e).__name__}: {str(e)[:200]}")
print("parity asserted vs classic-scalar on every variant above")
