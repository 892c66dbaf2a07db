"""DP-phase DMA-vs-ops discriminator (round 4): time wavefront_dp_pallas
ALONE on pre-materialized hs in f32 vs int8 (4x less HBM read) at the
production shape.  A large f32->int8 drop means the DP phase is hs-DMA
bound; a small one confirms the op-issue bound (tools/onchip_tiled.py)."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from praline_tpu.kernels.pallas_dp import wavefront_dp_pallas

assert jax.default_backend() == "tpu", jax.devices()
jax.config.update("jax_compilation_cache_dir", "/tmp/praline_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

B, L = 512, 1023
steps, LpT = 2048, 1024
rng = np.random.default_rng(0)
lx = rng.integers(L // 2, L + 1, size=B).astype(np.int32)
ly = rng.integers(L // 2, L + 1, size=B).astype(np.int32)
cells = float((lx.astype(np.float64) * ly).sum()) * 2
host_sets = [rng.integers(-8, 12, size=(steps, B, LpT)).astype(np.int8)
             for _ in range(2)]
lxd, lyd = jnp.asarray(lx), jnp.asarray(ly)


def make(tb):
    @jax.jit
    def run(hs):
        out = wavefront_dp_pallas(
            hs, lxd, lyd, gap_series=(11, 1), mode="global",
            traceback=tb, hs_body=True,
        )
        if tb:
            return out["score"], jnp.sum(out["tb"].astype(jnp.int32))
        return out["score"], out["length"]

    return run


for tb in (False, True):
    fn = make(tb)
    for name, dt in (("f32", np.float32), ("int8", np.int8)):
        sets = [jnp.asarray(h.astype(dt)) for h in host_sets]
        outs = [fn(h) for h in sets]
        jax.block_until_ready(outs)
        ref = np.asarray(outs[0][0])
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            outs = [fn(h) for h in sets]
            sink = [float(np.asarray(o[0])[0]) for o in outs]
            ts.append(time.perf_counter() - t0)
        dtm = sorted(ts)[len(ts) // 2]
        print(f"dp-only tb={tb} {name:5s}: {dtm*1e3:8.1f} ms  "
              f"{cells/dtm/1e9:6.2f}e9 cells/s", flush=True)
        del sets, outs
