"""A/B the strip-packed wavefront (kernels.strip) against the classic
two-kernel path on the v5e at the headline shape: producer-only,
producer+DP, f32 profile and int8 one-hot workloads.  Asserts bit parity of
per-problem terminals on chip.  Decides the batch driver's strip route.

Usage: python tools/onchip_strip.py [--mode=global|semiglobal|local]
       [--r=16] [--b=1024] [--l=1023]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _example_batch
from praline_tpu.io import builtin_score_matrix
from praline_tpu.kernels.fused_scores import (
    fused_skewed_scores,
    fused_skewed_scores_strip,
)
from praline_tpu.kernels.pallas_dp import wavefront_dp_pallas
from praline_tpu.kernels.strip import strip_dispatch_core, strip_stride

assert jax.default_backend() == "tpu", jax.devices()
jax.config.update("jax_compilation_cache_dir", "/tmp/praline_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def arg(name, default, cast=int):
    for a in sys.argv[1:]:
        if a.startswith(f"--{name}="):
            return cast(a.split("=", 1)[1])
    return default


B = arg("b", 1024)
L = arg("l", 1023)
R = arg("r", 16)
MODE = arg("mode", "global", str)
ONEHOT = "--onehot" in sys.argv
TB = "--tb" in sys.argv
K = arg("k", strip_stride(L, L))  # --k=2048 forces the old pow2 stride
print(f"B={B} L={L} R={R} K={K} mode={MODE} onehot={ONEHOT} tb={TB}",
      flush=True)

rng = np.random.default_rng(0)
s = np.asarray(builtin_score_matrix("blosum62").as_f32())
A = s.shape[0]
sets = []
cells = 0.0
for _ in range(2):
    if ONEHOT:
        cx = np.eye(A, dtype=np.float32)[rng.integers(0, 20, size=(B, L))]
        cy = np.eye(A, dtype=np.float32)[rng.integers(0, 20, size=(B, L))]
        ivx = np.ones((B, L), np.float32)
        ivy = np.ones((B, L), np.float32)
    else:
        cx, ivx, cy, ivy, _, _ = _example_batch(rng, B=B, Lx=L, Ly=L)
    lx = rng.integers(L // 2, L + 1, size=B).astype(np.int32)
    ly = rng.integers(L // 2, L + 1, size=B).astype(np.int32)
    cells += float((lx.astype(np.float64) * ly).sum())
    sets.append(tuple(jnp.asarray(a) for a in (cx, ivx, cy, ivy, jnp.asarray(s), lx, ly)))

QD = jnp.int8 if ONEHOT else None
F32_LAYOUT = arg("layout", "bmajor" if QD is None else "dmajor", str)
# Production admits "fast" when fast_mxu_exact proves bit-identity (the
# headline profile workload qualifies); default matches production.
MXP = arg("mxp", "fast", str)
OPT = arg("opt", 1)  # strip kernel shaves (round 5): 1 = on


def make_classic(producer_only=False):
    @jax.jit
    def run(cx, ivx, cy, ivy, s, lx, ly):
        hs = fused_skewed_scores(
            cx, ivx, cy, ivy, s,
            out_dtype=QD if QD is not None else jnp.float32,
            scaled=QD is None, layout=F32_LAYOUT, mxu_precision=MXP,
        )
        if producer_only:
            return jnp.sum(hs[..., 0].astype(jnp.float32)), jnp.sum(
                hs[..., 77].astype(jnp.float32)
            )
        out = wavefront_dp_pallas(
            hs, lx, ly, gap_series=(11, 1), mode=MODE,
            traceback=TB, hs_body=True, hs_layout=F32_LAYOUT,
        )
        if TB:
            from praline_tpu.kernels.replay import replay_moves

            moves, nmoves = replay_moves(
                out["tb"], out["ti"], out["tj"], out["tcode"],
                gap_series=(11, 1), mode=MODE, steps=2 * L,
            )
            return moves, nmoves
        return out["score"], out["length"]

    return run


def make_strip(producer_only=False):
    @jax.jit
    def run(cx, ivx, cy, ivy, s, lx, ly):
        if producer_only:
            hs = fused_skewed_scores_strip(
                cx, ivx, cy, ivy, s, K=K, R=R,
                out_dtype=QD if QD is not None else jnp.float32,
                scaled=QD is None, layout=F32_LAYOUT, mxu_precision=MXP,
            )
            return jnp.sum(hs[..., 0].astype(jnp.float32)), jnp.sum(
                hs[..., 77].astype(jnp.float32)
            )
        out = strip_dispatch_core(
            cx, ivx, cy, ivy, s, lx, ly, K=K, R=R,
            gap_series=(11, 1), mode=MODE, qd=QD, hs_layout=F32_LAYOUT,
            traceback=TB, mxp=MXP, opt=bool(OPT),
        )
        if TB:
            return out["moves"], out["nmoves"]
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
    del sink
    dt = sorted(ts)[len(ts) // 2]
    print(f"{name:28s}: {dt*1e3:8.1f} ms  {cells/dt/1e9:6.2f}e9 cells/s", flush=True)
    return got


ONLY = arg("only", "", str)
if ONLY == "strip":
    # Timing-only rerun of the strip halves (classic + parity already
    # measured; fresh relay compiles cost minutes each).
    bench("producer strip", make_strip(True))
    bench("prod+dp strip", make_strip())
else:
    bench("producer classic", make_classic(True))
    bench("producer strip", make_strip(True))
    ref = bench("prod+dp classic", make_classic())
    bench("prod+dp strip", make_strip(), ref)
    print("parity asserted: strip == classic terminals on chip")
