"""Producer cost breakdown at the headline shape (round 5).

The strip producer is ~60% of headline wall-clock (tools/onchip_strip.py
r5: producer 66 ms vs DP 41 ms of 107 ms e2e) yet writes hs at only
~140 GB/s — far under HBM — so it is compute-bound, not write-bound.
This probe bounds the two VPU tails: the 7-step barrel-roll skew
(14 ops per 2x-stack element) and the inverse scaling (2 mults per stack
element), by timing the producer with each elided (outputs wrong; timing
only — fused_scores.debug_skip).

Usage: python tools/onchip_prodroll.py [--b=1024] [--l=1023] [--r=16]
       [--layout=bmajor] [--mxp=fast]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _example_batch  # noqa: E402
from praline_tpu.io import builtin_score_matrix  # noqa: E402
from praline_tpu.kernels.fused_scores import fused_skewed_scores_strip  # noqa: E402
from praline_tpu.kernels.strip import strip_stride  # noqa: E402

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
LAYOUT = arg("layout", "bmajor", str)
MXP = arg("mxp", "fast", str)
K = strip_stride(L, L)
print(f"B={B} L={L} R={R} K={K} layout={LAYOUT} mxp={MXP}", flush=True)

rng = np.random.default_rng(0)
s = np.asarray(builtin_score_matrix("blosum62").as_f32())
sets = []
cells = 0.0
for _ in range(2):
    cx, ivx, cy, ivy, _, _ = _example_batch(rng, B=B, Lx=L, Ly=L)
    lx = rng.integers(L // 2, L + 1, size=B)
    cells += float((lx * lx).sum())
    sets.append(tuple(jnp.asarray(a) for a in (cx, ivx, cy, ivy, s)))


def make(skip, out_dtype=jnp.float32):
    @jax.jit
    def run(cx, ivx, cy, ivy, s):
        hs = fused_skewed_scores_strip(
            cx, ivx, cy, ivy, s, K=K, R=R, scaled=True,
            mxu_precision=MXP, layout=LAYOUT, debug_skip=skip,
            out_dtype=out_dtype,
        )
        return (jnp.sum(hs[..., 0].astype(jnp.float32)),
                jnp.sum(hs[..., 77].astype(jnp.float32)))

    return run


def bench(name, fn):
    outs = [fn(*a) for a in sets]
    jax.block_until_ready(outs)
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        outs = [fn(*a) for a in sets]
        sink = [float(np.asarray(o[1]).ravel()[0]) for o in outs]
        ts.append(time.perf_counter() - t0)
    del sink
    dt = sorted(ts)[len(ts) // 2]
    print(f"{name:28s}: {dt*1e3:8.1f} ms  {cells/dt/1e9:6.2f}e9 cells/s",
          flush=True)


bench("producer full", make(()))
bench("producer no-roll", make(("roll",)))
bench("producer no-scale", make(("scale",)))
bench("producer no-roll no-scale", make(("roll", "scale")))
# half-width writes (timing only; values truncated)
bench("producer bf16 out", make((), out_dtype=jnp.bfloat16))
# no matmuls at all: pure fetch + roll + write pipeline
bench("producer no-dots", make(("dots",)))
bench("producer no-dots no-roll", make(("dots", "roll")))
