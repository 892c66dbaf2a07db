"""Relay round-trip latency + honest producer/DP split (round 5).

Every onchip probe that pulls per timing round pays the relay's host
round trip inside the measured interval — a ~30 ms constant that swamps
sub-100 ms kernels and made the producer look invariant to its own work
(tools/onchip_prodroll.py).  This probe measures (a) the bare pull
latency, (b) producer and producer+DP wall-clock with the pull amortized
over many dispatch rounds, giving the true compute split.

Usage: python tools/onchip_latency.py [--rounds=6]
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
from praline_tpu.kernels.strip import strip_dispatch_core, strip_stride  # noqa: E402

assert jax.default_backend() == "tpu", jax.devices()
jax.config.update("jax_compilation_cache_dir", "/tmp/praline_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def arg(name, default, cast=int):
    for a in sys.argv[1:]:
        if a.startswith(f"--{name}="):
            return cast(a.split("=", 1)[1])
    return default


ROUNDS = arg("rounds", 6)
B, L = 1024, 1023
K = strip_stride(L, L)
from praline_tpu.kernels.strip import strip_plan

_plan = strip_plan(B, L, L, (11, 1))
R = arg("r", _plan[1] if _plan else 16)

# (a) bare pull latency: tiny dependent computation, pulled per round.
tin = jnp.zeros((8, 128), jnp.float32)


@jax.jit
def tiny(t, s):
    return t + s


float(np.asarray(tiny(tin, 0.0)[0, 0]))
ts = []
for k in range(12):
    t0 = time.perf_counter()
    float(np.asarray(tiny(tin, np.float32(k))[0, 0]))
    ts.append(time.perf_counter() - t0)
lat = sorted(ts)[len(ts) // 2]
print(f"bare dispatch+pull round trip : {lat*1e3:8.1f} ms", flush=True)

rng = np.random.default_rng(0)
s = np.asarray(builtin_score_matrix("blosum62").as_f32())
sets = []
cells = 0.0
for _ in range(2):
    cx, ivx, cy, ivy, _, _ = _example_batch(rng, B=B, Lx=L, Ly=L)
    lx = rng.integers(L // 2, L + 1, size=B).astype(np.int32)
    ly = rng.integers(L // 2, L + 1, size=B).astype(np.int32)
    cells += float((lx.astype(np.float64) * ly).sum())
    sets.append(tuple(jnp.asarray(a)
                      for a in (cx, ivx, cy, ivy, s, lx, ly)))


@jax.jit
def prod(cx, ivx, cy, ivy, s, lx, ly):
    hs = fused_skewed_scores_strip(
        cx, ivx, cy, ivy, s, K=K, R=R, scaled=True,
        mxu_precision="fast", layout="bmajor",
    )
    return jnp.sum(hs[..., 0]), jnp.sum(hs[..., 77])


@jax.jit
def proddp(cx, ivx, cy, ivy, s, lx, ly):
    out = strip_dispatch_core(
        cx, ivx, cy, ivy, s, lx, ly, K=K, R=R, gap_series=(11, 1),
        mode="global", qd=None, mxp="fast", hs_layout="bmajor", opt=True,
    )
    return out["score"], out["length"]


def bench(name, fn):
    outs = [fn(*a) for a in sets]
    [float(np.asarray(o[1]).ravel()[0]) for o in outs]
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        for r in range(ROUNDS):
            outs = [fn(*a) for a in sets]  # rotated sets, all async
        sink = [float(np.asarray(o[1]).ravel()[0]) for o in outs]  # ONE pull
        reps.append(time.perf_counter() - t0)
    del sink
    dt = min(reps) / ROUNDS
    print(f"{name:28s}: {dt*1e3:8.1f} ms/round (pull amortized over "
          f"{ROUNDS})  {cells/dt/1e9:6.2f}e9 cells/s", flush=True)


bench("producer only", prod)
bench("producer + DP", proddp)
