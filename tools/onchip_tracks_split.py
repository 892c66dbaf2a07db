"""Amortized breakdown of the trackset composite dispatch (round 5).

The strip-routed composite measures ~341 ms/iter at B=1024/L=1023 while
its parts should sum to ~135 ms (2 producers + accumulate + DP + pull).
This probe times, with the relay pull amortized over rounds: (a) the
full composite jit on captured production inputs, (b) a producers+
accumulate-only jit, (c) one strip producer alone — locating the tail.

Usage: python tools/onchip_tracks_split.py [--b=1024] [--l=1023]
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("PRALINE_STRIP", "1")

import numpy as np
import jax
import jax.numpy as jnp

from praline_tpu import ALPHABET_AA, builtin_score_matrix  # noqa: E402
from praline_tpu.kernels import align_tracksets_batched  # noqa: E402
from praline_tpu.kernels import batch as batch_mod  # noqa: E402
from praline_tpu.types import Profile  # noqa: E402

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
print(f"B={B} L={L}", flush=True)

rng = np.random.default_rng(0)
mats = [builtin_score_matrix("blosum62"), builtin_score_matrix("pam250")]
w = (1.0, 0.5)
profs = []
for _ in range(64):
    Lk = int(rng.integers(L // 2, L + 1))
    profs.append(
        Profile.from_tokens(rng.integers(0, 20, size=Lk).astype(np.int32),
                            ALPHABET_AA)
    )
pairs = []
cells = 0.0
for i in range(B):
    px, py = profs[(i * 7) % 64], profs[(i * 13 + 5) % 64]
    cells += float(px.length) * py.length
    pairs.append(((px, px), (py, py)))

# Capture the composite jit's production inputs via a spy.
captured = []
real = batch_mod._composite_indexed_jit


def spy():
    fn = real()

    def wrapper(*a, **k):
        captured.append((a, k))
        return fn(*a, **k)

    return wrapper


batch_mod._composite_indexed_jit = spy
align_tracksets_batched(pairs, mats, w, (11, 1), "global", traceback=False,
                        bucket_sizes=(L,), batch_pairs=B)
batch_mod._composite_indexed_jit = real
(a0, k0) = captured[0]
print(f"captured {len(captured)} dispatch(es); mxp={k0.get('mxp')}",
      flush=True)
fn = real()


def amortized(run, rounds=6):
    outs = run()
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], outs)
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(rounds):
            outs = run()
        jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], outs)
        reps.append(time.perf_counter() - t0)
    return min(reps) / rounds


dt = amortized(lambda: fn(*a0, **k0))
print(f"composite jit full        : {dt*1e3:8.1f} ms  "
      f"{cells/dt/1e9:6.2f}e9 cells/s", flush=True)

# Producers + accumulate only (same gathered operands, no DP):
from praline_tpu.kernels.fused_scores import fused_skewed_scores_strip  # noqa: E402
from praline_tpu.kernels.strip import strip_plan  # noqa: E402

K, R = strip_plan(B, L, L, (11, 1), force=True)
sxs, ivxs, lensx, sys_, ivys, lensy, ix, iy, ss = a0


@jax.jit
def prod_acc(sxs, ivxs, sys_, ivys, ix, iy, ss):
    terms = []
    for t, wt in enumerate(w):
        cx = jnp.take(sxs[t], ix, axis=0).astype(jnp.float32)
        ivx = jnp.take(ivxs[t], ix, axis=0)
        cy = jnp.take(sys_[t], iy, axis=0).astype(jnp.float32)
        ivy = jnp.take(ivys[t], iy, axis=0)
        terms.append(jnp.float32(wt) * fused_skewed_scores_strip(
            cx, ivx, cy, ivy, ss[t], K=K, R=R,
            mxu_precision=k0.get("mxp", "highest")))
    hs, _ = jax.lax.scan(lambda acc, term: (acc + term, None),
                         terms[0], jnp.stack(terms[1:]))
    return jnp.sum(hs[..., 0]), jnp.sum(hs[..., 7])


dt = amortized(lambda: prod_acc(sxs, ivxs, sys_, ivys, ix, iy, ss))
print(f"producers + accumulate    : {dt*1e3:8.1f} ms", flush=True)


@jax.jit
def one_prod(sxs, ivxs, sys_, ivys, ix, iy, ss):
    cx = jnp.take(sxs[0], ix, axis=0).astype(jnp.float32)
    ivx = jnp.take(ivxs[0], ix, axis=0)
    cy = jnp.take(sys_[0], iy, axis=0).astype(jnp.float32)
    ivy = jnp.take(ivys[0], iy, axis=0)
    hs = fused_skewed_scores_strip(cx, ivx, cy, ivy, ss[0], K=K, R=R,
                                   mxu_precision=k0.get("mxp", "highest"))
    return jnp.sum(hs[..., 0]), jnp.sum(hs[..., 7])


dt = amortized(lambda: one_prod(sxs, ivxs, sys_, ivys, ix, iy, ss))
print(f"one producer (+gathers)   : {dt*1e3:8.1f} ms", flush=True)
