"""Measure dispatch-latency amortization: one jit running n_sub sub-batches
of the production dispatch body via lax.scan (hs transient per iteration)
vs n_sub separate dispatches.  Decides the batch driver's super-dispatch
grouping (VERDICT r2 item 1b)."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from praline_tpu.io import builtin_score_matrix
from praline_tpu.kernels.batch import indexed_dispatch_body

assert jax.default_backend() == "tpu", jax.devices()
jax.config.update("jax_compilation_cache_dir", "/tmp/praline_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

B, L, NPROF, A = 1024, 1023, 256, 23
rng = np.random.default_rng(0)
s = jnp.asarray(builtin_score_matrix("blosum62").as_f32())

# Integer-count (non-one-hot) stacks, as in the bench's profile workload.
counts = rng.integers(0, 3, size=(NPROF, L, A)).astype(np.uint8)
counts[:, :, 0] += 1
inv = (1.0 / np.maximum(counts.sum(-1), 1)).astype(np.float32)
lens = rng.integers(L // 2, L + 1, size=NPROF).astype(np.int32)
stack = jnp.asarray(counts)
inv_d = jnp.asarray(inv)
lens_d = jnp.asarray(lens)

static = dict(gap_series=(11, 1), mode="global", traceback=False,
              backend="pallas", qd=None, replay=False,
              onehot_x=False, onehot_y=False, A=A)


@jax.jit
def one(ix, iy):
    out = indexed_dispatch_body(
        stack, inv_d, lens_d, stack, inv_d, lens_d, ix, iy, s, **static
    )
    return out["score"], out["length"]


@jax.jit
def multi(ix2, iy2):
    def body(_, xs):
        ix, iy = xs
        out = indexed_dispatch_body(
            stack, inv_d, lens_d, stack, inv_d, lens_d, ix, iy, s, **static
        )
        return 0, (out["score"], out["length"])

    _, outs = jax.lax.scan(body, 0, (ix2, iy2))
    return outs


def timeit(label, fn, args, n_sub, iters=6):
    r = fn(*args)
    jax.block_until_ready(r)
    cells = float((lens[np.asarray(args[0]).reshape(-1) % NPROF].astype(np.float64)
                   * lens[np.asarray(args[1]).reshape(-1) % NPROF]).sum())
    # cells from actual gathered lens:
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        sink = float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    cps = cells / med
    print(f"{label:14s} med {med*1e3:8.1f} ms  {cps/1e9:6.2f}e9 cells/s")
    return med, cps


ix = (np.arange(B) % NPROF).astype(np.int32)
iy = ((np.arange(B) * 7 + 3) % NPROF).astype(np.int32)

def cellsum(ixv, iyv):
    return float((lens[ixv].astype(np.float64) * lens[iyv]).sum())

t1, _ = timeit("single B=1024", one, (jnp.asarray(ix), jnp.asarray(iy)), 1)
for n_sub in (2, 4):
    ix2 = np.stack([(ix + 13 * t) % NPROF for t in range(n_sub)]).astype(np.int32)
    iy2 = np.stack([(iy + 5 * t) % NPROF for t in range(n_sub)]).astype(np.int32)
    tm, _ = timeit(f"scan n={n_sub}", multi, (jnp.asarray(ix2), jnp.asarray(iy2)), n_sub)
    print(f"  amortization: {n_sub}x single = {n_sub*t1*1e3:.1f} ms, "
          f"scan = {tm*1e3:.1f} ms, saved {(n_sub*t1-tm)*1e3:.1f} ms")
