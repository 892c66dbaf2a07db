"""HBM write-pattern probe for the producer's output blocks (round 5).

The strip producer floors at ~65 ms/set with arithmetic, fetches, write
WIDTH and grid-step count all elided — the remaining suspect is write
CONTIGUITY: bmajor hs blocks are (PB, 128, 128) slices of a (Bs, rows,
1024) tensor, so each written row is a 512 B chunk in a 4 KB stride.
This probe times pure-write pallas kernels at the headline hs shape:
(a) the producer's (16, 128, 128) block, (b) a full-lane (16, 128, 1024)
block (4 KB contiguous rows), (c) XLA's own copy of the same tensor
(device bandwidth reference).

Usage: python tools/onchip_wprobe.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

assert jax.default_backend() == "tpu", jax.devices()
jax.config.update("jax_compilation_cache_dir", "/tmp/praline_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

Bs, ROWS, LP = 64, 17408, 1024
PB, TILE = 16, 128
GB = Bs * ROWS * LP * 4 / 1e9


def make_writer(lane_tiles, pb=PB):
    lanes = lane_tiles * TILE

    def kernel(x_ref, o_ref):
        o_ref[:, :, :] = x_ref[0, 0] + jnp.zeros((pb, TILE, lanes), jnp.float32)

    grid = (Bs // pb, ROWS // TILE, LP // lanes)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((1, 1), lambda b, s, i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(
                (pb, TILE, lanes), lambda b, s, i: (b, s, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((Bs, ROWS, LP), jnp.float32),
        )(x)

    return run


def bench(name, fn, arg):
    out = fn(arg)
    float(np.asarray(out[0, 0, 0]))  # host pull: block_until_ready does
    ts = []                          # not block on the relay runtime
    for k in range(6):
        a = arg + np.float32(k)  # defeat result caching
        t0 = time.perf_counter()
        out = fn(a)
        sink = float(np.asarray(out[-1, -1, -1]))
        ts.append(time.perf_counter() - t0)
    del sink
    dt = sorted(ts)[len(ts) // 2]
    print(f"{name:34s}: {dt*1e3:8.1f} ms  {GB/dt:7.1f} GB/s", flush=True)
    return out


x = jnp.ones((1, 1), jnp.float32)
bench("pallas write (16,128,128) blocks", make_writer(1), x)
bench("pallas write (8,128,1024) blocks", make_writer(8, pb=8), x)
bench("pallas write (4,128,1024) blocks", make_writer(8, pb=4), x)
bench("pallas write (16,128,512) blocks", make_writer(4), x)

big = jnp.ones((Bs, ROWS, LP), jnp.float32)


@jax.jit
def xla_copy(t, s):
    return t + s


out = xla_copy(big, x)
float(np.asarray(out[0, 0, 0]))
ts = []
for k in range(6):
    t0 = time.perf_counter()
    out = xla_copy(big, x + np.float32(k))
    sink = float(np.asarray(out[-1, -1, -1]))
    ts.append(time.perf_counter() - t0)
del sink
dt = sorted(ts)[len(ts) // 2]
print(f"{'XLA read+write same tensor':34s}: {dt*1e3:8.1f} ms  "
      f"{2*GB/dt:7.1f} GB/s (r+w)", flush=True)
