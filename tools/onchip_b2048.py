"""Does dispatch width past B=1024 pay? (VERDICT r4 item 5)

B=2048 strip dispatches OOM as ONE kernel (hs + producer temporaries >
15.75 GB, STATUS r4 delta #7).  But the production driver already runs a
B=2048 workload as a SUPER-DISPATCH: one jit that lax.scans the strip body
over two B=1024 chunks, freeing each chunk's hs before the next — one
round trip, peak memory of a single chunk.  This A/B measures what a
single wider kernel could still add: the production path at B=2048
(scan-of-2 inside one jit) vs two separate B=1024 dispatches (two round
trips) vs one B=1024 dispatch (the per-cell floor).

If scan-of-2 matches 2x the single-dispatch cell rate, width amortization
is fully banked by super-dispatch and a banded single-kernel B=2048 form
could only win the producer/DP pipeline-drain overlap between scan
iterations (~one band, sub-1%%).

Usage: python tools/onchip_b2048.py [--l=1023]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax

from __graft_entry__ import _example_batch  # noqa: E402
from praline_tpu.io import builtin_score_matrix  # noqa: E402
from praline_tpu.kernels import align_pairs_batched  # noqa: E402
from praline_tpu.kernels.batch import ProfileArena  # noqa: E402
from praline_tpu.types import ALPHABET_AA, Profile  # noqa: E402

assert jax.default_backend() == "tpu", jax.devices()
jax.config.update("jax_compilation_cache_dir", "/tmp/praline_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def arg(name, default, cast=int):
    for a in sys.argv[1:]:
        if a.startswith(f"--{name}="):
            return cast(a.split("=", 1)[1])
    return default


L = arg("l", 1023)
rng = np.random.default_rng(0)
matrix = builtin_score_matrix("blosum62")
A = matrix.alphabet.size

NPROF = 256
profs = []
for _ in range(NPROF):
    Lk = int(rng.integers(L // 2, L + 1))
    c = rng.integers(0, 2, size=(Lk, A)).astype(np.float32)
    c[:, 0] += 1.0
    profs.append(Profile(c, np.zeros(Lk, np.float32), ALPHABET_AA))
arena = ProfileArena(A, (L,))


def pair_set(B, salt):
    pairs = [
        (profs[(i * 7 + 3 * salt) % NPROF], profs[(i * 13 + 5 + salt) % NPROF])
        for i in range(B)
    ]
    cells = float(sum(float(p.length) * q.length for p, q in pairs))
    return pairs, cells


def run(pairs, batch_pairs):
    return align_pairs_batched(
        pairs, matrix, (11, 1), "global", traceback=False,
        bucket_sizes=(L,), batch_pairs=batch_pairs, backend="pallas",
        arena=arena,
    )


def bench(name, B, batch_pairs, split=1):
    sets = [pair_set(B, s) for s in range(2)]
    for p, _ in sets:
        if split == 1:
            run(p, batch_pairs)
        else:
            for h in range(split):
                run(p[h * B // split : (h + 1) * B // split], batch_pairs)
    ts = []
    for it in range(6):
        pairs, cells = sets[it % 2]
        t0 = time.perf_counter()
        if split == 1:
            run(pairs, batch_pairs)
        else:
            for h in range(split):
                run(pairs[h * B // split : (h + 1) * B // split], batch_pairs)
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts) // 2]
    print(f"{name:36s}: {dt*1e3:8.1f} ms  {cells/dt/1e9:6.2f}e9 cells/s",
          flush=True)


bench("B=1024 one dispatch", 1024, 1024)
bench("B=2048 super-dispatch (scan-of-2)", 2048, 8192)
bench("B=2048 two separate dispatches", 2048, 1024, split=2)
bench("B=4096 super-dispatch (scan-of-4)", 4096, 8192)
