"""A/B the multi-track composite dispatch: strip route (round 5) vs the
XLA gather+scan form it previously always used.

Usage: python tools/onchip_tracks.py [--b=512] [--l=511] [--strip=1]
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def arg(name, default, cast=int):
    for a in sys.argv[1:]:
        if a.startswith(f"--{name}="):
            return cast(a.split("=", 1)[1])
    return default


STRIP = arg("strip", 1)
os.environ["PRALINE_STRIP"] = "1" if STRIP else "0"

import numpy as np
import jax

from praline_tpu import ALPHABET_AA, builtin_score_matrix  # noqa: E402
from praline_tpu.kernels import align_tracksets_batched  # noqa: E402
from praline_tpu.types import Profile  # noqa: E402

assert jax.default_backend() == "tpu", jax.devices()
jax.config.update("jax_compilation_cache_dir", "/tmp/praline_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

B = arg("b", 512)
L = arg("l", 511)
print(f"B={B} L={L} strip={STRIP}", flush=True)

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
sets, cells = [], []
for k in range(2):
    pairs, c = [], 0.0
    for i in range(B):
        px = profs[(i * 7 + 3 * k) % 64]
        py = profs[(i * 13 + 5 + k) % 64]
        c += float(px.length) * py.length
        pairs.append(((px, px), (py, py)))
    sets.append(pairs)
    cells.append(c)


def run(pairs):
    # production-default batch_pairs: term accumulation holds T+1 full hs
    # tensors, so oversized dispatch chunks spill HBM (measured: forcing
    # batch_pairs=1024 at L=1023 costs ~2x vs the 256 default)
    return align_tracksets_batched(
        pairs, mats, w, (11, 1), "global", traceback=False,
        bucket_sizes=(L,),
    )


run(sets[0])
run(sets[1])
rs = []
for it in range(6):
    t0 = time.perf_counter()
    run(sets[it % 2])
    rs.append(cells[it % 2] / (time.perf_counter() - t0))
rate = sorted(rs)[len(rs) // 2]
print(f"tracksets strip={STRIP}: {rate/1e9:6.2f}e9 cells/s", flush=True)
