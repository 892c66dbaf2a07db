"""On-chip compiled parity gate (SURVEY.md §5.2, VERDICT r2 item 3).

Runs on the REAL TPU (no JAX_PLATFORMS override) and asserts bit parity of
every compiled kernel against the compiled XLA scan, across all modes x gap
series: the Pallas two-kernel path (fused producer + DP), the fully fused
kernel, the int8 one-hot scoring path, and on-device traceback replay vs
the oracle through the batch API.  Exit code 0 = parity; invoked by
tests/kernels/test_onchip_parity.py under PRALINE_PERF=1.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu", jax.devices()
jax.config.update("jax_compilation_cache_dir", "/tmp/praline_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from __graft_entry__ import _example_batch
from praline_tpu import ALPHABET_AA, builtin_score_matrix
from praline_tpu.kernels import align_pairs_batched
from praline_tpu.kernels.fused_dp import wavefront_dp_fused
from praline_tpu.kernels.fused_scores import fused_skewed_scores
from praline_tpu.kernels.pallas_dp import wavefront_dp_pallas
from praline_tpu.kernels.scan import wavefront_dp
from praline_tpu.kernels.scores import quantized_dtype_for, skewed_pair_scores
from praline_tpu.oracle import align_profiles
from praline_tpu.types import Profile

rng = np.random.default_rng(0)
m = builtin_score_matrix("blosum62")
s = np.asarray(m.as_f32())

MODES = ("global", "semiglobal", "local")
SERIES = ((11, 1), (13, 7, 1))

# ---- compiled Pallas two-kernel + fused vs compiled scan: terminals+bits --
for mode in MODES:
    for gs in SERIES:
        cx, ivx, cy, ivy, _, _ = _example_batch(rng, B=5, Lx=61, Ly=144)
        lx = rng.integers(30, 62, size=5).astype(np.int32)
        ly = rng.integers(70, 145, size=5).astype(np.int32)
        args = tuple(map(jnp.asarray, (cx, ivx, cy, ivy, s)))
        hs = skewed_pair_scores(*args)
        want = wavefront_dp(hs, jnp.asarray(lx), jnp.asarray(ly),
                            gap_series=gs, mode=mode, traceback=True)
        hsf = fused_skewed_scores(*args)
        pal = wavefront_dp_pallas(
            hsf, jnp.asarray(lx), jnp.asarray(ly), gap_series=gs, mode=mode,
            traceback=True, hs_body=True, interpret=False,
        )
        fus = wavefront_dp_fused(
            *map(jnp.asarray, (cx, ivx, cy, ivy, s, lx, ly)),
            gap_series=gs, mode=mode, traceback=True, interpret=False,
        )
        hsb = fused_skewed_scores(*args, layout="bmajor")
        bmj = wavefront_dp_pallas(
            hsb, jnp.asarray(lx), jnp.asarray(ly), gap_series=gs, mode=mode,
            traceback=True, hs_body=True, hs_layout="bmajor", interpret=False,
        )
        tbw = np.asarray(want["tb"])
        for name, got in (("pallas", pal), ("fused", fus), ("bmajor", bmj)):
            for key in ("score", "ti", "tj", "tcode"):
                np.testing.assert_array_equal(
                    np.asarray(want[key]), np.asarray(got[key]),
                    err_msg=f"{name}/{mode}/{gs}:{key}")
            tbg = np.asarray(got["tb"])[: tbw.shape[0], :, : tbw.shape[2]]
            np.testing.assert_array_equal(tbw, tbg,
                                          err_msg=f"{name}/{mode}/{gs}:tb")
print("on-chip: pallas + fused vs scan bit parity OK (all modes x series)")

# ---- int8 one-hot scoring path vs scan ----
qd = quantized_dtype_for(float(np.abs(m.scores).max()))
assert qd is not None
for mode in MODES:
    toksx = rng.integers(0, 20, size=(4, 47)).astype(np.int32)
    toksy = rng.integers(0, 20, size=(4, 63)).astype(np.int32)
    cx = jax.nn.one_hot(toksx, 23, dtype=jnp.float32)
    cy = jax.nn.one_hot(toksy, 23, dtype=jnp.float32)
    ivx = jnp.ones((4, 47), jnp.float32)
    ivy = jnp.ones((4, 63), jnp.float32)
    lx = np.full(4, 47, np.int32)
    ly = np.full(4, 63, np.int32)
    hs = skewed_pair_scores(cx, ivx, cy, ivy, jnp.asarray(s))
    want = wavefront_dp(hs, jnp.asarray(lx), jnp.asarray(ly), mode=mode)
    hs8 = fused_skewed_scores(cx, ivx, cy, ivy, jnp.asarray(s),
                              out_dtype=qd, scaled=False)
    got = wavefront_dp_pallas(
        hs8, jnp.asarray(lx), jnp.asarray(ly), mode=mode, hs_body=True,
        interpret=False,
    )
    for key in ("score", "length", "ti", "tj"):
        np.testing.assert_array_equal(
            np.asarray(want[key]), np.asarray(got[key]),
            err_msg=f"int8/{mode}:{key}")
print("on-chip: int8 one-hot scoring parity OK")

# ---- fast MXU precision vs highest: exactness at the count bounds ----
# ADMISSIBLE data (the driver only routes "fast" for pairs that also pass
# oracle.score.check_exactness: tot_x * tot_y * max|S| < 2**24): counts up
# to 256 (bf16-exact limit), x-side totals pushed toward the 2**15/max|S|
# bound, y-side totals sized so the pair product stays admissible.  Under
# those bounds every partial sum is < 2**24, so "fast" (one DEFAULT T pass
# + a manual two-pass bf16 split for H) must match "highest" bit-for-bit
# (see fused_scores.fused_skewed_scores).  Inadmissible profiles never
# reach the kernel — check_exactness raises first.
max_s = float(np.abs(m.scores).max())
totx_cap = int(32767 // max_s)  # x totals near the 2**15 bound
toty_cap = int((2**24) // (totx_cap * max_s)) - 1  # pair stays admissible
B4, Lx4, Ly4, A4 = 4, 77, 90, 23
rng4 = np.random.default_rng(9)


def _heavy(Lz, cap):
    arr = np.zeros((B4, Lz, A4), np.float32)
    for b in range(B4):
        for pos in range(Lz):
            left = cap
            for a in rng4.permutation(A4)[:6]:
                v = int(min(256, rng4.integers(1, 257), left))
                arr[b, pos, a] = v
                left -= v
                if left <= 0:
                    break
    return arr


cx4 = _heavy(Lx4, totx_cap)
cy4 = _heavy(Ly4, toty_cap)
assert cx4.sum(-1).max() * cy4.sum(-1).max() * max_s < 2**24
iv4x = (1.0 / np.maximum(cx4.sum(-1), 1)).astype(np.float32)
iv4y = (1.0 / np.maximum(cy4.sum(-1), 1)).astype(np.float32)
args4 = tuple(map(jnp.asarray, (cx4, iv4x, cy4, iv4y, s)))
hs_hi = fused_skewed_scores(*args4, mxu_precision="highest")
hs_fast = fused_skewed_scores(*args4, mxu_precision="fast")
np.testing.assert_array_equal(np.asarray(hs_hi), np.asarray(hs_fast))
print("on-chip: fast MXU precision bit-equal at the count bounds")

# fast1 (round 5: single bf16 H pass) at ITS admission bound |T| <= 256:
# a count column of exactly 128 against a +/-2 score row makes |T| = 256.
cx41 = np.zeros((B4, Lx4, A4), np.float32)
cx41[:, :, :] = rng4.integers(0, 3, size=(B4, Lx4, A4))
cx41[:, :, 0] += 1.0
srow = int(np.argmax(np.abs(np.asarray(m.scores)).max(axis=1)))
cx41[0, 0, :] = 0.0
cx41[0, 0, srow] = float(int(256 // np.abs(np.asarray(m.scores))[srow].max()))
t41 = np.abs(cx41 @ np.asarray(m.scores, np.float64)).max()
assert t41 <= 256.0, t41
iv41 = (1.0 / np.maximum(cx41.sum(-1), 1)).astype(np.float32)
args41 = tuple(map(jnp.asarray, (cx41, iv41, cy4, iv4y, s)))
hs41_hi = fused_skewed_scores(*args41, mxu_precision="highest")
hs41_1 = fused_skewed_scores(*args41, mxu_precision="fast1")
np.testing.assert_array_equal(np.asarray(hs41_hi), np.asarray(hs41_1))
print("on-chip: fast1 (single-pass) MXU precision bit-equal at |T| bound")

# ---- batch API with on-device replay vs oracle, every mode ----
mk = lambda L: Profile.from_tokens(
    rng.integers(0, 20, size=L).astype(np.int32), ALPHABET_AA)
pairs = [(mk(40), mk(35)), (mk(120), mk(90)), (mk(12), mk(50))]
for mode in MODES:
    for gs in SERIES:
        got = align_pairs_batched(pairs, m, gs, mode, traceback=True,
                                  backend="pallas")
        for (px, py), r in zip(pairs, got):
            want = align_profiles(px, py, m, gs, mode)
            assert r.score == want.score, (mode, gs, r.score, want.score)
            assert (r.cols_x == want.cols_x).all(), (mode, gs)
            assert (r.cols_y == want.cols_y).all(), (mode, gs)
print("on-chip: batch API + device replay oracle parity OK (all modes)")

# ---- strip route (kernels.strip) vs scan, compiled: scores + traceback ----
import os as _os

from praline_tpu.kernels.strip import strip_dispatch_core, strip_stride

for mode in MODES:
    for gs in SERIES:
        B9, Lx9, Ly9 = 8, 61, 88
        K9 = strip_stride(Lx9, Ly9)
        cx, ivx, cy, ivy, _, _ = _example_batch(rng, B=B9, Lx=Lx9, Ly=Ly9)
        lx = rng.integers(30, Lx9 + 1, size=B9).astype(np.int32)
        ly = rng.integers(40, Ly9 + 1, size=B9).astype(np.int32)
        args = tuple(map(jnp.asarray, (cx, ivx, cy, ivy, s)))
        hs = skewed_pair_scores(*args)
        want = wavefront_dp(hs, jnp.asarray(lx), jnp.asarray(ly),
                            gap_series=gs, mode=mode)
        got = strip_dispatch_core(
            *args, jnp.asarray(lx), jnp.asarray(ly), K=K9, R=4,
            gap_series=gs, mode=mode, qd=None, interpret=False,
        )
        for key in ("score", "length"):
            np.testing.assert_array_equal(
                np.asarray(want[key]), np.asarray(got[key]),
                err_msg=f"strip/{mode}/{gs}:{key}")
# fast MXU precision through the STRIP producer: bit-equal to highest at
# admissible counts (same contract as the classic producer's check above).
from praline_tpu.kernels.fused_scores import fused_skewed_scores_strip

Ks = strip_stride(Lx4, Ly4)
hs_hi_s = fused_skewed_scores_strip(*args4, K=Ks, R=4, mxu_precision="highest")
hs_fast_s = fused_skewed_scores_strip(*args4, K=Ks, R=4, mxu_precision="fast")
np.testing.assert_array_equal(np.asarray(hs_hi_s), np.asarray(hs_fast_s))
print("on-chip: strip fast MXU precision bit-equal at the count bounds")

hs41_hi_s = fused_skewed_scores_strip(*args41, K=Ks, R=4, mxu_precision="highest")
hs41_1_s = fused_skewed_scores_strip(*args41, K=Ks, R=4, mxu_precision="fast1")
np.testing.assert_array_equal(np.asarray(hs41_hi_s), np.asarray(hs41_1_s))
print("on-chip: strip fast1 MXU precision bit-equal at |T| bound")

_os.environ["PRALINE_STRIP"] = "1"
try:
    for mode in MODES:
        got = align_pairs_batched(pairs, m, (11, 1), mode, traceback=True,
                                  backend="pallas", bucket_sizes=(127,))
        for (px, py), r in zip(pairs, got):
            want = align_profiles(px, py, m, (11, 1), mode)
            assert r.score == want.score, ("strip-tb", mode)
            assert (r.cols_x == want.cols_x).all(), ("strip-tb", mode)
            assert (r.cols_y == want.cols_y).all(), ("strip-tb", mode)
finally:
    _os.environ.pop("PRALINE_STRIP", None)
print("on-chip: strip route parity OK (scores + traceback, all modes)")
print("ONCHIP_PARITY_OK")
