"""Strip-packed wavefront parity (kernels.strip, SURVEY.md §5.2/§5.3):
the R-problems-per-lane-row scores kernel and its strip producer must be
bit-identical to the classic per-problem path across modes x gap series x
ragged lengths x layouts x quantization."""

import zlib

import jax.numpy as jnp
import numpy as np
import pytest

from praline_tpu import ALPHABET_AA, builtin_score_matrix
from praline_tpu.kernels.fused_scores import fused_skewed_scores_strip
from praline_tpu.kernels.scan import wavefront_dp
from praline_tpu.kernels.scores import skewed_pair_scores
from praline_tpu.kernels.strip import (
    strip_dispatch_core,
    strip_plan,
    strip_steps,
    strip_stride,
)

B62 = builtin_score_matrix("blosum62")
A = ALPHABET_AA.size

MODES = ["global", "semiglobal", "local"]
SERIES = [(11, 1), (3,), (5, 3, 1)]


def _counts(rng, B, L, max_count=3):
    c = rng.integers(0, max_count + 1, size=(B, L, A)).astype(np.float32)
    zero = c.sum(axis=2) == 0
    c[zero] += np.eye(A, dtype=np.float32)[0]
    tot = c.sum(axis=2)
    return c, (1.0 / tot).astype(np.float32)


def _workload(rng, B, bx, by):
    cx, inv_x = _counts(rng, B, bx)
    cy, inv_y = _counts(rng, B, by)
    lx = rng.integers(1, bx + 1, size=B).astype(np.int32)
    ly = rng.integers(1, by + 1, size=B).astype(np.int32)
    return cx, inv_x, cy, inv_y, lx, ly


def test_strip_producer_matches_classic_skew():
    rng = np.random.default_rng(7)
    B, bx, by, R = 8, 21, 30, 4
    K = strip_stride(bx, by)
    assert K == 128
    cx, inv_x, cy, inv_y, lx, ly = _workload(rng, B, bx, by)
    s = jnp.asarray(B62.as_f32())
    hs_ref = np.asarray(skewed_pair_scores(cx, inv_x, cy, inv_y, s))
    hs_strip = np.asarray(
        fused_skewed_scores_strip(cx, inv_x, cy, inv_y, s, K=K, R=R)
    )
    rows, Bs, LxT = hs_strip.shape
    assert Bs == B // R and LxT >= bx + 1
    assert rows >= strip_steps(bx + 1, K, R)
    # strip row d, lane i == classic row d_local (= local diag), problem p
    for p in range(B):
        slot, r = divmod(p, R)
        for d_local in range(2, bx + by + 1):
            d = r * K + d_local
            got = hs_strip[d, slot, : bx + 1]
            want = hs_ref[d_local, p, : bx + 1]
            # classic skew zeroes non-interior lanes; the strip producer
            # may hold neighbour-problem values there — compare interior
            i = np.arange(bx + 1)
            interior = (i >= 1) & (d_local - i >= 1) & (d_local - i <= by)
            assert np.array_equal(got[interior], want[interior]), (p, d_local)


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("gap_series", SERIES)
def test_strip_matches_classic_wavefront(mode, gap_series):
    rng = np.random.default_rng(zlib.crc32(repr((mode, gap_series)).encode()))
    B, bx, by, R = 16, 21, 25, 4
    K = strip_stride(bx, by)
    cx, inv_x, cy, inv_y, lx, ly = _workload(rng, B, bx, by)
    s = jnp.asarray(B62.as_f32())

    hs = skewed_pair_scores(cx, inv_x, cy, inv_y, s)
    want = wavefront_dp(hs, lx, ly, gap_series=gap_series, mode=mode)

    got = strip_dispatch_core(
        jnp.asarray(cx), jnp.asarray(inv_x), jnp.asarray(cy),
        jnp.asarray(inv_y), s, jnp.asarray(lx), jnp.asarray(ly),
        K=K, R=R, gap_series=gap_series, mode=mode, qd=None,
    )
    np.testing.assert_array_equal(np.asarray(got["score"]), np.asarray(want["score"]))
    np.testing.assert_array_equal(np.asarray(got["length"]), np.asarray(want["length"]))
    np.testing.assert_array_equal(np.asarray(got["ti"]), np.asarray(want["ti"]))
    np.testing.assert_array_equal(np.asarray(got["tj"]), np.asarray(want["tj"]))


@pytest.mark.parametrize("mode", ["global", "local"])
def test_strip_bmajor_layout_matches(mode):
    rng = np.random.default_rng(11)
    B, bx, by, R = 8, 17, 19, 4
    K = strip_stride(bx, by)
    cx, inv_x, cy, inv_y, lx, ly = _workload(rng, B, bx, by)
    s = jnp.asarray(B62.as_f32())
    hs = skewed_pair_scores(cx, inv_x, cy, inv_y, s)
    want = wavefront_dp(hs, lx, ly, gap_series=(11, 1), mode=mode)
    got = strip_dispatch_core(
        jnp.asarray(cx), jnp.asarray(inv_x), jnp.asarray(cy),
        jnp.asarray(inv_y), s, jnp.asarray(lx), jnp.asarray(ly),
        K=K, R=R, gap_series=(11, 1), mode=mode, qd=None, hs_layout="bmajor",
    )
    np.testing.assert_array_equal(np.asarray(got["score"]), np.asarray(want["score"]))
    np.testing.assert_array_equal(np.asarray(got["length"]), np.asarray(want["length"]))


@pytest.mark.parametrize("mode", MODES)
def test_strip_quantized_onehot_matches(mode):
    rng = np.random.default_rng(13)
    B, bx, by, R = 8, 21, 25, 4
    K = strip_stride(bx, by)
    toksx = rng.integers(0, 20, size=(B, bx)).astype(np.int32)
    toksy = rng.integers(0, 20, size=(B, by)).astype(np.int32)
    cx = np.eye(A, dtype=np.float32)[toksx]
    cy = np.eye(A, dtype=np.float32)[toksy]
    inv_x = np.ones((B, bx), np.float32)
    inv_y = np.ones((B, by), np.float32)
    lx = rng.integers(1, bx + 1, size=B).astype(np.int32)
    ly = rng.integers(1, by + 1, size=B).astype(np.int32)
    s = jnp.asarray(B62.as_f32())
    hs = skewed_pair_scores(cx, inv_x, cy, inv_y, s)
    want = wavefront_dp(hs, lx, ly, gap_series=(11, 1), mode=mode)
    got = strip_dispatch_core(
        jnp.asarray(cx), jnp.asarray(inv_x), jnp.asarray(cy),
        jnp.asarray(inv_y), s, jnp.asarray(lx), jnp.asarray(ly),
        K=K, R=R, gap_series=(11, 1), mode=mode, qd=jnp.int8,
    )
    np.testing.assert_array_equal(np.asarray(got["score"]), np.asarray(want["score"]))
    np.testing.assert_array_equal(np.asarray(got["length"]), np.asarray(want["length"]))


def test_strip_mass_ties_pin_tie_breaks():
    # All-equal scores manufacture maximal terminal ties: semiglobal must
    # keep larger i then larger j, local smaller i then smaller j.
    B, bx, by, R = 4, 9, 9, 4
    K = strip_stride(bx, by)
    cx = np.zeros((B, bx, A), np.float32)
    cx[:, :, 0] = 1.0
    cy = np.zeros((B, by, A), np.float32)
    cy[:, :, 0] = 1.0
    inv = np.ones((B, bx), np.float32)
    invy = np.ones((B, by), np.float32)
    lx = np.array([9, 5, 7, 3], np.int32)
    ly = np.array([9, 9, 4, 3], np.int32)
    s0 = np.zeros((A, A), np.float32)  # every column-pair scores 0
    for mode in ("semiglobal", "local"):
        hs = skewed_pair_scores(cx, inv, cy, invy, jnp.asarray(s0))
        want = wavefront_dp(hs, lx, ly, gap_series=(2, 1), mode=mode)
        got = strip_dispatch_core(
            jnp.asarray(cx), jnp.asarray(inv), jnp.asarray(cy),
            jnp.asarray(invy), jnp.asarray(s0), jnp.asarray(lx),
            jnp.asarray(ly), K=K, R=R, gap_series=(2, 1), mode=mode, qd=None,
        )
        for key in ("score", "length", "ti", "tj"):
            np.testing.assert_array_equal(
                np.asarray(got[key]), np.asarray(want[key]), err_msg=(mode, key)
            )


@pytest.mark.parametrize("mode", ["global", "semiglobal"])
def test_strip_routes_through_batch_api(mode, monkeypatch):
    # Force the pallas backend (interpret mode on CPU) at a shape the
    # planner admits: bucket (127, 127), B=128 -> K=128, R=4.
    from praline_tpu.kernels import align_pairs_batched
    from praline_tpu.oracle import align_profiles
    from praline_tpu.types import Profile

    monkeypatch.setenv("PRALINE_STRIP", "auto")
    rng = np.random.default_rng(23)
    profs = []
    for L in rng.integers(90, 128, size=40):
        c = rng.integers(0, 3, size=(int(L), A)).astype(np.float32)
        zero = c.sum(axis=1) == 0
        c[zero, 0] = 1.0
        profs.append(Profile(c, np.zeros(int(L), np.float32), ALPHABET_AA))
    pairs = [
        (profs[(3 * i) % 40], profs[(5 * i + 1) % 40]) for i in range(128)
    ]
    from praline_tpu.kernels.strip import strip_plan

    assert strip_plan(128, 127, 127, (11, 1)) == (128, 4)
    got = align_pairs_batched(
        pairs, B62, (11, 1), mode, bucket_sizes=(127,), batch_pairs=128,
        backend="pallas",
    )
    # spot-check a sample against the oracle (full 128 would crawl on CPU)
    for i in range(0, 128, 17):
        px, py = pairs[i]
        want = align_profiles(px, py, B62, (11, 1), mode)
        assert got[i].score == want.score, i
        assert got[i].length == want.length, i


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("gap_series", [(11, 1), (5, 3, 1)])
def test_strip_traceback_paths_match_oracle(mode, gap_series, monkeypatch):
    # Traceback dispatches take the strip too (device replay on the strip
    # bit layout); full paths must equal the oracle's exactly.
    from praline_tpu.kernels import align_pairs_batched
    from praline_tpu.oracle import align_profiles
    from praline_tpu.types import Profile

    monkeypatch.setenv("PRALINE_STRIP", "1")
    rng = np.random.default_rng(zlib.crc32(repr((mode, gap_series, "tb")).encode()))
    profs = []
    for L in rng.integers(3, 32, size=24):
        c = rng.integers(0, 3, size=(int(L), A)).astype(np.float32)
        zero = c.sum(axis=1) == 0
        c[zero, 0] = 1.0
        profs.append(Profile(c, np.zeros(int(L), np.float32), ALPHABET_AA))
    pairs = [(profs[(3 * i) % 24], profs[(5 * i + 1) % 24]) for i in range(16)]
    got = align_pairs_batched(
        pairs, B62, gap_series, mode, traceback=True,
        bucket_sizes=(31,), batch_pairs=16, backend="pallas",
    )
    for (px, py), r in zip(pairs, got):
        want = align_profiles(px, py, B62, gap_series, mode)
        assert r.score == want.score, (mode, gap_series)
        np.testing.assert_array_equal(r.cols_x, want.cols_x)
        np.testing.assert_array_equal(r.cols_y, want.cols_y)


def test_strip_batch_pad_path(monkeypatch):
    # 100 pairs pad to the 128 grid: pad repeats fill strip slots and their
    # outputs must be discarded cleanly.
    from praline_tpu.kernels import align_pairs_batched
    from praline_tpu.oracle import align_profiles
    from praline_tpu.types import Profile

    monkeypatch.setenv("PRALINE_STRIP", "1")
    rng = np.random.default_rng(31)
    profs = [
        Profile.from_tokens(
            rng.integers(0, 20, size=int(L)).astype(np.int32), ALPHABET_AA
        )
        for L in rng.integers(2, 31, size=30)
    ]
    pairs = [(profs[(7 * i) % 30], profs[(11 * i + 2) % 30]) for i in range(100)]
    got = align_pairs_batched(
        pairs, B62, (11, 1), "global", bucket_sizes=(31,), batch_pairs=128,
        backend="pallas",
    )
    for i in range(0, 100, 13):
        px, py = pairs[i]
        want = align_profiles(px, py, B62, (11, 1), "global")
        assert got[i].score == want.score, i
        assert got[i].length == want.length, i


def test_strip_plan_admission():
    # square big buckets profit; tiny or non-dividing batches do not
    # round 5: the R ladder extends to 64 — the largest packing whose
    # slot count still fills the machine (>=32 slots, or >=16 when
    # slots*K >= 16384 lanes/step; measured on the v5e, see strip_plan)
    assert strip_plan(1024, 1023, 1023, (11, 1)) == (1024, 64)
    assert strip_plan(512, 511, 511, (11, 1)) == (512, 16)
    assert strip_plan(128, 1023, 1023, (11, 1)) == (1024, 8)
    assert strip_plan(48, 1023, 1023, (11, 1)) is None  # no R divides
    assert strip_plan(32, 1023, 1023, (11, 1)) is None  # slots too few
    # skewed buckets already utilize lanes well -> no route
    assert strip_plan(1024, 127, 1023, (11, 1)) is None


@pytest.mark.parametrize("mode", MODES)
def test_strip_nonpow2_stride_matches(mode):
    """Non-pow2 slot strides (round 5: carried column clock) are bit-equal
    to the classic wavefront — and to the same problems at the old pow2
    stride."""
    rng = np.random.default_rng(zlib.crc32(repr(("np2", mode)).encode()))
    B, bx, by, R = 8, 280, 300, 4
    K = strip_stride(bx, by)
    assert K == 384 and K & (K - 1) != 0  # genuinely non-pow2
    cx, inv_x, cy, inv_y, lx, ly = _workload(rng, B, bx, by)
    s = jnp.asarray(B62.as_f32())

    hs = skewed_pair_scores(cx, inv_x, cy, inv_y, s)
    want = wavefront_dp(hs, lx, ly, gap_series=(11, 1), mode=mode)

    for K_run in (K, 512):  # tight non-pow2 stride and the pow2 fallback
        got = strip_dispatch_core(
            jnp.asarray(cx), jnp.asarray(inv_x), jnp.asarray(cy),
            jnp.asarray(inv_y), s, jnp.asarray(lx), jnp.asarray(ly),
            K=K_run, R=R, gap_series=(11, 1), mode=mode, qd=None,
        )
        np.testing.assert_array_equal(
            np.asarray(got["score"]), np.asarray(want["score"]), err_msg=str(K_run)
        )
        np.testing.assert_array_equal(
            np.asarray(got["length"]), np.asarray(want["length"])
        )
        np.testing.assert_array_equal(np.asarray(got["ti"]), np.asarray(want["ti"]))
        np.testing.assert_array_equal(np.asarray(got["tj"]), np.asarray(want["tj"]))


@pytest.mark.parametrize("mode", ["global", "semiglobal"])
def test_strip_nonpow2_traceback_paths(mode, monkeypatch):
    """Non-pow2 stride with device replay: full paths match the oracle."""
    from praline_tpu.kernels.replay import moves_to_result
    from praline_tpu.oracle import align_profiles
    from praline_tpu.types import Profile

    rng = np.random.default_rng(zlib.crc32(repr(("np2tb", mode)).encode()))
    B, bx, by, R = 8, 280, 300, 4
    K = strip_stride(bx, by)
    cx, inv_x, cy, inv_y, lx, ly = _workload(rng, B, bx, by)
    s = jnp.asarray(B62.as_f32())
    got = strip_dispatch_core(
        jnp.asarray(cx), jnp.asarray(inv_x), jnp.asarray(cy),
        jnp.asarray(inv_y), s, jnp.asarray(lx), jnp.asarray(ly),
        K=K, R=R, gap_series=(11, 1), mode=mode, qd=None, traceback=True,
    )
    moves = np.asarray(got["moves"])
    nmoves = np.asarray(got["nmoves"])
    for b in range(B):
        px = Profile(np.asarray(cx[b, : lx[b]]), np.zeros(lx[b], np.float32), ALPHABET_AA)
        py = Profile(np.asarray(cy[b, : ly[b]]), np.zeros(ly[b], np.float32), ALPHABET_AA)
        want = align_profiles(px, py, B62, (11, 1), mode)
        res = moves_to_result(
            moves[b], int(nmoves[b]), float(np.asarray(got["score"])[b]),
            int(np.asarray(got["ti"])[b]), int(np.asarray(got["tj"])[b]),
            int(lx[b]), int(ly[b]), mode,
        )
        assert res.score == want.score, (b, mode)
        np.testing.assert_array_equal(res.cols_x, want.cols_x)
        np.testing.assert_array_equal(res.cols_y, want.cols_y)


def test_strip_nonpow2_through_batch_api(monkeypatch):
    """User bucket sizes that are not pow2-1 route through the strip with
    the tight non-pow2 stride (round 5) — full driver path, oracle
    parity."""
    from praline_tpu.kernels import align_pairs_batched
    from praline_tpu.kernels import strip as strip_mod
    from praline_tpu.oracle import align_profiles
    from praline_tpu.types import Profile

    monkeypatch.setenv("PRALINE_STRIP", "1")
    rng = np.random.default_rng(55)
    seen = []
    real = strip_mod.strip_dispatch_core

    def spy(*a, **k):
        seen.append(k.get("K"))
        return real(*a, **k)

    monkeypatch.setattr(strip_mod, "strip_dispatch_core", spy)
    # bucket 300 -> Lp=301 -> K=384 (not a power of two)
    profs = []
    for L in rng.integers(250, 301, size=12):
        c = rng.integers(0, 3, size=(int(L), A)).astype(np.float32)
        zero = c.sum(axis=1) == 0
        c[zero, 0] = 1.0
        profs.append(Profile(c, np.zeros(int(L), np.float32), ALPHABET_AA))
    pairs = [(profs[i % 12], profs[(5 * i + 1) % 12]) for i in range(8)]
    got = align_pairs_batched(
        pairs, B62, (11, 1), "global", bucket_sizes=(300,), batch_pairs=8,
        backend="pallas",
    )
    assert seen and seen[0] == 384 and (seen[0] & (seen[0] - 1)) != 0
    for (px, py), r in zip(pairs, got):
        want = align_profiles(px, py, B62, (11, 1), "global")
        assert r.score == want.score
        assert r.length == want.length


@pytest.mark.parametrize("mode", MODES)
def test_strip_opt_forms_agree(mode):
    """The round-4 kernel form (opt=False, the PRALINE_STRIP_OPT=0 A/B
    baseline) and the round-5 shaved form produce identical outputs."""
    rng = np.random.default_rng(zlib.crc32(repr(("opt", mode)).encode()))
    B, bx, by, R = 8, 21, 25, 4
    K = strip_stride(bx, by)
    cx, inv_x, cy, inv_y, lx, ly = _workload(rng, B, bx, by)
    s = jnp.asarray(B62.as_f32())
    outs = [
        strip_dispatch_core(
            jnp.asarray(cx), jnp.asarray(inv_x), jnp.asarray(cy),
            jnp.asarray(inv_y), s, jnp.asarray(lx), jnp.asarray(ly),
            K=K, R=R, gap_series=(11, 1), mode=mode, qd=None, opt=opt,
        )
        for opt in (True, False)
    ]
    for key in ("score", "length", "ti", "tj"):
        np.testing.assert_array_equal(
            np.asarray(outs[0][key]), np.asarray(outs[1][key]), err_msg=key
        )


@pytest.mark.parametrize("seed", range(4))
def test_strip_shape_fuzz_vs_scan(seed, monkeypatch):
    """Randomized strip shapes (bucket geometry, R, mode, series — pow2
    and non-pow2 strides mixed) against the scan kernel: a cheap guard
    for seam/harvest/clock edge cases the fixed-shape tests miss."""
    monkeypatch.setenv("PRALINE_STRIP", "1")
    rng = np.random.default_rng(1000 + seed)
    mode = ["global", "semiglobal", "local"][seed % 3]
    gap_series = [(11, 1), (3,), (5, 3, 1)][(seed // 3) % 3]
    bx = int(rng.integers(8, 200))
    by = int(rng.integers(8, 200))
    R = int(rng.choice([2, 4, 8]))
    B = R * int(rng.integers(2, 5))
    K = strip_stride(bx, by)
    cx, inv_x, cy, inv_y, lx, ly = _workload(rng, B, bx, by)
    s = jnp.asarray(B62.as_f32())
    hs = skewed_pair_scores(cx, inv_x, cy, inv_y, s)
    want = wavefront_dp(hs, lx, ly, gap_series=gap_series, mode=mode)
    got = strip_dispatch_core(
        jnp.asarray(cx), jnp.asarray(inv_x), jnp.asarray(cy),
        jnp.asarray(inv_y), s, jnp.asarray(lx), jnp.asarray(ly),
        K=K, R=R, gap_series=gap_series, mode=mode, qd=None,
    )
    ctx = (seed, mode, gap_series, bx, by, R, K)
    np.testing.assert_array_equal(
        np.asarray(got["score"]), np.asarray(want["score"]), err_msg=str(ctx)
    )
    np.testing.assert_array_equal(
        np.asarray(got["length"]), np.asarray(want["length"]), err_msg=str(ctx)
    )
