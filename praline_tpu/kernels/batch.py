"""Batched pairwise-alignment driver: bucketing, padding, dispatch, unpack.

The reference runs its O(N^2) pairwise stage as a serial Python loop
(SURVEY.md C15 [B:5 "all-pairs scheduling (serial -> ...)"]); here arbitrary
collections of profile pairs are length-bucketed, padded, and dispatched to
the batched wavefront DP (kernels.scan / kernels.pallas_dp) so thousands of
problems run data-parallel per chip.  Padding is score-neutral by
construction: padded cells can never reach a terminal extracted at the true
lengths (SURVEY.md §9 hard part 3).

Degenerate problems (an empty side) route to the oracle's closed form.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence as Seq

import numpy as np

from ..types import Profile, ScoreMatrix
from ..oracle.align import AlignResult, _degenerate
from ..oracle.score import (
    EXACT_DOT_LIMIT,
    check_exactness,
    column_inverses,
    pair_score_matrix,
)
from ..util.metrics import annotate
from .replay import moves_to_result, replay_moves
from .traceback import replay_traceback


@dataclasses.dataclass(frozen=True)
class PairResult:
    """Scores-only result of one batched pairwise DP."""

    score: float
    length: float
    ti: int
    tj: int


def _fused_dp_enabled() -> bool:
    """Routing gate for the fully fused producer+DP scores kernel.

    Bit-parity with the two-kernel path is verified both CPU-side (tests)
    and COMPILED ON CHIP (tools/onchip_parity.py, PRALINE_PERF gate:
    terminals + tb bits, all modes/gap series). Re-measured in round 3
    AFTER the 3-state collapse: fused is still 21% slower in scores mode
    (3.40 vs 4.29e9 cells/s at B=1024 L=1023) and ~equal in traceback mode
    (0.48 vs 0.49e9) — its BBLK=8 batch block starves the DP half, and the
    DMA-shaped producer + hs_body DP pipeline better as two kernels.
    Default is therefore OFF on TPU (two-kernel wins) and ON elsewhere
    (keeps the fused path under test coverage); PRALINE_FUSED_DP=0/1
    overrides."""
    import os

    import jax

    v = os.environ.get("PRALINE_FUSED_DP")
    if v is not None:
        return v == "1"
    return jax.default_backend() != "tpu"


def _dispatch_core(cx, inv_x, cy, inv_y, s, lx, ly, *, gap_series, mode,
                   traceback, backend, qd, replay, mxp="highest"):
    """Score producer + wavefront DP (+ on-device traceback replay) — the
    shared body of every batched dispatch, traced inside one jit so each
    batch costs a single executable and a single round trip."""
    import jax.numpy as jnp

    from .fused_dp import max_lanes_fused, wavefront_dp_fused
    from .fused_scores import fused_skewed_scores
    from .pallas_dp import wavefront_dp_pallas
    from .scan import wavefront_dp
    from .scores import skewed_pair_scores

    import os as _os

    strip = None
    if backend == "pallas" and (not traceback or replay):
        # Strip-packed route (kernels.strip): R problems per lane-row lift
        # square-bucket lane utilization from ~50% to ~94% and halve the
        # hs (and traceback-bit) tensors.  Traceback dispatches qualify
        # when they replay on device (the strip bit layout never leaves the
        # jit).  Admitted when the bucket shape profits (strip_plan);
        # PRALINE_STRIP=0 disables, =1 forces when admissible.
        from .strip import strip_plan

        sv = _os.environ.get("PRALINE_STRIP", "auto")
        if sv != "0":
            strip = strip_plan(
                cx.shape[0], cx.shape[1], cy.shape[1], gap_series,
                force=sv == "1",
            )
    if strip is not None:
        from .strip import strip_dispatch_core

        hs_layout = _os.environ.get(
            "PRALINE_HS_LAYOUT", "bmajor" if qd is None else "dmajor"
        )
        K, R = strip
        return strip_dispatch_core(
            cx, inv_x, cy, inv_y, s, lx, ly, K=K, R=R,
            gap_series=gap_series, mode=mode, qd=qd, mxp=mxp,
            hs_layout=hs_layout, traceback=traceback,
        )
    if backend == "pallas" and _fused_dp_enabled() and (
        -(-(cx.shape[1] + 1) // 128) * 128
        <= max_lanes_fused(gap_series, not traceback, traceback)
    ):
        # The fully fused producer+DP kernel: the skewed score tensor
        # never touches HBM (kernels.fused_dp); traceback bits stream out
        # per band exactly as in the two-kernel path.
        out = wavefront_dp_fused(
            cx, inv_x, cy, inv_y, s, lx, ly,
            gap_series=gap_series, mode=mode, traceback=traceback,
        )
    elif backend == "pallas":
        # b-major hs (round 4): transpose-free producer + resident
        # self-tiles — +12-14% producer, +3-4% end to end on the v5e
        # (tools/onchip_hslayout.py), bit-identical.  int8/int16 hs stays
        # d-major: narrow dtypes would force a 32-step DP unroll (sublane
        # granularity).  PRALINE_HS_LAYOUT overrides for A/B.
        import os as _os

        hs_layout = _os.environ.get(
            "PRALINE_HS_LAYOUT", "bmajor" if qd is None else "dmajor"
        )
        hs = fused_skewed_scores(
            cx, inv_x, cy, inv_y, s,
            out_dtype=qd if qd is not None else jnp.float32,
            scaled=qd is None,
            mxu_precision=mxp,
            layout=hs_layout,
        )
        # unroll stays 1 on the d-major path: 8 diagonals per Mosaic grid
        # step gains +6% on the bare two-kernel (tools/onchip_unroll.py)
        # but its VMEM cost halves the batch block (b-major forces 8 by
        # sublane granularity and still wins through the producer).
        out = wavefront_dp_pallas(
            hs, lx, ly, gap_series=gap_series, mode=mode,
            traceback=traceback, hs_body=True, hs_layout=hs_layout,
        )
    else:
        hs = skewed_pair_scores(cx, inv_x, cy, inv_y, s)
        out = wavefront_dp(
            hs, lx, ly, gap_series=gap_series, mode=mode, traceback=traceback
        )
    if replay:
        moves, nmoves = replay_moves(
            out["tb"], out["ti"], out["tj"], out["tcode"],
            gap_series=gap_series, mode=mode,
            steps=cx.shape[1] + cy.shape[1],
        )
        out = {k: v for k, v in out.items() if k != "tb"}
        out["moves"] = moves
        out["nmoves"] = nmoves
    return out


def _gather_side(stack, inv, lens, idx, *, onehot, A):
    """Expand one side of an indexed batch on device: token rows one-hot to
    count tensors (pad token A -> zero column), narrow integer counts widen
    to f32."""
    import jax
    import jax.numpy as jnp

    l = jnp.take(lens, idx)
    if onehot:
        toks = jnp.take(stack, idx, axis=0).astype(jnp.int32)
        c = jax.nn.one_hot(toks, A, dtype=jnp.float32)
        iv = jnp.ones(c.shape[:2], jnp.float32)
    else:
        c = jnp.take(stack, idx, axis=0).astype(jnp.float32)
        iv = jnp.take(inv, idx, axis=0)
    return c, iv, l


def indexed_dispatch_body(sx, ivx, lensx, sy, ivy, lensy, ix, iy, s, *,
                          gap_series, mode, traceback, backend, qd, replay,
                          onehot_x, onehot_y, A, mxp="highest"):
    """Gather-sides + dispatch core: the traced body shared by the
    single-device indexed jit and the sharded mesh dispatch
    (dist.allpairs.sharded_indexed_dispatch)."""
    cx, d_ivx, lx = _gather_side(sx, ivx, lensx, ix, onehot=onehot_x, A=A)
    cy, d_ivy, ly = _gather_side(sy, ivy, lensy, iy, onehot=onehot_y, A=A)
    return _dispatch_core(
        cx, d_ivx, cy, d_ivy, s, lx, ly,
        gap_series=gap_series, mode=mode, traceback=traceback,
        backend=backend, qd=qd, replay=replay, mxp=mxp,
    )


@functools.lru_cache(maxsize=1)
def _indexed_jit():
    """Indexed dispatch: problems are (ix, iy) rows into device-resident
    profile stacks, so each distinct profile crosses the host->device link
    exactly ONCE per stage instead of once per pair — the all-pairs stage
    ships O(N) profiles + O(N^2) int32 indices instead of O(N^2) padded
    count tensors (the round-1 transfer bottleneck).  One-hot stacks ship as
    token arrays (A-times smaller) and expand on device; integer count
    stacks ship narrow (uint8/uint16) and widen on device."""
    import jax

    return jax.jit(
        indexed_dispatch_body,
        static_argnames=(
            "gap_series", "mode", "traceback", "backend", "qd", "replay",
            "onehot_x", "onehot_y", "A", "mxp",
        ),
    )


@functools.lru_cache(maxsize=1)
def _indexed_multi_jit():
    """Super-dispatch: n_sub sub-batches of the indexed body run inside ONE
    jit via ``lax.scan`` — each iteration's transient hs tensor is freed
    before the next, so the HBM budget stays per-sub-batch while the
    per-dispatch relay round trip (~29 ms measured on the v5e,
    tools/onchip_superdispatch.py) is paid once for the whole group.
    Outputs gain a leading (n_sub,) axis."""
    import jax

    @functools.partial(
        jax.jit,
        static_argnames=(
            "gap_series", "mode", "traceback", "backend", "qd", "replay",
            "onehot_x", "onehot_y", "A", "mxp",
        ),
    )
    def run(sx, ivx, lensx, sy, ivy, lensy, ix2, iy2, s, *, gap_series, mode,
            traceback, backend, qd, replay, onehot_x, onehot_y, A,
            mxp="highest"):
        def body(_, xs):
            ix, iy = xs
            out = indexed_dispatch_body(
                sx, ivx, lensx, sy, ivy, lensy, ix, iy, s,
                gap_series=gap_series, mode=mode, traceback=traceback,
                backend=backend, qd=qd, replay=replay,
                onehot_x=onehot_x, onehot_y=onehot_y, A=A, mxp=mxp,
            )
            return 0, out

        _, outs = jax.lax.scan(body, 0, (ix2, iy2))
        return outs

    return run


# Sub-batch grid for super-dispatch groups (largest first, greedy).
SUPER_DISPATCH_GRID = (8, 4, 2)


@functools.lru_cache(maxsize=1)
def _streamed_jit():
    """Oversized-x dispatch: the streamed-producer scan (no hs tensor, no
    VMEM lane state) with optional on-device move replay — the route for
    problems past the Pallas lane ceiling or the materialized producer's
    HBM budget (SURVEY.md §6 long-context row)."""
    import jax

    @functools.partial(
        jax.jit, static_argnames=("gap_series", "mode", "traceback", "replay")
    )
    def run(cx, inv_x, cy, inv_y, s, lx, ly, *, gap_series, mode, traceback,
            replay):
        from .replay import replay_moves
        from .scan import wavefront_dp_streamed

        out = wavefront_dp_streamed(
            cx, inv_x, cy, inv_y, s, lx, ly,
            gap_series=gap_series, mode=mode, traceback=traceback,
        )
        if replay:
            moves, nmoves = replay_moves(
                out["tb"], out["ti"], out["tj"], out["tcode"],
                gap_series=gap_series, mode=mode,
                steps=cx.shape[1] + cy.shape[1],
            )
            out = {k: v for k, v in out.items() if k != "tb"}
            out["moves"] = moves
            out["nmoves"] = nmoves
        return out

    return run


def _lane_cap(gap_series, traceback) -> int:
    from .pallas_dp import max_lanes

    return max_lanes(tuple(gap_series), traceback)


# Routing budgets for oversized problems (bytes, per problem):
# a materialized skewed hs tensor beyond this routes to the streamed
# producer, and a traceback-bit tensor beyond it routes to the native
# C++ kernel on the host (exact-parity twin) instead of the device.
HS_BYTES_BUDGET = 1 << 30
TB_BYTES_BUDGET = 1 << 31
# Whole-dispatch HBM budget: batch sizes shrink (snapped to the batch
# grid, so no new executable shapes) until hs/tb for the dispatch fit.
# 11 GiB of a v5e's 16 GiB HBM: wide enough for the B=1024, L~1023
# dispatch (hs 8.6 GB + tb bits 2.1 GB transient — validated on chip),
# leaving headroom for operands and XLA workspace.  Wider dispatches
# matter on remote runtimes where each dispatch costs ~80 ms of relay
# round-trip regardless of size (measured: B=512 -> 2.5e9 cells/s,
# B=1024 -> 3.4e9 on the same workload).
DISPATCH_BYTES_BUDGET = 11 << 30
# The constants above are sized against a v5e's 16 GiB HBM; on devices
# that report a different capacity they scale proportionally
# (VERDICT r2 weak #2: other TPU generations would otherwise mis-size).
_ASSUMED_HBM = 16 << 30


@functools.lru_cache(maxsize=1)
def device_memory_bytes() -> int | None:
    """Accelerator memory of the default device, or None when the runtime
    does not report it (the axon relay's memory_stats() returns None, as
    do CPU test devices) — callers then fall back to the v5e constants."""
    import jax

    try:
        dev = jax.devices()[0]
        if dev.platform == "cpu":
            return None  # CPU tests: keep routing deterministic
        stats = dev.memory_stats() if hasattr(dev, "memory_stats") else None
    except Exception:
        return None
    if not stats:
        return None
    for key in ("bytes_limit", "bytes_reservable_limit"):
        v = stats.get(key)
        if v:
            return int(v)
    return None


def _scaled_budget(fallback: int) -> int:
    """Scale a v5e-sized byte budget by the actual device memory when the
    runtime reports it; the constant itself otherwise.  Reads the module
    global at call time so tests can monkeypatch the constants."""
    mem = device_memory_bytes()
    if mem is None:
        return fallback
    return int(fallback * (mem / _ASSUMED_HBM))


def per_problem_bytes(bx: int, by: int) -> tuple[int, int]:
    """(hs_bytes, tb_bytes) for ONE (bucket_x, bucket_y) problem: the
    materialized skewed f32 score tensor and the uint8 traceback-bit
    tensor.  The dispatcher's routing/batch-cap logic and the batch-grid
    tests share this formula (ADVICE r2: a hand-copied estimate in the
    test would silently go stale)."""
    Lp = bx + 1
    return (bx + by + 1) * Lp * 4, (bx + by - 1) * Lp


def _grid_step(b: int) -> int:
    """Next batch-grid size: powers of four to 512, then powers of two.

    The coarse pow4 grid bounds executable-shape variants for the ragged
    small-batch tail (each new executable costs seconds of upload/init on
    remote runtimes); pow2 steps at the top end let the widest dispatches
    land near the HBM budget, where dispatch-latency amortization pays.
    """
    return b * 4 if b < 512 else b * 2


def _snap_batch(cap: int, batch_pairs: int) -> int:
    """Largest grid batch (32, 128, 512, 1024, 2048, ...) <= min(cap,
    batch_pairs); below the grid floor, the exact cap."""
    if cap < 32:
        return max(1, min(cap, batch_pairs))
    b = 32
    while _grid_step(b) <= min(cap, batch_pairs):
        b = _grid_step(b)
    return min(b, batch_pairs)


def composite_dispatch_body(sxs, ivxs, lensx, sys_, ivys, lensy, ix, iy,
                            ss, *, gap_series, mode, traceback, weights,
                            steps, mxp="highest"):
    """Indexed multi-track dispatch body: per-track profile stacks live on
    device, a chunk ships two int32 index vectors, and the composite
    skewed score tensor accumulates per track with PINNED rounding — the
    per-track weighted terms stack across a ``lax.scan`` boundary (a real
    buffer across the while loop), so XLA cannot FMA-contract a term's
    multiply into the running add (the exact hazard
    kernels.scores.composite_skewed_scores documents).  Traceback replays
    on device in every mode (bit 7 carries the local stop rule).  Shared
    by the single-device jit and the sharded mesh path
    (dist.allpairs.sharded_tracks_dispatch)."""
    import os as _os

    import jax
    import jax.numpy as jnp

    from .scan import wavefront_dp
    from .scores import skewed_pair_scores

    lx = jnp.take(lensx, ix)
    ly = jnp.take(lensy, iy)

    # Strip route (round 5): composites ride the strip-packed wavefront
    # like single-track dispatches — per-track STRIP producers, the same
    # scan-boundary weighted accumulation (per-element values and rounding
    # order are layout-independent, so the composite stays bit-identical
    # to oracle.align_tracksets), strip DP + strip-aware device replay.
    # Previously tracksets ran the XLA gather producer + scan kernel.
    strip = None
    if _os.environ.get("PRALINE_STRIP", "auto") != "0":
        from .strip import strip_plan

        strip = strip_plan(
            ix.shape[0], sxs[0].shape[1], sys_[0].shape[1], gap_series,
            force=_os.environ.get("PRALINE_STRIP") == "1",
        )

    def _term(t, w, producer):
        cx = jnp.take(sxs[t], ix, axis=0).astype(jnp.float32)
        ivx = jnp.take(ivxs[t], ix, axis=0)
        cy = jnp.take(sys_[t], iy, axis=0).astype(jnp.float32)
        ivy = jnp.take(ivys[t], iy, axis=0)
        return jnp.float32(w) * producer(cx, ivx, cy, ivy, ss[t])

    def _accumulate(terms):
        if len(terms) == 1:
            return terms[0]
        # Accumulate in track order through a scan: each add rounds on
        # a materialized term, bit-identical to the per-op-dispatch
        # oracle accumulation.
        hs, _ = jax.lax.scan(
            lambda acc, term: (acc + term, None),
            terms[0], jnp.stack(terms[1:]),
        )
        return hs

    if strip is not None:
        from .fused_scores import fused_skewed_scores_strip
        from .strip import strip_run_from_hs

        K, R = strip
        hs = _accumulate([
            _term(t, w, lambda cx, ivx, cy, ivy, s: fused_skewed_scores_strip(
                cx, ivx, cy, ivy, s, K=K, R=R, mxu_precision=mxp))
            for t, w in enumerate(weights)
        ])
        return strip_run_from_hs(
            hs, lx, ly, K=K, R=R, gap_series=gap_series, mode=mode,
            traceback=traceback, steps=steps,
        )

    hs = _accumulate([
        _term(t, w, skewed_pair_scores) for t, w in enumerate(weights)
    ])
    out = wavefront_dp(
        hs, lx, ly, gap_series=gap_series, mode=mode, traceback=traceback
    )
    if traceback:
        moves, nmoves = replay_moves(
            out["tb"], out["ti"], out["tj"], out["tcode"],
            gap_series=gap_series, mode=mode, steps=steps,
        )
        out = {k: v for k, v in out.items() if k != "tb"}
        out["moves"] = moves
        out["nmoves"] = nmoves
    return out


@functools.lru_cache(maxsize=1)
def _composite_indexed_jit():
    import jax

    return jax.jit(
        composite_dispatch_body,
        static_argnames=("gap_series", "mode", "traceback", "weights", "steps",
                         "mxp"),
    )


@functools.lru_cache(maxsize=1)
def _composite_multi_jit():
    """Trackset super-dispatch: lax.scan of n_sub sub-batches of the
    composite body in one jit (same latency amortization as
    _indexed_multi_jit); outputs gain a leading (n_sub,) axis."""
    import jax

    @functools.partial(
        jax.jit,
        static_argnames=("gap_series", "mode", "traceback", "weights", "steps",
                         "mxp"),
    )
    def run(sxs, ivxs, lensx, sys_, ivys, lensy, ix2, iy2, ss, *, gap_series,
            mode, traceback, weights, steps, mxp="highest"):
        def body(_, xs):
            ix, iy = xs
            return 0, composite_dispatch_body(
                sxs, ivxs, lensx, sys_, ivys, lensy, ix, iy, ss,
                gap_series=gap_series, mode=mode, traceback=traceback,
                weights=weights, steps=steps, mxp=mxp,
            )

        _, outs = jax.lax.scan(body, 0, (ix2, iy2))
        return outs

    return run


def align_tracksets_batched(
    pairs,
    matrices,
    weights,
    gap_series: tuple[int, ...],
    mode: str,
    *,
    traceback: bool = False,
    bucket_sizes: tuple[int, ...] = (63, 127, 255, 511, 1023, 2047),
    batch_pairs: int = 256,
    mesh=None,
) -> list:
    """Batched MULTI-TRACK composite alignment (SURVEY.md C4, §8.1).

    ``pairs`` is a list of ``(tracks_x, tracks_y)`` where each side is a
    tuple of parallel :class:`Profile` tracks (equal lengths per side);
    column score = sum_t weights[t] * score_t — the reference's composite
    score function (e.g. amino-acid + secondary-structure tracks).

    First-class since round 3 (VERDICT r2 item 8): tracksets ride the same
    machinery as the single-track hot path — length BUCKETING with padded
    per-track device stacks uploaded once per stage, INDEXED dispatch (a
    chunk ships two int32 vectors), batch-grid padding, on-device
    traceback replay in every mode, and an async in-flight queue.  Results
    stay bit-identical to ``oracle.align_tracksets`` per pair (rounding of
    the composite accumulation is pinned; see _composite_indexed_jit).
    """
    import jax
    import jax.numpy as jnp

    T = len(matrices)
    if len(weights) != T:
        raise ValueError("matrices and weights must align")
    if T == 0:
        raise ValueError("need at least one track")

    results: list = [None] * len(pairs)
    # Register distinct tracksets by identity (one stack row per side).
    # Keyed by the FULL tuple of track identities: two tracksets sharing the
    # same first-track Profile but differing in another track (e.g. one
    # amino-acid profile paired with two different secondary-structure
    # tracks) must get distinct rows (ADVICE r3).  ``reg`` keeps a reference
    # to every registered trackset, so the ids stay valid for the call.
    reg_pos: dict[tuple[int, ...], int] = {}
    reg: list[tuple] = []

    def _reg(ts) -> int:
        key = tuple(id(p) for p in ts)
        k = reg_pos.get(key)
        if k is None:
            k = len(reg)
            reg_pos[key] = k
            reg.append(tuple(ts))
        return k

    # Same predicate as oracle.score.check_exactness, on per-profile
    # cached totals (round 5: the per-pair x per-track numpy scans were
    # ~200 ms of HOST time per 1024-pair dispatch —
    # tools/onchip_tracks_split.py located the tail).
    max_s_t = [float(np.abs(np.asarray(m.scores)).max(initial=0.0))
               for m in matrices]
    tot_cache: dict[int, float] = {}

    def _tot(p) -> float:
        v = tot_cache.get(id(p))
        if v is None:
            v = float(p.counts.sum(axis=1).max(initial=0.0))
            tot_cache[id(p)] = v
        return v

    groups: dict[tuple[int, int], list[int]] = {}
    pair_reg: list[tuple[int, int] | None] = [None] * len(pairs)
    for idx, (txs, tys) in enumerate(pairs):
        if len(txs) != T or len(tys) != T:
            raise ValueError("every pair needs one profile per track")
        Lx, Ly = txs[0].length, tys[0].length
        if any(p.length != Lx for p in txs) or any(p.length != Ly for p in tys):
            raise ValueError("parallel tracks must have equal lengths per side")
        if Lx == 0 or Ly == 0:
            r = _degenerate(Lx, Ly, gap_series, mode)
            results[idx] = r if traceback else PairResult(
                r.score, float(r.length), Lx, Ly
            )
            continue
        for px, py, m, ms in zip(txs, tys, matrices, max_s_t):
            if _tot(px) * _tot(py) * ms >= EXACT_DOT_LIMIT:
                check_exactness(px, py, m)  # raises with the full message
        pair_reg[idx] = (_reg(txs), _reg(tys))
        key = (_bucket(Lx, bucket_sizes), _bucket(Ly, bucket_sizes))
        groups.setdefault(key, []).append(idx)

    ss = tuple(jnp.asarray(m.as_f32()) for m in matrices)
    w = tuple(float(x) for x in weights)

    # MXU tier for the strip producers, provably bit-identical to
    # "highest" (see fast_mxu_tier): computed over EVERY registered
    # trackset per track (a superset of each dispatch's x/y sides, so the
    # per-side bounds hold a fortiori).  The XLA fallback path ignores it.
    import os as _os

    def _tracks_mxp() -> str:
        if _os.environ.get("PRALINE_MXU_PRECISION", "auto") == "highest":
            return "highest"
        if not reg:
            return "highest"
        tier = "fast1"
        for t, m in enumerate(matrices):
            sarr = np.asarray(m.scores, np.float64)
            max_s = float(np.abs(sarr).max(initial=0.0))
            if not (np.all(sarr == np.rint(sarr)) and max_s <= 256):
                return "highest"
            profs_t = [ts[t] for ts in reg]
            if not all(
                bool(np.all(p.counts == np.rint(p.counts))) for p in profs_t
            ):
                return "highest"
            cmax = max(float(p.counts.max(initial=0.0)) for p in profs_t)
            mt = max(
                (float(p.counts.sum(axis=1).max(initial=0.0)) for p in profs_t),
                default=1.0,
            )
            if not (
                cmax <= 256
                and mt * max_s < 32768
                and mt * mt * max_s + 64.0 * mt < float(2**24)
            ):
                return "highest"
            if tier == "fast1":
                tmax = max(
                    float(np.abs(
                        np.asarray(p.counts, np.float64) @ sarr
                    ).max(initial=0.0))
                    for p in profs_t
                )
                if tmax > 256.0:
                    tier = "fast"
        return tier

    tracks_mxp = _tracks_mxp()

    # Per-(bucket, side-set) padded track stacks, built once per call.
    stack_cache: dict[tuple[int, tuple[int, ...]], tuple] = {}

    def _stacks(b: int, ids: tuple[int, ...]):
        st = stack_cache.get((b, ids))
        if st is None:
            rows = 32
            while rows < len(ids):
                rows *= 2
            lens = np.ones(rows, np.int32)
            per_track_c, per_track_iv = [], []
            for t in range(T):
                profs = [reg[u][t] for u in ids]
                c, iv = _pad_counts(profs, b)
                if rows > len(profs):
                    c = np.concatenate(
                        [c, np.zeros((rows - len(profs), b, c.shape[2]), c.dtype)]
                    )
                    iv = np.concatenate(
                        [iv, np.ones((rows - len(profs), b), iv.dtype)]
                    )
                per_track_c.append(jnp.asarray(c))
                per_track_iv.append(jnp.asarray(iv))
            lens[: len(ids)] = [reg[u][0].length for u in ids]
            st = (
                tuple(per_track_c), tuple(per_track_iv), jnp.asarray(lens),
                lens, {u: r for r, u in enumerate(ids)},
            )
            stack_cache[(b, ids)] = st
        return st

    in_flight: list = []

    def _unpack_tracks(chunk, lx, ly, out) -> None:
        score = np.asarray(out["score"])
        length = np.asarray(out["length"])
        ti = np.asarray(out["ti"])
        tj = np.asarray(out["tj"])
        if mode == "semiglobal":
            length = length + (lx - ti) + (ly - tj)
        if traceback:
            for b, idx in enumerate(chunk):
                results[idx] = moves_to_result(
                    np.asarray(out["moves"])[b],
                    int(np.asarray(out["nmoves"])[b]),
                    float(score[b]), int(ti[b]), int(tj[b]),
                    int(lx[b]), int(ly[b]), mode,
                )
        else:
            # tolist() once per array (round 5: per-element np-scalar
            # conversions are milliseconds per thousand pairs)
            sc = score.tolist()
            ln = np.asarray(length).tolist()
            tis = ti.tolist()
            tjs = tj.tolist()
            for b, idx in enumerate(chunk):
                results[idx] = PairResult(sc[b], ln[b], tis[b], tjs[b])

    def drain(limit: int) -> None:
        while len(in_flight) > limit:
            chunk, lx, ly, out = in_flight.pop(0)
            out = jax.device_get(out)
            if isinstance(chunk[0], list):  # super-dispatch group
                for t, (sub, slx, sly) in enumerate(zip(chunk, lx, ly)):
                    _unpack_tracks(sub, slx, sly,
                                   {k: v[t] for k, v in out.items()})
            else:
                _unpack_tracks(chunk, lx, ly, out)

    for (bx, by), idxs in sorted(groups.items()):
        ids_x = tuple(sorted({pair_reg[i][0] for i in idxs}))
        ids_y = tuple(sorted({pair_reg[i][1] for i in idxs}))
        sxs, ivxs, lensx_d, lensx, pos_x = _stacks(bx, ids_x)
        sys_, ivys, lensy_d, lensy, pos_y = _stacks(by, ids_y)
        descs = []
        for start in range(0, len(idxs), batch_pairs):
            chunk = idxs[start : start + batch_pairs]
            target = 32
            while target < len(chunk):
                target = _grid_step(target)
            target = min(target, batch_pairs, max(len(chunk), 32))
            if mesh is not None:
                n_dev = int(np.prod(mesh.devices.shape))
                target = target + (-target) % n_dev
            pad = max(0, target - len(chunk))
            ix = np.array([pos_x[pair_reg[i][0]] for i in chunk], np.int32)
            iy = np.array([pos_y[pair_reg[i][1]] for i in chunk], np.int32)
            if pad:
                ix = np.concatenate([ix, np.full(pad, ix[0], np.int32)])
                iy = np.concatenate([iy, np.full(pad, iy[0], np.int32)])
            descs.append((chunk, ix, iy, lensx[ix], lensy[iy]))

        static = dict(
            gap_series=tuple(gap_series), mode=mode,
            traceback=traceback, weights=w, steps=bx + by,
            mxp=tracks_mxp,
        )
        di = 0
        while di < len(descs):
            chunk, ix, iy, lx, ly = descs[di]
            n_run = 1
            if mesh is None:
                while (
                    di + n_run < len(descs)
                    and len(descs[di + n_run][1]) == len(ix)
                ):
                    n_run += 1
            n_sub = next((g for g in SUPER_DISPATCH_GRID if g <= n_run), 1)
            if n_sub > 1:
                grp = descs[di : di + n_sub]
                ix2 = np.stack([d[1] for d in grp])
                iy2 = np.stack([d[2] for d in grp])
                with annotate(f"dispatch:tracks-super{n_sub}:{bx}x{by}"):
                    out = _composite_multi_jit()(
                        sxs, ivxs, lensx_d, sys_, ivys, lensy_d,
                        jnp.asarray(ix2), jnp.asarray(iy2), ss, **static,
                    )
                in_flight.append((
                    [d[0] for d in grp], [d[3] for d in grp],
                    [d[4] for d in grp], out,
                ))
                di += n_sub
                drain(16)
                continue
            if mesh is not None:
                from ..dist.allpairs import sharded_tracks_dispatch

                if _mesh_spans_processes(mesh):
                    # Multi-host SPMD: replicated per-track stacks and the
                    # sharded index vectors assemble into global jax.Arrays
                    # host-locally, exactly like align_pairs_batched's
                    # indexed path (ADVICE r3).
                    from jax.sharding import PartitionSpec as P

                    rep, pp = P(), P("pairs")
                    gsxs = tuple(_globalize(mesh, a, rep) for a in sxs)
                    givxs = tuple(_globalize(mesh, a, rep) for a in ivxs)
                    gsys = tuple(_globalize(mesh, a, rep) for a in sys_)
                    givys = tuple(_globalize(mesh, a, rep) for a in ivys)
                    gss = tuple(_globalize(mesh, a, rep) for a in ss)
                    glx = _globalize(mesh, lensx_d, rep)
                    gly = _globalize(mesh, lensy_d, rep)
                    gix = _globalize(mesh, ix, pp)
                    giy = _globalize(mesh, iy, pp)
                else:
                    gsxs, givxs, gsys, givys, gss = sxs, ivxs, sys_, ivys, ss
                    glx, gly = lensx_d, lensy_d
                    gix, giy = jnp.asarray(ix), jnp.asarray(iy)
                with annotate(f"dispatch:tracks-sharded:{bx}x{by}x{len(chunk)}"):
                    out = sharded_tracks_dispatch(
                        mesh, gsxs, givxs, glx, gsys, givys, gly,
                        gix, giy, gss, **static,
                    )
            else:
                with annotate(f"dispatch:tracks:{bx}x{by}x{len(chunk)}"):
                    out = _composite_indexed_jit()(
                        sxs, ivxs, lensx_d, sys_, ivys, lensy_d,
                        jnp.asarray(ix), jnp.asarray(iy), ss, **static,
                    )
            in_flight.append((chunk, lx, ly, out))
            di += 1
            drain(16)
    drain(0)
    return results


def _mesh_spans_processes(mesh) -> bool:
    """True when the mesh includes devices owned by other processes — the
    jax.distributed multi-host case, where jit inputs must be GLOBAL
    jax.Arrays (host-local numpy would raise)."""
    import jax

    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def _globalize(mesh, arr, spec):
    """Build a global jax.Array over a multi-process mesh from data every
    host holds in full (SPMD hosts run identical orchestration code, so
    ``arr`` is identical everywhere): each host contributes the shards it
    owns via make_array_from_callback."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding

    a = np.asarray(arr)
    return jax.make_array_from_callback(
        a.shape, NamedSharding(mesh, spec), lambda idx: a[idx]
    )


def _bucket(n: int, buckets: tuple[int, ...]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return n  # oversized: exact-size "bucket of one shape"


def _pad_counts(profiles: list[Profile], L: int) -> tuple[np.ndarray, np.ndarray]:
    B = len(profiles)
    A = profiles[0].counts.shape[1]
    counts = np.zeros((B, L, A), dtype=np.float32)
    inv = np.ones((B, L), dtype=np.float32)
    for b, p in enumerate(profiles):
        counts[b, : p.length] = p.counts
        inv[b, : p.length] = column_inverses(p)
    return counts, inv


class ProfileArena:
    """Cross-call profile registry + device-resident stacks.

    The distance stage calls :func:`align_pairs_batched` once per resumable
    tile over the SAME N profiles; sharing one arena keeps each profile's
    stack row, cached exactness total and token extraction alive across
    tiles instead of rebuilding and re-uploading them per call.  A new
    registration invalidates (only) its bucket's stack.

    Lifetime: the registry is keyed by ``id(profile)``, so every registered
    Profile (and its device stack row) stays pinned for the arena's
    lifetime — that is what keeps the ids valid.  Growth is bounded by the
    workload that owns the arena (one MSA stage registers O(N) profiles);
    a long-running process reusing one arena across unrelated stages should
    call :meth:`clear` between them instead of letting it accrete.
    """

    def __init__(self, alphabet_size: int, bucket_sizes: tuple[int, ...]):
        self.A = alphabet_size
        self.bucket_sizes = tuple(bucket_sizes)
        self.pos: dict[int, int] = {}
        self.profs: list[Profile] = []
        self.tot: list[float] = []
        self.ints: list[bool] = []
        self.by_bucket: dict[int, list[int]] = {}
        self._stacks: dict[int, dict] = {}

    def clear(self) -> None:
        """Drop every registration and device stack (frees the pinned
        Profiles and their device memory for a fresh stage)."""
        self.pos.clear()
        self.profs.clear()
        self.tot.clear()
        self.ints.clear()
        self.by_bucket.clear()
        self._stacks.clear()

    def reg(self, p: Profile) -> int:
        k = self.pos.get(id(p))
        if k is None:
            k = len(self.profs)
            self.pos[id(p)] = k
            self.profs.append(p)
            self.tot.append(float(p.counts.sum(axis=1).max(initial=0.0)))
            # Integer-valued counts are a precondition for both the narrow
            # integer stack dtypes and the fast-MXU producer (ADVICE r3).
            self.ints.append(bool(np.all(p.counts == np.rint(p.counts))))
            b = _bucket(p.length, self.bucket_sizes)
            self.by_bucket.setdefault(b, []).append(k)
            self._stacks.pop(b, None)  # new member -> rebuild that stack
        return k

    def stack(self, b: int) -> dict:
        """Device-resident stack of every registered profile in bucket b.

        One-hot profiles ship as token rows (pad token = A, which one-hot
        expands to a zero column); integer-count profiles ship in the
        narrowest integer dtype that holds them.  Row counts pad to a pow2
        grid (floor 32) so successive calls with different profile subsets
        hit the SAME executable shape — a new stack shape costs seconds of
        executable upload/init on remote runtimes.
        """
        import jax.numpy as jnp

        st = self._stacks.get(b)
        if st is not None:
            return st
        A = self.A
        ids = self.by_bucket[b]
        profs = [self.profs[u] for u in ids]
        rows = 32
        while rows < len(profs):
            rows *= 2
        lens = np.ones(rows, dtype=np.int32)
        lens[: len(profs)] = [p.length for p in profs]
        onehot = all(
            bool(np.all(p.counts.sum(axis=1) == 1.0)) for p in profs
        )
        ints = all(self.ints[u] for u in ids)
        if onehot:
            tok_dt = np.int8 if A < 127 else np.int32
            toks = np.full((rows, b), A, dtype=tok_dt)
            for r, p in enumerate(profs):
                toks[r, : p.length] = np.argmax(p.counts, axis=1)
            stack, inv = jnp.asarray(toks), jnp.zeros((1, 1), jnp.float32)
        else:
            cmax = max(float(p.counts.max(initial=0.0)) for p in profs)
            # Narrow integer dtypes only for integer-valued counts —
            # fractional counts would silently truncate (ADVICE r3).
            if not ints:
                dt = np.float32
            else:
                dt = np.uint8 if cmax < 256 else (np.uint16 if cmax < 65536 else np.float32)
            counts = np.zeros((rows, b, A), dtype=dt)
            invs = np.ones((rows, b), np.float32)
            for r, p in enumerate(profs):
                counts[r, : p.length] = p.counts
                invs[r, : p.length] = column_inverses(p)
            stack, inv = jnp.asarray(counts), jnp.asarray(invs)
        st = dict(
            onehot=onehot,
            stack=stack,
            inv=inv,
            lens=jnp.asarray(lens),
            host_lens=lens,
            pos={u: r for r, u in enumerate(ids)},
            cmax=1.0 if onehot else cmax,
            max_tot=max((self.tot[u] for u in ids), default=1.0),
            ints=ints,
            profs=profs,  # host refs for exact per-matrix stats (tmax)
        )
        self._stacks[b] = st
        return st


def stack_tmax(st: dict, s) -> float:
    """Exact max |T| = max |counts @ S| over the stack's profiles (host
    numpy, cached on the stack dict per matrix content digest).  T is the
    producer's x-side MXU operand; |T| <= 256 integers are bf16-exact and
    admit the SINGLE-pass tier (fast_mxu_tier / "fast1")."""
    import hashlib

    key = (
        "tmax",
        hashlib.sha1(np.ascontiguousarray(s).tobytes()).hexdigest()[:12],
    )
    v = st.get(key)
    if v is None:
        v = 0.0
        for p in st["profs"]:
            v = max(v, float(np.abs(
                np.asarray(p.counts, np.float64) @ np.asarray(s, np.float64)
            ).max(initial=0.0)))
        st[key] = v
    return v


def fast_mxu_tier(max_s: float, s_integral: bool, sx_st: dict, sy_st: dict,
                  s) -> str:
    """MXU precision tier for the fused producers, always bit-identical to
    "highest": "fast1" (ONE bf16 H pass — every x-side |T| is an integer
    <= 256, so T itself is bf16-exact and needs no split; round 5),
    "fast" (integer-split bf16 pair), or "highest" when exactness is not
    provable.  The single-pass accumulation bound is implied by the
    fast_mxu_exact gate (it is strictly tighter without the split's hi
    rounding margin)."""
    if not fast_mxu_exact(max_s, s_integral, sx_st, sy_st):
        return "highest"
    if stack_tmax(sx_st, s) <= 256.0:
        return "fast1"
    return "fast"


def fast_mxu_exact(max_s: float, s_integral: bool, sx_st: dict, sy_st: dict) -> bool:
    """True when the fast-MXU producer ('fast' = one DEFAULT bf16 pass for
    T plus an integer-split bf16 pair for H) is provably EXACT for this
    dispatch group — i.e. bit-identical to the 'highest' path.

    Conditions (validated compiled-on-chip at the bounds,
    tools/onchip_parity.py): every count and score entry is INTEGER-valued
    (the integer split ``ti = (t // 128) * 128`` truncates fractional
    parts — ADVICE r3), magnitudes are bf16-exact (<= 256), the T split is
    exact (max total x max |S| < 2**15), and every f32 partial sum of the
    pair product stays exactly representable (< 2**24 with a 64 * tot_y
    margin for the T_hi rounding perturbation).
    """
    return (
        s_integral
        and sx_st["ints"]
        and sy_st["ints"]
        and max_s <= 256
        and sx_st["cmax"] <= 256
        and sy_st["cmax"] <= 256
        and max(sx_st["max_tot"], sy_st["max_tot"]) * max_s < 32768
        and sx_st["max_tot"] * sy_st["max_tot"] * max_s
        + 64.0 * sy_st["max_tot"] < float(2**24)
    )


def align_pairs_batched(
    pairs: Seq[tuple[Profile, Profile]],
    matrix: ScoreMatrix,
    gap_series: tuple[int, ...],
    mode: str,
    *,
    traceback: bool = False,
    bucket_sizes: tuple[int, ...] = (63, 127, 255, 511, 1023, 2047),
    batch_pairs: int = 32,
    backend: str = "auto",
    mesh=None,
    arena: ProfileArena | None = None,
) -> list[AlignResult] | list[PairResult]:
    """Align every (px, py) pair; results in input order.

    ``traceback=False`` returns :class:`PairResult` (score + path length —
    all the distance stage needs); ``traceback=True`` returns full
    :class:`AlignResult` paths bit-identical to the oracle.  ``arena``
    shares the profile registry and device stacks across calls (the
    distance stage's tiles reuse one).
    """
    import jax
    import jax.numpy as jnp

    if backend == "auto":
        # Pallas on TPU (5x+ the XLA scan); the scan path elsewhere.
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"

    results: list = [None] * len(pairs)

    s_dev = jnp.asarray(matrix.as_f32())
    A = matrix.alphabet.size
    max_s = float(np.abs(matrix.scores).max())
    # Fast-MXU admission needs INTEGER-valued scores: the producer's
    # integer split ti = (t // 128) * 128 truncates fractional parts, so a
    # fractional matrix must stay on the highest-precision path (ADVICE r3).
    s_integral = bool(np.all(matrix.scores == np.rint(matrix.scores)))

    if arena is None:
        arena = ProfileArena(A, bucket_sizes)
    elif arena.bucket_sizes != tuple(bucket_sizes) or arena.A != A:
        raise ValueError("arena bucket_sizes/alphabet do not match this call")
    _reg = arena.reg
    uniq_tot = arena.tot
    _stack = arena.stack

    # Group problem indices by (bucket_x, bucket_y).
    groups: dict[tuple[int, int], list[int]] = {}
    pair_reg: list[tuple[int, int] | None] = [None] * len(pairs)
    for idx, (px, py) in enumerate(pairs):
        if px.length == 0 or py.length == 0:
            if traceback:
                results[idx] = _degenerate(px.length, py.length, gap_series, mode)
            else:
                r = _degenerate(px.length, py.length, gap_series, mode)
                results[idx] = PairResult(r.score, float(r.length), px.length, py.length)
            continue
        kx, ky = _reg(px), _reg(py)
        # Same predicate as oracle.score.check_exactness, on cached totals.
        if uniq_tot[kx] * uniq_tot[ky] * max_s >= EXACT_DOT_LIMIT:
            check_exactness(px, py, matrix)  # raises with the full message
        pair_reg[idx] = (kx, ky)
        key = (_bucket(px.length, bucket_sizes), _bucket(py.length, bucket_sizes))
        groups.setdefault(key, []).append(idx)

    # Device replay (kernels.replay) covers ALL modes since round 3: the
    # local stop-at-zero decision ships as bit 7 of the direction byte, so
    # the host never rebuilds cell scores (VERDICT r2 item 5 / weak #3).
    device_replay = traceback

    # Host<->device pipelining (SURVEY.md §3.2 "PP" row): dispatches are
    # enqueued asynchronously and unpacked later, so chunk k+1's transfer
    # and compute overlap chunk k's host-side unpack/traceback.  Only the
    # host-replay path ships O(L^2) traceback bytes per problem, so only it
    # bounds the in-flight depth tightly.
    in_flight: list = []
    max_in_flight = 4 if (traceback and not device_replay) else 64

    def drain(limit: int) -> None:
        while len(in_flight) > limit:
            _unpack(*in_flight.pop(0))

    def _unpack(chunk, pxs, pys, lx, ly, out) -> None:
        # One device_get for the whole tree: each separate materialization
        # is a full round trip on remote runtimes.  Super-dispatch entries
        # carry a list of chunks and outputs with a leading (n_sub,) axis.
        out = jax.device_get(out)
        if isinstance(chunk[0], list):
            for t, (sub, slx, sly) in enumerate(zip(chunk, lx, ly)):
                _unpack_one(sub, None, None, slx, sly,
                            {k: v[t] for k, v in out.items()})
        else:
            _unpack_one(chunk, pxs, pys, lx, ly, out)

    def _unpack_one(chunk, pxs, pys, lx, ly, out) -> None:
        score = np.asarray(out["score"])
        length = np.asarray(out["length"])
        ti = np.asarray(out["ti"])
        tj = np.asarray(out["tj"])
        tcode = np.asarray(out["tcode"])
        if mode == "semiglobal":
            length = length + (lx - ti) + (ly - tj)
        if "moves" in out:
            moves = np.asarray(out["moves"])  # (B, steps)
            nmoves = np.asarray(out["nmoves"])
            for b, idx in enumerate(chunk):
                results[idx] = moves_to_result(
                    moves[b], int(nmoves[b]), float(score[b]),
                    int(ti[b]), int(tj[b]), int(lx[b]), int(ly[b]), mode,
                )
        elif traceback:
            tb = np.asarray(out["tb"])  # (Dscan, B, Lp)
            for b, idx in enumerate(chunk):
                # The carried-value walk needs cell scores only in local
                # mode; global/semiglobal replay never reads h.
                h = (
                    pair_score_matrix(pxs[b], pys[b], matrix)
                    if mode == "local"
                    else None
                )
                results[idx] = replay_traceback(
                    tb[:, b, :],
                    h,
                    float(score[b]),
                    int(ti[b]),
                    int(tj[b]),
                    int(tcode[b]),
                    int(lx[b]),
                    int(ly[b]),
                    tuple(gap_series),
                    mode,
                )
        else:
            # tolist() once per array: per-element float(np_scalar)
            # conversions cost ~ms per thousand pairs on the hot unpack
            # path (measured round 5 at the 8192-pair distance tile).
            sc = score.tolist()
            ln = length.tolist()
            tis = ti.tolist()
            tjs = tj.tolist()
            for b, idx in enumerate(chunk):
                results[idx] = PairResult(sc[b], ln[b], tis[b], tjs[b])

    for (bx, by), idxs in sorted(groups.items()):
        # ---- oversized routing (VERDICT r1 item 6: router, not error) ----
        # Per-problem byte estimates decide the execution strategy:
        #  * x past the Pallas lane ceiling, or a materialized hs tensor
        #    past the HBM budget -> streamed-producer scan (no hs, no lane
        #    state; any Lx and Ly);
        #  * traceback bits past the budget on top of that -> native C++
        #    kernel on the host (exact-parity twin, packed memory).
        Lp_g = bx + 1
        hs_bytes, tb_bytes = per_problem_bytes(bx, by)
        lane_over = backend == "pallas" and Lp_g > _lane_cap(gap_series, traceback)
        # A single problem's materialized hs past the budget streams on
        # EITHER backend (the fused Pallas producer materializes the same
        # O(D*Lp) tensor in HBM as the XLA gather path).
        stream = lane_over or hs_bytes > _scaled_budget(HS_BYTES_BUDGET)
        giant_tb = stream and traceback and tb_bytes > _scaled_budget(TB_BYTES_BUDGET)
        # Giant tracebacks stay ON DEVICE via the checkpointed walk
        # (O(L^1.5) memory, one dispatch) in every mode — local's stop
        # rule rides bit 7 (round 3).  The native C++ twin remains the
        # independent parity cross-check (tests), not a routing target.
        use_ckpt = giant_tb
        oversized = (
            backend == "pallas" and by > bucket_sizes[-1] and not stream
        )
        # Per-dispatch batch cap so the whole dispatch's hs (+tb) stays
        # inside the HBM budget regardless of the configured batch size.
        per_prob = hs_bytes + (tb_bytes if traceback else 0)
        eff_batch = _snap_batch(
            _scaled_budget(DISPATCH_BYTES_BUDGET) // max(per_prob, 1), batch_pairs
        )
        # Host-replay traceback (local mode) holds pulled tb tensors in the
        # in-flight queue: bound the queue by bytes, not just count.
        group_in_flight = max_in_flight
        if traceback and not device_replay:
            group_in_flight = max(
                1, min(max_in_flight, _scaled_budget(TB_BYTES_BUDGET) // max(tb_bytes * eff_batch, 1))
            )
        group_backend = backend

        if stream:
            # Long-tail path: the streamed scan (no hs tensor; any Lx/Ly).
            # Under a mesh BOTH it and the checkpointed giant-tb walk run
            # SHARDED over the pair axis (round 3).
            # Batches bounded by the operand footprint (O(B*L*A) padded
            # count tensors) and, with traceback, by the tb-bit budget.
            operand_bytes = (3 * bx + 2 * by) * matrix.alphabet.size * 4
            sub = max(1, min(
                batch_pairs, _scaled_budget(HS_BYTES_BUDGET) // max(operand_bytes, 1)
            ))
            if traceback and not use_ckpt:
                sub = max(1, min(sub, _scaled_budget(TB_BYTES_BUDGET) // max(tb_bytes, 1)))
            if use_ckpt:
                # Checkpoint footprint per problem: (4k+8) carry vectors of
                # Lp floats per block plus one block's bits/scores buffers.
                # Rg comes from the kernel's own default so the estimate
                # matches the actual footprint by construction.
                from .scan import default_ckpt_interval, wavefront_dp_checkpointed

                kk = len(gap_series)
                Dg = bx + by + 1
                Rg = default_ckpt_interval(Dg)
                per_ckpt = (
                    (4 * kk + 8) * 4 * (-(-Dg // Rg)) * Lp_g
                    + 5 * Rg * Lp_g
                )
                sub = max(1, min(
                    sub, _scaled_budget(DISPATCH_BYTES_BUDGET) // max(per_ckpt, 1)
                ))
            stream_mesh = mesh
            n_dev = (
                int(np.prod(mesh.devices.shape)) if stream_mesh is not None else 1
            )
            for s0 in range(0, len(idxs), sub):
                chunk = idxs[s0 : s0 + sub]
                pxs = [pairs[i][0] for i in chunk]
                pys = [pairs[i][1] for i in chunk]
                spad = (-len(chunk)) % n_dev  # shard-divisible batch
                if spad:
                    pxs = pxs + [pxs[0]] * spad
                    pys = pys + [pys[0]] * spad
                cx, inv_x = _pad_counts(pxs, bx)
                cy, inv_y = _pad_counts(pys, by)
                lx = np.array([p.length for p in pxs], dtype=np.int32)
                ly = np.array([p.length for p in pys], dtype=np.int32)
                if use_ckpt and stream_mesh is not None:
                    from ..dist.allpairs import sharded_ckpt_dispatch

                    operands = (cx, inv_x, cy, inv_y, np.asarray(matrix.as_f32()), lx, ly)
                    if _mesh_spans_processes(stream_mesh):
                        from jax.sharding import PartitionSpec as P

                        pp = P("pairs")
                        operands = tuple(
                            _globalize(stream_mesh, a, spec)
                            for a, spec in zip(
                                operands,
                                (P("pairs", None, None), P("pairs", None),
                                 P("pairs", None, None), P("pairs", None),
                                 P(), pp, pp),
                            )
                        )
                    with annotate(
                        f"dispatch:ckpt-sharded:{bx}x{by}x{len(chunk)}"
                    ):
                        out = sharded_ckpt_dispatch(
                            stream_mesh, *operands,
                            gap_series=tuple(gap_series), mode=mode,
                            interval=Rg,
                        )
                elif use_ckpt:
                    with annotate(f"dispatch:ckpt-tb:{bx}x{by}x{len(chunk)}"):
                        out = wavefront_dp_checkpointed(
                            jnp.asarray(cx), jnp.asarray(inv_x),
                            jnp.asarray(cy), jnp.asarray(inv_y),
                            s_dev, jnp.asarray(lx), jnp.asarray(ly),
                            gap_series=tuple(gap_series), mode=mode,
                            interval=Rg,
                        )
                elif stream_mesh is not None:
                    from ..dist.allpairs import sharded_streamed_dispatch

                    operands = (cx, inv_x, cy, inv_y, np.asarray(matrix.as_f32()), lx, ly)
                    if _mesh_spans_processes(stream_mesh):
                        from jax.sharding import PartitionSpec as P

                        pp = P("pairs")
                        operands = tuple(
                            _globalize(stream_mesh, a, spec)
                            for a, spec in zip(
                                operands,
                                (P("pairs", None, None), P("pairs", None),
                                 P("pairs", None, None), P("pairs", None),
                                 P(), pp, pp),
                            )
                        )
                    with annotate(
                        f"dispatch:streamed-sharded:{bx}x{by}x{len(chunk)}"
                    ):
                        out = sharded_streamed_dispatch(
                            stream_mesh, *operands,
                            gap_series=tuple(gap_series), mode=mode,
                            traceback=traceback, replay=device_replay,
                        )
                else:
                    with annotate(f"dispatch:streamed:{bx}x{by}x{len(chunk)}"):
                        out = _streamed_jit()(
                            jnp.asarray(cx), jnp.asarray(inv_x),
                            jnp.asarray(cy), jnp.asarray(inv_y),
                            s_dev, jnp.asarray(lx), jnp.asarray(ly),
                            gap_series=tuple(gap_series), mode=mode,
                            traceback=traceback, replay=device_replay,
                        )
                in_flight.append((chunk, pxs, pys, lx, ly, out))
                drain(group_in_flight)
            continue

        indexed_descs: list[tuple] = []
        for start in range(0, len(idxs), eff_batch):
            chunk = idxs[start : start + eff_batch]
            pxs = [pairs[i][0] for i in chunk]
            pys = [pairs[i][1] for i in chunk]
            # Pad the batch to the {32, 128, 512, 1024, ...} grid
            # (_grid_step), bounding compiled-shape variants per bucket —
            # each new executable costs seconds of upload/init on remote
            # runtimes, which dominates small-MSA wall clock.  Also
            # round to a multiple of the mesh's pair axis when sharded.
            target = 32
            while target < len(chunk):
                target = _grid_step(target)
            target = min(target, eff_batch)
            if target < len(chunk):  # eff_batch below the grid
                target = len(chunk)
            if mesh is not None:
                n_dev = int(np.prod(mesh.devices.shape))
                target = target + (-target) % n_dev
            pad = max(0, target - len(chunk))

            if oversized:
                # Oversized target: chunked diagonal execution — only one
                # band chunk of skewed scores exists at a time, so Ly is
                # unbounded (kernels.chunked).  Consumes materialized count
                # tensors (pad problems repeat the first problem; their
                # output rows are discarded).
                from .chunked import wavefront_dp_chunked

                if pad:
                    pxs = pxs + [pxs[0]] * pad
                    pys = pys + [pys[0]] * pad
                cx, inv_x = _pad_counts(pxs, bx)
                cy, inv_y = _pad_counts(pys, by)
                lx = np.array([p.length for p in pxs], dtype=np.int32)
                ly = np.array([p.length for p in pys], dtype=np.int32)
                if mesh is not None:
                    # Sharded chunked route: same band-chunked
                    # fused-producer body, pair axis sharded
                    # (dist.allpairs.sharded_chunked_dispatch).  Under a
                    # multi-process mesh operands assemble into global
                    # arrays host-locally, and traceback bits all-gather
                    # per chunk so every host can pull them (round 5 — the
                    # last route that previously left the Pallas body
                    # cross-process).
                    from ..dist.allpairs import sharded_chunked_dispatch

                    spans = _mesh_spans_processes(mesh)
                    operands = (cx, inv_x, cy, inv_y,
                                np.asarray(matrix.as_f32()), lx, ly)
                    if spans:
                        from jax.sharding import PartitionSpec as P

                        pp = P("pairs")
                        operands = tuple(
                            _globalize(mesh, a, spec)
                            for a, spec in zip(
                                operands,
                                (P("pairs", None, None), P("pairs", None),
                                 P("pairs", None, None), P("pairs", None),
                                 P(), pp, pp),
                            )
                        )
                    with annotate(
                        f"dispatch:chunked-sharded:{bx}x{by}x{len(chunk)}"
                    ):
                        out = sharded_chunked_dispatch(
                            mesh, *operands,
                            gap_series=tuple(gap_series), mode=mode,
                            traceback=traceback,
                            gather_tb=bool(traceback and spans),
                        )
                else:
                    out = wavefront_dp_chunked(
                        cx, inv_x, cy, inv_y,
                        np.asarray(matrix.as_f32()), lx, ly,
                        gap_series=tuple(gap_series), mode=mode,
                        traceback=traceback,
                    )
                if traceback:
                    out["tb"] = np.concatenate(out.pop("tb_chunks"), axis=0)
                in_flight.append((chunk, pxs, pys, lx, ly, out))
                drain(group_in_flight)
                continue

            # Indexed dispatch: profile stacks live on device; the chunk
            # ships only two int32 index vectors (pad entries repeat the
            # first problem; their output rows are discarded).  Under a
            # mesh the SAME body runs inside shard_map with the pair axis
            # sharded (dist.allpairs) — fused Pallas producer, int8 path
            # and device replay included.
            sx_st = _stack(bx)
            sy_st = _stack(by)
            ix = np.array([sx_st["pos"][pair_reg[i][0]] for i in chunk], np.int32)
            iy = np.array([sy_st["pos"][pair_reg[i][1]] for i in chunk], np.int32)
            if pad:
                ix = np.concatenate([ix, np.full(pad, ix[0], np.int32)])
                iy = np.concatenate([iy, np.full(pad, iy[0], np.int32)])
            lx = sx_st["host_lens"][ix]
            ly = sy_st["host_lens"][iy]
            indexed_descs.append((chunk, pxs, pys, ix, iy, lx, ly))

        if not indexed_descs:
            continue
        sx_st = _stack(bx)
        sy_st = _stack(by)
        qd = None
        if group_backend == "pallas" and sx_st["onehot"] and sy_st["onehot"]:
            from .fused_dp import max_lanes_fused
            from .scores import quantized_dtype_for

            # int8 scale-free scoring halves the TWO-kernel path's hs
            # HBM traffic; the fused kernel has no hs traffic at all,
            # so when the dispatch will route fused, qd stays None
            # (don't compute a knob the kernel would ignore).
            fused_take = _fused_dp_enabled() and (
                -(-(bx + 1) // 128) * 128
                <= max_lanes_fused(gap_series, not traceback, traceback)
            )
            if not fused_take:
                qd = quantized_dtype_for(max_s)
        # MXU precision for the fused producer: admitted only when provably
        # bit-identical to "highest" — see fast_mxu_tier for the contract
        # ("fast1" = single bf16 pass when every x-side |T| <= 256).
        mxp = "highest"
        import os as _os

        if (
            group_backend == "pallas"
            and _os.environ.get("PRALINE_MXU_PRECISION", "auto") != "highest"
        ):
            mxp = fast_mxu_tier(
                max_s, s_integral, sx_st, sy_st, matrix.as_f32()
            )
        static = dict(
            gap_series=tuple(gap_series), mode=mode, traceback=traceback,
            backend=group_backend, qd=qd, replay=device_replay,
            onehot_x=sx_st["onehot"], onehot_y=sy_st["onehot"], A=A,
            mxp=mxp,
        )
        stacks = (
            sx_st["stack"], sx_st["inv"], sx_st["lens"],
            sy_st["stack"], sy_st["inv"], sy_st["lens"],
        )
        # Super-dispatch: runs of same-shape chunks collapse into one
        # scan-of-n_sub jit — the per-dispatch relay round trip (~29 ms
        # measured, tools/onchip_superdispatch.py) is paid once per group.
        # Scores/device-replay modes only (stacked raw tb tensors would
        # multiply the HBM footprint); under a mesh the same scan body
        # runs inside shard_map (dist.allpairs).
        super_ok = not (traceback and not device_replay)
        di = 0
        while di < len(indexed_descs):
            chunk, pxs, pys, ix, iy, lx, ly = indexed_descs[di]
            n_run = 1
            if super_ok:
                while (
                    di + n_run < len(indexed_descs)
                    and len(indexed_descs[di + n_run][3]) == len(ix)
                ):
                    n_run += 1
            n_sub = next((g for g in SUPER_DISPATCH_GRID if g <= n_run), 1)
            if n_sub > 1:
                grp = indexed_descs[di : di + n_sub]
                ix2 = np.stack([d[3] for d in grp])
                iy2 = np.stack([d[4] for d in grp])
                if mesh is not None:
                    from jax.sharding import PartitionSpec as P

                    from ..dist.allpairs import sharded_indexed_multi_dispatch

                    ops = stacks + (ix2, iy2, s_dev)
                    if _mesh_spans_processes(mesh):
                        pp = P(None, "pairs")
                        ops = tuple(
                            _globalize(mesh, a, spec)
                            for a, spec in zip(
                                ops, (P(), P(), P(), P(), P(), P(), pp, pp, P())
                            )
                        )
                    else:
                        ops = stacks + (jnp.asarray(ix2), jnp.asarray(iy2), s_dev)
                    with annotate(
                        f"dispatch:super{n_sub}-sharded:{bx}x{by}x{len(ix)}"
                    ):
                        out = sharded_indexed_multi_dispatch(
                            mesh, *ops, **static
                        )
                else:
                    with annotate(f"dispatch:super{n_sub}:{bx}x{by}x{len(ix)}"):
                        out = _indexed_multi_jit()(
                            *stacks, jnp.asarray(ix2), jnp.asarray(iy2), s_dev,
                            **static,
                        )
                in_flight.append((
                    [d[0] for d in grp], None, None,
                    [d[5] for d in grp], [d[6] for d in grp], out,
                ))
                di += n_sub
                drain(group_in_flight)
                continue
            operands = stacks + (jnp.asarray(ix), jnp.asarray(iy), s_dev)
            if mesh is not None:
                from ..dist.allpairs import sharded_indexed_dispatch

                if _mesh_spans_processes(mesh):
                    # Multi-host SPMD (SURVEY.md §5.4): every host runs this
                    # same code on the same pairs, so the replicated stacks
                    # and the sharded index vectors can be assembled into
                    # global arrays host-locally.  Host-replay traceback
                    # (local mode) would leave tb shards unaddressable.
                    if traceback and not device_replay:
                        raise ValueError(
                            "local-mode traceback is not supported across "
                            "processes; use a single-process mesh or "
                            "global/semiglobal (device-replay) modes"
                        )
                    from jax.sharding import PartitionSpec as P

                    operands = tuple(
                        _globalize(mesh, a, spec)
                        for a, spec in zip(
                            operands,
                            (P(), P(), P(), P(), P(), P(),
                             P("pairs"), P("pairs"), P()),
                        )
                    )
                with annotate(f"dispatch:sharded:{bx}x{by}x{len(chunk)}"):
                    out = sharded_indexed_dispatch(mesh, *operands, **static)
            else:
                with annotate(f"dispatch:{bx}x{by}x{len(chunk)}"):
                    out = _indexed_jit()(*operands, **static)
            in_flight.append((chunk, pxs, pys, lx, ly, out))
            di += 1
            drain(group_in_flight)
    drain(0)
    return results
