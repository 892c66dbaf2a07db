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
from ..oracle.score import check_exactness, column_inverses, pair_score_matrix
from .replay import moves_to_result, replay_moves
from .traceback import replay_traceback


@dataclasses.dataclass(frozen=True)
class PairResult:
    """Scores-only result of one batched pairwise DP."""

    score: float
    length: float
    ti: int
    tj: int


@functools.lru_cache(maxsize=1)
def _dispatch_jit():
    """One executable per dispatch: score producer + wavefront DP (+ on-device
    traceback replay for global/semiglobal).  Fusing these into a single jit
    halves the round trips per batch versus separate jitted calls — on remote
    runtimes each dispatch costs a full relay round trip — and the replay
    output (a 1-byte-per-column move tape) replaces the O(L^2) traceback bit
    tensor on the wire."""
    import jax
    import jax.numpy as jnp

    from .fused_scores import fused_skewed_scores
    from .pallas_dp import wavefront_dp_pallas
    from .scan import wavefront_dp
    from .scores import skewed_pair_scores

    @functools.partial(
        jax.jit,
        static_argnames=("gap_series", "mode", "traceback", "backend", "qd", "replay"),
    )
    def run(cx, inv_x, cy, inv_y, s, lx, ly, *, gap_series, mode, traceback,
            backend, qd, replay):
        if backend == "pallas":
            hs = fused_skewed_scores(
                cx, inv_x, cy, inv_y, s,
                out_dtype=qd if qd is not None else jnp.float32,
                scaled=qd is None,
            )
            out = wavefront_dp_pallas(
                hs, lx, ly, gap_series=gap_series, mode=mode,
                traceback=traceback, hs_body=True,
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

    return run


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
) -> list[AlignResult] | list[PairResult]:
    """Align every (px, py) pair; results in input order.

    ``traceback=False`` returns :class:`PairResult` (score + path length —
    all the distance stage needs); ``traceback=True`` returns full
    :class:`AlignResult` paths bit-identical to the oracle.
    """
    import jax
    import jax.numpy as jnp

    if backend == "auto":
        # Pallas on TPU (5x+ the XLA scan); the scan path elsewhere.
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"

    results: list = [None] * len(pairs)

    # Group problem indices by (bucket_x, bucket_y).
    groups: dict[tuple[int, int], list[int]] = {}
    for idx, (px, py) in enumerate(pairs):
        if px.length == 0 or py.length == 0:
            if traceback:
                results[idx] = _degenerate(px.length, py.length, gap_series, mode)
            else:
                r = _degenerate(px.length, py.length, gap_series, mode)
                results[idx] = PairResult(r.score, float(r.length), px.length, py.length)
            continue
        check_exactness(px, py, matrix)
        key = (_bucket(px.length, bucket_sizes), _bucket(py.length, bucket_sizes))
        groups.setdefault(key, []).append(idx)

    s_dev = jnp.asarray(matrix.as_f32())

    # Device replay (kernels.replay) covers global/semiglobal traceback; the
    # local stop-at-zero walk stays on the host (needs the carried value).
    device_replay = traceback and mode in ("global", "semiglobal")

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
        # is a full round trip on remote runtimes.
        out = jax.device_get(out)
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
            for b, idx in enumerate(chunk):
                results[idx] = PairResult(
                    float(score[b]), float(length[b]), int(ti[b]), int(tj[b])
                )

    dummy = None
    for (bx, by), idxs in sorted(groups.items()):
        for start in range(0, len(idxs), batch_pairs):
            chunk = idxs[start : start + batch_pairs]
            pxs = [pairs[i][0] for i in chunk]
            pys = [pairs[i][1] for i in chunk]
            # Pad the batch with trivial length-1 problems (results discarded
            # below): to {32, 128, 512, ...} (powers of four with a floor of
            # 32), bounding compiled-shape variants to ~3 per bucket — each
            # new executable costs seconds of upload/init on remote
            # runtimes, which dominates small-MSA wall clock.  Also round to
            # a multiple of the mesh's pair axis when sharded.
            target = 32
            while target < len(chunk):
                target *= 4
            target = min(target, batch_pairs)
            if target < len(chunk):  # batch_pairs below the pow4 grid
                target = len(chunk)
            if mesh is not None:
                n_dev = int(np.prod(mesh.devices.shape))
                target = target + (-target) % n_dev
            pad = max(0, target - len(chunk))
            if pad:
                if dummy is None:
                    A = matrix.alphabet.size
                    one = np.zeros((1, A), np.float32)
                    one[0, 0] = 1.0
                    dummy = Profile(one, np.zeros(1, np.float32), matrix.alphabet)
                pxs = pxs + [dummy] * pad
                pys = pys + [dummy] * pad
            cx, inv_x = _pad_counts(pxs, bx)
            cy, inv_y = _pad_counts(pys, by)
            lx = np.array([p.length for p in pxs], dtype=np.int32)
            ly = np.array([p.length for p in pys], dtype=np.int32)
            d_cx, d_ivx, d_cy, d_ivy, d_lx, d_ly = (
                jnp.asarray(cx), jnp.asarray(inv_x), jnp.asarray(cy),
                jnp.asarray(inv_y), jnp.asarray(lx), jnp.asarray(ly),
            )

            if mesh is not None:
                from ..dist.allpairs import sharded_wavefront_dp

                out = sharded_wavefront_dp(
                    mesh,
                    jnp.asarray(cx),
                    jnp.asarray(inv_x),
                    jnp.asarray(cy),
                    jnp.asarray(inv_y),
                    s_dev,
                    jnp.asarray(lx),
                    jnp.asarray(ly),
                    tuple(gap_series),
                    mode,
                    traceback=traceback,
                )  # mesh path: device_put with shardings handled inside
            else:
                if backend == "pallas" and by > bucket_sizes[-1]:
                    # Oversized target: chunked diagonal execution — only
                    # one band chunk of skewed scores exists at a time, so
                    # Ly is unbounded (kernels.chunked).
                    from .chunked import wavefront_dp_chunked

                    out = wavefront_dp_chunked(
                        cx,
                        inv_x,
                        cy,
                        inv_y,
                        np.asarray(matrix.as_f32()),
                        lx,
                        ly,
                        gap_series=tuple(gap_series),
                        mode=mode,
                        traceback=traceback,
                    )
                    if traceback:
                        out["tb"] = np.concatenate(out.pop("tb_chunks"), axis=0)
                else:
                    # One fused executable per dispatch: producer + DP
                    # (+ device replay).  On the Pallas path the fused
                    # H+skew producer (kernels.fused_scores) keeps the pair
                    # score matrix out of HBM, and one-hot profiles ship
                    # integer scores scale-free (int8/16).
                    qd = None
                    if backend == "pallas":
                        from .scores import quantized_dtype_for

                        max_nx = max(
                            float(p.counts.sum(axis=1).max(initial=0.0)) for p in pxs
                        )
                        max_ny = max(
                            float(p.counts.sum(axis=1).max(initial=0.0)) for p in pys
                        )
                        if max_nx <= 1.0 and max_ny <= 1.0:  # one-hot: inv all 1
                            qd = quantized_dtype_for(float(np.abs(matrix.scores).max()))
                    out = _dispatch_jit()(
                        d_cx, d_ivx, d_cy, d_ivy, s_dev, d_lx, d_ly,
                        gap_series=tuple(gap_series),
                        mode=mode,
                        traceback=traceback,
                        backend=backend,
                        qd=qd,
                        replay=device_replay,
                    )
            in_flight.append((chunk, pxs, pys, lx, ly, out))
            drain(max_in_flight)
    drain(0)
    return results
