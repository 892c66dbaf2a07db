"""Pair-space sharded batched DP (SURVEY.md §3.2 "DP" row, §9 P4).

Shards a padded batch of pairwise problems over the mesh's ``pairs`` axis
with ``shard_map``: every device runs score-skew + wavefront on its shard,
then scalar terminals (score/length/terminal cell) are combined with an
``all_gather`` over ICI so every device — and the host — sees the full
distance tile.  Traceback bits stay sharded (they are O(L^2) per problem;
only the host slices them per pair).

This is the TPU replacement for the reference's serial all-pairs loop
(SURVEY.md C15) at the multi-chip level; kernels.batch handles the
single-chip batching underneath.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import PartitionSpec as P

try:  # jax >= 0.6 moved shard_map out of experimental
    from jax import shard_map as _shard_map_mod  # type: ignore[attr-defined]

    shard_map = _shard_map_mod
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore[no-redef]

from .mesh import PAIR_AXIS
from ..kernels.scan import wavefront_dp
from ..kernels.scores import skewed_pair_scores


@functools.lru_cache(maxsize=32)
def _build(mesh_hash_key, gap_series: tuple[int, ...], mode: str, traceback: bool):
    mesh = _MESHES[mesh_hash_key]

    in_specs = (
        P(PAIR_AXIS, None, None),  # cx
        P(PAIR_AXIS, None),  # inv_x
        P(PAIR_AXIS, None, None),  # cy
        P(PAIR_AXIS, None),  # inv_y
        P(None, None),  # substitution matrix (replicated)
        P(PAIR_AXIS),  # lx
        P(PAIR_AXIS),  # ly
    )
    out_specs = {
        "score": P(),
        "length": P(),
        "ti": P(),
        "tj": P(),
        "tcode": P(),
    }
    if traceback:
        out_specs["tb"] = P(None, PAIR_AXIS, None)

    def run(cx, inv_x, cy, inv_y, s, lx, ly):
        hs = skewed_pair_scores(cx, inv_x, cy, inv_y, s)
        out = wavefront_dp(hs, lx, ly, gap_series=gap_series, mode=mode, traceback=traceback)
        res = {
            k: jax.lax.all_gather(out[k], PAIR_AXIS, axis=0, tiled=True)
            for k in ("score", "length", "ti", "tj", "tcode")
        }
        if traceback:
            res["tb"] = out["tb"]
        return res

    # check_vma=False: the scan's carry init mixes replicated constants with
    # shard-varying inputs; the computation is per-shard pure either way.
    fn = shard_map(run, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False)
    return jax.jit(fn)


# Bounded mesh registry: keys mirror _build's lru_cache so evicting the
# oldest entry past the cache capacity keeps the two in step (the cached
# jitted fn holds its own mesh reference; this dict only feeds _build).
_MESHES: dict = {}
_MESHES_MAX = 32


def sharded_wavefront_dp(mesh, cx, inv_x, cy, inv_y, s, lx, ly, gap_series, mode, traceback=False):
    """Run the batched DP with the batch axis sharded over ``mesh``.

    The batch size must be divisible by the mesh's pair-axis size (the
    caller pads with dummy problems; kernels.batch does this).
    """
    key = _register_mesh(mesh)
    fn = _build(key, tuple(gap_series), mode, traceback)
    return fn(cx, inv_x, cy, inv_y, s, lx, ly)


def _register_mesh(mesh):
    key = (tuple(mesh.devices.flat), mesh.axis_names)
    _MESHES.pop(key, None)  # move-to-end so hot meshes never age out
    _MESHES[key] = mesh
    while len(_MESHES) > _MESHES_MAX:
        _MESHES.pop(next(iter(_MESHES)))
    return key


@functools.lru_cache(maxsize=64)
def _build_indexed(mesh_key, gap_series, mode, traceback, backend, qd,
                   replay, onehot_x, onehot_y, A, mxp="highest"):
    """Sharded production dispatch: the SAME indexed gather + fused-producer
    + wavefront(+replay) body as the single-device path
    (kernels.batch.indexed_dispatch_body), with only the pair axis sharded.

    Profile stacks and the substitution matrix are replicated (O(N)
    payload); each device gathers its pair shard's operands locally and
    runs the full kernel — Pallas fused producer, int8 one-hot scoring and
    on-device traceback replay included — then scalar terminals and move
    tapes are all-gathered over ICI.  This replaces the round-1 design
    where the mesh path fell back to the slower XLA-scan kernel
    (VERDICT r1 item 2; SURVEY.md §3.2 DP row)."""
    mesh = _MESHES[mesh_key]
    from ..kernels.batch import indexed_dispatch_body

    rep = P()  # replicated
    in_specs = (rep, rep, rep, rep, rep, rep, P(PAIR_AXIS), P(PAIR_AXIS), rep)
    out_specs = {k: rep for k in ("score", "length", "ti", "tj", "tcode")}
    if replay:
        out_specs["moves"] = rep
        out_specs["nmoves"] = rep
    elif traceback:
        # O(L^2) per problem: stays sharded, host slices per pair.
        out_specs["tb"] = P(None, PAIR_AXIS, None)

    def run(sx, ivx, lensx, sy, ivy, lensy, ix, iy, s):
        out = indexed_dispatch_body(
            sx, ivx, lensx, sy, ivy, lensy, ix, iy, s,
            gap_series=gap_series, mode=mode, traceback=traceback,
            backend=backend, qd=qd, replay=replay,
            onehot_x=onehot_x, onehot_y=onehot_y, A=A, mxp=mxp,
        )
        res = {
            k: jax.lax.all_gather(v, PAIR_AXIS, axis=0, tiled=True)
            for k, v in out.items()
            if k != "tb"
        }
        if "tb" in out:
            res["tb"] = out["tb"]
        return res

    fn = shard_map(run, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    return jax.jit(fn)


def sharded_indexed_dispatch(mesh, sx, ivx, lensx, sy, ivy, lensy, ix, iy, s,
                             *, gap_series, mode, traceback, backend, qd,
                             replay, onehot_x, onehot_y, A, mxp="highest"):
    """Indexed batched DP with the pair axis sharded over ``mesh`` (batch
    must be a multiple of the mesh's pair-axis size; kernels.batch pads)."""
    key = _register_mesh(mesh)
    fn = _build_indexed(key, tuple(gap_series), mode, traceback, backend,
                        qd, replay, onehot_x, onehot_y, A, mxp)
    return fn(sx, ivx, lensx, sy, ivy, lensy, ix, iy, s)


@functools.lru_cache(maxsize=64)
def _build_indexed_multi(mesh_key, gap_series, mode, traceback, backend, qd,
                         replay, onehot_x, onehot_y, A, mxp="highest"):
    """Sharded SUPER-DISPATCH: lax.scan over n_sub sub-batches of the
    indexed body inside one shard_map jit — the per-dispatch round trip is
    paid once per group on every host, and each iteration's transient hs
    stays per-shard (kernels.batch._indexed_multi_jit, mesh form)."""
    mesh = _MESHES[mesh_key]
    from ..kernels.batch import indexed_dispatch_body

    rep = P()
    in_specs = (rep, rep, rep, rep, rep, rep,
                P(None, PAIR_AXIS), P(None, PAIR_AXIS), rep)
    out_specs = {k: rep for k in ("score", "length", "ti", "tj", "tcode")}
    if replay:
        out_specs["moves"] = rep
        out_specs["nmoves"] = rep
    elif traceback:
        out_specs["tb"] = P(None, None, PAIR_AXIS, None)

    def run(sx, ivx, lensx, sy, ivy, lensy, ix2, iy2, s):
        def body(_, xs):
            ix, iy = xs
            out = indexed_dispatch_body(
                sx, ivx, lensx, sy, ivy, lensy, ix, iy, s,
                gap_series=gap_series, mode=mode, traceback=traceback,
                backend=backend, qd=qd, replay=replay,
                onehot_x=onehot_x, onehot_y=onehot_y, A=A, mxp=mxp,
            )
            res = {
                k: jax.lax.all_gather(v, PAIR_AXIS, axis=0, tiled=True)
                for k, v in out.items()
                if k != "tb"
            }
            if "tb" in out:
                res["tb"] = out["tb"]
            return 0, res

        _, outs = jax.lax.scan(body, 0, (ix2, iy2))
        return outs

    fn = shard_map(run, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    return jax.jit(fn)


def sharded_indexed_multi_dispatch(mesh, sx, ivx, lensx, sy, ivy, lensy,
                                   ix2, iy2, s, *, gap_series, mode,
                                   traceback, backend, qd, replay, onehot_x,
                                   onehot_y, A, mxp="highest"):
    """n_sub stacked sub-batches (``ix2``/``iy2`` of shape (n_sub, B)) with
    the pair axis sharded; outputs gain a leading (n_sub,) axis."""
    key = _register_mesh(mesh)
    fn = _build_indexed_multi(key, tuple(gap_series), mode, traceback,
                              backend, qd, replay, onehot_x, onehot_y, A, mxp)
    return fn(sx, ivx, lensx, sy, ivy, lensy, ix2, iy2, s)


@functools.lru_cache(maxsize=32)
def _build_streamed(mesh_key, gap_series, mode, traceback, replay):
    """Sharded STREAMED dispatch (VERDICT r2 weak #4): oversized problems —
    past the Pallas lane ceiling or the materialized producer's budget —
    previously ran single-device even under a mesh; here the streamed
    scan (no hs tensor, any Lx/Ly) runs inside shard_map with the pair
    axis sharded, device replay included, so a long-skewed workload keeps
    every chip busy."""
    mesh = _MESHES[mesh_key]
    from ..kernels.replay import replay_moves
    from ..kernels.scan import wavefront_dp_streamed

    in_specs = (
        P(PAIR_AXIS, None, None),  # cx
        P(PAIR_AXIS, None),  # inv_x
        P(PAIR_AXIS, None, None),  # cy
        P(PAIR_AXIS, None),  # inv_y
        P(None, None),  # substitution matrix (replicated)
        P(PAIR_AXIS),  # lx
        P(PAIR_AXIS),  # ly
    )
    out_specs = {k: P() for k in ("score", "length", "ti", "tj", "tcode")}
    if replay:
        out_specs["moves"] = P()
        out_specs["nmoves"] = P()
    elif traceback:
        out_specs["tb"] = P(None, PAIR_AXIS, None)

    def run(cx, inv_x, cy, inv_y, s, lx, ly):
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
        res = {
            k: jax.lax.all_gather(v, PAIR_AXIS, axis=0, tiled=True)
            for k, v in out.items()
            if k != "tb"
        }
        if "tb" in out:
            res["tb"] = out["tb"]
        return res

    fn = shard_map(run, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    return jax.jit(fn)


def sharded_streamed_dispatch(mesh, cx, inv_x, cy, inv_y, s, lx, ly, *,
                              gap_series, mode, traceback, replay):
    """Streamed-producer batched DP with the pair axis sharded over
    ``mesh`` (batch must be a multiple of the pair-axis size)."""
    key = _register_mesh(mesh)
    fn = _build_streamed(key, tuple(gap_series), mode, traceback, replay)
    return fn(cx, inv_x, cy, inv_y, s, lx, ly)


@functools.lru_cache(maxsize=32)
def _build_ckpt(mesh_key, gap_series, mode, interval):
    """Sharded CHECKPOINTED giant-traceback dispatch: the O(L^1.5)-memory
    walk (kernels.scan.wavefront_dp_checkpointed) runs per shard with the
    pair axis sharded; only compact move tapes gather back."""
    mesh = _MESHES[mesh_key]
    from ..kernels.scan import wavefront_dp_checkpointed

    in_specs = (
        P(PAIR_AXIS, None, None), P(PAIR_AXIS, None),
        P(PAIR_AXIS, None, None), P(PAIR_AXIS, None),
        P(None, None), P(PAIR_AXIS), P(PAIR_AXIS),
    )
    out_specs = {k: P() for k in ("score", "length", "ti", "tj", "tcode",
                                  "moves", "nmoves")}

    def run(cx, inv_x, cy, inv_y, s, lx, ly):
        out = wavefront_dp_checkpointed(
            cx, inv_x, cy, inv_y, s, lx, ly,
            gap_series=gap_series, mode=mode, interval=interval,
        )
        return {
            k: jax.lax.all_gather(v, PAIR_AXIS, axis=0, tiled=True)
            for k, v in out.items()
        }

    fn = shard_map(run, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    return jax.jit(fn)


def sharded_ckpt_dispatch(mesh, cx, inv_x, cy, inv_y, s, lx, ly, *,
                          gap_series, mode, interval):
    """Checkpointed-traceback batched DP with the pair axis sharded."""
    key = _register_mesh(mesh)
    fn = _build_ckpt(key, tuple(gap_series), mode, int(interval))
    return fn(cx, inv_x, cy, inv_y, s, lx, ly)


@functools.lru_cache(maxsize=256)
def _build_chunk_step(mesh_key, gap_series, mode, traceback, b0, nb, first,
                      total_d, gather_tb=False):
    """One band chunk of the CHUNKED (oversized-Ly) route inside shard_map:
    the fused producer materializes only this chunk's score bands and the
    Pallas kernel resumes from the carried state, with the pair axis
    sharded — previously the chunked route fell back to the XLA scan under
    a mesh (STATUS r3 gap #4).  Carries stay sharded on device between
    chunk steps; terminals all-gather.  Traceback bits stay sharded on a
    single-process mesh (the host pulls its own shards per chunk); under a
    MULTI-PROCESS mesh ``gather_tb`` all-gathers each chunk's bits over the
    pair axis — the checkpointed-ring pattern of per-block bit all_gathers
    (dist.ring) applied per chunk — so every host can pull them and the
    Pallas body keeps running cross-process (round 5; previously the
    traceback half fell back to the XLA scan)."""
    mesh = _MESHES[mesh_key]
    from ..kernels.fused_scores import TILE, fused_skewed_scores
    from ..kernels.pallas_dp import wavefront_dp_pallas

    pp3 = P(PAIR_AXIS, None, None)
    pp2 = P(PAIR_AXIS, None)
    carry_specs = (P(None, PAIR_AXIS, None),) * 2 + (P(None, PAIR_AXIS, None),) * 2
    in_specs = (pp3, pp2, pp3, pp2, P(None, None), P(PAIR_AXIS), P(PAIR_AXIS))
    if not first:
        in_specs = in_specs + carry_specs
    out_specs = {k: P() for k in ("score", "length", "ti", "tj", "tcode")}
    out_specs["carry"] = carry_specs
    if traceback:
        out_specs["tb"] = P() if gather_tb else P(None, PAIR_AXIS, None)

    def run(cx, inv_x, cy, inv_y, s, lx, ly, *carry):
        hs = fused_skewed_scores(
            cx, inv_x, cy, inv_y, s, band_start=b0, n_bands=nb
        )
        out = wavefront_dp_pallas(
            hs, lx, ly, gap_series=gap_series, mode=mode,
            traceback=traceback, lengths=True, hs_body=True, chunked=True,
            first=first, d_base=2 + b0 * TILE, total_d=total_d,
            carry_in=carry if carry else None,
        )
        res = {
            k: jax.lax.all_gather(out[k], PAIR_AXIS, axis=0, tiled=True)
            for k in ("score", "length", "ti", "tj", "tcode")
        }
        res["carry"] = out["carry"]
        if traceback:
            res["tb"] = (
                jax.lax.all_gather(out["tb"], PAIR_AXIS, axis=1, tiled=True)
                if gather_tb
                else out["tb"]
            )
        return res

    fn = shard_map(run, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    return jax.jit(fn)


def sharded_chunked_dispatch(mesh, cx, inv_x, cy, inv_y, s, lx, ly, *,
                             gap_series, mode, traceback, chunk_bands=16,
                             gather_tb=False):
    """Chunked-diagonal batched DP (kernels.chunked semantics) with the pair
    axis sharded over ``mesh``; the batch must be a multiple of the mesh's
    pair-axis size (kernels.batch pads).  Returns the kernels.chunked result
    shape: terminals + ``tb_chunks`` (host numpy, per chunk).  Set
    ``gather_tb`` on multi-process meshes so the per-chunk bit pulls are
    addressable on every host."""
    import numpy as np

    from ..kernels.fused_scores import TILE

    key = _register_mesh(mesh)
    B, Lx, _ = cx.shape
    Ly = cy.shape[1]
    D = Lx + Ly + 1
    total_bands = -(-(D - 2) // TILE)
    total_d = 2 + total_bands * TILE

    carry = None
    tb_chunks: list = []
    res = None
    for b0 in range(0, total_bands, chunk_bands):
        nb = min(chunk_bands, total_bands - b0)
        fn = _build_chunk_step(key, tuple(gap_series), mode, bool(traceback),
                               b0, nb, b0 == 0, total_d,
                               gather_tb=bool(gather_tb))
        args = (cx, inv_x, cy, inv_y, s, lx, ly)
        if carry is not None:
            args = args + tuple(carry)
        res = fn(*args)
        carry = res["carry"]
        if traceback:
            tb_chunks.append(np.asarray(res["tb"]))

    result = {k: res[k] for k in ("score", "length", "ti", "tj", "tcode")}
    if traceback:
        result["tb_chunks"] = tb_chunks
    return result


@functools.lru_cache(maxsize=32)
def _build_tracks(mesh_key, gap_series, mode, traceback, weights, steps, T,
                  mxp="highest"):
    """Sharded MULTI-TRACK dispatch: the composite indexed body
    (kernels.batch.composite_dispatch_body) inside shard_map with the pair
    axis sharded; per-track stacks replicate, index vectors shard, and
    terminals + move tapes gather back."""
    mesh = _MESHES[mesh_key]
    from ..kernels.batch import composite_dispatch_body

    rep = P()
    reps = tuple(rep for _ in range(T))
    in_specs = (reps, reps, rep, reps, reps, rep,
                P(PAIR_AXIS), P(PAIR_AXIS), reps)
    out_specs = {k: rep for k in ("score", "length", "ti", "tj", "tcode")}
    if traceback:
        out_specs["moves"] = rep
        out_specs["nmoves"] = rep

    def run(sxs, ivxs, lensx, sys_, ivys, lensy, ix, iy, ss):
        out = composite_dispatch_body(
            sxs, ivxs, lensx, sys_, ivys, lensy, ix, iy, ss,
            gap_series=gap_series, mode=mode, traceback=traceback,
            weights=weights, steps=steps, mxp=mxp,
        )
        return {
            k: jax.lax.all_gather(v, PAIR_AXIS, axis=0, tiled=True)
            for k, v in out.items()
        }

    fn = shard_map(run, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    return jax.jit(fn)


def sharded_tracks_dispatch(mesh, sxs, ivxs, lensx, sys_, ivys, lensy,
                            ix, iy, ss, *, gap_series, mode, traceback,
                            weights, steps, mxp="highest"):
    """Multi-track composite batched DP with the pair axis sharded."""
    key = _register_mesh(mesh)
    fn = _build_tracks(key, tuple(gap_series), mode, traceback,
                       tuple(weights), int(steps), len(ss), mxp)
    return fn(sxs, ivxs, lensx, sys_, ivys, lensy, ix, iy, ss)
