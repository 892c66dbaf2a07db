"""Fused score-matrix + skew producer (Pallas, SURVEY.md §9 P2 follow-on).

Produces the same skewed score tensor as kernels.scores.skewed_pair_scores,
but the pair score matrix H = Cx @ S @ Cy^T never touches HBM: each grid
step computes transposed H tiles for a block of PB=32 problems directly on
the MXU (``H^T = Cy_tile @ T_tile^T`` — the operand swap IS the transpose)
and skews them on the VPU with a 7-pass barrel roll over the concatenated
256-row stacks, writing one (128, 32, 128) block of the diagonal-major
output.  HBM traffic drops from ~16 B/cell (H write + gather read + hs
write on the XLA path) to ~4 B/cell.  Operand tiles are DMA-shaped: the
alphabet axis rides SUBLANES (A padded to a multiple of 8) with sequence
positions in lanes, and the inverse vectors ride lane-major blocks — the
naive (128, A=23) and (128, 1) blocks padded their minor dim to 128 lanes
and were ~40% of producer wall-clock in DMA alone.

Geometry: hs[d, b, i] = H[i-1, d-i-1].  With lane block i = i0 + il,
diagonal block d = d0 + dloc (d0 = 2 + 128*s, i0 = 128*ib), the needed H
column is c = 128*(s - ib) + (dloc - il) + 1.  Substituting the shifted
operand CyS[p] = Cy[p - 127] (127 zero rows on the left) gives
p = c + 127 = 128*(s - ib + 1) + (dloc - il), and (dloc - il) spans
(-128, 128) — exactly the two aligned CyS tiles (s - ib) and (s - ib + 1).
Stacking V = [H_hi^T; H_lo^T] (256 rows), output[dloc, il] =
V[(dloc - il) mod 256, il]: a circular roll down by il per column, applied
as 7 masked power-of-two rolls.

The pinned (H_int * inv_x) * inv_y scaling happens in-kernel as two
multiplies on the pre-roll tiles (inv_x over lanes, inv_y over rows; the
roll permutes but never re-rounds) — their results feed rolls/selects and
the HBM store, never an add, so no excess-precision contraction can fuse
in and values are bit-identical to the XLA path (parity-tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HIGHEST = jax.lax.Precision.HIGHEST
TILE = 128
# Problems per grid step (sublane-aligned output blocks).  Round 4: 16
# beats the round-2 choice of 32 on the v5e for BOTH the classic and the
# strip producer (+4-6% — finer grid pipelining; tools/onchip_producer_probe
# and /tmp sweep logged in STATUS), with identical values (the barrel roll
# itself measures ~free: `norolls` is not faster).  Round 5: the producer
# floors at ~65 ms/headline-set regardless of dots/roll/scale/write-width
# (tools/onchip_prodroll.py) — per-grid-step overhead — so PRALINE_PB
# re-opens the block-size A/B (read at import; timing experiments only).
import os as _os

PB = int(_os.environ.get("PRALINE_PB", "16"))


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _pack_operands(cx, inv_x, cy, inv_y, s, t_precision=HIGHEST):
    """DMA-shaped producer operands (shared with the fully fused
    producer+DP kernel, kernels.fused_dp).

    The alphabet axis packs into SUBLANES (pad A -> multiple of 8, ~4%
    waste) with sequence positions in lanes, instead of A=23 lanes padded
    to 128 (5.6x waste); the inverse vectors ride lane-major (128 lanes)
    blocks with a full 8-sublane tile (row 0 live) instead of (TILE, 1)
    blocks whose single lane pads 128x.  The naive layouts were ~30% of
    producer wall-clock in DMA alone.

    Returns ``(tp4, cy4, invx4, invy4, LxT, CT, I, A8)`` where
    ``tp4[b, i, a, l]`` holds (Cx @ S) with a leading zero row (lane i =
    T row i-1), and ``cy4`` is Cy shifted 127 zero rows down (the two
    aligned tiles (s - i) and (s - i + 1) cover a diagonal band's window).
    """
    B, Lx, A = cx.shape
    Ly = cy.shape[1]
    Lp = Lx + 1

    t = jnp.einsum("bxa,ac->bxc", cx, s, precision=t_precision)
    # T_pad: leading zero row aligns lane i with T row i-1.
    LxT = _ceil_to(Lp, TILE)
    tp = jnp.zeros((B, LxT, A), jnp.float32).at[:, 1 : Lx + 1, :].set(t)

    # CyS: 127 zero rows, then Cy, right-padded to a tile multiple.
    rows = _ceil_to(127 + Ly, TILE)
    cys = jnp.zeros((B, rows, A), jnp.float32).at[:, 127 : 127 + Ly, :].set(cy)
    CT = rows // TILE
    I = LxT // TILE

    A8 = _ceil_to(A, 8)
    tp4 = jnp.pad(
        jnp.transpose(tp.reshape(B, I, TILE, A), (0, 1, 3, 2)),
        ((0, 0), (0, 0), (0, A8 - A), (0, 0)),
    )
    cy4 = jnp.pad(
        jnp.transpose(cys.reshape(B, CT, TILE, A), (0, 1, 3, 2)),
        ((0, 0), (0, 0), (0, A8 - A), (0, 0)),
    )
    invx4 = jnp.zeros((B, I, 8, TILE), jnp.float32)
    invx4 = invx4.at[:, :, 0, :].set(
        jnp.ones((B, I * TILE), jnp.float32)
        .at[:, 1 : Lx + 1].set(inv_x).reshape(B, I, TILE)
    )
    invy4 = jnp.zeros((B, CT, 8, TILE), jnp.float32)
    invy4 = invy4.at[:, :, 0, :].set(
        jnp.ones((B, CT * TILE), jnp.float32)
        .at[:, 127 : 127 + Ly].set(inv_y).reshape(B, CT, TILE)
    )
    return tp4, cy4, invx4, invy4, LxT, CT, I, A8


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "scaled", "interpret", "band_start", "n_bands",
                     "mxu_precision", "layout"),
)
def fused_skewed_scores(
    cx: jax.Array,  # f32[B, Lx, A] integer-valued counts
    inv_x: jax.Array,  # f32[B, Lx]
    cy: jax.Array,  # f32[B, Ly, A]
    inv_y: jax.Array,  # f32[B, Ly]
    s: jax.Array,  # f32[A, A]
    out_dtype=jnp.float32,
    scaled: bool = True,
    interpret: bool | None = None,
    band_start: int = 0,
    n_bands: int | None = None,
    mxu_precision: str = "highest",
    layout: str = "dmajor",
):
    """Body-layout skewed scores: returns ``hs_body[t, b, i]`` holding the
    scores of diagonal ``d = t + 2`` (row t), lanes padded to a multiple of
    128.  Values are identical to ``skewed_pair_scores(...)[2:, :, :Lp]``.

    ``layout="bmajor"`` returns the transposed ``hs_body[b, t, i]`` form
    instead: the MXU emits (PB, 256, 128) H-tile stacks directly, so the
    b-major block needs NO per-step (PB, 256, 128) transpose — the barrel
    roll runs on the sublane axis — and the grid walks (b, i, s) so the T
    self-tiles and inv_x blocks are fetched once per (b, i) instead of once
    per band (the d-major grid refetched them S times).  Round-4
    measurement on the v5e: see tools/onchip_hslayout.py.

    ``scaled=False`` skips the inverse multiplies (one-hot/integer scores)
    and can emit int8/int16 via ``out_dtype``.

    ``mxu_precision="fast"`` runs the T matmul at DEFAULT (one bf16 pass)
    and the in-kernel H matmul at HIGH (three passes) — EXACT, and
    therefore bit-identical to "highest", whenever the caller guarantees
    (kernels.batch checks via the profile arena's count/total records):

    * every count is an integer <= 256 (bf16-representable, so each MXU
      product of bf16-exact inputs is exact and the T pass needs no
      splitting), and |S| entries are integers <= 256;
    * every |T| value < 2**15 (max column total x max |S|), so the bf16_3x
      split T = T_hi + T_lo is exact and HIGH's three passes reproduce the
      full product against bf16-exact counts (the dropped lo*lo term is
      zero because the counts side has no lo part).

    Validated compiled-on-chip against the "highest" path by
    tools/onchip_parity.py, including counts at the 256/2**15 bounds.
    """
    if mxu_precision not in ("highest", "fast", "fast1"):
        raise ValueError(f"unknown mxu_precision {mxu_precision!r}")
    if layout not in ("dmajor", "bmajor"):
        raise ValueError(f"unknown layout {layout!r}")
    bmajor = layout == "bmajor"
    fast = mxu_precision != "highest"
    t_prec = jax.lax.Precision.DEFAULT if fast else HIGHEST
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, Lx, A = cx.shape
    Ly = cy.shape[1]
    D = Lx + Ly + 1
    Lp = Lx + 1

    B_run = _ceil_to(B, PB)
    if B_run != B:
        pad = B_run - B
        cx = jnp.pad(cx, ((0, pad), (0, 0), (0, 0)))
        inv_x = jnp.pad(inv_x, ((0, pad), (0, 0)), constant_values=1.0)
        cy = jnp.pad(cy, ((0, pad), (0, 0), (0, 0)))
        inv_y = jnp.pad(inv_y, ((0, pad), (0, 0)), constant_values=1.0)

    tp4, cy4, invx4, invy4, LxT, CT, I, A8 = _pack_operands(
        cx, inv_x, cy, inv_y, s, t_precision=t_prec
    )
    if fast:
        # Manual two-pass split (Mosaic supports only DEFAULT/HIGHEST dot
        # precision): T = T_hi + T_lo with T_hi the multiple of 128 below
        # T — both parts and the counts are bf16-exact under the caller's
        # bounds (|T| < 2**15 makes |T_hi|/128 <= 256), so two single-pass
        # bf16 matmuls reproduce the HIGHEST result exactly while shipping
        # HALF the operand bytes.  The split runs in INTEGER arithmetic:
        # the float form (T - f32(bf16(T))) gets ELIDED to zero by XLA's
        # excess-precision pass, which treats f32->bf16->f32 as identity
        # (observed on the v5e).
        if mxu_precision == "fast1":
            # Single-pass tier (round 5): every |T| <= 256 integer is
            # bf16-EXACT, so no split is needed at all — ONE bf16 pass
            # reproduces HIGHEST bit-for-bit (products of bf16-exact
            # integers are exact in the f32 accumulator).  Admission:
            # kernels.batch.fast_mxu_tier proves the bound from the
            # arena's exact per-stack |T| maxima.
            tp_ops = (tp4.astype(jnp.int32).astype(jnp.bfloat16),)
        else:
            ti = tp4.astype(jnp.int32)
            hi_i = (ti // 128) * 128
            tp_ops = (
                hi_i.astype(jnp.bfloat16),
                (ti - hi_i).astype(jnp.bfloat16),
            )
        cy4 = cy4.astype(jnp.bfloat16)
    else:
        tp_ops = (tp4,)

    total_bands = -(-(D - 2) // TILE)
    S_steps = total_bands - band_start if n_bands is None else n_bands

    if bmajor:
        # Grid (b, i, s): the T self-tiles and inv_x blocks depend only on
        # (b, i) and stay resident across the whole band sweep.
        def G(f):
            return lambda b, i, s_: f(b, s_, i)
    else:
        def G(f):
            return f

    def self_tile(b, s_, i):
        return (b, i, 0, 0)

    def lo_tile(b, s_, i):
        return (b, jnp.clip(band_start + s_ - i, 0, CT - 1), 0, 0)

    def hi_tile(b, s_, i):
        return (b, jnp.clip(band_start + s_ - i + 1, 0, CT - 1), 0, 0)

    def iv_self(b, s_, i):
        return (b, i, 0, 0)

    def iv_lo(b, s_, i):
        return (b, jnp.clip(band_start + s_ - i, 0, CT - 1), 0, 0)

    def iv_hi(b, s_, i):
        return (b, jnp.clip(band_start + s_ - i + 1, 0, CT - 1), 0, 0)

    n_tp = len(tp_ops)

    def kernel(*refs):
        tp_refs = refs[:n_tp]
        cylo_ref, cyhi_ref = refs[n_tp : n_tp + 2]
        refs = refs[n_tp + 2 :]
        invx_ref, ivlo_ref, ivhi_ref, out_ref = refs
        if bmajor:
            s_id = pl.program_id(2) + band_start
            i_blk = pl.program_id(1)
        else:
            s_id = pl.program_id(1) + band_start
            i_blk = pl.program_id(2)
        c_lo = s_id - i_blk
        c_hi = c_lo + 1

        ok_lo = (c_lo >= 0) & (c_lo < CT)
        ok_hi = (c_hi >= 0) & (c_hi < CT)
        zero = jnp.zeros((), cylo_ref.dtype)
        cylo = jnp.where(ok_lo, cylo_ref[:, 0], zero)
        cyhi = jnp.where(ok_hi, cyhi_ref[:, 0], zero)

        # Batched transposed H tiles straight off the MXU: one
        # (PB, A8, 256) x (PB, A8, 128) sublane-contraction per grid step
        # covers both cy tiles.
        dn = (((1,), (1,)), ((0,), (0,)))
        cyc = jnp.concatenate([cyhi, cylo], axis=2)
        extra = {} if fast else dict(precision=HIGHEST)
        h2 = jax.lax.dot_general(
            cyc, tp_refs[0][:, 0], dn,
            preferred_element_type=jnp.float32, **extra,
        )
        for tp_ref in tp_refs[1:]:
            h2 = h2 + jax.lax.dot_general(
                cyc, tp_ref[:, 0], dn,
                preferred_element_type=jnp.float32,
            )
        h_hi, h_lo = h2[:, :TILE], h2[:, TILE:]
        if scaled:
            # Pinned order (H_int * inv_x) * inv_y applied on the UNROLLED
            # tiles: inv_x broadcasts over lanes (axis 2), inv_y over rows
            # (axis 1), so every element sees the same two multiplies in
            # the same order as the post-roll form — bit-identical — while
            # only ONE stack rides the 7-pass barrel roll.  Out-of-range
            # tiles need no masking: their H rows are already zero and the
            # clamped iv reads are finite, so 0 * iv == 0.
            ivx = invx_ref[:, 0, 0][:, None, :]
            h_hi = (h_hi * ivx) * ivhi_ref[:, 0, 0][:, :, None]
            h_lo = (h_lo * ivx) * ivlo_ref[:, 0, 0][:, :, None]
        if bmajor:
            # No transpose: the MXU's (PB, 256, 128) tile stack IS the
            # b-major block layout; the barrel roll runs on the sublane
            # axis.
            stack = jnp.concatenate([h_hi, h_lo], axis=1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (PB, 2 * TILE, TILE), 2)
            for bit in range(7):  # il in [0, 128)
                amt = 1 << bit
                take = (lane & amt) != 0
                stack = jnp.where(take, pltpu.roll(stack, amt, 1), stack)
            out_ref[:, :, :] = stack[:, :TILE].astype(out_dtype)
            return
        # (PB, 256, 128) -> (256, PB, 128): barrel axis leads, block layout
        # matches the (dloc, b, il) output directly.
        stack = jnp.transpose(jnp.concatenate([h_hi, h_lo], axis=1), (1, 0, 2))

        lane = jax.lax.broadcasted_iota(jnp.int32, (2 * TILE, PB, TILE), 2)
        for bit in range(7):  # il in [0, 128)
            amt = 1 << bit
            take = (lane & amt) != 0
            stack = jnp.where(take, pltpu.roll(stack, amt, 0), stack)

        out_ref[:, :, :] = stack[:TILE].astype(out_dtype)

    spec_a = lambda f: pl.BlockSpec((PB, 1, A8, TILE), G(f), memory_space=pltpu.VMEM)
    spec_1 = lambda f: pl.BlockSpec((PB, 1, 8, TILE), G(f), memory_space=pltpu.VMEM)
    in_specs = [spec_a(self_tile) for _ in tp_ops] + [
        spec_a(lo_tile),
        spec_a(hi_tile),
        spec_1(iv_self),
        spec_1(iv_lo),
        spec_1(iv_hi),
    ]
    if bmajor:
        out_spec = pl.BlockSpec(
            (PB, TILE, TILE), G(lambda b, s_, i: (b, s_, i)),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((B_run, S_steps * TILE, LxT), out_dtype)
        grid = (B_run // PB, I, S_steps)
    else:
        out_spec = pl.BlockSpec(
            (TILE, PB, TILE), lambda b, s_, i: (s_, b, i), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((S_steps * TILE, B_run, LxT), out_dtype)
        grid = (B_run // PB, S_steps, I)
    hs_body = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=bool(interpret),
    )(*tp_ops, cy4, cy4, invx4, invy4, invy4)
    return hs_body[:B] if bmajor else hs_body[:, :B, :]


@functools.partial(
    jax.jit,
    static_argnames=("K", "R", "out_dtype", "scaled", "interpret",
                     "mxu_precision", "layout", "debug_skip"),
)
def fused_skewed_scores_strip(
    cx: jax.Array,  # f32[B, Lx, A] integer-valued counts, B = B_slots * R
    inv_x: jax.Array,  # f32[B, Lx]
    cy: jax.Array,  # f32[B, Ly, A]
    inv_y: jax.Array,  # f32[B, Ly]
    s: jax.Array,  # f32[A, A]
    K: int,
    R: int,
    out_dtype=jnp.float32,
    scaled: bool = True,
    interpret: bool | None = None,
    mxu_precision: str = "highest",
    layout: str = "dmajor",
    debug_skip: tuple[str, ...] = (),
):
    """Strip-packed skewed scores (kernels.strip): R problems share one
    problem-row, problem ``r`` of a slot occupying global strip columns
    ``[r*K, r*K + Ly]`` — strip row ``d``, lane ``i`` holds
    ``H_r[i-1, jl-1]`` with ``jg = d - i``, ``r = jg // K``,
    ``jl = jg mod K``.  Problems enter as slot-major groups of R
    (problem ``p = slot*R + r``).

    Geometry: with strip steps based at d=0 the window shift is 128
    (p = 128 + d - i), so the two-aligned-tile trick of
    :func:`fused_skewed_scores` carries over with the SAME index maps
    (c_lo = s - ib), and because ``K`` is a multiple of 128 every cys tile's
    live rows belong to exactly ONE problem — the x-side operands are
    fetched per tile at ``r(c) = (c - 1) // (K // 128)``.  Values are
    bit-identical to the per-problem producer: splitting the concatenated
    cy-row axis into two dots changes no per-element contraction.

    Output rows cover strip steps [0, ceil((R*K + Lx + 1)/128)*128).
    """
    if mxu_precision not in ("highest", "fast", "fast1"):
        raise ValueError(f"unknown mxu_precision {mxu_precision!r}")
    if layout not in ("dmajor", "bmajor"):
        raise ValueError(f"unknown layout {layout!r}")
    if K % TILE:
        raise ValueError("strip slot stride K must be a multiple of 128")
    bmajor = layout == "bmajor"
    fast = mxu_precision != "highest"
    t_prec = jax.lax.Precision.DEFAULT if fast else HIGHEST
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, Lx, A = cx.shape
    Ly = cy.shape[1]
    Lp = Lx + 1
    if B % R:
        raise ValueError("problem count must be a multiple of R (slot-major)")
    if Ly + 1 > K or Lp > K:
        raise ValueError("strip stride K must cover Ly+1 and Lx+1")
    Bs = B // R
    KT = K // TILE

    Bs_run = _ceil_to(Bs, PB)
    if Bs_run != Bs:
        pad = (Bs_run - Bs) * R
        cx = jnp.pad(cx, ((0, pad), (0, 0), (0, 0)))
        inv_x = jnp.pad(inv_x, ((0, pad), (0, 0)), constant_values=1.0)
        cy = jnp.pad(cy, ((0, pad), (0, 0), (0, 0)))
        inv_y = jnp.pad(inv_y, ((0, pad), (0, 0)), constant_values=1.0)

    # x-side packing is identical to the per-problem producer; the unused
    # y-side outputs are dead code XLA eliminates.
    tp4, _, invx4, _, LxT, _, I, A8 = _pack_operands(
        cx, inv_x, cy, inv_y, s, t_precision=t_prec
    )
    tp5 = tp4.reshape(Bs_run, R, I, A8, TILE)
    invx5 = invx4.reshape(Bs_run, R, I, 8, TILE)
    if mxu_precision == "fast1":
        # Single-pass tier: |T| <= 256 integers are bf16-exact — see
        # fused_skewed_scores.
        tp_ops = (tp5.astype(jnp.int32).astype(jnp.bfloat16),)
    elif fast:
        # Same integer split as fused_skewed_scores (see its docstring).
        ti = tp5.astype(jnp.int32)
        hi_i = (ti // 128) * 128
        tp_ops = (
            hi_i.astype(jnp.bfloat16),
            (ti - hi_i).astype(jnp.bfloat16),
        )
    else:
        tp_ops = (tp5,)

    # Strip cys: Cy_r[q] at row 129 + r*K + q (128 zero rows in front, one
    # border row per slot, dead slot rows zero); inv_y rides the same rows
    # over a base of ones (dead-row H is zero, 0 * 1 == 0).
    blk = jnp.zeros((Bs_run, R, K, A), jnp.float32)
    blk = blk.at[:, :, 1 : Ly + 1, :].set(cy.reshape(Bs_run, R, Ly, A))
    cys = jnp.concatenate(
        [
            jnp.zeros((Bs_run, TILE, A), jnp.float32),
            blk.reshape(Bs_run, R * K, A),
            jnp.zeros((Bs_run, TILE, A), jnp.float32),
        ],
        axis=1,
    )
    CT = cys.shape[1] // TILE
    cy4 = jnp.pad(
        jnp.transpose(cys.reshape(Bs_run, CT, TILE, A), (0, 1, 3, 2)),
        ((0, 0), (0, 0), (0, A8 - A), (0, 0)),
    )
    if fast:
        cy4 = cy4.astype(jnp.bfloat16)
    ivblk = jnp.ones((Bs_run, R, K), jnp.float32)
    ivblk = ivblk.at[:, :, 1 : Ly + 1].set(inv_y.reshape(Bs_run, R, Ly))
    ivrows = jnp.concatenate(
        [
            jnp.ones((Bs_run, TILE), jnp.float32),
            ivblk.reshape(Bs_run, R * K),
            jnp.ones((Bs_run, TILE), jnp.float32),
        ],
        axis=1,
    )
    invy4 = jnp.zeros((Bs_run, CT, 8, TILE), jnp.float32)
    invy4 = invy4.at[:, :, 0, :].set(ivrows.reshape(Bs_run, CT, TILE))

    D_strip = R * K + Lp  # steps d in [0, R*K + Lx]
    S_steps = -(-D_strip // TILE)

    if bmajor:
        def G(f):
            return lambda b, i, s_: f(b, s_, i)
    else:
        def G(f):
            return f

    def _rc(c):
        return jnp.clip((jnp.clip(c, 0, CT - 1) - 1) // KT, 0, R - 1)

    def tp_lo(b, s_, i):
        return (b, _rc(s_ - i), i, 0, 0)

    def tp_hi(b, s_, i):
        return (b, _rc(s_ - i + 1), i, 0, 0)

    def lo_tile(b, s_, i):
        return (b, jnp.clip(s_ - i, 0, CT - 1), 0, 0)

    def hi_tile(b, s_, i):
        return (b, jnp.clip(s_ - i + 1, 0, CT - 1), 0, 0)

    n_tp = len(tp_ops)

    def kernel(*refs):
        tplo_refs = refs[:n_tp]
        tphi_refs = refs[n_tp : 2 * n_tp]
        cylo_ref, cyhi_ref = refs[2 * n_tp : 2 * n_tp + 2]
        ivxlo_ref, ivxhi_ref, ivlo_ref, ivhi_ref, out_ref = refs[2 * n_tp + 2 :]
        if bmajor:
            s_id = pl.program_id(2)
            i_blk = pl.program_id(1)
        else:
            s_id = pl.program_id(1)
            i_blk = pl.program_id(2)
        c_lo = s_id - i_blk
        c_hi = c_lo + 1

        ok_lo = (c_lo >= 0) & (c_lo < CT)
        ok_hi = (c_hi >= 0) & (c_hi < CT)
        zero = jnp.zeros((), cylo_ref.dtype)
        cylo = jnp.where(ok_lo, cylo_ref[:, 0], zero)
        cyhi = jnp.where(ok_hi, cyhi_ref[:, 0], zero)

        # Per-tile problem operands: the hi/lo cy tiles may belong to
        # different problems of the slot, so each gets its own T (and
        # inv_x) fetch — two half dots instead of one concatenated dot,
        # same per-element contractions.
        dn = (((1,), (1,)), ((0,), (0,)))
        extra = {} if fast else dict(precision=HIGHEST)
        h_hi = jax.lax.dot_general(
            cyhi, tphi_refs[0][:, 0, 0], dn,
            preferred_element_type=jnp.float32, **extra,
        )
        h_lo = jax.lax.dot_general(
            cylo, tplo_refs[0][:, 0, 0], dn,
            preferred_element_type=jnp.float32, **extra,
        )
        for thi, tlo in zip(tphi_refs[1:], tplo_refs[1:]):
            h_hi = h_hi + jax.lax.dot_general(
                cyhi, thi[:, 0, 0], dn,
                preferred_element_type=jnp.float32,
            )
            h_lo = h_lo + jax.lax.dot_general(
                cylo, tlo[:, 0, 0], dn,
                preferred_element_type=jnp.float32,
            )
        # debug_skip ("roll"/"scale"/"dots"): timing probes ONLY — outputs
        # are wrong with any set (tools/onchip_prodroll.py bounds each
        # stage's share of producer wall-clock).
        if "dots" in debug_skip:
            # keep a data dependency on the fetched tiles so DMA stays
            h_hi = cyhi[:, :1, :].astype(jnp.float32) * 0.0 + jnp.zeros(
                (PB, TILE, TILE), jnp.float32
            )
            h_lo = cylo[:, :1, :].astype(jnp.float32) * 0.0 + h_hi
        if scaled and "scale" not in debug_skip:
            h_hi = (h_hi * ivxhi_ref[:, 0, 0, 0][:, None, :]) * ivhi_ref[:, 0, 0][:, :, None]
            h_lo = (h_lo * ivxlo_ref[:, 0, 0, 0][:, None, :]) * ivlo_ref[:, 0, 0][:, :, None]
        roll_bits = () if "roll" in debug_skip else tuple(range(7))
        if bmajor:
            stack = jnp.concatenate([h_hi, h_lo], axis=1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (PB, 2 * TILE, TILE), 2)
            for bit in roll_bits:
                amt = 1 << bit
                take = (lane & amt) != 0
                stack = jnp.where(take, pltpu.roll(stack, amt, 1), stack)
            out_ref[:, :, :] = stack[:, :TILE].astype(out_dtype)
            return
        stack = jnp.transpose(jnp.concatenate([h_hi, h_lo], axis=1), (1, 0, 2))
        lane = jax.lax.broadcasted_iota(jnp.int32, (2 * TILE, PB, TILE), 2)
        for bit in roll_bits:
            amt = 1 << bit
            take = (lane & amt) != 0
            stack = jnp.where(take, pltpu.roll(stack, amt, 0), stack)
        out_ref[:, :, :] = stack[:TILE].astype(out_dtype)

    spec_tp = lambda f: pl.BlockSpec(
        (PB, 1, 1, A8, TILE), G(f), memory_space=pltpu.VMEM
    )
    spec_cy = lambda f: pl.BlockSpec(
        (PB, 1, A8, TILE), G(f), memory_space=pltpu.VMEM
    )
    spec_ivx = lambda f: pl.BlockSpec(
        (PB, 1, 1, 8, TILE), G(f), memory_space=pltpu.VMEM
    )
    spec_ivy = lambda f: pl.BlockSpec(
        (PB, 1, 8, TILE), G(f), memory_space=pltpu.VMEM
    )
    in_specs = (
        [spec_tp(tp_lo) for _ in tp_ops]
        + [spec_tp(tp_hi) for _ in tp_ops]
        + [spec_cy(lo_tile), spec_cy(hi_tile)]
        + [spec_ivx(tp_lo), spec_ivx(tp_hi)]
        + [spec_ivy(lo_tile), spec_ivy(hi_tile)]
    )
    if bmajor:
        out_spec = pl.BlockSpec(
            (PB, TILE, TILE), G(lambda b, s_, i: (b, s_, i)),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((Bs_run, S_steps * TILE, LxT), out_dtype)
        grid = (Bs_run // PB, I, S_steps)
    else:
        out_spec = pl.BlockSpec(
            (TILE, PB, TILE), lambda b, s_, i: (s_, b, i), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((S_steps * TILE, Bs_run, LxT), out_dtype)
        grid = (Bs_run // PB, S_steps, I)
    hs_body = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=bool(interpret),
    )(*tp_ops, *tp_ops, cy4, cy4, invx5, invx5, invy4, invy4)
    return hs_body[:Bs] if bmajor else hs_body[:, :Bs, :]
