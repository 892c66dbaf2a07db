"""Register-tiled multi-diagonal Pallas wavefront DP (SURVEY.md §9 P2).

Same contract and bit-exact semantics as kernels.pallas_dp.wavefront_dp_pallas
on the fused producer's body layout (the parity tests enforce this), but the
grid walks ``(batch_block, diagonal_block, lane_tile)`` and each lane-tile
visit advances ``T`` anti-diagonals with the DP state held in vector
registers:

* scratch state rows are shaped ``(n_tiles, Bblk, 128)`` and are read ONCE
  and written ONCE per ``T`` diagonals instead of once per diagonal — the
  classic kernel is VMEM-row-traffic bound at ~65% of the measured ~2 TB/s
  roofline (STATUS.md round 3), and this cuts that traffic ~``T``-fold;
* the wavefront's cross-lane dependency is carried between lane tiles by
  per-step right-edge columns: tile ``j`` saves its pre-step lane-127 value
  for every local step ``t`` into ``(T, Bblk, 1)`` edge buffers, and tile
  ``j + 1`` (the next grid iteration — the lane axis is the fastest grid
  dimension) shifts them in at its own step ``t``;
* the previous diagonal's best rows (``r1v/r1l/r1c`` in the classic kernel)
  are not carried at all: the best at ``d-1`` is recomputed from the carried
  ``m1/ix1/iy1`` rows with the same priority chain that produced it, which
  is bit-identical and trades two vector max/select chains for three row
  round-trips per step.

Restrictions (the batch driver routes around them): body-layout ``hs`` only,
``len(gap_series) <= 2`` (the collapsed 3-state Gotoh and the single-level
series; longer series keep the classic per-level kernel), no chunked-carry
execution.  Tie-breaks, border semantics, terminal tracking and traceback
bit packing are identical to kernels.pallas_dp (see §8.3/§8.4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scan import _gap_prefix

NEG = np.float32(-1.0e30)
TILE = 128


def _row_names(lengths: bool, traceback: bool, k: int) -> list[str]:
    names = ["m1", "ix1", "iy1", "r2v"]
    if lengths:
        names += ["lm1", "lix1", "liy1", "r2l"]
    if traceback:
        names += ["r2c"]
        if k == 2:
            names += ["psx", "psy"]
    return names


def _edge_names(lengths: bool, traceback: bool, k: int) -> list[str]:
    # Quantities shifted across the lane-tile boundary each step: the
    # previous diagonal's M / Ix rows, best-of-two-ago, and their
    # length/code/stay companions.
    names = ["e_m", "e_ix", "e_b2"]
    if lengths:
        names += ["e_lm", "e_lix", "e_lb2"]
    if traceback:
        names += ["e_cb2"]
        if k == 2:
            names += ["e_psx"]
    return names


def tiled_supported(gap_series, chunked: bool = False) -> bool:
    """Admission predicate mirrored by the batch driver's routing."""
    return len(gap_series) <= 2 and not chunked


def _make_kernel(n_db, n_tiles, Bblk, T, k, gap_series, mode, lengths,
                 traceback, quantized, d_base):
    g = [np.float32(x) for x in gap_series]
    collapsed = k == 2
    local = mode == "local"
    semi = mode == "semiglobal"
    border_m = np.float32(0.0 if local else NEG)
    row_names = _row_names(lengths, traceback, k)
    edge_names = _edge_names(lengths, traceback, k)

    def prio(m, ix, iy, lm=None, lix=None, liy=None, codes=False,
             code_x=None, code_y=None):
        """Best state with M > Ix > Iy tie preference (single-level form —
        k <= 2 is the admission contract)."""
        if code_x is None:
            code_x = 1
        if code_y is None:
            code_y = 1 + k
        v, ln = m, lm
        c = jnp.zeros((Bblk, TILE), jnp.int32) if codes else None
        b = ix > v
        v = jnp.where(b, ix, v)
        if ln is not None:
            ln = jnp.where(b, lix, ln)
        if codes:
            c = jnp.where(b, code_x, c)
        b = iy > v
        v = jnp.where(b, iy, v)
        if ln is not None:
            ln = jnp.where(b, liy, ln)
        if codes:
            c = jnp.where(b, code_y, c)
        return v, ln, c

    def kernel(cum_ref, hs_ref, lx_ref, ly_ref, score_ref, len_ref, ti_ref,
               tj_ref, tcode_ref, tb_ref, *scr):
        S = dict(zip(row_names + edge_names
                     + ["tval", "tis", "tjs", "tlen", "tcs"], scr))
        db = pl.program_id(1)
        j = pl.program_id(2)
        first_tile = j == 0
        lane = jax.lax.broadcasted_iota(jnp.int32, (Bblk, TILE), 1)
        glane = lane + j * TILE
        lx = lx_ref[:, :]  # (Bblk, 1)
        ly = ly_ref[:, :]
        negs = jnp.full((Bblk, TILE), NEG, jnp.float32)
        zeros = jnp.zeros((Bblk, TILE), jnp.float32)
        izeros = jnp.zeros((Bblk, TILE), jnp.int32)

        @pl.when(db == 0)
        def _init():
            # Diagonal-1 state per tile, same semantics as the classic
            # kernel's _init but with the GLOBAL lane index.
            m1v = jnp.where((glane == 0) | (glane == 1), border_m, negs)
            ix0, iy0 = negs, negs
            lx0, ly0 = zeros, zeros
            if not local:
                bval = np.float32(0.0) if semi else -cum_ref[0, 1]
                ix0 = jnp.where(glane == 1, bval, negs)
                iy0 = jnp.where(glane == 0, bval, negs)
                lx0 = jnp.where(glane == 1, 1.0, zeros)
                ly0 = jnp.where(glane == 0, 1.0, zeros)
            S["m1"][j] = m1v
            S["ix1"][j] = ix0
            S["iy1"][j] = iy0
            S["r2v"][j] = jnp.where(glane == 0, 0.0, negs)
            if lengths:
                S["lm1"][j] = zeros
                S["lix1"][j] = lx0
                S["liy1"][j] = ly0
                S["r2l"][j] = zeros
            if traceback:
                S["r2c"][j] = izeros
                if collapsed:  # d=1 border runs are level-1: stay = 0
                    S["psx"][j] = izeros
                    S["psy"][j] = izeros

            @pl.when(first_tile)
            def _init_terms():
                S["tval"][:, :] = jnp.full((Bblk, 1), NEG, jnp.float32)
                S["tis"][:, :] = jnp.zeros((Bblk, 1), jnp.int32)
                S["tjs"][:, :] = jnp.zeros((Bblk, 1), jnp.int32)
                if lengths:
                    S["tlen"][:, :] = jnp.zeros((Bblk, 1), jnp.float32)
                if traceback:
                    S["tcs"][:, :] = jnp.zeros((Bblk, 1), jnp.int32)
                if semi:
                    for pickc, ci, cj, code in (
                        (ly == 1, 0, 1, 1 + k),  # (0, 1): Iy cell
                        (lx == 1, 1, 0, 1),  # (1, 0): Ix cell, larger i wins
                    ):
                        S["tval"][:, :] = jnp.where(pickc, 0.0, S["tval"][:, :])
                        S["tis"][:, :] = jnp.where(pickc, ci, S["tis"][:, :])
                        S["tjs"][:, :] = jnp.where(pickc, cj, S["tjs"][:, :])
                        if lengths:
                            S["tlen"][:, :] = jnp.where(pickc, 1.0, S["tlen"][:, :])
                        if traceback:
                            S["tcs"][:, :] = jnp.where(pickc, code, S["tcs"][:, :])

        # ---- load this tile's state into registers ----
        m1 = S["m1"][j]
        ix1 = S["ix1"][j]
        iy1 = S["iy1"][j]
        b2 = S["r2v"][j]
        if lengths:
            lm1 = S["lm1"][j]
            lix1 = S["lix1"][j]
            liy1 = S["liy1"][j]
            lb2 = S["r2l"][j]
        if traceback:
            cb2 = S["r2c"][j]
            if collapsed:
                psx = S["psx"][j]
                psy = S["psy"][j]

        tval = S["tval"][:, :]
        tis = S["tis"][:, :]
        tjs = S["tjs"][:, :]
        tlen = S["tlen"][:, :] if lengths else None
        tcs = S["tcs"][:, :] if traceback else None

        def shift(v, edge, zero_fill=False):
            """Shift right by one lane; lane 0 takes the left tile's saved
            edge column (or the wavefront border fill on tile 0)."""
            fill = jnp.zeros((), v.dtype) if zero_fill else (
                jnp.full((), NEG, v.dtype))
            edge = jnp.where(first_tile, fill, edge)
            return jnp.where(lane == 0, edge, pltpu.roll(v, 1, 1))

        for t in range(T):
            d = db * T + t + d_base
            hrow = hs_ref[t]
            if quantized:
                hrow = hrow.astype(jnp.float32)

            # Edge exchange: read the left tile's pre-step lane-127 column
            # for step t, then publish our own for the right tile.
            def swap(name, col):
                e = S[name][t]
                S[name][t] = col
                return e

            e_m = swap("e_m", m1[:, TILE - 1 :])
            e_ix = swap("e_ix", ix1[:, TILE - 1 :])
            e_b2 = swap("e_b2", b2[:, TILE - 1 :])
            if lengths:
                e_lm = swap("e_lm", lm1[:, TILE - 1 :])
                e_lix = swap("e_lix", lix1[:, TILE - 1 :])
                e_lb2 = swap("e_lb2", lb2[:, TILE - 1 :])
            if traceback:
                e_cb2 = swap("e_cb2", cb2[:, TILE - 1 :])
                if collapsed:
                    e_psx = swap("e_psx", psx[:, TILE - 1 :])

            m1s = shift(m1, e_m)
            b2vs = shift(b2, e_b2)
            ix1s = shift(ix1, e_ix)
            if lengths:
                lm1s = shift(lm1, e_lm, zero_fill=True)
                b2ls = shift(lb2, e_lb2, zero_fill=True)
                lix1s = shift(lix1, e_lix, zero_fill=True)
            if traceback:
                b2cs = shift(cb2, e_cb2, zero_fill=True)
                if collapsed:
                    psxs = shift(psx, e_psx, zero_fill=True)
                    psyv = psy

            # Best at d-1, recomputed from the carried state rows with the
            # exact priority chain that produced it (classic r1v/r1l/r1c).
            if traceback and collapsed:
                rb_cx, rb_cy = 1 + psx, 1 + k + psy
            else:
                rb_cx = rb_cy = None
            b1, b1l, b1c = prio(
                m1, ix1, iy1,
                lm1 if lengths else None,
                lix1 if lengths else None,
                liy1 if lengths else None,
                codes=traceback, code_x=rb_cx, code_y=rb_cy,
            )

            # ---- the step math: identical to kernels.pallas_dp._diag ----
            if collapsed:
                open_x = m1s - g[0]
                ext_x = ix1s - g[1]
                sx = ext_x > open_x
                nix = jnp.where(sx, ext_x, open_x)
                open_y = m1 - g[0]
                ext_y = iy1 - g[1]
                sy = ext_y > open_y
                niy = jnp.where(sy, ext_y, open_y)
                if lengths:
                    nlix = jnp.where(sx, lix1s, lm1s) + 1.0
                    nliy = jnp.where(sy, liy1, lm1) + 1.0
            else:  # k == 1
                stay_x = ix1s > m1s
                nix = jnp.where(stay_x, ix1s, m1s) - g[0]
                stay_y = iy1 > m1
                niy = jnp.where(stay_y, iy1, m1) - g[0]
                if lengths:
                    nlix = jnp.where(stay_x, lix1s, lm1s) + 1.0
                    nliy = jnp.where(stay_y, liy1, lm1) + 1.0

            nm = hrow + b2vs
            nlm = (b2ls + 1.0) if lengths else None
            mcode = b2cs if traceback else None
            if local:
                clamp = nm < 0.0
                nm = jnp.where(clamp, 0.0, nm)
                if traceback:
                    mcode = jnp.where(clamp, 31, mcode)
                if lengths:
                    nlm = jnp.where(nm <= 0.0, 0.0, nlm)

            at0 = glane == 0
            atd = glane == d
            nm = jnp.where(at0 | atd, border_m, nm)
            if lengths:
                nlm = jnp.where(at0 | atd, 0.0, nlm)
            d_f = d.astype(jnp.float32)
            if local:
                nix = jnp.where(at0 | atd, NEG, nix)
                niy = jnp.where(at0 | atd, NEG, niy)
                if lengths:
                    nlix = jnp.where(at0 | atd, 0.0, nlix)
                    nliy = jnp.where(at0 | atd, 0.0, nliy)
            else:
                # Border runs: collapsed k=2 steps start at d >= 2, so the
                # run level is always 2 (the carried level); k=1 has one
                # level — in both cases the border value is live at every d.
                bx = np.float32(0.0) if semi else -cum_ref[0, d]
                nix = jnp.where(atd, bx, jnp.where(at0, NEG, nix))
                niy = jnp.where(at0, bx, jnp.where(atd, NEG, niy))
                if lengths:
                    nlix = jnp.where(atd, d_f, jnp.where(at0, 0.0, nlix))
                    nliy = jnp.where(at0, d_f, jnp.where(atd, 0.0, nliy))

            code_x = code_y = None
            if collapsed:
                if local:
                    border = at0 | atd
                    sx = sx & ~border
                    sy = sy & ~border
                else:
                    sx = atd | (sx & ~at0)
                    sy = at0 | (sy & ~atd)
                sxi = sx.astype(jnp.int32)
                syi = sy.astype(jnp.int32)
                if traceback:
                    code_x, code_y = 1 + sxi, 1 + k + syi
            bv, bl, bc = prio(nm, nix, niy,
                              nlm if lengths else None,
                              nlix if lengths else None,
                              nliy if lengths else None,
                              codes=traceback,
                              code_x=code_x, code_y=code_y)

            # ---- terminal tracking (per tile: candidates outside this
            # tile's lane range reduce to the NEG fill and must not
            # overwrite — the `hit` guards are the only delta vs classic).
            if mode == "global":
                pick = d == (lx + ly)
                mask = glane == lx
                hit = jnp.max(jnp.where(mask, 1, 0), axis=1, keepdims=True) > 0
                repl = pick & hit
                tval = jnp.where(repl, _pick(bv, mask, NEG), tval)
                tis = jnp.where(repl, lx, tis)
                tjs = jnp.where(repl, ly, tjs)
                if lengths:
                    tlen = jnp.where(repl, _pick(bl, mask, NEG), tlen)
                if traceback:
                    tcs = jnp.where(repl, _pick(bc, mask, -1), tcs)
            elif semi:
                for cand_i, cand_j in ((d - ly, ly), (lx, d - lx)):
                    ok = (cand_i >= 0) & (cand_i <= lx) & (cand_j >= 0) & (cand_j <= ly)
                    mask = glane == cand_i
                    hit = jnp.max(jnp.where(mask, 1, 0), axis=1, keepdims=True) > 0
                    cv = _pick(bv, mask, NEG)
                    better = cv > tval
                    tie = (cv == tval) & (
                        (cand_i > tis) | ((cand_i == tis) & (cand_j > tjs))
                    )
                    repl = ok & hit & (better | tie)
                    tval = jnp.where(repl, cv, tval)
                    tis = jnp.where(repl, cand_i, tis)
                    tjs = jnp.where(repl, cand_j, tjs)
                    if lengths:
                        tlen = jnp.where(repl, _pick(bl, mask, NEG), tlen)
                    if traceback:
                        tcs = jnp.where(repl, _pick(bc, mask, -1), tcs)
            else:  # local
                valid = (glane >= 1) & (glane <= lx) & (d - glane >= 1) & (d - glane <= ly)
                mv = jnp.where(valid, nm, NEG)
                step_best = jnp.max(mv, axis=1, keepdims=True)
                ismax = mv == step_best
                big = jnp.int32(n_tiles * TILE)
                step_arg = jnp.min(jnp.where(ismax, glane, big), axis=1, keepdims=True)
                cj = d - step_arg
                better = step_best > tval
                tie = (step_best == tval) & (
                    (step_arg < tis) | ((step_arg == tis) & (cj < tjs))
                )
                repl = (better | tie) & (step_best > NEG)
                tval = jnp.where(repl, step_best, tval)
                tis = jnp.where(repl, step_arg, tis)
                tjs = jnp.where(repl, cj, tjs)
                if lengths:
                    step_len = _pick(nlm, glane == step_arg, NEG)
                    tlen = jnp.where(repl, step_len, tlen)

            if traceback:
                if collapsed:
                    bits = mcode + psxs * 32 + psyv * 64
                    psx, psy = sxi, syi
                else:
                    bits = (mcode + stay_x.astype(jnp.int32) * 32
                            + stay_y.astype(jnp.int32) * 64)
                if local:
                    bits = bits + (nm <= 0.0).astype(jnp.int32) * 128
                tb_ref[t] = bits.astype(jnp.uint8)

            # ---- advance registers ----
            b2, m1, ix1, iy1 = b1, nm, nix, niy
            if lengths:
                lb2, lm1, lix1, liy1 = b1l, nlm, nlix, nliy
            if traceback:
                cb2 = b1c

        # ---- store this tile's state back ----
        S["m1"][j] = m1
        S["ix1"][j] = ix1
        S["iy1"][j] = iy1
        S["r2v"][j] = b2
        if lengths:
            S["lm1"][j] = lm1
            S["lix1"][j] = lix1
            S["liy1"][j] = liy1
            S["r2l"][j] = lb2
        if traceback:
            S["r2c"][j] = cb2
            if collapsed:
                S["psx"][j] = psx
                S["psy"][j] = psy
        S["tval"][:, :] = tval
        S["tis"][:, :] = tis
        S["tjs"][:, :] = tjs
        if lengths:
            S["tlen"][:, :] = tlen
        if traceback:
            S["tcs"][:, :] = tcs

        @pl.when((db == n_db - 1) & (j == n_tiles - 1))
        def _finish():
            score_ref[:, :] = tval
            ti_ref[:, :] = tis
            tj_ref[:, :] = tjs
            len_ref[:, :] = tlen if lengths else jnp.zeros((Bblk, 1), jnp.float32)
            tcode_ref[:, :] = tcs if traceback else jnp.zeros((Bblk, 1), jnp.int32)

    return kernel


def _pick(v, mask, fill):
    return jnp.max(jnp.where(mask, v, fill), axis=1, keepdims=True)


@functools.partial(
    jax.jit,
    static_argnames=("gap_series", "mode", "traceback", "lengths", "block_b",
                     "steps_per_visit", "interpret", "d_base", "total_d"),
)
def wavefront_dp_tiled(
    hs: jax.Array,  # body layout: f32|int8|int16[steps, B, LpT]
    lx: jax.Array,  # int32[B]
    ly: jax.Array,  # int32[B]
    gap_series: tuple[int, ...] = (11, 1),
    mode: str = "global",
    traceback: bool = False,
    lengths: bool | None = None,
    block_b: int = 128,
    steps_per_visit: int = 8,
    interpret: bool | None = None,
    d_base: int = 2,
    total_d: int | None = None,
):
    """Register-tiled drop-in for ``wavefront_dp_pallas(..., hs_body=True)``
    (same outputs bit-for-bit; see module docstring for the restrictions)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if lengths is None:
        lengths = not traceback
    k = len(gap_series)
    if not tiled_supported(gap_series):
        raise ValueError("tiled kernel supports gap series of length <= 2")
    quantized = hs.dtype != jnp.float32
    steps, B, LpT = hs.shape
    if LpT % TILE:
        raise ValueError("tiled kernel requires lanes padded to 128 (body layout)")
    T = steps_per_visit
    while steps % T:
        T //= 2
    n_db = steps // T
    n_tiles = LpT // TILE
    D = steps + 2

    # VMEM-bounded batch block (same discipline as the classic kernel).
    n_rows = len(_row_names(lengths, traceback, k))
    bytes_per_prob = (n_rows * LpT + 2 * 2 * T * TILE) * 4  # rows + hs/tb blocks
    vmem_rows = max(8, int(10e6 // max(bytes_per_prob, 1)))
    Bblk = 8
    while Bblk * 2 <= min(block_b, vmem_rows):
        Bblk *= 2
    Bblk = min(Bblk, max(8, B))
    pad = (-B) % Bblk
    if pad:
        hs = jnp.pad(hs, ((0, 0), (0, pad), (0, 0)))
        lx = jnp.pad(lx, (0, pad), constant_values=1)
        ly = jnp.pad(ly, (0, pad), constant_values=1)
    B_run = B + pad
    nb = B_run // Bblk

    cum_d = total_d if total_d is not None else D
    cum = jnp.asarray(_gap_prefix(gap_series, cum_d), dtype=jnp.float32)[None, :]
    lx2 = lx.astype(jnp.int32)[:, None]
    ly2 = ly.astype(jnp.int32)[:, None]

    kernel = _make_kernel(n_db, n_tiles, Bblk, T, k, tuple(gap_series), mode,
                          lengths, traceback, quantized, d_base)

    f32, i32 = jnp.float32, jnp.int32
    if traceback:
        tb_shape = jax.ShapeDtypeStruct((steps, B_run, LpT), jnp.uint8)
        tb_spec = pl.BlockSpec((T, Bblk, TILE), lambda b, d, j: (d, b, j),
                               memory_space=pltpu.VMEM)
    else:
        tb_shape = jax.ShapeDtypeStruct((1, 1, 1), jnp.uint8)
        tb_spec = pl.BlockSpec((1, 1, 1), lambda b, d, j: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    bspec = lambda: pl.BlockSpec((Bblk, 1), lambda b, d, j: (b, 0),
                                 memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct((B_run, 1), f32),  # score
        jax.ShapeDtypeStruct((B_run, 1), f32),  # length
        jax.ShapeDtypeStruct((B_run, 1), i32),  # ti
        jax.ShapeDtypeStruct((B_run, 1), i32),  # tj
        jax.ShapeDtypeStruct((B_run, 1), i32),  # tcode
        tb_shape,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # cum (full)
        pl.BlockSpec((T, Bblk, TILE), lambda b, d, j: (d, b, j),
                     memory_space=pltpu.VMEM),  # hs
        bspec(),  # lx
        bspec(),  # ly
    ]
    out_specs = (bspec(), bspec(), bspec(), bspec(), bspec(), tb_spec)

    scratch = []
    for name in _row_names(lengths, traceback, k):
        dt = i32 if name in ("r2c", "psx", "psy") else f32
        scratch.append(pltpu.VMEM((n_tiles, Bblk, TILE), dt))
    for name in _edge_names(lengths, traceback, k):
        dt = i32 if name in ("e_cb2", "e_psx") else f32
        scratch.append(pltpu.VMEM((T, Bblk, 1), dt))
    scratch.append(pltpu.VMEM((Bblk, 1), f32))  # tval
    scratch.append(pltpu.VMEM((Bblk, 1), i32))  # tis
    scratch.append(pltpu.VMEM((Bblk, 1), i32))  # tjs
    scratch.append(pltpu.VMEM((Bblk, 1), f32))  # tlen
    scratch.append(pltpu.VMEM((Bblk, 1), i32))  # tcs

    results = pl.pallas_call(
        kernel,
        grid=(nb, n_db, n_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=bool(interpret),
    )(cum, hs, lx2, ly2)
    score, length, ti, tj, tcode, tb = results

    out = {
        "score": score[:B, 0],
        "length": length[:B, 0],
        "ti": ti[:B, 0],
        "tj": tj[:B, 0],
        "tcode": tcode[:B, 0],
    }
    if traceback:
        out["tb"] = tb[:, :B, :]
    return out
