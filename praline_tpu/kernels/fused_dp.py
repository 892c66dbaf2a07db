"""Fully fused score-producer + wavefront DP kernel (scores mode).

The two-kernel TPU path (kernels.fused_scores -> kernels.pallas_dp)
materializes the skewed score tensor ``hs`` in HBM: O(D * B * Lp) f32
written by the producer and read back by the DP — ~8 B/cell of pure HBM
traffic that dominates the scores-only dispatch once the producer's tiles
are DMA-shaped.  This kernel fuses both stages into ONE pallas_call so a
diagonal band's scores only ever exist in VMEM scratch:

* grid = (batch_blocks, bands, I): for each 128-diagonal band ``s`` the
  first I steps run the producer (MXU H^T tiles + 7-pass barrel roll —
  the exact arithmetic of kernels.fused_scores) writing lane block
  ``i`` of the band's score scratch ``hsb[128, Bblk, LxT]``;
* at the band's last lane block the DP runs 128 diagonal steps
  (``lax.fori_loop``) consuming ``hsb`` — the same recurrence, border
  handling, tie-breaks and terminal tracking as kernels.pallas_dp
  (parity-tested bit-exact against kernels.scan.wavefront_dp);
* DP state vectors persist in VMEM scratch across the whole grid.

Scores(+lengths) only: traceback-mode dispatches keep the two-kernel
path (their O(D * Lp) bit output has to ride HBM anyway, so fusion buys
proportionally less there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scan import _gap_prefix
from .fused_scores import HIGHEST, TILE, _pack_operands
from .pallas_dp import _collapse

NEG = np.float32(-1.0e30)
BBLK = 8  # problems per batch block (sublane-aligned f32 tiles)


PTR_NONE = 31


def max_lanes_fused(gap_series, lengths: bool = True,
                    traceback: bool = False) -> int:
    """Largest padded lane count (LxT) the fused kernel's VMEM footprint
    supports: the 128-row band scratch plus the DP state rows, all
    (BBLK, LxT) f32 (+ int32 code carries and the uint8 band bit block in
    traceback mode).  The batch driver treats this as a router bound."""
    k = len(gap_series)
    collapsed, kc = _collapse(k)
    n_rows = 3 + 2 * kc + ((3 + 2 * kc) if lengths else 0)
    if traceback:
        n_rows += 2 + (2 if collapsed else 0)  # r1c, r2c (+psx/psy)
    bytes_per_lane = 4 * BBLK * (TILE + n_rows)
    if traceback:
        bytes_per_lane += 2 * BBLK * TILE  # double-buffered band bit block
    # 9 MB scratch budget of ~16 MB VMEM: the producer's in-kernel
    # temporaries (h2 + roll stack, ~2 MB) and double-buffered input
    # tiles need the headroom.
    return int(9e6 // bytes_per_lane)


@functools.partial(
    jax.jit,
    static_argnames=("gap_series", "mode", "lengths", "traceback", "interpret"),
)
def wavefront_dp_fused(
    cx: jax.Array,  # f32[B, Lx, A] integer-valued counts
    inv_x: jax.Array,  # f32[B, Lx]
    cy: jax.Array,  # f32[B, Ly, A]
    inv_y: jax.Array,  # f32[B, Ly]
    s: jax.Array,  # f32[A, A]
    lx: jax.Array,  # int32[B]
    ly: jax.Array,  # int32[B]
    gap_series: tuple[int, ...] = (11, 1),
    mode: str = "global",
    lengths: bool | None = None,
    traceback: bool = False,
    interpret: bool | None = None,
):
    """Same terminal contract as ``wavefront_dp`` (``tcode``/``length``
    are zeros when the respective carries are disabled, as in pallas_dp;
    ``tb`` rows are band-padded to a multiple of 128 — valid rows are
    ``[: D - 2]``)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if lengths is None:
        lengths = not traceback
    k = len(gap_series)
    if k > 15:
        raise ValueError("gap series deeper than 15 levels not supported")
    local = mode == "local"
    semi = mode == "semiglobal"
    if mode not in ("global", "semiglobal", "local"):
        raise ValueError(f"unknown mode {mode!r}")
    g = [np.float32(x) for x in gap_series]
    collapsed, kc = _collapse(k)
    border_m = np.float32(0.0 if local else NEG)

    B, Lx, A = cx.shape
    Ly = cy.shape[1]
    D = Lx + Ly + 1

    pad = (-B) % BBLK
    if pad:  # trivial length-1 problems; sliced off below
        cx = jnp.pad(cx, ((0, pad), (0, 0), (0, 0)))
        inv_x = jnp.pad(inv_x, ((0, pad), (0, 0)), constant_values=1.0)
        cy = jnp.pad(cy, ((0, pad), (0, 0), (0, 0)))
        inv_y = jnp.pad(inv_y, ((0, pad), (0, 0)), constant_values=1.0)
        lx = jnp.pad(lx, (0, pad), constant_values=1)
        ly = jnp.pad(ly, (0, pad), constant_values=1)
    B_run = B + pad
    nb = B_run // BBLK

    tp4, cy4, invx4, invy4, LxT, CT, I, A8 = _pack_operands(
        cx, inv_x, cy, inv_y, s
    )
    if LxT > max_lanes_fused(gap_series, lengths, traceback):
        raise ValueError(
            f"lane count {LxT} exceeds the fused kernel's VMEM budget; "
            "route through the two-kernel or streamed path"
        )
    n_bands = -(-(D - 2) // TILE)
    cum = jnp.asarray(
        _gap_prefix(gap_series, n_bands * TILE + 2), dtype=jnp.float32
    )[None, :]
    lx2 = lx.astype(jnp.int32)[:, None]
    ly2 = ly.astype(jnp.int32)[:, None]

    state_names = ["m1", "r1v", "r2v", "ix1", "iy1"]
    if lengths:
        state_names += ["lm1", "r1l", "r2l", "lix1", "liy1"]
    if traceback:
        state_names += ["r1c", "r2c"]
        if collapsed:
            state_names += ["psx", "psy"]
    term_names = ["tval", "tis", "tjs"] + (["tlen"] if lengths else [])
    if traceback:
        term_names += ["tcs"]

    def prio(m, ixs, iys, lm=None, lixs=None, liys=None, codes=False,
             codes_x=None, codes_y=None):
        if codes_x is None:
            codes_x = [1 + l for l in range(len(ixs))]
        if codes_y is None:
            codes_y = [1 + k + l for l in range(len(iys))]
        v = m
        ln = lm
        c = jnp.zeros((BBLK, LxT), jnp.int32) if codes else None
        for l in range(len(ixs)):
            b = ixs[l] > v
            v = jnp.where(b, ixs[l], v)
            if ln is not None:
                ln = jnp.where(b, lixs[l], ln)
            if codes:
                c = jnp.where(b, codes_x[l], c)
        for l in range(len(iys)):
            b = iys[l] > v
            v = jnp.where(b, iys[l], v)
            if ln is not None:
                ln = jnp.where(b, liys[l], ln)
            if codes:
                c = jnp.where(b, codes_y[l], c)
        return v, ln, c

    def _pick(v, mask, fill):
        return jnp.max(jnp.where(mask, v, fill), axis=1, keepdims=True)

    def kernel(cum_ref, tp_ref, cylo_ref, cyhi_ref, ivx_ref, ivlo_ref,
               ivhi_ref, lx_ref, ly_ref,
               score_ref, len_ref, ti_ref, tj_ref, tcode_ref, tb_ref,
               hsb, *scr):
        S = dict(zip(state_names + term_names, scr))
        s_id = pl.program_id(1)
        i_blk = pl.program_id(2)
        lane = jax.lax.broadcasted_iota(jnp.int32, (BBLK, LxT), 1)
        lxv = lx_ref[:, :]
        lyv = ly_ref[:, :]
        negs = jnp.full((BBLK, LxT), NEG, jnp.float32)
        zeros = jnp.zeros((BBLK, LxT), jnp.float32)

        # ---- DP state init: once per batch block ----
        @pl.when((s_id == 0) & (i_blk == 0))
        def _init():
            m1v = jnp.where((lane == 0) | (lane == 1), border_m, negs)
            S["m1"][:, :] = m1v
            ix0 = [negs] * kc
            iy0 = [negs] * kc
            lx0 = [zeros] * kc
            ly0 = [zeros] * kc
            if not local:
                bval = np.float32(0.0) if semi else -cum_ref[0, 1]
                ix0[0] = jnp.where(lane == 1, bval, negs)
                iy0[0] = jnp.where(lane == 0, bval, negs)
                lx0[0] = jnp.where(lane == 1, 1.0, zeros)
                ly0[0] = jnp.where(lane == 0, 1.0, zeros)
            for l in range(kc):
                S["ix1"][l] = ix0[l]
                S["iy1"][l] = iy0[l]
                if lengths:
                    S["lix1"][l] = lx0[l]
                    S["liy1"][l] = ly0[l]
            S["r2v"][:, :] = jnp.where(lane == 0, 0.0, negs)
            v, ln, c = prio(m1v, ix0, iy0,
                            zeros if lengths else None,
                            lx0 if lengths else None,
                            ly0 if lengths else None,
                            codes=traceback)
            S["r1v"][:, :] = v
            if lengths:
                S["lm1"][:, :] = zeros
                S["r2l"][:, :] = zeros
                S["r1l"][:, :] = ln
            if traceback:
                S["r2c"][:, :] = jnp.zeros((BBLK, LxT), jnp.int32)
                S["r1c"][:, :] = c
                if collapsed:  # d=1 border runs are level-1: stay = 0
                    S["psx"][:, :] = jnp.zeros((BBLK, LxT), jnp.int32)
                    S["psy"][:, :] = jnp.zeros((BBLK, LxT), jnp.int32)
            S["tval"][:, :] = jnp.full((BBLK, 1), NEG, jnp.float32)
            S["tis"][:, :] = jnp.zeros((BBLK, 1), jnp.int32)
            S["tjs"][:, :] = jnp.zeros((BBLK, 1), jnp.int32)
            if lengths:
                S["tlen"][:, :] = jnp.zeros((BBLK, 1), jnp.float32)
            if traceback:
                S["tcs"][:, :] = jnp.zeros((BBLK, 1), jnp.int32)
            if semi:
                for pickc, ci, cj, code in (
                    ((lyv == 1), 0, 1, 1 + k), ((lxv == 1), 1, 0, 1)
                ):
                    S["tval"][:, :] = jnp.where(pickc, 0.0, S["tval"][:, :])
                    S["tis"][:, :] = jnp.where(pickc, ci, S["tis"][:, :])
                    S["tjs"][:, :] = jnp.where(pickc, cj, S["tjs"][:, :])
                    if lengths:
                        S["tlen"][:, :] = jnp.where(pickc, 1.0, S["tlen"][:, :])
                    if traceback:
                        S["tcs"][:, :] = jnp.where(pickc, code, S["tcs"][:, :])

        # ---- producer: band s, lane block i (kernels.fused_scores body) ----
        c_lo = s_id - i_blk
        c_hi = c_lo + 1
        tpv = tp_ref[:, 0]  # (BBLK, A8, 128)
        ok_lo = (c_lo >= 0) & (c_lo < CT)
        ok_hi = (c_hi >= 0) & (c_hi < CT)
        cylo = jnp.where(ok_lo, cylo_ref[:, 0], 0.0)
        cyhi = jnp.where(ok_hi, cyhi_ref[:, 0], 0.0)
        dn = (((1,), (1,)), ((0,), (0,)))
        h2 = jax.lax.dot_general(
            jnp.concatenate([cyhi, cylo], axis=2), tpv, dn,
            preferred_element_type=jnp.float32, precision=HIGHEST,
        )
        h_hi, h_lo = h2[:, :TILE], h2[:, TILE:]
        # pinned order (H_int * inv_x) * inv_y on the unrolled tiles
        ivx = ivx_ref[:, 0, 0][:, None, :]
        h_hi = (h_hi * ivx) * ivhi_ref[:, 0, 0][:, :, None]
        h_lo = (h_lo * ivx) * ivlo_ref[:, 0, 0][:, :, None]
        stack = jnp.transpose(jnp.concatenate([h_hi, h_lo], axis=1), (1, 0, 2))
        rl = jax.lax.broadcasted_iota(jnp.int32, (2 * TILE, BBLK, TILE), 2)
        for bit in range(7):
            amt = 1 << bit
            stack = jnp.where((rl & amt) != 0, pltpu.roll(stack, amt, 0), stack)
        hsb[:, :, pl.ds(i_blk * TILE, TILE)] = stack[:TILE]

        # ---- DP: run the band's 128 diagonals at the last lane block ----
        def shift_v(v):
            return jnp.where(lane == 0, NEG, pltpu.roll(v, 1, 1))

        def shift_z(v):
            return jnp.where(lane == 0, jnp.zeros((), v.dtype), pltpu.roll(v, 1, 1))

        def dp_step(u, _):
            d = 2 + s_id * TILE + u
            hrow = hsb[pl.ds(u, 1)][0]  # (BBLK, LxT)
            m1v = S["m1"][:, :]
            m1s = shift_v(m1v)
            b2vs = shift_v(S["r2v"][:, :])
            if lengths:
                lm1v = S["lm1"][:, :]
                lm1s = shift_z(lm1v)
                b2ls = shift_z(S["r2l"][:, :])
            if traceback:
                b2cs = shift_z(S["r2c"][:, :])
            ix1 = [S["ix1"][l] for l in range(kc)]
            iy1 = [S["iy1"][l] for l in range(kc)]
            if lengths:
                lix1 = [S["lix1"][l] for l in range(kc)]
                liy1 = [S["liy1"][l] for l in range(kc)]
            if traceback and collapsed:
                psxs = shift_z(S["psx"][:, :])  # prev stay, cell (i-1, j)
                psyv = S["psy"][:, :]  # prev stay, cell (i, j-1)
            nix = [None] * kc
            niy = [None] * kc
            nlix = [None] * kc
            nliy = [None] * kc
            if collapsed:
                # 3-state collapse (kernels.scan collapse note)
                ix1s = shift_v(ix1[0])
                open_x = m1s - g[0]
                ext_x = ix1s - g[1]
                sx = ext_x > open_x
                nix[0] = jnp.where(sx, ext_x, open_x)
                open_y = m1v - g[0]
                ext_y = iy1[0] - g[1]
                sy = ext_y > open_y
                niy[0] = jnp.where(sy, ext_y, open_y)
                if lengths:
                    lix1s = shift_z(lix1[0])
                    nlix[0] = jnp.where(sx, lix1s, lm1s) + 1.0
                    nliy[0] = jnp.where(sy, liy1[0], lm1v) + 1.0
            elif k == 1:
                ix1s = shift_v(ix1[0])
                stay_x = ix1s > m1s
                nix[0] = jnp.where(stay_x, ix1s, m1s) - g[0]
                stay_y = iy1[0] > m1v
                niy[0] = jnp.where(stay_y, iy1[0], m1v) - g[0]
                if lengths:
                    lix1s = shift_z(lix1[0])
                    nlix[0] = jnp.where(stay_x, lix1s, lm1s) + 1.0
                    nliy[0] = jnp.where(stay_y, liy1[0], lm1v) + 1.0
            else:
                ix1sl = [shift_v(v) for v in ix1]
                nix[0] = m1s - g[0]
                niy[0] = m1v - g[0]
                for l in range(1, k - 1):
                    nix[l] = ix1sl[l - 1] - g[l]
                    niy[l] = iy1[l - 1] - g[l]
                stay_x = ix1sl[k - 1] > ix1sl[k - 2]
                nix[k - 1] = jnp.where(stay_x, ix1sl[k - 1], ix1sl[k - 2]) - g[k - 1]
                stay_y = iy1[k - 1] > iy1[k - 2]
                niy[k - 1] = jnp.where(stay_y, iy1[k - 1], iy1[k - 2]) - g[k - 1]
                if lengths:
                    lix1sl = [shift_z(v) for v in lix1]
                    nlix[0] = lm1s + 1.0
                    nliy[0] = lm1v + 1.0
                    for l in range(1, k - 1):
                        nlix[l] = lix1sl[l - 1] + 1.0
                        nliy[l] = liy1[l - 1] + 1.0
                    nlix[k - 1] = jnp.where(stay_x, lix1sl[k - 1], lix1sl[k - 2]) + 1.0
                    nliy[k - 1] = jnp.where(stay_y, liy1[k - 1], liy1[k - 2]) + 1.0

            nm = hrow + b2vs
            nlm = (b2ls + 1.0) if lengths else None
            mcode = b2cs if traceback else None
            if local:
                clamp = nm < 0.0
                nm = jnp.where(clamp, 0.0, nm)
                if traceback:
                    mcode = jnp.where(clamp, PTR_NONE, mcode)
                if lengths:
                    nlm = jnp.where(nm <= 0.0, 0.0, nlm)

            at0 = lane == 0
            atd = lane == d
            nm = jnp.where(at0 | atd, border_m, nm)
            if lengths:
                nlm = jnp.where(at0 | atd, 0.0, nlm)
            d_f = d.astype(jnp.float32)
            if not collapsed:
                lvl_d = jnp.minimum(d, k)
            for l in range(kc):
                if local:
                    nix[l] = jnp.where(at0 | atd, NEG, nix[l])
                    niy[l] = jnp.where(at0 | atd, NEG, niy[l])
                    if lengths:
                        nlix[l] = jnp.where(at0 | atd, 0.0, nlix[l])
                        nliy[l] = jnp.where(at0 | atd, 0.0, nliy[l])
                elif collapsed:
                    # steps start at d=2: border level is always 2 (=k)
                    bx = np.float32(0.0) if semi else -cum_ref[0, d]
                    nix[0] = jnp.where(atd, bx, jnp.where(at0, NEG, nix[0]))
                    niy[0] = jnp.where(at0, bx, jnp.where(atd, NEG, niy[0]))
                    if lengths:
                        nlix[0] = jnp.where(atd, d_f, jnp.where(at0, 0.0, nlix[0]))
                        nliy[0] = jnp.where(at0, d_f, jnp.where(atd, 0.0, nliy[0]))
                else:
                    bx = np.float32(0.0) if semi else -cum_ref[0, d]
                    on_lvl = lvl_d == l + 1
                    nix[l] = jnp.where(atd, jnp.where(on_lvl, bx, NEG),
                                       jnp.where(at0, NEG, nix[l]))
                    niy[l] = jnp.where(at0, jnp.where(on_lvl, bx, NEG),
                                       jnp.where(atd, NEG, niy[l]))
                    if lengths:
                        nlix[l] = jnp.where(atd, d_f, jnp.where(at0, 0.0, nlix[l]))
                        nliy[l] = jnp.where(at0, d_f, jnp.where(atd, 0.0, nliy[l]))

            codes_x = codes_y = None
            if collapsed:
                if local:
                    border = at0 | atd
                    sx = sx & ~border
                    sy = sy & ~border
                else:
                    # boolean algebra, not where(pred, True, ...): Mosaic
                    # cannot legalize the i8->i1 truncation the scalar-True
                    # select lowers to.
                    sx = atd | (sx & ~at0)
                    sy = at0 | (sy & ~atd)
                sxi = sx.astype(jnp.int32)
                syi = sy.astype(jnp.int32)
                if traceback:
                    codes_x, codes_y = [1 + sxi], [1 + k + syi]
            bv, bl, bc = prio(nm, nix, niy,
                              nlm if lengths else None,
                              nlix if lengths else None,
                              nliy if lengths else None,
                              codes=traceback,
                              codes_x=codes_x, codes_y=codes_y)

            if mode == "global":
                pick = d == (lxv + lyv)
                mask = lane == lxv
                S["tval"][:, :] = jnp.where(pick, _pick(bv, mask, NEG), S["tval"][:, :])
                S["tis"][:, :] = jnp.where(pick, lxv, S["tis"][:, :])
                S["tjs"][:, :] = jnp.where(pick, lyv, S["tjs"][:, :])
                if lengths:
                    S["tlen"][:, :] = jnp.where(pick, _pick(bl, mask, NEG), S["tlen"][:, :])
                if traceback:
                    S["tcs"][:, :] = jnp.where(pick, _pick(bc, mask, -1), S["tcs"][:, :])
            elif semi:
                for cand_i, cand_j in ((d - lyv, lyv), (lxv, d - lxv)):
                    ok = (cand_i >= 0) & (cand_i <= lxv) & (cand_j >= 0) & (cand_j <= lyv)
                    mask = lane == cand_i
                    cv = _pick(bv, mask, NEG)
                    better = cv > S["tval"][:, :]
                    tie = (cv == S["tval"][:, :]) & (
                        (cand_i > S["tis"][:, :])
                        | ((cand_i == S["tis"][:, :]) & (cand_j > S["tjs"][:, :]))
                    )
                    repl = ok & (better | tie)
                    S["tval"][:, :] = jnp.where(repl, cv, S["tval"][:, :])
                    S["tis"][:, :] = jnp.where(repl, cand_i, S["tis"][:, :])
                    S["tjs"][:, :] = jnp.where(repl, cand_j, S["tjs"][:, :])
                    if lengths:
                        S["tlen"][:, :] = jnp.where(repl, _pick(bl, mask, NEG), S["tlen"][:, :])
                    if traceback:
                        S["tcs"][:, :] = jnp.where(repl, _pick(bc, mask, -1), S["tcs"][:, :])
            else:  # local
                valid = (lane >= 1) & (lane <= lxv) & (d - lane >= 1) & (d - lane <= lyv)
                mv = jnp.where(valid, nm, NEG)
                step_best = jnp.max(mv, axis=1, keepdims=True)
                ismax = mv == step_best
                big = jnp.int32(LxT)
                step_arg = jnp.min(jnp.where(ismax, lane, big), axis=1, keepdims=True)
                cj = d - step_arg
                better = step_best > S["tval"][:, :]
                tie = (step_best == S["tval"][:, :]) & (
                    (step_arg < S["tis"][:, :])
                    | ((step_arg == S["tis"][:, :]) & (cj < S["tjs"][:, :]))
                )
                repl = better | tie
                S["tval"][:, :] = jnp.where(repl, step_best, S["tval"][:, :])
                S["tis"][:, :] = jnp.where(repl, step_arg, S["tis"][:, :])
                S["tjs"][:, :] = jnp.where(repl, cj, S["tjs"][:, :])
                if lengths:
                    step_len = _pick(nlm, lane == step_arg, NEG)
                    S["tlen"][:, :] = jnp.where(repl, step_len, S["tlen"][:, :])

            S["m1"][:, :] = nm
            for l in range(kc):
                S["ix1"][l] = nix[l]
                S["iy1"][l] = niy[l]
                if lengths:
                    S["lix1"][l] = nlix[l]
                    S["liy1"][l] = nliy[l]
            S["r2v"][:, :] = S["r1v"][:, :]
            S["r1v"][:, :] = bv
            if lengths:
                S["lm1"][:, :] = nlm
                S["r2l"][:, :] = S["r1l"][:, :]
                S["r1l"][:, :] = bl
            if traceback:
                S["r2c"][:, :] = S["r1c"][:, :]
                S["r1c"][:, :] = bc
                # int32 arithmetic (Mosaic cannot legalize sub-word
                # shifts), narrowed to uint8 at the store.
                if collapsed:
                    # bit 5 = prev diagonal's x-stay shifted; bit 6 =
                    # prev y-stay unshifted (kernels.scan collapse note).
                    bits = mcode + psxs * 32 + psyv * 64
                    S["psx"][:, :] = sxi
                    S["psy"][:, :] = syi
                else:
                    bits = (mcode + stay_x.astype(jnp.int32) * 32
                            + stay_y.astype(jnp.int32) * 64)
                if local:
                    # bit 7 = "M value <= 0": local device replay.
                    bits = bits + (nm <= 0.0).astype(jnp.int32) * 128
                tb_ref[pl.ds(u, 1)] = bits.astype(jnp.uint8)[None]
            return 0

        @pl.when(i_blk == I - 1)
        def _dp():
            jax.lax.fori_loop(0, TILE, dp_step, 0)

        @pl.when((s_id == n_bands - 1) & (i_blk == I - 1))
        def _finish():
            score_ref[:, :] = S["tval"][:, :]
            ti_ref[:, :] = S["tis"][:, :]
            tj_ref[:, :] = S["tjs"][:, :]
            len_ref[:, :] = (
                S["tlen"][:, :] if lengths else jnp.zeros((BBLK, 1), jnp.float32)
            )
            tcode_ref[:, :] = (
                S["tcs"][:, :] if traceback else jnp.zeros((BBLK, 1), jnp.int32)
            )

    f32 = jnp.float32
    i32 = jnp.int32
    spec_a = lambda f: pl.BlockSpec((BBLK, 1, A8, TILE), f, memory_space=pltpu.VMEM)
    spec_1 = lambda f: pl.BlockSpec((BBLK, 1, 8, TILE), f, memory_space=pltpu.VMEM)
    bspec = lambda: pl.BlockSpec((BBLK, 1), lambda b, s_, i: (b, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # cum
        spec_a(lambda b, s_, i: (b, i, 0, 0)),  # tp
        spec_a(lambda b, s_, i: (b, jnp.clip(s_ - i, 0, CT - 1), 0, 0)),  # cylo
        spec_a(lambda b, s_, i: (b, jnp.clip(s_ - i + 1, 0, CT - 1), 0, 0)),  # cyhi
        spec_1(lambda b, s_, i: (b, i, 0, 0)),  # ivx
        spec_1(lambda b, s_, i: (b, jnp.clip(s_ - i, 0, CT - 1), 0, 0)),  # ivlo
        spec_1(lambda b, s_, i: (b, jnp.clip(s_ - i + 1, 0, CT - 1), 0, 0)),  # ivhi
        bspec(),  # lx
        bspec(),  # ly
    ]
    if traceback:
        tb_shape = jax.ShapeDtypeStruct((n_bands * TILE, B_run, LxT), jnp.uint8)
        tb_spec = pl.BlockSpec(
            (TILE, BBLK, LxT), lambda b, s_, i: (s_, b, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        tb_shape = jax.ShapeDtypeStruct((n_bands, 1, 1), jnp.uint8)
        tb_spec = pl.BlockSpec(
            (1, 1, 1), lambda b, s_, i: (s_, 0, 0), memory_space=pltpu.VMEM
        )
    out_specs = (bspec(), bspec(), bspec(), bspec(), bspec(), tb_spec)
    out_shape = (
        jax.ShapeDtypeStruct((B_run, 1), f32),  # score
        jax.ShapeDtypeStruct((B_run, 1), f32),  # length
        jax.ShapeDtypeStruct((B_run, 1), i32),  # ti
        jax.ShapeDtypeStruct((B_run, 1), i32),  # tj
        jax.ShapeDtypeStruct((B_run, 1), i32),  # tcode
        tb_shape,
    )
    scratch = [pltpu.VMEM((TILE, BBLK, LxT), f32)]  # hsb
    for name in state_names:
        if name in ("ix1", "iy1", "lix1", "liy1"):
            scratch.append(pltpu.VMEM((kc, BBLK, LxT), f32))
        elif name in ("r1c", "r2c", "psx", "psy"):
            scratch.append(pltpu.VMEM((BBLK, LxT), i32))
        else:
            scratch.append(pltpu.VMEM((BBLK, LxT), f32))
    for name in term_names:
        scratch.append(
            pltpu.VMEM((BBLK, 1), i32 if name in ("tis", "tjs", "tcs") else f32)
        )

    score, length, ti, tj, tcode, tb = pl.pallas_call(
        kernel,
        grid=(nb, n_bands, I),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=bool(interpret),
    )(cum, tp4, cy4, cy4, invx4, invy4, invy4, lx2, ly2)

    out = {
        "score": score[:B, 0],
        "length": length[:B, 0],
        "ti": ti[:B, 0],
        "tj": tj[:B, 0],
        "tcode": tcode[:B, 0],
    }
    if traceback:
        out["tb"] = tb[: D - 2, :B, :]
    return out
