"""Pallas TPU wavefront DP kernel (SURVEY.md §9 P2, [B:5]).

Same contract and bit-exact semantics as kernels.scan.wavefront_dp (the
parity tests enforce this), but implemented as a Pallas kernel:

* grid = (batch_blocks, D - 2): the second (innermost, sequential) axis walks
  anti-diagonals; Mosaic auto-pipelines the skewed score row HBM->VMEM with
  double buffering, and traceback bits stream back per step;
* DP state vectors (M / Ix / Iy values + optional path lengths + two
  best-state reduce buffers) are VMEM scratch persisting across the
  sequential grid;
* batch blocks bound VMEM: each block of ``block_b`` problems re-initializes
  the scratch at its first diagonal step.

Cost gating: path-length carries only exist when ``lengths=True`` (the
scores-only distance stage needs them for guide-tree normalization), and
predecessor-code carries only when ``traceback=True`` (the replay needs
them); each drops roughly a third of the per-step vector work of the other
mode.  ``lengths`` defaults to ``not traceback``, matching how the batch
driver consumes the outputs.

Layout as in kernels.scan: lane i of a diagonal vector holds cell (i, d-i);
tie-breaks, border semantics and traceback bit packing are identical.
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
PTR_NONE = 31


def _pick(v, mask, fill):
    return jnp.max(jnp.where(mask, v, fill), axis=1, keepdims=True)


def _collapse(k: int) -> tuple[bool, int]:
    """k=2 collapses to classic 3-state Gotoh (one max-of-levels row per
    side) with bit-identical outputs — see the collapse note in
    kernels.scan._wavefront.  Returns (collapsed, carried level count)."""
    return k == 2, 1 if k == 2 else k


def _scratch_names(k: int, lengths: bool, traceback: bool,
                   term_rows: bool = False) -> list[str]:
    names = ["m1", "r1v", "r2v", "ix1", "iy1"]
    if term_rows:
        # Terminal ACCUMULATION ROWS (round 4): candidates are where()-d
        # into persistent (Bblk, Lp) rows each step — no per-step cross-lane
        # reduce — and the tie-break-exact reduction happens once in
        # _finish.  Measured on the v5e: the per-step masked reduces were
        # the single largest op block of the step (the DP is op-issue
        # bound; see tools/onchip_tiled.py for the traffic counter-test).
        names += ["tvr", "tjr"]
    else:
        names += ["tval", "tis", "tjs"]
    if lengths:
        names += ["lm1", "r1l", "r2l", "lix1", "liy1"]
        names += ["tlr"] if term_rows else ["tlen"]
    if traceback:
        names += ["r1c", "r2c"]
        names += ["tcr"] if term_rows else ["tcs"]
        if _collapse(k)[0]:
            names += ["psx", "psy"]  # previous diagonal's stay bits
    return names


def _carry_rows(k, lengths, traceback):
    """(f32 row names, i32 row names, f32 terminal names, i32 terminal names)
    for chunked carry I/O; order is the pack layout."""
    collapsed, kc = _collapse(k)
    f32_rows = ["m1", "r1v", "r2v"]
    if lengths:
        f32_rows += ["lm1", "r1l", "r2l"]
    f32_rows += [f"ix1_{l}" for l in range(kc)] + [f"iy1_{l}" for l in range(kc)]
    if lengths:
        f32_rows += [f"lix1_{l}" for l in range(kc)] + [f"liy1_{l}" for l in range(kc)]
    i32_rows = ["r1c", "r2c"] if traceback else []
    if traceback and collapsed:
        i32_rows += ["psx", "psy"]
    f32_terms = ["tval"] + (["tlen"] if lengths else [])
    i32_terms = ["tis", "tjs"] + (["tcs"] if traceback else [])
    return f32_rows, i32_rows, f32_terms, i32_terms


def _make_kernel(grid_d, Bblk, Lp, k, gap_series, mode, lengths, traceback,
                 quantized, unroll, chunked, first, d_base, term_rows,
                 bmajor_hs=False):
    g = [np.float32(x) for x in gap_series]
    collapsed, kc = _collapse(k)
    local = mode == "local"
    semi = mode == "semiglobal"
    border_m = np.float32(0.0 if local else NEG)
    names = _scratch_names(k, lengths, traceback, term_rows)

    def prio(m, ixs, iys, lm=None, lixs=None, liys=None, codes=False,
             codes_x=None, codes_y=None):
        """Best state with M > Ix(asc) > Iy(asc) tie preference."""
        if codes_x is None:
            codes_x = [1 + l for l in range(len(ixs))]
        if codes_y is None:
            codes_y = [1 + k + l for l in range(len(iys))]
        v = m
        ln = lm
        c = jnp.zeros((Bblk, Lp), jnp.int32) if codes else None
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

    f32_rows, i32_rows, f32_terms, i32_terms = _carry_rows(k, lengths, traceback)

    def _scr_slot(S, name):
        """Scratch ref + index for a packed carry row name."""
        if "_" in name and name.rsplit("_", 1)[-1].isdigit():
            base, l = name.rsplit("_", 1)
            return S[base], int(l)
        return S[name], None

    def kernel(cum_ref, hs_ref, lx_ref, ly_ref, *rest):
        if chunked and not first:
            cf_ref, ci_ref, tf_ref, ti_in_ref = rest[:4]
            rest = rest[4:]
        (score_ref, len_ref, ti_ref, tj_ref, tcode_ref, tb_ref) = rest[:6]
        rest = rest[6:]
        if chunked:
            cfo_ref, cio_ref, tfo_ref, tio_ref = rest[:4]
            rest = rest[4:]
        scr = rest
        S = dict(zip(names, scr))
        lane = jax.lax.broadcasted_iota(jnp.int32, (Bblk, Lp), 1)
        lx = lx_ref[:, :]  # (Bblk, 1)
        ly = ly_ref[:, :]
        negs = jnp.full((Bblk, Lp), NEG, jnp.float32)
        zeros = jnp.zeros((Bblk, Lp), jnp.float32)

        if (not chunked) or first:

            @pl.when(pl.program_id(1) == 0)
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
                    S["r2c"][:, :] = jnp.zeros((Bblk, Lp), jnp.int32)
                    S["r1c"][:, :] = c
                    if collapsed:  # d=1 border runs are level-1: stay = 0
                        S["psx"][:, :] = jnp.zeros((Bblk, Lp), jnp.int32)
                        S["psy"][:, :] = jnp.zeros((Bblk, Lp), jnp.int32)
                # terminal trackers
                if term_rows:
                    S["tvr"][:, :] = negs
                    S["tjr"][:, :] = jnp.full((Bblk, Lp), -1, jnp.int32)
                    if lengths:
                        S["tlr"][:, :] = negs
                    if traceback:
                        S["tcr"][:, :] = jnp.full((Bblk, Lp), -1, jnp.int32)
                    if semi:
                        # Diagonal-1 candidates (0,1)/(1,0) land in distinct
                        # lanes; the larger-i tie preference falls out of
                        # the final largest-lane reduce.
                        for pickc, ci, cj, code in (
                            (ly == 1, 0, 1, 1 + k),
                            (lx == 1, 1, 0, 1),
                        ):
                            m = pickc & (lane == ci)
                            S["tvr"][:, :] = jnp.where(m, 0.0, S["tvr"][:, :])
                            S["tjr"][:, :] = jnp.where(m, cj, S["tjr"][:, :])
                            if lengths:
                                S["tlr"][:, :] = jnp.where(m, 1.0, S["tlr"][:, :])
                            if traceback:
                                S["tcr"][:, :] = jnp.where(m, code, S["tcr"][:, :])
                else:
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

        if chunked and not first:

            @pl.when(pl.program_id(1) == 0)
            def _load_carries():
                for r, name in enumerate(f32_rows):
                    ref, l = _scr_slot(S, name)
                    if l is None:
                        ref[:, :] = cf_ref[r, :, :]
                    else:
                        ref[l] = cf_ref[r, :, :]
                for r, name in enumerate(i32_rows):
                    S[name][:, :] = ci_ref[r, :, :]
                for r, name in enumerate(f32_terms):
                    S[name][:, :] = tf_ref[r, :, :]
                for r, name in enumerate(i32_terms):
                    S[name][:, :] = ti_in_ref[r, :, :]

        def shift_v(v):
            return jnp.where(lane == 0, NEG, pltpu.roll(v, 1, 1))

        def shift_z(v):
            zero = jnp.zeros((), v.dtype)
            return jnp.where(lane == 0, zero, pltpu.roll(v, 1, 1))

        def _diag(u):
            d = pl.program_id(1) * unroll + u + d_base
            hraw = hs_ref[:, u, :] if bmajor_hs else hs_ref[u, :, :]
            if quantized:
                # integer scores shipped narrow; all column inverses are exactly
                # 1 in this mode (one-hot profiles), so the cast IS the score —
                # no multiplies, no excess-precision hazard
                hrow = hraw.astype(jnp.float32)
            else:
                hrow = hraw
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
                # 3-state collapse (kernels.scan collapse note): one
                # max-of-levels row per side; sx/sy are the chosen levels
                # minus one AND the next step's bit-5/6 stay values.
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
                    # length restarts at any zero-valued M cell (§8.3)
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
                    # steps start at d=2: border run level is always 2 (=k)
                    bx = np.float32(0.0) if semi else -cum_ref[0, d]
                    nix[0] = jnp.where(atd, bx, jnp.where(at0, NEG, nix[0]))
                    niy[0] = jnp.where(at0, bx, jnp.where(atd, NEG, niy[0]))
                    if lengths:
                        nlix[0] = jnp.where(atd, d_f, jnp.where(at0, 0.0, nlix[0]))
                        nliy[0] = jnp.where(at0, d_f, jnp.where(atd, 0.0, nliy[0]))
                else:
                    bx = np.float32(0.0) if semi else -cum_ref[0, d]
                    on_lvl = lvl_d == l + 1
                    nix[l] = jnp.where(atd, jnp.where(on_lvl, bx, NEG), jnp.where(at0, NEG, nix[l]))
                    niy[l] = jnp.where(at0, jnp.where(on_lvl, bx, NEG), jnp.where(atd, NEG, niy[l]))
                    if lengths:
                        nlix[l] = jnp.where(atd, d_f, jnp.where(at0, 0.0, nlix[l]))
                        nliy[l] = jnp.where(at0, d_f, jnp.where(atd, 0.0, nliy[l]))

            codes_x = codes_y = None
            if collapsed:
                # Post-border stay: (d,0) IS a level-2 run; (0,d) carries
                # no Ix (and symmetrically for Iy).
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

            # ---- terminal tracking ----
            # NOTE: gating this under pl.when(jnp.any(pick)) — terminals
            # land on <= Bblk of the D steps — measured 12% SLOWER end to
            # end on the v5e (6.45 vs 7.3e9 cells/s): the per-step scf.if
            # costs Mosaic more than the masked reduce it skips.
            if term_rows:
                # Accumulation-row form: no cross-lane reduce per step —
                # candidates where() into persistent rows; _finish reduces
                # once with the exact §8.3 tie-breaks (global: the single
                # terminal cell; semiglobal: larger i then larger j = keep
                # larger-j per lane, take the largest max lane; local:
                # smallest i then smallest j = strict-> keep per lane, take
                # the smallest max lane).
                if mode == "global":
                    mask = (d == (lx + ly)) & (lane == lx)
                    S["tvr"][:, :] = jnp.where(mask, bv, S["tvr"][:, :])
                    if lengths:
                        S["tlr"][:, :] = jnp.where(mask, bl, S["tlr"][:, :])
                    if traceback:
                        S["tcr"][:, :] = jnp.where(mask, bc, S["tcr"][:, :])
                elif semi:
                    jrow = d - lane
                    cand = ((lane == lx) & (jrow >= 0) & (jrow <= ly)) | (
                        (jrow == ly) & (lane <= lx)
                    )
                    repl = cand & (bv >= S["tvr"][:, :])
                    S["tvr"][:, :] = jnp.where(repl, bv, S["tvr"][:, :])
                    S["tjr"][:, :] = jnp.where(repl, jrow, S["tjr"][:, :])
                    if lengths:
                        S["tlr"][:, :] = jnp.where(repl, bl, S["tlr"][:, :])
                    if traceback:
                        S["tcr"][:, :] = jnp.where(repl, bc, S["tcr"][:, :])
                else:  # local: terminals are M cells
                    jrow = d - lane
                    valid = (lane >= 1) & (lane <= lx) & (jrow >= 1) & (jrow <= ly)
                    repl = valid & (nm > S["tvr"][:, :])
                    S["tvr"][:, :] = jnp.where(repl, nm, S["tvr"][:, :])
                    S["tjr"][:, :] = jnp.where(repl, jrow, S["tjr"][:, :])
                    if lengths:
                        S["tlr"][:, :] = jnp.where(repl, nlm, S["tlr"][:, :])
            elif mode == "global":
                pick = d == (lx + ly)  # (Bblk, 1)
                mask = lane == lx
                S["tval"][:, :] = jnp.where(pick, _pick(bv, mask, NEG), S["tval"][:, :])
                S["tis"][:, :] = jnp.where(pick, lx, S["tis"][:, :])
                S["tjs"][:, :] = jnp.where(pick, ly, S["tjs"][:, :])
                if lengths:
                    S["tlen"][:, :] = jnp.where(pick, _pick(bl, mask, NEG), S["tlen"][:, :])
                if traceback:
                    S["tcs"][:, :] = jnp.where(pick, _pick(bc, mask, -1), S["tcs"][:, :])
            elif semi:
                for cand_i, cand_j in ((d - ly, ly), (lx, d - lx)):
                    ok = (cand_i >= 0) & (cand_i <= lx) & (cand_j >= 0) & (cand_j <= ly)
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
                valid = (lane >= 1) & (lane <= lx) & (d - lane >= 1) & (d - lane <= ly)
                mv = jnp.where(valid, nm, NEG)
                step_best = jnp.max(mv, axis=1, keepdims=True)
                ismax = mv == step_best
                big = jnp.int32(Lp)
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
                # local terminals are M cells: tcs stays 0.

            # ---- write carries ----
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
                # int32 arithmetic (Mosaic cannot legalize sub-word shifts),
                # narrowed to uint8 at the store.
                if collapsed:
                    # bit 5 = prev diagonal's x-stay shifted (cell
                    # (i-1, j)); bit 6 = prev y-stay unshifted (cell
                    # (i, j-1)) — the per-level form's [lvl2 > lvl1].
                    bits = mcode + psxs * 32 + psyv * 64
                    S["psx"][:, :] = sxi
                    S["psy"][:, :] = syi
                else:
                    bits = mcode + stay_x.astype(jnp.int32) * 32 + stay_y.astype(jnp.int32) * 64
                if local:
                    # bit 7 = "M value <= 0": lets the local stop-at-zero
                    # walk replay on device (kernels.replay).
                    bits = bits + (nm <= 0.0).astype(jnp.int32) * 128
                tb_ref[u, :, :] = bits.astype(jnp.uint8)


        for u in range(unroll):
            _diag(u)

        @pl.when(pl.program_id(1) == grid_d - 1)
        def _finish():
            if term_rows:
                tvr = S["tvr"][:, :]
                m = jnp.max(tvr, axis=1, keepdims=True)
                score_ref[:, :] = m
                if mode == "global":
                    # the single terminal cell (lx, ly) wrote lane lx
                    ti_ref[:, :] = lx
                    tj_ref[:, :] = ly
                    mask2 = lane == lx
                else:
                    ismax = tvr == m
                    if semi:  # larger i wins ties
                        til = jnp.max(jnp.where(ismax, lane, -1), axis=1,
                                      keepdims=True)
                    else:  # local: smaller i wins ties
                        til = jnp.min(jnp.where(ismax, lane, jnp.int32(Lp)),
                                      axis=1, keepdims=True)
                    mask2 = lane == til
                    ti_ref[:, :] = til
                    tj_ref[:, :] = _pick(S["tjr"][:, :], mask2, -1)
                len_ref[:, :] = (
                    _pick(S["tlr"][:, :], mask2, NEG)
                    if lengths else jnp.zeros((Bblk, 1), jnp.float32)
                )
                tcode_ref[:, :] = (
                    _pick(S["tcr"][:, :], mask2, -1)
                    if traceback and not local
                    else jnp.zeros((Bblk, 1), jnp.int32)
                )
                return
            score_ref[:, :] = S["tval"][:, :]
            ti_ref[:, :] = S["tis"][:, :]
            tj_ref[:, :] = S["tjs"][:, :]
            len_ref[:, :] = S["tlen"][:, :] if lengths else jnp.zeros((Bblk, 1), jnp.float32)
            tcode_ref[:, :] = S["tcs"][:, :] if traceback else jnp.zeros((Bblk, 1), jnp.int32)
            if chunked:
                for r, name in enumerate(f32_rows):
                    ref, l = _scr_slot(S, name)
                    cfo_ref[r, :, :] = ref[:, :] if l is None else ref[l]
                for r, name in enumerate(i32_rows):
                    cio_ref[r, :, :] = S[name][:, :]
                for r, name in enumerate(f32_terms):
                    tfo_ref[r, :, :] = S[name][:, :]
                for r, name in enumerate(i32_terms):
                    tio_ref[r, :, :] = S[name][:, :]

    return kernel


def _bytes_per_lane(gap_series, traceback, lengths, unroll=1) -> int:
    """VMEM bytes one lane of DP state costs at the minimum batch block:
    full scratch rows (m1, r1v, r2v + ix/iy stacks, optional length/code
    carries, traceback rows, terminal accumulation rows) plus
    double-buffered hs in-blocks and tb out-blocks, plus Mosaic overhead
    headroom."""
    k = len(gap_series)
    collapsed, kc = _collapse(k)
    n_rows = 3 + 2 * kc  # m1, r1v, r2v + ix/iy stacks
    n_rows += 2  # tvr/tjr terminal accumulation rows
    if lengths:
        n_rows += 3 + 2 * kc + 1  # + tlr
    if traceback:
        n_rows += 3 + (2 if collapsed else 0)  # r1c/r2c/tcr (+psx/psy)
    return 4 * (n_rows + 2 + 2 * unroll) + (2 if traceback else 0) * unroll


def max_lanes(gap_series, traceback, lengths=None, unroll=1) -> int:
    """Largest padded lane count (Lp = bucket_x + 1) the Pallas kernel's
    VMEM state supports (~14 MB at the minimum batch block of 8).  The
    batch driver treats this as a ROUTER: longer-x problems go to the
    streamed scan (kernels.scan.wavefront_dp_streamed), never an error
    (VERDICT r1 item 6)."""
    if lengths is None:
        lengths = not traceback
    return int(14e6 // (8 * _bytes_per_lane(gap_series, traceback, lengths, unroll)))


@functools.partial(
    jax.jit,
    static_argnames=(
        "gap_series", "mode", "traceback", "lengths", "block_b", "interpret",
        "hs_body", "unroll", "chunked", "first", "d_base", "total_d",
        "term_rows", "hs_layout",
    ),
)
def wavefront_dp_pallas(
    hs: jax.Array,  # f32[D, B, Lp], or int8/int16 in quantized mode
    lx: jax.Array,  # int32[B]
    ly: jax.Array,  # int32[B]
    gap_series: tuple[int, ...] = (11, 1),
    mode: str = "global",
    traceback: bool = False,
    lengths: bool | None = None,
    block_b: int = 256,
    interpret: bool | None = None,
    hs_body: bool = False,
    unroll: int = 1,
    chunked: bool = False,
    first: bool = True,
    d_base: int = 2,
    total_d: int | None = None,
    carry_in=None,
    term_rows: bool | None = None,
    hs_layout: str = "dmajor",
):
    """Pallas TPU implementation of kernels.scan.wavefront_dp (same contract;
    ``length``/``tcode`` outputs are zeros when the respective carries are
    disabled — see module docstring).

    ``hs_body=True`` consumes the fused producer's layout (row t = diagonal
    t + 2, rows/lanes padded to tile multiples; see kernels.fused_scores):
    padded diagonals compute garbage that can never win a terminal, and
    padded lanes never reach valid cells.
    """
    if interpret is None:  # trace-time: interpret off-TPU (CPU tests)
        interpret = jax.default_backend() != "tpu"
    if lengths is None:
        lengths = not traceback
    if term_rows is None:
        # Measured on the v5e (tools/onchip_tiled.py --mode=...): the
        # accumulation rows beat the per-step masked reduces in GLOBAL mode
        # (+4%), wash in semiglobal, and LOSE in local (-18%: three wide
        # row read/writes per step outweigh the reduces they replace).
        term_rows = mode == "global" and not chunked
    if chunked and term_rows:
        raise ValueError(
            "term_rows is incompatible with chunked execution (the chunk "
            "carry layout packs the scalar terminal trackers)"
        )
    if hs_layout not in ("dmajor", "bmajor"):
        raise ValueError(f"unknown hs_layout {hs_layout!r}")
    bmajor = hs_layout == "bmajor"
    if bmajor and (not hs_body or chunked):
        raise ValueError("bmajor hs requires the body layout and no chunking")
    quantized = hs.dtype != jnp.float32
    if hs_body:
        if bmajor:
            B, rows, Lp = hs.shape
        else:
            rows, B, Lp = hs.shape
        D = rows + 2
    else:
        D, B, Lp = hs.shape
    if chunked and not hs_body:
        raise ValueError("chunked execution requires the body hs layout")
    steps = rows if hs_body else D - 2
    if bmajor and unroll < 8:
        # Mosaic needs the second-minor block dim divisible by 8: the
        # b-major layout puts steps on sublanes, so the DP must consume
        # (at least) 8 diagonals per grid block.
        unroll = 8
    if unroll > 1 and (not hs_body or steps % unroll):
        if bmajor:
            raise ValueError("bmajor hs needs steps divisible by 8")
        unroll = 1  # unrolling needs the padded body layout
    grid_d = steps // unroll
    k = len(gap_series)
    bytes_per_row = Lp * _bytes_per_lane(gap_series, traceback, lengths, unroll)
    vmem_rows = max(8, int(10e6 // max(bytes_per_row, 1)))
    block_cap = 8
    while block_cap * 2 <= vmem_rows:
        block_cap *= 2
    if Lp > max_lanes(gap_series, traceback, lengths, unroll):
        raise ValueError(
            f"sequence bucket {Lp - 1} too long for the Pallas kernel's VMEM "
            f"state (~{8 * bytes_per_row / 1e6:.0f} MB at the minimum batch "
            f"block); route through kernels.scan.wavefront_dp_streamed "
            f"(kernels.batch does this automatically)"
        )
    Bblk = min(block_b, B, block_cap)
    pad = (-B) % Bblk
    if pad:  # pad with trivial length-1 problems; sliced off below
        bpad = ((0, pad), (0, 0), (0, 0)) if bmajor else ((0, 0), (0, pad), (0, 0))
        hs = jnp.pad(hs, bpad)
        lx = jnp.pad(lx, (0, pad), constant_values=1)
        ly = jnp.pad(ly, (0, pad), constant_values=1)
    B_run = B + pad
    nb = B_run // Bblk

    cum_d = total_d if total_d is not None else D
    cum = jnp.asarray(_gap_prefix(gap_series, cum_d), dtype=jnp.float32)[None, :]
    lx2 = lx.astype(jnp.int32)[:, None]
    ly2 = ly.astype(jnp.int32)[:, None]

    kernel = _make_kernel(
        grid_d, Bblk, Lp, k, tuple(gap_series), mode, lengths, traceback,
        quantized, unroll, chunked, first, d_base, term_rows,
        bmajor_hs=bmajor,
    )

    f32 = jnp.float32
    i32 = jnp.int32
    if traceback:
        tb_shape = jax.ShapeDtypeStruct((D - 2, B_run, Lp), jnp.uint8)
        tb_spec = pl.BlockSpec(
            (unroll, Bblk, Lp), lambda b, d: (d, b, 0), memory_space=pltpu.VMEM
        )
    else:
        tb_shape = jax.ShapeDtypeStruct((grid_d, 1, 1), jnp.uint8)
        tb_spec = pl.BlockSpec((1, 1, 1), lambda b, d: (d, 0, 0), memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct((B_run, 1), f32),  # score
        jax.ShapeDtypeStruct((B_run, 1), f32),  # length
        jax.ShapeDtypeStruct((B_run, 1), i32),  # ti
        jax.ShapeDtypeStruct((B_run, 1), i32),  # tj
        jax.ShapeDtypeStruct((B_run, 1), i32),  # tcode
        tb_shape,
    )
    bspec = lambda: pl.BlockSpec((Bblk, 1), lambda b, d: (b, 0), memory_space=pltpu.VMEM)
    grid = (nb, grid_d)
    if bmajor:
        hs_spec = pl.BlockSpec(
            (Bblk, unroll, Lp), lambda b, d: (b, d, 0), memory_space=pltpu.VMEM
        )
    elif hs_body:
        hs_spec = pl.BlockSpec(
            (unroll, Bblk, Lp), lambda b, d: (d, b, 0), memory_space=pltpu.VMEM
        )
    else:
        hs_spec = pl.BlockSpec(
            (1, Bblk, Lp), lambda b, d: (d + 2, b, 0), memory_space=pltpu.VMEM
        )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # cum (full)
        hs_spec,
        bspec(),  # lx
        bspec(),  # ly
    ]
    inputs = [cum, hs, lx2, ly2]
    out_specs = (bspec(), bspec(), bspec(), bspec(), bspec(), tb_spec)

    if chunked:
        f32_rows, i32_rows, f32_terms, i32_terms = _carry_rows(k, lengths, traceback)
        nrf, nri = len(f32_rows), max(1, len(i32_rows))
        ntf, nti = len(f32_terms), len(i32_terms)
        row_spec = lambda n: pl.BlockSpec(
            (n, Bblk, Lp), lambda b, d: (0, b, 0), memory_space=pltpu.VMEM
        )
        term_spec = lambda n: pl.BlockSpec(
            (n, Bblk, 1), lambda b, d: (0, b, 0), memory_space=pltpu.VMEM
        )
        carry_specs = [row_spec(nrf), row_spec(nri), term_spec(ntf), term_spec(nti)]
        carry_shapes = (
            jax.ShapeDtypeStruct((nrf, B_run, Lp), f32),
            jax.ShapeDtypeStruct((nri, B_run, Lp), i32),
            jax.ShapeDtypeStruct((ntf, B_run, 1), f32),
            jax.ShapeDtypeStruct((nti, B_run, 1), i32),
        )
        if not first:
            if carry_in is None:
                raise ValueError("non-first chunk requires carry_in")
            in_specs = in_specs + carry_specs
            inputs = inputs + list(carry_in)
        out_shape = out_shape + carry_shapes
        out_specs = out_specs + tuple(carry_specs)

    kc = _collapse(k)[1]
    scratch = []
    for name in _scratch_names(k, lengths, traceback, term_rows):
        if name in ("tval", "tlen"):
            scratch.append(pltpu.VMEM((Bblk, 1), f32))
        elif name in ("tis", "tjs", "tcs"):
            scratch.append(pltpu.VMEM((Bblk, 1), i32))
        elif name in ("ix1", "iy1", "lix1", "liy1"):
            scratch.append(pltpu.VMEM((kc, Bblk, Lp), f32))
        elif name in ("r1c", "r2c", "psx", "psy", "tjr", "tcr"):
            scratch.append(pltpu.VMEM((Bblk, Lp), i32))
        else:  # m1, r1v, r2v, lm1, r1l, r2l, tvr, tlr
            scratch.append(pltpu.VMEM((Bblk, Lp), f32))

    results = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=bool(interpret),
    )(*inputs)
    score, length, ti, tj, tcode, tb = results[:6]

    out = {
        "score": score[:B, 0],
        "length": length[:B, 0],
        "ti": ti[:B, 0],
        "tj": tj[:B, 0],
        "tcode": tcode[:B, 0],
    }
    if traceback:
        out["tb"] = tb[:, :B, :]
    if chunked:
        out["carry"] = tuple(results[6:10])
    return out
