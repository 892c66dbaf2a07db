"""Strip-packed wavefront DP: R problems per lane-row (SURVEY.md §9 P2).

The classic wavefront layout (kernels.pallas_dp) walks D = Lx+Ly-1
anti-diagonals over Lp = Lx+1 lanes, so a square problem keeps only ~50% of
the lanes on real cells (the wavefront ramps up and down).  This kernel
packs a STRIP of R problems along the column axis of one problem-row:
problem ``r`` of a slot owns global strip columns ``[r*K, r*K + Ly]``
(K a power-of-two multiple of 128, K >= max(Lx+1, Ly+1)), so while one
problem's band drains from the low lanes the next problem's band grows into
them — steady-state lane utilization is Lx*Ly/(K*Lp) * R/(R+1) (~94% for
the square 1023 bucket at R=16, measured ~50% before), and the skewed score
tensor shrinks by the same factor.

Coordinates: lane i holds cell (i, jl) of the problem owning global column
jg = d - i, with r = jg // K and jl = jg mod K.  Exactly one lane per step
crosses a problem seam (jl == 0, K >= Lp), where the kernel writes the
j=0-column border values for the entering problem — the classic kernel's
``atd`` border generalized.  Per-lane owner state (lxv/lyv) updates at the
seam; terminal candidates accumulate into persistent rows (the round-4
terminal-accumulation form) and are HARVESTED one lane per step as the seam
retires that lane's previous owner, with §8.3/§8.4 tie-breaks preserved:
per-lane accumulation resolves the j tie direction, harvest order (lanes in
increasing i) resolves the i direction.

Covers scores mode (the all-pairs distance stage — the headline workload)
AND traceback dispatches that replay on device: the packed direction bytes
come out in strip layout and kernels.replay.replay_moves walks it directly
(``strip=(K, R)``); only host-replayed shapes keep the classic kernel.
Bit-identical to kernels.scan.wavefront_dp per problem: same recurrence,
same f32 ops per cell, same producer values
(kernels.fused_scores.fused_skewed_scores_strip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_dp import NEG, PTR_NONE, _collapse
from .scan import _gap_prefix


def _scratch_names(k: int, mode: str, lengths: bool,
                   traceback: bool = False, unroll: int = 1,
                   opt: bool = True, K: int = 128) -> list[str]:
    # Even unrolls double-buffer the two-step value carries by static step
    # parity ("rv" = (2, Bblk, Lp)) instead of shuffling r2 <- r1 every step.
    pair = unroll % 2 == 0 and opt
    names = ["m1"] + (["rv"] if pair else ["r1v", "r2v"]) + ["ix1", "iy1"]
    if mode != "global" or not opt:
        # Optimized global streams terminal masks as per-step tables (the
        # terminal step/lane is known host-side); semi/local (and the
        # unoptimized A/B form) carry the owner lengths instead.
        names += ["lxv", "lyv"]
    names += ["tvr"]
    if mode != "global":
        names += ["tjr"]
    if lengths:
        names += ["lm1"] + (["rl"] if pair else ["r1l", "r2l"])
        names += ["lix1", "liy1", "tlr"]
    if traceback:
        names += ["rc"] if pair else ["r1c", "r2c"]
        if mode != "local":
            names += ["tcr"]
        if _collapse(k)[0]:
            names += ["psx", "psy"]
    if K & (K - 1):
        names += ["jlr"]  # carried column clock for non-pow2 strides
    return names


def _make_strip_kernel(grid_d, Bblk, Lp, K, R, k, gap_series, mode, lengths,
                       quantized, unroll, bmajor_hs, traceback=False,
                       opt=True):
    g = [np.float32(x) for x in gap_series]
    collapsed, kc = _collapse(k)
    local = mode == "local"
    semi = mode == "semiglobal"
    glob = mode == "global"
    pair = unroll % 2 == 0 and opt
    # gtab: global-mode terminal masks stream as even/odd per-step lane
    # tables (lxe_ref/lye_ref carry them), the owner-length carries and the
    # seam resets disappear, and the XLA reduction gathers at the known
    # terminal lane.  Measured on the v5e vs the opt=False form (round 5).
    gtab = glob and opt
    border_m = np.float32(0.0 if local else NEG)
    # Non-pow2 strides (any multiple of 128 >= Lp) carry the per-lane
    # column clock as scratch state (+1 / wrap-at-K) instead of the pow2
    # sub+and — one extra op and row, but K stops rounding up to a power
    # of two (a 1151 bucket runs K=1152 instead of 2048: ~1.8x fewer
    # lane-steps).  Pow2 K keeps the cheaper stateless clock.
    pow2K = K & (K - 1) == 0
    names = _scratch_names(k, mode, lengths, traceback, unroll, opt, K)
    assert K % 128 == 0 and K >= Lp and (unroll <= 1 or K % unroll == 0)

    def prio(m, ixs, iys, lm=None, lixs=None, liys=None, codes=False,
             codes_x=None, codes_y=None):
        """Best state with M > Ix(asc) > Iy(asc) tie preference (codes as in
        kernels.scan's traceback-bit contract)."""
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

    def kernel(cum_ref, cumv_ref, lxe_ref, lye_ref, hs_ref,
               resv_ref, resl_ref, resj_ref, resc_ref, tb_ref, *scr):
        S = dict(zip(names, scr))
        lane = jax.lax.broadcasted_iota(jnp.int32, (Bblk, Lp), 1)
        negs = jnp.full((Bblk, Lp), NEG, jnp.float32)
        zeros = jnp.zeros((Bblk, Lp), jnp.float32)

        @pl.when(pl.program_id(1) == 0)
        def _init():
            # Everything flows through the seam logic, including problem 0's
            # borders: step d=0 seams lane 0 (the (0,0) corner).
            if not gtab:
                S["lxv"][:, :] = jnp.full((Bblk, Lp), -1, jnp.int32)
                S["lyv"][:, :] = jnp.full((Bblk, Lp), -1, jnp.int32)
            S["m1"][:, :] = negs
            if pair:
                S["rv"][0] = negs
                S["rv"][1] = negs
            else:
                S["r1v"][:, :] = negs
                S["r2v"][:, :] = negs
            for l in range(kc):
                S["ix1"][l] = negs
                S["iy1"][l] = negs
                if lengths:
                    S["lix1"][l] = zeros
                    S["liy1"][l] = zeros
            S["tvr"][:, :] = negs
            if mode != "global":
                S["tjr"][:, :] = jnp.full((Bblk, Lp), -1, jnp.int32)
            if lengths:
                S["lm1"][:, :] = zeros
                if pair:
                    S["rl"][0] = zeros
                    S["rl"][1] = zeros
                else:
                    S["r1l"][:, :] = zeros
                    S["r2l"][:, :] = zeros
                S["tlr"][:, :] = negs
            if traceback:
                izeros = jnp.zeros((Bblk, Lp), jnp.int32)
                if pair:
                    S["rc"][0] = izeros
                    S["rc"][1] = izeros
                else:
                    S["r1c"][:, :] = izeros
                    S["r2c"][:, :] = izeros
                if not local:
                    S["tcr"][:, :] = jnp.full((Bblk, Lp), -1, jnp.int32)
                if collapsed:
                    S["psx"][:, :] = izeros
                    S["psy"][:, :] = izeros

        if not pow2K:

            @pl.when(pl.program_id(1) == 0)
            def _init_clock():
                S["jlr"][:, :] = K - 1 - lane

        # Result-tape blocks: block r collects problem r's harvests (its
        # window [(r+1)K, (r+2)K) covers the whole harvest span
        # [(r+1)K, (r+1)K + Lp) since Lp <= K); initialize at first visit.
        @pl.when(
            (jax.lax.bitwise_and(pl.program_id(1) * unroll, K - 1) == 0)
            if pow2K
            else (jax.lax.rem(pl.program_id(1) * unroll, K) == 0)
        )
        def _init_tape():
            resv_ref[:, :] = negs
            if mode != "global":
                resj_ref[:, :] = jnp.full((Bblk, Lp), -1, jnp.int32)
            if lengths:
                resl_ref[:, :] = negs
            if traceback and not local:
                resc_ref[:, :] = jnp.zeros((Bblk, Lp), jnp.int32)

        # Plain circular rolls: the wrap value landing in lane 0 is garbage,
        # but every consumer's lane-0 result (nm, nix/niy, nlm, nlix/nliy)
        # is overwritten by the at0 border writes below, so the classic
        # kernel's lane-0 kill where()s are dead ops here (parity-tested).
        def shift_v(v):
            return pltpu.roll(v, 1, 1)

        shift_z = shift_v

        def _diag(u):
            d = pl.program_id(1) * unroll + u
            hraw = hs_ref[:, u, :] if bmajor_hs else hs_ref[u, :, :]
            hrow = hraw.astype(jnp.float32) if quantized else hraw

            # Per-lane column index: jl = (d - lane) mod K; jl == 0 IS the
            # seam.  Ramp-in lanes (d < lane) wrap to large positive jl and
            # can never seam (|d - lane| < K) or match a terminal (lyv
            # starts at -1).  Pow2 K: one sub + and; other K: carried
            # clock row (+1, wrap at K).
            if pow2K:
                j0 = jax.lax.bitwise_and(d, K - 1)  # lane-0 column
                jl = jax.lax.bitwise_and(d - lane, K - 1)
                seam = jl == 0
            else:
                j0 = jax.lax.rem(d, K)
                jlc = S["jlr"][:, :] + 1
                seam = jlc == K
                jl = jnp.where(seam, 0, jlc)
                S["jlr"][:, :] = jl

            if gtab:
                # Terminal-mask tables: lxe_ref/lye_ref stream the per-step
                # terminal LANE for even/odd problems (-1 = none; a problem's
                # terminal step r*K + lx + ly never collides with the one two
                # problems over).  No owner-length carries needed.
                tm0 = lxe_ref[0, :, u : u + 1]
                tm1 = lye_ref[0, :, u : u + 1]
            else:
                # Owner lengths: the seam lane adopts the entering problem's
                # lx/ly, streamed as per-step columns (a masked reduce over
                # the slot row measured slower on the v5e — the tables are
                # tiny next to hs).
                lxe = lxe_ref[0, :, u : u + 1]
                lye = lye_ref[0, :, u : u + 1]
                lxv = jnp.where(seam, lxe, S["lxv"][:, :])
                lyv = jnp.where(seam, lye, S["lyv"][:, :])
                S["lxv"][:, :] = lxv
                S["lyv"][:, :] = lyv

            m1v = S["m1"][:, :]
            m1s = shift_v(m1v)
            b2vs = shift_v(S["rv"][u & 1] if pair else S["r2v"][:, :])
            if lengths:
                lm1v = S["lm1"][:, :]
                lm1s = shift_z(lm1v)
                b2ls = shift_z(S["rl"][u & 1] if pair else S["r2l"][:, :])
            if traceback:
                b2cs = shift_z(S["rc"][u & 1] if pair else S["r2c"][:, :])
                if collapsed:
                    psxs = shift_z(S["psx"][:, :])  # prev stay, cell (i-1, j)
                    psyv = S["psy"][:, :]  # prev stay, cell (i, j-1)

            ix1 = [S["ix1"][l] for l in range(kc)]
            iy1 = [S["iy1"][l] for l in range(kc)]
            if lengths:
                lix1 = [S["lix1"][l] for l in range(kc)]
                liy1 = [S["liy1"][l] for l in range(kc)]
            nix = [None] * kc
            niy = [None] * kc
            nlix = [None] * kc
            nliy = [None] * kc
            if collapsed:
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

            # ---- seam / row borders (the classic atd/at0 generalized) ----
            at0 = lane == 0
            if local or not opt:
                border = seam | at0
                nm = jnp.where(border, border_m, nm)
                if not local:
                    # corner (0, 0) of the entering problem: M = 0
                    nm = jnp.where(seam & at0, 0.0, nm)
                if lengths:
                    nlm = jnp.where(border, 0.0, nlm)
            else:
                # The (0, 0) corner folds into the lane-0 border as a SCALAR
                # select: seam & at0 <=> j0 == 0 (one vector op cheaper than
                # the or + corner-where form).
                xbs = jnp.where(j0 == 0, 0.0, NEG)
                nm = jnp.where(at0, xbs, jnp.where(seam, NEG, nm))
                if lengths:
                    nlm = jnp.where(at0, 0.0, jnp.where(seam, 0.0, nlm))
            j0f = j0.astype(jnp.float32)
            lanef = lane.astype(jnp.float32)
            if local:
                for l in range(kc):
                    nix[l] = jnp.where(border, NEG, nix[l])
                    niy[l] = jnp.where(border, NEG, niy[l])
                    if lengths:
                        nlix[l] = jnp.where(border, 0.0, nlix[l])
                        nliy[l] = jnp.where(border, 0.0, nliy[l])
            else:
                if semi:
                    bxv = zeros
                    bys = np.float32(0.0)
                else:
                    bxv = -cumv_ref[:1, :]  # (1, Lp) broadcasts over Bblk
                    bys = -cum_ref[0, j0]
                if collapsed or k == 1:
                    nix[0] = jnp.where(at0, NEG, jnp.where(seam, bxv, nix[0]))
                    niy[0] = jnp.where(seam, NEG, jnp.where(at0, bys, niy[0]))
                    if lengths:
                        nlix[0] = jnp.where(seam, lanef, jnp.where(at0, 0.0, nlix[0]))
                        nliy[0] = jnp.where(at0, j0f, jnp.where(seam, 0.0, nliy[0]))
                else:
                    lvl_j = jnp.minimum(j0, k)
                    for l in range(kc):
                        onx = jnp.minimum(lane, k) == l + 1
                        nix[l] = jnp.where(
                            at0, NEG,
                            jnp.where(seam, jnp.where(onx, bxv, NEG), nix[l]),
                        )
                        ony = lvl_j == l + 1
                        niy[l] = jnp.where(
                            seam, NEG,
                            jnp.where(at0, jnp.where(ony, bys, NEG), niy[l]),
                        )
                        if lengths:
                            nlix[l] = jnp.where(seam, lanef, jnp.where(at0, 0.0, nlix[l]))
                            nliy[l] = jnp.where(at0, j0f, jnp.where(seam, 0.0, nliy[l]))

            codes_x = codes_y = None
            if collapsed:
                # Post-border stay bits (kernels.pallas_dp): (i, 0) IS a
                # level-2 run (seam plays the classic atd); (0, j) carries
                # no Ix — boolean algebra, not scalar-True selects (Mosaic
                # cannot legalize the i8->i1 truncation those lower to).
                if local:
                    sx = sx & ~border
                    sy = sy & ~border
                else:
                    sx = seam | (sx & ~at0)
                    sy = at0 | (sy & ~seam)
                if traceback:
                    sxi = sx.astype(jnp.int32)
                    syi = sy.astype(jnp.int32)
                    codes_x, codes_y = [1 + sxi], [1 + k + syi]

            bv, bl, bc = prio(nm, nix, niy,
                              nlm if lengths else None,
                              nlix if lengths else None,
                              nliy if lengths else None,
                              codes=traceback,
                              codes_x=codes_x, codes_y=codes_y)

            # ---- terminal accumulation (per lane, current owner) ----
            tvr = S["tvr"][:, :]
            if lengths:
                tlr = S["tlr"][:, :]
            tcr = S["tcr"][:, :] if traceback and not local else None
            tcn = None
            if mode == "global":
                if gtab:
                    tmask = (lane == tm0) | (lane == tm1)
                else:
                    tmask = (jl == lyv) & (lane == lxv)
                tn = jnp.where(tmask, bv, tvr)
                tln = jnp.where(tmask, bl, tlr) if lengths else None
                if tcr is not None:
                    tcn = jnp.where(tmask, bc, tcr)
                tjn = None
            elif semi:
                tjr = S["tjr"][:, :]
                cand = ((lane == lxv) & (jl <= lyv)) | ((jl == lyv) & (lane <= lxv))
                # on the seam lane the accumulator belongs to the RETIRING
                # owner; the entering problem's candidate compares fresh
                repl = cand & ((bv >= tvr) | seam)
                # The entering problem's (lx, 0) border cell IS a semiglobal
                # candidate and lands on the seam lane at the seam step —
                # it must not pollute the retiring owner's harvest (and must
                # survive the seam reset), so it is applied after both.
                repl_o = repl & ~seam
                tn = jnp.where(repl_o, bv, tvr)
                tjn = jnp.where(repl_o, jl, tjr)
                tln = jnp.where(repl_o, bl, tlr) if lengths else None
                if tcr is not None:
                    tcn = jnp.where(repl_o, bc, tcr)
            else:  # local: terminals are M cells, smallest i then smallest j
                tjr = S["tjr"][:, :]
                valid = (lane >= 1) & (lane <= lxv) & (jl >= 1) & (jl <= lyv)
                repl = valid & (nm > tvr)
                tn = jnp.where(repl, nm, tvr)
                tjn = jnp.where(repl, jl, tjr)
                tln = jnp.where(repl, nlm, tlr) if lengths else None

            # ---- harvest: the seam retires its lane's previous owner ----
            # The retiring lane's accumulated terminal (read BEFORE the seam
            # reset; the entering problem cannot place a candidate on its own
            # seam step — semiglobal's exception is handled above) lands in
            # the current result-tape block IN PLACE: no cross-lane movement
            # in-kernel, the per-problem tie-break reduction runs in XLA on
            # the (R, Bs, Lp) tapes afterwards.
            resv_ref[:, :] = jnp.where(seam, tn, resv_ref[:, :])
            if tjn is not None:
                resj_ref[:, :] = jnp.where(seam, tjn, resj_ref[:, :])
            if lengths:
                resl_ref[:, :] = jnp.where(seam, tln, resl_ref[:, :])
            if tcn is not None:
                resc_ref[:, :] = jnp.where(seam, tcn, resc_ref[:, :])

            # seam resets (after harvest); in semiglobal the entering
            # problem's seam-lane candidate applies after the reset
            if semi:
                repl_n = repl & seam
                S["tvr"][:, :] = jnp.where(repl_n, bv, jnp.where(seam, NEG, tn))
                S["tjr"][:, :] = jnp.where(repl_n, jl, jnp.where(seam, -1, tjn))
                if lengths:
                    S["tlr"][:, :] = jnp.where(
                        repl_n, bl, jnp.where(seam, NEG, tln)
                    )
                if tcn is not None:
                    S["tcr"][:, :] = jnp.where(
                        repl_n, bc, jnp.where(seam, -1, tcn)
                    )
            elif gtab:
                # No seam reset: a lane receives exactly one terminal
                # between harvests (live problems have ly >= 1, so the
                # next owner's terminal lands strictly after this lane's
                # harvest), and the XLA reduction gathers at the known
                # terminal lane, so stale lanes are never read.
                S["tvr"][:, :] = tn
                if lengths:
                    S["tlr"][:, :] = tln
                if tcn is not None:
                    S["tcr"][:, :] = tcn
            else:
                S["tvr"][:, :] = jnp.where(seam, NEG, tn)
                if tjn is not None:
                    S["tjr"][:, :] = jnp.where(seam, -1, tjn)
                if lengths:
                    S["tlr"][:, :] = jnp.where(seam, NEG, tln)
                if tcn is not None:
                    S["tcr"][:, :] = jnp.where(seam, -1, tcn)

            # ---- write carries ----
            S["m1"][:, :] = nm
            for l in range(kc):
                S["ix1"][l] = nix[l]
                S["iy1"][l] = niy[l]
                if lengths:
                    S["lix1"][l] = nlix[l]
                    S["liy1"][l] = nliy[l]
            if pair:
                S["rv"][u & 1] = bv
            else:
                S["r2v"][:, :] = S["r1v"][:, :]
                S["r1v"][:, :] = bv
            if lengths:
                S["lm1"][:, :] = nlm
                if pair:
                    S["rl"][u & 1] = bl
                else:
                    S["r2l"][:, :] = S["r1l"][:, :]
                    S["r1l"][:, :] = bl
            if traceback:
                if pair:
                    S["rc"][u & 1] = bc
                else:
                    S["r2c"][:, :] = S["r1c"][:, :]
                    S["r1c"][:, :] = bc
                # Same packed-byte contract as kernels.scan/pallas_dp: int32
                # arithmetic, narrowed at the store.
                if collapsed:
                    bits = mcode + psxs * 32 + psyv * 64
                    S["psx"][:, :] = sxi
                    S["psy"][:, :] = syi
                else:
                    bits = (
                        mcode
                        + stay_x.astype(jnp.int32) * 32
                        + stay_y.astype(jnp.int32) * 64
                    )
                if local:
                    bits = bits + (nm <= 0.0).astype(jnp.int32) * 128
                tb_ref[u, :, :] = bits.astype(jnp.uint8)

        for u in range(unroll):
            _diag(u)

    return kernel


def strip_steps(Lp: int, K: int, R: int) -> int:
    """Strip step count: the last problem's harvests end at R*K + Lp - 1."""
    return R * K + Lp


def strip_stride(bx: int, by: int) -> int:
    """Slot stride K for a (bucket_x, bucket_y) group: the smallest
    multiple of 128 covering both Lx+1 and Ly+1 (producer tile alignment
    needs 128 | K; one-seam-per-step needs K >= Lp).  Pow2 K keeps the
    stateless in-kernel column clock; other K carry the clock as scratch
    (round 5) — so K no longer rounds up to a power of two (a 1151 bucket
    runs K=1152, not 2048)."""
    need = max(bx + 1, by + 1, 128)
    return -(-need // 128) * 128


def _bytes_per_lane_strip(k: int, mode: str, lengths: bool, unroll: int,
                          quantized: bool, traceback: bool = False) -> int:
    collapsed, kc = _collapse(k)
    # m1 + value pair + ix/iy + owner/clock rows + tvr (the opt variants
    # trade lxv/lyv for jlr-or-nothing; budget the larger layout).
    n32 = 3 + 2 * kc + 2 + 1
    if mode != "global":
        n32 += 1  # tjr
    if lengths:
        n32 += 3 + 2 * kc + 1
    if traceback:
        n32 += 2 + (1 if mode != "local" else 0) + (2 if collapsed else 0)
    hs_b = (1 if quantized else 4) * unroll * 2  # double-buffered in-blocks
    tb_b = (2 * unroll) if traceback else 0  # double-buffered out-blocks
    return 4 * (n32 + 2) + hs_b + tb_b


@functools.partial(
    jax.jit,
    static_argnames=("K", "R", "gap_series", "mode", "lengths", "block_b",
                     "interpret", "unroll", "hs_layout", "traceback", "opt"),
)
def wavefront_dp_strip(
    hs: jax.Array,  # f32/int8/int16 [D_pad, Bs, Lp] or [Bs, D_pad, Lp]
    lx: jax.Array,  # int32[Bs, R]
    ly: jax.Array,  # int32[Bs, R]
    K: int,
    R: int,
    gap_series: tuple[int, ...] = (11, 1),
    mode: str = "global",
    lengths: bool | None = None,
    block_b: int = 256,
    interpret: bool | None = None,
    unroll: int = 1,
    hs_layout: str = "dmajor",
    traceback: bool = False,
    opt: bool = True,
):
    """Run the strip DP over R problems per slot row; returns per-problem
    ``score``/``length``/``ti``/``tj`` (+``tcode``) arrays of shape (Bs, R),
    plus ``tb`` (uint8[rows, Bs, Lp], row = strip step) when ``traceback``.

    ``hs`` rows are strip steps (d starts at 0 — the producer layout of
    kernels.fused_scores.fused_skewed_scores_strip); rows beyond
    ``strip_steps(Lp, K, R)`` are padding the kernel walks harmlessly.
    Slot padding: lx/ly entries of -1 mark dead problems (their outputs are
    NEG/garbage and must be discarded by the caller).
    """
    if lengths is None:
        lengths = not traceback
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if hs_layout not in ("dmajor", "bmajor"):
        raise ValueError(f"unknown hs_layout {hs_layout!r}")
    bmajor = hs_layout == "bmajor"
    quantized = hs.dtype != jnp.float32
    if bmajor:
        Bs, rows, Lp = hs.shape
    else:
        rows, Bs, Lp = hs.shape
    if K % 128 or K < Lp:
        raise ValueError("strip stride K must be a multiple of 128 >= Lp")
    if R < 1:
        raise ValueError("R must be >= 1")
    if bmajor:
        # sublane granularity: the b-major layout puts steps on sublanes,
        # so the DP must consume a full sublane tile of diagonals per grid
        # block (8 for f32, 32 for int8 hs).
        unroll = max(unroll, 32 if quantized else 8)
    if rows % unroll:
        raise ValueError("hs rows must be a multiple of the unroll")
    grid_d = rows // unroll
    k = len(gap_series)

    bytes_per_row = Lp * _bytes_per_lane_strip(
        k, mode, lengths, unroll, quantized, traceback
    )
    vmem_rows = max(8, int(10e6 // max(bytes_per_row, 1)))
    block_cap = 8
    while block_cap * 2 <= vmem_rows:
        block_cap *= 2
    Bblk = min(block_b, Bs, block_cap)
    pad = (-Bs) % Bblk
    if pad:
        bpad = ((0, pad), (0, 0), (0, 0)) if bmajor else ((0, 0), (0, pad), (0, 0))
        hs = jnp.pad(hs, bpad)
        lx = jnp.pad(lx, ((0, pad), (0, 0)), constant_values=-1)
        ly = jnp.pad(ly, ((0, pad), (0, 0)), constant_values=-1)
    Bs_run = Bs + pad
    nb = Bs_run // Bblk

    gtab = mode == "global" and opt
    if gtab:
        # Terminal-lane tables: tbl[b, d] = lx[b, r] when d is problem r's
        # terminal step r*K + lx + ly, else -1.  Even/odd problems split
        # into two tables — d_r < (r+2)K <= d_{r+2}, so entries two apart
        # never collide; adjacent ones can.  Dead problems (lx/ly = -1)
        # scatter out of range and are dropped.
        lxi, lyi = lx.astype(jnp.int32), ly.astype(jnp.int32)
        ri = jnp.arange(R, dtype=jnp.int32)[None, :]
        d_r = ri * K + lxi + lyi
        d_r = jnp.where((lxi >= 0) & (lyi >= 0), d_r, rows)
        bi = jnp.arange(Bs_run, dtype=jnp.int32)[:, None]

        def _table(sel):
            t = jnp.full((Bs_run, rows), -1, jnp.int32)
            return t.at[bi, d_r[:, sel]].set(lxi[:, sel], mode="drop")

        # (grid_d, Bs, unroll) so the block's trailing dims satisfy Mosaic's
        # (8, 128)-or-full tiling rule via the full-dim escape.
        lxE = _table(slice(0, None, 2)).reshape(
            Bs_run, grid_d, unroll).transpose(1, 0, 2)
        lyE = _table(slice(1, None, 2)).reshape(
            Bs_run, grid_d, unroll).transpose(1, 0, 2)
    else:
        # Per-step entering-owner tables: lxE[b, d] = lx[b, d >> log2K] (-1
        # past the last problem) — streamed as (Bblk, unroll) blocks so the
        # kernel needs no per-step reduce to fetch the seam lane's owner
        # lengths.
        ridx = jnp.minimum(jnp.arange(rows, dtype=jnp.int32) // K, R)
        lx_pad = jnp.concatenate(
            [lx.astype(jnp.int32), jnp.full((Bs_run, 1), -1, jnp.int32)], axis=1
        )
        ly_pad = jnp.concatenate(
            [ly.astype(jnp.int32), jnp.full((Bs_run, 1), -1, jnp.int32)], axis=1
        )
        lxE = jnp.take(lx_pad, ridx, axis=1).reshape(
            Bs_run, grid_d, unroll).transpose(1, 0, 2)
        lyE = jnp.take(ly_pad, ridx, axis=1).reshape(
            Bs_run, grid_d, unroll).transpose(1, 0, 2)

    cum_np = _gap_prefix(gap_series, max(K, Lp))
    cum = jnp.asarray(cum_np[:K], jnp.float32)[None, :]  # (1, K) SMEM
    cumv = jnp.asarray(cum_np[:Lp], jnp.float32)[None, :]  # (1, Lp) VMEM

    kernel = _make_strip_kernel(
        grid_d, Bblk, Lp, K, R, k, tuple(gap_series), mode, lengths,
        quantized, unroll, bmajor, traceback=traceback, opt=opt,
    )

    f32, i32 = jnp.float32, jnp.int32
    if bmajor:
        hs_spec = pl.BlockSpec(
            (Bblk, unroll, Lp), lambda b, d: (b, d, 0), memory_space=pltpu.VMEM
        )
    else:
        hs_spec = pl.BlockSpec(
            (unroll, Bblk, Lp), lambda b, d: (d, b, 0), memory_space=pltpu.VMEM
        )
    table_spec = lambda: pl.BlockSpec(
        (1, Bblk, unroll), lambda b, d: (d, b, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # cum (full)
        pl.BlockSpec((1, Lp), lambda b, d: (0, 0), memory_space=pltpu.VMEM),
        table_spec(),  # lxE
        table_spec(),  # lyE
        hs_spec,
    ]
    if K & (K - 1) == 0:
        log2k = K.bit_length() - 1

        def tape_idx(b, d):
            return (jnp.clip((d * unroll >> log2k) - 1, 0, R - 1), b, 0)

    else:

        def tape_idx(b, d):
            return (jnp.clip((d * unroll) // K - 1, 0, R - 1), b, 0)

    tape_spec = lambda: pl.BlockSpec(
        (None, Bblk, Lp), tape_idx, memory_space=pltpu.VMEM
    )
    dummy_spec = lambda: pl.BlockSpec(
        (None, 1, 1), lambda b, d: (0, 0, 0), memory_space=pltpu.VMEM
    )
    has_tcode = traceback and mode != "local"
    if has_tcode:
        resc_shape = jax.ShapeDtypeStruct((R, Bs_run, Lp), i32)
        resc_spec = tape_spec()
    else:
        resc_shape = jax.ShapeDtypeStruct((R, 1, 1), i32)
        resc_spec = dummy_spec()
    if lengths:
        resl_shape = jax.ShapeDtypeStruct((R, Bs_run, Lp), f32)
        resl_spec = tape_spec()
    else:
        resl_shape = jax.ShapeDtypeStruct((R, 1, 1), f32)
        resl_spec = dummy_spec()
    if mode != "global":
        resj_shape = jax.ShapeDtypeStruct((R, Bs_run, Lp), i32)
        resj_spec = tape_spec()
    else:  # global terminals are (lx, ly); the j tape is never written
        resj_shape = jax.ShapeDtypeStruct((R, 1, 1), i32)
        resj_spec = dummy_spec()
    if traceback:
        tb_shape = jax.ShapeDtypeStruct((rows, Bs_run, Lp), jnp.uint8)
        tb_spec = pl.BlockSpec(
            (unroll, Bblk, Lp), lambda b, d: (d, b, 0), memory_space=pltpu.VMEM
        )
    else:
        tb_shape = jax.ShapeDtypeStruct((grid_d, 1, 1), jnp.uint8)
        tb_spec = pl.BlockSpec(
            (1, 1, 1), lambda b, d: (d, 0, 0), memory_space=pltpu.VMEM
        )
    out_shape = (
        jax.ShapeDtypeStruct((R, Bs_run, Lp), f32),  # value tape
        resl_shape,  # length tape (dummy when lengths are off)
        resj_shape,  # terminal-j tape (dummy in global mode)
        resc_shape,  # terminal-code tape
        tb_shape,
    )
    out_specs = (tape_spec(), resl_spec, resj_spec, resc_spec, tb_spec)

    kc = _collapse(k)[1]
    scratch = []
    for name in _scratch_names(k, mode, lengths, traceback, unroll, opt, K):
        if name in ("ix1", "iy1", "lix1", "liy1"):
            scratch.append(pltpu.VMEM((kc, Bblk, Lp), f32))
        elif name in ("rv", "rl"):  # parity double-buffers
            scratch.append(pltpu.VMEM((2, Bblk, Lp), f32))
        elif name == "rc":
            scratch.append(pltpu.VMEM((2, Bblk, Lp), i32))
        elif name in ("lxv", "lyv", "tjr", "r1c", "r2c", "psx", "psy", "tcr",
                      "jlr"):
            scratch.append(pltpu.VMEM((Bblk, Lp), i32))
        else:  # m1, r1v, r2v, lm1, r1l, r2l, tvr, tlr
            scratch.append(pltpu.VMEM((Bblk, Lp), f32))

    resv, resl, resj, resc, tb = pl.pallas_call(
        kernel,
        grid=(nb, grid_d),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=bool(interpret),
    )(cum, cumv, lxE, lyE, hs)

    # Per-problem tie-break reduction over the harvest tapes (XLA, cheap
    # next to the strip): the winning lane IS the terminal i; §8.3 ties —
    # semiglobal keeps the larger i (last max), local the smaller (first).
    v = jnp.transpose(resv[:, :Bs, :], (1, 0, 2))  # (Bs, R, Lp)
    if mode == "semiglobal":
        idx = (Lp - 1) - jnp.argmax(v[:, :, ::-1], axis=-1)
    elif gtab:
        # Global terminals live at lane lx by definition — gather, don't
        # argmax (and the no-reset kernel leaves stale values on other
        # lanes, so the argmax form would be wrong here).
        idx = jnp.clip(lx.astype(jnp.int32)[:Bs], 0, Lp - 1)
    else:
        idx = jnp.argmax(v, axis=-1)
    take = lambda t: jnp.take_along_axis(
        jnp.transpose(t[:, :Bs, :], (1, 0, 2)), idx[:, :, None], axis=-1
    )[:, :, 0]
    out = {
        "score": take(resv),
        "length": take(resl) if lengths else jnp.zeros((Bs, R), f32),
        "ti": idx.astype(i32),
        "tj": take(resj) if mode != "global" else jnp.zeros((Bs, R), i32),
        "tcode": take(resc) if has_tcode else jnp.zeros((Bs, R), i32),
    }
    if traceback:
        out["tb"] = tb[:, :Bs, :]
    return out


def strip_opt_default() -> bool:
    """Round-5 kernel shaves (terminal tables, no-reset global harvest,
    scalar corner, parity carry buffers) default ON; PRALINE_STRIP_OPT=0
    restores the round-4 form for on-chip A/B."""
    import os

    return os.environ.get("PRALINE_STRIP_OPT", "1") != "0"


def strip_run_from_hs(hs, lx, ly, *, K, R, gap_series, mode,
                      hs_layout="dmajor", traceback=False, steps=None,
                      interpret=None, opt=None):
    """Strip DP over an ALREADY-PRODUCED strip score tensor + the batch
    output contract (score/length/ti/tj/tcode per problem; traceback adds
    moves/nmoves via strip-aware device replay).  Shared by the
    single-track core below and the multi-track composite route
    (kernels.batch.composite_dispatch_body), whose hs is a weighted
    per-track accumulation."""
    if opt is None:
        opt = strip_opt_default()
    B = lx.shape[0]
    Bs = B // R
    out = wavefront_dp_strip(
        hs, lx.reshape(Bs, R).astype(jnp.int32),
        ly.reshape(Bs, R).astype(jnp.int32),
        K=K, R=R, gap_series=tuple(gap_series), mode=mode,
        hs_layout=hs_layout, traceback=traceback, interpret=interpret,
        opt=opt,
    )
    score = out["score"].reshape(B)
    length = out["length"].reshape(B)
    if mode == "global":
        # the terminal cell is (lx, ly) by definition
        ti = lx.astype(jnp.int32)
        tj = ly.astype(jnp.int32)
    else:
        ti = out["ti"].reshape(B)
        tj = out["tj"].reshape(B)
    tcode = out["tcode"].reshape(B) if traceback else jnp.zeros((B,), jnp.int32)
    res = {
        "score": score,
        "length": length,
        "ti": ti,
        "tj": tj,
        "tcode": tcode,
    }
    if traceback:
        from .replay import replay_moves

        moves, nmoves = replay_moves(
            out["tb"], ti, tj, tcode,
            gap_series=tuple(gap_series), mode=mode,
            steps=steps,
            strip=(K, R),
        )
        res["moves"] = moves
        res["nmoves"] = nmoves
    return res


def strip_dispatch_core(cx, inv_x, cy, inv_y, s, lx, ly, *, K, R, gap_series,
                        mode, qd, mxp="highest", hs_layout="dmajor",
                        traceback=False, interpret=None, opt=None):
    """Strip producer + strip DP (+ strip-aware device replay), matching the
    output contract of kernels.batch._dispatch_core (score/length/ti/tj/
    tcode per problem; traceback adds moves/nmoves — the strip always
    replays on device, the raw-bit layout never leaves the jit).  Problems
    are grouped slot-major: problem ``p`` is slot ``p // R``, strip
    position ``p % R``."""
    from .fused_scores import fused_skewed_scores_strip

    hs = fused_skewed_scores_strip(
        cx, inv_x, cy, inv_y, s, K=K, R=R,
        out_dtype=qd if qd is not None else jnp.float32,
        scaled=qd is None, mxu_precision=mxp, layout=hs_layout,
        interpret=interpret,
    )
    return strip_run_from_hs(
        hs, lx, ly, K=K, R=R, gap_series=gap_series, mode=mode,
        hs_layout=hs_layout, traceback=traceback,
        steps=cx.shape[1] + cy.shape[1], interpret=interpret, opt=opt,
    )


def strip_plan(B: int, bx: int, by: int, gap_series, lengths: bool = True,
               force: bool = False):
    """Route decision for a scores-mode dispatch of B problems in bucket
    (bx, by): returns (K, R) when the strip is admissible and profitable,
    else None.  Profitability compares per-problem lane-step volume:
    strip (K + Lp/R) vs classic (bx + by + 1).  ``force`` (PRALINE_STRIP=1)
    drops the profit and batch-width gates — any admissible shape routes
    (testing / A-B)."""
    from .pallas_dp import max_lanes

    Lp = bx + 1
    K = strip_stride(bx, by)
    # VMEM admission: the strip carries a few more rows than the classic
    # kernel; stay under the classic ceiling with margin.
    if Lp > int(0.85 * max_lanes(tuple(gap_series), False, lengths)):
        return None
    import os

    rv = os.environ.get("PRALINE_STRIP_R")
    if rv:
        # same-relay-state A/B knob: force the packing factor (admission
        # gates above still apply; divisibility still required)
        r = int(rv)
        return (K, r) if B % r == 0 and B // r >= 2 else None
    R = None
    if force:
        for r in (64, 32, 16, 8, 4, 2):
            if B % r == 0 and B // r >= 2:
                R = r
                break
    else:
        # Largest packing whose slot count still fills the machine: 32
        # slots always do; 16 slots only when per-step work (slots * K
        # lanes) stays >= 16384 — measured on the v5e (round 5):
        # B=1024/K=1024 R=64 (16 slots) beats R=16 by 8-10%, while
        # B=512/K=512 R=32 (16 slots, 8192 lanes/step) loses to R=16.
        for r in (64, 32, 16, 8, 4):
            if B % r != 0:
                continue
            slots = B // r
            if slots >= 32 or (slots >= 16 and slots * K >= 16384):
                R = r
                break
    if R is None:
        return None
    if not force:
        classic = bx + by + 1
        strip = K + Lp / R + 128 / R  # + amortized row padding
        if strip > 0.85 * classic:
            return None
    return K, R
