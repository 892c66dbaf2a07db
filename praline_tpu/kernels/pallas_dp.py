"""Pallas TPU wavefront DP kernel (SURVEY.md §9 P2, [B:5]).

Same contract and bit-exact semantics as kernels.scan.wavefront_dp (the
parity tests enforce this), but implemented as a Pallas kernel:

* grid = (batch_blocks, D - 2): the second (innermost, sequential) axis walks
  anti-diagonals; Mosaic auto-pipelines the skewed score row HBM->VMEM with
  double buffering, and traceback bits stream back per step;
* DP state vectors (M / Ix / Iy values + path lengths + two best-state
  reduce buffers) are VMEM scratch persisting across the sequential grid;
* batch blocks bound VMEM: each block of ``block_b`` problems re-initializes
  the scratch at its first diagonal step.

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


def _make_kernel(D, Bblk, Lp, k, gap_series, mode, traceback):
    g = [np.float32(x) for x in gap_series]
    local = mode == "local"
    semi = mode == "semiglobal"
    border_m = np.float32(0.0 if local else NEG)

    def kernel(
        cum_ref,  # SMEM (1, D+1) gap-cost prefix
        hs_ref,  # VMEM (1, Bblk, Lp) skewed scores for diag d
        lx_ref,  # VMEM (Bblk, 1) int32
        ly_ref,  # VMEM (Bblk, 1) int32
        score_ref,  # out VMEM (Bblk, 1) f32
        len_ref,  # out (Bblk, 1) f32
        ti_ref,  # out (Bblk, 1) int32
        tj_ref,  # out (Bblk, 1) int32
        tcode_ref,  # out (Bblk, 1) int32
        tb_ref,  # out VMEM (1, Bblk, Lp) uint8 (dummy when not traceback)
        # scratch:
        m1, lm1, r1v, r1l, r1c, r2v, r2l, r2c, tval, tlen, tis, tjs, tcs,
        ix1, iy1, lix1, liy1,  # (k, Bblk, Lp) stacks
    ):
        d = pl.program_id(1) + 2
        lane = jax.lax.broadcasted_iota(jnp.int32, (Bblk, Lp), 1)
        lx = lx_ref[:, :]  # (Bblk, 1)
        ly = ly_ref[:, :]

        @pl.when(pl.program_id(1) == 0)
        def _init():
            negs = jnp.full((Bblk, Lp), NEG, jnp.float32)
            zeros = jnp.zeros((Bblk, Lp), jnp.float32)
            m1[:, :] = jnp.where((lane == 0) | (lane == 1), border_m, negs)
            lm1[:, :] = zeros
            for l in range(k):
                ix1[l] = negs
                iy1[l] = negs
                lix1[l] = zeros
                liy1[l] = zeros
            if not local:
                bval = np.float32(0.0) if semi else -cum_ref[0, 1]
                ix1[0] = jnp.where(lane == 1, bval, negs)
                iy1[0] = jnp.where(lane == 0, bval, negs)
                lix1[0] = jnp.where(lane == 1, 1.0, zeros)
                liy1[0] = jnp.where(lane == 0, 1.0, zeros)
            r2v[:, :] = jnp.where(lane == 0, 0.0, negs)
            r2l[:, :] = zeros
            r2c[:, :] = jnp.zeros((Bblk, Lp), jnp.int32)
            # priority reduce of diag 1
            v, ln, c = m1[:, :], lm1[:, :], jnp.zeros((Bblk, Lp), jnp.int32)
            for l in range(k):
                b = ix1[l] > v
                v = jnp.where(b, ix1[l], v)
                ln = jnp.where(b, lix1[l], ln)
                c = jnp.where(b, 1 + l, c)
            for l in range(k):
                b = iy1[l] > v
                v = jnp.where(b, iy1[l], v)
                ln = jnp.where(b, liy1[l], ln)
                c = jnp.where(b, 1 + k + l, c)
            r1v[:, :] = v
            r1l[:, :] = ln
            r1c[:, :] = c
            # terminal trackers
            tval[:, :] = jnp.full((Bblk, 1), NEG, jnp.float32)
            tlen[:, :] = jnp.zeros((Bblk, 1), jnp.float32)
            tis[:, :] = jnp.zeros((Bblk, 1), jnp.int32)
            tjs[:, :] = jnp.zeros((Bblk, 1), jnp.int32)
            tcs[:, :] = jnp.zeros((Bblk, 1), jnp.int32)
            if semi:
                pick_y = ly == 1
                tval[:, :] = jnp.where(pick_y, 0.0, tval[:, :])
                tlen[:, :] = jnp.where(pick_y, 1.0, tlen[:, :])
                tis[:, :] = jnp.where(pick_y, 0, tis[:, :])
                tjs[:, :] = jnp.where(pick_y, 1, tjs[:, :])
                tcs[:, :] = jnp.where(pick_y, 1 + k, tcs[:, :])
                pick_x = lx == 1
                tval[:, :] = jnp.where(pick_x, 0.0, tval[:, :])
                tlen[:, :] = jnp.where(pick_x, 1.0, tlen[:, :])
                tis[:, :] = jnp.where(pick_x, 1, tis[:, :])
                tjs[:, :] = jnp.where(pick_x, 0, tjs[:, :])
                tcs[:, :] = jnp.where(pick_x, 1, tcs[:, :])

        def shift_v(v):
            return jnp.where(lane == 0, NEG, pltpu.roll(v, 1, 1))

        def shift_z(v):
            zero = jnp.zeros((), v.dtype)
            return jnp.where(lane == 0, zero, pltpu.roll(v, 1, 1))

        hrow = hs_ref[0, :, :]
        m1v, lm1v = m1[:, :], lm1[:, :]
        m1s, lm1s = shift_v(m1v), shift_z(lm1v)
        b2vs, b2ls, b2cs = shift_v(r2v[:, :]), shift_z(r2l[:, :]), shift_z(r2c[:, :])

        nix = [None] * k
        niy = [None] * k
        nlix = [None] * k
        nliy = [None] * k
        if k == 1:
            ix1s, lix1s = shift_v(ix1[0]), shift_z(lix1[0])
            stay_x = ix1s > m1s
            nix[0] = jnp.where(stay_x, ix1s, m1s) - g[0]
            nlix[0] = jnp.where(stay_x, lix1s, lm1s) + 1.0
            stay_y = iy1[0] > m1v
            niy[0] = jnp.where(stay_y, iy1[0], m1v) - g[0]
            nliy[0] = jnp.where(stay_y, liy1[0], lm1v) + 1.0
        else:
            ix1sl = [shift_v(ix1[l]) for l in range(k)]
            lix1sl = [shift_z(lix1[l]) for l in range(k)]
            nix[0] = m1s - g[0]
            nlix[0] = lm1s + 1.0
            niy[0] = m1v - g[0]
            nliy[0] = lm1v + 1.0
            for l in range(1, k - 1):
                nix[l] = ix1sl[l - 1] - g[l]
                nlix[l] = lix1sl[l - 1] + 1.0
                niy[l] = iy1[l - 1] - g[l]
                nliy[l] = liy1[l - 1] + 1.0
            stay_x = ix1sl[k - 1] > ix1sl[k - 2]
            nix[k - 1] = jnp.where(stay_x, ix1sl[k - 1], ix1sl[k - 2]) - g[k - 1]
            nlix[k - 1] = jnp.where(stay_x, lix1sl[k - 1], lix1sl[k - 2]) + 1.0
            stay_y = iy1[k - 1] > iy1[k - 2]
            niy[k - 1] = jnp.where(stay_y, iy1[k - 1], iy1[k - 2]) - g[k - 1]
            nliy[k - 1] = jnp.where(stay_y, liy1[k - 1], liy1[k - 2]) + 1.0

        nm = hrow + b2vs
        nlm = b2ls + 1.0
        mcode = b2cs
        if local:
            clamp = nm < 0.0
            nm = jnp.where(clamp, 0.0, nm)
            mcode = jnp.where(clamp, PTR_NONE, mcode)
            nlm = jnp.where(nm <= 0.0, 0.0, nlm)

        at0 = lane == 0
        atd = lane == d
        nm = jnp.where(at0 | atd, border_m, nm)
        nlm = jnp.where(at0 | atd, 0.0, nlm)
        lvl_d = jnp.minimum(d, k)
        d_f = d.astype(jnp.float32)
        for l in range(k):
            if local:
                nix[l] = jnp.where(at0 | atd, NEG, nix[l])
                niy[l] = jnp.where(at0 | atd, NEG, niy[l])
                nlix[l] = jnp.where(at0 | atd, 0.0, nlix[l])
                nliy[l] = jnp.where(at0 | atd, 0.0, nliy[l])
            else:
                bx = np.float32(0.0) if semi else -cum_ref[0, d]
                on_lvl = lvl_d == l + 1
                nix[l] = jnp.where(atd, jnp.where(on_lvl, bx, NEG), jnp.where(at0, NEG, nix[l]))
                niy[l] = jnp.where(at0, jnp.where(on_lvl, bx, NEG), jnp.where(atd, NEG, niy[l]))
                nlix[l] = jnp.where(atd, d_f, jnp.where(at0, 0.0, nlix[l]))
                nliy[l] = jnp.where(at0, d_f, jnp.where(atd, 0.0, nliy[l]))

        # priority reduce of diag d
        bv, bl, bc = nm, nlm, mcode * 0
        bc = jnp.zeros((Bblk, Lp), jnp.int32)
        v, ln, c = nm, nlm, bc
        for l in range(k):
            b = nix[l] > v
            v = jnp.where(b, nix[l], v)
            ln = jnp.where(b, nlix[l], ln)
            c = jnp.where(b, 1 + l, c)
        for l in range(k):
            b = niy[l] > v
            v = jnp.where(b, niy[l], v)
            ln = jnp.where(b, nliy[l], ln)
            c = jnp.where(b, 1 + k + l, c)
        bv, bl, bc = v, ln, c

        # ---- terminal tracking ----
        if mode == "global":
            pick = d == (lx + ly)  # (Bblk, 1)
            mask = lane == lx
            tval[:, :] = jnp.where(pick, _pick(bv, mask, NEG), tval[:, :])
            tlen[:, :] = jnp.where(pick, _pick(bl, mask, NEG), tlen[:, :])
            tcs[:, :] = jnp.where(pick, _pick(bc, mask, -1), tcs[:, :])
            tis[:, :] = jnp.where(pick, lx, tis[:, :])
            tjs[:, :] = jnp.where(pick, ly, tjs[:, :])
        elif semi:
            for cand_i, cand_j in ((d - ly, ly), (lx, d - lx)):
                ok = (cand_i >= 0) & (cand_i <= lx) & (cand_j >= 0) & (cand_j <= ly)
                mask = lane == cand_i
                cv = _pick(bv, mask, NEG)
                cl = _pick(bl, mask, NEG)
                cc = _pick(bc, mask, -1)
                better = cv > tval[:, :]
                tie = (cv == tval[:, :]) & (
                    (cand_i > tis[:, :]) | ((cand_i == tis[:, :]) & (cand_j > tjs[:, :]))
                )
                repl = ok & (better | tie)
                tval[:, :] = jnp.where(repl, cv, tval[:, :])
                tlen[:, :] = jnp.where(repl, cl, tlen[:, :])
                tcs[:, :] = jnp.where(repl, cc, tcs[:, :])
                tis[:, :] = jnp.where(repl, cand_i, tis[:, :])
                tjs[:, :] = jnp.where(repl, cand_j, tjs[:, :])
        else:  # local
            valid = (lane >= 1) & (lane <= lx) & (d - lane >= 1) & (d - lane <= ly)
            mv = jnp.where(valid, nm, NEG)
            step_best = jnp.max(mv, axis=1, keepdims=True)
            # first-max lane (smallest i): min lane index among maxima
            ismax = mv == step_best
            big = jnp.int32(Lp)
            step_arg = jnp.min(jnp.where(ismax, lane, big), axis=1, keepdims=True)
            step_len = _pick(nlm, lane == step_arg, NEG)
            cj = d - step_arg
            better = step_best > tval[:, :]
            tie = (step_best == tval[:, :]) & (
                (step_arg < tis[:, :]) | ((step_arg == tis[:, :]) & (cj < tjs[:, :]))
            )
            repl = better | tie
            tval[:, :] = jnp.where(repl, step_best, tval[:, :])
            tlen[:, :] = jnp.where(repl, step_len, tlen[:, :])
            tis[:, :] = jnp.where(repl, step_arg, tis[:, :])
            tjs[:, :] = jnp.where(repl, cj, tjs[:, :])

        # ---- write carries ----
        m1[:, :] = nm
        lm1[:, :] = nlm
        for l in range(k):
            ix1[l] = nix[l]
            iy1[l] = niy[l]
            lix1[l] = nlix[l]
            liy1[l] = nliy[l]
        r2v[:, :] = r1v[:, :]
        r2l[:, :] = r1l[:, :]
        r2c[:, :] = r1c[:, :]
        r1v[:, :] = bv
        r1l[:, :] = bl
        r1c[:, :] = bc

        if traceback:
            # int32 arithmetic (Mosaic cannot legalize sub-word shifts),
            # narrowed to uint8 at the store.
            bits = mcode + stay_x.astype(jnp.int32) * 32 + stay_y.astype(jnp.int32) * 64
            tb_ref[0, :, :] = bits.astype(jnp.uint8)
        # not traceback: tb_ref is a (D-2, 1, 1) dummy, left unwritten.

        @pl.when(pl.program_id(1) == D - 3)
        def _finish():
            score_ref[:, :] = tval[:, :]
            len_ref[:, :] = tlen[:, :]
            ti_ref[:, :] = tis[:, :]
            tj_ref[:, :] = tjs[:, :]
            tcode_ref[:, :] = tcs[:, :]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("gap_series", "mode", "traceback", "block_b", "interpret"),
)
def wavefront_dp_pallas(
    hs: jax.Array,  # f32[D, B, Lp]
    lx: jax.Array,  # int32[B]
    ly: jax.Array,  # int32[B]
    gap_series: tuple[int, ...] = (11, 1),
    mode: str = "global",
    traceback: bool = False,
    block_b: int = 128,
    interpret: bool | None = None,
):
    """Pallas TPU implementation of kernels.scan.wavefront_dp (same contract)."""
    if interpret is None:  # trace-time: interpret off-TPU (CPU tests)
        interpret = jax.default_backend() != "tpu"
    D, B, Lp = hs.shape
    k = len(gap_series)
    # VMEM budget: (8 + 4k) full scratch rows + double-buffered hs in-blocks
    # and tb out-blocks per problem row; keep the total under ~12 MB.
    bytes_per_row = Lp * (4 * (10 + 4 * k) + 2)
    vmem_rows = max(8, int(12e6 // max(bytes_per_row, 1)))
    block_cap = 8
    while block_cap * 2 <= vmem_rows:
        block_cap *= 2
    Bblk = min(block_b, B, block_cap)
    pad = (-B) % Bblk
    if pad:  # pad with trivial length-1 problems; sliced off below
        hs = jnp.pad(hs, ((0, 0), (0, pad), (0, 0)))
        lx = jnp.pad(lx, (0, pad), constant_values=1)
        ly = jnp.pad(ly, (0, pad), constant_values=1)
    B_run = B + pad
    nb = B_run // Bblk

    cum = jnp.asarray(_gap_prefix(gap_series, D), dtype=jnp.float32)[None, :]
    lx2 = lx.astype(jnp.int32)[:, None]
    ly2 = ly.astype(jnp.int32)[:, None]

    kernel = _make_kernel(D, Bblk, Lp, k, tuple(gap_series), mode, traceback)

    f32 = jnp.float32
    i32 = jnp.int32
    if traceback:
        tb_shape = jax.ShapeDtypeStruct((D - 2, B_run, Lp), jnp.uint8)
        tb_spec = pl.BlockSpec((1, Bblk, Lp), lambda b, d: (d, b, 0), memory_space=pltpu.VMEM)
    else:
        tb_shape = jax.ShapeDtypeStruct((D - 2, 1, 1), jnp.uint8)
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
    grid = (nb, D - 2)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # cum (full)
        pl.BlockSpec((1, Bblk, Lp), lambda b, d: (d + 2, b, 0), memory_space=pltpu.VMEM),
        bspec(),  # lx
        bspec(),  # ly
    ]
    out_specs = (
        bspec(),
        bspec(),
        bspec(),
        bspec(),
        bspec(),
        tb_spec,
    )
    scratch = [pltpu.VMEM((Bblk, Lp), f32) for _ in range(2)]  # m1, lm1
    scratch += [pltpu.VMEM((Bblk, Lp), f32) for _ in range(2)]  # r1v, r1l
    scratch += [pltpu.VMEM((Bblk, Lp), i32)]  # r1c
    scratch += [pltpu.VMEM((Bblk, Lp), f32) for _ in range(2)]  # r2v, r2l
    scratch += [pltpu.VMEM((Bblk, Lp), i32)]  # r2c
    scratch += [pltpu.VMEM((Bblk, 1), f32) for _ in range(2)]  # tval, tlen
    scratch += [pltpu.VMEM((Bblk, 1), i32) for _ in range(3)]  # ti, tj, tcode
    scratch += [pltpu.VMEM((k, Bblk, Lp), f32) for _ in range(4)]  # ix1, iy1, lix1, liy1

    score, length, ti, tj, tcode, tb = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=bool(interpret),
    )(cum, hs, lx2, ly2)

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
