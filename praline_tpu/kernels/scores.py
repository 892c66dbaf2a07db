"""Device-side pair score matrices in diagonal-major (skewed) layout.

The reference scores each DP cell with a Python dict lookup (SURVEY.md §3 C10
[B:5 "scoring (dict lookup -> ...)"]); here the whole L1 x L2 column-pair
score matrix is produced by two MXU matmuls in integer count space —

    H_int = (Cx @ S) @ Cy^T          (exact: see oracle/score.py)
    H     = (H_int * inv_x) * inv_y   (pinned f32 multiply order)

— and then skewed so anti-diagonal d of the DP grid is the contiguous row
``hs[d]``, which the wavefront scan streams sequentially.  ``Precision.HIGHEST``
keeps the bf16 matmul passes exact for >8-bit integer operands.

Skew layout: ``hs[d, b, i] = H[b, i-1, d-i-1]`` for interior DP cells
(1 <= i, 1 <= d-i), zero elsewhere; the diagonal-major (D, B, Lp) axis order
is what the scan consumes directly, so no transpose is needed later.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


@functools.partial(jax.jit, static_argnames=("out_diags",))
def skewed_pair_scores(
    cx: jax.Array,  # f32[B, Lx, A] integer-valued counts
    inv_x: jax.Array,  # f32[B, Lx]
    cy: jax.Array,  # f32[B, Ly, A]
    inv_y: jax.Array,  # f32[B, Ly]
    s: jax.Array,  # f32[A, A] integer-valued substitution matrix
    out_diags: int | None = None,
) -> jax.Array:
    """Return ``f32[D, B, Lx+1]`` skewed scores, D = Lx + Ly + 1."""
    B, Lx, A = cx.shape
    Ly = cy.shape[1]
    D = out_diags if out_diags is not None else Lx + Ly + 1

    t = jnp.einsum("bxa,ac->bxc", cx, s, precision=HIGHEST)
    h_int = jnp.einsum("bxc,byc->bxy", t, cy, precision=HIGHEST)
    h = (h_int * inv_x[:, :, None]) * inv_y[:, None, :]

    # Skew via one gather: hs[d, b, i] = h[b, i-1, d-i-1].
    d_idx = jnp.arange(D, dtype=jnp.int32)[:, None]  # (D, 1)
    i_idx = jnp.arange(Lx + 1, dtype=jnp.int32)[None, :]  # (1, Lp)
    j_idx = d_idx - i_idx - 1  # (D, Lp)
    valid = (i_idx >= 1) & (j_idx >= 0) & (j_idx <= Ly - 1)
    i_g = jnp.clip(i_idx - 1, 0, Lx - 1)
    j_g = jnp.clip(j_idx, 0, Ly - 1)
    hs = h[:, i_g, j_g]  # (B, D, Lp)
    hs = jnp.where(valid[None], hs, 0.0)
    return jnp.transpose(hs, (1, 0, 2))


@functools.partial(jax.jit, static_argnames=("qdtype",))
def skewed_pair_scores_quantized(
    cx: jax.Array,  # f32[B, Lx, A] integer-valued counts
    inv_x: jax.Array,  # f32[B, Lx]
    cy: jax.Array,  # f32[B, Ly, A]
    inv_y: jax.Array,  # f32[B, Ly]
    s: jax.Array,  # f32[A, A]
    qdtype=jnp.int16,
):
    """Compressed variant: the integer dot ``H_int`` is exact and bounded, so
    when ``max_nx * max_ny * max|S|`` fits the target integer dtype the
    skewed scores ship as int16/int8 (2-4x less HBM traffic than f32) and
    the wavefront kernel applies the pinned ``(H_int * inv_x) * inv_y``
    scaling itself from per-lane ``inv_x`` and a sliding ``inv_y`` window.

    Returns ``(hs_q[D, B, Lp], invx_row[B, Lp], invy0[B, 1],
    ys_invy[D-2, B, 1])``; bit-exact scores relative to the f32 path.
    """
    B, Lx, A = cx.shape
    Ly = cy.shape[1]
    D = Lx + Ly + 1

    t = jnp.einsum("bxa,ac->bxc", cx, s, precision=HIGHEST)
    h_int = jnp.einsum("bxc,byc->bxy", t, cy, precision=HIGHEST)
    h_q = h_int.astype(qdtype)

    d_idx = jnp.arange(D, dtype=jnp.int32)[:, None]
    i_idx = jnp.arange(Lx + 1, dtype=jnp.int32)[None, :]
    j_idx = d_idx - i_idx - 1
    valid = (i_idx >= 1) & (j_idx >= 0) & (j_idx <= Ly - 1)
    i_g = jnp.clip(i_idx - 1, 0, Lx - 1)
    j_g = jnp.clip(j_idx, 0, Ly - 1)
    hs = h_q[:, i_g, j_g]
    hs = jnp.where(valid[None], hs, jnp.zeros((), qdtype))
    hs = jnp.transpose(hs, (1, 0, 2))

    invx_row = jnp.concatenate(
        [jnp.ones((B, 1), jnp.float32), inv_x], axis=1
    )  # lane i <-> x position i-1
    invy0 = inv_y[:, :1]
    # step d = d' + 2 injects inv_y[d - 1] at lane 0
    dj = jnp.arange(1, D - 1, dtype=jnp.int32)
    inj = jnp.where(
        (dj[None, :] < Ly), inv_y[:, jnp.clip(dj, 0, Ly - 1)], 1.0
    )
    ys_invy = jnp.transpose(inj, (1, 0))[:, :, None]
    return hs, invx_row, invy0, ys_invy


def quantized_dtype_for(max_abs_int: float):
    """Pick the narrowest dtype holding every |H_int| value, or None."""
    if max_abs_int < 127:
        return jnp.int8
    if max_abs_int < 32767:
        return jnp.int16
    return None


def profile_device_arrays(counts, gaps=None):
    """Host helper: counts -> (counts_f32, inv_f32) with the pinned single
    f32 division (kernels only ever multiply)."""
    import numpy as np

    c = np.asarray(counts, dtype=np.float32)
    totals = np.maximum(c.sum(axis=-1, dtype=np.float32), np.float32(1.0))
    inv = (np.float32(1.0) / totals).astype(np.float32)
    return c, inv
