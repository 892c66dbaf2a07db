"""Ring-parallel single alignment (SURVEY.md §3.2 "ring attention analog").

One alignment too big for a single device: the DP lane (x) axis is sharded
over the mesh's ``pairs`` axis — device d owns a contiguous block of
diagonal-wavefront lanes — and each diagonal step passes its boundary lane
state to the right neighbour over a ``ppermute`` (ICI on real hardware)
while terminal reductions finish with pmax/pmin.  Scores are produced
per-device with the streamed windowed producer (kernels.scan), so no
device ever materializes more than its own lane block: per-device memory
is O(B * Lx/n * A) state + O(B * (Ly + Lx) * A) replicated y-side reads.

Results are bit-equal to the single-device scan/chunked path (the DP body
is literally the same code — kernels.scan._wavefront with ring collectives
injected; parity-tested in tests/dist/test_ring.py).

This is the capacity escape hatch for one enormous problem; per-diagonal
ppermute latency makes it slower than the batched per-device paths, so the
batch driver only documents it (bench/dryrun exercise it explicitly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .allpairs import shard_map, _register_mesh, _MESHES
from .mesh import PAIR_AXIS
from ..kernels.scan import _wavefront
from ..kernels.scores import HIGHEST


@functools.lru_cache(maxsize=16)
def _build_ring(mesh_key, Lx, Ly, A, gap_series, mode, traceback):
    mesh = _MESHES[mesh_key]
    n = 1
    for dim in mesh.devices.shape:
        n *= dim
    Lp = Lx + 1
    Lpn = -(-Lp // n)  # local lanes per device
    Lp_pad = Lpn * n
    D = Lx + Ly + 1

    def body(t_pad, invx_pad, cyr_pad, invy_pad, lx, ly):
        base = jax.lax.axis_index(PAIR_AXIS).astype(jnp.int32) * Lpn

        def hrow_fn(d):
            start = (Lx + Ly - d) + base
            w_y = jax.lax.dynamic_slice_in_dim(cyr_pad, start, Lpn, axis=1)
            w_iv = jax.lax.dynamic_slice_in_dim(invy_pad, start, Lpn, axis=1)
            h_int = jnp.einsum("bia,bia->bi", t_pad, w_y, precision=HIGHEST)
            # Rounding pinned by _wavefront's nested-scan materialization.
            return (h_int * invx_pad) * w_iv

        B = t_pad.shape[0]
        return _wavefront(
            None, hrow_fn, D, B, Lpn, lx, ly, gap_series, mode, traceback,
            ring_axis=PAIR_AXIS, ring_n=n, lane_base=base,
        )

    rep = P()
    in_specs = (
        P(None, PAIR_AXIS, None),  # t_pad (B, Lp_pad, A): lanes sharded
        P(None, PAIR_AXIS),  # invx_pad
        rep,  # cyr_pad (replicated y side)
        rep,  # invy_pad
        rep,  # lx
        rep,  # ly
    )
    out_specs = {k: rep for k in ("score", "length", "ti", "tj", "tcode")}
    if traceback:
        out_specs["tb"] = P(None, None, PAIR_AXIS)
    fn = shard_map(body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    return jax.jit(fn), Lp_pad


def ring_wavefront_dp(mesh, cx, inv_x, cy, inv_y, s, lx, ly,
                      gap_series=(11, 1), mode="global", traceback=False):
    """Run B (usually 1) oversized pairwise DPs with lanes sharded over
    ``mesh``.  Same terminal contract as kernels.scan.wavefront_dp; ``tb``
    comes back lane-sharded and host-concatenated (global layout)."""
    cx = jnp.asarray(cx)
    inv_x = jnp.asarray(inv_x)
    cy = jnp.asarray(cy)
    inv_y = jnp.asarray(inv_y)
    s = jnp.asarray(s)
    B, Lx, A = cx.shape
    Ly = cy.shape[1]
    key = _register_mesh(mesh)
    fn, Lp_pad = _build_ring(
        key, Lx, Ly, A, tuple(gap_series), mode, traceback
    )

    # Lane layout: global lane i holds x position i-1 (lane 0 = border).
    t = jnp.einsum("bxa,ac->bxc", cx, s, precision=HIGHEST)
    t_pad = jnp.pad(t, ((0, 0), (1, Lp_pad - Lx - 1), (0, 0)))
    invx_pad = jnp.pad(
        inv_x, ((0, 0), (1, Lp_pad - Lx - 1)), constant_values=1.0
    )
    # Reversed-y windows: device base b, diagonal d reads indices
    # [Lx + Ly - d + b, ... + Lpn); pad so every slice is in bounds.
    cyr_pad = jnp.pad(cy[:, ::-1, :], ((0, 0), (Lx, Lp_pad), (0, 0)))
    invy_pad = jnp.pad(
        inv_y[:, ::-1], ((0, 0), (Lx, Lp_pad)), constant_values=1.0
    )
    return fn(t_pad, invx_pad, cyr_pad, invy_pad,
              jnp.asarray(lx), jnp.asarray(ly))
