"""Device-resident progressive merge with async join dispatches (SURVEY §9 P3).

Round 1 ran the guide-tree walk as one batched DP dispatch per tree LEVEL,
pulling O(L^2) traceback bits to the host at every level and rebuilding
profiles there — wall-clock scaled with tree depth times a full host<->device
round trip (a caterpillar tree over N sequences costs N-1 sequential round
trips, the dominant term on remote runtimes).

Here profiles NEVER exist on the host during the walk.  Every join is one
top-level jitted step — exact-integer profile-profile scoring
(kernels.scores), wavefront DP with traceback (kernels.scan), on-device
pointer replay (kernels.replay), and path-composition of the merged node's
profile (the pinned semantics of oracle.profile.compose_profiles, including
the over-limit rescale in exact integer arithmetic) — whose operands and
results are device arrays held in a host-side node table.  JAX dispatch is
asynchronous, so the host enqueues all N-1 joins without ever blocking; the
single synchronization is one device_get of the stacked per-join move tapes
(1 byte per alignment column) at the end.  Gap injection into member rows is
cheap vectorized numpy after that.

A deliberately-NOT-used alternative was a ``lax.scan`` over the join
schedule (one dispatch total): an inner DP scan that stacks traceback bits
inside an outer scan executes ~1000x slower than the same DP at top level on
the TPU runtime measured here, so the async-pipelined host loop is both
simpler and faster.

All joins share one padded column capacity, so the whole stage reuses a
single executable; column overflow is detected from the returned counts and
retries at the next bucket, then falls back to the per-level batched path
(msa.pipeline).  Global merge mode only (the default); local/semiglobal
merges use the per-level path.
"""

from __future__ import annotations

import functools

import numpy as np

from ..types import Alignment, PralineConfig, ScoreMatrix, Sequence, SequenceTree
from ..oracle.merge import inject_gaps
from ..oracle.profile import COUNT_LIMIT, member_profile

# Column-capacity ladder (2^n - 1 like the batch driver's buckets: diagonal
# vectors of length C_cap + 1 fill TPU lanes exactly).
C_BUCKETS = (127, 255, 511, 1023, 2047, 4095)
MAX_ATTEMPTS = 2


@functools.lru_cache(maxsize=8)
def _merge_step_jit(C_cap: int, A: int, gap_series: tuple[int, ...], inv_size: int):
    import jax
    import jax.numpy as jnp

    from ..kernels.replay import replay_moves
    from ..kernels.scan import wavefront_dp
    from ..kernels.scores import skewed_pair_scores

    steps = 2 * C_cap

    @jax.jit
    def step(cl, gl, Cl, nml, cr, gr, Cr, nmr, s, inv_table):
        # Column inverses via exact table lookup: totals are exact f32
        # integers and the table holds host-computed correctly-rounded f32
        # reciprocals (TPU division is not IEEE-exact).
        totl = jnp.sum(cl, axis=1).astype(jnp.int32)
        totr = jnp.sum(cr, axis=1).astype(jnp.int32)
        invl = inv_table[jnp.clip(totl, 0, inv_size - 1)]
        invr = inv_table[jnp.clip(totr, 0, inv_size - 1)]

        hs = skewed_pair_scores(cl[None], invl[None], cr[None], invr[None], s)
        out = wavefront_dp(
            hs, Cl[None], Cr[None], gap_series=gap_series, mode="global",
            traceback=True,
        )
        moves, nmv = replay_moves(
            out["tb"], out["ti"], out["tj"], out["tcode"],
            gap_series=gap_series, mode="global", steps=steps,
        )
        m = moves[0].astype(jnp.int32)  # (steps,) terminal -> origin
        nn = nmv[0]

        # Compose the merged profile from the move tape (the pinned
        # semantics of oracle.profile.compose_profiles).  Emission position
        # p maps to output column c = nn - 1 - p; the source column in x is
        # ti - (#x-consuming moves among emission positions <= p).
        p = jnp.arange(steps, dtype=jnp.int32)
        valid = m > 0
        takes_x = (m == 1) | (m == 2)
        takes_y = (m == 1) | (m == 3)
        rcx = jnp.cumsum(takes_x.astype(jnp.int32))
        rcy = jnp.cumsum(takes_y.astype(jnp.int32))
        xi = jnp.clip(out["ti"][0] - rcx, 0, C_cap - 1)
        yi = jnp.clip(out["tj"][0] - rcy, 0, C_cap - 1)
        c = jnp.clip(nn - 1 - p, 0, C_cap - 1)

        wx = (takes_x & valid).astype(jnp.float32)[:, None]
        wy = (takes_y & valid).astype(jnp.float32)[:, None]
        contrib = jnp.take(cl, xi, axis=0) * wx + jnp.take(cr, yi, axis=0) * wy
        gap_contrib = jnp.where(
            valid,
            jnp.where(takes_x, jnp.take(gl, xi), nml.astype(jnp.float32))
            + jnp.where(takes_y, jnp.take(gr, yi), nmr.astype(jnp.float32)),
            0.0,
        )
        new_counts = jnp.zeros((C_cap, A), jnp.float32).at[c].add(contrib)
        new_gaps = jnp.zeros((C_cap,), jnp.float32).at[c].add(gap_contrib)

        # Over-limit rescale in exact integer arithmetic:
        # (512*c + n) // (2*n) == floor(c*256/n + 0.5) for these magnitudes
        # (oracle.profile.rescale_counts states the same function in float64;
        # tests/oracle/test_profile_rescale.py pins their equality).
        totals = jnp.sum(new_counts, axis=1) + new_gaps
        over = totals > COUNT_LIMIT
        n_i = jnp.maximum(totals.astype(jnp.int32), 1)
        c_i = new_counts.astype(jnp.int32)
        q = (512 * c_i + n_i[:, None]) // (2 * n_i[:, None])
        qg = (512 * new_gaps.astype(jnp.int32) + n_i) // (2 * n_i)
        new_counts = jnp.where(over[:, None], q.astype(jnp.float32), new_counts)
        new_gaps = jnp.where(over, qg.astype(jnp.float32), new_gaps)

        return new_counts, new_gaps, nn, nml + nmr, moves[0], out["score"][0]

    return step


@functools.lru_cache(maxsize=8)
def _stack_jit(count: int):
    import jax

    return jax.jit(lambda *xs: jax.numpy.stack(xs))


def try_device_merge(
    sequences: list[Sequence],
    tree: SequenceTree,
    matrix: ScoreMatrix,
    config: PralineConfig,
) -> Alignment | None:
    """Run the whole merge stage device-resident; None -> caller falls back.

    Fallback conditions: non-global merge mode, exactness bound exceeded for
    the raw leaf profiles, or merged column counts overflowing every bucket
    attempt.
    """
    import jax
    import jax.numpy as jnp

    if config.merge_mode != "global":
        return None
    n = len(sequences)
    if n < 2 or any(s.length == 0 for s in sequences):
        return None
    leaf_profs = [member_profile(s) for s in sequences]
    A = matrix.alphabet.size
    max_total = max(
        float(p.counts.sum(axis=1).max(initial=1.0)) for p in leaf_profs
    )
    # Exactness bound for count-space matmuls (oracle.score): composed
    # profiles rescale above COUNT_LIMIT, leaves do not — bound on both.
    bound = max(max_total, COUNT_LIMIT + A)
    if bound * bound * float(np.abs(matrix.scores).max()) >= 2**24:
        return None

    max_len = max(p.length for p in leaf_profs)
    start = next((b for b in C_BUCKETS if b >= min(2 * max_len, C_BUCKETS[-1])), None)
    if start is None or max_len > C_BUCKETS[-1]:
        return None
    attempts = [b for b in C_BUCKETS if b >= max(start, max_len)][:MAX_ATTEMPTS]

    inv_size = int(max(1024, max_total + 2))
    inv_table = (
        np.float32(1.0)
        / np.maximum(np.arange(inv_size, dtype=np.float32), np.float32(1.0))
    ).astype(np.float32)
    s_dev = jnp.asarray(matrix.as_f32())
    inv_dev = jnp.asarray(inv_table)

    for C_cap in attempts:
        step = _merge_step_jit(C_cap, A, tuple(config.gap_series), inv_size)

        # Device-resident node table: (counts, gaps, len, nmem) per node.
        nodes_dev: dict[int, tuple] = {}
        one = jnp.asarray(np.int32(1))
        for i, p in enumerate(leaf_profs):
            counts = np.zeros((C_cap, A), dtype=np.float32)
            counts[: p.length] = p.counts
            gaps = np.zeros((C_cap,), dtype=np.float32)
            gaps[: p.length] = p.gaps
            nodes_dev[i] = (
                jnp.asarray(counts),
                jnp.asarray(gaps),
                jnp.asarray(np.int32(p.length)),
                one,
            )

        tapes = []
        lens_out = []
        for k, (l, r) in enumerate(tree.joins):
            a = nodes_dev.pop(l)
            b = nodes_dev.pop(r)
            nc, ng, nn, nm, moves, _score = step(*a, *b, s_dev, inv_dev)
            nodes_dev[n + k] = (nc, ng, nn, nm)
            tapes.append(moves)
            lens_out.append(nn)

        stacked = _stack_jit(len(tapes))(*tapes)
        ncols_dev = _stack_jit(len(lens_out))(*lens_out)
        moves_all, ncols = jax.device_get((stacked, ncols_dev))
        ncols = np.asarray(ncols)
        if int(ncols.max(initial=0)) <= C_cap:
            return _assemble(sequences, tree, np.asarray(moves_all), ncols)
    return None


def _assemble(
    sequences: list[Sequence],
    tree: SequenceTree,
    moves_all: np.ndarray,
    ncols: np.ndarray,
) -> Alignment:
    """Inject gaps along the returned per-join paths (host, vectorized)."""
    from ..kernels.replay import moves_to_result
    from ..util.metrics import METRICS

    nodes: dict[int, Alignment] = {
        i: Alignment.single(seq) for i, seq in enumerate(sequences)
    }
    n = tree.num_leaves
    cells = 0.0
    for k, (l, r) in enumerate(tree.joins):
        left, right = nodes.pop(l), nodes.pop(r)
        res = moves_to_result(
            moves_all[k], int(ncols[k]), 0.0, 0, 0,
            left.num_columns, right.num_columns, "global",
        )
        cells += float(left.num_columns) * right.num_columns
        rows = inject_gaps(left.rows, right.rows, res.cols_x, res.cols_y)
        nodes[n + k] = Alignment(left.members + right.members, rows)
    METRICS.add_pairs("merge", len(tree.joins), cells)

    root = nodes[tree.root]
    index_of = {id(m): k for k, m in enumerate(root.members)}
    perm = []
    used: set[int] = set()
    for seq in sequences:
        k = index_of.get(id(seq))
        if k is None:
            k = next(
                i
                for i, m in enumerate(root.members)
                if i not in used and m.name == seq.name
            )
        used.add(k)
        perm.append(k)
    return Alignment(tuple(root.members[k] for k in perm), root.rows[perm])
