"""Batch-grid contract for dispatch sizing (kernels.batch).

The grid steps by powers of four to 512 (bounds executable-shape count for
the ragged tail) and powers of two above (lets the widest dispatches land
near the HBM budget, where dispatch-latency amortization pays).
"""

from praline_tpu.kernels.batch import (
    DISPATCH_BYTES_BUDGET,
    _grid_step,
    _snap_batch,
)


def test_grid_sequence():
    seq = [32]
    while seq[-1] < 1 << 16:
        seq.append(_grid_step(seq[-1]))
    assert seq[:8] == [32, 128, 512, 1024, 2048, 4096, 8192, 16384]


def test_snap_batch_below_floor_is_exact_cap():
    assert _snap_batch(1, 100) == 1
    assert _snap_batch(31, 100) == 31
    assert _snap_batch(7, 3) == 3


def test_snap_batch_snaps_to_grid():
    assert _snap_batch(766, 4950) == 512
    # the pow2 top end is reachable (the old pow4 grid jumped 512 -> 2048)
    assert _snap_batch(1100, 4950) == 1024
    assert _snap_batch(38400, 124750) == 32768


def test_snap_batch_capped_by_pairs():
    # fewer pairs than the snapped cap: grid value <= pairs wins
    assert _snap_batch(1 << 20, 700) == 512
    assert _snap_batch(1 << 20, 1024) == 1024


def test_budget_admits_the_headline_dispatch():
    # B=1024 at L=1023 f32: hs (2047 diagonals + tile pad) x Lp x 4 bytes
    # per problem, plus tb bits in traceback mode — the bench's headline
    # shape must fit the budget or bench and production diverge.
    bx = by = 1023
    Lp_g = 1024
    hs_bytes = (bx + by + 1) * Lp_g * 4
    tb_bytes = (bx + by - 1) * Lp_g
    per_prob = hs_bytes + tb_bytes
    assert _snap_batch(DISPATCH_BYTES_BUDGET // per_prob, 1 << 20) >= 1024
