"""Device-resident merge coverage past round 2 (VERDICT r2 item 5):
semiglobal mode takes the node-table walk, and the streamed-producer rung
(capacity past 4095 columns) produces identical alignments."""

import numpy as np
import pytest

import praline_tpu as pt
from praline_tpu.msa import device_merge as dm
from praline_tpu.msa.pipeline import batched_all_pairs, batched_preprofiles
from praline_tpu.oracle import oracle_msa
from praline_tpu.oracle.tree import build_guide_tree, similarity_from_scores
from praline_tpu.types import PralineConfig, Sequence

B62 = pt.builtin_score_matrix("blosum62")


def _family(n=10, L=40, seed=2):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 20, size=L)
    out = []
    for i in range(n):
        toks = base.copy()
        for _ in range(8):
            toks[rng.integers(0, L)] = rng.integers(0, 20)
        out.append(Sequence(f"s{i}", toks.astype(np.int32), pt.ALPHABET_AA))
    return out


def _tree(seqs, cfg):
    pp = batched_preprofiles(seqs, B62, cfg)
    scores, lengths = batched_all_pairs(pp, B62, cfg)
    sim = similarity_from_scores(scores, lengths, cfg.score_normalization)
    return pp, build_guide_tree(sim, cfg.linkage)


@pytest.mark.parametrize("mode", ["global", "semiglobal", "local"])
def test_device_merge_engages_and_matches_oracle(mode):
    seqs = _family()
    cfg = PralineConfig(merge_mode=mode, backend="xla")
    pp, tree = _tree(seqs, cfg)
    merged = dm.try_device_merge(pp, tree, B62, cfg)
    assert merged is not None, f"{mode} must take the device walk"
    want = oracle_msa(seqs, B62, cfg)
    assert pt.format_alignment_fasta(merged) == pt.format_alignment_fasta(want)


def test_divergent_local_merges_match_oracle():
    """Local merges with weakly-related members (short segments, empty
    paths possible) take the device walk and stay byte-equal."""
    rng = np.random.default_rng(11)
    seqs = [
        Sequence(f"r{i}", rng.integers(0, 20, size=int(rng.integers(12, 40))).astype(np.int32),
                 pt.ALPHABET_AA)
        for i in range(8)
    ]
    cfg = PralineConfig(merge_mode="local", backend="xla")
    pp, tree = _tree(seqs, cfg)
    merged = dm.try_device_merge(pp, tree, B62, cfg)
    assert merged is not None
    want = oracle_msa(seqs, B62, cfg)
    assert pt.format_alignment_fasta(merged) == pt.format_alignment_fasta(want)


@pytest.mark.parametrize("kind", ["streamed", "ckpt"])
@pytest.mark.parametrize("mode", ["global", "semiglobal", "local"])
def test_upper_rungs_match_materialized(monkeypatch, mode, kind):
    """The >4095-column rung swaps in the streamed producer and the >8191
    rungs the checkpointed walk; forcing either at a small capacity must
    not change a single byte."""
    seqs = _family(seed=5)
    cfg = PralineConfig(merge_mode=mode, backend="xla")
    pp, tree = _tree(seqs, cfg)
    want = dm.try_device_merge(pp, tree, B62, cfg)
    assert want is not None
    monkeypatch.setattr(dm, "_rung_kind", lambda C_cap: kind)
    dm._level_step_jit.cache_clear()
    dm._chain_step_jit.cache_clear()
    got = dm.try_device_merge(pp, tree, B62, cfg)
    monkeypatch.undo()
    dm._level_step_jit.cache_clear()
    dm._chain_step_jit.cache_clear()
    assert got is not None
    assert pt.format_alignment_fasta(got) == pt.format_alignment_fasta(want)


def test_giant_columns_take_the_ckpt_rung():
    """Merged widths past 8191 columns keep the node-table walk (round 5,
    SURVEY §9 P3): the 16383 rung runs the checkpointed walk, byte-equal
    to the per-level fallback path (msa.pipeline.batched_progressive_merge
    on the same tree).  One join of ~8.5k-residue members — minutes-scale
    scans at this width keep the case to a single pair."""
    from praline_tpu.msa.pipeline import batched_progressive_merge
    from praline_tpu.types import SequenceTree

    rng = np.random.default_rng(7)
    seqs = [
        Sequence(
            f"g{i}", rng.integers(0, 20, size=8500).astype(np.int32),
            pt.ALPHABET_AA,
        )
        for i in range(2)
    ]
    cfg = PralineConfig(backend="xla")
    pp = batched_preprofiles(seqs, B62, cfg)
    tree = SequenceTree(2, ((0, 1),))
    rungs = []
    real = dm._rung_kind

    def spy(C_cap):
        rungs.append(C_cap)
        return real(C_cap)

    dm._rung_kind = spy
    try:
        merged = dm.try_device_merge(pp, tree, B62, cfg)
    finally:
        dm._rung_kind = real
    assert merged is not None, "giant columns must keep the device walk"
    assert 16383 in rungs and real(16383) == "ckpt"
    assert merged.num_columns > 8191
    # Reference: the per-level fallback path on the same tree.  backend
    # "oracle" makes batched_progressive_merge skip the device walk (no
    # circularity) while still driving the batched kernels.
    want = batched_progressive_merge(
        pp, tree, B62, PralineConfig(backend="oracle")
    )
    assert pt.format_alignment_fasta(merged) == pt.format_alignment_fasta(want)
