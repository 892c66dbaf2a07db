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


@pytest.mark.parametrize("mode", ["global", "semiglobal", "local"])
def test_streamed_rung_matches_materialized(monkeypatch, mode):
    """The >4095-column rung swaps in the streamed producer; forcing it at
    a small capacity must not change a single byte."""
    seqs = _family(seed=5)
    cfg = PralineConfig(merge_mode=mode, backend="xla")
    pp, tree = _tree(seqs, cfg)
    want = dm.try_device_merge(pp, tree, B62, cfg)
    assert want is not None
    monkeypatch.setattr(dm, "_use_streamed", lambda C_cap: True)
    dm._level_step_jit.cache_clear()
    dm._chain_step_jit.cache_clear()
    got = dm.try_device_merge(pp, tree, B62, cfg)
    monkeypatch.undo()
    dm._level_step_jit.cache_clear()
    dm._chain_step_jit.cache_clear()
    assert got is not None
    assert pt.format_alignment_fasta(got) == pt.format_alignment_fasta(want)
