"""Homology-extended preprofiles with the fake BLAST fixture (SURVEY.md C14,
§5 fixtures)."""

import numpy as np

from praline_tpu import ALPHABET_AA, PralineConfig, builtin_score_matrix
from praline_tpu.io import format_alignment_fasta
from praline_tpu.msa import msa_align
from praline_tpu.msa.homology import FakeBlastFinder, find_homologs
from praline_tpu.oracle import oracle_msa
from praline_tpu.types import Sequence, TRACK_ID_PREPROFILE

B62 = builtin_score_matrix("blosum62")


def seqs():
    return [
        Sequence.from_str(n, t, ALPHABET_AA)
        for n, t in [
            ("a", "MKVLAWGYPVED"),
            ("b", "MKVLAWGYPED"),
            ("c", "MKVINWGYPVED"),
        ]
    ]


def hits():
    return {
        "a": [Sequence.from_str("hit_a1", "MKVLAWGYPVQD", ALPHABET_AA)],
        "c": [
            Sequence.from_str("hit_c1", "MKVINWGYPV", ALPHABET_AA),
            Sequence.from_str("hit_c2", "KVINWGYPVEDA", ALPHABET_AA),
        ],
    }


def test_fake_finder_mapping():
    finder = FakeBlastFinder(hits())
    mapping = find_homologs(seqs(), finder)
    assert set(mapping) == {0, 2}
    assert finder.calls == ["a", "b", "c"]
    assert len(mapping[2]) == 2


def test_homology_hits_guard_checkpoint_resume(tmp_path):
    """Stale-resume guard: the checkpoint digest covers homology hits
    (SURVEY.md §6 checkpoint row, §8.5).  Re-running against DIFFERENT hits
    (a different BLAST DB, or the same DB after it drifted) must not reuse
    the cached preprofiles — the run is refused with the standard
    different-run error rather than silently resuming finder A's state."""
    import pytest

    ss = seqs()
    cfg = PralineConfig(preprofile_mode="global", checkpoint_dir=str(tmp_path))
    mapping_a = find_homologs(ss, FakeBlastFinder(hits()))
    out_a = msa_align(ss, B62, cfg, extra_slaves=mapping_a)
    assert (tmp_path / "preprofiles.npz").exists()

    # Same hits resume fine (content-based identity, not object identity).
    mapping_a2 = find_homologs(seqs(), FakeBlastFinder(hits()))
    out_a2 = msa_align(seqs(), B62, cfg, extra_slaves=mapping_a2)
    assert format_alignment_fasta(out_a2) == format_alignment_fasta(out_a)

    # Finder B: one hit's residues drifted -> digest differs -> refused.
    drifted = hits()
    drifted["a"] = [Sequence.from_str("hit_a1", "MKVLAWGYPAQD", ALPHABET_AA)]
    mapping_b = find_homologs(seqs(), FakeBlastFinder(drifted))
    with pytest.raises(ValueError, match="different run"):
        msa_align(seqs(), B62, cfg, extra_slaves=mapping_b)

    # No hits at all is also a different run.
    with pytest.raises(ValueError, match="different run"):
        msa_align(seqs(), B62, cfg)

    # A fresh dir REBUILDS: finder B's preprofiles differ from finder A's.
    cfg_b = PralineConfig(
        preprofile_mode="global", checkpoint_dir=str(tmp_path / "b")
    )
    msa_align(seqs(), B62, cfg_b, extra_slaves=mapping_b)
    a = np.load(tmp_path / "preprofiles.npz")
    b = np.load(tmp_path / "b" / "preprofiles.npz")
    assert not np.array_equal(a["counts_0"], b["counts_0"])


def test_homology_extension_changes_preprofiles_and_matches_oracle():
    ss = seqs()
    mapping = find_homologs(ss, FakeBlastFinder(hits()))
    cfg = PralineConfig(preprofile_mode="global")

    plain = msa_align(ss, B62, cfg)
    extended = msa_align(ss, B62, cfg, extra_slaves=mapping)
    want = oracle_msa(ss, B62, cfg, extra_slaves=mapping)
    # pipeline == oracle under extension
    assert format_alignment_fasta(extended) == format_alignment_fasta(want)

    # extension actually enriched the counts
    from praline_tpu.msa import batched_preprofiles

    pp_plain = batched_preprofiles(ss, B62, cfg)
    pp_ext = batched_preprofiles(ss, B62, cfg, extra_slaves=mapping)
    tot_plain = pp_plain[0].profiles[TRACK_ID_PREPROFILE].counts.sum()
    tot_ext = pp_ext[0].profiles[TRACK_ID_PREPROFILE].counts.sum()
    assert tot_ext > tot_plain
