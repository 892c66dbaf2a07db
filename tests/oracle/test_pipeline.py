"""Oracle pipeline tests: profiles, preprofiles, tree, merge, full MSA."""

import numpy as np
import pytest

from praline_tpu import ALPHABET_AA, GAP, PralineConfig, builtin_score_matrix
from praline_tpu.io import format_alignment_fasta
from praline_tpu.oracle import (
    align_tokens,
    attach_preprofiles,
    build_guide_tree,
    merge_alignments,
    node_profile,
    oracle_msa,
    project_to_master,
    similarity_from_scores,
)
from praline_tpu.types import Alignment, Sequence, TRACK_ID_PREPROFILE

B62 = builtin_score_matrix("blosum62")
CFG = PralineConfig()

FAMILY = [
    ("s1", "MKVLAWGYPVED"),
    ("s2", "MKVLAWGYPED"),
    ("s3", "MKVINWGYPVED"),
    ("s4", "MRVLAWGYAVED"),
    ("s5", "MKVLWGYPVEDQ"),
]


def seqs():
    return [Sequence.from_str(n, t, ALPHABET_AA) for n, t in FAMILY]


def test_guide_tree_shapes_and_tiebreaks():
    sim = np.array(
        [
            [0.0, 10.0, 1.0],
            [10.0, 0.0, 1.0],
            [1.0, 1.0, 0.0],
        ]
    )
    tree = build_guide_tree(sim, "average")
    assert tree.joins[0] == (0, 1)  # closest pair first
    assert tree.joins[1] == (2, 3)  # leaf 2 joins internal node 3
    assert tree.newick(["a", "b", "c"]) == "(c,(a,b));"


def test_guide_tree_tie_lexicographic():
    sim = np.zeros((4, 4))  # all ties -> (0,1) then (2,3) then (4,5)
    tree = build_guide_tree(sim, "average")
    assert tree.joins == ((0, 1), (2, 3), (4, 5))


def test_linkages_differ_predictably():
    sim = np.array(
        [
            [0, 10, 0, 0],
            [10, 0, 8, 0],
            [0, 8, 0, 2],
            [0, 0, 2, 0],
        ],
        dtype=float,
    )
    for linkage in ("single", "complete", "average"):
        tree = build_guide_tree(sim, linkage)
        assert tree.joins[0] == (0, 1)


def test_merge_two_singletons_matches_pairwise():
    a, b = seqs()[:2]
    merged = merge_alignments(
        Alignment.single(a), Alignment.single(b), B62, (11, 1), "global"
    )
    res = align_tokens(a.tokens, b.tokens, B62, (11, 1), "global")
    assert merged.num_columns == res.length
    # rows reproduce the pairwise path
    row_a = merged.rows[0]
    assert np.array_equal(row_a[row_a != GAP], a.tokens)


def test_node_profile_counts():
    a, b = seqs()[:2]
    merged = merge_alignments(
        Alignment.single(a), Alignment.single(b), B62, (11, 1), "global"
    )
    prof = node_profile(merged)
    totals = prof.counts.sum(axis=1) + prof.gaps
    assert np.all(totals == 2.0)  # two members per column


def test_project_to_master():
    res = align_tokens(
        ALPHABET_AA.tokenize("MKVLAW"), ALPHABET_AA.tokenize("MKAW"), B62, (11, 1), "global"
    )
    row = project_to_master(res, 6)
    assert row.shape == (6,)
    # master fully covered in global mode: no ABSENT (-2) cells
    assert (row >= GAP).all()


def test_attach_preprofiles_modes():
    ss = seqs()
    for mode in ("dummy", "global", "local"):
        out = attach_preprofiles(ss, B62, (11, 1), mode)
        for s in out:
            prof = s.profiles[TRACK_ID_PREPROFILE]
            assert prof.length == s.length
            if mode == "dummy":
                assert prof.counts.sum() == s.length
            else:
                # master + up to 4 slaves per position
                assert prof.counts.sum(axis=1).max() <= 5
                assert prof.counts.sum(axis=1).min() >= 1


def test_oracle_msa_end_to_end():
    result = oracle_msa(seqs(), B62, CFG)
    assert result.num_members == 5
    # input order preserved (§8.6)
    assert [m.name for m in result.members] == [n for n, _ in FAMILY]
    # every row reproduces its input when ungapped (Alignment invariant
    # checked in the constructor, but assert once explicitly)
    for k, (name, text) in enumerate(FAMILY):
        row = result.rows[k]
        assert ALPHABET_AA.detokenize(row[row != GAP]) == text
    # highly similar family: width stays close to the longest input
    assert result.num_columns <= 16
    fasta = format_alignment_fasta(result)
    assert fasta.startswith(">s1\n")


@pytest.mark.parametrize("pp", ["dummy", "global", "local"])
@pytest.mark.parametrize("mode", ["global", "semiglobal"])
def test_oracle_msa_config_matrix_runs(pp, mode):
    cfg = PralineConfig(preprofile_mode=pp, merge_mode=mode, distance_mode=mode)
    result = oracle_msa(seqs()[:4], B62, cfg)
    assert result.num_members == 4


def test_oracle_msa_determinism():
    a = format_alignment_fasta(oracle_msa(seqs(), B62, CFG))
    b = format_alignment_fasta(oracle_msa(seqs(), B62, CFG))
    assert a == b


def test_single_and_pair_inputs():
    ss = seqs()
    one = oracle_msa(ss[:1], B62, CFG)
    assert one.num_columns == ss[0].length
    two = oracle_msa(ss[:2], B62, CFG)
    assert two.num_members == 2


def test_star_counts_identify_residues():
    """Preprofile counts must hold residue identities, not positions."""
    master = Sequence.from_str("m", "AAAA", ALPHABET_AA)
    slave = Sequence.from_str("s", "RRRR", ALPHABET_AA)
    from praline_tpu.oracle import build_preprofile

    prof = build_preprofile(master, [slave], B62, (11, 1), "global")
    iA = ALPHABET_AA.index("A")
    iR = ALPHABET_AA.index("R")
    assert np.all(prof.counts[:, iA] == 1.0)
    assert np.all(prof.counts[:, iR] == 1.0)
    assert prof.counts.sum() == 8.0
