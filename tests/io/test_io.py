"""I/O layer tests: alphabets, FASTA/CLUSTAL emission, matrix loading."""

import io as pyio

import numpy as np
import pytest

from praline_tpu import (
    ALPHABET_AA,
    ALPHABET_DNA,
    GAP,
    builtin_score_matrix,
    format_alignment_clustal,
    format_alignment_fasta,
    load_alignment_fasta,
    load_sequence_fasta,
)
from praline_tpu.io import format_sequences_fasta, iter_fasta, parse_score_matrix
from praline_tpu.types import Sequence


def test_alphabet_tokenize_roundtrip():
    toks = ALPHABET_AA.tokenize("ARNDcqegh")
    assert toks.tolist() == [0, 1, 2, 3, 4, 5, 6, 7, 8]
    assert ALPHABET_AA.detokenize(toks) == "ARNDCQEGH"


def test_alphabet_aliases_and_unknown():
    toks = ALPHABET_AA.tokenize("AUJ!", strict=False)
    assert toks[1] == ALPHABET_AA.index("C")  # U -> C
    assert toks[2] == ALPHABET_AA.index("L")  # J -> L
    assert toks[3] == ALPHABET_AA.index("X")  # unknown -> X
    with pytest.raises(ValueError):
        ALPHABET_AA.tokenize("A!", strict=True)


def test_alphabet_gap_handling():
    with pytest.raises(ValueError):
        ALPHABET_AA.tokenize("A-C")
    toks = ALPHABET_AA.tokenize("A-C", allow_gaps=True)
    assert toks.tolist() == [0, GAP, 4]


def test_dna_alphabet():
    toks = ALPHABET_DNA.tokenize("ACGUN")
    assert toks.tolist() == [0, 1, 2, 3, 4]  # U aliases to T
    assert ALPHABET_DNA.tokenize("R", strict=False).tolist() == [4]


def test_fasta_parse_and_emit_roundtrip():
    text = ">seq one desc\nMKVLAW\nGY\n>seq2\nACDEFGHIKLMNPQRSTVWY\n"
    seqs = load_sequence_fasta(pyio.StringIO(text), ALPHABET_AA)
    assert [s.name for s in seqs] == ["seq one desc", "seq2"]
    assert seqs[0].text() == "MKVLAWGY"
    out = format_sequences_fasta(seqs)
    assert out == ">seq one desc\nMKVLAWGY\n>seq2\nACDEFGHIKLMNPQRSTVWY\n"


def test_fasta_wrap_at_60():
    seq = Sequence.from_str("long", "A" * 130, ALPHABET_AA)
    out = format_sequences_fasta([seq])
    lines = out.splitlines()
    assert lines[0] == ">long"
    assert [len(l) for l in lines[1:]] == [60, 60, 10]


def test_alignment_fasta_roundtrip():
    text = ">a\nMKV-LAW\n>b\nM-VQLAW\n"
    aln = load_alignment_fasta(pyio.StringIO(text), ALPHABET_AA)
    assert aln.num_members == 2
    assert aln.num_columns == 7
    assert format_alignment_fasta(aln) == text
    assert aln.members[0].text() == "MKVLAW"


def test_clustal_emission_shape():
    text = ">a\nMKVLAW\n>b\nMKVQAW\n"
    aln = load_alignment_fasta(pyio.StringIO(text), ALPHABET_AA)
    out = format_alignment_clustal(aln)
    lines = out.splitlines()
    assert lines[0].startswith("CLUSTAL")
    assert any("MKVLAW" in l for l in lines)
    # conservation line marks the 5 identical columns (L/Q column blank)
    marks = [l for l in lines if "*" in l and not any(c.isalpha() for c in l)]
    assert marks and marks[0].strip() == "*** **"


def test_iter_fasta_rejects_headerless():
    with pytest.raises(ValueError):
        list(iter_fasta("MKVLAW\n"))


def test_blosum62_values():
    m = builtin_score_matrix("blosum62")
    idx = ALPHABET_AA.index
    assert m.score(idx("W"), idx("W")) == 11
    assert m.score(idx("A"), idx("A")) == 4
    assert m.score(idx("A"), idx("R")) == -1
    assert m.score(idx("C"), idx("C")) == 9
    assert m.score(idx("E"), idx("Z")) == 4
    # symmetry
    assert np.array_equal(m.scores, m.scores.T)


def test_dna_matrix():
    m = builtin_score_matrix("dna_simple")
    assert m.alphabet is ALPHABET_DNA
    assert m.score(0, 0) == 5
    assert m.score(0, 1) == -4


def test_custom_matrix_parse_errors():
    with pytest.raises(ValueError):
        parse_score_matrix("", ALPHABET_DNA)
    text = "   A  C  G  T  N\nA  1 0 0 0 0\n"
    with pytest.raises(ValueError):
        parse_score_matrix(text, ALPHABET_DNA)  # missing rows


def test_clustal_roundtrip():
    from praline_tpu.io import load_alignment_clustal, parse_alignment_clustal

    text = ">a\nMKV-LAW\n>b\nM-VQLAW\n>c long\nMKVQLAW\n"
    aln = load_alignment_fasta(pyio.StringIO(text), ALPHABET_AA)
    clustal = format_alignment_clustal(aln)
    back = parse_alignment_clustal(clustal, ALPHABET_AA)
    assert back.num_members == 3
    assert np.array_equal(back.rows, aln.rows)
    # names survive (first token of the original name)
    assert [m.name for m in back.members] == ["a", "b", "c"]
    with pytest.raises(ValueError):
        parse_alignment_clustal("not a clustal file", ALPHABET_AA)


def test_clustal_seqnos_and_aliases():
    """clustalw -SEQNOS style trailing residue counts and lowercase alias
    residues must parse (ADVICE round 1: rows were silently dropped)."""
    from praline_tpu.io import parse_alignment_clustal

    text = (
        "CLUSTAL W (1.83) multiple sequence alignment\n"
        "\n"
        "a   MKV-LAW 6\n"
        "b   MuVQLAW 7\n"
        "      *  ***\n"
    )
    aln = parse_alignment_clustal(text, ALPHABET_AA)
    assert aln.num_members == 2
    assert [m.name for m in aln.members] == ["a", "b"]
    # lowercase alias 'u' maps through U -> C
    assert ALPHABET_AA.detokenize(aln.rows[1]) == "MCVQLAW"


def test_clustal_junk_residue_raises():
    from praline_tpu.io import parse_alignment_clustal

    text = "CLUSTAL x\n\na  MKV@LAW\n"
    with pytest.raises(ValueError, match="unrecognized residue"):
        parse_alignment_clustal(text, ALPHABET_AA)


def test_clustal_multi_chunk_rows_not_truncated():
    """Rows with several whitespace-separated residue blocks must join, not
    silently truncate (round-2 review fix); a trailing integer column still
    strips (SEQNOS)."""
    from praline_tpu.io.clustal import parse_alignment_clustal

    text = (
        "CLUSTAL W (1.83) multiple sequence alignment\n\n"
        "a   MKVLAW GYPVED 12\n"
        "b   MKVLAW GYP-ED 11\n"
    )
    aln = parse_alignment_clustal(text, ALPHABET_AA)
    assert aln.num_members == 2
    assert aln.num_columns == 12
    import numpy as np

    from praline_tpu.io import format_alignment_fasta

    out = format_alignment_fasta(aln)
    assert "MKVLAWGYPVED" in out and "MKVLAWGYP-ED" in out
