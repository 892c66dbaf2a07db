"""Golden end-to-end tests (SURVEY.md §5.5): the batched pipeline must emit
byte-equal FASTA/CLUSTAL against committed oracle-generated goldens."""

from pathlib import Path

import pytest

from praline_tpu import ALPHABET_AA, PralineConfig, builtin_score_matrix
from praline_tpu.io import (
    format_alignment_clustal,
    format_alignment_fasta,
    load_sequence_fasta,
)
from praline_tpu.msa import msa_align

TESTDATA = Path(__file__).resolve().parents[2] / "testdata"
B62 = builtin_score_matrix("blosum62")

CONFIGS = {
    "default": PralineConfig(),
    "ppglobal": PralineConfig(preprofile_mode="global"),
    "series3_local": PralineConfig(
        gap_series=(13, 7, 1), distance_mode="local", linkage="complete"
    ),
}


@pytest.mark.parametrize("tag", sorted(CONFIGS))
def test_family10_golden_byte_equal(tag):
    seqs = load_sequence_fasta(TESTDATA / "family10.fasta", ALPHABET_AA)
    aln = msa_align(seqs, B62, CONFIGS[tag])
    want_fasta = (TESTDATA / f"family10.{tag}.golden.fasta").read_text()
    want_clustal = (TESTDATA / f"family10.{tag}.golden.aln").read_text()
    assert format_alignment_fasta(aln) == want_fasta
    assert format_alignment_clustal(aln) == want_clustal


def test_goldens_look_like_alignments():
    text = (TESTDATA / "family10.default.golden.fasta").read_text()
    assert text.count(">") == 10
    rows = [l for l in text.splitlines() if not l.startswith(">")]
    assert rows and all(set(r) <= set("ARNDCQEGHILKMFPSTWYVBZX-") for r in rows)


DIV_CONFIGS = {
    "default": ("blosum62", PralineConfig()),
    "pam250_semi_pplocal": (
        "pam250",
        PralineConfig(
            merge_mode="semiglobal", preprofile_mode="local",
            gap_series=(10, 2), linkage="single",
        ),
    ),
}


@pytest.mark.parametrize("tag", sorted(DIV_CONFIGS))
def test_family16div_golden_byte_equal(tag):
    """Harder BAliBASE-style set: 16 leaves of a simulated 4-level
    evolution (substitutions + indels), twilight-zone divergence."""
    mname, cfg = DIV_CONFIGS[tag]
    seqs = load_sequence_fasta(TESTDATA / "family16div.fasta", ALPHABET_AA)
    aln = msa_align(seqs, builtin_score_matrix(mname), cfg)
    assert format_alignment_fasta(aln) == (
        TESTDATA / f"family16div.{tag}.golden.fasta"
    ).read_text()
    assert format_alignment_clustal(aln) == (
        TESTDATA / f"family16div.{tag}.golden.aln"
    ).read_text()


def test_dna8_golden_byte_equal():
    from praline_tpu import ALPHABET_DNA

    seqs = load_sequence_fasta(TESTDATA / "dna8.fasta", ALPHABET_DNA)
    cfg = PralineConfig(gap_series=(8, 2), alphabet="dna", score_matrix="dna_simple")
    aln = msa_align(seqs, builtin_score_matrix("dna_simple"), cfg)
    assert format_alignment_fasta(aln) == (
        TESTDATA / "dna8.default.golden.fasta"
    ).read_text()
    assert format_alignment_clustal(aln) == (
        TESTDATA / "dna8.default.golden.aln"
    ).read_text()


FAM64_TAGS = ("default", "semi_series3")


@pytest.mark.parametrize("tag", FAM64_TAGS)
def test_family64_golden_byte_equal(tag):
    """Ragged 64-leaf family (VERDICT r2 item 10): oracle-generated goldens
    via tools/gen_goldens.py; exercises deep merge levels and wide
    all-pairs batches."""
    cfgs = {
        "default": PralineConfig(),
        "semi_series3": PralineConfig(
            gap_series=(12, 6, 1), merge_mode="semiglobal", linkage="average"
        ),
    }
    seqs = load_sequence_fasta(TESTDATA / "family64.fasta", ALPHABET_AA)
    assert len(seqs) == 64
    assert len({s.length for s in seqs}) > 8, "family must be ragged"
    aln = msa_align(seqs, B62, cfgs[tag])
    assert format_alignment_fasta(aln) == (
        TESTDATA / f"family64.{tag}.golden.fasta"
    ).read_text()
    assert format_alignment_clustal(aln) == (
        TESTDATA / f"family64.{tag}.golden.aln"
    ).read_text()
