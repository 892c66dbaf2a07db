"""End-to-end parity: batched pipeline == oracle pipeline, byte-equal
emission (SURVEY.md §5.5/§5.6)."""

import numpy as np
import pytest

from praline_tpu import ALPHABET_AA, PralineConfig, builtin_score_matrix
from praline_tpu.io import format_alignment_clustal, format_alignment_fasta
from praline_tpu.msa import msa_align
from praline_tpu.oracle import oracle_msa
from praline_tpu.types import Sequence

B62 = builtin_score_matrix("blosum62")

FAMILY = [
    ("s1", "MKVLAWGYPVEDENNQTRLLVM"),
    ("s2", "MKVLAWGYPEDENNQTRLVM"),
    ("s3", "MKVINWGYPVEDDNNQTRLLVM"),
    ("s4", "MRVLAWGYAVEDNNNQSRLLVM"),
    ("s5", "MKVLWGYPVEDQNNQTRLLV"),
    ("s6", "GGGPLNWHHQQACCAYYTR"),
]


def seqs(n=None):
    items = FAMILY if n is None else FAMILY[:n]
    return [Sequence.from_str(a, b, ALPHABET_AA) for a, b in items]


@pytest.mark.parametrize(
    "cfg",
    [
        PralineConfig(),
        PralineConfig(preprofile_mode="global"),
        PralineConfig(preprofile_mode="local", merge_mode="semiglobal"),
        PralineConfig(gap_series=(13, 7, 1), linkage="single", score_normalization="none"),
        PralineConfig(distance_mode="local", linkage="complete"),
    ],
    ids=["default", "pp-global", "pp-local-semi", "series3-single-raw", "local-dist"],
)
def test_batched_pipeline_matches_oracle(cfg):
    ss = seqs()
    want = oracle_msa(ss, B62, cfg)
    got = msa_align(ss, B62, cfg)
    assert format_alignment_fasta(got) == format_alignment_fasta(want)
    assert format_alignment_clustal(got) == format_alignment_clustal(want)


def test_pipeline_batching_knobs_do_not_change_output():
    ss = seqs(5)
    a = msa_align(ss, B62, PralineConfig(batch_pairs=2, bucket_sizes=(31, 63)))
    b = msa_align(ss, B62, PralineConfig(batch_pairs=64, bucket_sizes=(127,)))
    assert format_alignment_fasta(a) == format_alignment_fasta(b)


def test_pipeline_determinism():
    ss = seqs()
    cfg = PralineConfig(preprofile_mode="global")
    a = format_alignment_fasta(msa_align(ss, B62, cfg))
    b = format_alignment_fasta(msa_align(ss, B62, cfg))
    assert a == b
