"""SP/TC column-accuracy metrics (SURVEY.md §5.5: tracked, never asserted
as parity — these tests pin the METRIC's own arithmetic)."""

import numpy as np
import pytest

from praline_tpu import ALPHABET_AA
from praline_tpu.io.fasta import alignment_from_gapped_texts
from praline_tpu.util.accuracy import sp_tc


def _aln(records):
    return alignment_from_gapped_texts(records, ALPHABET_AA)


def test_identity_scores_one():
    a = _aln([("x", "MKV-LA"), ("y", "MK-WLA"), ("z", "MKVW-A")])
    assert sp_tc(a, a) == (1.0, 1.0)


def test_fully_shifted_scores_zero():
    ref = _aln([("a", "AC-"), ("b", "-AC")])   # one aligned pair: C~A
    test = _aln([("a", "AC"), ("b", "AC")])    # aligns A~A, C~C instead
    sp, tc = sp_tc(test, ref)
    assert sp == 0.0 and tc == 0.0
    # and the reference against itself is perfect
    assert sp_tc(ref, ref) == (1.0, 1.0)


def test_partial_agreement_hand_computed():
    # ref columns: (M,M,M) (K,K,-) (V,-,V)
    ref = _aln([("a", "MKV"), ("b", "MK-"), ("c", "M-V")])
    # test alignment keeps column 0 and the K~K pair, breaks V~V:
    test = _aln([("a", "MKV-"), ("b", "MK--"), ("c", "M--V")])
    sp, tc = sp_tc(test, ref)
    # ref pairs: col0 -> 3 pairs, col1 -> 1 (K~K), col2 -> 1 (V~V): 5 total,
    # 4 reproduced.
    assert sp == pytest.approx(4 / 5)
    # core columns (>= 2 residues): all 3; col2 broken -> 2/3.
    assert tc == pytest.approx(2 / 3)


def test_single_sequence_convention():
    a = _aln([("only", "MKV")])
    assert sp_tc(a, a) == (1.0, 1.0)


def test_mismatched_members_raise():
    a = _aln([("a", "MKV"), ("b", "MKV")])
    b = _aln([("a", "MKV"), ("c", "MKV")])
    with pytest.raises(ValueError):
        sp_tc(a, b)
    # same names, different residues
    c = _aln([("a", "MKVL"), ("b", "MKV-")])
    with pytest.raises(ValueError):
        sp_tc(a, c)


def test_duplicate_names_raise():
    dup = _aln([("x", "MKV"), ("x", "MKV"), ("y", "MKV")])
    with pytest.raises(ValueError, match="duplicate"):
        sp_tc(dup, dup)


def test_same_length_different_residues_raise():
    a = _aln([("a", "MKV"), ("b", "MKV")])
    c = _aln([("a", "MAV"), ("b", "MKV")])
    with pytest.raises(ValueError, match="differs"):
        sp_tc(a, c)


def test_member_order_irrelevant():
    ref = _aln([("a", "MKV"), ("b", "MK-"), ("c", "M-V")])
    test = _aln([("c", "M--V"), ("a", "MKV-"), ("b", "MK--")])
    sp, tc = sp_tc(test, ref)
    assert sp == pytest.approx(4 / 5) and tc == pytest.approx(2 / 3)
