"""Systematic verification of every packaged substitution matrix
(SURVEY.md C20; VERDICT round 1 item 5).

Several packaged matrices are offline reconstructions (flagged in their
files); these tests pin them: symmetry, integer ranges, landmark values from
the published matrices, B/Z ambiguity-code consistency, and a SHA-256 of each
committed data file so any later edit is a deliberate, test-visible act.
"""

from __future__ import annotations

import hashlib
import importlib.resources

import numpy as np
import pytest

from praline_tpu.io import builtin_score_matrix
from praline_tpu.io.matrixfile import BUILTIN_MATRICES, _DATA_PACKAGE
from praline_tpu.types import ALPHABET_AA

AA_NAMES = [n for n, (_, a) in BUILTIN_MATRICES.items() if a is ALPHABET_AA]


def _s(m, a: str, b: str) -> int:
    i, j = m.alphabet.index(a), m.alphabet.index(b)
    return int(m.scores[i, j])


@pytest.mark.parametrize("name", sorted(BUILTIN_MATRICES))
def test_matrix_symmetric_integer(name):
    m = builtin_score_matrix(name)
    assert m.scores.dtype == np.int32
    assert np.array_equal(m.scores, m.scores.T), f"{name} is not symmetric"
    assert np.abs(m.scores).max() <= 32, f"{name} has out-of-range values"


@pytest.mark.parametrize("name", AA_NAMES)
def test_matrix_diagonal_dominant(name):
    """Every residue must score itself at least as high as any substitution
    (true for the whole BLOSUM/PAM family over the 20 canonical residues)."""
    m = builtin_score_matrix(name)
    canon = [m.alphabet.index(c) for c in "ARNDCQEGHILKMFPSTWYV"]
    sub = m.scores[np.ix_(canon, canon)]
    diag = np.diag(sub)
    assert (diag > 0).all(), f"{name}: non-positive self-score"
    assert (diag[:, None] >= sub).all(), f"{name}: off-diagonal exceeds diagonal"


@pytest.mark.parametrize("name", AA_NAMES)
def test_matrix_ambiguity_codes(name):
    """B (N/D) and Z (Q/E) must sit between their constituents' scores
    against every canonical residue; X must never beat the best canonical
    score in its row."""
    m = builtin_score_matrix(name)
    canon = [m.alphabet.index(c) for c in "ARNDCQEGHILKMFPSTWYV"]
    for amb, (p, q) in (("B", ("N", "D")), ("Z", ("Q", "E"))):
        ia = m.alphabet.index(amb)
        ip, iq = m.alphabet.index(p), m.alphabet.index(q)
        lo = np.minimum(m.scores[ip, canon], m.scores[iq, canon])
        hi = np.maximum(m.scores[ip, canon], m.scores[iq, canon])
        row = m.scores[ia, canon]
        assert ((row >= lo - 1) & (row <= hi + 1)).all(), (
            f"{name}: {amb} row outside [{p},{q}] envelope"
        )
    ix = m.alphabet.index("X")
    assert (m.scores[ix, canon] <= np.diag(m.scores[np.ix_(canon, canon)])).all()


# Landmark values from the published NCBI matrices — the strongest, most
# widely quoted entries, pinning the identity, units and scale of each file.
LANDMARKS = {
    "blosum62": {("W", "W"): 11, ("C", "C"): 9, ("A", "A"): 4, ("R", "K"): 2,
                 ("I", "V"): 3, ("W", "F"): 1, ("D", "B"): 4, ("*", "*"): 1},
    "blosum50": {("W", "W"): 15, ("C", "C"): 13, ("A", "A"): 5, ("H", "H"): 10},
    "blosum45": {("W", "W"): 15, ("C", "C"): 12, ("A", "A"): 5, ("H", "H"): 10,
                 ("R", "K"): 3, ("W", "Y"): 3},
    "blosum80": {("W", "W"): 11, ("C", "C"): 9, ("A", "A"): 5, ("H", "H"): 8,
                 ("F", "Y"): 3},
    "pam250": {("W", "W"): 17, ("C", "C"): 12, ("A", "A"): 2, ("R", "K"): 3},
    "pam120": {("W", "W"): 12, ("C", "C"): 9, ("A", "A"): 3, ("M", "M"): 8},
    "pam70": {("W", "W"): 13, ("C", "C"): 9, ("A", "A"): 5, ("M", "M"): 10},
    "pam30": {("W", "W"): 13, ("C", "C"): 10, ("A", "A"): 6, ("M", "M"): 11},
}


@pytest.mark.parametrize("name", sorted(LANDMARKS))
def test_matrix_landmarks(name):
    m = builtin_score_matrix(name)
    for (a, b), want in LANDMARKS[name].items():
        if a == "*":
            continue  # '*' is not in our alphabet (projected out by loader)
        assert _s(m, a, b) == want, f"{name}[{a},{b}] = {_s(m, a, b)} != {want}"


# SHA-256 of each committed data file: reconstructions stay pinned — any
# later correction must update this table consciously.
def test_matrix_file_checksums():
    got = {}
    for name, (resource, _) in sorted(BUILTIN_MATRICES.items()):
        text = importlib.resources.files(_DATA_PACKAGE).joinpath(resource).read_text()
        got[name] = hashlib.sha256(text.encode()).hexdigest()[:16]
    want = {
        "blosum45": "fa0cb5cf4479bb58",
        "blosum50": "f2c572198882d975",
        "blosum62": "4318236a8ecda021",
        "blosum80": "6ed4d6c534603452",
        "dna_simple": "120dd1a1aca85760",
        "pam120": "debf54cf41a5bb01",
        "pam250": "ae200ea4f206987b",
        "pam30": "c1c59d83eacdea8a",
        "pam70": "dab21962133b83b8",
    }
    # regenerate with: python -c "import tests.io.test_matrices as t; t.print_checksums()"
    assert got == want


def print_checksums():  # pragma: no cover - maintenance helper
    for name, (resource, _) in sorted(BUILTIN_MATRICES.items()):
        text = importlib.resources.files(_DATA_PACKAGE).joinpath(resource).read_text()
        print(f'        "{name}": "{hashlib.sha256(text.encode()).hexdigest()[:16]}",')
