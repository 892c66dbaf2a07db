"""Packaged data: substitution matrices (see ``matrices/``).

``blosum62.txt`` is the exact standard NCBI BLOSUM62 table.  ``blosum50.txt``
and ``pam250.txt`` were reconstructed offline (no network in the build
environment — SURVEY.md §0) and are flagged as such in their headers;
``dna_simple.txt`` is a simple NUC.4.4-style match/mismatch scheme.  Custom
matrices in the same text format load via
``praline_tpu.io.load_score_matrix``.
"""
