"""Generate the hand-curated divergent family (SURVEY.md §5.5: BAliBASE-like
quality-regression case) into testdata/.

The family is written as segment tables, BAliBASE RV11-style: four conserved
kinase-inspired core blocks (glycine-rich loop, catalytic HRD loop, DFG
motif, APE motif) separated by linkers of varying length and composition,
ragged N/C-terminal extensions, and one FRAGMENT sequence missing the whole
N-terminal region.  The reference alignment is the construction itself:
core blocks align column-for-column, variable-length segments left-justify
within their region (end columns of a region are gaps for shorter members).

SP/TC floors in tests/e2e/test_quality.py are asserted against THIS
reference — a metric floor, not byte parity (the byte-golden families in
testdata/ stay separate).

Usage: python tools/gen_divfam.py   (rewrites testdata/divfam.*)
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

ROOT = pathlib.Path(__file__).resolve().parents[1]

# Segment tables: (name, N-ext, B1, L1, B2, L2, B3, L3, B4, C-ext).
# Blocks carry at most two conservative substitutions per member; linkers
# and extensions vary freely in length and composition.  kin8_frag is a
# fragment: no N-terminal region at all (common in real benchmark sets).
FAMILY = [
    ("kin1_canon", "MSTDKE", "GEGAFGKV", "RLSDGTQV", "HRDLKPEN",
     "LLIDSEGNVK", "DFGLARE", "YTPEGM", "APEVL", "KGQPYD"),
    ("kin2_short", "MSE",    "GEGAFGRV", "RLNDGSQ",  "HRDLKPEN",
     "LLINSEGELK", "DFGLARE", "YSPEG",  "APEVL", "KGSSFE"),
    ("kin3_sub",   "MATDQE", "GQGAFGKV", "KLSDGS",   "HRDLKPSN",
     "LLLNSDCQVK", "DFGLSRE", "FTPQGM", "APEVL", "RGEPY"),
    ("kin4_longl", "MSVEKE", "GEGSFGKV", "RLKDESSGAQ", "HRDLKPEN",
     "ILVDSETGHIKL", "DFGLARE", "YAPEGLLS", "APEVI", "KGKAYDGP"),
    ("kin5_div",   "MPLD",   "GRGAFGVV", "ELATGKE",  "HRDLKPQN",
     "VLLDANMH",   "DFGLATE", "WSVQGS", "SPEVL", "RNEAFD"),
    ("kin6_nterm", "MKRSQEWL", "GEGAFGKV", "RISNGQLV", "HRDLKPEN",
     "LLVDKSGDLK", "DFGLARE", "YNAEGM", "APEVL", "KGHKYDQA"),
    ("kin7_cons",  "MSTEKE", "GEGAFGKV", "RLSEGAQV", "HRDLKPEN",
     "LLIDNEGHVK", "DFGLARE", "YTAEGM", "APEVL", "KGQAYD"),
    # The fragment's truncated catalytic block right-aligns under the
    # intact HRDLKPEN (explicit leading gap in the segment table).
    ("kin8_frag",  "",       "",         "",         "-RDLKPEN",
     "LLIDSENNVK", "DFGLARE", "YTPDGM", "APEVL", "KGQ"),
]


def build():
    ncols = [max(len(row[1 + r]) for row in FAMILY) for r in range(9)]
    names, rows, seqs = [], [], []
    for row in FAMILY:
        name, segs = row[0], row[1:]
        aln = "".join(s + "-" * (w - len(s)) for s, w in zip(segs, ncols))
        names.append(name)
        rows.append(aln)
        seqs.append(aln.replace("-", ""))
    return names, rows, seqs


def main():
    names, rows, seqs = build()
    fasta = "".join(f">{n}\n{s}\n" for n, s in zip(names, seqs))
    ref = "".join(f">{n}\n{r}\n" for n, r in zip(names, rows))
    (ROOT / "testdata" / "divfam.fasta").write_text(fasta)
    (ROOT / "testdata" / "divfam.ref.fasta").write_text(ref)
    width = len(rows[0])
    print(f"wrote divfam: {len(names)} seqs, ref width {width}")


if __name__ == "__main__":
    main()
