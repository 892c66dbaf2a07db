"""Generate committed golden families (tests/e2e/test_goldens.py).

Each family is simulated evolution over a random tree (substitutions +
indels, so member lengths are RAGGED), the golden alignment is produced by
the NumPy ORACLE (the parity anchor, SURVEY.md §0), and the batched
pipeline is cross-checked byte-equal before anything is written — a golden
that only the pipeline can reproduce would be self-fulfilling.

Usage: /opt/venv/bin/python tools/gen_goldens.py family64
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

TESTDATA = pathlib.Path(__file__).resolve().parents[1] / "testdata"


def _evolve(rng, toks, sub_p, indel_p):
    """One edge of simulated evolution: point substitutions + short indels."""
    out = []
    i = 0
    n = len(toks)
    while i < n:
        r = rng.random()
        if r < indel_p / 2:  # deletion of 1-4 residues
            i += int(rng.integers(1, 5))
            continue
        if r < indel_p:  # insertion of 1-4 residues
            out.extend(rng.integers(0, 20, size=int(rng.integers(1, 5))))
        t = int(toks[i])
        if rng.random() < sub_p:
            t = int(rng.integers(0, 20))
        out.append(t)
        i += 1
    if not out:
        out = [int(rng.integers(0, 20))]
    return np.asarray(out, dtype=np.int32)


def make_family(n_leaves: int, root_len: int, seed: int, levels: int,
                sub_p: float = 0.12, indel_p: float = 0.05):
    """Binary-ish tree: each level doubles the population by evolving every
    member once more; leaves end up ragged in length and ~levels edges
    diverged."""
    rng = np.random.default_rng(seed)
    pop = [rng.integers(0, 20, size=root_len).astype(np.int32)]
    while len(pop) < n_leaves:
        pop = [_evolve(rng, t, sub_p, indel_p) for t in pop for _ in (0, 1)]
    pop = pop[:n_leaves]
    for _ in range(max(0, levels - int(np.log2(n_leaves)))):
        pop = [_evolve(rng, t, sub_p, indel_p) for t in pop]
    return pop


def write_family64() -> None:
    import praline_tpu as pt
    from praline_tpu.msa import msa_align
    from praline_tpu.oracle import oracle_msa
    from praline_tpu.types import Sequence

    toks = make_family(64, root_len=70, seed=64, levels=6)
    seqs = [Sequence(f"s{i:02d}", t, pt.ALPHABET_AA) for i, t in enumerate(toks)]
    lens = sorted(s.length for s in seqs)
    assert lens[0] < lens[-1], "family must be ragged"
    fasta_in = "".join(
        f">{s.name}\n{s.alphabet.detokenize(s.tokens)}\n" for s in seqs
    )
    (TESTDATA / "family64.fasta").write_text(fasta_in)

    m = pt.builtin_score_matrix("blosum62")
    for tag, cfg in {
        "default": pt.PralineConfig(),
        "semi_series3": pt.PralineConfig(
            gap_series=(12, 6, 1), merge_mode="semiglobal", linkage="average"
        ),
    }.items():
        want = oracle_msa(seqs, m, cfg)
        got = msa_align(seqs, m, cfg)
        w_fa = pt.format_alignment_fasta(want)
        w_cl = pt.io.format_alignment_clustal(want)
        assert w_fa == pt.format_alignment_fasta(got), f"{tag}: pipeline != oracle"
        assert w_cl == pt.io.format_alignment_clustal(got), tag
        (TESTDATA / f"family64.{tag}.golden.fasta").write_text(w_fa)
        (TESTDATA / f"family64.{tag}.golden.aln").write_text(w_cl)
        print(f"family64.{tag}: {len(seqs)} seqs, lens {lens[0]}..{lens[-1]}, "
              f"{len(w_fa.splitlines())} fasta lines")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "family64"
    {"family64": write_family64}[which]()
