"""Device-resident merge parity with OVER-LIMIT leaf preprofiles (round-2
review fix): leaves whose preprofile column totals exceed COUNT_LIMIT must
enter the walk rescaled exactly as node_profile rescales them for the
per-level/oracle paths — otherwise the device merge silently diverges."""

import numpy as np

from praline_tpu import ALPHABET_AA, PralineConfig, builtin_score_matrix
from praline_tpu.io import format_alignment_fasta
from praline_tpu.msa.device_merge import try_device_merge
from praline_tpu.oracle.merge import progressive_merge
from praline_tpu.oracle.tree import build_guide_tree
from praline_tpu.types import Profile, Sequence, TRACK_ID_PREPROFILE

B62 = builtin_score_matrix("blosum62")


def _huge_preprofile_seq(rng, name, L, total=1100):
    """A sequence whose preprofile column totals exceed COUNT_LIMIT (992)
    but still pass the exactness guard (1100^2 * 11 < 2^24)."""
    toks = rng.integers(0, 20, size=L).astype(np.int32)
    seq = Sequence(name, toks, ALPHABET_AA)
    counts = np.zeros((L, ALPHABET_AA.size), np.float32)
    counts[np.arange(L), toks] = np.float32(total - 20)
    # spread the rest over a few other residues so columns are not one-hot
    for k in range(4):
        counts[np.arange(L), (toks + 1 + k) % 20] += 5.0
    return seq.with_profile(
        TRACK_ID_PREPROFILE, Profile(counts, np.zeros(L, np.float32), ALPHABET_AA)
    )


def test_device_merge_rescales_overlimit_leaves():
    """Fuzz: over-limit leaves across spreads/seeds; the quantizing rescale
    tips near-tie DP decisions, so raw-count leaves would diverge."""
    cfg = PralineConfig()
    for seed in range(12):
        rng = np.random.default_rng(seed)
        seqs = [
            _huge_preprofile_seq(
                rng, f"s{i}", int(rng.integers(12, 30)),
                total=int(rng.integers(995, 2000)),
            )
            for i in range(4)
        ]
        tree = build_guide_tree(np.ones((4, 4)) - np.eye(4), "average")
        want = progressive_merge(seqs, tree, B62, cfg.gap_series, "global")
        got = try_device_merge(seqs, tree, B62, cfg)
        assert got is not None, "device merge unexpectedly fell back"
        assert format_alignment_fasta(got) == format_alignment_fasta(want), seed
