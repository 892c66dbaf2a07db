"""Failure injection + tile-resumable distance stage (SURVEY.md §6)."""

import numpy as np
import pytest

import praline_tpu.msa.pipeline as pipeline
from praline_tpu import ALPHABET_AA, PralineConfig, builtin_score_matrix
from praline_tpu.io import format_alignment_fasta
from praline_tpu.msa import msa_align
from praline_tpu.types import Sequence

B62 = builtin_score_matrix("blosum62")


def seqs(n=8):
    rng = np.random.default_rng(3)
    base = "MKVLAWGYPVEDENNQTRLLVM"
    out = []
    for i in range(n):
        s = list(base)
        for _ in range(rng.integers(0, 4)):
            s[rng.integers(0, len(s))] = "ARNDCQEGHILKMFPSTWYV"[rng.integers(0, 20)]
        out.append(Sequence.from_str(f"s{i}", "".join(s), ALPHABET_AA))
    return out


def test_crash_mid_distance_stage_resumes_from_tiles(tmp_path, monkeypatch):
    monkeypatch.setattr(pipeline, "DISTANCE_TILE_PAIRS", 5)
    ss = seqs()
    cfg = PralineConfig(checkpoint_dir=str(tmp_path / "ck"))

    class Boom(RuntimeError):
        pass

    executed = []

    def fail_on_third(tile_id):
        executed.append(tile_id)
        if tile_id == 2:
            raise Boom("injected failure")

    with pytest.raises(Boom):
        msa_align(ss, B62, cfg, fault_hook=fail_on_third)
    # tiles 0 and 1 were persisted before the crash
    done = sorted(p.name for p in (tmp_path / "ck").glob("tile_*.npz"))
    assert done == ["tile_0.npz", "tile_1.npz"]

    # resume: completed tiles are not recomputed
    recomputed = []
    result = msa_align(ss, B62, cfg, fault_hook=recomputed.append)
    assert 0 not in recomputed and 1 not in recomputed
    assert 2 in recomputed
    # tiles are cleaned up once the full matrix is saved
    assert not list((tmp_path / "ck").glob("tile_*.npz"))

    # and the output matches an uncheckpointed run exactly
    clean = msa_align(ss, B62, PralineConfig())
    assert format_alignment_fasta(result) == format_alignment_fasta(clean)


def test_tiled_matches_untiled(monkeypatch):
    ss = seqs(7)
    a = msa_align(ss, B62, PralineConfig())
    monkeypatch.setattr(pipeline, "DISTANCE_TILE_PAIRS", 3)
    b = msa_align(ss, B62, PralineConfig())
    assert format_alignment_fasta(a) == format_alignment_fasta(b)
