"""Real BLAST+ adapter coverage via a stub ``psiblast`` binary on PATH
(VERDICT r2 item 4): subprocess invocation, outfmt-6 parsing, per-subject
dedup, gap/stop stripping and the failure path — no BLAST+ install needed.
"""

import os
import stat

import pytest

from praline_tpu import ALPHABET_AA, PralineConfig, builtin_score_matrix
from praline_tpu.io import format_alignment_fasta
from praline_tpu.msa import msa_align
from praline_tpu.msa.homology import BlastPlusFinder, find_homologs_blast
from praline_tpu.oracle import oracle_msa
from praline_tpu.types import Sequence

B62 = builtin_score_matrix("blosum62")

# The stub echoes canned outfmt-6 rows keyed on the query's sequence name,
# recording its argv so the invocation contract is assertable.  Rows cover:
# duplicate subjects (first HSP wins), gapped + stop-carrying segments
# (stripped), a malformed row (skipped) and an all-gap row (dropped).
STUB = r"""#!/bin/sh
printf '%s\n' "$@" > "$STUB_LOG"
query=""
while [ $# -gt 0 ]; do
  [ "$1" = "-query" ] && query="$2"
  shift
done
case "$(head -1 "$query")" in
  ">boom"*) echo "simulated database failure" >&2; exit 2 ;;
  ">a"*)
    printf 'hit1\tMKVL-AWGYPV*QD\n'
    printf 'hit1\tSHOULDBEDEDUPED\n'
    printf 'malformed row without tab\n'
    printf 'hit2\tMKVINWGYPV\n'
    printf 'gaponly\t----\n'
    printf 'hit3\tKVINWGYPVEDA\n'
    ;;
esac
exit 0
"""


@pytest.fixture
def stub_psiblast(tmp_path, monkeypatch):
    exe = tmp_path / "psiblast"
    exe.write_text(STUB)
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{tmp_path}{os.pathsep}{os.environ['PATH']}")
    log = tmp_path / "argv.log"
    monkeypatch.setenv("STUB_LOG", str(log))
    return log


def _seqs():
    return [
        Sequence.from_str(n, t, ALPHABET_AA)
        for n, t in [("a", "MKVLAWGYPVED"), ("b", "MKVLAWGYPED")]
    ]


def test_missing_binary_is_a_clean_error(tmp_path, monkeypatch):
    monkeypatch.setenv("PATH", str(tmp_path))  # empty dir: no psiblast
    with pytest.raises(FileNotFoundError, match="psiblast"):
        BlastPlusFinder("somedb")


def test_adapter_invocation_parsing_and_dedup(stub_psiblast):
    finder = BlastPlusFinder("somedb", iterations=2, evalue=1e-4, max_hits=10)
    hits = finder(_seqs()[0])
    # parsing: dedup kept hit1's FIRST segment; gaps and '*' stripped;
    # malformed and all-gap rows dropped.
    assert [h.name for h in hits] == ["hit1", "hit2", "hit3"]
    assert hits[0].text() == "MKVLAWGYPVQD"
    # invocation contract: the knobs reached the argv.
    argv = stub_psiblast.read_text().split()
    assert argv[argv.index("-db") + 1] == "somedb"
    assert argv[argv.index("-num_iterations") + 1] == "2"
    assert argv[argv.index("-evalue") + 1] == "0.0001"
    assert argv[argv.index("-max_target_seqs") + 1] == "10"
    assert argv[argv.index("-outfmt") + 1:] == ["6", "sseqid", "sseq"]


def test_adapter_max_hits_truncates(stub_psiblast):
    finder = BlastPlusFinder("somedb", max_hits=2)
    hits = finder(_seqs()[0])
    assert [h.name for h in hits] == ["hit1", "hit2"]


def test_adapter_failure_logs_and_returns_empty(stub_psiblast, caplog):
    finder = BlastPlusFinder("somedb")
    with caplog.at_level("WARNING", logger="praline_tpu"):
        hits = finder(Sequence.from_str("boom", "MKVLAWGYPVED", ALPHABET_AA))
    assert hits == []
    assert any("psiblast failed" in r.message for r in caplog.records)


def test_adapter_drives_preprofiles_end_to_end(stub_psiblast):
    """The real-adapter mapping feeds msa_align exactly like the fake's,
    and pipeline == oracle under the extension."""
    ss = _seqs()
    mapping = find_homologs_blast(ss, "somedb")
    assert set(mapping) == {0} and len(mapping[0]) == 3  # 'b' found nothing
    cfg = PralineConfig(preprofile_mode="global")
    got = msa_align(ss, B62, cfg, extra_slaves=mapping)
    want = oracle_msa(ss, B62, cfg, extra_slaves=mapping)
    assert format_alignment_fasta(got) == format_alignment_fasta(want)


def test_cli_blast_db_flag(stub_psiblast, tmp_path):
    """--blast-db drives the real adapter through the CLI (stubbed
    psiblast), changing the output vs the unextended run."""
    from praline_tpu.cli.main import main

    fa = tmp_path / "in.fasta"
    fa.write_text(">a\nMKVLAWGYPVED\n>b\nMKVLAWGYPED\n")
    out_ext = tmp_path / "ext.fasta"
    out_plain = tmp_path / "plain.fasta"
    rc = main([str(fa), str(out_ext), "--backend", "xla",
               "--preprofile", "global", "--blast-db", "somedb"])
    assert rc == 0
    assert main([str(fa), str(out_plain), "--backend", "xla",
                 "--preprofile", "global"]) == 0
    # The stub's hits enriched 'a's preprofile; emission stays valid FASTA.
    assert out_ext.read_text().startswith(">a\n")
    # And matches the library path with the same extension.
    import praline_tpu as pt
    from praline_tpu.msa import msa_align
    from praline_tpu.msa.homology import find_homologs_blast

    seqs = pt.load_sequence_fasta(str(fa), pt.ALPHABET_AA)
    m = pt.builtin_score_matrix("blosum62")
    mapping = find_homologs_blast(seqs, "somedb")
    want = msa_align(seqs, m, pt.PralineConfig(
        preprofile_mode="global", backend="xla"), extra_slaves=mapping)
    assert out_ext.read_text() == pt.format_alignment_fasta(want)
