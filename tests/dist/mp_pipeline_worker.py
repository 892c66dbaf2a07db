"""Worker for the FULL-PIPELINE 2-process jax.distributed test
(VERDICT r2 item 2): runs ``msa_align`` end-to-end under a mesh spanning
both processes, with a shared checkpoint dir, and writes its FASTA
emission + guide tree so the test can assert every host saw the same
tree and produced byte-equal output.

Usage: mp_pipeline_worker.py <process_id> <coordinator_port> <workdir>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1])
port = sys.argv[2]
workdir = sys.argv[3]

jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2 and len(jax.devices()) == 4

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

import praline_tpu as pt
from praline_tpu.dist import make_pair_mesh
from praline_tpu.msa import msa_align
from praline_tpu.types import PralineConfig, Sequence

# Deterministic family, identical on every host (SPMD orchestration).
rng = np.random.default_rng(5)
base = rng.integers(0, 20, size=40)
seqs = []
for i in range(12):
    toks = base.copy()
    for _ in range(6):
        toks[rng.integers(0, 40)] = rng.integers(0, 20)
    seqs.append(Sequence(f"s{i}", toks.astype(np.int32), pt.ALPHABET_AA))

m = pt.builtin_score_matrix("blosum62")
cfg = PralineConfig(
    preprofile_mode="global",
    backend="xla",
    checkpoint_dir=os.path.join(workdir, "ckpt"),
)
mesh = make_pair_mesh(4)  # spans BOTH processes (2 local + 2 remote)

trees = []
aln = msa_align(seqs, m, cfg, mesh=mesh, on_tree=trees.append)
out = pt.format_alignment_fasta(aln)

with open(os.path.join(workdir, f"rank{pid}.fasta"), "w") as f:
    f.write(out)
with open(os.path.join(workdir, f"rank{pid}.tree"), "w") as f:
    f.write(repr(trees[0].joins))
print(f"rank {pid} done: {len(out)} bytes")
