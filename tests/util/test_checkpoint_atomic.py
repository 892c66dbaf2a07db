"""Checkpoint write discipline (ADVICE r3): every artifact a concurrent
multi-host reader can see — npz, tree.json, meta.json — goes through the
tmp + rename pattern, and non-writer hosts never create files."""

import json

import numpy as np

from praline_tpu.types import SequenceTree
from praline_tpu.util.checkpoint import Checkpoint


def test_non_writer_creates_no_meta(tmp_path):
    d = tmp_path / "ck"
    Checkpoint(d, "abcd", writer=False)
    assert not (d / "meta.json").exists()


def test_non_writer_still_validates_existing_meta(tmp_path):
    d = tmp_path / "ck"
    Checkpoint(d, "abcd", writer=True)
    assert json.loads((d / "meta.json").read_text()) == {"digest": "abcd"}
    # A non-writer joining the same dir with a DIFFERENT digest must fail.
    try:
        Checkpoint(d, "zzzz", writer=False)
    except ValueError:
        pass
    else:  # pragma: no cover
        raise AssertionError("stale-digest join should raise")
    # Same digest joins fine.
    Checkpoint(d, "abcd", writer=False)


def test_tree_json_atomic_roundtrip(tmp_path):
    ck = Checkpoint(tmp_path / "ck", "abcd", writer=True)
    tree = SequenceTree(3, ((0, 1), (3, 2)))
    ck.save_tree(tree)
    got = ck.load_tree()
    assert got == tree
    # tmp + rename leaves no temp droppings behind.
    leftovers = [p.name for p in (tmp_path / "ck").iterdir() if ".tmp" in p.name]
    assert leftovers == []


def test_non_writer_saves_are_noops(tmp_path):
    d = tmp_path / "ck"
    Checkpoint(d, "abcd", writer=True)  # creates meta
    ck = Checkpoint(d, "abcd", writer=False)
    ck.save_tree(SequenceTree(2, ((0, 1),)))
    ck.save_distances(np.zeros((2, 2)), np.ones((2, 2)))
    ck.save_distance_tile(0, np.zeros((1, 2)), np.ones((1, 2)))
    names = sorted(p.name for p in d.iterdir())
    assert names == ["meta.json"]
