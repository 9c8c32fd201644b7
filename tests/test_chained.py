"""Scan-chained dispatch APIs: insert_seq / insert_batches must be
bit-identical to their per-call equivalents (they only move the host/RPC
boundary — sequential semantics per reference
src/indexed_merkle_tree.rs:710-802 are unchanged)."""

import random

import numpy as np

from imt_tpu.ops import field
from imt_tpu.tree.indexed import IndexedMerkleTree
from imt_tpu.tree.sparse import SparseIndexedMerkleTree

WITNESS_FIELDS = [
    "old_root", "low_leaf_val", "low_leaf_next_val", "low_leaf_next_idx",
    "low_leaf_proof", "low_leaf_proof_helper", "new_root", "new_leaf_val",
    "new_leaf_next_val", "new_leaf_next_idx", "new_leaf_index",
    "new_leaf_proof", "new_leaf_proof_helper", "is_new_leaf_largest",
]


def test_insert_seq_matches_sequential_inserts():
    rng = random.Random(0xC0DE)
    vals = [30, 10, 20, 5, 50, 35, 10,            # incl. duplicate + zero
            0, rng.randrange(1, field.P)]
    a, b = IndexedMerkleTree(5), IndexedMerkleTree(5)
    w = a.insert_seq(vals)
    singles = [b.insert(v) for v in vals]
    assert w.ok.tolist() == [bool(s.ok.all()) for s in singles]
    assert a.get_root_int() == b.get_root_int()
    for i, s in enumerate(singles):
        if not w.ok[i]:
            continue
        for f in WITNESS_FIELDS:
            got = np.asarray(getattr(w, f))[..., i]
            want = np.asarray(getattr(s, f))[..., 0]
            assert (got == want).all(), (f, i)


def test_insert_seq_sparse_full_depth_and_growth():
    vals = [30, 10, 20, 5, 50, 35]
    sp = SparseIndexedMerkleTree(24, initial_capacity_log2=2)  # forces growth
    ref = SparseIndexedMerkleTree(24, initial_capacity_log2=2)
    wsp = sp.insert_seq(vals)
    singles = [ref.insert(v) for v in vals]
    assert wsp.ok.tolist() == [True] * 6
    # full-depth witnesses: sparse proofs extend over the zero spine
    assert wsp.new_leaf_proof.shape[0] == 24
    assert sp.get_root_int() == ref.get_root_int()
    # per-insert witness parity vs the per-call sequential path
    for i, s in enumerate(singles):
        for f in WITNESS_FIELDS:
            got = np.asarray(getattr(wsp, f))[..., i]
            want = np.asarray(getattr(s, f))[..., 0]
            assert (got == want).all(), (f, i)
    # chained-seq witnesses verify under the insert_leaf predicate
    from imt_tpu.tree.indexed import check_insert_witness
    check_insert_witness(wsp)


def test_insert_batches_matches_insert_batch():
    rng = random.Random(0xBA7C)
    batches = [[rng.randrange(1, 1 << 250) for _ in range(8)]
               for _ in range(3)]
    batches[1][3] = batches[0][2]                 # cross-batch duplicate
    batches[2][0] = batches[2][1]                 # intra-batch duplicate
    a, b = IndexedMerkleTree(7), IndexedMerkleTree(7)
    oks = a.insert_batches(batches)
    assert oks.shape == (3, 8)
    want = [b.insert_batch(v) for v in batches]
    assert (oks == np.stack(want)).all()
    assert a.get_root_int() == b.get_root_int()
    assert a.count == b.count

    # sparse (with growth) agrees too, via packed [B, 16, K] input
    sp = SparseIndexedMerkleTree(24, initial_capacity_log2=2)
    arr = np.stack([np.asarray(field.ints_to_limbs(v)) for v in batches])
    oks_sp = sp.insert_batches(arr)
    assert (oks_sp == oks).all()
