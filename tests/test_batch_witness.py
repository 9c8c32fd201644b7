"""Witness-producing insert_batch: bit-parity with sequential insertion.

The reference generates insert_leaf witnesses by strictly sequential host
insertion (src/indexed_merkle_tree.rs:710-802); the batched path must emit
the SAME bundles (accepted lanes) from one jitted level-synchronous program,
and the whole batch must satisfy the insert_leaf predicate in one call.
"""

import random

import numpy as np
import pytest

import jax

from imt_tpu.ops import field
from imt_tpu.tree import indexed
from imt_tpu.tree.sparse import SparseIndexedMerkleTree

FIELDS = [
    "old_root", "low_leaf_val", "low_leaf_next_val", "low_leaf_next_idx",
    "low_leaf_proof", "low_leaf_proof_helper", "new_root", "new_leaf_val",
    "new_leaf_next_val", "new_leaf_next_idx", "new_leaf_index",
    "new_leaf_proof", "new_leaf_proof_helper", "is_new_leaf_largest",
]


def _sequential_witnesses(depth, values, sparse=False, full_depth=None):
    t = (SparseIndexedMerkleTree(full_depth, initial_capacity_log2=depth)
         if sparse else indexed.IndexedMerkleTree(depth))
    return t, [t.insert(v) for v in values]


def _assert_lane_parity(wb, seq_ws, lanes=None):
    lanes = lanes if lanes is not None else range(len(seq_ws))
    for i in lanes:
        ws = seq_ws[i]
        for f in FIELDS:
            got = np.asarray(getattr(wb, f))[..., i]
            want = np.asarray(getattr(ws, f))[..., 0]
            assert (got == want).all(), (
                f"lane {i} field {f}:\n got {got}\nwant {want}")


def _verify_batch(wb, ok_lanes):
    verify = jax.jit(indexed.insert_leaf)
    got = np.asarray(verify(
        wb.old_root, wb.low_leaf_val, wb.low_leaf_next_val,
        wb.low_leaf_next_idx, wb.low_leaf_proof, wb.low_leaf_proof_helper,
        wb.new_root, wb.new_leaf_val, wb.new_leaf_next_val,
        wb.new_leaf_next_idx, np.asarray(wb.new_leaf_index),
        wb.new_leaf_proof, wb.new_leaf_proof_helper,
        np.asarray(wb.is_new_leaf_largest)))
    assert (got[ok_lanes]).all(), "insert_leaf predicate rejected a witness"


def test_reference_sequence_batched_witness():
    """The reference 6-round sequence [30,10,20,5,50,35] in ONE batch:
    witnesses must equal the sequential ones bit-for-bit, every lane must
    satisfy the insert_leaf predicate in one jitted call, and the final
    tree state must match."""
    vals = [30, 10, 20, 5, 50, 35]
    t_seq, seq_ws = _sequential_witnesses(3, vals)
    t_b = indexed.IndexedMerkleTree(3)
    wb = t_b.insert_batch(vals, witness=True)
    assert wb.ok.all()
    assert all(w.ok.all() for w in seq_ws)
    _assert_lane_parity(wb, seq_ws)
    _verify_batch(wb, np.arange(6))
    assert t_b.get_root_int() == t_seq.get_root_int()
    for s in range(1 << 3):
        assert t_b.get_leaf_ints(s) == t_seq.get_leaf_ints(s)


def test_random_batch_with_intra_batch_chains():
    """Random 254-bit values plus adjacent pairs (forcing intra-batch
    low-leaf chains where insert i's low leaf was inserted at step j < i)."""
    rng = random.Random(0xC0FFEE)
    base = [rng.randrange(1, 1 << 253) for _ in range(6)]
    vals = []
    for b in base:
        vals.extend([b, b + 1])          # b+1's low leaf is b, same batch
    t_seq, seq_ws = _sequential_witnesses(5, vals)
    t_b = indexed.IndexedMerkleTree(5)
    wb = t_b.insert_batch(vals, witness=True)
    assert wb.ok.all()
    _assert_lane_parity(wb, seq_ws)
    _verify_batch(wb, np.arange(len(vals)))
    assert t_b.get_root_int() == t_seq.get_root_int()


def test_rejected_lanes_and_pre_existing_state():
    """Duplicates (intra-batch and vs pre-existing leaves) and zero are
    rejected exactly as sequentially; accepted lanes keep bit-parity."""
    pre = [100, 7]
    vals = [50, 50, 7, 0, 120, 119]      # dup-in-batch, dup-existing, zero
    t_seq = indexed.IndexedMerkleTree(4)
    for v in pre:
        t_seq.insert(v)
    seq_ws = [t_seq.insert(v) for v in vals]
    t_b = indexed.IndexedMerkleTree(4)
    for v in pre:
        t_b.insert(v)
    wb = t_b.insert_batch(vals, witness=True)
    want_ok = [bool(w.ok.all()) for w in seq_ws]
    assert list(wb.ok) == want_ok == [True, False, False, False, True, True]
    lanes = [i for i, o in enumerate(want_ok) if o]
    _assert_lane_parity(wb, seq_ws, lanes)
    _verify_batch(wb, np.asarray(lanes))
    assert t_b.get_root_int() == t_seq.get_root_int()


def test_sparse_full_depth_witnesses():
    """Sparse-prefix tree (full depth 32, small active prefix): batched
    witnesses carry full-depth proofs/roots and match sequential sparse."""
    vals = [30, 10, 20, 5, 50, 35]
    t_seq, seq_ws = _sequential_witnesses(3, vals, sparse=True,
                                          full_depth=32)
    t_b = SparseIndexedMerkleTree(32, initial_capacity_log2=3)
    wb = t_b.insert_batch(vals, witness=True)
    assert wb.ok.all()
    assert wb.low_leaf_proof.shape[0] == 32
    _assert_lane_parity(wb, seq_ws)
    _verify_batch(wb, np.arange(6))
    assert t_b.get_root_int() == t_seq.get_root_int()


def test_single_element_batch_equals_insert():
    t_seq, seq_ws = _sequential_witnesses(3, [42])
    t_b = indexed.IndexedMerkleTree(3)
    wb = t_b.insert_batch([42], witness=True)
    assert wb.ok.all()
    _assert_lane_parity(wb, seq_ws)
    assert t_b.get_root_int() == t_seq.get_root_int()


def test_debug_witness_fail_fast():
    """IMT_DEBUG_WITNESS mode: good witnesses pass silently; a corrupted
    bundle raises (the reference's prover-side assert_eq! discipline,
    src/indexed_merkle_tree.rs:158-167)."""
    indexed.set_debug_witness(True)
    try:
        t = indexed.IndexedMerkleTree(3)
        w = t.insert(7)                                  # checked, passes
        wb = t.insert_batch([9, 11], witness=True)       # checked, passes
        t.non_inclusion_witness([8])                     # checked, passes
        # corrupt: claim a different new_root on an accepted lane
        import dataclasses
        bad = dataclasses.replace(
            wb, new_root=np.asarray(wb.new_root) ^ 1)
        with pytest.raises(AssertionError, match="inconsistency"):
            indexed.check_insert_witness(bad)
    finally:
        indexed.set_debug_witness(False)
