"""Indexed tree: device engine vs python oracle replay of the reference's
insertion sequences, witness parity, verifier predicates, batched inserts."""

import random

import numpy as np
import pytest

import jax.numpy as jnp

from imt_tpu.ops import field
from imt_tpu.tree import indexed
from imt_tpu.tree.indexed import IndexedMerkleTree, InsertWitness
from imt_tpu.tree.reference_oracle import OracleIndexedTree

# The reference's multi-round sequence (src/indexed_merkle_tree.rs:683-690).
REF_SEQUENCE = [30, 10, 20, 5, 50, 35]


def limbs1(a):
    return field.limbs_to_int(np.asarray(a)[:, 0])


def witness_matches_oracle(w: InsertWitness, ow: dict, depth: int) -> None:
    assert bool(w.ok[0]) == ow["ok"]
    assert limbs1(w.old_root) == ow["old_root"]
    assert (limbs1(w.low_leaf_val), limbs1(w.low_leaf_next_val),
            limbs1(w.low_leaf_next_idx)) == ow["low_leaf"]
    assert field.limbs_to_ints(
        np.asarray(w.low_leaf_proof)[:, :, 0].T) == ow["low_leaf_proof"]
    assert list(np.asarray(w.low_leaf_proof_helper)[:, 0]) == \
        ow["low_leaf_proof_helper"]
    assert limbs1(w.new_root) == ow["new_root"]
    assert (limbs1(w.new_leaf_val), limbs1(w.new_leaf_next_val),
            limbs1(w.new_leaf_next_idx)) == ow["new_leaf"]
    assert int(np.asarray(w.new_leaf_index)[0]) == ow["new_leaf_index"]
    assert field.limbs_to_ints(
        np.asarray(w.new_leaf_proof)[:, :, 0].T) == ow["new_leaf_proof"]
    assert list(np.asarray(w.new_leaf_proof_helper)[:, 0]) == \
        ow["new_leaf_proof_helper"]
    assert bool(np.asarray(w.is_new_leaf_largest)[0]) == ow["is_new_leaf_largest"]


def run_insert_leaf_predicate(w: InsertWitness):
    return np.asarray(indexed.insert_leaf(
        w.old_root, w.low_leaf_val, w.low_leaf_next_val, w.low_leaf_next_idx,
        w.low_leaf_proof, w.low_leaf_proof_helper, w.new_root,
        w.new_leaf_val, w.new_leaf_next_val, w.new_leaf_next_idx,
        jnp.asarray(w.new_leaf_index), w.new_leaf_proof,
        w.new_leaf_proof_helper, jnp.asarray(w.is_new_leaf_largest)))


def test_multiround_sequence_parity_and_verification():
    """Replays the reference's 6-round flow: every root, proof, helper and
    flag must match the oracle; every witness must satisfy the insert_leaf
    predicate (the reference's expect_satisfied(true))."""
    depth = 3
    tree = IndexedMerkleTree(depth)
    oracle = OracleIndexedTree(depth)
    assert tree.get_root_int() == oracle.get_root()
    for v in REF_SEQUENCE:
        w = tree.insert(v)
        ow = oracle.insert(v)
        witness_matches_oracle(w, ow, depth)
        assert run_insert_leaf_predicate(w).all()
    # final linked list structure matches
    for i in range(8):
        pre = oracle.preimages[i]
        assert tree.get_leaf_ints(i) == (pre.val, pre.next_val, pre.next_idx)


def test_insert_leaf_predicate_rejects_corruption():
    tree = IndexedMerkleTree(3)
    w = tree.insert(100)
    assert run_insert_leaf_predicate(w).all()

    # wrong new_root
    bad = InsertWitness(**{**w.__dict__})
    bad.new_root = jnp.asarray(field.ints_to_limbs([limbs1(w.new_root) ^ 1]))
    assert not run_insert_leaf_predicate(bad).any()

    # broken pointer inheritance
    bad = InsertWitness(**{**w.__dict__})
    bad.new_leaf_next_val = jnp.asarray(field.ints_to_limbs([12345]))
    assert not run_insert_leaf_predicate(bad).any()

    # wrong low-leaf proof
    bad = InsertWitness(**{**w.__dict__})
    p = np.asarray(w.low_leaf_proof).copy()
    p[0, 0, 0] ^= 1
    bad.low_leaf_proof = jnp.asarray(p)
    assert not run_insert_leaf_predicate(bad).any()

    # is_new_leaf_largest flipped
    bad = InsertWitness(**{**w.__dict__})
    bad.is_new_leaf_largest = jnp.asarray(~np.asarray(w.is_new_leaf_largest))
    assert not run_insert_leaf_predicate(bad).any()


def test_verify_non_inclusion_standalone():
    tree = IndexedMerkleTree(3)
    tree.insert(100)
    tree.insert(300)
    # prove 200 is absent: low leaf is 100 (points at 300)
    root = tree.get_root()
    proof, helpers = tree.get_proof(1)  # slot 1 holds val 100
    v, nv, ni = tree.get_leaf_ints(1)
    args = dict(
        root=root,
        low_leaf_val=jnp.asarray(field.ints_to_limbs([v])),
        low_leaf_next_val=jnp.asarray(field.ints_to_limbs([nv])),
        low_leaf_next_idx=jnp.asarray(field.ints_to_limbs([ni])),
        low_leaf_proof=proof, low_leaf_proof_helper=helpers,
        new_leaf_value=jnp.asarray(field.ints_to_limbs([200])),
        is_new_leaf_largest=jnp.asarray(np.array([False])),
    )
    assert np.asarray(indexed.verify_non_inclusion(**args)).all()
    # a member value (300) cannot be proven absent with this low leaf:
    # 300 < next_val fails (next_val IS 300)
    bad = dict(args, new_leaf_value=jnp.asarray(field.ints_to_limbs([300])))
    assert not np.asarray(indexed.verify_non_inclusion(**bad)).any()
    # wrong root
    bad = dict(args, root=jnp.asarray(field.ints_to_limbs([123])))
    assert not np.asarray(indexed.verify_non_inclusion(**bad)).any()
    # largest-flag abuse: claim 200 largest while next_val != 0
    bad = dict(args, is_new_leaf_largest=jnp.asarray(np.array([True])))
    assert not np.asarray(indexed.verify_non_inclusion(**bad)).any()


def test_duplicate_and_zero_rejected():
    tree = IndexedMerkleTree(3)
    w = tree.insert(42)
    assert w.ok.all()
    root_after = tree.get_root_int()
    w2 = tree.insert(42)  # duplicate
    assert not w2.ok.any()
    assert tree.get_root_int() == root_after  # state unchanged
    w3 = tree.insert(0)  # sentinel value
    assert not w3.ok.any()
    assert tree.get_root_int() == root_after
    assert tree.count == 3  # slots consumed regardless (reference discipline)


def test_insert_batch_matches_sequential():
    seq = IndexedMerkleTree(3)
    for v in REF_SEQUENCE:
        seq.insert(v)
    bat = IndexedMerkleTree(3)
    ok = bat.insert_batch(REF_SEQUENCE)
    assert ok.all()
    assert bat.get_root_int() == seq.get_root_int()
    for i in range(8):
        assert bat.get_leaf_ints(i) == seq.get_leaf_ints(i)


def test_insert_batch_with_rejects_matches_sequential():
    values = [30, 10, 30, 0, 50, 7]  # dup of batch element + zero
    seq = IndexedMerkleTree(3)
    seq_ok = [bool(seq.insert(v).ok[0]) for v in values]
    bat = IndexedMerkleTree(3)
    ok = bat.insert_batch(values)
    assert list(ok) == seq_ok == [True, True, False, False, True, True]
    assert bat.get_root_int() == seq.get_root_int()


def test_insert_batch_duplicate_of_existing_rejected():
    tree = IndexedMerkleTree(3)
    tree.insert(10)
    # K=6 reuses the (depth,K) compile of the other batch tests
    ok = tree.insert_batch([5, 10, 20, 31, 32, 33])
    assert list(ok) == [True, False, True, True, True, True]


def test_random_sequences_match_oracle():
    # Distinct values only: on duplicates the reference planner corrupts the
    # list through empty slots (documented divergence; we reject instead).
    rng = random.Random(1234)
    depth = 3
    tree = IndexedMerkleTree(depth)
    oracle = OracleIndexedTree(depth)
    vals = list({rng.randrange(1, field.P) for _ in range(6)})
    for v in vals:
        w = tree.insert(v)
        ow = oracle.insert(v)
        assert bool(w.ok[0]) == ow["ok"] is True
        assert tree.get_root_int() == oracle.get_root()


def test_serialization_roundtrip():
    tree = IndexedMerkleTree(3)
    tree.insert_batch([9, 4, 77, 81, 2, 55])
    arrays = tree.to_arrays()
    restored = IndexedMerkleTree.from_arrays(arrays)
    assert restored.get_root_int() == tree.get_root_int()
    assert restored.count == tree.count
    w = restored.insert(50)
    w2 = tree.insert(50)
    assert restored.get_root_int() == tree.get_root_int()


def test_tree_full():
    tree = IndexedMerkleTree(3)  # 8 slots: sentinel + 7
    for v in range(1, 8):
        tree.insert(v)
    with pytest.raises(ValueError):
        tree.insert(8)


def test_bare_insert_footgun_warning():
    """>_BARE_INSERT_WARN_AT bare insert() calls fire ONE RuntimeWarning
    nudging to insert_seq (config 3's 207/s vs 67.7K/s — README throughput
    note)."""
    import warnings

    from imt_tpu.tree import indexed as mod

    saved = mod._bare_insert_calls
    try:
        mod._bare_insert_calls = 0
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            for _ in range(mod._BARE_INSERT_WARN_AT):
                mod._count_bare_insert()
            assert not rec, "warned too early"
            mod._count_bare_insert()          # threshold+1 fires
            assert len(rec) == 1
            assert issubclass(rec[0].category, RuntimeWarning)
            assert "insert_seq" in str(rec[0].message)
            mod._count_bare_insert()          # no repeat
            assert len(rec) == 1
    finally:
        mod._bare_insert_calls = saved
