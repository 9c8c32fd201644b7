"""Standalone non-membership witnesses + verify (reference's public
verify_non_inclusion entry, src/indexed_merkle_tree.rs:127)."""

import random

import numpy as np

from imt_tpu.ops import field
from imt_tpu.tree.indexed import IndexedMerkleTree, verify_non_inclusion
from imt_tpu.tree.sparse import SparseIndexedMerkleTree

rng = random.Random(0xD00D)


def _verify(w, values):
    q = field.ints_to_limbs([int(v) for v in values])
    return np.asarray(verify_non_inclusion(
        w.root, w.low_leaf_val, w.low_leaf_next_val, w.low_leaf_next_idx,
        w.low_leaf_proof, w.low_leaf_proof_helper, q, w.is_new_leaf_largest))


def test_non_inclusion_witness_verifies():
    t = IndexedMerkleTree(depth=4)
    present = [50, 10, 30]
    t.insert_batch(present)
    absent = [5, 20, 40, 60, field.P - 1]
    w = t.non_inclusion_witness(absent)
    assert w.ok.all()
    assert _verify(w, absent).all()


def test_non_inclusion_rejects_present_values():
    t = IndexedMerkleTree(depth=4)
    t.insert_batch([50, 10, 30])
    w = t.non_inclusion_witness([10, 50])
    assert not w.ok.any()          # no low leaf exists for a present value


def test_non_inclusion_wrong_value_fails_verify():
    t = IndexedMerkleTree(depth=4)
    t.insert_batch([50, 10, 30])
    w = t.non_inclusion_witness([20])
    # verifying a *different* value against the witness for 20 must fail
    # (40 is outside (10, 30), 15 is inside so it passes with the same low leaf)
    assert not _verify(w, [40]).any()
    # corrupt the proof: must fail
    bad = np.array(w.low_leaf_proof).copy()
    bad[0, 0, 0] ^= 1
    import jax.numpy as jnp
    ok = verify_non_inclusion(
        w.root, w.low_leaf_val, w.low_leaf_next_val, w.low_leaf_next_idx,
        jnp.asarray(bad), w.low_leaf_proof_helper,
        field.ints_to_limbs([20]), w.is_new_leaf_largest)
    assert not np.asarray(ok).any()


def test_non_inclusion_sparse_full_depth():
    t = SparseIndexedMerkleTree(depth=16, initial_capacity_log2=2)
    t.insert_batch([100, 7, 3000])
    absent = [50, 2999, 2**200]
    w = t.non_inclusion_witness(absent)
    assert w.ok.all()
    assert w.low_leaf_proof.shape[0] == 16      # full-depth proof
    assert _verify(w, absent).all()
    # root must equal the tree's full-depth root on every lane
    root_int = t.get_root_int()
    assert field.limbs_to_int(np.asarray(w.root)[:, 0]) == root_int


def test_non_inclusion_wide_tree_and_adjacent_values():
    """Depth-13 tree (the former [N, K] mask formulation would materialize
    16*8192*K lanes here) + adversarial adjacency: queries equal to,
    one-below and one-above existing values, duplicates in the query batch,
    and zero."""
    import random

    rng = random.Random(3)
    t = IndexedMerkleTree(depth=13)
    vals = sorted(rng.randrange(2, 1 << 253) for _ in range(500))
    t.insert_batch(vals)
    queries = [vals[0] - 1, vals[0], vals[0] + 1,
               vals[250], vals[250] + 1, vals[250] + 1,
               vals[-1], vals[-1] + 1, 0, 1]
    expect_ok = [True, False, vals[0] + 1 != vals[1],
                 False, vals[250] + 1 != vals[251],
                 vals[250] + 1 != vals[251],
                 False, True, False, True]
    w = t.non_inclusion_witness(queries)
    assert w.ok.tolist() == expect_ok
    lanes = [i for i, e in enumerate(expect_ok) if e]
    ok = _verify(w, queries)
    assert np.asarray(ok)[lanes].all()
