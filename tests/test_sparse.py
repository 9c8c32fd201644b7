"""Sparse-prefix tree: parity with the dense tree and depth-32 capability."""

import random

import numpy as np

from imt_tpu.ops import field
from imt_tpu.ops.poseidon_ref import generate_params, hash_fixed
from imt_tpu.tree.indexed import IndexedMerkleTree, insert_leaf
from imt_tpu.tree.sparse import SparseIndexedMerkleTree

rng = random.Random(0x5EED)
PARAMS = generate_params()


def test_sparse_matches_dense_sequential():
    dense = IndexedMerkleTree(depth=4)
    sparse = SparseIndexedMerkleTree(depth=4, initial_capacity_log2=2)
    for v in [30, 10, 20, 5, 50, 35]:  # reference sequence (:683-690)
        wd = dense.insert(v)
        ws = sparse.insert(v)
        assert dense.get_root_int() == sparse.get_root_int(), v
        # witnesses agree field-for-field (full-depth proofs both)
        assert (np.asarray(wd.new_root) == np.asarray(ws.new_root)).all()
        assert (np.asarray(wd.low_leaf_proof)
                == np.asarray(ws.low_leaf_proof)).all()
        assert (np.asarray(wd.new_leaf_proof_helper)
                == np.asarray(ws.new_leaf_proof_helper)).all()


def test_sparse_matches_dense_batched():
    dense = IndexedMerkleTree(depth=5)
    sparse = SparseIndexedMerkleTree(depth=5, initial_capacity_log2=2)
    vals = [rng.randrange(1, field.P) for _ in range(12)] + [0, 7, 7]
    okd = dense.insert_batch(vals)
    oks = sparse.insert_batch(vals)
    assert (okd == oks).all()
    assert dense.get_root_int() == sparse.get_root_int()


def test_sparse_witness_verifies():
    """Full-depth witnesses from the sparse tree satisfy the insert_leaf
    predicate (the reference chip's constraints)."""
    t = SparseIndexedMerkleTree(depth=8, initial_capacity_log2=2)
    for v in [99, 5, 2**200, 42]:
        w = t.insert(v)
        assert bool(w.ok.all())
        ok = insert_leaf(
            w.old_root, w.low_leaf_val, w.low_leaf_next_val,
            w.low_leaf_next_idx, w.low_leaf_proof, w.low_leaf_proof_helper,
            w.new_root, w.new_leaf_val, w.new_leaf_next_val,
            w.new_leaf_next_idx, w.new_leaf_index, w.new_leaf_proof,
            w.new_leaf_proof_helper, w.is_new_leaf_largest)
        assert bool(np.asarray(ok).all()), v


def test_sparse_depth32():
    """Depth-32 tree (dense would be 2^32 leaves): root equals the python
    fold of the active prefix with the zero-subtree spine."""
    t = SparseIndexedMerkleTree(depth=32, initial_capacity_log2=2)
    vals = [rng.randrange(1, field.P) for _ in range(5)]
    ok = t.insert_batch(vals)
    assert ok.all()

    # expected root in pure python: hash active leaves, fold up 32 levels
    leaves = []
    n_active = t.vals.shape[1]
    for i in range(n_active):
        leaves.append(hash_fixed(list(t.get_leaf_ints(i)), PARAMS))
    level = leaves
    depth_active = n_active.bit_length() - 1
    for _ in range(depth_active):
        level = [hash_fixed([level[i], level[i + 1]], PARAMS)
                 for i in range(0, len(level), 2)]
    root = level[0]
    zero = hash_fixed([0, 0, 0], PARAMS)
    zlevels = [zero]
    for _ in range(32):
        zlevels.append(hash_fixed([zlevels[-1], zlevels[-1]], PARAMS))
    for d in range(depth_active, 32):
        root = hash_fixed([root, zlevels[d]], PARAMS)
    assert t.get_root_int() == root


def test_sparse_growth_and_checkpoint():
    import os
    import tempfile

    from imt_tpu.utils import checkpoint

    t = SparseIndexedMerkleTree(depth=10, initial_capacity_log2=1)
    vals = [rng.randrange(1, field.P) for _ in range(40)]
    t.insert_batch(vals)            # forces several capacity doublings
    r = t.get_root_int()
    t2 = SparseIndexedMerkleTree.from_arrays(t.to_arrays())
    assert t2.get_root_int() == r
    t2.insert(123456789)
    t.insert(123456789)
    assert t2.get_root_int() == t.get_root_int()
    # utils.checkpoint dispatches on the sparse marker
    path = os.path.join(tempfile.mkdtemp(), "sparse.npz")
    checkpoint.save(t, path)
    t3 = checkpoint.load(path)
    assert isinstance(t3, SparseIndexedMerkleTree)
    assert t3.get_root_int() == t.get_root_int()


def test_insert_device_resident_witness():
    """insert(as_numpy=False) keeps the witness on device (no host sync)
    and produces the identical tree state as the default path."""
    import jax.numpy as jnp

    a = SparseIndexedMerkleTree(depth=8, initial_capacity_log2=2)
    b = SparseIndexedMerkleTree(depth=8, initial_capacity_log2=2)
    last = None
    for v in [30, 10, 20, 5, 50, 35]:
        last = a.insert(v, as_numpy=False)
        b.insert(v)
    assert isinstance(last.ok, jnp.ndarray)
    assert bool(np.asarray(last.ok)[0])
    assert a.get_root_int() == b.get_root_int()
    # duplicate still rejected through the device-resident path
    w = a.insert(20, as_numpy=False)
    assert not bool(np.asarray(w.ok)[0])
    assert a.get_root_int() == b.get_root_int()


def test_sparse_proof_api_symmetry():
    """get_proof / verify_proof / packed+device non_inclusion_witness on the
    sparse tree (API parity with IndexedMerkleTree — full-depth proofs)."""
    import jax.numpy as jnp
    from imt_tpu.ops import field, hashing
    from imt_tpu.tree.sparse import SparseIndexedMerkleTree

    t = SparseIndexedMerkleTree(20, initial_capacity_log2=3)
    for v in [30, 10, 20]:
        t.insert(v)
    proof, helpers = t.get_proof(1)
    assert proof.shape == (20, field.LIMBS, 1)
    assert helpers.shape == (20, 1)
    leaf = hashing.dec_nodes(t.levels[0])[:, 1:2]
    root = t.get_root()
    assert t.verify_proof(leaf, 1, root, proof)
    # corrupted proof must fail
    bad = proof.at[3, 0, 0].set(proof[3, 0, 0] + 1)
    assert not t.verify_proof(leaf, 1, root, bad)

    # packed limb queries + device-resident witness
    qs = jnp.asarray(field.ints_to_limbs([15, 30]))
    w = t.non_inclusion_witness(qs, as_numpy=False)
    import numpy as np
    assert list(np.asarray(w.ok)) == [True, False]
    assert w.low_leaf_proof.shape[0] == 20
