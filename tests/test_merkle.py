"""Merkle tree: device build/proof/verify vs python oracle (bit-exact)."""

import random

import numpy as np
import pytest

from imt_tpu.ops import field
from imt_tpu.tree.merkle import MerkleTree, compute_root_from_helpers
from imt_tpu.tree.reference_oracle import OracleTree

rng = random.Random(0x7EE)


def rand_leaves(n):
    return [rng.randrange(field.P) for _ in range(n)]


def test_build_matches_oracle():
    leaves = rand_leaves(8)
    tree = MerkleTree.from_ints(leaves)
    oracle = OracleTree(leaves)
    assert tree.get_root_int() == oracle.get_root()
    # every level matches
    for lvl, olvl in zip(tree.levels, oracle.levels):
        assert field.limbs_to_ints(np.asarray(lvl)) == olvl


def test_single_leaf_root_is_leaf():
    leaves = rand_leaves(1)
    tree = MerkleTree.from_ints(leaves)
    assert tree.get_root_int() == leaves[0]


def test_error_contract():
    with pytest.raises(ValueError):
        MerkleTree.from_ints([])
    with pytest.raises(ValueError):
        MerkleTree.from_ints(rand_leaves(3))
    with pytest.raises(ValueError):
        MerkleTree.from_ints(rand_leaves(6))  # reference crashes on this; we reject


def test_proofs_match_oracle_and_verify():
    leaves = rand_leaves(8)
    tree = MerkleTree.from_ints(leaves)
    oracle = OracleTree(leaves)
    indices = [0, 3, 5, 7]
    proofs, helpers = tree.get_proofs(indices)
    for j, idx in enumerate(indices):
        oproof, ohelp = oracle.get_proof(idx)
        assert field.limbs_to_ints(np.asarray(proofs[:, :, j]).T) == oproof
        assert list(np.asarray(helpers[:, j])) == ohelp
    leaf_arr = field.ints_to_limbs([leaves[i] for i in indices])
    ok = tree.verify_proofs(leaf_arr, indices, tree.get_root(), proofs)
    assert ok.all()


def test_verify_rejects_corruption():
    leaves = rand_leaves(8)
    tree = MerkleTree.from_ints(leaves)
    proofs, helpers = tree.get_proofs([2])
    leaf = field.ints_to_limbs([leaves[2]])
    assert tree.verify_proofs(leaf, [2], tree.get_root(), proofs).all()
    # wrong leaf
    bad_leaf = field.ints_to_limbs([leaves[2] ^ 1])
    assert not tree.verify_proofs(bad_leaf, [2], tree.get_root(), proofs).any()
    # wrong index (parity path changes)
    assert not tree.verify_proofs(leaf, [3], tree.get_root(), proofs).any()
    # corrupted sibling
    bad = np.asarray(proofs).copy()
    bad[1, 0, 0] ^= 1
    assert not tree.verify_proofs(leaf, [2], tree.get_root(), bad).any()


def test_root_from_helpers_matches_parity_fold():
    leaves = rand_leaves(8)
    tree = MerkleTree.from_ints(leaves)
    oracle = OracleTree(leaves)
    for idx in [0, 5]:
        proofs, helpers = tree.get_proofs([idx])
        leaf = field.ints_to_limbs([leaves[idx]])
        root = compute_root_from_helpers(leaf, proofs, helpers)
        assert field.limbs_to_int(np.asarray(root)[:, 0]) == oracle.get_root()
