"""C++ native oracle vs python-int oracle: bit-exact, plus bulk property
fuzzing (the role the reference's 10M-iteration native test plays —
src/indexed_merkle_tree.rs:597-630 — at C++ speed)."""

import random

import numpy as np
import pytest

from imt_tpu.ops import field
from imt_tpu.ops.poseidon_ref import generate_params, hash_fixed
from imt_tpu.tree.reference_oracle import OracleTree

native = pytest.importorskip("imt_tpu.native.oracle")

PARAMS = generate_params()
ANCHOR = 1960587138944869480785025106734196872454309951825657414575195034687326603497
rng = random.Random(0xCC)


def test_hash_zero_anchor():
    assert native.hash3([0], [0], [0]) == [ANCHOR]


def test_hash2_parity():
    xs = [rng.randrange(field.P) for _ in range(32)]
    ys = [rng.randrange(field.P) for _ in range(32)]
    assert native.hash2(xs, ys) == [hash_fixed([x, y], PARAMS)
                                    for x, y in zip(xs, ys)]


def test_hash3_parity():
    xs = [rng.randrange(field.P) for _ in range(16)]
    ys = [rng.randrange(field.P) for _ in range(16)]
    zs = [rng.randrange(field.P) for _ in range(16)]
    assert native.hash3(xs, ys, zs) == [hash_fixed([x, y, z], PARAMS)
                                        for x, y, z in zip(xs, ys, zs)]


def test_field_ops_bulk():
    n = 5000
    xs = [rng.randrange(field.P) for _ in range(n)]
    ys = [rng.randrange(field.P) for _ in range(n)]
    muls = native.mul_mod(xs, ys)
    adds = native.add_mod(xs, ys)
    for i in range(0, n, 503):  # spot-check against python ints
        assert muls[i] == xs[i] * ys[i] % field.P
        assert adds[i] == (xs[i] + ys[i]) % field.P
    # edge cases
    assert native.mul_mod([field.P - 1], [field.P - 1]) == [1]
    assert native.add_mod([field.P - 1], [1]) == [0]
    assert native.mul_mod([0], [123]) == [0]


def test_tree_build_parity():
    leaves = [rng.randrange(field.P) for _ in range(8)]
    flat = native.tree_build(leaves)
    oracle = OracleTree(leaves)
    expect = [x for lvl in oracle.levels for x in lvl]
    assert flat == expect


# --- native indexed tree (C++ L2 runtime) ------------------------------------

def test_native_indexed_vs_python_oracle():
    """Roots, witnesses, proofs, planner decisions — vs OracleIndexedTree over
    the reference's 6-round sequence then a random mixed workload."""
    from imt_tpu.tree.reference_oracle import OracleIndexedTree

    nat = native.NativeIndexedTree(4)
    ora = OracleIndexedTree(4)
    assert nat.get_root() == ora.get_root()   # all-empty root

    for v in [30, 10, 20, 5, 50, 35]:         # reference :683-690
        wn = nat.insert(v)
        wo = ora.insert(v)
        assert wn["ok"] and wo["ok"]
        for k in ("old_root", "new_root", "low_leaf", "new_leaf",
                  "low_leaf_proof", "new_leaf_proof",
                  "low_leaf_proof_helper", "new_leaf_proof_helper",
                  "new_leaf_index", "is_new_leaf_largest"):
            assert wn[k] == wo[k], (v, k)
        assert nat.get_root() == ora.get_root()

    # duplicate and zero are rejected but consume the slot (engine semantics)
    before = nat.get_root()
    w = nat.insert(20)
    assert not w["ok"] and nat.get_root() == before
    assert w["old_root"] == w["new_root"] == before
    w = nat.insert(0)
    assert not w["ok"] and nat.get_root() == before
    assert nat.count == 8

    # leaf accessors agree
    for i in range(7):
        assert nat.get_leaf_ints(i) == (
            ora.preimages[i].val, ora.preimages[i].next_val,
            ora.preimages[i].next_idx)


def test_native_indexed_vs_engine():
    """Roots + acceptance vs the JAX engine over a random adversarial batch."""
    from imt_tpu.tree.indexed import IndexedMerkleTree

    nat = native.NativeIndexedTree(5)
    eng = IndexedMerkleTree(5)
    vals = [7, field.P - 1, 7, 0, 12345, 1, 12346, 12344]
    ok_n = nat.insert_batch(vals)
    ok_e = eng.insert_batch(vals)
    assert ok_n.tolist() == ok_e.tolist()
    assert nat.get_root() == eng.get_root_int()
    # proofs from the native tree verify against the engine's tree
    proof, helpers = nat.get_proof(3)
    ep, eh = eng.get_proof(3)
    assert [field.limbs_to_int(np.asarray(ep)[i, :, 0])
            for i in range(eng.tree_depth)] == proof
    assert np.asarray(eh)[:, 0].tolist() == helpers


def test_native_indexed_full_guard():
    nat = native.NativeIndexedTree(2)
    nat.insert(5)
    nat.insert(9)
    nat.insert(11)                # slot 3, the last one (slot 0 is the sentinel)
    with pytest.raises(ValueError):
        nat.insert(13)            # count+1 == n: full
    with pytest.raises(ValueError):
        native.NativeIndexedTree(3).insert_batch(list(range(1, 9)))
