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
