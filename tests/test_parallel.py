"""Sharded paths on the virtual 8-device CPU mesh: bit-exact vs single-device."""

import random

import numpy as np

import jax

from imt_tpu.ops import field, poseidon_jax
from imt_tpu.parallel import sharded
from imt_tpu.tree.merkle import MerkleTree

rng = random.Random(0x5A4D)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_hash_matches_single_device():
    mesh = sharded.make_mesh(8)
    n = 64
    xs = field.ints_to_limbs([rng.randrange(field.P) for _ in range(n)])
    ys = field.ints_to_limbs([rng.randrange(field.P) for _ in range(n)])
    got = np.asarray(sharded.sharded_hash2(xs, ys, mesh))
    want = np.asarray(poseidon_jax.hash2(xs, ys))
    assert (got == want).all()


def test_sharded_tree_root_matches_single_device():
    mesh = sharded.make_mesh(8)
    leaves = [rng.randrange(field.P) for _ in range(64)]
    arr = field.ints_to_limbs(leaves)
    root = np.asarray(sharded.sharded_root(arr, mesh))
    single = MerkleTree.build(arr)
    assert field.limbs_to_int(root[:, 0]) == single.get_root_int()


def test_sharded_tree_root_smaller_mesh():
    mesh = sharded.make_mesh(4)
    leaves = [rng.randrange(field.P) for _ in range(32)]
    arr = field.ints_to_limbs(leaves)
    root = np.asarray(sharded.sharded_root(arr, mesh))
    assert field.limbs_to_int(root[:, 0]) == MerkleTree.build(arr).get_root_int()
