"""Device (JAX) Poseidon vs python-int oracle: bit-exact parity."""

import random

import numpy as np

from imt_tpu.ops import field, poseidon_jax
from imt_tpu.ops.poseidon_ref import generate_params, hash_fixed

rng = random.Random(0x9051D09)
PARAMS = generate_params()

ANCHOR_H000 = 1960587138944869480785025106734196872454309951825657414575195034687326603497


def test_hash3_zero_anchor_on_device():
    z = field.ints_to_limbs([0])
    out = np.asarray(poseidon_jax.hash3(z, z, z))
    assert field.limbs_to_ints(out) == [ANCHOR_H000]


def test_hash2_batch_parity():
    n = 16
    xs = [rng.randrange(field.P) for _ in range(n)]
    ys = [rng.randrange(field.P) for _ in range(n)]
    out = np.asarray(poseidon_jax.hash2(field.ints_to_limbs(xs),
                                        field.ints_to_limbs(ys)))
    got = field.limbs_to_ints(out)
    want = [hash_fixed([x, y], PARAMS) for x, y in zip(xs, ys)]
    assert got == want


def test_hash3_batch_parity():
    n = 16
    trips = [[rng.randrange(field.P) for _ in range(3)] for _ in range(n)]
    out = np.asarray(poseidon_jax.hash3(
        field.ints_to_limbs([t[0] for t in trips]),
        field.ints_to_limbs([t[1] for t in trips]),
        field.ints_to_limbs([t[2] for t in trips])))
    assert field.limbs_to_ints(out) == [hash_fixed(t, PARAMS) for t in trips]


def test_hash_edge_values():
    edges = [0, 1, field.P - 1, field.P - 2, (1 << 128), (1 << 128) - 1]
    n = len(edges)
    a = field.ints_to_limbs(edges)
    b = field.ints_to_limbs(list(reversed(edges)))
    out = field.limbs_to_ints(np.asarray(poseidon_jax.hash2(a, b)))
    want = [hash_fixed([x, y], PARAMS)
            for x, y in zip(edges, reversed(edges))]
    assert out == want
