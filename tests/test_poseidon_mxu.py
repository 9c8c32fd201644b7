"""f32-digit field (MXU path) + PoseidonMXU engine: bit-exact parity."""

import random

import numpy as np

import jax.numpy as jnp

from imt_tpu.ops import field, field_f32 as ff
from imt_tpu.ops.poseidon_mxu import PoseidonMXU
from imt_tpu.ops.poseidon_ref import generate_params, hash_fixed

rng = random.Random(0xF32)
PARAMS = generate_params()
ANCHOR = 1960587138944869480785025106734196872454309951825657414575195034687326603497


def to_dig(xs):
    return jnp.asarray(np.stack([ff.int_to_digits(x) for x in xs], axis=1))


def from_dig(d):
    d = np.asarray(d)
    return [ff.digits_to_int(d[:, j]) for j in range(d.shape[1])]


def test_f32_mont_mul_parity():
    n = 48
    xs = [rng.randrange(field.P) for _ in range(n)] + [field.P - 1, 0, 1]
    ys = [rng.randrange(field.P) for _ in range(n)] + [field.P - 1, 5, 1]
    a = to_dig([(x * field.R) % field.P for x in xs])
    b = to_dig([(y * field.R) % field.P for y in ys])
    got = from_dig(ff.normalize_final(ff.mont_mul(a, b)))
    assert got == [(x * y * field.R) % field.P for x, y in zip(xs, ys)]


def test_f32_add_parity():
    xs = [rng.randrange(field.P) for _ in range(32)] + [field.P - 1]
    ys = [rng.randrange(field.P) for _ in range(32)] + [field.P - 1]
    got = from_dig(ff.normalize_final(ff.add_mod(to_dig(xs), to_dig(ys))))
    assert got == [(x + y) % field.P for x, y in zip(xs, ys)]


def test_limb_digit_conversions():
    xs = [rng.randrange(field.P) for _ in range(16)] + [0, field.P - 1]
    limbs = jnp.asarray(field.ints_to_limbs(xs))
    back = np.asarray(ff.digits_to_limbs(ff.limbs_to_digits(limbs)))
    assert (back == np.asarray(limbs)).all()


def test_mxu_engine_anchor_and_parity():
    eng = PoseidonMXU()
    z = jnp.asarray(field.ints_to_limbs([0] * 4))
    assert set(field.limbs_to_ints(np.asarray(eng.hash3(z, z, z)))) == {ANCHOR}

    xs = [rng.randrange(field.P) for _ in range(8)]
    ys = [rng.randrange(field.P) for _ in range(8)]
    h2 = field.limbs_to_ints(np.asarray(eng.hash2(
        jnp.asarray(field.ints_to_limbs(xs)), jnp.asarray(field.ints_to_limbs(ys)))))
    assert h2 == [hash_fixed([x, y], PARAMS) for x, y in zip(xs, ys)]

    zs = [rng.randrange(field.P) for _ in range(8)]
    h3 = field.limbs_to_ints(np.asarray(eng.hash3(
        jnp.asarray(field.ints_to_limbs(xs)), jnp.asarray(field.ints_to_limbs(ys)),
        jnp.asarray(field.ints_to_limbs(zs)))))
    assert h3 == [hash_fixed([x, y, z], PARAMS) for x, y, z in zip(xs, ys, zs)]
