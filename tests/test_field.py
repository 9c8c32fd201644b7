"""Field-core parity tests: JAX limb arithmetic vs python-int ground truth.

Mirrors the reference's property-testing discipline (test_limbs_logic,
src/indexed_merkle_tree.rs:597-630) including the equal-limb edge cases its
random-only loop could never hit (and whose `a_r == b_q` typo at :617 we fix).
"""

import random

import numpy as np
import pytest

from imt_tpu.ops import field

rng = random.Random(0xF1E1D)


def rand_fe():
    return rng.randrange(field.P)


def roundtrip(x):
    return field.limbs_to_int(field.int_to_limbs(x))


def test_conversion_roundtrip():
    for x in [0, 1, field.P - 1, (1 << 254) - 1, rand_fe()]:
        assert roundtrip(x) == x % field.P


def test_mont_mul_parity():
    n = 64
    xs = [rand_fe() for _ in range(n)]
    ys = [rand_fe() for _ in range(n)]
    a = field.ints_to_limbs([(x * field.R) % field.P for x in xs])
    b = field.ints_to_limbs([(y * field.R) % field.P for y in ys])
    out = field.normalize(field.mont_mul(a, b))
    got = field.limbs_to_ints(np.asarray(out))
    want = [(x * y * field.R) % field.P for x, y in zip(xs, ys)]
    assert got == want


def test_mont_roundtrip_and_identity():
    xs = [0, 1, 2, field.P - 1, rand_fe(), rand_fe()]
    a = field.ints_to_limbs(xs)
    back = field.normalize(field.from_mont(field.to_mont(a)))
    assert field.limbs_to_ints(np.asarray(back)) == xs


def test_add_sub_parity():
    n = 32
    xs = [rand_fe() for _ in range(n)] + [field.P - 1, field.P - 1, 0]
    ys = [rand_fe() for _ in range(n)] + [field.P - 1, 1, 0]
    a, b = field.ints_to_limbs(xs), field.ints_to_limbs(ys)
    s = field.limbs_to_ints(np.asarray(field.normalize(field.add_mod(a, b))))
    d = field.limbs_to_ints(np.asarray(field.normalize(field.sub_mod(a, b))))
    assert s == [(x + y) % field.P for x, y in zip(xs, ys)]
    assert d == [(x - y) % field.P for x, y in zip(xs, ys)]


def test_add_chain_stays_reduced():
    # repeated additions must never escape the <2p invariant
    xs = [field.P - 1] * 8
    a = field.ints_to_limbs(xs)
    acc = a
    for _ in range(5):
        acc = field.add_mod(acc, a)
    got = field.limbs_to_ints(np.asarray(field.normalize(acc)))
    assert got == [(6 * (field.P - 1)) % field.P] * 8


def test_less_than_including_equal_limb_edges():
    # Deliberate edge cases: equal high limbs, equal low limbs, full equality —
    # the classes the reference's random-only test never exercises.
    pow128 = 1 << 128
    cases = [
        (5, 7), (7, 5), (5, 5),
        (3 * pow128 + 10, 3 * pow128 + 11),        # equal high, low decides
        (3 * pow128 + 11, 3 * pow128 + 10),
        (2 * pow128 + 9, 5 * pow128 + 1),          # high decides against low
        (5 * pow128 + 1, 2 * pow128 + 9),
        (field.P - 1, field.P - 2), (0, field.P - 1),
    ]
    for _ in range(200):
        cases.append((rng.getrandbits(254) % field.P, rng.getrandbits(254) % field.P))
    a = field.ints_to_limbs([c[0] for c in cases])
    b = field.ints_to_limbs([c[1] for c in cases])
    got = np.asarray(field.less_than(a, b))
    want = np.array([x < y for x, y in cases])
    assert (got == want).all()


def test_eq_is_zero_select():
    xs = [0, 1, rand_fe(), 0]
    ys = [0, 2, xs[2], 5]
    a, b = field.ints_to_limbs(xs), field.ints_to_limbs(ys)
    assert list(np.asarray(field.eq(a, b))) == [True, False, True, False]
    assert list(np.asarray(field.is_zero(a))) == [True, False, False, True]
    cond = np.array([True, False, True, False])
    sel = field.limbs_to_ints(np.asarray(field.select(cond, a, b)))
    assert sel == [xs[0], ys[1], xs[2], ys[3]]
