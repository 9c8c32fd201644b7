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


def _pack_u64(a):
    """uint32[16, N] 16-bit limbs -> uint64[4, N] (independent oracle path)."""
    a64 = a.astype(np.uint64)
    return np.stack([a64[4 * i] | (a64[4 * i + 1] << 16)
                     | (a64[4 * i + 2] << 32) | (a64[4 * i + 3] << 48)
                     for i in range(4)])


def _oracle_lt_eq(a, b):
    """Lexicographic 254-bit compare through a different packing (4x64)."""
    pa, pb = _pack_u64(a), _pack_u64(b)
    lt = np.zeros(a.shape[1], dtype=bool)
    eq = np.ones(a.shape[1], dtype=bool)
    for i in range(3, -1, -1):
        lt |= eq & (pa[i] < pb[i])
        eq &= pa[i] == pb[i]
    return lt, eq


def _comparator_fuzz(rounds: int):
    """Comparator fuzz body: `rounds` x 64K pairs incl. deliberate
    equal-limb structure (the class that masks the reference's `a_r == b_q`
    typo, src/indexed_merkle_tree.rs:617).  Bulk rounds check against a
    4x64-packed numpy oracle; the first rounds also against python ints."""
    import jax
    import jax.numpy as jnp
    from imt_tpu.ops import gates

    batch = 1 << 16
    nprng = np.random.RandomState(0x1337)
    lt_f = jax.jit(field.less_than)
    eq_f = jax.jit(field.eq)
    glt_f = jax.jit(gates.less_than_254)
    for r in range(rounds):
        a = nprng.randint(0, 1 << 16, size=(16, batch), dtype=np.uint32)
        b = nprng.randint(0, 1 << 16, size=(16, batch), dtype=np.uint32)
        a[15] &= 0x2FFF
        b[15] &= 0x2FFF
        k = batch // 8
        b[:, :k] = a[:, :k]                       # equal values
        b[8:, k:2 * k] = a[8:, k:2 * k]           # equal high halves
        b[:8, 2 * k:3 * k] = a[:8, 2 * k:3 * k]   # equal low halves
        b[0, 3 * k:4 * k] = (a[0, 3 * k:4 * k] + 1) & 0xFFFF   # off-by-one
        want_lt, want_eq = _oracle_lt_eq(a, b)
        if r < 2:       # python-int ground truth for the oracle itself
            av = sum(a[i].astype(object) << (16 * i) for i in range(16))
            bv = sum(b[i].astype(object) << (16 * i) for i in range(16))
            assert (want_lt == (av < bv)).all()
            assert (want_eq == (av == bv)).all()
        aj, bj = jnp.asarray(a), jnp.asarray(b)
        assert (np.asarray(lt_f(aj, bj)) == want_lt).all(), f"lt round {r}"
        assert (np.asarray(eq_f(aj, bj)) == want_eq).all(), f"eq round {r}"
        assert (np.asarray(glt_f(aj, bj)) == want_lt).all(), f"gates round {r}"


def test_comparator_fuzz_1m():
    """Default-tier fuzz: ~1M pairs, every adversarial equal-limb class."""
    _comparator_fuzz(rounds=16)


@pytest.mark.slow
def test_comparator_fuzz_10m():
    """Reference-scale fuzz (10M+ pairs, src/indexed_merkle_tree.rs:602) —
    nightly tier: pytest -m slow."""
    _comparator_fuzz(rounds=160)


def test_eq_is_zero_select():
    xs = [0, 1, rand_fe(), 0]
    ys = [0, 2, xs[2], 5]
    a, b = field.ints_to_limbs(xs), field.ints_to_limbs(ys)
    assert list(np.asarray(field.eq(a, b))) == [True, False, True, False]
    assert list(np.asarray(field.is_zero(a))) == [True, False, False, True]
    cond = np.array([True, False, True, False])
    sel = field.limbs_to_ints(np.asarray(field.select(cond, a, b)))
    assert sel == [xs[0], ys[1], xs[2], ys[3]]


def test_random_limbs_batch_generator():
    """random_limbs: deterministic, nonzero, < 2^bits, unique whp."""
    a = field.random_limbs(7, 512)
    assert a.shape == (field.LIMBS, 512) and a.dtype == np.uint32
    vals = [field.limbs_to_int(a[:, i]) for i in range(512)]
    assert all(0 < v < (1 << 253) for v in vals)
    assert len(set(vals)) == 512
    assert (a == field.random_limbs(7, 512)).all()
    c = field.random_limbs(8, 64, bits=16)
    assert all(0 < field.limbs_to_int(c[:, i]) < (1 << 16) for i in range(64))
