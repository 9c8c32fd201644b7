"""RNS fast-path: host model exactness + device Poseidon parity vs oracle."""

import random

import numpy as np

from imt_tpu.ops import field, poseidon_rns
from imt_tpu.ops.poseidon_ref import generate_params, hash_fixed
from imt_tpu.ops.rns_spec import RnsModel, P

rng = random.Random(0xA11CE)
PARAMS = generate_params()

ANCHOR = 1960587138944869480785025106734196872454309951825657414575195034687326603497


def test_rns_model_mont_mul_fuzz():
    m = RnsModel()
    for _ in range(50):
        a, b = rng.randrange(P), rng.randrange(P)
        got = m.from_mont(m.mont_mul(m.to_mont(a), m.to_mont(b)))
        assert got == (a * b) % P


def test_rns_model_edges_and_chain():
    m = RnsModel()
    for a in (0, 1, P - 1):
        for b in (0, 1, P - 1):
            assert m.from_mont(m.mont_mul(m.to_mont(a), m.to_mont(b))) == (a * b) % P
    x, acc = m.to_mont(7), 7
    for _ in range(64):  # bound stability under deep chains
        x = m.mont_mul(x, x)
        acc = (acc * acc) % P
    assert m.from_mont(x) == acc


def test_rns_hash3_anchor():
    z = field.ints_to_limbs([0])
    got = field.limbs_to_ints(np.asarray(poseidon_rns.hash3(z, z, z)))
    assert got[0] == ANCHOR  # reference src/indexed_merkle_tree.rs:247-251


def test_rns_hash2_hash3_parity():
    n = 16
    xs = [rng.randrange(field.P) for _ in range(n)]
    ys = [rng.randrange(field.P) for _ in range(n)]
    zs = [rng.randrange(field.P) for _ in range(n)]
    la, lb, lc = (field.ints_to_limbs(v) for v in (xs, ys, zs))
    g2 = field.limbs_to_ints(np.asarray(poseidon_rns.hash2(la, lb)))
    assert g2 == [hash_fixed([a, b], PARAMS) for a, b in zip(xs, ys)]
    g3 = field.limbs_to_ints(np.asarray(poseidon_rns.hash3(la, lb, lc)))
    assert g3 == [hash_fixed([a, b, c], PARAMS) for a, b, c in zip(xs, ys, zs)]


def test_rns_hash_edge_values():
    for trip in [(0, 0, 0), (P - 1, P - 1, P - 1), (1, 0, P - 1)]:
        la, lb, lc = (field.ints_to_limbs([v]) for v in trip)
        got = field.limbs_to_ints(np.asarray(poseidon_rns.hash3(la, lb, lc)))[0]
        assert got == hash_fixed(list(trip), PARAMS)
        got2 = field.limbs_to_ints(np.asarray(poseidon_rns.hash2(la, lb)))[0]
        assert got2 == hash_fixed([trip[0], trip[1]], PARAMS)


def test_hash_fixed_arbitrary_arity_matches_oracle():
    """hash_fixed for L=1..7 matches the python sponge oracle (the
    halo2-base hash_fix_len_array contract beyond the 2/3 arities the
    tree engine uses)."""
    import random

    import jax
    import numpy as np

    from imt_tpu.ops import field, hashing
    from imt_tpu.ops.poseidon_ref import generate_params, hash_fixed

    params = generate_params()
    rng = random.Random(11)
    b = 5
    for arity in range(1, 8):
        cols = [field.ints_to_limbs(
            [rng.randrange(field.P) for _ in range(b)])
            for _ in range(arity)]
        got = field.limbs_to_ints(
            np.asarray(jax.jit(hashing.hash_fixed)(cols)))
        exp = [hash_fixed([int(field.limbs_to_int(c[:, j]))
                           for c in cols], params) for j in range(b)]
        assert got == exp, f"arity {arity}"
