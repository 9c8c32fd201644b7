"""Fused Pallas RNS kernel: interpret-mode bit-exactness (both dot flavors).

Compiled-mode exactness is exercised on the real chip by the bench/driver
(same kernel, same constants); interpret mode runs the identical jaxpr on
CPU, so these tests pin the algorithm and layouts.
"""

import random

import numpy as np

from imt_tpu.ops import field
from imt_tpu.ops import poseidon_rns_pallas as pk
from imt_tpu.ops.poseidon_ref import generate_params, hash_fixed

rng = random.Random(0xFACE)
PARAMS = generate_params()
ANCHOR = 1960587138944869480785025106734196872454309951825657414575195034687326603497


def _cases(n):
    xs = [rng.randrange(field.P) for _ in range(n)]
    ys = [rng.randrange(field.P) for _ in range(n)]
    zs = [rng.randrange(field.P) for _ in range(n)]
    return xs, ys, zs


def test_pallas_hash_anchor_bf16():
    z = field.ints_to_limbs([0])
    got = field.limbs_to_ints(np.asarray(
        pk.hash3(z, z, z, t_tile=128, interpret=True, dots="bf16")))
    assert got[0] == ANCHOR


def test_pallas_hash_anchor_opt():
    """The optimized-spec sparse-partial-round layout (lazy columns,
    ops/poseidon_opt.py) reproduces the anchor and random parity in the
    fast tier — it is the headline kernel candidate."""
    z = field.ints_to_limbs([0])
    got = field.limbs_to_ints(np.asarray(
        pk.hash3(z, z, z, t_tile=128, interpret=True, layout="opt8")))
    assert got[0] == ANCHOR
    xs, ys, zs = _cases(4)
    la, lb, lc = (field.ints_to_limbs(v) for v in (xs, ys, zs))
    g3 = field.limbs_to_ints(np.asarray(
        pk.hash3(la, lb, lc, t_tile=128, interpret=True, layout="opt8")))
    assert g3 == [hash_fixed([a, b, c], PARAMS)
                  for a, b, c in zip(xs, ys, zs)]


def test_pallas_hash_parity_bf16():
    xs, ys, zs = _cases(8)
    la, lb, lc = (field.ints_to_limbs(v) for v in (xs, ys, zs))
    g2 = field.limbs_to_ints(np.asarray(
        pk.hash2(la, lb, t_tile=128, interpret=True, dots="bf16")))
    assert g2 == [hash_fixed([a, b], PARAMS) for a, b in zip(xs, ys)]
    g3 = field.limbs_to_ints(np.asarray(
        pk.hash3(la, lb, lc, t_tile=128, interpret=True, dots="bf16")))
    assert g3 == [hash_fixed([a, b, c], PARAMS)
                  for a, b, c in zip(xs, ys, zs)]


import pytest


@pytest.mark.slow
def test_pallas_hash_parity_int8():
    """Non-default dot flavor — nightly tier (default = bf16, covered by
    test_pallas_hash_parity_bf16 in the default run)."""
    xs, ys, zs = _cases(8)
    la, lb, lc = (field.ints_to_limbs(v) for v in (xs, ys, zs))
    g3 = field.limbs_to_ints(np.asarray(
        pk.hash3(la, lb, lc, t_tile=128, interpret=True, dots="int8")))
    assert g3 == [hash_fixed([a, b, c], PARAMS)
                  for a, b, c in zip(xs, ys, zs)]
    z = field.ints_to_limbs([0])
    got = field.limbs_to_ints(np.asarray(
        pk.hash3(z, z, z, t_tile=128, interpret=True, dots="int8")))
    assert got[0] == ANCHOR


def test_pallas_edge_values():
    for trip in [(0, 0, 0), (field.P - 1, field.P - 1, field.P - 1)]:
        la, lb, lc = (field.ints_to_limbs([v]) for v in trip)
        got = field.limbs_to_ints(np.asarray(
            pk.hash3(la, lb, lc, t_tile=128, interpret=True)))[0]
        assert got == hash_fixed(list(trip), PARAMS)


import pytest


@pytest.mark.slow
@pytest.mark.parametrize("layout", ["split", "v0", "v0e", "v0x", "opt8",
                                    "opt4", "opt6"])
def test_pallas_layout_parity(layout):
    """Every alternate layout (split = no-concat state, v0* = pre-fusion
    round structure with dot/vpu/x estimate flavors) must agree with the
    cat layout at the CANONICAL-LIMB level: hashes vs the oracle, and
    permutation outputs after to_limbs.  Raw RNS residues may differ
    between est flavors: at margin-window inputs the Kawamura alpha can
    legally differ by 1 (each flavor's margins are proven), changing the
    quasi-canonical representative but not the value mod p — and every
    public boundary (hash2/hash3, tree levels) canonicalizes via
    to_limbs, so limb-level bit-exactness is the binding contract."""
    import jax.numpy as jnp

    xs, ys, zs = _cases(8)
    la, lb, lc = (field.ints_to_limbs(v) for v in (xs, ys, zs))
    for dots in ("int8", "bf16"):
        g3 = field.limbs_to_ints(np.asarray(pk.hash3(
            la, lb, lc, t_tile=128, interpret=True, dots=dots,
            layout=layout)))
        assert g3 == [hash_fixed([a, b, c], PARAMS)
                      for a, b, c in zip(xs, ys, zs)], dots
    g2 = field.limbs_to_ints(np.asarray(pk.hash2(
        la, lb, t_tile=128, interpret=True, layout=layout)))
    assert g2 == [hash_fixed([a, b], PARAMS) for a, b in zip(xs, ys)]
    z = field.ints_to_limbs([0])
    assert field.limbs_to_ints(np.asarray(pk.hash3(
        z, z, z, t_tile=128, interpret=True, layout=layout)))[0] == ANCHOR
    # chained permutations agree across layouts at the canonical-limb level
    from imt_tpu.ops import field_rns
    st = jnp.asarray((np.arange(3 * 48 * 128, dtype=np.uint32)
                      .reshape(3 * 48, 128) & 0x7FF).astype(np.float32))
    a = np.asarray(pk.permute_n(st, 2, t_tile=128, interpret=True,
                                layout="cat"))
    b = np.asarray(pk.permute_n(st, 2, t_tile=128, interpret=True,
                                layout=layout))
    for j in range(3):
        la = np.asarray(field_rns.to_limbs(jnp.asarray(a[48*j:48*(j+1)])))
        lb = np.asarray(field_rns.to_limbs(jnp.asarray(b[48*j:48*(j+1)])))
        assert (la == lb).all(), (layout, j)


def test_pallas_nonmultiple_batch_padding():
    xs, ys, _ = _cases(5)   # 5 is not a multiple of the tile
    la, lb = field.ints_to_limbs(xs), field.ints_to_limbs(ys)
    g2 = field.limbs_to_ints(np.asarray(
        pk.hash2(la, lb, t_tile=128, interpret=True)))
    assert g2 == [hash_fixed([a, b], PARAMS) for a, b in zip(xs, ys)]


def test_outer_loop_chain_equals_inkernel_chain():
    """The round-5 headline protocol times `fori_loop(J, permute_n(CHAIN=2))`
    — this pins that the measured computation IS J*2 chained permutations:
    outer-loop chaining must equal one in-kernel chain of the same length
    (raw residues compared: same layout, same representatives)."""
    import jax
    import jax.numpy as jnp

    st = jnp.asarray((np.arange(3 * 48 * 128, dtype=np.uint32)
                      .reshape(3 * 48, 128) & 0x7FF).astype(np.float32))
    outer = jax.lax.fori_loop(
        0, 3, lambda i, s: pk.permute_n(s, 2, t_tile=128, interpret=True),
        st)
    inker = pk.permute_n(st, 6, t_tile=128, interpret=True)
    assert (np.asarray(outer) == np.asarray(inker)).all()


def test_permute_n_rejects_nondividing_batch():
    """permute_n used to SILENTLY skip remainder lanes when the batch did
    not divide the tile (grid truncation — the round-5 grid-skip bug);
    it must raise instead."""
    import jax.numpy as jnp
    import pytest

    st = jnp.zeros((3 * 48, 200), jnp.float32)
    with pytest.raises(ValueError, match="not a multiple"):
        pk.permute_n(st, 1, t_tile=128, interpret=True)
