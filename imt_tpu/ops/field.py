"""BN254 scalar-field (Fr) arithmetic as limb-decomposed JAX ops for TPU.

Design (TPU-first, not a port):

* A field element is 16 limbs of 16 bits held in ``uint32``.  The limb axis is
  the *leading* axis — device arrays are ``uint32[16, *batch]`` — so that the
  batch dimension lands on the TPU vector lanes (128-wide) and the limb axis
  on sublanes.  All ops are elementwise over the batch and vectorize on the
  VPU; there is no scalar loop over batch anywhere.

* Montgomery arithmetic with R = 2^256, word radix 2^16 (CIOS with lazy
  carries).  ``mont_mul`` keeps the invariant: inputs/outputs are < 2p with
  all limbs < 2^16.  Full canonical reduction (< p) happens only at
  boundaries (hash outputs, comparisons, export).

* The reference implements this layer in Rust via halo2curves' 4x64-bit
  Montgomery form (reference Cargo.toml:14, src/indexed_merkle_tree.rs:382-385
  quotes the modulus).  64-bit multiplies don't exist on the TPU VPU, hence
  the 16-bit-radix redesign; ``uint32`` multiplies of 16-bit limbs are exact.

Why < 2p ("incomplete") representation: with p < 2^254 and R = 2^256 we have
4p < R, so CIOS on inputs < 2p yields outputs < 2p without a final
conditional subtraction — one compare/select per multiply saved in the hot
loop.  (Standard redundant-Montgomery argument.)
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# BN254 scalar field modulus r (reference src/indexed_merkle_tree.rs:382-385).
P = 21888242871839275222246405745257275088548364400416034343698204186575808495617

LIMBS = 16
LIMB_BITS = 16
MASK = (1 << LIMB_BITS) - 1
R = 1 << (LIMBS * LIMB_BITS)  # Montgomery radix 2^256
R_MOD_P = R % P
R2_MOD_P = (R * R) % P
# -p^{-1} mod 2^16 for the CIOS inner reduction step.
N0_INV = (-pow(P, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
TWO_P = 2 * P


def _int_to_limbs_list(x: int, n: int = LIMBS) -> list[int]:
    return [(x >> (LIMB_BITS * i)) & MASK for i in range(n)]


# Host-side constant limb tables (become XLA constants when closed over).
P_LIMBS = np.array(_int_to_limbs_list(P), dtype=np.uint32)
TWO_P_LIMBS_17 = np.array(_int_to_limbs_list(TWO_P, 17), dtype=np.uint32)
# 2^272 - 2p, for branch-free conditional subtraction on 17-limb values.
NEG_TWO_P_17 = np.array(_int_to_limbs_list((1 << 272) - TWO_P, 17), dtype=np.uint32)


# ---------------------------------------------------------------------------
# Host <-> device conversions (python ints <-> limb arrays)
# ---------------------------------------------------------------------------

def int_to_limbs(x: int) -> np.ndarray:
    """One python int -> uint32[16] (standard, non-Montgomery form)."""
    x %= P
    return np.array(_int_to_limbs_list(x), dtype=np.uint32)

def ints_to_limbs(xs) -> np.ndarray:
    """Iterable of python ints -> uint32[16, N] (limb-major batch)."""
    out = np.zeros((LIMBS, len(xs)), dtype=np.uint32)
    for j, x in enumerate(xs):
        out[:, j] = int_to_limbs(x)
    return out

def limbs_to_int(a) -> int:
    """uint32[16] -> python int."""
    a = np.asarray(a)
    return sum(int(a[i]) << (LIMB_BITS * i) for i in range(LIMBS))

def limbs_to_ints(a) -> list[int]:
    """uint32[16, N] -> list of python ints."""
    a = np.asarray(a)
    return [sum(int(a[i, j]) << (LIMB_BITS * i) for i in range(LIMBS))
            for j in range(a.shape[1])]

def int_to_mont_limbs(x: int) -> np.ndarray:
    return int_to_limbs((x * R) % P)


# ---------------------------------------------------------------------------
# Carry handling
# ---------------------------------------------------------------------------

def _propagate(t, out_limbs: int):
    """Exact sequential carry propagation of a lazy limb array.

    t: uint32[K, ...] with entries < 2^32 interpreted as sum(t[j] * 2^16j).
    Returns uint32[out_limbs, ...] with entries < 2^16.  The true value must
    fit in out_limbs limbs.  Runs as a lax.scan over the limb axis (compile-
    friendly; the per-step work is elementwise over the whole batch).
    """
    k = t.shape[0]
    if out_limbs > k:
        t = jnp.concatenate(
            [t, jnp.zeros((out_limbs - k,) + t.shape[1:], t.dtype)])
    elif out_limbs < k:
        t = t[:out_limbs]

    def body(carry, tj):
        v = tj + carry
        return v >> LIMB_BITS, v & MASK

    _, outs = jax.lax.scan(body, jnp.zeros_like(t[0]), t)
    return outs


def _ge(a, b_const: np.ndarray):
    """Lexicographic a >= b for limb arrays (a: [K, ...], b: constant [K])."""
    bvec = jnp.asarray(b_const.astype(np.uint32))
    bvec = jnp.broadcast_to(bvec[(slice(None),) + (None,) * (a.ndim - 1)], a.shape)

    def body(carry, x):
        # carry: "a >= b over limbs scanned so far" (low limbs); scanning up
        # from the least-significant limb, higher limbs override.
        aj, bj = x
        return jnp.where(aj == bj, carry, aj > bj), None

    init = jnp.ones(a.shape[1:], dtype=bool)  # all-equal => ge
    res, _ = jax.lax.scan(body, init, (a, bvec))
    return res


def _cond_sub_2p(t17):
    """t (17 canonical limbs, value < 4p) -> value mod-2p-folded (< 2p), 16 limbs."""
    ge = _ge(t17, TWO_P_LIMBS_17)
    diff = _propagate(t17 + NEG_TWO_P_17[(slice(None),) + (None,) * (t17.ndim - 1)], 17)
    # diff = t - 2p + 2^272; when ge, the 2^272 bit (limb 17) is dropped by
    # taking only 17 limbs and masking the top limb's overflow.
    sel = jnp.where(ge[None], diff, t17)
    return sel[:LIMBS]


# ---------------------------------------------------------------------------
# Core modular ops.  All arrays are uint32[16, *batch], value < 2p.
# ---------------------------------------------------------------------------

def _cios_body(b, n, zero_row):
    """CIOS iteration closure: fold one limb of `a` into the accumulator."""

    def body(t, ai):
        prod = ai[None] * b                                  # [16, ...] exact
        t = t + jnp.concatenate([prod & MASK, zero_row]) \
              + jnp.concatenate([zero_row, prod >> LIMB_BITS])
        m = ((t[0] & MASK) * N0_INV) & MASK                  # [...]
        q = m[None] * n                                      # [16, ...] exact
        t = t + jnp.concatenate([q & MASK, zero_row]) \
              + jnp.concatenate([zero_row, q >> LIMB_BITS])
        # t[0] is now divisible by 2^16: shift one limb down.
        t = jnp.concatenate([(t[1] + (t[0] >> LIMB_BITS))[None], t[2:], zero_row])
        return t, None

    return body


def mont_mul(a, b, unroll: bool = False):
    """Montgomery product a*b*R^{-1} mod p (CIOS, radix 2^16, lazy carries).

    Inputs < 2p with 16-bit limbs; output < 2p with 16-bit limbs.  The limb
    recursion runs as a lax.scan by default (small compiled graph); pass
    unroll=True for a fully unrolled body (e.g. inside Pallas kernels).
    """
    batch_shape = a.shape[1:]
    zero_row = jnp.zeros((1,) + batch_shape, dtype=jnp.uint32)
    t = jnp.zeros((LIMBS + 1,) + batch_shape, dtype=jnp.uint32)
    n = jnp.asarray(P_LIMBS)[(slice(None),) + (None,) * len(batch_shape)]
    body = _cios_body(b, n, zero_row)
    if unroll:
        for i in range(LIMBS):
            t, _ = body(t, a[i])
    else:
        t, _ = jax.lax.scan(body, t, a)
    # Lazy entries < ~2^23; value < 2p.  Canonicalize limbs.
    return _propagate(t, LIMBS)


def add_mod(a, b):
    """(a + b) folded below 2p.  Inputs < 2p (or < 4p combined headroom)."""
    s = _propagate(a + b, LIMBS + 1)
    return _cond_sub_2p(s)


_FOUR_P_17 = np.array(_int_to_limbs_list(4 * P, 17), dtype=np.uint32)


def sub_mod(a, b):
    """(a - b) mod p, result < 2p.  Inputs < 2p.

    Computed as a - b + 4p in signed-limb form (int32 lazy carries with
    arithmetic shifts), which is positive and in (2p, 6p); two conditional
    2p-folds bring it below 2p.
    """
    batch_dims = (None,) * (a.ndim - 1)
    fp = jnp.asarray(_FOUR_P_17.astype(np.int32))[(slice(None),) + batch_dims]
    pad = jnp.zeros((1,) + a.shape[1:], dtype=jnp.int32)
    t = jnp.concatenate([a.astype(jnp.int32), pad]) \
        - jnp.concatenate([b.astype(jnp.int32), pad]) + fp

    # Signed sequential carry propagation (arithmetic >> gives floor division).
    def body(carry, tj):
        v = tj + carry
        return v >> LIMB_BITS, (v & MASK).astype(jnp.uint32)

    _, s = jax.lax.scan(body, jnp.zeros_like(t[0]), t)
    s = _cond_sub_2p(s)
    s = _cond_sub_2p(jnp.concatenate([s, jnp.zeros_like(s[:1])]))
    return s


def normalize(a):
    """Reduce a (< 2p) to canonical form (< p)."""
    p17 = np.array(_int_to_limbs_list(P, 17), dtype=np.uint32)
    neg_p17 = np.array(_int_to_limbs_list((1 << 272) - P, 17), dtype=np.uint32)
    a17 = jnp.concatenate([a, jnp.zeros_like(a[:1])])
    ge = _ge(a17, p17)
    diff = _propagate(a17 + jnp.asarray(neg_p17)[(slice(None),) + (None,) * (a.ndim - 1)], 17)
    return jnp.where(ge[None], diff, a17)[:LIMBS]


def to_mont(a):
    """Standard form -> Montgomery form (multiply by R^2 then reduce)."""
    r2 = jnp.asarray(int_to_limbs(R2_MOD_P))[(slice(None),) + (None,) * (a.ndim - 1)]
    return mont_mul(a, jnp.broadcast_to(r2, a.shape))

def from_mont(a):
    """Montgomery form -> standard form (< 2p; normalize() for canonical)."""
    one = np.zeros(LIMBS, dtype=np.uint32)
    one[0] = 1
    o = jnp.asarray(one)[(slice(None),) + (None,) * (a.ndim - 1)]
    return mont_mul(a, jnp.broadcast_to(o, a.shape))


# ---------------------------------------------------------------------------
# Comparisons / predicates (on canonical-form inputs)
# ---------------------------------------------------------------------------

def eq(a, b):
    """Bit-exact equality of canonical limb arrays -> bool[batch]."""
    return jnp.all(a == b, axis=0)

def is_zero(a):
    return jnp.all(a == 0, axis=0)

def less_than(a, b):
    """a < b on canonical values -> bool[batch]."""

    def body(carry, x):
        aj, bj = x
        # scanning LSB -> MSB; a higher differing limb overrides.
        return jnp.where(aj == bj, carry, aj < bj), None

    init = jnp.zeros(a.shape[1:], dtype=bool)
    res, _ = jax.lax.scan(body, init, (a, b))
    return res


def select(cond, a, b):
    """cond ? a : b elementwise over the batch (cond: bool[batch])."""
    return jnp.where(cond[None], a, b)
