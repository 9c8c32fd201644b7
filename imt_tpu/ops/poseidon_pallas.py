"""Fused Poseidon sponge as a Pallas TPU kernel.

The whole 2-permutation hash (absorb -> 65 rounds -> pad -> 65 rounds ->
squeeze) runs inside ONE kernel per batch tile: state, CIOS accumulators and
round temporaries never leave VMEM, eliminating the HBM round-trips and
kernel-launch overhead that bound the XLA elementwise path.

Layout per tile: three state words, each ``uint32[16 limbs, TB lanes]``
(limb axis on sublanes, batch on lanes).  Field arithmetic reuses the exact
jnp primitives from ``field.py`` (CIOS Montgomery multiply + Kogge-Stone
carry resolution) — pure elementwise/shift ops that trace straight into
Mosaic.  Rounds run under ``lax.fori_loop`` with the Montgomery-form round
constants streamed from a VMEM ref; all other constants (modulus tables, MDS
entries, sponge IV) arrive via one packed constants ref (Pallas kernels
cannot capture array constants).

Bit-exactness: same spec constants as poseidon_jax; tests compare against
the python-int oracle and the reference anchor H(0,0,0)
(reference src/indexed_merkle_tree.rs:247-251).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import field
from .poseidon_spec import PoseidonSpecArrays, default_spec

DEFAULT_TILE = 512


def _prep_rc(spec: PoseidonSpecArrays) -> np.ndarray:
    """rc table [n_rounds + 1, 16, t] (Montgomery), last row zeros (the
    no-constant slot after the final round)."""
    rc = np.transpose(spec.rc_mont, (0, 2, 1)).astype(np.uint32)  # [65,16,t]
    return np.concatenate([rc, np.zeros_like(rc[:1])], axis=0)


def _pack_consts(spec: PoseidonSpecArrays) -> np.ndarray:
    """[17, n_field_cols + 9 mds + iv0 + one_mont] packed constant table."""
    base = field.consts_table()                       # [17, 7]
    cols = [base]

    def col16(v):
        c = np.zeros((17, 1), np.uint32)
        c[:16, 0] = v
        return c

    for i in range(spec.t):
        for j in range(spec.t):
            cols.append(col16(spec.mds_mont[i, j]))
    cols.append(col16(spec.iv_mont[0]))
    cols.append(col16(spec.one_mont))
    return np.concatenate(cols, axis=1)


@lru_cache(maxsize=None)
def _hash_kernel_fn(n_inputs: int, tb: int, interpret: bool):
    """Pallas call computing the n_inputs-word sponge hash on [16, B] limbs."""
    spec = default_spec()
    rc_np = _prep_rc(spec)
    tab_np = _pack_consts(spec)
    half = spec.r_f // 2
    r_p = spec.r_p
    t = spec.t
    nf = len(field.CONST_COLUMNS)

    def kernel(rc_ref, tab_ref, *refs):
        in_refs = refs[:n_inputs]
        out_ref = refs[n_inputs]
        tab = tab_ref[...]
        fc = field.consts_from_table(tab[:, :nf])
        mds = [[tab[:16, nf + i * t + j: nf + i * t + j + 1]
                for j in range(t)] for i in range(t)]
        iv0 = tab[:16, nf + t * t: nf + t * t + 1]
        one_m = tab[:16, nf + t * t + 1: nf + t * t + 2]

        def mm(a, b):
            return field.mont_mul(a, b, unroll=True, fc=fc)

        def sbox(x):
            x2 = mm(x, x)
            return mm(mm(x2, x2), x)

        def mds_arc(st, rc_row):
            out = []
            for i in range(t):
                acc = mm(jnp.broadcast_to(mds[i][0], st[0].shape), st[0])
                for j in range(1, t):
                    acc = field.add_mod(
                        acc, mm(jnp.broadcast_to(mds[i][j], st[j].shape),
                                st[j]), fc=fc)
                acc = field.add_mod(
                    acc, jnp.broadcast_to(rc_row[:, i:i + 1], acc.shape),
                    fc=fc)
                out.append(acc)
            return out

        def rc_row(r):
            # dynamic ref load ([1,16,t] block) — Mosaic has no dynamic_slice
            # on values, so slice the ref, not a loaded array.
            return rc_ref[pl.ds(r, 1)][0]

        def body_full(r, st):
            return mds_arc([sbox(s) for s in st], rc_row(r))

        def body_partial(r, st):
            return mds_arc([sbox(st[0])] + list(st[1:]), rc_row(r))

        def permute(st):
            st = [field.add_mod(
                s, jnp.broadcast_to(rc_ref[0][:, i:i + 1], s.shape), fc=fc)
                for i, s in enumerate(st)]
            st = jax.lax.fori_loop(1, half + 1, body_full, st)
            st = jax.lax.fori_loop(half + 1, half + 1 + r_p, body_partial, st)
            st = jax.lax.fori_loop(half + 1 + r_p, half + 1 + r_p + half,
                                   body_full, st)
            return st

        shape = in_refs[0].shape
        words = [field.to_mont(r[...], unroll=True, fc=fc) for r in in_refs]
        st = [jnp.broadcast_to(iv0, shape), words[0],
              words[1] if n_inputs > 1 else jnp.zeros(shape, jnp.uint32)]
        st = permute(st)
        if n_inputs == 2:
            st = [st[0],
                  field.add_mod(st[1], jnp.broadcast_to(one_m, shape), fc=fc),
                  st[2]]
        else:  # 3 inputs: absorb third word + padding 1
            st = [st[0],
                  field.add_mod(st[1], words[2], fc=fc),
                  field.add_mod(st[2], jnp.broadcast_to(one_m, shape), fc=fc)]
        st = permute(st)
        out_ref[...] = field.normalize(
            field.from_mont(st[1], unroll=True, fc=fc), unroll=True, fc=fc)

    n_rows = rc_np.shape[0]
    n_cols = tab_np.shape[1]

    @jax.jit
    def call(*inputs):
        b = inputs[0].shape[1]
        grid = (b // tb,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((n_rows, field.LIMBS, spec.t),
                                   lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((17, n_cols), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)] +
                     [pl.BlockSpec((field.LIMBS, tb), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)
                      for _ in range(n_inputs)],
            out_specs=pl.BlockSpec((field.LIMBS, tb), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((field.LIMBS, b), jnp.uint32),
            interpret=interpret,
        )(jnp.asarray(rc_np), jnp.asarray(tab_np), *inputs)

    return call


def _pad_call(call, tb: int, args):
    b = args[0].shape[1]
    pad = (-b) % tb
    if pad:
        args = [jnp.concatenate(
            [a, jnp.zeros((field.LIMBS, pad), jnp.uint32)], axis=1)
            for a in args]
    out = call(*args)
    return out[:, :b] if pad else out


def hash2(a, b, tile: int = DEFAULT_TILE, interpret: bool = False):
    """Batched 2-to-1 Poseidon hash via the fused kernel.  [16, B] x2 -> [16, B]."""
    return _pad_call(_hash_kernel_fn(2, tile, interpret), tile,
                     [jnp.asarray(a), jnp.asarray(b)])


def hash3(a, b, c, tile: int = DEFAULT_TILE, interpret: bool = False):
    """Batched 3-to-1 Poseidon hash via the fused kernel."""
    return _pad_call(_hash_kernel_fn(3, tile, interpret), tile,
                     [jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)])
