"""Baked Poseidon constants as device-ready limb arrays.

Generates (once, host-side) the Grain-derived round constants and MDS matrix
for Poseidon over BN254 Fr (T=3, RATE=2, R_F=8, R_P=57 — the reference's spec
at src/indexed_merkle_tree.rs:362-365), converts them to Montgomery-form
16x16-bit limbs, and caches them as an .npz next to this file so runtime
imports never re-run the LFSR.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from . import field
from .poseidon_ref import PoseidonParams, generate_params

_CACHE = os.path.join(os.path.dirname(__file__), "poseidon_bn254_t3_8_57.npz")


@dataclass(frozen=True)
class PoseidonSpecArrays:
    """Device-ready constants.  Limb layout matches the field module: the limb
    axis is the *last* axis here (these are small host constants; kernels
    re-arrange as needed)."""

    t: int
    rate: int
    r_f: int
    r_p: int
    rc_mont: np.ndarray    # uint32[r_f + r_p, t, 16]  round constants (Montgomery)
    mds_mont: np.ndarray   # uint32[t, t, 16]          MDS entries (Montgomery)
    iv_mont: np.ndarray    # uint32[t, 16]             initial sponge state (Montgomery)
    one_mont: np.ndarray   # uint32[16]                1 in Montgomery form (pad word)

    @property
    def n_rounds(self) -> int:
        return self.r_f + self.r_p


def _build(params: PoseidonParams) -> PoseidonSpecArrays:
    n = params.n_rounds
    rc = np.zeros((n, params.t, field.LIMBS), dtype=np.uint32)
    for r in range(n):
        for i in range(params.t):
            rc[r, i] = field.int_to_mont_limbs(params.round_constants[r][i])
    mds = np.zeros((params.t, params.t, field.LIMBS), dtype=np.uint32)
    for i in range(params.t):
        for j in range(params.t):
            mds[i, j] = field.int_to_mont_limbs(params.mds[i][j])
    iv = np.zeros((params.t, field.LIMBS), dtype=np.uint32)
    iv[0] = field.int_to_mont_limbs((1 << 64) % field.P)
    return PoseidonSpecArrays(
        t=params.t, rate=params.rate, r_f=params.r_f, r_p=params.r_p,
        rc_mont=rc, mds_mont=mds, iv_mont=iv,
        one_mont=field.int_to_mont_limbs(1),
    )


def default_spec() -> PoseidonSpecArrays:
    """T=3/RATE=2/8/57 spec, loaded from cache or generated + cached."""
    if os.path.exists(_CACHE):
        z = np.load(_CACHE)
        return PoseidonSpecArrays(
            t=int(z["t"]), rate=int(z["rate"]), r_f=int(z["r_f"]),
            r_p=int(z["r_p"]), rc_mont=z["rc_mont"], mds_mont=z["mds_mont"],
            iv_mont=z["iv_mont"], one_mont=z["one_mont"],
        )
    spec = _build(generate_params())
    try:
        np.savez(_CACHE, t=spec.t, rate=spec.rate, r_f=spec.r_f, r_p=spec.r_p,
                 rc_mont=spec.rc_mont, mds_mont=spec.mds_mont,
                 iv_mont=spec.iv_mont, one_mont=spec.one_mont)
    except OSError:
        pass  # read-only install; regenerate next time
    return spec
