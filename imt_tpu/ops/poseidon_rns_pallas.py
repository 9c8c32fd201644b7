"""Fused Pallas kernel for the RNS Poseidon permutation.

The XLA path (poseidon_rns.py) materializes intermediates around every base-
extension dot; this kernel keeps the whole state and every temporary in VMEM
across all 65 rounds — one HBM read and one write per permutation.

Layout inside the kernel: each state word is f32[48 channels, T lanes]
(channel axis on sublanes = 6 VPU rows, batch tile on lanes).  The three
words concatenate to [48, 3T] for the MDS reduction so its two extension
dots run once per round at full width.  Constants (round constants, MDS
residues, extension lhs matrices, per-channel q/invq/fold columns) load once
per grid step and live in VMEM.

Exactness is inherited op-for-op from field_rns.py (same proven floor-mod,
same bf16 digit-split dots, same Kawamura alpha rows) — the kernel is a
scheduling change only, validated bit-exact against the XLA path and the
python oracle in tests.

Reference parity anchor: H(0,0,0), reference src/indexed_merkle_tree.rs:247-251.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .field import P
from .field_rns import RnsDeviceConsts, default_consts
from . import field_rns
from .poseidon_rns import _constants

N_CH = 48          # 2n residue channels
# split/bf16 interleaved-median tile A/B (2026-08-19, batch 65536,
# tools/ab_kernel.py): 2048 -> 7.88M, 4096 -> 7.67M, 8192 -> 7.59M perms/s
# (the earlier one-shot sweep suggesting 4096 was measurement noise).
DEFAULT_TILE = 2048
# Round-5 sweep (outer-loop protocol, spreads <= 1.3%; rates corrected to
# PROCESSED lanes after the grid-skip bug was found — a batch that does
# not divide the tile used to silently drop the remainder, inflating the
# raw readings; permute_n/_hash_fn now refuse such shapes).  opt4,
# production 2-perm chain, exact-fit or lane-corrected:
#   2048 -> 9.13M   2560 -> 9.21M   2816 -> 9.21M   3072 -> 9.19M
#   3328 -> 9.22M   4096 -> 9.18M   8192 -> 9.02M perms/s
# The 2560-3328 band is ~+0.9% over 2048; tile 4096+ declines slightly.
# WIDE_TILE serves the headline bench at an exact-fit batch (20 x 3328 =
# 66560); tree widths are powers of two, where 3328's 1.56% padding
# exceeds the gain, so DEFAULT_TILE stays 2048 there (hashing._tile_for).
WIDE_TILE = 3328
# extension-dot flavor: "bf16" (8-bit digit blocks + fused est row) or
# "int8" (7-bit digit blocks on the int8 MXU path).  bf16 WINS despite
# int8's 2x MXU rate: these dots are tiny ([73,48]@[48,3T] — shape-bound,
# not rate-bound), and the int8 path pays ~72 int32->f32 output converts
# per redc on the VPU (invisible to the op census, ~25% measured).
# Same-day A/B at tile 1024, batch 32768: bf16 6.13M vs int8 4.86M perms/s.
DEFAULT_DOTS = "bf16"
# state layout inside the kernel: "cat" keeps each word as one [48, T] array
# and concatenates the three words to [48, 3T] for full-width reductions;
# "split" keeps six [24, T] arrays (3 words x 2 RNS halves) so NO concatenate
# or channel-slice is ever materialized in the round loop (census: ~10% of
# VPU elementwise work in "cat" is concat traffic); "v0" is the cat layout
# with the PRE-fusion round structure (ARC added at the redc tail as an rc
# broadcast, unfolded k1/M1-form tables); "v0e"/"v0x" are v0 with the
# Kawamura alpha as an early VPU reduction (v0x also: 72-row lhs, two-mod
# combine — the exact pre-fusion extension).  All value-exact (canonical
# limbs identical at every hash boundary; raw RNS representatives may differ
# between est flavors at margin-window inputs).
#
# "optG" (round 4, the DEFAULT): the optimized-spec sparse partial rounds
# (ops/poseidon_opt.py) on the split-pair state — 3 S-box reductions + ONE
# row-0 reduction per partial round, with the two column words accumulated
# unreduced for G rounds and refreshed by one reduction pair per period
# (row 0 reads the stale columns through precomputed combined
# coefficients).  Value-exact: derivation + lazy schedule proven equal to
# the standard permutation (tests/test_poseidon_opt.py), kernel bit-exact
# vs the oracle and every other layout.  "spsim" is the timing-only ideal
# (columns never reduced — unsound) that upper-bounds this family.
#
# Measurement status (round 5, outer-loop protocol, spreads <= 1.3%,
# production 2-perm chain, exact-fit grids): opt4@2048 9.13M / opt6@2048
# 9.27M / opt8@2048 9.08M / opt4@3328(batch 66560) 9.22M /
# spsim(ideal)@3328 9.585M perms/s — the value-exact kernel is at ~96% of
# the unsound ideal, and the ideal itself is below the original 10M
# target (see BASELINE.md round-5 re-baseline).  Round-4 figures at tile
# 2048 (old +-8% protocol): split 7.73M / opt8 9.25M / opt4 9.30M /
# spsim 9.72M.
#
# opt6 ships as the default after round-5's exact-grid A/Bs had it ahead
# of opt4 at BOTH tiles (9.265 vs 9.130 @2048; 9.258 vs 9.221 @3328,
# spreads <= 0.8%): g=6 amortizes the refresh pair over more rounds than
# g=4 while the combined-coefficient growth still fits the bound
# (_opt_g caps g at 11).  Value-exactness for g=6 is proven in
# tests/test_poseidon_opt.py (lazy schedule == standard permutation) and
# kernel parity in tests/test_poseidon_rns_pallas.py.
DEFAULT_LAYOUT = "opt6"

# process-wide layout override (EngineConfig(pallas_layout=...) /
# set_layout): resolved at CALL time by the public hash/permute wrappers,
# so it is not frozen into their signature defaults.  Layouts are value-
# interchangeable (canonical limbs identical; raw quasi-canonical residues
# may differ, which is why comparisons happen at the limb boundary).
_active_layout = DEFAULT_LAYOUT

_LAYOUTS = ("cat", "split", "spsim", "v0", "v0e", "v0x")


def set_layout(name: str | None) -> None:
    """Select the kernel layout ("opt4"/"opt8"/"split"/...) or None to
    restore the default.  "spsim" is refused: it is a timing-only
    diagnostic with numerically wrong outputs."""
    global _active_layout
    name = name or DEFAULT_LAYOUT
    if name == "spsim":
        raise ValueError("spsim is a timing-only diagnostic layout")
    if name.startswith("opt"):
        _opt_g(name)                  # validates the suffix and bounds g
    elif name not in _LAYOUTS:
        raise ValueError(f"unknown kernel layout: {name!r}")
    _active_layout = name


def active_layout() -> str:
    return _active_layout


def _opt_g(layout: str) -> int:
    """Parse and bound the refresh period of an "optG" layout name.
    g is capped at 11: a period block needs 5g+1+g+g(g-1)/2+2 constant
    columns and must fit one 128-lane table block (g=11 -> 124)."""
    try:
        g = int(layout[3:]) if len(layout) > 3 else 8
    except ValueError:
        raise ValueError(f"bad opt layout suffix: {layout!r}") from None
    if not 1 <= g <= 11:
        raise ValueError(f"opt refresh period g={g} out of range [1, 11]")
    return g


def _ext_lhs_i8(a: np.ndarray, invq_in: np.ndarray) -> np.ndarray:
    """Base-extension lhs [3n_out + 3, 2n_in] int8: 7-bit digit split blocks
    [[A1, 0], [A0, A1], [0, A0]] with scales 2^14, 2^7, 1, plus THREE
    Kawamura-estimate rows.  The estimate est = sum_i sig_i/q_i rides the
    integer dot in fixed point: w_i = round(invq_i * 2^21) (<= 1049) split as
    w = 2^7*hi + lo, so with sig = 2^7*s1 + s0,
        sum w_i sig_i = 2^14*(hi.s1) + 2^7*(lo.s1 + hi.s0) + lo.s0
    and the three rows give est = (2^14*A + 2^7*B + C) * 2^-21 with absolute
    error <= 24 * 0.5*2^-21 * max(sig) ~ 0.014 — far inside the +-1/4
    alpha margins proven for the bf16 est row (this row is MORE precise than
    the bf16 one: bf16 rounding of invq is ~2^-9 relative)."""
    n_out, n_in = a.shape
    a = a.astype(np.int64)
    a1, a0 = (a >> 7).astype(np.int8), (a & 127).astype(np.int8)
    lhs = np.zeros((3 * n_out + 3, 2 * n_in), dtype=np.int8)
    lhs[0:n_out, 0:n_in] = a1
    lhs[n_out:2 * n_out, 0:n_in] = a0
    lhs[n_out:2 * n_out, n_in:] = a1
    lhs[2 * n_out:3 * n_out, n_in:] = a0
    w = np.round(invq_in.astype(np.float64).ravel() * (1 << 21)).astype(
        np.int64)
    assert (w > 0).all() and (w >> 7 <= 127).all()   # w <= 2^14 - 1
    hi, lo = (w >> 7).astype(np.int8), (w & 127).astype(np.int8)
    lhs[3 * n_out + 0, 0:n_in] = hi
    lhs[3 * n_out + 1, 0:n_in] = lo
    lhs[3 * n_out + 1, n_in:] = hi
    lhs[3 * n_out + 2, n_in:] = lo
    return lhs


# ---------------------------------------------------------------------------
# Host constant packing
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _packed():
    """All kernel constants as device-ready numpy arrays."""
    c = default_consts()
    rc, mds, iv0, one, r_f, r_p = _constants()
    # ALL constant tables are channel-major 2D [48, k]: every in-kernel
    # extraction is then a lane RANGE slice -> [48, w] (int indexing of
    # loaded arrays lowers to >2D gathers Mosaic rejects).
    # rc: [rounds, 2n, t, 1] -> [2n, rounds*128]: round r's words live at
    # lanes 128r..128r+2 (Mosaic dynamic lane slices must be 128-aligned).
    # Round 0's rc is added directly to the (Montgomery-domain) state, so it
    # stays in M1-form; rounds >= 1 are added into the deferred MDS sum
    # BEFORE its Montgomery reduction, so they are baked in M1^2-form:
    # redc(acc + rc*M1^2 mod p) = acc*M1^{-1} + rc*M1  (mod p).
    from .poseidon_ref import generate_params
    params = generate_params()
    m1 = c.spec.m1
    m1sq = pow(m1, 2, P)
    qall = [int(q) for q in c.spec.all_q()]
    n = c.n
    # k1-folding: MDS-fed reductions skip the explicit sig = w1*k1 multiply
    # because the B1 rows of the MDS table (and of the rc columns they
    # absorb) are pre-scaled by k1 per channel — the reduction's entry mod
    # then yields the Kawamura digits directly.
    k1i = [int(v) for v in c.spec.k1]
    n_rounds = rc.shape[0]
    rc_k = np.zeros((N_CH, n_rounds * 128), np.float32)
    for r in range(n_rounds):
        for j in range(3):
            v = params.round_constants[r][j] * (m1 if r == 0 else m1sq) % P
            col = [v % q for q in qall]
            if r > 0:                           # rides the scaled MDS sum
                col[:n] = [col[i] * k1i[i] % qall[i] for i in range(n)]
            rc_k[:, 128 * r + j] = col
    # mds: [2n, t, t, 1] -> [2n, t*t] (column 3i+j = M[i][j]); B1 rows
    # k1-scaled (see above)
    mds_k = np.ascontiguousarray(
        mds[..., 0].transpose(1, 2, 0)).reshape(-1, N_CH).T.copy()
    for i in range(n):
        mds_k[i] = (mds_k[i].astype(np.int64) * k1i[i]) % qall[i]
    cols = np.zeros((N_CH, 14), np.float32)   # per-channel constant columns
    n = c.n
    cols[:, 0] = c.q_all[:, 0]
    cols[:, 1] = c.invq_all[:, 0]
    cols[:n, 2] = c.k1[:, 0]
    cols[:n, 3] = c.c1[:, 0]       # (B2 constants stored in rows 0..n-1)
    cols[:n, 4] = c.c2[:, 0]
    cols[:n, 5] = c.e2[:, 0]
    cols[:n, 6] = c.c16_b2[:, 0]
    cols[:n, 7] = c.neg_m1[:, 0]
    cols[:n, 8] = c.c16_b1[:, 0]
    cols[:n, 9] = c.neg_m2[:, 0]
    cols[:, 10] = iv0
    cols[:, 11] = one
    cols[:n, 12] = [(1 << 14) % int(q) for q in c.spec.q2]   # c14 (ext1 out)
    cols[:n, 13] = [(1 << 14) % int(q) for q in c.spec.q1]   # c14 (ext2 out)
    from .rns_spec import default_rns
    from .field_rns import _ext_lhs
    spec = default_rns()
    invq1 = 1.0 / np.asarray(spec.q1, np.float64)
    invq2 = 1.0 / np.asarray(spec.q2, np.float64)
    # c2-fold (bf16 path): ext1's lhs rows are pre-scaled by c2 per OUTPUT
    # channel (a1[j,k] -> a1[j,k]*c2[j] mod q2[j], likewise -M1), so the
    # extension's raw combine already carries the s_ext*c2 factor of the
    # tau step and its final mod folds into tau's mod.  Value-exact: both
    # orders are congruent mod q2 and tau's floor-mod re-canonicalizes
    # (engines compare canonical limbs, not raw residues).  Bound:
    # w2q*c1 + s_raw < 5.56M + 2.2M < 2^23 (exact f32).
    a1c2 = (spec.a1 * spec.c2[:, None]) % spec.q2[:, None]
    cols2 = np.zeros((N_CH, 15), np.float32)
    cols2[:, :14] = cols
    cols2[:n, 14] = (spec.neg_m1 * spec.c2) % spec.q2   # (-M1*c2) mod q2
    return (rc_k.astype(np.float32), mds_k.astype(np.float32),
            _ext_lhs(a1c2, spec.q1.astype(np.float64)).astype(np.float32),
            c.ext2_lhs.astype(np.float32),
            _ext_lhs_i8(spec.a1, invq1), _ext_lhs_i8(spec.a2, invq2),
            cols2, r_f, r_p)


@lru_cache(maxsize=None)
def _packed_opt(g: int = 8):
    """Constants for the "opt" layout: optimized-spec sparse partial rounds
    (ops/poseidon_opt.py) with the lazy-column period schedule.

    Scale/fold conventions (see _packed for the base rules):
    * every constant that multiplies an M1-scaled operand inside a sum that
      feeds a digits_ready reduction is stored M1-form (c*M1 mod p) with the
      B1 half k1-folded;
    * additive constants riding a pre-reduction sum are M1^2-form
      (k1-folded B1);
    * `bump` re-scales a period-start column (M1) into the M1^2 accumulator:
      residues of M1^2 mod p (k1-folded B1) — value 1 in M1-form.

    Returns (rcf_k [48, 8*128], mds2_k [48, 18], opt_k [48, blocks*128],
    lhs1, lhs2, cols, r_f, r_p, n_periods, rem).
    Full-round rc slots: 0 = round-0 ARC (plain M1-form, pre-canon);
    1..3 = leading-round ARCs (ride the previous mds_redc); 4 = the FIRST
    partial scalar c0 (rides the LAST leading mds_redc, word 0 only);
    5..7 = trailing-round ARCs 1..3.  The first trailing round's ARC is
    split: word 0 rides the last row0 reduction, words 1/2 ride the final
    column refresh (pc columns of the last period block).

    Period block layout (lane index within each 128-lane block, glen = g or
    the remainder):  [0,g) m00_d · [g,2g) v1_d · [2g,3g) v2_d · [3g,4g)
    w1_d · [4g,5g) w2_d · [5g] bump · [5g+1, 5g+1+g) rc0 column for the
    round AFTER local round d (the last block's last rc0 = post c0) ·
    [5g+1+g, ..) cc_{d,j} (d=1..glen-1, j<d, row-major) · last block only:
    2 trailing pc columns (post ARC words 1/2, M1^2-form)."""
    from .poseidon_ref import generate_params
    from .poseidon_opt import optimize_params
    c = default_consts()
    _, _, iv0, one, r_f, r_p = _constants()
    params = generate_params()
    opt = optimize_params(params)
    m1 = c.spec.m1
    m1sq = pow(m1, 2, P)
    qall = [int(q) for q in c.spec.all_q()]
    k1i = [int(v) for v in c.spec.k1]
    n = c.n
    half = r_f // 2

    def col(val: int, scale: int, fold: bool = True) -> np.ndarray:
        v = (val * scale) % P
        out = np.array([v % q for q in qall], np.float64)
        if fold:
            for i in range(n):
                out[i] = (int(out[i]) * k1i[i]) % qall[i]
        return out.astype(np.float32)

    # ---- full-round rc table -------------------------------------------
    rcf_k = np.zeros((N_CH, 8 * 128), np.float32)
    for j in range(3):
        rcf_k[:, j] = col(opt.pre_rounds[0][j], m1, fold=False)
    for r in range(1, half):
        for j in range(3):
            rcf_k[:, 128 * r + j] = col(opt.pre_rounds[r][j], m1sq)
    rcf_k[:, 128 * 4] = col(opt.partial_c0[0], m1sq)       # word 0 only
    for r in range(1, half):
        for j in range(3):
            rcf_k[:, 128 * (4 + r) + j] = col(opt.post_rounds[r][j], m1sq)

    # ---- dense MDS tables (standard + Mpre-folded last-leading) ---------
    mds2_k = np.zeros((N_CH, 18), np.float32)
    for i in range(3):
        for j in range(3):
            mds2_k[:, 3 * i + j] = col(opt.mds[i][j], m1)
            mds2_k[:, 9 + 3 * i + j] = col(opt.mds_last_pre[i][j], m1)

    # ---- period blocks ---------------------------------------------------
    n_periods, rem = divmod(r_p, g)
    blocks = n_periods + (1 if rem else 0)
    opt_k = np.zeros((N_CH, blocks * 128), np.float32)
    for b in range(blocks):
        base = b * g
        glen = g if b < n_periods else rem
        off = b * 128
        for d in range(glen):
            m00, v1, v2, w1, w2 = opt.sparse[base + d]
            opt_k[:, off + d] = col(m00, m1)
            opt_k[:, off + g + d] = col(v1, m1)
            opt_k[:, off + 2 * g + d] = col(v2, m1)
            opt_k[:, off + 3 * g + d] = col(w1, m1)
            opt_k[:, off + 4 * g + d] = col(w2, m1)
        # bump: value 1 in M1-form — re-scales a period-start column (M1)
        # into the M1^2 accumulator on multiply
        opt_k[:, off + 5 * g] = col(1, m1)
        for d in range(glen):
            nxt = base + d + 1
            rc_next = (opt.partial_c0[nxt] if nxt < r_p
                       else opt.post_rounds[0][0])
            opt_k[:, off + 5 * g + 1 + d] = col(rc_next, m1sq)
        ci = off + 5 * g + 1 + g
        for d in range(1, glen):
            _, v1, v2, _, _ = opt.sparse[base + d]
            for j in range(d):
                w1j, w2j = opt.sparse[base + j][3], opt.sparse[base + j][4]
                cc = (v1 * w1j + v2 * w2j) % P
                opt_k[:, ci] = col(cc, m1)
                ci += 1
        if b == blocks - 1:                                # pc columns
            opt_k[:, ci] = col(opt.post_rounds[0][1], m1sq)
            opt_k[:, ci + 1] = col(opt.post_rounds[0][2], m1sq)
    base = _packed()
    return (rcf_k, mds2_k, opt_k) + base[2:7] + (r_f, r_p, n_periods, rem)


@lru_cache(maxsize=None)
def _packed_v0():
    """Constants for the v0 (pre-fusion) round structure: rc in plain
    Montgomery M1-form for every round (added at the redc TAIL, i.e. to the
    already-reduced state), mds residues unscaled (no k1 folding)."""
    c = default_consts()
    rc, mds, iv0, one, r_f, r_p = _constants()
    n_rounds = rc.shape[0]
    rc_k = np.zeros((N_CH, n_rounds * 128), np.float32)
    for r in range(n_rounds):
        for j in range(3):
            rc_k[:, 128 * r + j] = rc[r, :, j, 0]
    mds_k = np.ascontiguousarray(
        mds[..., 0].transpose(1, 2, 0)).reshape(-1, N_CH).T.copy()
    base = _packed()
    # v0's redc applies c2 explicitly — it needs the UNFOLDED ext1 lhs
    return (rc_k, mds_k.astype(np.float32),
            c.ext1_lhs.astype(np.float32)) + base[3:]


# ---------------------------------------------------------------------------
# In-kernel ops (arrays, not refs; all shapes [48 or 24, X])
# ---------------------------------------------------------------------------

def _mod(x, q, invq):
    return x - q * jnp.floor(x * invq)


def _extend_i8(sig, lhs_i8, q, invq, neg_m, delta, clamp, invq_in=None):
    """int8-MXU base extension.  sig: [n_in, X] quasi-canonical.

    Alpha estimate: with invq_in=None it rides the integer dot as three
    fixed-point rows (see _ext_lhs_i8) — no VPU cross-sublane reduction,
    but alpha then DEPENDS on the dot result.  With invq_in ([n_in, 1]
    f32 reciprocals) it is an early VPU sublane reduction of the inputs,
    f32-precise (error << the ±1/4 margins), issued BEFORE the dot so the
    VPU reduction overlaps the MXU — measured faster despite more VPU ops.

    The digit-block rows combine as hi = s2*128 + s1 in int32 BEFORE the
    first mod (value = hi*2^7 + s0): hi <= 24*(18*18*128 + 18*127*2)
    = 1,105,056 < 2^24, so one mod replaces the former two and the f32 cast
    of hi is exact."""
    s1 = jnp.floor(sig * (1.0 / 128.0))
    s0 = sig - 128.0 * s1
    if invq_in is not None:
        est = jnp.sum(sig * invq_in, axis=0, keepdims=True)    # [1, X]
        alpha = jnp.floor(est + delta)
        if clamp:
            alpha = jnp.maximum(alpha, 0.0)
    rhs = jnp.concatenate([s1, s0], axis=0).astype(jnp.int8)
    out = jax.lax.dot_general(lhs_i8, rhs, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    n = (out.shape[0] - 3) // 3
    # combine in f32 (int32 multiplies are emulated on the VPU): exact,
    # hi <= 24*(18*18*128 + 18*127*2) = 1,105,056 < 2^24
    hi = out[:n].astype(jnp.float32) * 128.0 + out[n:2 * n].astype(
        jnp.float32)
    s0f = out[2 * n:3 * n].astype(jnp.float32)
    if invq_in is None:
        e = out[3 * n:3 * n + 3].astype(jnp.float32)         # [3, X]
        est = (e[0:1] * 16384.0 + e[1:2] * 128.0 + e[2:3]) * (1.0 / 2097152.0)
        alpha = jnp.floor(est + delta)
        if clamp:
            alpha = jnp.maximum(alpha, 0.0)
    # total <= (q+2)*128 + 24*127^2 + 24*q < 2^20 (exact f32)
    total = _mod(hi, q, invq) * 128.0 + s0f + alpha * neg_m
    return _mod(total, q, invq)


def _extend_i8_x(sig, lhs_i8, c14, q, invq, neg_m, invq_in, delta, clamp):
    """int8-MXU base extension, pre-fusion flavor (layout v0x): 72-row lhs
    (no est rows — int8 VMEM sublane tiles are 32 high, so 72 rows fit 3
    tiles with only 24 rows of pad vs 75->96), early VPU-sum alpha that
    overlaps the dot, and the original two-mod c14 digit combine."""
    s1 = jnp.floor(sig * (1.0 / 128.0))
    s0 = sig - 128.0 * s1
    est = jnp.sum(sig * invq_in, axis=0, keepdims=True)      # [1, X]
    alpha = jnp.floor(est + delta)
    if clamp:
        alpha = jnp.maximum(alpha, 0.0)
    rhs = jnp.concatenate([s1, s0], axis=0).astype(jnp.int8)
    out = jax.lax.dot_general(lhs_i8, rhs, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    n = out.shape[0] // 3
    s2f = out[:n].astype(jnp.float32)
    s1f = out[n:2 * n].astype(jnp.float32)
    s0f = out[2 * n:].astype(jnp.float32)
    total = (_mod(s2f, q, invq) * c14 + _mod(s1f, q, invq) * 128.0 + s0f
             + alpha * neg_m)
    return _mod(total, q, invq)


def _fake_dot(rhs, n_rows):
    """Diagnostic (dots="none"): a numerically-bounded stand-in for the MXU
    extension dot — measures how much of the kernel's wall time the dots'
    SERIALIZATION with the VPU tail costs (outputs are garbage; timing only)."""
    return jnp.broadcast_to(rhs[:1] + 1.0, (n_rows, rhs.shape[1]))


def _extend(sig, lhs, q, invq, neg_m, delta, clamp):
    """Kawamura base extension, [24, X] -> [24, X] (see field_rns._extend).

    Same combine-order trick as _extend_i8 with 8-bit digits: hi = s2*256
    + s1 <= 24*(9*9*256 + 9*255*2) = 607,824 < 2^24 (exact f32), one mod
    instead of two."""
    s1 = jnp.floor(sig * (1.0 / 256.0))
    s0 = sig - 256.0 * s1
    rhs = jnp.concatenate([s1, s0], axis=0).astype(jnp.bfloat16)
    if lhs is None:
        out = _fake_dot(rhs.astype(jnp.float32), 3 * sig.shape[0] + 1)
    else:
        out = jnp.dot(lhs, rhs, preferred_element_type=jnp.float32)
    n = (out.shape[0] - 1) // 3
    est = out[3 * n:3 * n + 1]                 # [1, X] (range slice, no gather)
    alpha = jnp.floor(est + delta)
    if clamp:
        alpha = jnp.maximum(alpha, 0.0)
    hi = out[:n] * 256.0 + out[n:2 * n]
    # total <= (q+2)*256 + 24*255^2 + 24*q < 2^21.1 (exact f32)
    total = _mod(hi, q, invq) * 256.0 + out[2 * n:3 * n] + alpha * neg_m
    return _mod(total, q, invq)


def _extend_nf(sig, lhs, q, invq, neg_m, delta, clamp):
    """Kawamura base extension, RAW tail: same as _extend but the lhs digit
    blocks (and neg_m) are pre-scaled by a per-output-channel constant
    (c2-fold, see _packed) and the final mod is OMITTED — the caller folds
    the raw total (< 2^21.1, same bound as _extend's pre-mod value) into
    its own following mod.  Saves one 24-channel mod + 24 muls per redc."""
    s1 = jnp.floor(sig * (1.0 / 256.0))
    s0 = sig - 256.0 * s1
    rhs = jnp.concatenate([s1, s0], axis=0).astype(jnp.bfloat16)
    if lhs is None:
        out = _fake_dot(rhs.astype(jnp.float32), 3 * sig.shape[0] + 1)
    else:
        out = jnp.dot(lhs, rhs, preferred_element_type=jnp.float32)
    n = (out.shape[0] - 1) // 3
    est = out[3 * n:3 * n + 1]
    alpha = jnp.floor(est + delta)
    if clamp:
        alpha = jnp.maximum(alpha, 0.0)
    hi = out[:n] * 256.0 + out[n:2 * n]
    return _mod(hi, q, invq) * 256.0 + out[2 * n:3 * n] + alpha * neg_m


def _make_redc(lhs1, lhs2, cols, dots: str = "bf16"):
    """Bind constants; cols: [48, 14] channel-major column table.
    Returns redc(w [48, X]).  Round-constant adds are NOT fused here any
    more: they ride the deferred MDS accumulate in M1^2-form (see _packed)."""
    n = N_CH // 2
    q_all, invq_all = cols[:, 0:1], cols[:, 1:2]
    q1, invq1 = q_all[:n], invq_all[:n]
    q2, invq2 = q_all[n:], invq_all[n:]
    k1 = cols[:n, 2:3]
    c1, c2, e2 = cols[:n, 3:4], cols[:n, 4:5], cols[:n, 5:6]
    neg_m1, neg_m2 = cols[:n, 7:8], cols[:n, 9:10]
    if dots == "none":
        lhs1_b = lhs2_b = None
    else:
        lhs1_b = lhs1 if dots == "int8" else lhs1.astype(jnp.bfloat16)
        lhs2_b = lhs2 if dots == "int8" else lhs2.astype(jnp.bfloat16)
    if dots == "int8":
        ext1 = lambda sig: _extend_i8(sig, lhs1_b, q2, invq2, neg_m1,
                                      -0.25, True)
        ext2 = lambda tau: _extend_i8(tau, lhs2_b, q1, invq1, neg_m2,
                                      0.5, False)

        def tau_of(w2q, sig):
            return _mod(w2q * c1 + ext1(sig) * c2, q2, invq2)
    else:
        # bf16: lhs1 is c2-folded (see _packed) — ext1 returns the raw
        # tail and its final mod + the *c2 mul ride tau's mod.
        neg_m1c2 = cols[:n, 14:15]
        ext2 = lambda tau: _extend(tau, lhs2_b, q1, invq1, neg_m2,
                                   0.5, False)

        def tau_of(w2q, sig):
            s_raw = _extend_nf(sig, lhs1_b, q2, invq2, neg_m1c2,
                               -0.25, True)
            return _mod(w2q * c1 + s_raw, q2, invq2)

    def redc(w, digits_ready: bool = False):
        """digits_ready: the caller pre-scaled the B1 half by k1 (MDS-fed
        reductions use k1-folded constant tables — see _packed), so the
        entry mod directly yields the Kawamura digits."""
        wq = _mod(w, q_all, invq_all)
        w1, w2 = wq[:n], wq[n:]
        sig = w1 if digits_ready else _mod(w1 * k1, q1, invq1)
        tau = tau_of(w2, sig)
        z1 = ext2(tau)
        z2 = _mod(tau * e2, q2, invq2)
        return jnp.concatenate([z1, z2], axis=0)

    return redc, (q_all, invq_all)


def _permutation(words, redc, canon, rc_ref, mds, r_f, r_p, t_tile):
    """One permutation on a list of three [48, T] words (VMEM values).
    mds: [3][3] list of [48, 1] residue columns.

    Round r's ARC (r >= 1) is a [48, 1] column added into round r-1's
    deferred MDS accumulate before its reduction — the rc table holds
    rc*M1^2 mod p so the value after redc is acc*M1^{-1} + rc*M1 (the
    Montgomery ARC), and no [48, 3T] rc broadcast is ever materialized.
    Channel bound: 3*(q-1)*(q+2) + (q-1) = 16,675,768 < 2^24 (exact f32)."""
    half = r_f // 2
    n_rounds = r_f + r_p

    def rc_row(r):
        # rc_ref: [48, rounds*128], word j of round r at lane 128r+j
        return [rc_ref[:, 128 * r + j:128 * r + j + 1] for j in range(3)]

    rc0 = rc_row(0)
    words = [canon(w + rc0[j]) for j, w in enumerate(words)]

    def sbox_cat(cat):
        x2 = redc(cat * cat)
        x4 = redc(x2 * x2)
        return redc(x4 * cat)

    def mds_redc(cat, rc):
        ws = [cat[:, j * t_tile:(j + 1) * t_tile] for j in range(3)]
        rows = []
        for i in range(3):
            acc = mds[i][0] * ws[0] + mds[i][1] * ws[1] + mds[i][2] * ws[2]
            if rc is not None:
                acc = acc + rc[i]
            rows.append(acc)
        return redc(jnp.concatenate(rows, axis=1), digits_ready=True)

    cat = jnp.concatenate(words, axis=1)      # [48, 3T]

    # 4 leading full rounds (unrolled; static rc indices)
    for r in range(1, half + 1):
        cat = mds_redc(sbox_cat(cat), rc_row(r))

    # 57 partial rounds under fori_loop (dynamic rc index)
    def partial_body(ri, cat):
        r = half + 1 + ri
        x0 = cat[:, :t_tile]
        x2 = redc(x0 * x0)
        x4 = redc(x2 * x2)
        x5 = redc(x4 * x0)
        cat = jnp.concatenate([x5, cat[:, t_tile:]], axis=1)
        blk = rc_ref[:, pl.ds(pl.multiple_of(128 * r, 128), 128)]
        return mds_redc(cat, [blk[:, j:j + 1] for j in range(3)])

    cat = jax.lax.fori_loop(0, r_p, partial_body, cat)

    # 4 trailing full rounds; the last has no ARC
    for k in range(half):
        r = half + 1 + r_p + k
        cat = mds_redc(sbox_cat(cat), rc_row(r) if r < n_rounds else None)

    return [cat[:, j * t_tile:(j + 1) * t_tile] for j in range(3)]


# ---------------------------------------------------------------------------
# v0 variant: the pre-fusion round structure.  ARC is added at the redc TAIL
# (one extra _mod on each 24-channel half when rc is given), the Kawamura
# digit scaling sig = w1*k1 mod q1 is explicit (tables unfolded), and every
# round's rc is broadcast to [48, 3T] before the reduction.  More census ops
# than the "cat" diet, but the adds ride FMAs and Mosaic schedules this
# structure measurably faster (see DEFAULT_LAYOUT note).  Arithmetic bounds
# as in _make_redc; the tail adds stay < 2*q+2 < 2^13 above quasi-canonical,
# far inside the exact f32 floor-mod range.
# ---------------------------------------------------------------------------

def _make_redc_v0(lhs1, lhs2, cols, dots: str = "bf16", est: str = "dot"):
    """Bind constants; returns redc(w [48, X], rc [48, X or 1] | None).
    est="vpu" (int8 dots only) computes the Kawamura alpha as an early
    VPU sublane reduction that overlaps the MXU dot (see _extend_i8)."""
    n = N_CH // 2
    q_all, invq_all = cols[:, 0:1], cols[:, 1:2]
    q1, invq1 = q_all[:n], invq_all[:n]
    q2, invq2 = q_all[n:], invq_all[n:]
    k1 = cols[:n, 2:3]
    c1, c2, e2 = cols[:n, 3:4], cols[:n, 4:5], cols[:n, 5:6]
    neg_m1, neg_m2 = cols[:n, 7:8], cols[:n, 9:10]
    ext = _extend_i8 if dots == "int8" else _extend
    lhs1_b = lhs1 if dots == "int8" else lhs1.astype(jnp.bfloat16)
    lhs2_b = lhs2 if dots == "int8" else lhs2.astype(jnp.bfloat16)
    if est == "x" and dots == "int8":
        c14_b2, c14_b1 = cols[:n, 12:13], cols[:n, 13:14]
        ext1 = lambda sig: _extend_i8_x(sig, lhs1_b, c14_b2, q2, invq2,
                                        neg_m1, invq1, -0.25, True)
        ext2 = lambda tau: _extend_i8_x(tau, lhs2_b, c14_b1, q1, invq1,
                                        neg_m2, invq2, 0.5, False)
    elif est == "vpu" and dots == "int8":
        ext1 = lambda sig: ext(sig, lhs1_b, q2, invq2, neg_m1, -0.25, True,
                               invq_in=invq1)
        ext2 = lambda tau: ext(tau, lhs2_b, q1, invq1, neg_m2, 0.5, False,
                               invq_in=invq2)
    else:
        ext1 = lambda sig: ext(sig, lhs1_b, q2, invq2, neg_m1, -0.25, True)
        ext2 = lambda tau: ext(tau, lhs2_b, q1, invq1, neg_m2, 0.5, False)

    def redc(w, rc=None):
        wq = _mod(w, q_all, invq_all)
        w1, w2 = wq[:n], wq[n:]
        sig = _mod(w1 * k1, q1, invq1)
        s_ext = ext1(sig)
        tau = _mod(w2 * c1 + s_ext * c2, q2, invq2)
        z2_raw = tau * e2
        z1 = ext2(tau)
        if rc is not None:
            z1 = _mod(z1 + rc[:n], q1, invq1)
            z2_raw = z2_raw + rc[n:]
        z2 = _mod(z2_raw, q2, invq2)
        return jnp.concatenate([z1, z2], axis=0)

    return redc, (q_all, invq_all)


def _permutation_v0(words, redc, canon, rc_ref, mds, r_f, r_p, t_tile):
    """Pre-fusion permutation on three [48, T] words: ARC rides the redc
    tail, so every mds_redc takes the round's rc broadcast to [48, 3T]."""
    half = r_f // 2
    n_rounds = r_f + r_p

    def rc_row(r):
        return [rc_ref[:, 128 * r + j:128 * r + j + 1] for j in range(3)]

    def rc_cat(r):
        return jnp.concatenate(
            [jnp.broadcast_to(rc_ref[:, 128 * r + j:128 * r + j + 1],
                              (N_CH, t_tile)) for j in range(3)], axis=1)

    rc0 = rc_row(0)
    words = [canon(w + rc0[j]) for j, w in enumerate(words)]

    def sbox_cat(cat):
        x2 = redc(cat * cat)
        x4 = redc(x2 * x2)
        return redc(x4 * cat)

    def mds_redc(cat, rc_c):
        ws = [cat[:, j * t_tile:(j + 1) * t_tile] for j in range(3)]
        rows = [mds[i][0] * ws[0] + mds[i][1] * ws[1] + mds[i][2] * ws[2]
                for i in range(3)]
        return redc(jnp.concatenate(rows, axis=1), rc_c)

    cat = jnp.concatenate(words, axis=1)      # [48, 3T]

    for r in range(1, half + 1):
        cat = mds_redc(sbox_cat(cat), rc_cat(r))

    def partial_body(ri, cat):
        r = half + 1 + ri
        x0 = cat[:, :t_tile]
        x2 = redc(x0 * x0)
        x4 = redc(x2 * x2)
        x5 = redc(x4 * x0)
        cat = jnp.concatenate([x5, cat[:, t_tile:]], axis=1)
        blk = rc_ref[:, pl.ds(pl.multiple_of(128 * r, 128), 128)]
        rc_c = jnp.concatenate(
            [jnp.broadcast_to(blk[:, j:j + 1], (N_CH, t_tile))
             for j in range(3)], axis=1)
        return mds_redc(cat, rc_c)

    cat = jax.lax.fori_loop(0, r_p, partial_body, cat)

    for k in range(half):
        r = half + 1 + r_p + k
        rc_c = rc_cat(r) if r < n_rounds else jnp.zeros(
            (N_CH, 3 * t_tile), jnp.float32)
        cat = mds_redc(sbox_cat(cat), rc_c)

    return [cat[:, j * t_tile:(j + 1) * t_tile] for j in range(3)]


# ---------------------------------------------------------------------------
# Split-layout variant: state as (B1 half, B2 half) pairs of [24, X] arrays.
# Identical arithmetic op-for-op with _make_redc/_permutation (same mods, same
# dots, same proven bounds) — only the data layout changes: the B1/B2 channel
# halves never live in one array, so the per-reduction entry slice and exit
# concat disappear, and the three words stay separate so the round loop never
# reassembles a [48, 3T] state.
# ---------------------------------------------------------------------------

def _make_redc_split(lhs1, lhs2, cols, dots: str = "bf16"):
    """redc2((w1, w2)) -> (z1, z2) on [24, X] halves; see _make_redc."""
    n = N_CH // 2
    q_all, invq_all = cols[:, 0:1], cols[:, 1:2]
    q1, invq1 = q_all[:n], invq_all[:n]
    q2, invq2 = q_all[n:], invq_all[n:]
    k1 = cols[:n, 2:3]
    c1, c2, e2 = cols[:n, 3:4], cols[:n, 4:5], cols[:n, 5:6]
    neg_m1, neg_m2 = cols[:n, 7:8], cols[:n, 9:10]
    lhs1_b = lhs1 if dots == "int8" else lhs1.astype(jnp.bfloat16)
    lhs2_b = lhs2 if dots == "int8" else lhs2.astype(jnp.bfloat16)
    if dots == "int8":
        ext1 = lambda sig: _extend_i8(sig, lhs1_b, q2, invq2, neg_m1,
                                      -0.25, True)
        tau_of = lambda w2q, sig: _mod(w2q * c1 + ext1(sig) * c2, q2, invq2)
    else:
        # bf16: c2-folded lhs1 (see _packed/_make_redc)
        neg_m1c2 = cols[:n, 14:15]
        tau_of = lambda w2q, sig: _mod(
            w2q * c1 + _extend_nf(sig, lhs1_b, q2, invq2, neg_m1c2,
                                  -0.25, True), q2, invq2)
    ext = _extend_i8 if dots == "int8" else _extend
    ext2 = lambda tau: ext(tau, lhs2_b, q1, invq1, neg_m2, 0.5, False)

    def redc2(w1, w2, digits_ready: bool = False):
        w1q = _mod(w1, q1, invq1)
        w2q = _mod(w2, q2, invq2)
        sig = w1q if digits_ready else _mod(w1q * k1, q1, invq1)
        tau = tau_of(w2q, sig)
        return ext2(tau), _mod(tau * e2, q2, invq2)

    def canon2(w):
        return _mod(w[0], q1, invq1), _mod(w[1], q2, invq2)

    return redc2, canon2


def _permutation_split_opt(words, redc2, canon2, rcf_ref, mds2_ref, opt_ref,
                           q_cols, r_f, r_p, g, n_periods, rem):
    """Optimized-spec permutation, split layout (VALUE-EXACT — the scheme
    spsim upper-bounds): sparse partial rounds with the lazy-column period
    schedule of ops/poseidon_opt.permute_opt_lazy.

    Per partial round: 3 S-box reductions + ONE row-0 reduction; the two
    column words accumulate w_i*S terms (constant x reduced operand — the
    represented integers grow additively, bounded by (g+1)*2p*p << p*M1)
    and are refreshed with one reduction each per g-round period.  Row 0
    consumes the d-rounds-stale columns through precomputed combined
    coefficients cc[d][j] (poseidon_opt docstring).  6 -> 4 + 2/g
    reductions per partial round.

    f32 bounds per channel: products < q^2 < 2^22.6; the row-0 sum mods
    after its leading 3-product+rc chunk (the proven mds bound) and then
    every 2 cc products (q + 2q^2 < 2^23.5); the column accumulators mod
    once per round (q + q^2).  All inside the exact floor-mod range."""
    n = N_CH // 2
    half = r_f // 2
    q1, invq1 = q_cols[0][:n], q_cols[1][:n]
    q2, invq2 = q_cols[0][n:], q_cols[1][n:]

    def rc_row(slot):
        cols3 = [rcf_ref[:, 128 * slot + j:128 * slot + j + 1]
                 for j in range(3)]
        return [(c[:n], c[n:]) for c in cols3]

    def sbox(w):
        x2 = redc2(w[0] * w[0], w[1] * w[1])
        x4 = redc2(x2[0] * x2[0], x2[1] * x2[1])
        return redc2(x4[0] * w[0], x4[1] * w[1])

    def mds_redc(ws, rc, base):
        out = []
        for i in range(3):
            m = [(mds2_ref[:n, base + 3 * i + j:base + 3 * i + j + 1],
                  mds2_ref[n:, base + 3 * i + j:base + 3 * i + j + 1])
                 for j in range(3)]
            a1 = (m[0][0] * ws[0][0] + m[1][0] * ws[1][0]
                  + m[2][0] * ws[2][0])
            a2 = (m[0][1] * ws[0][1] + m[1][1] * ws[1][1]
                  + m[2][1] * ws[2][1])
            if rc is not None:
                a1 = a1 + rc[i][0]
                a2 = a2 + rc[i][1]
            out.append(redc2(a1, a2, digits_ready=True))
        return out

    rc0 = rc_row(0)
    words = [canon2((w[0] + rc0[j][0], w[1] + rc0[j][1]))
             for j, w in enumerate(words)]

    # leading full rounds; the LAST uses the Mpre-folded MDS and bakes the
    # first partial round's scalar constant (rc slot 4, word 0 only)
    for r in range(1, half + 1):
        words = mds_redc([sbox(w) for w in words], rc_row(r),
                         9 if r == half else 0)

    def run_period(blk, x0, x1r, x2r, glen):
        def bc(idx):
            c = blk[:, idx:idx + 1]
            return (c[:n], c[n:])

        bump = bc(5 * g)
        c1 = (_mod(bump[0] * x1r[0], q1, invq1),
              _mod(bump[1] * x1r[1], q2, invq2))
        c2 = (_mod(bump[0] * x2r[0], q1, invq1),
              _mod(bump[1] * x2r[1], q2, invq2))
        svals = []
        for d in range(glen):
            s = sbox(x0)
            svals.append(s)
            w1c, w2c = bc(3 * g + d), bc(4 * g + d)
            c1 = (_mod(c1[0] + w1c[0] * s[0], q1, invq1),
                  _mod(c1[1] + w1c[1] * s[1], q2, invq2))
            c2 = (_mod(c2[0] + w2c[0] * s[0], q1, invq1),
                  _mod(c2[1] + w2c[1] * s[1], q2, invq2))
            m00, v1, v2 = bc(d), bc(g + d), bc(2 * g + d)
            rcn = bc(5 * g + 1 + d)
            a1 = (m00[0] * s[0] + v1[0] * x1r[0] + v2[0] * x2r[0] + rcn[0])
            a2 = (m00[1] * s[1] + v1[1] * x1r[1] + v2[1] * x2r[1] + rcn[1])
            if d > 0:
                a1, a2 = _mod(a1, q1, invq1), _mod(a2, q2, invq2)
            ci = 5 * g + 1 + g + d * (d - 1) // 2
            for j in range(d):
                cc = bc(ci + j)
                a1 = a1 + cc[0] * svals[j][0]
                a2 = a2 + cc[1] * svals[j][1]
                if j % 2 == 1 and j < d - 1:
                    a1, a2 = _mod(a1, q1, invq1), _mod(a2, q2, invq2)
            x0 = redc2(a1, a2, digits_ready=True)
        # trailing pc columns (post-round-0 ARC words 1/2) — zero in every
        # block except the final one, so the body stays uniform under fori
        pc_base = 5 * g + 1 + g + glen * (glen - 1) // 2
        pc1, pc2 = bc(pc_base), bc(pc_base + 1)
        x1r = redc2(c1[0] + pc1[0], c1[1] + pc1[1], digits_ready=True)
        x2r = redc2(c2[0] + pc2[0], c2[1] + pc2[1], digits_ready=True)
        return x0, x1r, x2r

    x0, x1r, x2r = words

    if n_periods:
        def body(pi, carry):
            x0a, x0b, x1a, x1b, x2a, x2b = carry
            blk = opt_ref[:, pl.ds(pl.multiple_of(128 * pi, 128), 128)]
            x0_, x1_, x2_ = run_period(blk, (x0a, x0b), (x1a, x1b),
                                       (x2a, x2b), g)
            return (*x0_, *x1_, *x2_)

        carry = jax.lax.fori_loop(
            0, n_periods, body, (*x0, *x1r, *x2r))
        x0, x1r, x2r = ((carry[0], carry[1]), (carry[2], carry[3]),
                        (carry[4], carry[5]))
    if rem:
        blk = opt_ref[:, 128 * n_periods:128 * n_periods + 128]
        x0, x1r, x2r = run_period(blk, x0, x1r, x2r, rem)

    words = [x0, x1r, x2r]
    # trailing full rounds (post round 0's ARC was baked into the last
    # row0 reduction + the final refresh)
    for kk in range(half):
        rc = rc_row(5 + kk) if kk < half - 1 else None
        words = mds_redc([sbox(w) for w in words], rc, 0)
    return list(words)


def _permutation_split_spsim(words, redc2, canon2, rc_ref, mds, r_f, r_p,
                             q_cols):
    """TIMING-ONLY simulation of the OPTIMIZED-SPEC sparse partial rounds
    (OptimizedPoseidonSpec structure, SURVEY §2.2) at their IDEAL cost:
    per partial round the sparse matrix costs 1 full reduction (row 0's
    dense combination, which must be value-reduced before the next S-box)
    while the two column words update as w_hat*s0 + s_i with only a
    per-channel floor-mod — 4 redc2/round instead of 6.

    This ideal is NOT reachable value-exactly in the RNS representation:
    row 0 multiplies s1/s2 by ~p-sized coefficients, so their represented
    integers must be < ~2^268 (M1*M2 = 2^537) — i.e. fully reduced — every
    round; deferring their reduction poisons row 0's operand bounds.  The
    kernel here therefore produces WRONG values (mds entries stand in for
    the w_hat/v constants, column updates skip the scale bookkeeping) but
    executes the exact op schedule of the ideal sparse round, giving a
    measured UPPER BOUND on any sparse-partial-layer speedup (cf. the
    dots="none" diagnostic).  f32-safe: products < q^2 < 2^22.6, sums
    < 2^23, re-bounded by the floor-mod each round."""
    n = N_CH // 2
    half = r_f // 2
    n_rounds = r_f + r_p
    q1, invq1 = q_cols[0][:n], q_cols[1][:n]
    q2, invq2 = q_cols[0][n:], q_cols[1][n:]

    def rc_row(r):
        cols3 = [rc_ref[:, 128 * r + j:128 * r + j + 1] for j in range(3)]
        return [(c[:n], c[n:]) for c in cols3]

    rc0 = rc_row(0)
    words = [canon2((w[0] + rc0[j][0], w[1] + rc0[j][1]))
             for j, w in enumerate(words)]

    def sbox(w):
        x2 = redc2(w[0] * w[0], w[1] * w[1])
        x4 = redc2(x2[0] * x2[0], x2[1] * x2[1])
        return redc2(x4[0] * w[0], x4[1] * w[1])

    def mds_redc(ws, rc):
        out = []
        for i in range(3):
            a1 = (mds[i][0][0] * ws[0][0] + mds[i][1][0] * ws[1][0]
                  + mds[i][2][0] * ws[2][0])
            a2 = (mds[i][0][1] * ws[0][1] + mds[i][1][1] * ws[1][1]
                  + mds[i][2][1] * ws[2][1])
            if rc is not None:
                a1 = a1 + rc[i][0]
                a2 = a2 + rc[i][1]
            out.append(redc2(a1, a2, digits_ready=True))
        return tuple(out)

    for r in range(1, half + 1):
        words = mds_redc([sbox(w) for w in words], rc_row(r))

    def partial_body(ri, ws):
        r = half + 1 + ri
        s0 = sbox(ws[0])                           # 3 redc2
        blk = rc_ref[:, pl.ds(pl.multiple_of(128 * r, 128), 128)]
        rc0_ = (blk[:n, 0:1], blk[n:, 0:1])
        # row 0: dense combination + ARC -> ONE full reduction
        a1 = (mds[0][0][0] * s0[0] + mds[0][1][0] * ws[1][0]
              + mds[0][2][0] * ws[2][0] + rc0_[0])
        a2 = (mds[0][0][1] * s0[1] + mds[0][1][1] * ws[1][1]
              + mds[0][2][1] * ws[2][1] + rc0_[1])
        w0 = redc2(a1, a2, digits_ready=True)
        # columns: w_hat*s0 + s_i, floor-mod only (the IDEAL the RNS
        # representation cannot reach value-exactly — see docstring)
        w1 = (_mod(mds[1][0][0] * s0[0] + ws[1][0], q1, invq1),
              _mod(mds[1][0][1] * s0[1] + ws[1][1], q2, invq2))
        w2 = (_mod(mds[2][0][0] * s0[0] + ws[2][0], q1, invq1),
              _mod(mds[2][0][1] * s0[1] + ws[2][1], q2, invq2))
        return (w0, w1, w2)

    words = jax.lax.fori_loop(0, r_p, partial_body, tuple(words))

    for k in range(half):
        r = half + 1 + r_p + k
        words = mds_redc([sbox(w) for w in words],
                         rc_row(r) if r < n_rounds else None)
    return list(words)


def _permutation_split(words, redc2, canon2, rc_ref, mds, r_f, r_p):
    """One permutation on a list of three ([24, T], [24, T]) word pairs.
    mds: [3][3] list of ([24, 1], [24, 1]) residue-column pairs (B1 rows
    k1-scaled exactly as in the cat layout — see _packed)."""
    n = N_CH // 2
    half = r_f // 2
    n_rounds = r_f + r_p

    def rc_row(r):
        cols3 = [rc_ref[:, 128 * r + j:128 * r + j + 1] for j in range(3)]
        return [(c[:n], c[n:]) for c in cols3]

    rc0 = rc_row(0)
    words = [canon2((w[0] + rc0[j][0], w[1] + rc0[j][1]))
             for j, w in enumerate(words)]

    def sbox(w):
        x2 = redc2(w[0] * w[0], w[1] * w[1])
        x4 = redc2(x2[0] * x2[0], x2[1] * x2[1])
        return redc2(x4[0] * w[0], x4[1] * w[1])

    def mds_redc(ws, rc):
        out = []
        for i in range(3):
            a1 = (mds[i][0][0] * ws[0][0] + mds[i][1][0] * ws[1][0]
                  + mds[i][2][0] * ws[2][0])
            a2 = (mds[i][0][1] * ws[0][1] + mds[i][1][1] * ws[1][1]
                  + mds[i][2][1] * ws[2][1])
            if rc is not None:
                a1 = a1 + rc[i][0]
                a2 = a2 + rc[i][1]
            out.append(redc2(a1, a2, digits_ready=True))
        return tuple(out)

    for r in range(1, half + 1):
        words = mds_redc([sbox(w) for w in words], rc_row(r))

    def partial_body(ri, ws):
        r = half + 1 + ri
        ws = (sbox(ws[0]), ws[1], ws[2])
        blk = rc_ref[:, pl.ds(pl.multiple_of(128 * r, 128), 128)]
        rc = [(blk[:n, j:j + 1], blk[n:, j:j + 1]) for j in range(3)]
        return mds_redc(list(ws), rc)

    words = jax.lax.fori_loop(0, r_p, partial_body, tuple(words))

    for k in range(half):
        r = half + 1 + r_p + k
        words = mds_redc([sbox(w) for w in words],
                         rc_row(r) if r < n_rounds else None)
    return list(words)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _split_io(mode: str, io, run, cols, t_tile: int, n_perms: int):
    """Shared absorb/squeeze io for the split-pair layouts."""
    n = N_CH // 2
    split = lambda x: (x[:n], x[n:])
    padd = lambda w, c: (w[0] + c[0], w[1] + c[1])
    if mode == "perm":
        st_ref, out_ref = io
        words = [split(st_ref[48 * j:48 * (j + 1)]) for j in range(3)]
        for _ in range(n_perms):
            words = run(words)
        for j in range(3):
            out_ref[48 * j:48 * j + n] = words[j][0]
            out_ref[48 * j + n:48 * (j + 1)] = words[j][1]
        return
    iv0 = cols[:, 10:11]
    one = cols[:, 11:12]
    iv0w = tuple(jnp.broadcast_to(h, (n, t_tile)) for h in split(iv0))
    onep = split(one)
    if mode == "hash2":
        a_ref, b_ref, out_ref = io
        words = [iv0w, split(a_ref[:]), split(b_ref[:])]
        words = run(words)
        words = [words[0], padd(words[1], onep), words[2]]
        words = run(words)
    else:
        a_ref, b_ref, c_ref, out_ref = io
        words = [iv0w, split(a_ref[:]), split(b_ref[:])]
        words = run(words)
        words = [words[0], padd(words[1], split(c_ref[:])),
                 padd(words[2], onep)]
        words = run(words)
    out_ref[:n] = words[1][0]
    out_ref[n:] = words[1][1]


def _make_kernel(n_perms: int, t_tile: int, mode: str, dots: str = "bf16",
                 layout: str | None = None):
    """mode: 'perm' (n_perms permutations), 'hash2', 'hash3'."""
    if layout is None:
        layout = _active_layout
    if layout == "spsim":
        # timing-only diagnostic (columns never reduced — numerically WRONG
        # outputs).  One keyword must not be enough to put it on a data
        # path: require the explicit unsound spelling "spsim!" (mirrors the
        # set_layout refusal; used by tools/ab_kernel.py A/Bs only).
        raise ValueError(
            "layout 'spsim' is a timing-only diagnostic with numerically "
            "wrong outputs; spell it 'spsim!' to opt in explicitly")
    if layout == "spsim!":
        layout = "spsim"
    if layout.startswith("opt"):
        g = _opt_g(layout)
        (rcf_np, mds2_np, optk_np, lhs1_bf, lhs2_bf, lhs1_i8, lhs2_i8,
         cols_np, r_f, r_p, n_per, rem) = _packed_opt(g)
        lhs1_np, lhs2_np = (lhs1_i8, lhs2_i8) if dots == "int8" else \
            (lhs1_bf, lhs2_bf)

        def kernel(rcf_ref, mds2_ref, opt_ref, lhs1_ref, lhs2_ref, cols_ref,
                   *io):
            cols = cols_ref[:]
            redc2, canon2 = _make_redc_split(lhs1_ref[:], lhs2_ref[:], cols,
                                             dots=dots)
            run = partial(_permutation_split_opt, redc2=redc2, canon2=canon2,
                          rcf_ref=rcf_ref, mds2_ref=mds2_ref[:],
                          opt_ref=opt_ref,
                          q_cols=(cols[:, 0:1], cols[:, 1:2]),
                          r_f=r_f, r_p=r_p, g=g, n_periods=n_per, rem=rem)
            _split_io(mode, io, run, cols, t_tile, n_perms)

        return kernel, (rcf_np, mds2_np, optk_np, lhs1_np, lhs2_np, cols_np)
    (rc_np, mds_np, lhs1_bf, lhs2_bf, lhs1_i8, lhs2_i8, cols_np,
     r_f, r_p) = _packed_v0() if layout.startswith("v0") else _packed()
    if layout == "v0x" and dots == "int8":
        # drop the 3 est rows: 72-row lhs fills int8 sublane tiles cleanly
        lhs1_i8, lhs2_i8 = lhs1_i8[:-3], lhs2_i8[:-3]
    lhs1_np, lhs2_np = (lhs1_i8, lhs2_i8) if dots == "int8" else \
        (lhs1_bf, lhs2_bf)
    n = N_CH // 2

    def kernel(rc_ref, mds_ref, lhs1_ref, lhs2_ref, cols_ref, *io):
        cols = cols_ref[:]
        lhs1, lhs2 = lhs1_ref[:], lhs2_ref[:]
        mds_arr = mds_ref[:]                  # [48, 9]
        if layout in ("split", "spsim"):
            redc2, canon2 = _make_redc_split(lhs1, lhs2, cols, dots=dots)
            mds = [[(mds_arr[:n, 3 * i + j:3 * i + j + 1],
                     mds_arr[n:, 3 * i + j:3 * i + j + 1])
                    for j in range(3)] for i in range(3)]
            if layout == "spsim":
                run = partial(_permutation_split_spsim, redc2=redc2,
                              canon2=canon2, rc_ref=rc_ref, mds=mds,
                              r_f=r_f, r_p=r_p,
                              q_cols=(cols[:, 0:1], cols[:, 1:2]))
            else:
                run = partial(_permutation_split, redc2=redc2, canon2=canon2,
                              rc_ref=rc_ref, mds=mds, r_f=r_f, r_p=r_p)
        elif layout in ("v0", "v0e", "v0x"):
            redc, (q_all, invq_all) = _make_redc_v0(
                lhs1, lhs2, cols, dots=dots,
                est={"v0e": "vpu", "v0x": "x"}.get(layout, "dot"))
            canon = lambda x: _mod(x, q_all, invq_all)
            mds = [[mds_arr[:, 3 * i + j:3 * i + j + 1] for j in range(3)]
                   for i in range(3)]
            run = partial(_permutation_v0, redc=redc, canon=canon,
                          rc_ref=rc_ref, mds=mds, r_f=r_f, r_p=r_p,
                          t_tile=t_tile)
        else:
            redc, (q_all, invq_all) = _make_redc(lhs1, lhs2, cols, dots=dots)
            canon = lambda x: _mod(x, q_all, invq_all)
            mds = [[mds_arr[:, 3 * i + j:3 * i + j + 1] for j in range(3)]
                   for i in range(3)]
            run = partial(_permutation, redc=redc, canon=canon, rc_ref=rc_ref,
                          mds=mds, r_f=r_f, r_p=r_p, t_tile=t_tile)

        if layout in ("split", "spsim"):
            _split_io(mode, io, run, cols, t_tile, n_perms)
        elif mode == "perm":
            st_ref, out_ref = io
            # state io is 2D [3*48, T]: word j = rows 48j..48j+47 (Mosaic
            # lowers leading-index reads of 3D refs to unsupported gathers)
            words = [st_ref[48 * j:48 * (j + 1)] for j in range(3)]
            for _ in range(n_perms):
                words = run(words)
            for j in range(3):
                out_ref[48 * j:48 * (j + 1)] = words[j]
        else:
            iv0 = cols[:, 10:11]
            one = cols[:, 11:12]
            if mode == "hash2":
                a_ref, b_ref, out_ref = io
                words = [jnp.broadcast_to(iv0, (N_CH, t_tile)),
                         a_ref[:], b_ref[:]]
                words = run(words)
                words = [words[0], words[1] + one, words[2]]
                words = run(words)
            else:
                a_ref, b_ref, c_ref, out_ref = io
                words = [jnp.broadcast_to(iv0, (N_CH, t_tile)),
                         a_ref[:], b_ref[:]]
                words = run(words)
                words = [words[0], words[1] + c_ref[:], words[2] + one]
                words = run(words)
            out_ref[:] = words[1]

    return kernel, (rc_np, mds_np, lhs1_np, lhs2_np, cols_np)


def _const_specs(consts):
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in consts]


@lru_cache(maxsize=None)
def _permute_fn(n_perms: int, t_tile: int, interpret: bool,
                dots: str = "bf16", layout: str = DEFAULT_LAYOUT):
    kernel, consts = _make_kernel(n_perms, t_tile, "perm", dots=dots,
                                  layout=layout)

    @jax.jit
    def f(st):
        # st: f32[3*48, B] (word j = rows 48j..48j+47)
        b = st.shape[-1]
        if b % t_tile:
            # a non-dividing batch would compile a grid of b//t_tile steps
            # and SILENTLY skip the remainder (grid 0 = kernel never runs)
            raise ValueError(
                f"permute_n: batch {b} not a multiple of t_tile {t_tile}")
        grid = (b // t_tile,)
        spec = pl.BlockSpec((3 * N_CH, t_tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=_const_specs(consts) + [spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(st.shape, jnp.float32),
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )(*[jnp.asarray(c) for c in consts], st)

    return f


def permute_n(st, n_perms: int = 1, t_tile: int = DEFAULT_TILE,
              interpret: bool = False, dots: str = DEFAULT_DOTS,
              layout: str | None = None):
    """n_perms chained permutations on f32[3*48, B] (B % t_tile == 0;
    word j occupies rows 48j..48j+47)."""
    return _permute_fn(n_perms, t_tile, interpret, dots,
                       layout or _active_layout)(st)


@lru_cache(maxsize=None)
def _hash_fn(mode: str, t_tile: int, interpret: bool, dots: str = "bf16",
             layout: str = DEFAULT_LAYOUT):
    kernel, consts = _make_kernel(1, t_tile, mode, dots=dots, layout=layout)
    n_in = 2 if mode == "hash2" else 3

    @jax.jit
    def f(*args):
        b = args[0].shape[-1]
        if b % t_tile:
            # the public hash wrappers _pad() to the tile; a direct caller
            # with a non-dividing batch would silently lose the remainder
            raise ValueError(
                f"{mode}: batch {b} not a multiple of t_tile {t_tile}")
        grid = (b // t_tile,)
        io_spec = pl.BlockSpec((N_CH, t_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=_const_specs(consts) + [io_spec] * n_in,
            out_specs=io_spec,
            out_shape=jax.ShapeDtypeStruct((N_CH, b), jnp.float32),
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )(*[jnp.asarray(c) for c in consts], *args)

    return f


def _pad(x, t_tile):
    b = x.shape[-1]
    pad = (-b) % t_tile
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1)
    return x, b


def hash2(a, b, t_tile: int = DEFAULT_TILE, interpret: bool = False,
          dots: str = DEFAULT_DOTS, layout: str | None = None):
    """Canonical limbs uint32[16, B] x2 -> uint32[16, B] (Merkle node)."""
    ra, nb = _pad(field_rns.from_limbs(a), t_tile)
    rb, _ = _pad(field_rns.from_limbs(b), t_tile)
    out = _hash_fn("hash2", t_tile, interpret, dots,
                   layout or _active_layout)(ra, rb)
    return field_rns.to_limbs(out[:, :nb])


def hash2_nodes(ra, rb, t_tile: int = DEFAULT_TILE, interpret: bool = False,
                dots: str = DEFAULT_DOTS, layout: str | None = None):
    """Residue nodes f32[48, B] x2 -> f32[48, B] — the Merkle-level fast
    path: same fused kernel as hash2 with NO limb conversions."""
    ra, nb = _pad(ra, t_tile)
    rb, _ = _pad(rb, t_tile)
    out = _hash_fn("hash2", t_tile, interpret, dots,
                   layout or _active_layout)(ra, rb)
    return out[:, :nb]


def hash3_leaf(a, b, c, t_tile: int = DEFAULT_TILE, interpret: bool = False,
               dots: str = DEFAULT_DOTS, layout: str | None = None):
    """Canonical limbs uint32[16, B] x3 -> residue nodes f32[48, B]."""
    ra, nb = _pad(field_rns.from_limbs(a), t_tile)
    rb, _ = _pad(field_rns.from_limbs(b), t_tile)
    rc, _ = _pad(field_rns.from_limbs(c), t_tile)
    out = _hash_fn("hash3", t_tile, interpret, dots,
                   layout or _active_layout)(ra, rb, rc)
    return out[:, :nb]


def hash3(a, b, c, t_tile: int = DEFAULT_TILE, interpret: bool = False,
          dots: str = DEFAULT_DOTS, layout: str | None = None):
    """Canonical limbs uint32[16, B] x3 -> uint32[16, B] (indexed leaf)."""
    ra, nb = _pad(field_rns.from_limbs(a), t_tile)
    rb, _ = _pad(field_rns.from_limbs(b), t_tile)
    rc, _ = _pad(field_rns.from_limbs(c), t_tile)
    out = _hash_fn("hash3", t_tile, interpret, dots,
                   layout or _active_layout)(ra, rb, rc)
    return field_rns.to_limbs(out[:, :nb])
