"""Poseidon backend dispatch — one hash2/hash3 surface, multiple engines.

All tree/parallel code calls through this module; the engine is resolved at
trace time, so the choice is baked into each jitted program when it first
compiles.  Pick explicitly with set_backend()/IMT_HASH_ENGINE, or let the
platform decide:

* ``pallas`` — fused Mosaic kernel for the RNS permutation
             (poseidon_rns_pallas.py): ~4x the XLA RNS path on a v5e chip.
             Falls back to ``rns`` for small batches (below
             PALLAS_MIN_BATCH): each distinct batch size costs a ~10 min
             one-time Mosaic compile, worth paying only on wide levels.
* ``rns``  — f32 residue arithmetic + MXU base-extension dots
             (poseidon_rns.py).  ~8x the CIOS path on TPU; bit-exact.
* ``cios`` — uint32 16-bit-limb CIOS Montgomery (poseidon_jax.py).  The
             engine the dedicated parity tests anchor on.

Default: ``pallas`` on TPU-like platforms (tpu/axon), ``rns`` elsewhere
(the f32 residue ops vectorize ~9x better than emulated uint32 CIOS on
AVX-512 hosts, which is what makes the CPU test suite tolerable).

Switch BEFORE building trees: jitted tree steps cache the engine they were
traced with (functools.lru_cache on the step builders).
"""

from __future__ import annotations

import os

_backend: str | None = None      # explicit override; None = auto

# Below this batch width the pallas backend delegates to the XLA rns path
# (dispatch is at trace time on static shapes, so the choice is per-site).
PALLAS_MIN_BATCH = 2048


def set_backend(name: str | None) -> None:
    """Force a backend ("pallas" | "rns" | "cios") or None = auto-detect."""
    global _backend
    if name not in (None, "pallas", "rns", "cios"):
        raise ValueError(f"unknown hash backend: {name!r}")
    _backend = name


def backend() -> str:
    if _backend is not None:
        return _backend
    env = os.environ.get("IMT_HASH_ENGINE")
    if env in ("pallas", "rns", "cios"):
        return env
    import jax
    return "pallas" if jax.devices()[0].platform in ("tpu", "axon") \
        else "rns"


def _tile_for(width: int) -> int:
    """Pallas tile for a batch width.  Large widths use the swept default;
    small widths share ONE tile-128 kernel structure (padded lanes), which
    replaces the unfused XLA path on the top-of-tree levels — those tiny
    per-level hashes cost ~65 HBM round-trips each under XLA and dominated
    the batched-insert wall time (tools/profile_batch.py).

    Round-5 note: WIDE_TILE (3328) measures +0.9%/lane over 2048 at
    exact-fit batches, but tree widths are powers of two, so its 1.56%
    lane padding EXCEEDS the gain — 2048 stays the tree-path tile
    (pk.WIDE_TILE serves the headline bench, whose batch is chosen to fit
    it exactly)."""
    from . import poseidon_rns_pallas as pk
    if width >= pk.DEFAULT_TILE:
        return pk.DEFAULT_TILE
    return 128


def _mod(batch: int):
    name = backend()
    if name == "pallas" and batch < PALLAS_MIN_BATCH:
        name = "rns"
    if name == "pallas":
        from . import poseidon_rns_pallas as m
    elif name == "rns":
        from . import poseidon_rns as m
    else:
        from . import poseidon_jax as m
    return m


def hash2(a, b):
    """Batched 2-to-1 Poseidon hash, canonical limbs uint32[16, B]."""
    return _mod(a.shape[-1]).hash2(a, b)


def hash3(a, b, c):
    """Batched 3-to-1 Poseidon hash (indexed leaf), canonical limbs."""
    return _mod(a.shape[-1]).hash3(a, b, c)


# ---------------------------------------------------------------------------
# Node representation — engine-native Merkle node storage.
#
# Tree code stores interior nodes (hash outputs) in the hash engine's native
# representation and hashes node->node WITHOUT converting through canonical
# limbs: for the rns/pallas engines that is Montgomery-domain RNS residues
# f32[48, B], so the per-level to_limbs (a full CRT reconstruction + digit
# carry normalization, comparable in cost to a permutation) and from_limbs
# disappear from every tree walk.  For the cios engine the representation IS
# canonical limbs (identity).  Conversions happen only at witness/API
# boundaries (roots, proofs, checkpoints).
#
# Representations are interchangeable across rns<->pallas dispatch (both are
# quasi-canonical Montgomery residues; values mod p are exact even where raw
# representatives differ), but NOT across a cios<->rns backend switch —
# hashing.set_backend must be called before building trees (as documented
# above: jitted tree steps cache the engine they were traced with).
# ---------------------------------------------------------------------------

def node_repr() -> str:
    """The active node representation: "rns" (f32[48, B] Montgomery
    residues) or "limbs" (canonical uint32[16, B])."""
    return "limbs" if backend() == "cios" else "rns"


def enc_nodes(limbs):
    """Canonical limbs uint32[16, B] -> node representation."""
    if node_repr() == "limbs":
        return limbs
    from . import field_rns
    return field_rns.from_limbs(limbs)


def dec_nodes(nodes):
    """Node representation -> canonical limbs uint32[16, B]."""
    if node_repr() == "limbs":
        return nodes
    from . import field_rns
    return field_rns.to_limbs(nodes)


def hash2_nodes(a, b):
    """Batched 2-to-1 hash, node representation in AND out.  On the pallas
    backend EVERY width runs the fused kernel (width-scaled tile, small
    widths padded to 128 lanes) — no XLA fallback on narrow tree levels."""
    if node_repr() == "limbs":
        return hash2(a, b)
    if backend() == "pallas":
        from . import poseidon_rns_pallas as pk
        return pk.hash2_nodes(a, b, t_tile=_tile_for(a.shape[-1]))
    from . import poseidon_rns
    return poseidon_rns.hash2_nodes(a, b)


def hash3_leaf(a, b, c):
    """Batched 3-to-1 leaf hash: canonical limb inputs (leaf field values),
    node-representation output."""
    if node_repr() == "limbs":
        return hash3(a, b, c)
    if backend() == "pallas":
        from . import poseidon_rns_pallas as pk
        return pk.hash3_leaf(a, b, c, t_tile=_tile_for(a.shape[-1]))
    from . import poseidon_rns
    return poseidon_rns.hash3_leaf(a, b, c)


def hash_fixed(cols):
    """Batched fixed-length hash of any arity (the halo2-base
    hash_fix_len_array contract).  Lengths 2/3 route through the dispatched
    hash2/hash3 fast paths; other lengths run the ACTIVE backend's sponge
    (cios -> poseidon_jax, rns -> poseidon_rns; the pallas kernel only
    implements the chained 2/3 shapes, so the pallas backend uses its
    documented rns fallback for other arities — same node-compatible
    representation, bit-exact)."""
    if len(cols) == 2:
        return hash2(*cols)
    if len(cols) == 3:
        return hash3(*cols)
    if backend() == "cios":
        from . import poseidon_jax
        return poseidon_jax.default_engine().hash_fixed(list(cols))
    from . import poseidon_rns
    return poseidon_rns.default_engine().hash_fixed(list(cols))
