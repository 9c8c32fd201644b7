"""Typed configuration for the engine.

The reference's only configuration is compile-time const generics (T/RATE on
the tree and hasher, R_F/R_P at construction — src/utils.rs:6,
src/indexed_merkle_tree.rs:362-365) plus the circuit-size builder (k,
lookup_bits — :434-437).  Here the same knobs are a dataclass; circuit-size
knobs have no TPU analog and are replaced by batching/mesh shape.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield


@dataclass(frozen=True)
class PoseidonConfig:
    t: int = 3
    rate: int = 2
    r_f: int = 8
    r_p: int = 57


@dataclass(frozen=True)
class EngineConfig:
    poseidon: PoseidonConfig = dfield(default_factory=PoseidonConfig)
    tree_depth: int = 32
    # "rns" (f32 residue channels + MXU base-extension dots — fastest on
    # TPU), "cios" (uint32 16-bit-limb CIOS — CPU/test default); see
    # ops/hashing.py for the dispatch (default: auto by platform)
    hash_engine: str = "auto"
    batch_size: int = 4096
    mesh_axis: str = "shard"
    mesh_devices: int | None = None  # None = all visible devices
