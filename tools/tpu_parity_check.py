"""On-chip bit-exactness spot check for the tree paths.

Replays the reference insertion sequence (src/indexed_merkle_tree.rs:679-803)
plus a batched sparse insert on the REAL TPU (pallas backend, width-scaled
tiles incl. the tile-128 top-of-tree path) and compares every root against
the pure-python oracle.  This is the hardware twin of the CPU
interpret-mode kernel tests, and it runs from `bench.py --artifact` so
every round's artifact carries an on-chip correctness bit
(`"tpu_parity": true`).

The depth-32 oracle comparison uses the sparse-prefix discipline: the
python oracle replays the sequence on the ACTIVE prefix (the leftmost
2^active_depth slots — the only occupied ones) and folds the prefix root up
the zero-subtree spine, exactly like tree/sparse.py does on device.

Usage: python tools/tpu_parity_check.py
"""

from __future__ import annotations

import os
import sys

# imt_tpu is an installed package (pip install -e . — pyproject.toml)


def spine_fold_oracle(root: int, depth: int, full_depth: int, params) -> int:
    """Active-prefix root -> full-depth root over the zero-subtree spine
    (host twin of tree/indexed._spine_fold)."""
    from imt_tpu.ops.poseidon_ref import hash_fixed
    z = hash_fixed([0, 0, 0], params)
    zs = [z]
    for _ in range(full_depth - 1):
        zs.append(hash_fixed([zs[-1], zs[-1]], params))
    for lvl in range(depth, full_depth):
        root = hash_fixed([root, zs[lvl]], params)
    return root


def run_parity() -> dict:
    """Run the on-chip parity checks; returns a result dict for the bench
    artifact.  Raises on any mismatch."""
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache_tpu"))
    platform = jax.devices()[0].platform
    assert platform in ("tpu", "axon"), "run on the real chip"

    from imt_tpu.ops.poseidon_ref import generate_params
    from imt_tpu.tree import indexed
    from imt_tpu.tree.sparse import SparseIndexedMerkleTree
    from imt_tpu.tree.reference_oracle import OracleIndexedTree

    params = generate_params()
    checks = {}

    # 1. sequential reference replay (the 6-round loop,
    #    src/indexed_merkle_tree.rs:683-690) — every intermediate root
    t = indexed.IndexedMerkleTree(3)
    o = OracleIndexedTree(depth=3, params=params)
    for v in [30, 10, 20, 5, 50, 35]:
        w = t.insert(v)
        o.insert(v)
        assert bool(w.ok.all()), v
        assert t.get_root_int() == o.get_root(), f"root mismatch at {v}"
    checks["sequential_replay_d3"] = True
    print("sequential replay (6 rounds, depth 3): bit-exact on chip")

    # 2. batched insert on a depth-32 SPARSE tree vs the prefix oracle +
    #    zero-spine fold (mixed tile widths + width switch + spine)
    import random
    rng = random.Random(3)
    vals = [rng.randrange(1, 1 << 253) for _ in range(16)]
    tb = SparseIndexedMerkleTree(32, initial_capacity_log2=5)
    ok = tb.insert_batch(vals)
    assert ok.all()
    ob = OracleIndexedTree(depth=5, params=params)
    for v in vals:
        ob.insert(v)
    want = spine_fold_oracle(ob.get_root(), 5, 32, params)
    assert tb.get_root_int() == want, "batched sparse root mismatch"
    checks["batched_sparse_d32"] = True
    print("batched sparse insert (16 values, depth 32): bit-exact on chip")

    # 3. witness batch: every accepted bundle satisfies insert_leaf
    tw = indexed.IndexedMerkleTree(8)
    wb = tw.insert_batch(vals, witness=True)
    assert wb.ok.all()
    indexed.check_insert_witness(wb)
    checks["witness_batch_predicate"] = True
    print("witness batch (16 values): predicate-verified on chip")

    return {"tpu_parity": True, "platform": platform, "checks": checks}


def main() -> int:
    run_parity()
    return 0


if __name__ == "__main__":
    sys.exit(main())
