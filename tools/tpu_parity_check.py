"""On-chip bit-exactness spot check for the tree paths.

Runs the reference insertion sequence + a batched insert on the REAL TPU
(pallas backend, width-scaled tiles incl. the tile-128 top-of-tree path)
and compares every root against the pure-python oracle.  This is the
hardware twin of the CPU interpret-mode kernel tests.

Usage: python tools/tpu_parity_check.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache_tpu"))
    assert jax.devices()[0].platform in ("tpu", "axon"), \
        "run on the real chip"

    from imt_tpu.tree import indexed
    from imt_tpu.tree.sparse import SparseIndexedMerkleTree
    from imt_tpu.tree.reference_oracle import OracleIndexedTree

    # sequential replay (tile-128 kernels on every level width)
    t = indexed.IndexedMerkleTree(3)
    o = OracleIndexedTree(depth=3)
    for v in [30, 10, 20, 5, 50, 35]:
        w = t.insert(v)
        o.insert(v)
        assert bool(w.ok.all()), v
        assert t.get_root_int() == o.get_root(), f"root mismatch at {v}"
    print("sequential replay: bit-exact on chip")

    # batched insert on a sparse tree (mixed tile widths + width switch)
    import random
    rng = random.Random(3)
    vals = [rng.randrange(1, 1 << 253) for _ in range(64)]
    tb = SparseIndexedMerkleTree(32, initial_capacity_log2=8)
    ob = OracleIndexedTree(depth=32)
    ok = tb.insert_batch(vals)
    assert ok.all()
    for v in vals:
        ob.insert(v)
    assert tb.get_root_int() == ob.get_root(), "batched root mismatch"
    print("batched sparse insert (64 values, depth 32): bit-exact on chip")

    # witness batch: predicate must accept everything
    tw = indexed.IndexedMerkleTree(8)
    wb = tw.insert_batch(vals[:32], witness=True)
    assert wb.ok.all()
    indexed.check_insert_witness(wb)
    print("witness batch (32 values): predicate-verified on chip")
    return 0


if __name__ == "__main__":
    sys.exit(main())
