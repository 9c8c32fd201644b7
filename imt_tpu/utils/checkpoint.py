"""Checkpoint / resume for indexed trees.

The reference's only persistence hook is the serde derive on its native leaf
(src/utils.rs:12).  Here checkpointing is a first-class subsystem: atomic
npz snapshots of the leaf SoA (vals / next_vals / next_idxs + cursor), with
the Merkle levels rebuilt on load (leaves are the source of truth, exactly
like the reference's rebuild discipline at src/indexed_merkle_tree.rs:726-730).

Round-trips are symmetric across all three containers: dense
(`IndexedMerkleTree`), sparse-prefix (`SparseIndexedMerkleTree`), and
mesh-sharded (`ShardedIndexedMerkleTree`).  A sharded tree's snapshot
carries a `sharded` marker; `load(path)` restores it onto a mesh (the
default mesh, or one passed as `load(path, mesh=...)`).  Passing `mesh=`
also force-restores a dense/sparse snapshot sharded — resuming a
single-device run onto a pod slice.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

from ..tree.indexed import IndexedMerkleTree


def save(tree, path: str) -> None:
    """Atomic snapshot (write temp + rename).  Accepts dense, sparse and
    sharded trees; sharded snapshots are marked so `load` restores them
    onto a mesh without the caller knowing the container type."""
    arrays = dict(tree.to_arrays())
    from ..parallel.sharded import ShardedIndexedMerkleTree
    if isinstance(tree, ShardedIndexedMerkleTree):
        arrays["sharded"] = np.int64(1)
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez_compressed(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load(path: str, mesh=None):
    """Load a snapshot; dispatches on the `sparse` / `sharded` markers so
    dense, sparse-prefix and mesh-sharded trees round-trip through the same
    files.  `mesh=` restores onto that mesh (required only to override the
    default mesh, or to shard a snapshot written by a non-sharded tree)."""
    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files}
    if mesh is not None or int(arrays.get("sharded", 0)):
        from ..parallel.sharded import ShardedIndexedMerkleTree
        return ShardedIndexedMerkleTree.from_arrays(arrays, mesh=mesh)
    if int(arrays.get("sparse", 0)):
        from ..tree.sparse import SparseIndexedMerkleTree
        return SparseIndexedMerkleTree.from_arrays(arrays)
    return IndexedMerkleTree.from_arrays(arrays)
