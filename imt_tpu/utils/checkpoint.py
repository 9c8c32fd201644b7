"""Checkpoint / resume for indexed trees.

The reference's only persistence hook is the serde derive on its native leaf
(src/utils.rs:12).  Here checkpointing is a first-class subsystem: atomic
npz snapshots of the leaf SoA (vals / next_vals / next_idxs + cursor), with
the Merkle levels rebuilt on load (leaves are the source of truth, exactly
like the reference's rebuild discipline at src/indexed_merkle_tree.rs:726-730).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

from ..tree.indexed import IndexedMerkleTree


def save(tree: IndexedMerkleTree, path: str) -> None:
    """Atomic snapshot (write temp + rename)."""
    arrays = tree.to_arrays()
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


def load(path: str):
    """Load a snapshot; dispatches on the `sparse` marker so dense and
    sparse-prefix trees round-trip through the same files."""
    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files}
    if int(arrays.get("sparse", 0)):
        from ..tree.sparse import SparseIndexedMerkleTree
        return SparseIndexedMerkleTree.from_arrays(arrays)
    return IndexedMerkleTree.from_arrays(arrays)
