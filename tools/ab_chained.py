"""A/B: per-call pipelined insert_batch vs scan-chained insert_batches.

Round-3 artifact surprise: at the config-4 shape (depth 24 sparse -> active
16, K=4096) the chained path measured 65K inserts/s vs round-2's 129K for
the per-call path, while at config-5 scale chaining was a 2.3x WIN.  This
tool times the two dispatch structures (plus b=1 chained, isolating the
scan/truncated-carry structure from the group size) on identical state so
the regression can be attributed.

Usage: python tools/ab_chained.py [--depth 24 --cap 16 --k 4096 --iters 8]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=24)
    ap.add_argument("--cap", type=int, default=16)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--group", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import numpy as np
    import jax.numpy as jnp
    import random
    from imt_tpu.ops import field
    from imt_tpu.tree.sparse import SparseIndexedMerkleTree

    rng = random.Random(0xAB)
    k, iters = args.k, args.iters
    n_pre = iters * (args.rounds + 1) * 3 + 3

    log(f"pre-packing {n_pre} batches of {k} ...")
    batches = [np.asarray(field.ints_to_limbs(
        [rng.randrange(1, 1 << 253) for _ in range(k)]))
        for _ in range(n_pre)]
    bi = [0]

    def take(n):
        out = batches[bi[0]:bi[0] + n]
        bi[0] += n
        return out

    def fresh():
        return SparseIndexedMerkleTree(args.depth,
                                       initial_capacity_log2=args.cap)

    def run_percall(tag):
        tree = fresh()
        warm = take(1)[0]
        t0 = time.time()
        tree.insert_batch(warm, as_numpy=True)
        log(f"{tag}: compile+first {time.time()-t0:.1f}s")
        bs = take(iters)
        t0 = time.time()
        oks = [tree.insert_batch(b, as_numpy=False) for b in bs]
        total = int(np.asarray(jnp.stack(oks)).sum())
        dt = time.time() - t0
        log(f"{tag}: {iters*k} inserts in {dt:.3f}s -> "
            f"{iters*k/dt:,.0f}/s (accepted {total})")
        return iters * k / dt

    def run_chained(tag, b):
        tree = fresh()
        warm = np.stack(take(b))
        t0 = time.time()
        tree.insert_batches(warm, as_numpy=True)
        log(f"{tag}: compile+first {time.time()-t0:.1f}s")
        n_groups = iters // b
        gs = [np.stack(take(b)) for _ in range(n_groups)]
        t0 = time.time()
        oks = [tree.insert_batches(g, as_numpy=False) for g in gs]
        total = int(np.asarray(jnp.concatenate(oks)).sum())
        dt = time.time() - t0
        n = n_groups * b * k
        log(f"{tag}: {n} inserts in {dt:.3f}s -> {n/dt:,.0f}/s "
            f"(accepted {total})")
        return n / dt

    results = {"percall": [], f"chain{args.group}": [], "chain1": []}
    for r in range(args.rounds):
        results["percall"].append(run_percall(f"r{r} percall"))
        results[f"chain{args.group}"].append(
            run_chained(f"r{r} chain{args.group}", args.group))
        results["chain1"].append(run_chained(f"r{r} chain1", 1))
    import statistics
    for tag, vs in results.items():
        log(f"median {tag}: {statistics.median(vs):,.0f} inserts/s")


if __name__ == "__main__":
    main()
