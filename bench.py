"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: Poseidon permutations/s on one chip (the permutation is the hot
inner loop of the entire system — SURVEY §3.1).  vs_baseline is the ratio
against the 10M perms/s/chip north-star target (BASELINE.md; the reference
publishes no numbers).

Usage:
    python bench.py            # full run on the default platform (TPU)
    python bench.py --smoke    # tiny shapes, quick sanity
    python bench.py --insert   # secondary: batched leaf-inserts/s, depth 24
"""

from __future__ import annotations

import argparse
import json
import random
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def bench_perms(batch: int, iters: int) -> float:
    import jax
    import jax.numpy as jnp

    from imt_tpu.ops import field, poseidon_jax
    jax.config.update("jax_compilation_cache_dir", 
                      __file__.rsplit("/", 1)[0] + "/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    rng = random.Random(0xBE7C)
    a = jnp.asarray(field.ints_to_limbs(
        [rng.randrange(field.P) for _ in range(batch)]))
    b = jnp.asarray(field.ints_to_limbs(
        [rng.randrange(field.P) for _ in range(batch)]))

    f = jax.jit(poseidon_jax.Poseidon(unroll=True).hash2)
    log(f"compiling hash2 for batch={batch} ...")
    t0 = time.time()
    out = jax.block_until_ready(f(a, b))
    log(f"compile+first run: {time.time()-t0:.1f}s")

    import numpy as np
    t0 = time.time()
    for _ in range(iters):
        out = f(a, out)
    # force a device->host transfer: on the axon platform block_until_ready
    # returns before remote execution completes, inflating rates
    np.asarray(out)
    dt = time.time() - t0
    # one hash2 = exactly 2 permutations per lane (SURVEY §3.1)
    perms = 2 * batch * iters
    log(f"{perms} perms in {dt:.3f}s -> {perms/dt:,.0f} perms/s")
    return perms / dt


def bench_insert(depth: int, k: int, iters: int) -> float:
    import jax

    from imt_tpu.tree import indexed

    log(f"building depth-{depth} tree ...")
    tree = indexed.IndexedMerkleTree(depth)
    rng = random.Random(0x1A5)
    t0 = time.time()
    ok = tree.insert_batch([rng.randrange(1, 1 << 253) for _ in range(k)])
    log(f"compile+first batch: {time.time()-t0:.1f}s (accepted {ok.sum()}/{k})")
    t0 = time.time()
    total = 0
    for _ in range(iters):
        ok = tree.insert_batch([rng.randrange(1, 1 << 253) for _ in range(k)])
        total += int(ok.sum())
    import numpy as np
    np.asarray(tree.levels[-1])
    dt = time.time() - t0
    log(f"{total} inserts in {dt:.3f}s -> {total/dt:,.0f} inserts/s (depth {depth})")
    return total / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--insert", action="store_true")
    ap.add_argument("--batch", type=int, default=1 << 15)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    if args.smoke:
        args.batch, args.iters = 256, 2

    if args.insert:
        depth, k, iters = (6, 8, 2) if args.smoke else (24, 4096, 4)
        rate = bench_insert(depth, k, iters)
        print(json.dumps({
            "metric": f"batched leaf-inserts/s (depth {depth})",
            "value": round(rate, 1), "unit": "inserts/s",
            "vs_baseline": None,
        }))
        return

    rate = bench_perms(args.batch, args.iters)
    print(json.dumps({
        "metric": "Poseidon perms/s/chip",
        "value": round(rate, 1), "unit": "perms/s",
        "vs_baseline": round(rate / 10_000_000, 4),
    }))


if __name__ == "__main__":
    main()
