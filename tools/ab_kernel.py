"""Interleaved kernel A/B on the real chip — noise-resistant protocol.

Single-process measurements of the same kernel were observed to spread
+-8% across runs (shared/thermal chip behind the axon tunnel), wide enough
to swamp layout/tile effects.  This tool compiles every variant ONCE, then
measures them INTERLEAVED (A B C A B C ...) with the (K2-K1) slope protocol
per round, and reports per-variant medians — drift hits all variants
equally within a round.

Usage:
  python tools/ab_kernel.py --variants split:4096 cat:2048 --rounds 5
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

# imt_tpu is an installed package (pip install -e . — pyproject.toml)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="+",
                    default=["split:4096", "cat:2048"],
                    help="layout:tile[:dots] specs (spell spsim as spsim!)")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--batch", type=int, default=1 << 16)
    ap.add_argument("--k1", type=int, default=4)
    ap.add_argument("--k2", type=int, default=16)
    ap.add_argument("--outer", action="store_true",
                    help="k1/k2 count OUTER fori_loop iterations around an "
                         "in-kernel chain of 2 perms (bench.py round-5 "
                         "protocol: K-independent compiles, work separation "
                         "scales freely; use with e.g. --k1 5 --k2 25)")
    ap.add_argument("--reps", type=int, default=3,
                    help="timings per (variant, K) per round; min() taken "
                         "(contention only inflates timings)")
    ap.add_argument("--chain", type=int, default=2,
                    help="in-kernel perms per outer iteration (--outer "
                         "only); comparing --chain 2 vs 6 slopes isolates "
                         "the pure in-kernel rate from the per-call entry "
                         "cost")
    args = ap.parse_args()

    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache_tpu"))
    import jax.numpy as jnp
    import numpy as np
    from imt_tpu.ops import poseidon_rns_pallas as pk

    shape = (144, args.batch)
    mask = jnp.uint32(0x7FF)

    CHAIN = args.chain             # in-kernel perms per outer iteration
    perms_per_k = CHAIN if args.outer else 1

    def make(layout, tile, dots, k):
        @jax.jit
        def f(seed):
            base = jax.lax.broadcasted_iota(jnp.uint32, shape, 1) ^ seed
            st = (base & mask).astype(jnp.float32)
            if args.outer:
                st = jax.lax.fori_loop(
                    0, k,
                    lambda i, s: pk.permute_n(s, CHAIN, t_tile=tile,
                                              dots=dots, layout=layout),
                    st)
            else:
                st = pk.permute_n(st, k, t_tile=tile, dots=dots,
                                  layout=layout)
            return st[:, :1]
        return f

    fns = {}
    for spec in args.variants:
        parts = spec.split(":")
        layout, tile = parts[0], int(parts[1])
        dots = parts[2] if len(parts) > 2 else "bf16"
        for k in (args.k1, args.k2):
            t0 = time.time()
            f = make(layout, tile, dots, k)
            np.asarray(f(jnp.uint32(1)))
            print(f"compile {spec} K={k}: {time.time()-t0:.0f}s",
                  flush=True)
            np.asarray(f(jnp.uint32(1)))          # warm (first exec ~6x slow)
            fns[(spec, k)] = f

    rates = {spec: [] for spec in args.variants}
    for r in range(args.rounds):
        for spec in args.variants:
            times = {args.k1: [], args.k2: []}
            for rep in range(args.reps):
                for k in (args.k1, args.k2):
                    t0 = time.time()
                    np.asarray(fns[(spec, k)](jnp.uint32(
                        2 + r * args.reps + rep)))
                    times[k].append(time.time() - t0)
            slope = (min(times[args.k2]) - min(times[args.k1])) \
                / (args.k2 - args.k1)
            rate = args.batch * perms_per_k / slope if slope > 0 \
                else float("nan")
            rates[spec].append(rate)
            print(f"round {r} {spec}: {rate/1e6:.3f} M perms/s", flush=True)

    print("\n=== medians ===")
    for spec in args.variants:
        med = statistics.median(rates[spec])
        spread = (max(rates[spec]) - min(rates[spec])) / med
        print(f"{spec:16s} {med/1e6:7.3f} M perms/s  (spread {spread:.1%})")


if __name__ == "__main__":
    main()
