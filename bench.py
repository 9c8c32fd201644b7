"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: Poseidon permutations/s on one chip (the permutation is the hot
inner loop of the entire system — SURVEY §3.1).  vs_baseline is the ratio
against the 10M perms/s/chip north-star target (BASELINE.md; the reference
publishes no numbers).

Measurement protocol (required on the axon TPU tunnel):
  * iterate the permutation K times INSIDE one jitted fori_loop, inputs
    derived on-device and outputs sliced tiny, so per-call RPC latency and
    host<->device transfer (both huge through the tunnel) stay out of the
    measurement;
  * compute the rate from the (K2 - K1) slope between two runs;
  * end timed sections with np.asarray (block_until_ready returns early on
    this platform).

Usage:
    python bench.py                 # permutation slope bench (TPU)
    python bench.py --smoke         # tiny + quick
    python bench.py --engine int    # int32 CIOS path instead of MXU engine
    python bench.py --insert        # secondary: batched leaf-inserts/s
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


# Physical sanity bound for ONE headline round (perms/s).  The timing-only
# `spsim` kernel variant (columns never reduced — numerically unsound,
# strictly less work than any value-exact layout) measured 9.585M perms/s
# at the shipped headline shape (tile 3328, batch 66560 = exact 20-tile
# fit, outer-loop protocol, spread ~1% — round 5; cross-checked by the
# lane-corrected 65536-batch reading 9.583M).  A
# round reading ABOVE the unsound ideal cannot be a real execution rate —
# it means the small-K timing was inflated by tunnel contention (observed:
# a 40.1M "round" in BENCH_r04.json), so the round is a corrupted sample,
# not data.  Re-measure spsim at the shipped (tile, batch) and update this
# constant if the kernel structure or shape changes; override via
# IMT_BENCH_SANITY_MPS for experiments.
SPSIM_BOUND_PERMS_S = 9.59e6
HEADLINE_ROUNDS = 9      # >= 9 per round-5 protocol (median over valid rounds)
HEADLINE_REPS = 3        # timings per K per round; min() taken — contention
                         # only ever INFLATES a timing, never deflates it,
                         # so min-of-reps is the principled estimator


def classify_round(rate: float, bound: float) -> bool:
    """True iff a measured round is a VALID sample: positive, finite, and
    not above the physical sanity bound (a rate above the measured unsound
    spsim ideal means the small-K timing was inflated by tunnel contention
    — the round is corrupted, not fast).  Unit-tested in
    tests/test_gates_utils.py::test_bench_round_classifier."""
    return 0 < rate <= bound


def _setup_jax():
    import jax
    try:
        import os
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache_tpu")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    return jax


def bench_perms(batch: int, engine: str, k1: int = 2, k2: int = 6):
    """Returns (rate, extras) — extras carries the per-round list for the
    headline artifact (empty for the secondary engines)."""
    jax = _setup_jax()
    import jax.numpy as jnp
    import numpy as np

    if engine.startswith("pallas"):
        import os
        from imt_tpu.ops import poseidon_rns_pallas as pk
        # WIDE_TILE (3328) is the round-5 swept optimum at the headline
        # batch (65536): +4.6% over the old 2048 default, resolved only
        # after the protocol fix cut the spread to ~1%.  Small (smoke)
        # batches use the batch itself as the tile — permute_n requires
        # batch % tile == 0.
        tile = int(os.environ.get("IMT_PALLAS_TILE", pk.WIDE_TILE))
        if batch < tile:
            tile = batch
        dots = os.environ.get("IMT_PALLAS_DOTS", pk.DEFAULT_DOTS)
        layout = os.environ.get("IMT_PALLAS_LAYOUT", pk.DEFAULT_LAYOUT)

        class _Eng:
            def permute(self, s):
                return pk.permute_n(s, 1, t_tile=tile, dots=dots,
                                    layout=layout)
        eng = _Eng()
        shape = (144, batch)
        mask = jnp.uint32(0x7FF)
        cast = lambda x: x.astype(jnp.float32)
        if engine == "pallas-chain":
            # K counts OUTER fori_loop iterations around ONE compiled kernel
            # that chains CHAIN=2 permutations VMEM-resident (the exact shape
            # production hash2 uses).  The outer loop scales the timed work
            # arbitrarily at ZERO extra Mosaic-compile cost (in-kernel
            # chaining unrolls the kernel body, so compile time grows with
            # K — the old protocol was stuck at K<=6, whose 14-44 ms
            # executions sat BELOW the tunnel's timing noise floor and
            # produced negative/impossible slopes).  Per-iteration HBM state
            # round-trip: 2x37.7 MB at ~0.8 TB/s ~= 0.09 ms vs ~14 ms of
            # compute — <1% overhead.
            CHAIN = 2
            def make_chain(k):
                @jax.jit
                def f(seed):
                    base = jax.lax.broadcasted_iota(jnp.uint32, shape, 1) ^ seed
                    st = cast(base & mask)
                    st = jax.lax.fori_loop(
                        0, k,
                        lambda i, s: pk.permute_n(s, CHAIN, t_tile=tile,
                                                  dots=dots, layout=layout),
                        st)
                    return st[:, :1]
                return f
            # Round-5 measurement protocol (VERDICT r04 item 1).  The shared
            # axon tunnel spreads single timings +-8% (occasionally 4x: the
            # 40.1M "round" in BENCH_r04.json), so:
            #   * warm each program with 2 post-compile executions (first
            #     execution runs up to 6x slow — device program load);
            #   * per round, time each K HEADLINE_REPS times interleaved and
            #     take the min (contention only inflates timings);
            #   * run HEADLINE_ROUNDS rounds; REJECT any round whose rate
            #     exceeds the measured spsim physical bound (corrupted K1
            #     timing) or is non-positive (t_k2 < t_k1);
            #   * report the median of valid rounds + the full per-round
            #     list so the artifact shows the spread.
            import os as _os
            import statistics
            bound = float(_os.environ.get("IMT_BENCH_SANITY_MPS", "0")) * 1e6 \
                or SPSIM_BOUND_PERMS_S
            fns = {}
            for k in (k1, k2):
                f = make_chain(k)
                t0 = time.time()
                np.asarray(f(jnp.uint32(1)))
                log(f"K={k}: compile+first {time.time()-t0:.0f}s")
                t0 = time.time()
                np.asarray(f(jnp.uint32(1)))
                log(f"K={k}: warm {time.time()-t0:.3f}s")
                fns[k] = f
            rounds, rejected = [], []
            suspect = False
            for attempt in range(2):          # one full retry if ALL rejected
                for r in range(HEADLINE_ROUNDS):
                    times = {k1: [], k2: []}
                    for rep in range(HEADLINE_REPS):
                        for k in (k1, k2):
                            t0 = time.time()
                            np.asarray(fns[k](jnp.uint32(
                                2 + (attempt * HEADLINE_ROUNDS + r)
                                * HEADLINE_REPS + rep)))
                            times[k].append(time.time() - t0)
                    slope = (min(times[k2]) - min(times[k1])) / (k2 - k1)
                    rate = batch * CHAIN / slope if slope > 0 else float("inf")
                    ok = classify_round(rate, bound)
                    (rounds if ok else rejected).append(rate)
                    log(f"round {r}: {rate/1e6:.3f} M perms/s"
                        + ("" if ok else "  REJECTED (corrupted timing: above "
                           f"spsim bound {bound/1e6:.2f}M or non-positive)"))
                if rounds:
                    break
                log("all rounds rejected — retrying once (tunnel storm?)")
            if not rounds:
                # tunnel unusable; report the least-bad number but FLAG it
                # rather than crash the driver's artifact capture
                suspect = True
                rounds = [x for x in rejected if x != float("inf")] or [0.0]
                log("WARNING: headline is SUSPECT — every round exceeded the "
                    "physical bound; treat this artifact as unmeasured")
            rate = statistics.median(rounds)
            spread = (max(rounds) - min(rounds)) / rate
            log(f"median of {len(rounds)} valid rounds "
                f"({len(rejected)} rejected): {rate/1e6:.3f} M perms/s, "
                f"spread {spread:.1%}")
            extras = {
                "rounds_mps": [round(x / 1e6, 3) for x in rounds],
                "rejected_mps": [round(x / 1e6, 3) for x in rejected],
                "spread": round(spread, 4),
                "sanity_bound_mps": round(bound / 1e6, 3),
                "protocol": (f"outer fori_loop x in-kernel chain {CHAIN}, "
                             f"min-of-{HEADLINE_REPS} interleaved timings/K, "
                             f"slope iters {k2}-{k1}, median of valid "
                             "rounds"),
            }
            if suspect:
                extras["suspect"] = True
            return rate, extras
    elif engine == "rns":
        from imt_tpu.ops.poseidon_rns import PoseidonRns
        eng = PoseidonRns()
        shape = (48, 3, batch)
        mask = jnp.uint32(0x7FF)   # lazy (< 2^13) is fine: permute canonicalizes
        cast = lambda x: x.astype(jnp.float32)
    elif engine == "mxu":
        from imt_tpu.ops import field_f32 as ff
        from imt_tpu.ops.poseidon_mxu import PoseidonMXU
        eng = PoseidonMXU()
        shape = (ff.DIGITS, 3, batch)
        mask = jnp.uint32(0xFF)
        cast = lambda x: x.astype(jnp.float32)
    else:
        from imt_tpu.ops import poseidon_jax
        eng = poseidon_jax.Poseidon(unroll=(engine == "int"))
        shape = (16, 3, batch)
        mask = jnp.uint32(0x3FFF)
        cast = lambda x: x

    def make(k):
        @jax.jit
        def f(seed):
            base = jax.lax.broadcasted_iota(
                jnp.uint32, shape, len(shape) - 1) ^ seed
            st = cast(base & mask)
            st = jax.lax.fori_loop(0, k, lambda i, s: eng.permute(s), st)
            return st[..., :1]
        return f

    times = {}
    for k in (k1, k2):
        f = make(k)
        t0 = time.time()
        o = f(jnp.uint32(1))
        np.asarray(o)
        log(f"K={k}: compile+first {time.time()-t0:.0f}s")
        t0 = time.time()
        np.asarray(f(jnp.uint32(2)))
        times[k] = time.time() - t0
        log(f"K={k}: run {times[k]*1e3:.1f} ms")
    slope = (times[k2] - times[k1]) / (k2 - k1)
    rate = batch / slope
    log(f"{slope*1e3:.2f} ms/permutation-batch -> {rate/1e6:.3f} M perms/s")
    return rate, {}


def bench_insert(depth: int, k: int, iters: int) -> float:
    jax = _setup_jax()
    import random
    import numpy as np

    from imt_tpu.tree import indexed

    log(f"building depth-{depth} tree ...")
    from imt_tpu.ops import field

    tree = indexed.IndexedMerkleTree(depth)
    rng = random.Random(0x1A5)
    # pre-pack every batch's limbs (python bigint -> limb packing is host
    # work that would otherwise serialize into the timed loop)
    batches = [field.ints_to_limbs(
        [rng.randrange(1, 1 << 253) for _ in range(k)])
        for _ in range(iters + 1)]
    t0 = time.time()
    ok = tree.insert_batch(batches[0])
    log(f"compile+first batch: {time.time()-t0:.1f}s (accepted {ok.sum()}/{k})")
    t0 = time.time()
    total = 0
    for vals in batches[1:]:
        ok = tree.insert_batch(vals)
        total += int(ok.sum())
    np.asarray(tree.levels[-1])
    dt = time.time() - t0
    log(f"{total} inserts in {dt:.3f}s -> {total/dt:,.0f} inserts/s (depth {depth})")
    return total / dt


def _median_rounds(run_round, rounds: int, tag: str) -> float:
    """Steady-state protocol: run `rounds` identical timed rounds, DISCARD
    the first (first post-compile executions through the axon tunnel run
    up to 6x slower — device-side program load/allocator warmup; measured
    in tools/ab_chained.py: round 0 26.8K inserts/s vs rounds 1-2 ~160K),
    report the median of the rest."""
    import statistics
    rates = []
    for r in range(rounds):
        rates.append(run_round(r))
        log(f"{tag} round {r}: {rates[-1]:,.0f}/s"
            + (" (warmup, discarded)" if r == 0 else ""))
    return statistics.median(rates[1:]) if len(rates) > 1 else rates[0]


def bench_non_inclusion(depth: int, n_leaves: int, k: int,
                        iters: int, rounds: int = 4) -> float:
    """BASELINE config 2: non-membership witness + verify throughput."""
    jax = _setup_jax()
    import random
    import numpy as np
    from imt_tpu.tree import indexed

    tree = indexed.IndexedMerkleTree(depth)
    rng = random.Random(0xBEEF)
    tree.insert_batch([rng.randrange(1, 1 << 253)
                       for _ in range(n_leaves - 2)])

    from imt_tpu.ops import field
    verify = jax.jit(indexed.verify_non_inclusion)   # eager would pay the
    # tunnel's ~300ms RPC per op; one jitted program instead

    # pre-pack AND pre-stage all query batches on device (uploading one
    # batch through the tunnel costs more than the witness computation)
    qbatches = [jax.device_put(field.random_limbs(0xBEEF + i, k))
                for i in range(iters + 1)]
    for q_ in qbatches:
        q_.block_until_ready()

    def round_trip(qlimbs):
        # witness stays on device and chains straight into the jitted
        # verifier (no host round trip through the tunnel)
        w = tree.non_inclusion_witness(qlimbs, as_numpy=False)
        return verify(
            w.root, w.low_leaf_val, w.low_leaf_next_val, w.low_leaf_next_idx,
            w.low_leaf_proof, w.low_leaf_proof_helper, qlimbs,
            w.is_new_leaf_largest)

    t0 = time.time()
    np.asarray(round_trip(qbatches[0]))
    log(f"compile+first: {time.time()-t0:.1f}s")
    from imt_tpu.utils.observability import trace
    import jax.numpy as jnp

    def one_round(r):
        t0 = time.time()
        with trace(f"non_inclusion_d{depth}_k{k}"):
            oks = [round_trip(q) for q in qbatches[1:]]   # async dispatch
            np.asarray(jnp.stack(oks)).sum()              # ONE final transfer
        return iters * k / (time.time() - t0)

    return _median_rounds(one_round, rounds, "cfg2")


def bench_single_insert(depth: int, iters: int, chunk: int = 16) -> float:
    """BASELINE config 3: sequential witness inserts/s, depth-16 tree.

    Strictly sequential semantics (each insert sees the previous one's tree,
    full witness bundle per insert — reference src/indexed_merkle_tree.rs:
    710-802), dispatched in scan-chained chunks (insert_seq): one tunnel
    RPC per `chunk` inserts instead of one per insert.  Witnesses are
    bit-identical to per-call insert() (tests/test_chained.py)."""
    _setup_jax()
    import random
    import numpy as np
    from imt_tpu.ops import field
    from imt_tpu.tree.sparse import SparseIndexedMerkleTree

    import jax
    chunks = [jax.device_put(field.random_limbs(0xF00D + i, chunk))
              for i in range(iters // chunk + 1)]
    for c_ in chunks:
        c_.block_until_ready()
    tree = SparseIndexedMerkleTree(depth, initial_capacity_log2=12)
    t0 = time.time()
    tree.insert_seq(chunks[0])
    log(f"compile+first chunk: {time.time()-t0:.1f}s")

    n = chunk * (len(chunks) - 1)

    def one_round(r):
        # fresh tree per round (sequential inserts consume slots); programs
        # are cached after round 0
        t = SparseIndexedMerkleTree(depth, initial_capacity_log2=12)
        t0 = time.time()
        for c in chunks[1:]:
            w = t.insert_seq(c, as_numpy=False)
        np.asarray(w.new_root)
        np.asarray(w.ok)
        return n / (time.time() - t0)

    return _median_rounds(one_round, 4, "cfg3")


def bench_batch_insert_sparse(depth: int, k: int, iters: int,
                              witness: bool = False,
                              rounds: int = 4) -> float:
    """BASELINE configs 4/5: batched inserts/s into a sparse-prefix tree.

    witness=True measures the witness-producing batched path (every insert
    emits the full insert_leaf bundle — the batch-rate replacement for the
    RPC-bound sequential config 3).

    Steady-state protocol: every round replays the SAME pre-packed batches
    into a FRESH tree (programs cached after round 0; acceptance identical),
    round 0 is discarded (_median_rounds)."""
    _setup_jax()
    import random
    import numpy as np
    import jax.numpy as jnp
    from imt_tpu.tree.sparse import SparseIndexedMerkleTree

    from imt_tpu.ops import field
    from imt_tpu.utils.observability import trace

    cap = max(14, (k * (iters + 1) + 2).bit_length())
    log(f"pre-packing {iters + 1} batches of {k} values ...")
    # pre-STAGE on device: uploading one [16, K] batch through the axon
    # tunnel costs ~40 ms (measured ~6-10 MB/s effective) — 6x the whole
    # device step.  Input staging is pipeline work (real deployments
    # stream asynchronously over local PCIe), not part of the insert op.
    import jax
    batches = [jax.device_put(field.random_limbs(0xCAFE + i, k))
               for i in range(iters + 1)]
    for b_ in batches:
        b_.block_until_ready()

    def fresh():
        return SparseIndexedMerkleTree(depth, initial_capacity_log2=cap)

    if witness:
        tree = fresh()
        t0 = time.time()
        ok = np.asarray(tree.insert_batch(batches[0], witness=True,
                                          as_numpy=False).ok)
        log(f"compile+first batch: {time.time()-t0:.1f}s "
            f"(accepted {ok.sum()}/{k})")

        def one_round(r):
            t = fresh()
            # SYNC warm insert (materialized ok): an async warm dispatch
            # would leak its device time into the timed window below
            np.asarray(t.insert_batch(batches[0], witness=True,
                                      as_numpy=False).ok)
            t0 = time.time()
            oks = []
            with trace(f"batch_insert_d{depth}_k{k}_w"):
                for vals in batches[1:]:
                    # as_numpy=False: witness bundle stays device-resident so
                    # chained batches pipeline under async dispatch
                    oks.append(t.insert_batch(vals, witness=True,
                                              as_numpy=False).ok)
                np.asarray(jnp.stack(oks)).sum()          # ONE final sync
            return iters * k / (time.time() - t0)

        return _median_rounds(one_round, rounds, "cfgW")

    # plain batches: chained groups (insert_batches, unrolled b<=8) — one
    # tunnel dispatch per `group` batches; state-identical to per-call
    # insert_batch (tests/test_chained.py).  Measured at the config-4 shape
    # (tools/ab_chained.py, device-staged, steady state): percall 197K,
    # chain4 245K, chain8 255K inserts/s — group=8 is the dispatch shape.
    group = 8 if iters >= 8 else 1
    # warm group: half-size when a full warm+timed sequence would overflow
    # the 2^cap slots (warmup only needs state+program heat; round 0 of
    # _median_rounds warms the timed `group` program itself)
    wb = group if 2 * group * k < (1 << cap) - 1 else max(1, group // 2)
    warm_arr = jnp.stack(batches[:wb])
    n_g = (iters + 1 - wb) // group
    groups = [jnp.stack(batches[wb + i * group:wb + (i + 1) * group])
              for i in range(n_g)]
    for g_ in groups:
        g_.block_until_ready()
    tree = fresh()
    t0 = time.time()
    ok = np.asarray(tree.insert_batches(warm_arr))
    log(f"compile+first group of {wb}: {time.time()-t0:.1f}s "
        f"(accepted {ok.sum()}/{wb * k})")

    n_done = group * n_g * k

    def one_round(r):
        t = fresh()
        np.asarray(t.insert_batches(warm_arr, as_numpy=False))   # SYNC warm
        t0 = time.time()
        oks = []
        with trace(f"batch_insert_d{depth}_k{k}"):
            for arr in groups:
                oks.append(t.insert_batches(arr, as_numpy=False))
            np.asarray(jnp.concatenate(oks)).sum()        # ONE final sync
        return n_done / (time.time() - t0)

    return _median_rounds(one_round, rounds, "cfgB")


def bench_oracle(batch: int, iters: int) -> float:
    """Reference-equivalent CPU baseline: the C++ 4x64 Montgomery Poseidon
    (the same algorithm/structure as the reference's pse-poseidon dependency)
    hashing on one host core.  Gives vs-reference context since the reference
    publishes no numbers (BASELINE.md)."""
    import numpy as np

    from imt_tpu.native import oracle

    rng = np.random.default_rng(5)
    a = rng.integers(0, 1 << 62, (batch, 4), dtype=np.uint64)
    b = rng.integers(0, 1 << 62, (batch, 4), dtype=np.uint64)
    oracle.hash2_u64(a[:8], b[:8])                     # build + warm
    t0 = time.time()
    for _ in range(iters):
        oracle.hash2_u64(a, b)
    dt = time.time() - t0
    rate = batch * iters / dt
    log(f"C++ oracle: {rate:,.0f} hashes/s ({2*rate:,.0f} perms/s) "
        f"single-core")
    return rate


def config_result(cfg: str, smoke: bool = False) -> dict:
    """One BASELINE config -> its JSON record (also used by --artifact)."""
    rounds = 2 if smoke else 4
    if cfg == "2":
        rate = bench_non_inclusion(8, 256, 8192, 2 if smoke else 8,
                                   rounds=rounds)
        metric, unit = "non-membership verifies/s (depth 8)", "verifies/s"
    elif cfg == "3":
        # chunk=64: one lax.scan dispatch per 64 strictly-sequential inserts
        # (witnesses bit-identical to per-call insert — tests/test_chained.py);
        # the sequential metric is tunnel-RPC-bound, so dispatch depth is
        # the only lever
        rate = bench_single_insert(16, 8 if smoke else 256,
                                   chunk=4 if smoke else 64)
        metric, unit = "sequential witness inserts/s (depth 16)", "inserts/s"
    elif cfg == "3w":
        rate = bench_batch_insert_sparse(16, 4096, 2 if smoke else 8,
                                         witness=True, rounds=rounds)
        metric, unit = ("witness-batch inserts/s (depth 16, batch 4096, "
                        "full insert_leaf bundles)", "inserts/s")
    elif cfg == "4":
        # iters=14 keeps the active prefix at 2^16 (15 batches of 4096),
        # matching the round-2 artifact's shape
        rate = bench_batch_insert_sparse(24, 4096, 2 if smoke else 14,
                                         rounds=rounds)
        metric, unit = "batched inserts/s (depth 24, batch 4096)", "inserts/s"
    else:
        k, iters = (4096, 2) if smoke else (65536, 15)
        rate = bench_batch_insert_sparse(32, k, iters, rounds=rounds)
        metric, unit = (f"batched inserts/s (depth 32, batch {k}, ~1M total)",
                        "inserts/s")
    return {"config": cfg, "metric": metric, "value": round(rate, 1),
            "unit": unit, "vs_baseline": None}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--insert", action="store_true")
    ap.add_argument("--oracle", action="store_true",
                    help="C++ reference-equivalent CPU Poseidon baseline")
    ap.add_argument("--config", choices=["2", "3", "3w", "4", "5"],
                    help="BASELINE.md benchmark config")
    ap.add_argument("--artifact", action="store_true",
                    help="run configs 2/3/3w/4/5 and write BENCH_configs.json")
    ap.add_argument("--engine",
                    choices=["rns", "pallas", "pallas-chain", "mxu", "int",
                             "scan"],
                    # chain: K perms per kernel, state VMEM-resident — the
                    # shape real tree hashing uses (hash2/hash3 chain 2 perms
                    # in-kernel); rate from the (K2-K1) slope as ever.
                    # Same-day: chain 7.09M vs per-perm-io 6.83M.
                    default="pallas-chain")
    ap.add_argument("--batch", type=int, default=None,
                    help="default: 66560 (= 20 x WIDE_TILE, exact grid "
                         "fit) for the pallas-chain headline, 65536 "
                         "otherwise")
    args = ap.parse_args()
    if args.batch is None:
        args.batch = 66560 if args.engine == "pallas-chain" else 1 << 16

    if args.oracle:
        rate = bench_oracle(4096, 2 if args.smoke else 32)
        print(json.dumps({
            "metric": "C++ reference-equivalent Poseidon hashes/s (1 core)",
            "value": round(rate, 1), "unit": "hashes/s",
            "vs_baseline": None,
        }))
        return

    if args.artifact:
        import datetime
        # on-chip correctness FIRST: replay the reference 6-round sequence +
        # a depth-32 sparse batch on the real TPU vs the python oracle
        # (tools/tpu_parity_check.py); the artifact records the result so
        # every round's perf numbers carry a hardware-parity bit
        log("=== tpu parity (reference replay on chip) ===")
        import os
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools"))
        from tpu_parity_check import run_parity
        try:
            parity = run_parity()
        except AssertionError as e:
            # CPU-only host: record the missing chip instead of dying with a
            # bare assertion (--artifact numbers are meaningless off-chip, but
            # the artifact should say so, not crash)
            parity = {"tpu_parity": False, "checks": [],
                      "reason": f"no TPU/axon chip on this host ({e})"}
            log(f"tpu parity SKIPPED: {parity['reason']}")
        results = []
        for cfg in ["2", "3", "3w", "4", "5"]:
            log(f"=== config {cfg} ===")
            results.append(config_result(cfg, args.smoke))
        artifact = {
            "date": datetime.date.today().isoformat(),
            "device": "1 TPU chip (axon tunnel)",
            "tpu_parity": parity["tpu_parity"],
            "tpu_parity_checks": parity["checks"],
            **({"tpu_parity_reason": parity["reason"]}
               if "reason" in parity else {}),
            "configs": results,
        }
        import os
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_configs.json")
        with open(path, "w") as f:
            json.dump(artifact, f, indent=1)
        print(json.dumps({"metric": "configs recorded", "value": len(results),
                          "unit": "configs", "vs_baseline": None}))
        return

    if args.config:
        print(json.dumps(config_result(args.config, args.smoke)))
        return

    if args.insert:
        depth, k, iters = (6, 8, 2) if args.smoke else (20, 1024, 4)
        rate = bench_insert(depth, k, iters)
        print(json.dumps({
            "metric": f"batched leaf-inserts/s (depth {depth})",
            "value": round(rate, 1), "unit": "inserts/s",
            "vs_baseline": None,
        }))
        return

    if args.smoke:
        args.batch = 2048
        # outer-loop iters are compile-free to raise: 25 vs 225 gives a
        # ~90 ms separation so even the smoke number is sane through the
        # tunnel (k 1/3 measured pure noise)
        k1, k2 = (25, 225) if args.engine == "pallas-chain" else (1, 3)
        rate, extras = bench_perms(args.batch, args.engine, k1=k1, k2=k2)
    elif args.engine == "pallas-chain":
        # outer-loop iteration counts: 5 vs 25 iters x CHAIN=2 perms ->
        # ~290 ms of timed-work separation, far above the tunnel's timing
        # noise floor (K<=6 in-kernel chains measured 14-44 ms executions,
        # which produced impossible slopes under contention — BENCH_r04)
        rate, extras = bench_perms(args.batch, args.engine, k1=5, k2=25)
    else:
        rate, extras = bench_perms(args.batch, args.engine)
    # vs_baseline stays against the ORIGINAL 10M target for cross-round
    # continuity; the round-5 formal re-baseline (BASELINE.json
    # north_star_revision: >= 95% of the measured spsim structural ideal
    # 9.585M, i.e. 9.11M) rides the same line as vs_revised_target.
    print(json.dumps({
        "metric": "Poseidon perms/s/chip",
        "value": round(rate, 1), "unit": "perms/s",
        "vs_baseline": round(rate / 10_000_000, 4),
        "vs_revised_target": round(rate / 9_110_000, 4),
        "revised_target_mps": 9.11,
        **extras,
    }))


if __name__ == "__main__":
    main()
