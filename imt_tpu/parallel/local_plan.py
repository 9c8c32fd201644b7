"""Shard-local batched-insert planner — O(K) collectives regardless of N.

tools/collective_inventory.py measures that GSPMD partitions the global
9-key sort of `_insert_batch_fn` by ALL-GATHERING the full [16, N] value
array (plus an all-reduce of the [16, N+K] sorted product): fine at toy
sizes, fatal at BASELINE config-5 scale (67 MB per step per device).  This
module is the mitigation SCALING.md §3 names: plan locally, exchange only
O(K) candidates.

Algorithm (mesh of D shards, each owning C = N/D contiguous slots):

1. LOCAL candidate search (distributed sort work, C+K rows per shard):
   one 9-key packed sort of [local slots + queries] per shard yields, per
   query q, the shard-local candidates
     below1 = largest local participant with value <= q   (ties: equal
              values sort BEFORE the query, so below1 catches duplicates)
     above1 = smallest local participant with value  > q
2. EXCHANGE: all_gather of the candidate (val, slot, found) triples —
   2 × D × K × 68 B, independent of N.
3. REPLICATED reduced planning: lexicographic max/min across shards give
   the global below1/above1 per query; the entry table
   [sentinel, below1*, above1*, new values] (3K+1 rows) is run through the
   same sort/eq_prev/cummax-cummin planner as `_plan_batch`.  Proof of
   sufficiency: every pointer that can change belongs to a below1/above1
   candidate (if some non-included participant sat between a rewritten
   entry and its new successor, it would itself be a below1/above1 of that
   successor — contradiction), and an existing entry's pointers are written
   ONLY when its reduced-order successor is an accepted NEW entry, so
   entries whose true neighborhood was not gathered are never touched.
4. LOCAL application: each shard scatters the rows it owns (new slots +
   flagged candidates), the ≤ 3K+1 dirty leaf hashes are computed SHARDED
   (each shard hashes its 1/D slice, one all_gather of the [48, ·] hash
   columns), the local subtree updates dirty paths level-by-level, and ONE
   all_gather of the D subtree roots feeds a replicated top rebuild —
   the only tree-level collective (SURVEY §7.4 hard-part 4).

Bit-exactness vs the single-device `_insert_batch_fn` is enforced by
tests/test_local_plan.py and the dryrun_multichip A/B.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import field
from ..ops import hashing
from ..tree import indexed

_MESHES: dict = {}


def _pack_keys(vals):
    """uint32[16, M] canonical limbs -> 8 packed sort keys, MSB first."""
    return tuple((vals[2 * j + 1] << 16) | vals[2 * j]
                 for j in range(field.LIMBS // 2 - 1, -1, -1))


def _lex_reduce(cand_val, cand_slot, cand_found, take_max: bool):
    """[D, 16, K]/[D, K] candidates -> global best per query (max or min
    by value; participant values are globally unique so no tie-break)."""
    d = cand_val.shape[0]
    best_v, best_s, best_f = cand_val[0], cand_slot[0], cand_found[0]
    for i in range(1, d):
        v, s, f = cand_val[i], cand_slot[i], cand_found[i]
        if take_max:
            better = f & (~best_f | field.less_than(best_v, v))
        else:
            better = f & (~best_f | field.less_than(v, best_v))
        best_v = jnp.where(better[None], v, best_v)
        best_s = jnp.where(better, s, best_s)
        best_f = best_f | f
    return best_v, best_s, best_f


@lru_cache(maxsize=None)
def _local_insert_batch_fn(depth: int, k: int, d: int, mesh_key,
                           nr: str = "", b: int = 1):
    """Shard-local planner program for `b` chained batches of K inserts
    (b=1 is the plain insert_batch step).

    Chaining (b > 1): every batch runs the full plan/exchange/apply body
    on the SHARDED lower levels only; the root gather + replicated top
    rebuild happens ONCE after the last batch — the multi-chip twin of
    indexed._insert_batches_fn's truncated-carry schedule.

    Subtree update uses the slab/low split on LOCAL coordinates (the
    single-device design of indexed._update_paths_batch ported per shard):
    the K new slots are globally contiguous, so each shard covers its
    overlap with a K-wide clamped dense window whose width halves per
    level — writes outside the true overlap recompute unchanged parents
    (idempotent).  Only the ≤K pointer-rewrite rows (compacted from the
    3K+1-row entry table by a 1-key sort — each accepted new entry has at
    most one existing-entry predecessor) ride gathered dirty paths."""
    mesh = _MESHES[mesh_key]
    n = 1 << depth
    c = n // d                       # slots per shard
    l_loc = c.bit_length() - 1       # sharded levels: 0..l_loc
    m_loc = c + k
    e = 1 + 2 * k + k                # reduced entry table rows

    def batch_body(vals, nvs, nis, lower, new_vals, count, sid, off, gslot):
        # ---- 1. local candidate search --------------------------------
        participant = (~field.is_zero(vals)) | (gslot == 0)
        all_vals = jnp.concatenate([vals, new_vals], axis=1)   # [16, M_loc]
        is_query = jnp.concatenate(
            [jnp.zeros(c, jnp.uint32), jnp.ones(k, jnp.uint32)])
        part_all = jnp.concatenate([participant, jnp.zeros(k, bool)])
        sorted_ops = jax.lax.sort(
            _pack_keys(all_vals) + (is_query,
                                    jnp.arange(m_loc, dtype=jnp.int32)),
            num_keys=9)
        order = sorted_ops[-1]
        part_s = jnp.take(part_all, order)
        pos = jnp.arange(m_loc, dtype=jnp.int32)
        prv = jax.lax.cummax(jnp.where(part_s, pos, -1))
        prv = jnp.concatenate([jnp.full((1,), -1, jnp.int32), prv[:-1]])
        nxt = jax.lax.cummin(jnp.where(part_s, pos, m_loc), reverse=True)
        nxt = jnp.concatenate([nxt[1:], jnp.full((1,), m_loc, jnp.int32)])
        inv = jnp.zeros((m_loc,), jnp.int32).at[order].set(pos)
        qpos = inv[c:]                                          # [K]
        lo_p = jnp.take(prv, qpos)
        hi_p = jnp.take(nxt, qpos)
        lo_found = lo_p >= 0
        hi_found = hi_p < m_loc
        lo_e = jnp.take(order, jnp.clip(lo_p, 0, m_loc - 1))    # entry idx
        hi_e = jnp.take(order, jnp.clip(hi_p, 0, m_loc - 1))
        lo_val = jnp.take(all_vals, lo_e, axis=1) * lo_found
        hi_val = jnp.take(all_vals, hi_e, axis=1) * hi_found
        lo_slot = jnp.where(lo_found, off + lo_e, 0)
        hi_slot = jnp.where(hi_found, off + hi_e, 0)

        # ---- 2. exchange O(K) candidates ------------------------------
        ag = lambda x: jax.lax.all_gather(x, "shard")
        blo_v, blo_s, blo_f = _lex_reduce(ag(lo_val), ag(lo_slot),
                                          ag(lo_found), take_max=True)
        bhi_v, bhi_s, bhi_f = _lex_reduce(ag(hi_val), ag(hi_slot),
                                          ag(hi_found), take_max=False)

        # ---- 3. replicated reduced planning ---------------------------
        slots = count + 1 + jnp.arange(k, dtype=jnp.int32)
        zcol = jnp.zeros((field.LIMBS, 1), jnp.uint32)
        ev = jnp.concatenate(
            [zcol, blo_v * blo_f, bhi_v * bhi_f, new_vals], axis=1)
        es = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.where(blo_f, blo_s, 0),
             jnp.where(bhi_f, bhi_s, 0), slots]).astype(jnp.uint32)
        enew = jnp.concatenate(
            [jnp.zeros(1 + 2 * k, bool), jnp.ones(k, bool)])
        eops = jax.lax.sort(
            _pack_keys(ev) + (es, jnp.arange(e, dtype=jnp.int32)),
            num_keys=9)
        eorder = eops[-1]
        sv = jnp.take(ev, eorder, axis=1)
        ss = jnp.take(es, eorder).astype(jnp.int32)
        snew = jnp.take(enew, eorder)
        eq_prev = jnp.all(sv[:, 1:] == sv[:, :-1], axis=0)
        acc = jnp.concatenate([jnp.ones(1, bool), ~eq_prev])
        epos = jnp.arange(e, dtype=jnp.int32)
        nxt_a = jax.lax.cummin(jnp.where(acc, epos, e), reverse=True)
        nxt_a = jnp.concatenate([nxt_a[1:], jnp.full((1,), e, jnp.int32)])
        has_nxt = nxt_a < e
        nxt_c = jnp.clip(nxt_a, 0, e - 1)
        succ_val = jnp.where(has_nxt, jnp.take(sv, nxt_c, axis=1), 0)
        succ_slot = jnp.where(has_nxt, jnp.take(ss, nxt_c), 0)
        succ_new = jnp.where(has_nxt, jnp.take(snew, nxt_c), False)

        einv = jnp.zeros((e,), jnp.int32).at[eorder].set(epos)
        pos_new = einv[1 + 2 * k:]                               # [K]
        ok = jnp.take(acc, pos_new)
        okm = ok[None]
        nrow_val = jnp.where(okm, new_vals, 0)
        nrow_nv = jnp.where(okm, jnp.take(succ_val, pos_new, axis=1), 0)
        nrow_ni_slot = jnp.where(ok, jnp.take(succ_slot, pos_new), 0)
        nrow_ni = indexed.index_to_limbs(nrow_ni_slot)

        # existing candidates (sorted positions that are accepted, not new,
        # and whose accepted successor is a NEW entry) get pointer rewrites.
        # At most K rows are real (one existing predecessor max per accepted
        # new entry) — compact the e-row table to K lanes with a 1-key sort
        # so the dirty-path walk below carries K columns, not 3K+1.
        wr = acc & ~snew & succ_new
        _, widx = jax.lax.sort(
            ((~wr).astype(jnp.uint32), epos), num_keys=1)
        widx = widx[:k]                                          # [K]
        wr_k = jnp.take(wr, widx)
        wr_slot = jnp.where(wr_k, jnp.take(ss, widx), n)   # n = drop
        wr_nv = jnp.where(wr_k[None], jnp.take(succ_val, widx, axis=1), 0)
        wr_ni = indexed.index_to_limbs(
            jnp.where(wr_k, jnp.take(succ_slot, widx), 0))
        wr_val = jnp.where(wr_k[None], jnp.take(sv, widx, axis=1), 0)

        # ---- 4a. scatter owned rows -----------------------------------
        def loc(g):
            owned = (g >= off) & (g < off + c)
            return jnp.where(owned, g - off, c)       # c = drop
        vals2 = vals.at[:, loc(slots)].set(nrow_val, mode="drop")
        nvs2 = nvs.at[:, loc(slots)].set(nrow_nv, mode="drop")
        nis2 = nis.at[:, loc(slots)].set(nrow_ni, mode="drop")
        wl = loc(wr_slot)
        nvs2 = nvs2.at[:, wl].set(wr_nv, mode="drop")
        nis2 = nis2.at[:, wl].set(wr_ni, mode="drop")

        # ---- 4b. dirty leaf hashes (2K lanes), sharded over the mesh ----
        dirty_g = jnp.concatenate([slots, wr_slot])              # [2K]
        dh_val = jnp.concatenate([nrow_val, wr_val], axis=1)
        dh_nv = jnp.concatenate([nrow_nv, wr_nv], axis=1)
        dh_ni = jnp.concatenate([nrow_ni, wr_ni], axis=1)
        n_dirty = dirty_g.shape[0]
        pad = (-n_dirty) % d
        if pad:
            dirty_g = jnp.concatenate(
                [dirty_g, jnp.full((pad,), n, jnp.int32)])
            zp = jnp.zeros((field.LIMBS, pad), jnp.uint32)
            dh_val = jnp.concatenate([dh_val, zp], axis=1)
            dh_nv = jnp.concatenate([dh_nv, zp], axis=1)
            dh_ni = jnp.concatenate([dh_ni, zp], axis=1)
        per = (n_dirty + pad) // d
        sl = sid * per
        local_hash = hashing.hash3_leaf(
            jax.lax.dynamic_slice_in_dim(dh_val, sl, per, axis=1),
            jax.lax.dynamic_slice_in_dim(dh_nv, sl, per, axis=1),
            jax.lax.dynamic_slice_in_dim(dh_ni, sl, per, axis=1))
        dirty_hash = jax.lax.all_gather(local_hash, "shard",
                                        axis=1, tiled=True)      # [CH, 2K+p]

        # ---- 4c. local tree update: slab/low split on local widths ------
        # The K new slots are globally contiguous; each shard covers its
        # overlap with a K-wide dense window clamped into [0, c-K] (writes
        # outside the overlap recompute unchanged parents — idempotent).
        # The ≤K wr rows ride gathered dirty paths (sentinel c>>l drops).
        lvl0 = lower[0].at[:, loc(dirty_g[:2 * k])].set(
            dirty_hash[:, :2 * k], mode="drop")
        new_lower = [lvl0]
        cur = loc(wr_slot)                       # local wr path, sentinel c
        s = jnp.clip(slots[0] - off, 0, max(c - k, 0))
        w = k
        full = False
        for l in range(l_loc):
            level = new_lower[l]
            width = c >> l
            if full or 2 * k >= width // 2:
                full = True
                new_lower.append(
                    hashing.hash2_nodes(level[:, 0::2], level[:, 1::2]))
                continue
            # slab parents: dense strided slice, halving window
            wp = w // 2 + 1
            ps = jnp.clip(jnp.minimum(s >> 1, width // 2 - wp), 0, None)
            kids = jax.lax.dynamic_slice_in_dim(level, 2 * ps, 2 * wp,
                                                axis=1)
            slab_par = hashing.hash2_nodes(kids[:, 0::2], kids[:, 1::2])
            nxt_lvl = jax.lax.dynamic_update_slice_in_dim(
                lower[l + 1], slab_par, ps, axis=1)
            # wr parents: gathered dirty columns (read from the already
            # slab-updated child level; collisions recompute identically)
            parent = cur >> 1                    # drop c>>l -> c>>(l+1)
            left = jnp.take(level, parent * 2, axis=1)
            right = jnp.take(level, parent * 2 + 1, axis=1)
            ph = hashing.hash2_nodes(left, right)
            new_lower.append(nxt_lvl.at[:, parent].set(ph, mode="drop"))
            cur = parent
            s = ps
            w = wp
        return (vals2, nvs2, nis2, tuple(new_lower), ok)

    def shard_fn(vals, nvs, nis, *rest):
        lower = rest[:l_loc + 1]
        new_vals, count = rest[-2], rest[-1]     # [B, 16, K], scalar
        sid = jax.lax.axis_index("shard")
        off = sid * c
        gslot = off + jnp.arange(c, dtype=jnp.int32)

        if b <= 8:
            oks = []
            for i in range(b):
                vals, nvs, nis, lower, ok = batch_body(
                    vals, nvs, nis, lower, new_vals[i], count + i * k,
                    sid, off, gslot)
                oks.append(ok)
            oks = jnp.stack(oks)
        else:
            def body(carry, nv):
                vals, nvs, nis, lower, cnt = carry
                vals, nvs, nis, lower, ok = batch_body(
                    vals, nvs, nis, lower, nv, cnt, sid, off, gslot)
                return (vals, nvs, nis, lower, cnt + k), ok
            (vals, nvs, nis, lower, _), oks = jax.lax.scan(
                body, (vals, nvs, nis, lower, count), new_vals)

        # ---- ONE root gather + replicated top rebuild for the chain -----
        roots = jax.lax.all_gather(lower[-1], "shard",
                                   axis=1, tiled=True)           # [CH, D]
        new_top = [roots]
        while new_top[-1].shape[1] > 1:
            t = new_top[-1]
            new_top.append(hashing.hash2_nodes(t[:, 0::2], t[:, 1::2]))
        return (vals, nvs, nis) + tuple(lower) \
            + tuple(new_top[1:]) + (oks,)

    sharded = P(None, "shard")
    repl = P()
    in_specs = ((sharded,) * 3 + (sharded,) * (l_loc + 1)
                + (repl,) * (depth - l_loc) + (repl, repl))
    out_specs = ((sharded,) * 3 + (sharded,) * (l_loc + 1)
                 + (repl,) * (depth - l_loc) + (repl,))

    @jax.jit
    @partial(jax.shard_map, mesh=mesh, in_specs=in_specs,
             out_specs=out_specs, check_vma=False)
    def run(*args):
        return shard_fn(*args)

    def step(vals, nvs, nis, levels, new_vals, count):
        # new_vals: [16, K] for b=1, [B, 16, K] for chains
        if b == 1 and new_vals.ndim == 2:
            new_vals = new_vals[None]
        out = run(vals, nvs, nis, *levels, new_vals, count)
        vals2, nvs2, nis2 = out[:3]
        levels2 = out[3:3 + depth + 1]
        oks = out[-1]
        if b == 1:
            oks = oks[0]
        return (vals2, nvs2, nis2, tuple(levels2)), oks

    step.run = run          # raw jitted program (collective inventory)
    return step


def hash_count(depth: int, k: int, d: int, b: int = 1) -> int:
    """Fixed-length hashes `b` chained local-planned batches perform across
    the whole mesh (metrics accounting, mirrors batch_body's static
    slab/low schedule; the top rebuild is paid once per chain)."""
    c = (1 << depth) // d
    nd = 2 * k + ((-2 * k) % d)
    per_batch = nd                     # sharded leaf hashes (mesh-wide)
    slab, full = k, False
    for l in range(c.bit_length() - 1):
        w = c >> l
        if full or 2 * k >= w // 2:
            full = True
            per_batch += (w // 2) * d
        else:
            slab = slab // 2 + 1
            # every shard runs the slab window + the K wr lanes
            per_batch += (slab + k) * d
    total = b * per_batch
    total += d - 1                     # replicated top rebuild (per chain)
    return total


def local_insert_batch(tree, new_vals, mesh: Mesh, k: int):
    """Run one shard-local-planned batch insert on `tree` (the inner dense
    or sparse-prefix tree of a ShardedIndexedMerkleTree).  Mutates the tree
    state; returns the device-resident acceptance mask bool[K]."""
    d = mesh.devices.size
    depth = getattr(tree, "active_depth", tree.tree_depth)
    if (1 << depth) % d or (1 << depth) < 2 * d:
        raise ValueError(f"2^{depth} slots not shardable over {d} devices")
    key = (tuple(dev.id for dev in mesh.devices.flat),)
    _MESHES[key] = mesh
    step = _local_insert_batch_fn(depth, k, d, key, tree.node_repr)
    (tree.vals, tree.next_vals, tree.next_idxs, tree.levels), ok = step(
        tree.vals, tree.next_vals, tree.next_idxs, tree.levels,
        jnp.asarray(new_vals), jnp.int32(tree.count))
    tree.count += k
    return ok


def local_insert_batches(tree, new_vals, mesh: Mesh, k: int, b: int):
    """Chained shard-local batch inserts: `new_vals` [B, 16, K] runs B
    consecutive planned batches in ONE jitted shard_map program (sharded
    lower levels carried through the chain, top rebuilt once).  Mutates the
    tree state; returns the device-resident acceptance masks bool[B, K]."""
    d = mesh.devices.size
    depth = getattr(tree, "active_depth", tree.tree_depth)
    if (1 << depth) % d or (1 << depth) < 2 * d:
        raise ValueError(f"2^{depth} slots not shardable over {d} devices")
    key = (tuple(dev.id for dev in mesh.devices.flat),)
    _MESHES[key] = mesh
    step = _local_insert_batch_fn(depth, k, d, key, tree.node_repr, b)
    (tree.vals, tree.next_vals, tree.next_idxs, tree.levels), oks = step(
        tree.vals, tree.next_vals, tree.next_idxs, tree.levels,
        jnp.asarray(new_vals), jnp.int32(tree.count))
    tree.count += b * k
    return oks


# ---------------------------------------------------------------------------
# Shard-local non-inclusion witness — the query-side twin of the planner.
#
# The GSPMD-partitioned `_non_inclusion_witness_fn` pays the same measured
# full-state all-gather through its 9-key sort (SCALING.md §2).  Here each
# shard finds its local below1 candidate per query (largest local
# participant <= q; an equal value sorts BEFORE the query, so duplicates are
# caught and ok comes back False), one O(K) exchange reduces the global low
# leaf, and the proof is assembled with O(K·depth) gathers: the owner shard
# contributes the sharded-level siblings (combined with ONE psum — exact,
# every non-owner adds zeros), and the top of the tree is replicated.
# Witness semantics identical to tree/indexed._non_inclusion_witness_fn
# (reference verify_non_inclusion, src/indexed_merkle_tree.rs:127-229).
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _local_non_inclusion_fn(depth: int, k: int, d: int, mesh_key,
                            full_depth: int, nr: str = ""):
    mesh = _MESHES[mesh_key]
    n = 1 << depth
    c = n // d                       # slots per shard
    l_loc = c.bit_length() - 1       # sharded levels: 0..l_loc
    m_loc = c + k

    def shard_fn(vals, nvs, nis, *rest):
        lower = rest[:l_loc + 1]     # sharded levels 0..l_loc
        top = rest[l_loc + 1:-1]     # replicated levels l_loc+1..depth
        queries = rest[-1]           # replicated [16, K]
        sid = jax.lax.axis_index("shard")
        off = sid * c
        gslot = off + jnp.arange(c, dtype=jnp.int32)

        # ---- 1. local below1 candidate per query -----------------------
        participant = (~field.is_zero(vals)) | (gslot == 0)
        all_vals = jnp.concatenate([vals, queries], axis=1)    # [16, M_loc]
        is_query = jnp.concatenate(
            [jnp.zeros(c, jnp.uint32), jnp.ones(k, jnp.uint32)])
        part_all = jnp.concatenate([participant, jnp.zeros(k, bool)])
        sorted_ops = jax.lax.sort(
            _pack_keys(all_vals) + (is_query,
                                    jnp.arange(m_loc, dtype=jnp.int32)),
            num_keys=9)
        order = sorted_ops[-1]
        part_s = jnp.take(part_all, order)
        pos = jnp.arange(m_loc, dtype=jnp.int32)
        prv = jax.lax.cummax(jnp.where(part_s, pos, -1))
        prv = jnp.concatenate([jnp.full((1,), -1, jnp.int32), prv[:-1]])
        inv = jnp.zeros((m_loc,), jnp.int32).at[order].set(pos)
        qpos = inv[c:]                                          # [K]
        lo_p = jnp.take(prv, qpos)
        lo_found = lo_p >= 0
        lo_e = jnp.take(order, jnp.clip(lo_p, 0, m_loc - 1))    # local slot
        lo_c = jnp.clip(lo_e, 0, c - 1)    # participants are slots (< c)
        lo_val = jnp.take(vals, lo_c, axis=1) * lo_found
        lo_nv = jnp.take(nvs, lo_c, axis=1) * lo_found
        lo_ni = jnp.take(nis, lo_c, axis=1) * lo_found
        lo_slot = jnp.where(lo_found, off + lo_c, 0)

        # ---- 2. O(K) exchange + global reduction ------------------------
        ag = lambda x: jax.lax.all_gather(x, "shard")
        cand_v, cand_s, cand_f = ag(lo_val), ag(lo_slot), ag(lo_found)
        cand_nv, cand_ni = ag(lo_nv), ag(lo_ni)
        best_v, best_s, best_f = cand_v[0], cand_s[0], cand_f[0]
        best_nv, best_ni = cand_nv[0], cand_ni[0]
        for i in range(1, d):
            v, f = cand_v[i], cand_f[i]
            better = f & (~best_f | field.less_than(best_v, v))
            bm = better[None]
            best_v = jnp.where(bm, v, best_v)
            best_nv = jnp.where(bm, cand_nv[i], best_nv)
            best_ni = jnp.where(bm, cand_ni[i], best_ni)
            best_s = jnp.where(better, cand_s[i], best_s)
            best_f = best_f | f
        low_slot_g = jnp.where(best_f, best_s, 0)

        # witness exists iff low.val < q and (q < low.next_val or tail)
        ok = (best_f & field.less_than(best_v, queries)
              & (field.less_than(queries, best_nv)
                 | field.is_zero(best_nv)))

        # ---- 3. proof: owner-shard gathers + ONE psum -------------------
        owned = (low_slot_g >= off) & (low_slot_g < off + c)
        proof, helpers = [], []
        cur = jnp.clip(low_slot_g - off, 0, c - 1)
        for l in range(l_loc):
            width = c >> l
            sib = jnp.take(lower[l],
                           jnp.clip(cur, 0, width - 1) ^ 1, axis=1)
            contrib = jnp.where(owned[None], sib, 0)
            proof.append(jax.lax.psum(contrib, "shard"))
            helpers.append(((low_slot_g >> l) % 2 == 0).astype(jnp.int32))
            cur = cur >> 1
        # shard-root level + replicated top
        roots = jax.lax.all_gather(lower[l_loc], "shard",
                                   axis=1, tiled=True)           # [CH, D]
        rep_levels = [roots] + list(top)
        cur_g = low_slot_g >> l_loc
        for l in range(l_loc, depth):
            sib = jnp.take(rep_levels[l - l_loc], cur_g ^ 1, axis=1)
            proof.append(sib)
            helpers.append(((low_slot_g >> l) % 2 == 0).astype(jnp.int32))
            cur_g = cur_g >> 1
        proof = jnp.stack(proof)                    # [depth, CH, K]
        helpers = jnp.stack(helpers)                # [depth, K]
        root_n = rep_levels[-1]
        if full_depth != depth:
            proof, helpers = indexed._extend_proof(
                proof, helpers, depth, full_depth)
            root_n = indexed._spine_fold(root_n, depth, full_depth)

        # witness boundary: decode to canonical limbs
        proof = indexed._dec_path(proof)
        root = jnp.broadcast_to(hashing.dec_nodes(root_n),
                                (field.LIMBS, k))
        return (ok, root, best_v, best_nv, best_ni, proof, helpers,
                field.is_zero(best_nv))

    sharded = P(None, "shard")
    repl = P()
    in_specs = ((sharded,) * 3 + (sharded,) * (l_loc + 1)
                + (repl,) * (depth - l_loc) + (repl,))
    out_specs = (repl,) * 8

    @jax.jit
    @partial(jax.shard_map, mesh=mesh, in_specs=in_specs,
             out_specs=out_specs, check_vma=False)
    def run(*args):
        return shard_fn(*args)

    def query(vals, nvs, nis, levels, queries):
        out = run(vals, nvs, nis, *levels, queries)
        return dict(ok=out[0], root=out[1], low_leaf_val=out[2],
                    low_leaf_next_val=out[3], low_leaf_next_idx=out[4],
                    low_leaf_proof=out[5], low_leaf_proof_helper=out[6],
                    is_new_leaf_largest=out[7])

    query.run = run         # raw jitted program (collective inventory)
    return query


def local_non_inclusion_witness(tree, queries, mesh: Mesh, k: int):
    """Shard-local non-inclusion witnesses for `queries` on `tree` (the
    inner dense or sparse-prefix tree of a ShardedIndexedMerkleTree).
    Read-only; returns the device-resident witness dict."""
    d = mesh.devices.size
    depth = getattr(tree, "active_depth", tree.tree_depth)
    if (1 << depth) % d or (1 << depth) < 2 * d:
        raise ValueError(f"2^{depth} slots not shardable over {d} devices")
    key = (tuple(dev.id for dev in mesh.devices.flat),)
    _MESHES[key] = mesh
    f = _local_non_inclusion_fn(depth, k, d, key, tree.tree_depth,
                                tree.node_repr)
    return f(tree.vals, tree.next_vals, tree.next_idxs, tree.levels,
             jnp.asarray(queries))


# ---------------------------------------------------------------------------
# Shard-local WITNESS-producing batched insert.
#
# Same O(K) candidate exchange as the insert planner; the temporal
# planner (ANSV) runs replicated over the reduced entry table (every
# temporal low/successor of an insert is either another new entry or a
# below1/above1 candidate — same sufficiency argument as §3 of the module
# docstring).  The witness walk's per-level base lookups are pre-gathered
# with ONE owner-masked psum (the query nodes l_path^1 / n_path^1 per
# level are known BEFORE the walk), the walk itself runs replicated
# (hash width 2K per level — the same hash floor as single-chip), and the
# final-state scatters are owner-masked into the sharded levels.  No
# full-state collective anywhere: candidates O(K), bases O(K·depth_loc),
# no root gather (the walk computes the top levels replicated).
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _local_insert_batch_witness_fn(depth: int, k: int, d: int, mesh_key,
                                   full_depth: int, nr: str = ""):
    mesh = _MESHES[mesh_key]
    n = 1 << depth
    c = n // d
    l_loc = c.bit_length() - 1       # sharded levels: 0..l_loc
    m_loc = c + k
    e = 1 + 2 * k + k                # reduced entry table rows

    def shard_fn(vals, nvs, nis, *rest):
        from ..tree.batch_witness import _ansv_prev, _witness_walk
        lower = rest[:l_loc + 1]
        top = rest[l_loc + 1:-2]
        new_vals, count = rest[-2], rest[-1]
        sid = jax.lax.axis_index("shard")
        off = sid * c
        gslot = off + jnp.arange(c, dtype=jnp.int32)
        big = jnp.iinfo(jnp.int32).max

        # ---- 1. local below1/above1 candidates (as the insert planner) --
        participant = (~field.is_zero(vals)) | (gslot == 0)
        all_vals = jnp.concatenate([vals, new_vals], axis=1)
        is_query = jnp.concatenate(
            [jnp.zeros(c, jnp.uint32), jnp.ones(k, jnp.uint32)])
        part_all = jnp.concatenate([participant, jnp.zeros(k, bool)])
        sorted_ops = jax.lax.sort(
            _pack_keys(all_vals) + (is_query,
                                    jnp.arange(m_loc, dtype=jnp.int32)),
            num_keys=9)
        order = sorted_ops[-1]
        part_s = jnp.take(part_all, order)
        pos = jnp.arange(m_loc, dtype=jnp.int32)
        prv = jax.lax.cummax(jnp.where(part_s, pos, -1))
        prv = jnp.concatenate([jnp.full((1,), -1, jnp.int32), prv[:-1]])
        nxt = jax.lax.cummin(jnp.where(part_s, pos, m_loc), reverse=True)
        nxt = jnp.concatenate([nxt[1:], jnp.full((1,), m_loc, jnp.int32)])
        inv = jnp.zeros((m_loc,), jnp.int32).at[order].set(pos)
        qpos = inv[c:]
        lo_p = jnp.take(prv, qpos)
        hi_p = jnp.take(nxt, qpos)
        lo_found = lo_p >= 0
        hi_found = hi_p < m_loc
        lo_e = jnp.take(order, jnp.clip(lo_p, 0, m_loc - 1))
        hi_e = jnp.take(order, jnp.clip(hi_p, 0, m_loc - 1))
        lo_val = jnp.take(all_vals, lo_e, axis=1) * lo_found
        hi_val = jnp.take(all_vals, hi_e, axis=1) * hi_found
        lo_slot = jnp.where(lo_found, off + lo_e, 0)
        hi_slot = jnp.where(hi_found, off + hi_e, 0)

        # ---- 2. O(K) exchange -------------------------------------------
        ag = lambda x: jax.lax.all_gather(x, "shard")
        blo_v, blo_s, blo_f = _lex_reduce(ag(lo_val), ag(lo_slot),
                                          ag(lo_found), take_max=True)
        bhi_v, bhi_s, bhi_f = _lex_reduce(ag(hi_val), ag(hi_slot),
                                          ag(hi_found), take_max=False)

        # ---- 3. replicated planning over the reduced table ---------------
        slots = count + 1 + jnp.arange(k, dtype=jnp.int32)
        zcol = jnp.zeros((field.LIMBS, 1), jnp.uint32)
        ev = jnp.concatenate(
            [zcol, blo_v * blo_f, bhi_v * bhi_f, new_vals], axis=1)
        es = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.where(blo_f, blo_s, 0),
             jnp.where(bhi_f, bhi_s, 0), slots]).astype(jnp.uint32)
        enew = jnp.concatenate(
            [jnp.zeros(1 + 2 * k, bool), jnp.ones(k, bool)])
        epart = jnp.concatenate(
            [jnp.ones(1, bool), blo_f, bhi_f, jnp.zeros(k, bool)])
        eops = jax.lax.sort(
            _pack_keys(ev) + (es, jnp.arange(e, dtype=jnp.int32)),
            num_keys=9)
        eorder = eops[-1]
        ss = jnp.take(es, eorder).astype(jnp.int32)
        snew = jnp.take(enew, eorder)
        epart_s = jnp.take(epart, eorder)
        eq_prev = eops[0][1:] == eops[0][:-1]
        for r in range(1, 8):
            eq_prev &= eops[r][1:] == eops[r][:-1]
        accepted = jnp.concatenate([jnp.ones(1, bool), ~eq_prev])

        epos = jnp.arange(e, dtype=jnp.int32)
        nxt_a = jax.lax.cummin(jnp.where(accepted, epos, e), reverse=True)
        nxt_a = jnp.concatenate([nxt_a[1:], jnp.full((1,), e, jnp.int32)])
        prv_a = jax.lax.cummax(jnp.where(accepted, epos, -1))
        prv_a = jnp.concatenate([jnp.zeros((1,), jnp.int32), prv_a[:-1]])

        einv = jnp.zeros((e,), jnp.int32).at[eorder].set(epos)
        pos_new = einv[1 + 2 * k:]                               # [K]
        ok = jnp.take(accepted, pos_new)
        okm = ok[None]

        # final-state (post-batch) successor/predecessor per insert
        nxt_new = jnp.take(nxt_a, pos_new)
        has_fin = nxt_new < e
        nxt_c = jnp.clip(nxt_new, 0, e - 1)
        fin_succ_val = jnp.where(
            has_fin & ok, jnp.take(ev, jnp.take(eorder, nxt_c), axis=1), 0)
        fin_succ_slot = jnp.where(has_fin & ok, jnp.take(ss, nxt_c), 0)
        fin_prev_slot = jnp.take(
            ss, jnp.clip(jnp.take(prv_a, pos_new), 0, e - 1))
        low_tgt = jnp.where(ok, fin_prev_slot, n)

        def loc(g):
            owned = (g >= off) & (g < off + c)
            return jnp.where(owned, g - off, c)       # c = drop
        vals2 = vals.at[:, loc(slots)].set(jnp.where(okm, new_vals, 0),
                                           mode="drop")
        nvs2 = nvs.at[:, loc(low_tgt)].set(jnp.where(okm, new_vals, 0),
                                           mode="drop")
        nvs2 = nvs2.at[:, loc(slots)].set(fin_succ_val, mode="drop")
        nis2 = nis.at[:, loc(low_tgt)].set(
            indexed.index_to_limbs(jnp.where(ok, slots, 0)), mode="drop")
        nis2 = nis2.at[:, loc(slots)].set(
            indexed.index_to_limbs(fin_succ_slot), mode="drop")

        # ---- temporal planning (ANSV over the reduced table) -------------
        prv_e = jax.lax.cummax(jnp.where(epart_s, epos, -1))
        prv_e = jnp.concatenate([jnp.full((1,), -1, jnp.int32), prv_e[:-1]])
        nxt_e = jax.lax.cummin(jnp.where(epart_s, epos, e), reverse=True)
        nxt_e = jnp.concatenate([nxt_e[1:], jnp.full((1,), e, jnp.int32)])
        acc_new_s = snew & accepted
        step_of_entry = jnp.concatenate(
            [jnp.full((1 + 2 * k,), -1, jnp.int32),
             jnp.arange(k, dtype=jnp.int32)])
        step_s = jnp.take(step_of_entry, eorder)

        spn, ids = jax.lax.sort(
            (pos_new, jnp.arange(k, dtype=jnp.int32)), num_keys=1)
        sigma = jnp.where(jnp.take(acc_new_s, spn),
                          jnp.take(step_s, spn), big)
        my_rank = jnp.zeros((k,), jnp.int32).at[ids].set(
            jnp.arange(k, dtype=jnp.int32))
        thr = jnp.arange(k, dtype=jnp.int32)
        lo_r, lo_f2 = _ansv_prev(sigma, jnp.take(thr, ids))
        hi_r_rev, hi_f_rev = _ansv_prev(sigma[::-1],
                                        jnp.take(thr, ids)[::-1])
        lo_pos_new = jnp.where(lo_f2, jnp.take(spn, lo_r), -1)
        hi_r = k - 1 - hi_r_rev[::-1]
        hi_f2 = hi_f_rev[::-1]
        hi_pos_new = jnp.where(
            hi_f2, jnp.take(spn, jnp.clip(hi_r, 0, k - 1)), e)
        lo_pos_new_i = jnp.take(lo_pos_new, my_rank)
        hi_pos_new_i = jnp.take(hi_pos_new, my_rank)

        low_pos = jnp.maximum(jnp.take(prv_e, pos_new), lo_pos_new_i)
        low_pos_c = jnp.clip(low_pos, 0, e - 1)
        succ_pos = jnp.minimum(jnp.take(nxt_e, pos_new), hi_pos_new_i)
        has_succ = succ_pos < e
        succ_pos_c = jnp.clip(succ_pos, 0, e - 1)

        low_slot = jnp.take(ss, low_pos_c).astype(jnp.int32)
        low_val = jnp.take(ev, jnp.take(eorder, low_pos_c), axis=1)
        succ_val = jnp.where(
            has_succ, jnp.take(ev, jnp.take(eorder, succ_pos_c), axis=1), 0)
        succ_slot = jnp.where(has_succ, jnp.take(ss, succ_pos_c),
                              0).astype(jnp.int32)
        succ_idx = indexed.index_to_limbs(succ_slot)
        slots_limbs = indexed.index_to_limbs(slots)

        # ---- leaf-update timeline (replicated) ---------------------------
        u2_slot = jnp.where(ok, low_slot, slots)
        upd_node = jnp.concatenate([slots, u2_slot])
        upd_val = hashing.hash3_leaf(
            jnp.concatenate([jnp.where(okm, new_vals, 0),
                             jnp.where(okm, low_val, 0)], axis=1),
            jnp.concatenate([jnp.where(okm, succ_val, 0),
                             jnp.where(okm, new_vals, 0)], axis=1),
            jnp.concatenate([jnp.where(okm, succ_idx, 0),
                             jnp.where(okm, slots_limbs, 0)], axis=1))

        # ---- pre-gathered bases for the sharded levels (ONE psum) --------
        l_path, n_path = u2_slot, slots
        base_parts = []
        for lvl in range(l_loc + 1):
            qn = jnp.concatenate(
                [(l_path >> lvl) ^ 1, (n_path >> lvl) ^ 1])
            wloc = c >> lvl
            li = qn - sid * wloc
            owned_q = (li >= 0) & (li < wloc)
            base_parts.append(jnp.where(
                owned_q[None],
                jnp.take(lower[lvl], jnp.clip(li, 0, wloc - 1), axis=1), 0))
        bases = jax.lax.psum(jnp.concatenate(base_parts, axis=1), "shard")
        mm = 2 * k
        base_tab = [bases[:, i * mm:(i + 1) * mm]
                    for i in range(l_loc + 1)]

        def take_base(lvl, qnode):
            if lvl <= l_loc:
                return base_tab[lvl]
            return jnp.take(top[lvl - l_loc - 1], qnode, axis=1)

        new_lower = [None] * (l_loc + 1)
        new_top = [None] * (depth - l_loc)

        def scatter_level(lvl, idx, v):
            if lvl <= l_loc:
                wloc = c >> lvl
                li = idx - sid * wloc
                li = jnp.where((li >= 0) & (li < wloc), li, wloc)
                out = lower[lvl].at[:, li].set(v, mode="drop")
                new_lower[lvl] = out
            else:
                out = top[lvl - l_loc - 1].at[:, idx].set(v, mode="drop")
                new_top[lvl - l_loc - 1] = out
            return out

        root_col = top[-1] if depth > l_loc else lower[l_loc]
        (low_proof, new_proof, low_help, new_help, old_root, new_root,
         _) = _witness_walk(take_base, scatter_level, root_col,
                            l_path, n_path, upd_node, upd_val, k, depth, n)

        if full_depth != depth:
            old_root = indexed._spine_fold(old_root, depth, full_depth)
            new_root = indexed._spine_fold(new_root, depth, full_depth)
            low_proof, low_help = indexed._extend_proof(
                low_proof, low_help, depth, full_depth)
            new_proof, new_help = indexed._extend_proof(
                new_proof, new_help, depth, full_depth)

        witness = (ok, hashing.dec_nodes(old_root), low_val, succ_val,
                   succ_idx, indexed._dec_path(low_proof), low_help,
                   hashing.dec_nodes(new_root), new_vals, succ_val,
                   succ_idx, slots, indexed._dec_path(new_proof), new_help,
                   field.is_zero(succ_val))
        return ((vals2, nvs2, nis2) + tuple(new_lower) + tuple(new_top)
                + witness)

    sharded = P(None, "shard")
    repl = P()
    in_specs = ((sharded,) * 3 + (sharded,) * (l_loc + 1)
                + (repl,) * (depth - l_loc) + (repl, repl))
    out_specs = ((sharded,) * 3 + (sharded,) * (l_loc + 1)
                 + (repl,) * (depth - l_loc) + (repl,) * 15)

    @jax.jit
    @partial(jax.shard_map, mesh=mesh, in_specs=in_specs,
             out_specs=out_specs, check_vma=False)
    def run(*args):
        return shard_fn(*args)

    _KEYS = ("ok", "old_root", "low_leaf_val", "low_leaf_next_val",
             "low_leaf_next_idx", "low_leaf_proof", "low_leaf_proof_helper",
             "new_root", "new_leaf_val", "new_leaf_next_val",
             "new_leaf_next_idx", "new_leaf_index", "new_leaf_proof",
             "new_leaf_proof_helper", "is_new_leaf_largest")

    def step(vals, nvs, nis, levels, new_vals, count):
        out = run(vals, nvs, nis, *levels, new_vals, count)
        state = out[:3 + depth + 1]
        w = dict(zip(_KEYS, out[3 + depth + 1:]))
        return (state[0], state[1], state[2], tuple(state[3:])), w

    step.run = run          # raw jitted program (collective inventory)
    return step


def local_insert_batch_witness(tree, new_vals, mesh: Mesh, k: int):
    """Shard-local witness-producing batch insert on `tree` (the inner
    dense or sparse-prefix tree of a ShardedIndexedMerkleTree).  Mutates
    the tree state; returns the device-resident witness dict (same keys as
    tree/batch_witness, bit-identical on accepted lanes)."""
    d = mesh.devices.size
    depth = getattr(tree, "active_depth", tree.tree_depth)
    if (1 << depth) % d or (1 << depth) < 2 * d:
        raise ValueError(f"2^{depth} slots not shardable over {d} devices")
    key = (tuple(dev.id for dev in mesh.devices.flat),)
    _MESHES[key] = mesh
    step = _local_insert_batch_witness_fn(depth, k, d, key,
                                          tree.tree_depth, tree.node_repr)
    (tree.vals, tree.next_vals, tree.next_idxs, tree.levels), w = step(
        tree.vals, tree.next_vals, tree.next_idxs, tree.levels,
        jnp.asarray(new_vals), jnp.int32(tree.count))
    tree.count += k
    return w
