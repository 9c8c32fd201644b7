"""Witness-producing batched insertion — the TPU flagship op, completed.

The reference's ``insert_leaf`` chip consumes a full witness bundle per
insertion (old/new roots, low/new leaves, both sibling paths, helper bits —
/root/reference/src/indexed_merkle_tree.rs:231-244), and its tests generate
those witnesses by strictly sequential host insertion (:710-802).  The plain
batched path (indexed._insert_batch_fn) resolves a whole batch with one sort
but only returns acceptance — it never materializes the per-insert
intermediate states the witnesses need.

This module produces the witnesses for ALL K inserts of a batch in ONE
jitted program, bit-identical (on accepted lanes) to sequential insertion,
with the hashing fully batched:

* Temporal planning.  Insert i's low leaf is the largest value below v_i in
  the list state AFTER inserts 0..i-1 — not in the final list (a later
  insert may land between them).  In value-sorted order this is "the nearest
  position to the left whose insertion step precedes mine": existing
  participants (step -1) resolve with one cumulative max, and intra-batch
  chains resolve with an all-nearest-smaller-values (ANSV) sparse-table
  descent over the K new entries — O(K log K), no sequential scan.  The
  temporal successor (-> new_leaf.next_*, is_new_leaf_largest) is the mirror
  query.

* Level-synchronous timelines.  Each insert updates exactly 2 leaves (its
  slot + its low leaf), so every tree level sees exactly 2K timestamped node
  updates.  Per level: one (node, step) sort builds a lookup ("value of node
  n at step t" = latest update <= t, else the pre-batch level), the 2K
  parent hashes run as ONE batched hash2 (width 2K — the hash engine's
  happy regime), and the per-insert proof siblings (low path at step i-1,
  new path at step i — the reference's already-updated-tree discipline,
  src/indexed_merkle_tree.rs:734) are two more lookups.  The root level's
  timeline yields every intermediate root: old_root_i = root at step i-1,
  new_root_i = root at step i.

Total hash work equals sequential insertion (2 leaf hashes + 2 paths per
insert) but every hash runs at batch width 2K instead of width 2.

Rejected lanes (duplicates / zero) return ok=False with well-defined but
unspecified witness fields (sequential's rejected-lane fields are slot-0
garbage; parity is defined over accepted lanes + the ok mask).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import field
from ..ops import hashing
from . import indexed


def _ansv_prev(sigma, thresholds):
    """All-nearest-smaller-values, batched: for each query r (0..K-1) find
    the largest position r' < r with sigma[r'] < thresholds[r]; returns
    (pos, found).  Sparse-table binary descent: O(K log K) build, O(log K)
    per query, fully vectorized."""
    k = sigma.shape[0]
    logk = max((k - 1).bit_length(), 1)
    # m[j][r] = min sigma over [r - 2^j + 1, r]
    tables = [sigma]
    for j in range(1, logk + 1):
        prev = tables[-1]
        w = 1 << (j - 1)
        shifted = jnp.concatenate(
            [jnp.full((w,), jnp.iinfo(jnp.int32).max, sigma.dtype), prev[:-w]])
        tables.append(jnp.minimum(prev, shifted))
    pos = jnp.arange(k, dtype=jnp.int32)      # exclusive upper bound
    for j in range(logk, -1, -1):
        w = 1 << j
        blockmin = jnp.take(tables[j], jnp.clip(pos - 1, 0, k - 1))
        skip = (pos >= w) & (blockmin >= thresholds)
        pos = jnp.where(skip, pos - w, pos)
    found = pos > 0
    return jnp.clip(pos - 1, 0, k - 1), found


def _timeline(upd_node, upd_step):
    """Build the per-level lookup structure over 2K timestamped updates.

    Returns (query, sorted_nodes, order): query(qnode, qstep) -> (idx, hit)
    where idx indexes the UPDATE array (latest update to qnode with
    step <= qstep) and hit=False means no such update (caller falls back to
    the base level).  The lookup is a lexicographic binary search over the
    (node, step) 2-key sorted order — no composite key, so it is safe for
    any batch size (node*step products would overflow int32 at K=64K)."""
    m = upd_node.shape[0]
    ns, st, order = jax.lax.sort(
        (upd_node, upd_step, jnp.arange(m, dtype=jnp.int32)), num_keys=2)
    iters = int(np.ceil(np.log2(m + 1))) + 1

    def query(qnode, qstep):
        lo = jnp.zeros_like(qnode)
        hi = jnp.full_like(qnode, m)
        for _ in range(iters):
            live = lo < hi
            mid = jnp.clip((lo + hi) // 2, 0, m - 1)
            nm = jnp.take(ns, mid)
            sm = jnp.take(st, mid)
            le = (nm < qnode) | ((nm == qnode) & (sm <= qstep))
            lo = jnp.where(live & le, mid + 1, lo)
            hi = jnp.where(live & ~le, mid, hi)
        p = lo - 1                      # rightmost entry <= (qnode, qstep)
        p_c = jnp.clip(p, 0, m - 1)
        hit = (p >= 0) & (jnp.take(ns, p_c) == qnode)
        return jnp.take(order, p_c), hit

    return query, ns, order


def _value_at(query, vals, base_col, qnode, qstep):
    """vals: [CH, M] update values; base_col: [CH, Q] base-level fallback."""
    idx, hit = query(qnode, qstep)
    return jnp.where(hit, jnp.take(vals, idx, axis=1), base_col)


@lru_cache(maxsize=None)
def _insert_batch_witness_fn(depth: int, k: int, full_depth: int,
                             nr: str = ""):
    n = 1 << depth
    m = n + k
    fd = full_depth

    @jax.jit
    def step(vals, nvs, nis, levels, new_vals, count):
        slots = count + 1 + jnp.arange(k, dtype=jnp.int32)
        big = jnp.iinfo(jnp.int32).max

        # ---- final-list sort (identical planner to _insert_batch_fn) ----
        all_vals = jnp.concatenate([vals, new_vals], axis=1)       # [16, M]
        all_slots = jnp.concatenate(
            [jnp.arange(n, dtype=jnp.int32), slots])               # [M]
        is_new = jnp.concatenate(
            [jnp.zeros(n, dtype=bool), jnp.ones(k, dtype=bool)])
        packed = tuple(
            (all_vals[2 * j + 1] << 16) | all_vals[2 * j]
            for j in range(field.LIMBS // 2 - 1, -1, -1))
        sorted_ops = jax.lax.sort(
            packed + (all_slots.astype(jnp.uint32),
                      jnp.arange(m, dtype=jnp.int32)),
            num_keys=9)
        order = sorted_ops[-1]
        sv = jnp.take(all_vals, order, axis=1)
        ss = jnp.take(all_slots, order)
        snew = jnp.take(is_new, order)

        eq_prev = jnp.all(sv[:, 1:] == sv[:, :-1], axis=0)
        accepted = jnp.concatenate([jnp.ones(1, dtype=bool), ~eq_prev])

        pos = jnp.arange(m, dtype=jnp.int32)
        idx_if_acc = jnp.where(accepted, pos, m)
        nxt = jax.lax.cummin(idx_if_acc, reverse=True)
        nxt = jnp.concatenate([nxt[1:], jnp.full((1,), m, jnp.int32)])
        has_next = nxt < m
        nxt_c = jnp.clip(nxt, 0, m - 1)
        succ_val_fin = jnp.where(has_next, jnp.take(sv, nxt_c, axis=1),
                                 jnp.zeros_like(sv))
        succ_slot_fin = jnp.where(has_next, jnp.take(ss, nxt_c), 0).astype(
            jnp.int32)
        w_val = jnp.where(accepted[None], sv, 0)
        w_nv = jnp.where(accepted[None], succ_val_fin, 0)
        w_ni = jnp.where(accepted[None],
                         indexed.index_to_limbs(succ_slot_fin), 0)
        inv_order = jnp.zeros((m,), jnp.int32).at[order].set(pos)
        pos_exist = inv_order[:n]
        vals2 = jnp.take(w_val, pos_exist, axis=1)
        nvs2 = jnp.take(w_nv, pos_exist, axis=1)
        nis2 = jnp.take(w_ni, pos_exist, axis=1)
        pos_new = inv_order[n:]                       # sorted position of i
        vals2 = vals2.at[:, slots].set(jnp.take(w_val, pos_new, axis=1))
        nvs2 = nvs2.at[:, slots].set(jnp.take(w_nv, pos_new, axis=1))
        nis2 = nis2.at[:, slots].set(jnp.take(w_ni, pos_new, axis=1))
        ok = jnp.take(accepted, pos_new)              # per insert, batch order

        # ---- temporal planning -------------------------------------------
        # sigma over sorted positions: -1 for existing participants (slot-0
        # sentinel or occupied slots), the insert step for accepted new
        # entries, +inf otherwise (empty slots, rejected duplicates).
        occupied = jnp.concatenate(
            [jnp.ones((1,), dtype=bool), ~field.is_zero(vals)[1:]])
        participant = jnp.concatenate([occupied, jnp.zeros(k, dtype=bool)])
        part_s = jnp.take(participant, order)
        step_of_entry = jnp.concatenate(
            [jnp.full((n,), -1, jnp.int32), jnp.arange(k, dtype=jnp.int32)])
        step_s = jnp.take(step_of_entry, order)
        acc_new_s = snew & accepted

        # nearest existing participant below / above each sorted position
        prv_e = jax.lax.cummax(jnp.where(part_s, pos, -1))
        prv_e = jnp.concatenate([jnp.full((1,), -1, jnp.int32), prv_e[:-1]])
        nxt_e = jax.lax.cummin(jnp.where(part_s, pos, m), reverse=True)
        nxt_e = jnp.concatenate([nxt_e[1:], jnp.full((1,), m, jnp.int32)])

        # intra-batch ANSV over the k new entries in value order
        spn, ids = jax.lax.sort(
            (pos_new, jnp.arange(k, dtype=jnp.int32)), num_keys=1)
        sigma = jnp.where(jnp.take(acc_new_s, spn),
                          jnp.take(step_s, spn), big)            # [k]
        my_rank = jnp.zeros((k,), jnp.int32).at[ids].set(
            jnp.arange(k, dtype=jnp.int32))
        thr = jnp.arange(k, dtype=jnp.int32)                      # step i
        lo_r, lo_f = _ansv_prev(sigma, jnp.take(thr, ids))        # by rank
        hi_r_rev, hi_f_rev = _ansv_prev(sigma[::-1], jnp.take(thr, ids)[::-1])
        # map back: rank-indexed answers -> per-insert (batch order)
        lo_pos_new = jnp.where(lo_f, jnp.take(spn, lo_r), -1)
        hi_r = k - 1 - hi_r_rev[::-1]
        hi_f = hi_f_rev[::-1]
        hi_pos_new = jnp.where(hi_f, jnp.take(spn, jnp.clip(hi_r, 0, k - 1)),
                               m)
        lo_pos_new_i = jnp.take(lo_pos_new, my_rank)              # batch order
        hi_pos_new_i = jnp.take(hi_pos_new, my_rank)

        # combine with existing participants; positions in sorted coords
        low_pos = jnp.maximum(jnp.take(prv_e, pos_new), lo_pos_new_i)
        low_pos_c = jnp.clip(low_pos, 0, m - 1)
        succ_pos = jnp.minimum(jnp.take(nxt_e, pos_new), hi_pos_new_i)
        has_succ = succ_pos < m
        succ_pos_c = jnp.clip(succ_pos, 0, m - 1)

        low_slot = jnp.take(ss, low_pos_c).astype(jnp.int32)      # L_i
        low_val = jnp.take(sv, low_pos_c, axis=1)                 # [16, K]
        succ_val = jnp.where(has_succ, jnp.take(sv, succ_pos_c, axis=1), 0)
        succ_slot = jnp.where(has_succ, jnp.take(ss, succ_pos_c),
                              0).astype(jnp.int32)
        succ_idx = indexed.index_to_limbs(succ_slot)              # [16, K]
        slots_limbs = indexed.index_to_limbs(slots)

        # ---- leaf-update timeline (2 updates per step) -------------------
        # rejected steps degrade to identity updates of their own empty slot
        okm = ok[None]
        u1_slot = slots                                           # new leaf
        u1 = (jnp.where(okm, new_vals, 0), jnp.where(okm, succ_val, 0),
              jnp.where(okm, succ_idx, 0))
        u2_slot = jnp.where(ok, low_slot, slots)                  # low leaf
        u2 = (jnp.where(okm, low_val, 0), jnp.where(okm, new_vals, 0),
              jnp.where(okm, slots_limbs, 0))
        upd_node = jnp.concatenate([u1_slot, u2_slot])            # [2K]
        upd_step = jnp.concatenate(
            [jnp.arange(k, dtype=jnp.int32)] * 2)                 # [2K]
        upd_val = hashing.hash3_leaf(
            jnp.concatenate([u1[0], u2[0]], axis=1),
            jnp.concatenate([u1[1], u2[1]], axis=1),
            jnp.concatenate([u1[2], u2[2]], axis=1))              # [CH, 2K]

        # ---- level-synchronous walk --------------------------------------
        steps_i = jnp.arange(k, dtype=jnp.int32)
        low_proof, low_help, new_proof, new_help = [], [], [], []
        new_levels = []
        for lvl in range(depth + 1):
            query, node_srt, tl_order = _timeline(upd_node, upd_step)

            # final state of this level: last update per node wins
            val_srt = jnp.take(upd_val, tl_order, axis=1)
            is_last = jnp.concatenate(
                [node_srt[1:] != node_srt[:-1], jnp.ones((1,), bool)])
            scatter_idx = jnp.where(is_last, node_srt, n >> lvl)
            new_levels.append(
                levels[lvl].at[:, scatter_idx].set(val_srt, mode="drop"))

            if lvl == depth:
                base_root = jnp.broadcast_to(levels[depth],
                                             (levels[depth].shape[0], k))
                zero_q = jnp.zeros((k,), jnp.int32)
                old_root = _value_at(query, upd_val, base_root,
                                     zero_q, steps_i - 1)
                new_root = _value_at(query, upd_val, base_root,
                                     zero_q, steps_i)
                break

            # proof siblings: low path at step i-1, new path at step i
            lsib = (low_slot >> lvl) ^ 1
            nsib = (slots >> lvl) ^ 1
            base_l = jnp.take(levels[lvl], lsib, axis=1)
            base_n = jnp.take(levels[lvl], nsib, axis=1)
            low_proof.append(_value_at(query, upd_val, base_l,
                                       lsib, steps_i - 1))
            new_proof.append(_value_at(query, upd_val, base_n,
                                       nsib, steps_i))
            low_help.append(((low_slot >> lvl) % 2 == 0).astype(jnp.int32))
            new_help.append(((slots >> lvl) % 2 == 0).astype(jnp.int32))

            # parent updates: hash left/right children at each update's step
            lchild = upd_node & ~1
            rchild = upd_node | 1
            base_lc = jnp.take(levels[lvl], lchild, axis=1)
            base_rc = jnp.take(levels[lvl], rchild, axis=1)
            left = _value_at(query, upd_val, base_lc, lchild, upd_step)
            right = _value_at(query, upd_val, base_rc, rchild, upd_step)
            upd_val = hashing.hash2_nodes(left, right)
            upd_node = upd_node >> 1

        low_proof = jnp.stack(low_proof)           # [depth, CH, K] node repr
        new_proof = jnp.stack(new_proof)
        low_help = jnp.stack(low_help)              # [depth, K]
        new_help = jnp.stack(new_help)

        if fd != depth:
            old_root = indexed._spine_fold(old_root, depth, fd)
            new_root = indexed._spine_fold(new_root, depth, fd)
            low_proof, low_help = indexed._extend_proof(
                low_proof, low_help, depth, fd)
            new_proof, new_help = indexed._extend_proof(
                new_proof, new_help, depth, fd)

        witness = dict(
            ok=ok,
            old_root=hashing.dec_nodes(old_root),
            low_leaf_val=low_val,
            low_leaf_next_val=succ_val,
            low_leaf_next_idx=succ_idx,
            low_leaf_proof=indexed._dec_path(low_proof),
            low_leaf_proof_helper=low_help,
            new_root=hashing.dec_nodes(new_root),
            new_leaf_val=new_vals,
            new_leaf_next_val=succ_val,
            new_leaf_next_idx=succ_idx,
            new_leaf_index=slots,
            new_leaf_proof=indexed._dec_path(new_proof),
            new_leaf_proof_helper=new_help,
            is_new_leaf_largest=field.is_zero(succ_val),
        )
        return (vals2, nvs2, nis2, tuple(new_levels)), witness

    return step
