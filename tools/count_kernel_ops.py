"""Static VPU/MXU op census of the fused RNS Poseidon kernel.

Traces the in-kernel permutation body (poseidon_rns_pallas._permutation with
the same redc/canon closures the kernel builds) to a jaxpr and counts
primitive work normalized per permutation per lane:

* VPU elementwise flops  (mul/add/sub/floor/max on f32 arrays)
* MXU dot MACs           (dot_general, int8 or bf16)
* memory traffic of constant loads (ignored: VMEM-resident)

Against the v5e roofline (VPU ~ 3.9e12 f32 op/s: 8 sublanes x 128 lanes x
4 ALUs x 940 MHz; MXU int8 ~ 2*197e12 MAC/s) this bounds achievable perms/s
and ranks op-diet targets.  CPU-safe: tracing only, nothing executes.

Usage: python tools/count_kernel_ops.py [--tile 1024] [--dots int8]
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import defaultdict

# imt_tpu is an installed package (pip install -e . — pyproject.toml)


ELEMWISE = {
    "mul", "add", "sub", "div", "floor", "max", "min", "neg",
    "select_n", "and", "or", "xor", "concatenate",
}


def census(tile: int, dots: str, layout: str = "cat"):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from functools import partial

    from imt_tpu.ops import poseidon_rns_pallas as pk

    n = pk.N_CH // 2
    if layout.startswith("opt"):
        g = int(layout[3:]) if len(layout) > 3 else 8
        (rcf_np, mds2_np, optk_np, lhs1_bf, lhs2_bf, lhs1_i8, lhs2_i8,
         cols_np, r_f, r_p, n_per, rem) = pk._packed_opt(g)
        lhs1, lhs2 = (lhs1_i8, lhs2_i8) if dots == "int8" else \
            (lhs1_bf, lhs2_bf)

        def body(rcf, mds2, optk, lhs1, lhs2, cols, *words):
            redc2, canon2 = pk._make_redc_split(lhs1, lhs2, cols, dots=dots)
            pairs = [(w[:n], w[n:]) for w in words]
            out = pk._permutation_split_opt(
                pairs, redc2, canon2, rcf, mds2, optk,
                (cols[:, 0:1], cols[:, 1:2]), r_f, r_p, g, n_per, rem)
            return [jnp.concatenate(w) for w in out]

        args = (jnp.asarray(rcf_np), jnp.asarray(mds2_np),
                jnp.asarray(optk_np), jnp.asarray(lhs1), jnp.asarray(lhs2),
                jnp.asarray(cols_np))
        loop_iters = n_per           # fori runs over PERIODS, not rounds
        return _census_body(pk, body, args, tile, loop_iters, r_p)
    (rc_np, mds_np, lhs1_bf, lhs2_bf, lhs1_i8, lhs2_i8, cols_np,
     r_f, r_p) = pk._packed()
    lhs1, lhs2 = (lhs1_i8, lhs2_i8) if dots == "int8" else (lhs1_bf, lhs2_bf)

    def body(rc, mds_arr, lhs1, lhs2, cols, *words):
        if layout == "split":
            redc2, canon2 = pk._make_redc_split(lhs1, lhs2, cols, dots=dots)
            mds = [[(mds_arr[:n, 3 * i + j:3 * i + j + 1],
                     mds_arr[n:, 3 * i + j:3 * i + j + 1])
                    for j in range(3)] for i in range(3)]
            pairs = [(w[:n], w[n:]) for w in words]
            out = pk._permutation_split(pairs, redc2, canon2, rc, mds,
                                        r_f, r_p)
            return [jnp.concatenate(w) for w in out]
        redc, (q_all, invq_all) = pk._make_redc(lhs1, lhs2, cols, dots=dots)
        canon = lambda x: pk._mod(x, q_all, invq_all)
        mds = [[mds_arr[:, 3 * i + j:3 * i + j + 1] for j in range(3)]
               for i in range(3)]
        return pk._permutation(list(words), redc, canon, rc, mds,
                               r_f, r_p, tile)

    args = (jnp.asarray(rc_np), jnp.asarray(mds_np), jnp.asarray(lhs1),
            jnp.asarray(lhs2), jnp.asarray(cols_np))
    return _census_body(pk, body, args, tile, r_p, r_p)


def _census_body(pk, body, args, tile, loop_iters, r_p):
    import jax
    import jax.numpy as jnp
    from collections import defaultdict
    words = [jnp.zeros((pk.N_CH, tile), jnp.float32) for _ in range(3)]
    # the kernel indexes its rc REF with pl.ds(traced offset); for a pure
    # array trace the offset is irrelevant to the op census — shim to static
    ds0, mo0 = pk.pl.ds, pk.pl.multiple_of
    pk.pl.ds = lambda s, n: slice(0, n)
    pk.pl.multiple_of = lambda x, n: 0
    try:
        jaxpr = jax.make_jaxpr(body)(*args, *words)
    finally:
        pk.pl.ds, pk.pl.multiple_of = ds0, mo0

    vpu = defaultdict(int)     # primitive -> element count
    mxu = defaultdict(int)     # dtype -> MAC count

    def walk(jx, mult=1):
        for eqn in jx.eqns:
            prim = eqn.primitive.name
            if prim in ("pjit", "closed_call", "custom_jvp_call"):
                for sub in eqn.params.values():
                    if hasattr(sub, "jaxpr"):
                        walk(sub.jaxpr if hasattr(sub.jaxpr, "eqns")
                             else sub, mult)
                continue
            if prim in ("while", "scan", "fori_loop"):
                # fori_loop lowers to while; body runs r_p times
                n_iter = loop_iters if prim in ("while",) else \
                    eqn.params.get("length", 1)
                for key in ("body_jaxpr", "jaxpr", "cond_jaxpr"):
                    sub = eqn.params.get(key)
                    if sub is None:
                        continue
                    inner = sub.jaxpr if hasattr(sub, "jaxpr") else sub
                    walk(inner, mult * (n_iter if key != "cond_jaxpr" else 0))
                continue
            if prim == "dot_general":
                lshape = eqn.invars[0].aval.shape
                rshape = eqn.invars[1].aval.shape
                dt = str(eqn.invars[0].aval.dtype)
                macs = lshape[0] * lshape[1] * rshape[1]
                mxu[dt] += macs * mult
                continue
            out_elems = sum(
                int(np_prod(v.aval.shape)) for v in eqn.outvars
                if hasattr(v.aval, "shape"))
            if prim in ELEMWISE:
                vpu[prim] += out_elems * mult

    def np_prod(shape):
        p = 1
        for s in shape:
            p *= s
        return p

    walk(jaxpr.jaxpr)
    return vpu, mxu


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=1024)
    ap.add_argument("--dots", default="int8", choices=["int8", "bf16"])
    ap.add_argument("--layout", default="cat")
    args = ap.parse_args()

    vpu, mxu = census(args.tile, args.dots, args.layout)
    lanes = args.tile

    tot_vpu = sum(vpu.values())
    print(f"kernel census @ tile={args.tile}, dots={args.dots}, "
          f"layout={args.layout}")
    print(f"\nVPU elementwise (per permutation-batch of {lanes} lanes):")
    for k, v in sorted(vpu.items(), key=lambda kv: -kv[1]):
        print(f"  {k:12s} {v:>12,}  ({v / lanes:8.1f}/lane)")
    print(f"  {'TOTAL':12s} {tot_vpu:>12,}  ({tot_vpu / lanes:8.1f}/lane)")
    print(f"\nMXU dots:")
    for k, v in sorted(mxu.items(), key=lambda kv: -kv[1]):
        print(f"  {k:12s} {v:>15,} MACs ({v / lanes:10.1f}/lane)")

    # rooflines (v5e): VPU 8x128 lanes x 4 MACs x 940 MHz; MXU bf16 197 TFLOP
    # = 98.5e12 MAC/s, int8 2x.
    vpu_rate = 8 * 128 * 4 * 0.94e9
    per_lane = tot_vpu / lanes
    print(f"\nVPU-roofline perms/s: {vpu_rate / per_lane / 1e6:8.2f} M "
          f"({per_lane:.0f} f32 ops/lane)")
    for dt, macs in mxu.items():
        rate = 197e12 if "int8" in dt else 98.5e12
        print(f"MXU-roofline perms/s ({dt}): "
              f"{rate / (macs / lanes) / 1e6:8.2f} M")


if __name__ == "__main__":
    main()
