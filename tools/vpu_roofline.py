"""Measure the real VPU f32 elementwise ceiling on this chip.

The op census (count_kernel_ops.py) guesses the VPU roofline from public
specs; the fused RNS kernel measures ABOVE that guess, so the guess is wrong.
This tool measures it: tiny Mosaic kernels chaining K elementwise bodies on
the same [48, T] layout the Poseidon kernel uses, rate from the (K2-K1)
slope (same protocol as bench.py).

Bodies:
  * mul        : x = x * c                 (1 op)
  * muladd     : x = x * c + d             (2 ops — or 1 if the VPU fuses FMA)
  * mix        : x = x - c * floor(x * c2) (the floor-mod shape: 4 ops)
  * mul2       : two independent chains    (ILP probe)

Usage: python tools/vpu_roofline.py [--tile 2048] [--k1 64] [--k2 256]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# imt_tpu is an installed package (pip install -e . — pyproject.toml)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=2048)
    ap.add_argument("--rows", type=int, default=48)
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--k1", type=int, default=4096)
    ap.add_argument("--k2", type=int, default=16384)
    args = ap.parse_args()

    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache_tpu"))
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, T, B = args.rows, args.tile, args.batch

    # ops per body application (f32 elementwise ops as the census counts)
    def mul16(x, c, d):
        for _ in range(16):
            x = x * c
        return x

    def fma16(x, c, d):
        for _ in range(16):
            x = x * c + d
        return x

    def mod4(x, c, d):
        # 4 applications of the floor-mod shape (16 census ops)
        for _ in range(4):
            x = x - c * jnp.floor(x * d)
        return x

    def ilp16(x, c, d):
        # 4 independent 4-op chains, recombined: ILP inside one iteration
        a = ((x * c) * c) * c
        b = ((x * d) * d) * d
        e = ((x + c) + c) + c
        f_ = ((x + d) + d) + d
        return (a * b) * (e * f_)

    BODIES = {
        "mul":    (1, lambda x, c, d: x * c),
        "muladd": (2, lambda x, c, d: x * c + d),
        "mul16":  (16, mul16),
        "fma16":  (32, fma16),
        "mod4":   (16, mod4),
        "ilp16":  (16, ilp16),
    }

    def make(body_fn, k):
        # c/d arrive as runtime kernel inputs: nothing about the op chain can
        # constant-fold or reassociate at compile time.
        def kernel(c_ref, x_ref, o_ref):
            c = c_ref[0, 0]
            d = c_ref[0, 1]

            def step(i, x):
                return body_fn(x, c, d)
            o_ref[:] = jax.lax.fori_loop(0, k, step, x_ref[:])

        @jax.jit
        def f(cd, x):
            spec = pl.BlockSpec((R, T), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
            out = pl.pallas_call(
                kernel, grid=(B // T,),
                in_specs=[pl.BlockSpec((1, 2), lambda i: (0, 0),
                                       memory_space=pltpu.SMEM), spec],
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((R, B), jnp.float32),
            )(cd, x)
            return out[:, :1]   # tiny transfer: tunnel RPC stays off the clock
        return f

    x = jnp.ones((R, B), jnp.float32)
    cd = jnp.asarray([[1.000001, 0.000001]], jnp.float32)
    for name, (n_ops, body) in BODIES.items():
        times = {}
        for k in (args.k1, args.k2):
            f = make(body, k)
            np.asarray(f(cd, x))
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                np.asarray(f(cd, x))
                best = min(best, time.time() - t0)
            times[k] = best
            print(f"  {name} K={k}: {best*1e3:.1f} ms", flush=True)
        slope = (times[args.k2] - times[args.k1]) / (args.k2 - args.k1)
        elems = R * B
        rate = elems * n_ops / slope
        print(f"{name:8s}: {slope*1e6:8.2f} us/iter  "
              f"{rate/1e12:6.2f} T census-ops/s  "
              f"({elems / slope / 1e12:.3f} T body-evals/s)")


if __name__ == "__main__":
    main()
