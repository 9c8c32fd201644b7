"""Microbench MXU dot rates on the real chip: bf16 vs int8 vs int4.

Shapes mirror the Poseidon base-extension dots ([M,K]@[K,N] with small M,K
and large N).  Slope protocol: K repeats inside one jitted fori_loop, rate
from the (K2-K1) difference, np.asarray to force completion (axon quirk).

Usage:  python tools/microbench_dots.py
"""
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            "/root/repo/.jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    N = 32768
    results = {}
    for name, dt, m, k in [
        ("bf16_75x48", jnp.bfloat16, 75, 48),
        ("int8_75x48", jnp.int8, 75, 48),
        ("int8_123x72", jnp.int8, 123, 72),
        ("int4_123x72", jnp.int4, 123, 72),
        ("int4_75x48", jnp.int4, 75, 48),
    ]:
        acc_t = jnp.float32 if dt == jnp.bfloat16 else jnp.int32
        lhs_np = np.random.randint(0, 8, (m, k)).astype(np.int32)

        def make(reps):
            @jax.jit
            def f(seed):
                # int4 host arrays crash axon transfer: cast on device
                lhs = jnp.asarray(lhs_np).astype(dt)
                x = ((jax.lax.broadcasted_iota(jnp.uint32, (k, N), 1)
                      ^ seed) & 7).astype(jnp.float32)

                def body(i, carry):
                    out = jax.lax.dot_general(
                        lhs, carry.astype(dt), (((1,), (0,)), ((), ())),
                        preferred_element_type=acc_t)
                    # feed the output back as the next rhs (un-hoistable)
                    nxt = out[:k].astype(jnp.float32)
                    return nxt - 8.0 * jnp.floor(nxt * 0.125)

                return jax.lax.fori_loop(0, reps, body, x)[:1, :8]
            return f

        try:
            times = {}
            for reps in (1024, 4096):
                f = make(reps)
                t0 = time.time()
                np.asarray(f(jnp.uint32(1)))
                log(f"{name} reps={reps}: compile+first {time.time()-t0:.0f}s")
                t0 = time.time()
                np.asarray(f(jnp.uint32(2)))
                times[reps] = time.time() - t0
            slope = (times[4096] - times[1024]) / (4096 - 1024)
            rate = m * k * N / slope / 1e12
            results[name] = rate
            log(f"{name}: {slope*1e6:.1f} us/dot -> {rate:.2f} Tmac/s")
        except Exception as e:
            results[name] = None
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")

    print({k: (round(v, 2) if v else None) for k, v in results.items()})


if __name__ == "__main__":
    main()
