"""SURVEY §5 sanitizer jobs, in-suite.

1. ASan/UBSan build of the C++ native oracle (imt_native.cpp): the full
   oracle surface (hash2/hash3/mul/add/tree build/indexed insert + proofs)
   runs under AddressSanitizer + UndefinedBehaviorSanitizer with
   halt-on-error; any heap error, overflow, or UB aborts the subprocess.
2. jax_debug_nans pass: the f32 RNS hash pipeline replays the reference
   insertion sequence with NaN trapping enabled — any NaN produced inside
   the floor-mod / base-extension arithmetic raises immediately.

Both run in subprocesses: sanitizer preloads and global jax config must not
leak into the main test process.
"""

import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)


def _run(script: str, extra_env: dict) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env["PYTHONPATH"] = _ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env.update(extra_env)
    return subprocess.run([sys.executable, "-c", script], env=env,
                          capture_output=True, text=True, timeout=560,
                          cwd=_ROOT)


def test_native_oracle_under_asan_ubsan():
    libasan = subprocess.run(
        ["g++", "-print-file-name=libasan.so"],
        capture_output=True, text=True).stdout.strip()
    assert os.path.sep in libasan, f"libasan not found: {libasan}"
    script = r"""
import numpy as np
from imt_tpu.native import oracle

rng = np.random.default_rng(7)
a = rng.integers(0, 1 << 62, (64, 4), dtype=np.uint64)
b = rng.integers(0, 1 << 62, (64, 4), dtype=np.uint64)
oracle.hash2_u64(a, b)
xs = [int(v) for v in range(1, 65)]
oracle.hash2(xs, xs)
oracle.hash3(xs, xs, xs)
oracle.mul_mod(xs, xs)
oracle.add_mod(xs, xs)
oracle.tree_build([int(v) for v in range(1, 17)])

t = oracle.NativeIndexedTree(4)
for v in [30, 10, 20, 5, 50, 35, 30, 0]:   # incl. duplicate + zero rejects
    t.insert(v)
root = t.get_root()
proof, helpers = t.get_proof(1)
assert t.count >= 6
print("ASAN-OK", root % 1000)
"""
    out = _run(script, {
        "IMT_NATIVE_SAN": "1",
        "LD_PRELOAD": libasan,
        "ASAN_OPTIONS": "detect_leaks=0,abort_on_error=1",
    })
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-4000:])
    assert "ASAN-OK" in out.stdout
    # the sanitizer must not have reported anything
    assert "ERROR: AddressSanitizer" not in out.stderr
    assert "runtime error" not in out.stderr


def test_rns_pipeline_under_jax_debug_nans():
    script = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_debug_nans", True)

from imt_tpu.ops import hashing
hashing.set_backend("rns")        # the f32 pipeline the NaN guard targets

from imt_tpu import IndexedMerkleTree
t = IndexedMerkleTree(depth=3)
for v in [30, 10, 20, 5, 50, 35]:
    w = t.insert(v)
    assert bool(w.ok.all())
w = t.non_inclusion_witness([33])
assert bool(w.ok.all())
print("NAN-GUARD-OK", t.get_root_int() % 1000)
"""
    out = _run(script, {})
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-4000:])
    assert "NAN-GUARD-OK" in out.stdout
