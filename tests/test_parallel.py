"""Sharded paths: bit-exact vs single-device.

The mesh checks run in a subprocess with a 4-virtual-device CPU backend:
the virtual multi-device CPU client multiplies thread pools and spin-locks
(~7 minutes of sys time across the suite on this 4-core host), so the main
pytest process stays single-device and only this file pays for a mesh.
"""

import os
import subprocess
import sys

_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import os
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import random
import numpy as np
from imt_tpu.ops import field, poseidon_jax
from imt_tpu.parallel import sharded
from imt_tpu.tree.merkle import MerkleTree

assert len(jax.devices()) == 4, jax.devices()
rng = random.Random(0x5A4D)

# data-parallel sharded hashing == single device
mesh = sharded.make_mesh(4)
xs = field.ints_to_limbs([rng.randrange(field.P) for _ in range(64)])
ys = field.ints_to_limbs([rng.randrange(field.P) for _ in range(64)])
got = np.asarray(sharded.sharded_hash2(xs, ys, mesh))
want = np.asarray(poseidon_jax.hash2(xs, ys))
assert (got == want).all(), "sharded hash mismatch"

# shard_map tree reduction (local subtrees + all_gather + top tree)
leaves = [rng.randrange(field.P) for _ in range(64)]
arr = field.ints_to_limbs(leaves)
root = np.asarray(sharded.sharded_root(arr, mesh))
assert field.limbs_to_int(root[:, 0]) == MerkleTree.build(arr).get_root_int()

# smaller mesh
mesh2 = sharded.make_mesh(2)
root2 = np.asarray(sharded.sharded_root(arr[:, :32], mesh2))
assert field.limbs_to_int(root2[:, 0]) == \
    MerkleTree.build(arr[:, :32]).get_root_int()
print("SHARDED-OK")
"""


def test_sharded_paths_subprocess():
    here = os.path.dirname(os.path.abspath(__file__))
    script = os.path.join(here, "_sharded_check.py")
    with open(script, "w") as f:
        f.write(_SCRIPT)
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=4").strip()
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.dirname(here)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run([sys.executable, script], env=env,
                         capture_output=True, text=True, timeout=1500,
                         cwd=os.path.dirname(here))
    assert out.returncode == 0, out.stderr[-3000:]
    assert "SHARDED-OK" in out.stdout
