
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
from imt_tpu.utils.cache import host_cache_dir
jax.config.update("jax_compilation_cache_dir", host_cache_dir(
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import random
from imt_tpu.tree.sparse import SparseIndexedMerkleTree
from imt_tpu.utils import checkpoint

ckpt, progress, seed, k, n_batches = (
    sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4]),
    int(sys.argv[5]))
rng = random.Random(seed)
stream = [rng.randrange(1, 1 << 250) for _ in range(k * n_batches)]
t = SparseIndexedMerkleTree(16, initial_capacity_log2=4)
for b in range(n_batches):
    ok = t.insert_batch(stream[b * k:(b + 1) * k])
    assert ok.all(), b
    checkpoint.save(t, ckpt)              # atomic write-temp + rename
    with open(progress + ".tmp", "w") as f:
        f.write(str(b + 1))
    os.replace(progress + ".tmp", progress)
print("WORKER-DONE", flush=True)
