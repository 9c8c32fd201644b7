"""Endurance + fault-injection soak (pytest -m soak).

The reference's endurance analog is the 6-round sequential insert loop
(/root/reference/src/indexed_merkle_tree.rs:679-803); here the stream is
longer, randomized and adversarial (duplicates, adjacent values, 0, P-1),
runs differentially against the python oracle, and adds the failure-recovery
exercise the reference lacks entirely: a worker process is SIGKILLed
mid-stream and the tree is resumed from its last atomic checkpoint, with the
resumed run required to be bit-exact with an uninterrupted one.

Excluded from the default suite (see pytest.ini); run with `pytest -m soak`.
"""

import os
import signal
import subprocess
import sys
import time

import pytest

pytestmark = pytest.mark.soak

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def test_soak_differential_stream():
    """Long random insert/query stream vs the oracle (tools/soak_indexed.py
    wired into CI): mixed batch/sequential/query workloads, witness
    predicate checks, checkpoint round-trips, root parity every step."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "soak_indexed.py"),
         "--rounds", "12", "--seed", "7"],
        env=env, capture_output=True, text=True, timeout=2400, cwd=REPO)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "SOAK PASSED" in out.stdout, out.stdout[-1000:]


_WORKER = r"""
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
"""


def test_soak_kill_resume(tmp_path):
    """Kill a checkpointing worker mid-stream (SIGKILL, no cleanup), resume
    from its last atomic snapshot, replay the remaining batches, and require
    the final root to be bit-identical to an uninterrupted run."""
    import random

    import jax
    jax.config.update("jax_platforms", "cpu")

    from imt_tpu.tree.sparse import SparseIndexedMerkleTree
    from imt_tpu.utils import checkpoint

    seed, k, n_batches = 0x50AC, 16, 12
    ckpt = str(tmp_path / "soak.npz")
    progress = str(tmp_path / "progress")
    worker_py = str(tmp_path / "worker.py")
    # the worker reads .jax_cache relative to its own path: keep it in tests/
    worker_py = os.path.join(HERE, "_soak_worker.py")
    with open(worker_py, "w") as f:
        f.write(_WORKER)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, worker_py, ckpt, progress, str(seed), str(k),
         str(n_batches)],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    try:
        # wait until at least 3 batches are checkpointed, then kill -9
        deadline = time.time() + 600
        while time.time() < deadline:
            if os.path.exists(progress):
                with open(progress) as f:
                    done = int(f.read() or 0)
                if done >= 3:
                    break
            if proc.poll() is not None:
                out, err = proc.communicate()
                raise AssertionError(
                    f"worker exited early: {err[-2000:].decode()}")
            time.sleep(0.05)
        else:
            raise AssertionError("worker never reached 3 checkpoints")
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()

    # resume from the last atomic checkpoint
    resumed = checkpoint.load(ckpt)
    assert resumed.count % k == 0, "checkpoint not batch-atomic"
    batches_done = resumed.count // k
    assert batches_done >= 3

    rng = random.Random(seed)
    stream = [rng.randrange(1, 1 << 250) for _ in range(k * n_batches)]
    for b in range(batches_done, n_batches):
        assert resumed.insert_batch(stream[b * k:(b + 1) * k]).all()

    # uninterrupted reference run over the same stream
    ref = SparseIndexedMerkleTree(16, initial_capacity_log2=4)
    for b in range(n_batches):
        assert ref.insert_batch(stream[b * k:(b + 1) * k]).all()

    assert resumed.get_root_int() == ref.get_root_int()
    assert resumed.count == ref.count
