"""Structured logging + throughput counters.

The reference has no observability beyond println! in tests (SURVEY §5).
This is the production-facing replacement: a std-logging backbone with
structured key=value lines and a tiny metrics registry (hash/insert
counters, derived rates) suitable for scraping.
"""

from __future__ import annotations

import logging
import time
from contextlib import contextmanager
from dataclasses import dataclass, field


logger = logging.getLogger("imt_tpu")


def log_event(event: str, **kv) -> None:
    if logger.isEnabledFor(logging.INFO):
        payload = " ".join(f"{k}={v}" for k, v in kv.items())
        logger.info("%s %s", event, payload)


@dataclass
class Metrics:
    """Cumulative counters; thread-unsafe by design (per-host engine loop)."""

    hashes: int = 0
    permutations: int = 0
    inserts: int = 0
    inserts_rejected: int = 0
    inserts_submitted: int = 0
    non_inclusion_queries: int = 0
    _start: float = field(default_factory=time.time)

    def record_hashes(self, n: int) -> None:
        self.hashes += n
        self.permutations += 2 * n  # 2 perms per fixed-len hash (SURVEY §3.1)

    def record_inserts(self, accepted: int, rejected: int = 0) -> None:
        self.inserts += accepted
        self.inserts_rejected += rejected

    def record_submitted(self, n: int) -> None:
        """Inserts dispatched whose acceptance stays device-resident
        (as_numpy=False paths): counted without forcing a host sync."""
        self.inserts_submitted += n

    def record_queries(self, n: int) -> None:
        self.non_inclusion_queries += n

    def rates(self) -> dict:
        dt = max(time.time() - self._start, 1e-9)
        return {
            "hashes_per_s": self.hashes / dt,
            "perms_per_s": self.permutations / dt,
            "inserts_per_s": self.inserts / dt,
            "uptime_s": dt,
        }

    def snapshot(self) -> dict:
        return {
            "hashes": self.hashes,
            "permutations": self.permutations,
            "inserts": self.inserts,
            "inserts_rejected": self.inserts_rejected,
            "inserts_submitted": self.inserts_submitted,
            "non_inclusion_queries": self.non_inclusion_queries,
            **self.rates(),
        }


GLOBAL_METRICS = Metrics()


@contextmanager
def trace(label: str, trace_dir: str | None = None):
    """Profiling scope: wraps the region in a jax.profiler trace.

    With trace_dir set (or IMT_TRACE_DIR in the env), captures a full XLA
    profile viewable in TensorBoard/Perfetto; otherwise it is a named
    TraceAnnotation plus a wall-clock log line — cheap enough to leave on
    around production batch loops."""
    import os

    import jax

    td = trace_dir or os.environ.get("IMT_TRACE_DIR")
    t0 = time.time()
    if td:
        with jax.profiler.trace(td):
            with jax.profiler.TraceAnnotation(label):
                yield
    else:
        with jax.profiler.TraceAnnotation(label):
            yield
    log_event("trace", label=label, wall_s=round(time.time() - t0, 6),
              profile_dir=td or "-")
