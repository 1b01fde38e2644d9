"""ST2 — metrics actor: the status-goroutine analogue.

The reference runs a goroutine owning read/insert/skip counters fed by
channels, printing totals + per-second rates on a 1 s ticker
(``/root/reference/companybindex/main.go:43-47,283-313``). Here: one named
Ray actor accumulates per-partition counters pushed by pipeline stages;
``snapshot()`` returns totals, per-partition detail and rates since start;
``flush_json`` persists the snapshot (the BENCH/metrics artifact).

Stages push asynchronously (fire-and-forget ``.remote()``) so the actor is
never on the critical path — at most one in-flight RPC per task batch.
"""

from __future__ import annotations

import json
import os
import time

import ray

ACTOR_NAME = "edlr_metrics"


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self):
        self.t0 = time.time()
        self.totals: dict[str, int] = {}
        self.per_partition: dict[str, dict[str, int]] = {}

    def incr(self, kind: str, n: int = 1, partition: str | None = None) -> None:
        self.totals[kind] = self.totals.get(kind, 0) + n
        if partition is not None:
            p = self.per_partition.setdefault(str(partition), {})
            p[kind] = p.get(kind, 0) + n

    def snapshot(self) -> dict:
        elapsed = max(1e-9, time.time() - self.t0)
        return {
            "elapsed_secs": round(elapsed, 3),
            "totals": dict(self.totals),
            "rates_per_sec": {k: round(v / elapsed, 2)
                              for k, v in self.totals.items()},
            "per_partition": {k: dict(v)
                              for k, v in self.per_partition.items()},
        }

    def reset(self) -> None:
        self.t0 = time.time()
        self.totals.clear()
        self.per_partition.clear()


def get_or_create() -> "ray.actor.ActorHandle":
    return MetricsActor.options(
        name=ACTOR_NAME, get_if_exists=True, lifetime="detached"
    ).remote()


def flush_json(path: str) -> dict:
    snap = ray.get(get_or_create().snapshot.remote())
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(snap, f, sort_keys=True, indent=1)
    return snap
