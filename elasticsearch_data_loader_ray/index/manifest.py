"""Per-partition lineage manifests — atomic commit + resume.

The reference has no checkpointing (re-run = delete index + full reload,
``/root/reference/run-elastic-search.sh:84-94``); the north rule requires it.
Design: every index segment commits a JSON manifest via write-temp + rename
(atomic on POSIX); a resumed build skips segments whose manifest says
``committed``. The manifest carries lineage (input description, row counts,
checksum) so a verifier can audit per-partition provenance, and per-partition
throughput metrics (north_rule: per-partition throughput/doc-count).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any

STATUS_COMMITTED = "committed"
# merged segments get ids in a disjoint namespace so "is an original bucket"
# stays decidable from the id alone
MERGED_ID_BASE = 1_000_000


def manifest_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "manifests")


def manifest_path(index_dir: str, segment_id: int) -> str:
    return os.path.join(manifest_dir(index_dir), f"segment-{segment_id:06d}.json")


def write_manifest(index_dir: str, segment_id: int, payload: dict[str, Any]) -> None:
    """Atomically commit a segment manifest (write temp file + rename)."""
    d = manifest_dir(index_dir)
    os.makedirs(d, exist_ok=True)
    payload = dict(payload, segment_id=segment_id, status=STATUS_COMMITTED)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, manifest_path(index_dir, segment_id))
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def read_manifest(index_dir: str, segment_id: int) -> dict[str, Any] | None:
    p = manifest_path(index_dir, segment_id)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def committed_segments(index_dir: str) -> dict[int, dict[str, Any]]:
    """All live committed segment manifests, keyed by segment_id.

    A merged segment's manifest lists the ids it ``absorbed``; those are
    resolved OUT here even if their manifest files still exist — writing the
    merged manifest is the atomic commit point of a merge, and the absorbed
    manifests' deletion is mere cleanup that may lag (crash tolerance).
    """
    d = manifest_dir(index_dir)
    out: dict[int, dict[str, Any]] = {}
    if not os.path.isdir(d):
        return out
    for f in os.listdir(d):
        if f.startswith("segment-") and f.endswith(".json"):
            with open(os.path.join(d, f)) as fh:
                m = json.load(fh)
            if m.get("status") == STATUS_COMMITTED:
                out[int(m["segment_id"])] = m
    absorbed = {int(a) for m in out.values() for a in m.get("absorbed", [])}
    return {k: m for k, m in out.items() if k not in absorbed}


def covered_buckets(index_dir: str) -> set[int]:
    """Bucket ids whose docs are present in SOME live segment: the live ids
    plus everything they absorbed (transitively recorded at merge time).
    Build-resume must skip these, not just the live ids."""
    live = committed_segments(index_dir)
    out = set(live)
    for m in live.values():
        out.update(int(a) for a in m.get("absorbed_buckets", m.get("absorbed", [])))
    return out


def write_json_atomic(path: str, payload: dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def read_json(path: str) -> dict[str, Any]:
    with open(path) as f:
        return json.load(f)
