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
    """All committed segment manifests, keyed by segment_id."""
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
