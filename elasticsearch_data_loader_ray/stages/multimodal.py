"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a ``media_type``
string and a metadata struct — the Ray-side plumbing (schemas, actor-pool
stages, batch sizing, output layout) is real and tested; the actual decode
is STUBBED because no image/audio libraries exist in this container:

* ``ImageFeatureStage`` tries ``import PIL``; absent (always, here) it
  either raises ``NotImplementedError`` (``strict=True``) or uses a
  deterministic fake decoder (bytes -> seeded pseudo-pixels) so the
  downstream feature schema is exercised end to end.
* ``frame_sample`` treats a "video" payload as fixed-size frame chunks and
  keeps every Nth — the decode-free skeleton of a frame sampler.

Batch-size note for 100 TB: payloads are wide — callers should pass a small
``batch_size`` (64-256) and rely on ``DataContext.target_max_block_size``
so one batch x pool concurrency fits worker heaps.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    pa.field("media_id", pa.string()),
    pa.field("media_type", pa.string()),   # e.g. image/png, audio/wav
    pa.field("payload", pa.binary()),
    pa.field("width", pa.int32()),
    pa.field("height", pa.int32()),
])

FEATURE_DIM = 16


def fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for image decode: seed an rng from the payload
    hash and synthesize a (height, width) luma plane. Stable across runs and
    processes — good enough to exercise feature extraction end to end."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(max(1, height), max(1, width)),
                        dtype=np.uint8)


class ImageFeatureStage:
    """Actor-pool stage: media batch -> per-item feature vector.

    ``map_batches(ImageFeatureStage, concurrency=N, batch_size=64,
    batch_format="pyarrow")``. Decoder state is built once per actor in
    ``__init__`` (ST3/ST4 pattern).
    """

    def __init__(self, strict: bool = False):
        # A real decode path is NOT implemented (stub engine): strict mode
        # fails fast; otherwise the deterministic fake decoder is used
        # regardless of whether Pillow happens to be importable.
        if strict:
            raise NotImplementedError(
                "real image decode is not implemented in this container; "
                "run with strict=False to use the deterministic stub")
        self.decoder = None

    def _features(self, plane: np.ndarray) -> np.ndarray:
        hist = np.bincount(plane.ravel() >> 4, minlength=FEATURE_DIM)[:FEATURE_DIM]
        return (hist / max(1, plane.size)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, ok = [], []
        for payload, w, h in zip(batch["payload"].to_pylist(),
                                 batch["width"].to_pylist(),
                                 batch["height"].to_pylist()):
            if payload is None:
                # empty list, not null: ragged-null list columns break the
                # pandas/TensorArray conversion downstream
                feats.append([])
                ok.append(False)
                continue
            plane = fake_decode(payload, w or 1, h or 1)
            feats.append(self._features(plane).tolist())
            ok.append(True)
        return pa.table({
            "media_id": batch["media_id"],
            "media_type": batch["media_type"],
            "decoded": pa.array(ok, pa.bool_()),
            "features": pa.array(feats, pa.list_(pa.float32())),
        })


def frame_sample(batch: pa.Table, frame_bytes: int = 1024,
                 every_nth: int = 10) -> pa.Table:
    """Flat-map a 'video' payload into every-Nth fixed-size frame chunks."""
    ids, idxs, frames = [], [], []
    for mid, payload in zip(batch["media_id"].to_pylist(),
                            batch["payload"].to_pylist()):
        if payload is None:
            continue
        n_frames = max(1, len(payload) // frame_bytes)
        for fi in range(0, n_frames, every_nth):
            ids.append(mid)
            idxs.append(fi)
            frames.append(payload[fi * frame_bytes:(fi + 1) * frame_bytes])
    return pa.table({
        "media_id": pa.array(ids, pa.string()),
        "frame_index": pa.array(idxs, pa.int32()),
        "frame": pa.array(frames, pa.binary()),
    })


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media fixture (binary payloads of varying size)."""
    rng = np.random.default_rng(seed)
    ids = [f"m{i:05d}" for i in range(n)]
    types = ["image/png" if i % 3 else "video/raw" for i in range(n)]
    payloads = [rng.integers(0, 256, size=int(2048 + 4096 * rng.random()),
                             dtype=np.uint8).tobytes() if i % 17 != 5 else None
                for i in range(n)]
    return pa.table({
        "media_id": pa.array(ids, pa.string()),
        "media_type": pa.array(types, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array([32] * n, pa.int32()),
        "height": pa.array([24] * n, pa.int32()),
    })
