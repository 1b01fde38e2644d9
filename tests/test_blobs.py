"""Postings blob sidecar (index/blobs.py): the Lucene terms-dict/.doc
layout — encoded postings in a consolidated per-segment binary, byte-range
columns in the terms parquet. These tests pin (a) split/materialize
round-trip fidelity, (b) bitwise search parity between the inline and
sidecar physical layouts, (c) ranged-read coalescing correctness, and
(d) merge over mixed-layout segment sets."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from elasticsearch_data_loader_ray.functions.analyzers import token_count_batch
from elasticsearch_data_loader_ray.index import blobs
from elasticsearch_data_loader_ray.index import manifest as mf
from elasticsearch_data_loader_ray.index.build import (
    BuildConfig, build_index_from_corpus, read_segment_terms, seg_terms_path)
from elasticsearch_data_loader_ray.index.merge import merge_segments
from elasticsearch_data_loader_ray.index.search import LocalSearcher, PhraseSearcher


def _corpus(n_docs: int, phrase_every: int = 7) -> pa.Table:
    texts = [
        (f"alpha beta gamma d{i % 13} " if i % phrase_every == 0 else "")
        + f"w{i % 97} common filler{i % 31} body row {i % 5}"
        for i in range(n_docs)
    ]
    return pa.table({
        "url": pa.array([f"{i:012d}" for i in range(n_docs)], pa.string()),
        "warc_ts": pa.array([0] * n_docs, pa.timestamp("us")),
        "text": pa.array(texts, pa.large_string()),
        "lang": pa.array(["en"] * n_docs, pa.string()),
        "doc_len": pa.array(token_count_batch(
            pa.array(texts, pa.large_string())), pa.int32()),
    })


def _build(tmp_path, name: str, corpus: pa.Table, sidecar: bool,
           **cfg_kw) -> str:
    out = str(tmp_path / name)
    build_index_from_corpus(
        rd.from_arrow(corpus), out,
        BuildConfig(docs_per_segment=500, postings_sidecar=sidecar,
                    **cfg_kw))
    return out


def test_split_materialize_roundtrip():
    rng = np.random.default_rng(7)
    n = 50
    doc = [rng.bytes(int(rng.integers(1, 400))) for _ in range(n)]
    tf = [rng.bytes(int(rng.integers(1, 200))) for _ in range(n)]
    pos = [None if i % 5 == 0 else rng.bytes(int(rng.integers(0, 300)))
           for i in range(n)]
    t = pa.table({
        "field": pa.array(["text"] * n),
        "term": pa.array([f"t{i:04d}" for i in range(n)]),
        "df": pa.array([1] * n, pa.int64()),
        "doc_ids_enc": pa.array(doc, pa.binary()),
        "tfs_enc": pa.array(tf, pa.binary()),
        "positions_enc": pa.array(pos, pa.binary()),
        "segment_id": pa.array([3] * n, pa.int32()),
    })
    phys, blob = blobs.split_for_write(t)
    assert not any(c in phys.column_names for c in blobs.ENC_COLUMNS)
    assert all(c in phys.column_names for c in blobs.RANGE_COLUMNS)

    # stage the blob where materialize_enc will look for it
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        terms_path = os.path.join(d, "part-0.parquet")
        with open(blobs.blob_path(terms_path), "wb") as f:
            f.write(blob)
        # subset in scrambled order exercises the unsorted-ranges path
        idx = [41, 3, 17, 0, 49, 25, 5]
        sub = phys.take(pa.array(idx))
        out = blobs.materialize_enc(sub, lambda _s: terms_path,
                                    want_positions=True)
        assert out["doc_ids_enc"].to_pylist() == [doc[i] for i in idx]
        assert out["tfs_enc"].to_pylist() == [tf[i] for i in idx]
        assert out["positions_enc"].to_pylist() == [pos[i] for i in idx]


def test_read_ranges_coalescing(tmp_path):
    rng = np.random.default_rng(11)
    payload = rng.bytes(1 << 20)
    p = str(tmp_path / "blob.bin")
    with open(p, "wb") as f:
        f.write(payload)
    # adjacent, gapped-under-threshold, gapped-over-threshold, duplicate,
    # and out-of-order ranges
    starts = np.array([0, 100, 100, 5000, 900_000, 65, 0], dtype=np.int64)
    ends = np.array([100, 165, 165, 5600, 1 << 20, 100, 50], dtype=np.int64)
    got = blobs._read_ranges(p, starts, ends)
    for g, s, e in zip(got, starts, ends):
        assert g == payload[s:e]
    # whole-file fast path: spans covering most of the file
    starts2 = np.array([0], dtype=np.int64)
    ends2 = np.array([len(payload)], dtype=np.int64)
    assert blobs._read_ranges(p, starts2, ends2)[0] == payload


def test_sidecar_layout_written_and_inline_toggle(tmp_path):
    corpus = _corpus(800)
    idx_s = _build(tmp_path, "side", corpus, sidecar=True)
    idx_i = _build(tmp_path, "inline", corpus, sidecar=False)

    seg = sorted(mf.committed_segments(idx_s))[0]
    schema_s = pq.read_schema(seg_terms_path(idx_s, seg))
    assert blobs.has_sidecar(schema_s)
    assert "doc_ids_enc" not in schema_s.names
    assert os.path.exists(blobs.blob_path(seg_terms_path(idx_s, seg)))

    seg_i = sorted(mf.committed_segments(idx_i))[0]
    schema_i = pq.read_schema(seg_terms_path(idx_i, seg_i))
    assert not blobs.has_sidecar(schema_i)
    assert "doc_ids_enc" in schema_i.names


def test_inline_vs_sidecar_search_parity(tmp_path):
    corpus = _corpus(1200)
    idx_s = _build(tmp_path, "side", corpus, sidecar=True,
                   index_positions=True)
    idx_i = _build(tmp_path, "inline", corpus, sidecar=False,
                   index_positions=True)
    s_s, s_i = LocalSearcher(idx_s), LocalSearcher(idx_i)
    for q in ["alpha", "common body", "alpha beta gamma", "w13 filler7"]:
        for mode in ["or", "and"]:
            ids_a, sc_a = s_s.search(q, 25, mode=mode)
            ids_b, sc_b = s_i.search(q, 25, mode=mode)
            np.testing.assert_array_equal(ids_a, ids_b)
            np.testing.assert_array_equal(sc_a, sc_b)  # bitwise
    p_s, p_i = PhraseSearcher(s_s), PhraseSearcher(s_i)
    ids_a, sc_a, _ = p_s.search("alpha beta gamma", 25)
    ids_b, sc_b, _ = p_i.search("alpha beta gamma", 25)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_array_equal(sc_a, sc_b)


def test_merge_mixed_layouts(tmp_path):
    """A merge run over segments written in different physical layouts
    (e.g. an old inline index appended to after the sidecar landed) must
    produce the same postings as an all-one-layout index."""
    corpus = _corpus(1000)
    idx = _build(tmp_path, "mixed", corpus, sidecar=True)
    # rewrite ONE committed segment inline (simulating a pre-sidecar segment)
    seg = sorted(mf.committed_segments(idx))[0]
    logical = read_segment_terms(idx, seg)
    path = seg_terms_path(idx, seg)
    blob = blobs.blob_path(path)
    pq.write_table(logical.drop_columns(
        [c for c in ("segment_id",) if c in logical.column_names]), path)
    if os.path.exists(blob):
        os.remove(blob)
    assert not blobs.has_sidecar(pq.read_schema(path))

    before = {}
    for s in sorted(mf.committed_segments(idx)):
        t = read_segment_terms(idx, s)
        for i in range(t.num_rows):
            key = (t["field"][i].as_py(), t["term"][i].as_py())
            before.setdefault(key, 0)
            before[key] += t["df"][i].as_py()

    merge_segments(idx, group_size=100)
    segs = sorted(mf.committed_segments(idx))
    assert len(segs) == 1
    t = read_segment_terms(idx, segs[0])
    after = {(t["field"][i].as_py(), t["term"][i].as_py()):
             t["df"][i].as_py() for i in range(t.num_rows)}
    assert after == before

    # merged output is searchable and uses the current (sidecar) layout
    assert blobs.has_sidecar(pq.read_schema(seg_terms_path(idx, segs[0])))
    ids, _ = LocalSearcher(idx).search("alpha", 10)
    assert len(ids) > 0


def test_fd_cache_detects_inode_change(tmp_path):
    """An in-place rebuild reusing a segment path replaces the inode; the
    fd cache must not keep serving the deleted old file's bytes."""
    p = str(tmp_path / "seg.bin")
    with open(p, "wb") as f:
        f.write(b"OLD_BYTES_" * 10)
    starts = np.array([0], dtype=np.int64)
    ends = np.array([9], dtype=np.int64)
    assert blobs._read_ranges(p, starts, ends)[0] == b"OLD_BYTES"
    # replace via tmp+rename (new inode), the build's atomic publish rule
    q = str(tmp_path / "seg.bin.tmp")
    with open(q, "wb") as f:
        f.write(b"NEW_BYTES_" * 10)
    os.replace(q, p)
    assert blobs._read_ranges(p, starts, ends)[0] == b"NEW_BYTES"
