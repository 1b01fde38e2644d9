"""Product quantization (stages/pq.py): encode/reconstruct invariants,
ADC top-k recall on planted near-dups, and build idempotence."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from elasticsearch_data_loader_ray.stages.pq import (
    pq_build,
    pq_encode,
    pq_reconstruct,
    pq_topk,
    pq_train,
)


def _planted(tmp_path, dim=32, n=400, n_q=15, seed=5):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, dim)).astype(np.float32)
    jitter = base[:n_q] + 0.05 * rng.standard_normal(
        (n_q, dim)).astype(np.float32)
    vecs = np.vstack([base, jitter])
    path = str(tmp_path / "emb.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
    }), path)
    return path, vecs, n_q


def test_pq_encode_reconstruct_reduces_error():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((500, 32))
    books = pq_train(x, m=4, k=16)
    codes = pq_encode(x, books)
    assert codes.shape == (500, 4) and codes.dtype == np.uint8
    assert codes.max() < 16
    # deterministic
    assert (pq_encode(x, books) == codes).all()
    rec = pq_reconstruct(codes, books)
    err = np.linalg.norm(x - rec, axis=1).mean()
    base = np.linalg.norm(x - x.mean(axis=0), axis=1).mean()
    assert err < base * 0.9  # beats the rank-0 (global mean) quantizer
    # each code picks the NEAREST centroid of its subspace
    j = 2
    sub = x[:, j * 8:(j + 1) * 8]
    d2 = ((sub ** 2).sum(1)[:, None] + (books[j] ** 2).sum(1)[None, :]
          - 2.0 * sub @ books[j].T)
    assert (codes[:, j] == d2.argmin(axis=1)).all()


def test_pq_topk_recalls_planted_near_dups(tmp_path, ray_session):
    path, vecs, n_q = _planted(tmp_path)
    out = str(tmp_path / "pq")
    pq_build(path, out, m=8, k=16)
    q = vecs[:n_q].astype(np.float64)
    got = pq_topk(out, q, list(range(n_q)), k=5).to_pandas()
    self_hits = planted_hits = 0
    for qid in range(n_q):
        found = set(got[got["query_vec_id"] == qid]["vec_id"])
        self_hits += qid in found
        planted_hits += (400 + qid) in found
    # ADC over 8x16 codebooks is lossy; the planted twin (cos ~0.999)
    # must still surface for most queries, and so must the query itself
    assert self_hits / n_q >= 0.8, self_hits
    assert planted_hits / n_q >= 0.8, planted_hits
    # ranks ascend by adc_dist within each query
    for qid in range(n_q):
        d = got[got["query_vec_id"] == qid].sort_values("rank")["adc_dist"]
        assert (np.diff(d.to_numpy()) >= 0).all()


def test_pq_build_idempotent(tmp_path, ray_session):
    path, vecs, n_q = _planted(tmp_path, n=100, n_q=3)
    out = str(tmp_path / "pq")
    p1 = pq_build(path, out, m=8, k=16)
    t1 = pq_topk(out, vecs[:1].astype(np.float64), [0], k=3)
    p2 = pq_build(path, out, m=8, k=16)  # _SUCCESS short-circuits
    t2 = pq_topk(out, vecs[:1].astype(np.float64), [0], k=3)
    assert p1 == p2
    assert t1.equals(t2)
