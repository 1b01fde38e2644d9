"""Gauss-decay function_score (LocalSearcher.search_decay) semantics.

The decay factor is a pure function of the doc's warc_ts doc-value in
whole hours; scores must equal BM25 * gauss computed independently."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from elasticsearch_data_loader_ray.functions.analyzers import (
    token_count_batch,
)
from elasticsearch_data_loader_ray.index.build import (
    BuildConfig,
    build_index_from_corpus,
)
from elasticsearch_data_loader_ray.index.search import LocalSearcher

VOCAB = ["data", "query", "scan", "table", "fast", "slow", "the"]


@pytest.fixture(scope="module")
def decay_index(tmp_path_factory):
    rng = np.random.default_rng(11)
    n = 200
    texts = [" ".join(rng.choice(VOCAB, rng.integers(4, 30)))
             for _ in range(n)]
    # hourly timestamps from the epoch; one doc with a NULL warc_ts
    ts = [None if i == 5 else i * 3_600_000_000 for i in range(n)]
    corpus = pa.table({
        "url": pa.array([f"{i:08d}" for i in range(n)], pa.string()),
        "warc_ts": pa.array(ts, pa.timestamp("us")),
        "text": pa.array(texts, pa.large_string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "doc_len": pa.array(token_count_batch(
            pa.array(texts, pa.large_string())), pa.int32()),
    })
    idx = str(tmp_path_factory.mktemp("decay_idx"))
    build_index_from_corpus(rd.from_arrow(corpus), idx,
                            BuildConfig(docs_per_segment=32))
    return idx, ts


def test_decay_equals_bm25_times_gauss(decay_index):
    idx, ts = decay_index
    s = LocalSearcher(idx)
    origin, scale, offset, decay = 100.0, 24.0, 6.0, 0.5
    base_ids, base_sc = s.search("data query", k=1000)
    got_ids, got_sc = s.search_decay(
        "data query", k=1000, origin_hours=origin, scale_hours=scale,
        offset_hours=offset, decay=decay)
    base = dict(zip(base_ids.tolist(), base_sc.tolist()))
    sigma2 = scale * scale / (2.0 * np.log(1.0 / decay))
    for d, sc in zip(got_ids.tolist(), got_sc.tolist()):
        if ts[d] is None:
            assert sc == 0.0
            continue
        h = ts[d] // 3_600_000_000
        dist = max(abs(h - origin) - offset, 0.0)
        want = base[d] * np.exp(-(dist * dist) / (2 * sigma2))
        assert sc == pytest.approx(want, rel=1e-12)
    # decay value at origin +- (offset + scale) is exactly `decay`
    exact = np.exp(-(scale * scale) / (2 * sigma2))
    assert exact == pytest.approx(decay, rel=1e-12)


def test_decay_demotes_far_docs(decay_index):
    idx, _ts = decay_index
    s = LocalSearcher(idx)
    # origin at hour 0: late docs decay toward 0, so the top hit must be
    # an early doc even if a late doc has higher raw BM25
    ids, sc = s.search_decay("data", k=5, origin_hours=0.0,
                             scale_hours=10.0, decay=0.5)
    assert len(ids) > 0
    assert all(i < 100 for i in ids.tolist())
    assert all(a >= b for a, b in zip(sc, sc[1:]))
