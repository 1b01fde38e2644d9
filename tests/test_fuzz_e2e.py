"""Multi-seed end-to-end fuzz: random corpora, engine must equal the oracle
bitwise, across different segment sizes and parallelism-independent configs."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from elasticsearch_data_loader_ray import fixtures
from elasticsearch_data_loader_ray.index import oracle
from elasticsearch_data_loader_ray.index.build import BuildConfig, build_index
from elasticsearch_data_loader_ray.index.search import search_inprocess


@pytest.mark.parametrize("seed,n_docs,dps", [
    (7, 250, 40), (101, 333, 97), (2024, 180, 1000),
])
def test_random_corpus_engine_equals_oracle(tmp_path, seed, n_docs, dps):
    t = fixtures.generate_webtext(n_docs, seed=seed)
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(t, str(src / "p.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(src), idx, BuildConfig(docs_per_segment=dps))
    queries = fixtures.generate_queries()
    got = search_inprocess(idx, queries).to_pandas()
    want = oracle.bm25_topk(t, queries).to_pandas()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["score"].tolist() == want["score"].tolist()  # bitwise


def test_resume_cleans_crash_leftovers(tmp_path):
    """A crash between segment-file rename and manifest commit leaves an
    uncommitted segment dir and possibly a .tmp dir; a resumed build must
    overwrite both and produce a correct index."""
    import shutil

    from elasticsearch_data_loader_ray.index import manifest as mf
    from elasticsearch_data_loader_ray.index.build import seg_terms_path

    t = fixtures.generate_webtext(300)
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(t, str(src / "p.parquet"))
    idx = str(tmp_path / "idx")
    cfg = BuildConfig(docs_per_segment=100)
    build_index(str(src), idx, cfg)
    segs = sorted(mf.committed_segments(idx))
    victim = segs[0]
    # simulate the crash: manifest gone, files half-written + stale tmp dir
    os.unlink(mf.manifest_path(idx, victim))
    seg_dir = os.path.dirname(seg_terms_path(idx, victim))
    with open(os.path.join(seg_dir, "part-0.parquet"), "wb") as f:
        f.write(b"garbage not parquet")
    os.makedirs(seg_dir + ".tmp-deadbeef", exist_ok=True)
    os.unlink(os.path.join(idx, "stats.json"))
    os.unlink(os.path.join(idx, "term_stats", "_SUCCESS"))
    stats = build_index(str(src), idx, cfg)
    assert sorted(mf.committed_segments(idx)) == segs
    queries = fixtures.generate_queries()
    got = search_inprocess(idx, queries).to_pandas()
    want = oracle.bm25_topk(t, queries).to_pandas()
    assert got["score"].tolist() == want["score"].tolist()
    assert stats["n_docs"] == want["doc_id"].nunique() or stats["n_docs"] > 0
