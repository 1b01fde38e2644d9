"""Segment merge: search results must be bit-identical before and after."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from elasticsearch_data_loader_ray import fixtures
from elasticsearch_data_loader_ray.index import manifest as mf
from elasticsearch_data_loader_ray.index.build import BuildConfig, build_index
from elasticsearch_data_loader_ray.index.merge import merge_segments
from elasticsearch_data_loader_ray.index.search import search, search_inprocess


@pytest.fixture(scope="module")
def merged_index(tmp_path_factory):
    src = tmp_path_factory.mktemp("mg_src")
    pq.write_table(fixtures.generate_webtext(600), str(src / "p.parquet"))
    out = str(tmp_path_factory.mktemp("mg_idx"))
    build_index(str(src), out, BuildConfig(docs_per_segment=100))
    queries = fixtures.generate_queries()
    before = search(out, queries).to_pandas()
    n_before = len(mf.committed_segments(out))
    survivors = merge_segments(out, group_size=3)
    return out, queries, before, n_before, survivors


def test_merge_reduces_segments(merged_index):
    out, _q, _b, n_before, survivors = merged_index
    assert n_before >= 4
    after = mf.committed_segments(out)
    assert len(after) == len(survivors) < n_before
    m = next(m for m in after.values() if "absorbed" in m)
    assert len(m["absorbed"]) >= 2
    assert m["absorbed_buckets"] == sorted(m["absorbed"])  # first-level merge


def test_merge_preserves_search_bitwise(merged_index):
    out, queries, before, _n, _s = merged_index
    after = search(out, queries).to_pandas()
    assert before["doc_id"].tolist() == after["doc_id"].tolist()
    assert before["score"].tolist() == after["score"].tolist()
    local = search_inprocess(out, queries).to_pandas()
    assert local["score"].tolist() == after["score"].tolist()


def test_merge_idempotent_convergence(merged_index):
    out, queries, before, _n, _s = merged_index
    merge_segments(out, group_size=10)
    assert len(mf.committed_segments(out)) <= 2
    final = search(out, queries).to_pandas()
    assert final["score"].tolist() == before["score"].tolist()


def test_build_resume_after_merge_rebuilds_nothing(merged_index, tmp_path_factory):
    """A build resumed on a merged index must not re-index absorbed buckets
    (duplicate docs) — covered_buckets includes absorbed ids."""
    import pyarrow.parquet as pq_

    from elasticsearch_data_loader_ray.index.build import BuildConfig, build_index

    out, queries, before, _n, _s = merged_index
    # simulate a pipeline retry: finalize markers removed, build re-run
    os.unlink(os.path.join(out, "stats.json"))
    os.unlink(os.path.join(out, "term_stats", "_SUCCESS"))
    src = tmp_path_factory.mktemp("mg_resrc")
    pq_.write_table(fixtures.generate_webtext(600), str(src / "p.parquet"))
    build_index(str(src), out, BuildConfig(docs_per_segment=100))
    after = search(out, queries).to_pandas()
    assert after["doc_id"].tolist() == before["doc_id"].tolist()
    assert after["score"].tolist() == before["score"].tolist()


def test_merged_equals_directly_built(tmp_path_factory):
    """Strong invariant: an index built with many segments then merged to
    one holds the SAME decoded postings as an index built as one segment
    directly (block layouts differ, content must not)."""
    import numpy as np

    from elasticsearch_data_loader_ray.index import codec
    from elasticsearch_data_loader_ray.index.build import seg_terms_path

    src = tmp_path_factory.mktemp("inv_src")
    pq.write_table(fixtures.generate_webtext(400), str(src / "p.parquet"))
    many = str(tmp_path_factory.mktemp("inv_many"))
    build_index(str(src), many, BuildConfig(docs_per_segment=60))
    merge_segments(many, group_size=100)  # collapse to one
    one = str(tmp_path_factory.mktemp("inv_one"))
    build_index(str(src), one, BuildConfig(docs_per_segment=10**6))

    def postings_map(idx):
        from elasticsearch_data_loader_ray.index.build import read_segment_terms

        seg = sorted(mf.committed_segments(idx))[0]
        t = read_segment_terms(idx, seg)
        out = {}
        for i in range(t.num_rows):
            key = (t["field"][i].as_py(), t["term"][i].as_py())
            ids, tfs = codec.decode_postings(
                t["doc_ids_enc"][i].as_py(), t["tfs_enc"][i].as_py(),
                int(t["df"][i].as_py()))
            out[key] = (ids.tolist(), tfs.tolist())
        return out

    a, b = postings_map(many), postings_map(one)
    assert set(a) == set(b)
    for k in a:
        assert a[k] == b[k], k


def test_conjunctive_after_merge(merged_index):
    out, _q, _b, _n, _s = merged_index
    q = [{"query_id": 0, "query": "the data", "k": 10, "mode": "and"}]
    dist = search(out, q).to_pandas()
    local = search_inprocess(out, q).to_pandas()
    assert dist["doc_id"].tolist() == local["doc_id"].tolist()
    assert len(dist) > 0


def test_searcher_epoch_swap_after_merge(tmp_path_factory):
    """A LocalSearcher bound before a merge keeps serving after refresh():
    the committed-segment epoch swap rebinds files and drops caches, and
    results from the merged segments are bitwise-identical (backlog #4 /
    ES refresh_interval analogue)."""
    from elasticsearch_data_loader_ray.index.search import LocalSearcher

    src = tmp_path_factory.mktemp("ref_src")
    pq.write_table(fixtures.generate_webtext(500), str(src / "p.parquet"))
    out = str(tmp_path_factory.mktemp("ref_idx"))
    build_index(str(src), out, BuildConfig(docs_per_segment=100))
    lo = LocalSearcher(out)
    before = [lo.search(q, k=10)
              for q in ("the data", "w0042", "index query page web")]
    old_ids = list(lo.seg_ids)
    merge_segments(out, group_size=3)
    assert lo.refresh() is True
    assert lo.seg_ids != old_ids
    assert any(s >= mf.MERGED_ID_BASE for s in lo.seg_ids)
    for q, (ids_b, sc_b) in zip(
            ("the data", "w0042", "index query page web"), before):
        ids_a, sc_a = lo.search(q, k=10)
        assert ids_b.tolist() == ids_a.tolist()
        assert sc_b.tolist() == sc_a.tolist()  # bitwise across the swap
    # idempotent: no further change -> no swap
    assert lo.refresh() is False


def test_searcher_auto_refresh_interval(tmp_path_factory):
    """refresh_interval (the reference's search_scheme.json:6 knob): a
    searcher with interval=0 picks up a merge on the next search without
    an explicit refresh() call."""
    from elasticsearch_data_loader_ray.index.search import LocalSearcher

    src = tmp_path_factory.mktemp("ar_src")
    pq.write_table(fixtures.generate_webtext(400), str(src / "p.parquet"))
    out = str(tmp_path_factory.mktemp("ar_idx"))
    build_index(str(src), out, BuildConfig(docs_per_segment=100))
    lo = LocalSearcher(out, refresh_interval=0.0)
    ids_b, sc_b = lo.search("the data", k=10)
    merge_segments(out, group_size=10)
    ids_a, sc_a = lo.search("the data", k=10)  # auto-swapped epoch
    assert any(s >= mf.MERGED_ID_BASE for s in lo.seg_ids)
    assert ids_b.tolist() == ids_a.tolist()
    assert sc_b.tolist() == sc_a.tolist()


def test_compact_to_bounds_segment_count(tmp_path_factory):
    from elasticsearch_data_loader_ray.index.merge import compact_to

    src = tmp_path_factory.mktemp("ct_src")
    pq.write_table(fixtures.generate_webtext(600), str(src / "p.parquet"))
    src = str(src)
    idx = str(tmp_path_factory.mktemp("idx_compact"))
    stats = build_index(src, idx, BuildConfig(docs_per_segment=60))
    assert stats["n_segments"] >= 8
    queries = fixtures.generate_queries()
    before = search(idx, queries).to_pandas()
    survivors = compact_to(idx, 3)
    assert len(survivors) <= 3
    assert len(mf.committed_segments(idx)) == len(survivors)
    after = search(idx, queries).to_pandas()
    assert before["doc_id"].tolist() == after["doc_id"].tolist()
    assert before["score"].tolist() == after["score"].tolist()


def test_auto_compact_at_bind(tmp_path_factory, monkeypatch):
    """LocalSearcher(compact="auto") on a many-segment index runs a
    one-time tiered compaction at bind (VERDICT r4 #8: make the measured
    serving-side prerequisite a default, not a comment); a held lock or
    compact="off" leaves the layout alone and search stays bitwise-equal
    on the exact fallback path."""
    from elasticsearch_data_loader_ray.index.search import LocalSearcher

    src = tmp_path_factory.mktemp("ac_src")
    pq.write_table(fixtures.generate_webtext(600), str(src / "p.parquet"))
    idx = str(tmp_path_factory.mktemp("ac_idx"))
    stats = build_index(str(src), idx, BuildConfig(docs_per_segment=50))
    assert stats["n_segments"] > 6
    monkeypatch.setattr(LocalSearcher, "COMPACT_AUTO_SEGMENTS", 6)
    monkeypatch.setattr(LocalSearcher, "COMPACT_TARGET", 3)

    off = LocalSearcher(idx, compact="off")
    assert len(off.seg_ids) == stats["n_segments"]
    ids_off, sc_off = off.search("the data", k=10)

    # held lock: bind must skip compaction silently and still serve
    lock = os.path.join(idx, ".compact_lock")
    with open(lock, "w") as f:
        f.write("held")
    locked = LocalSearcher(idx)  # compact defaults to "auto"
    assert len(locked.seg_ids) == stats["n_segments"]
    ids_l, sc_l = locked.search("the data", k=10)
    assert ids_l.tolist() == ids_off.tolist()
    os.unlink(lock)

    auto = LocalSearcher(idx)
    assert len(auto.seg_ids) <= 3
    assert not os.path.exists(lock)  # released
    ids_a, sc_a = auto.search("the data", k=10)
    assert ids_a.tolist() == ids_off.tolist()
    assert sc_a.tolist() == sc_off.tolist()
