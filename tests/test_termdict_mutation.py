"""Termdict-under-mutation property tests (VERDICT r4 #7).

The consolidated term-dictionary sidecar is epoch-validated at bind, but
its parquet footers parse lazily on the FIRST query — a concurrent
merge/append/compact can drop or rebuild the sidecar inside that window.
The contract: a reader either serves its bound epoch via the sidecar, or
falls back to the per-segment fan-out — it must NEVER raise and NEVER
return results from a dictionary belonging to a different segment set.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_data_loader_ray import fixtures
from elasticsearch_data_loader_ray.functions.analyzers import token_count_batch
from elasticsearch_data_loader_ray.index import manifest as mf
from elasticsearch_data_loader_ray.index.append import append_index_from_corpus
from elasticsearch_data_loader_ray.index.build import (
    BuildConfig,
    build_index,
    drop_termdict,
    ensure_termdict,
)
from elasticsearch_data_loader_ray.index.merge import merge_segments
from elasticsearch_data_loader_ray.index.search import LocalSearcher

import ray.data as rd


def _corpus_table(urls: list[str], texts: list[str]) -> pa.Table:
    n = len(urls)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array([0] * n, pa.timestamp("us")),
        "text": pa.array(texts, pa.large_string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "doc_len": pa.array(token_count_batch(
            pa.array(texts, pa.large_string())), pa.int32()),
    })


@pytest.fixture()
def td_index(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(fixtures.generate_webtext(400), str(src / "p.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(src), idx, BuildConfig(docs_per_segment=50))
    ensure_termdict(idx)
    return idx


def test_termdict_dropped_between_bind_and_first_query(td_index):
    """drop_termdict in the bind->first-query window: the reader must fall
    back to the per-segment fan-out and serve identical results."""
    idx = td_index
    ref = LocalSearcher(idx, termdict="off", compact="off")
    want_ids, want_sc = ref.search("the data", k=10)

    s = LocalSearcher(idx, compact="off")  # binds the sidecar, no query yet
    assert s.termdict_files
    drop_termdict(idx)  # the concurrent merge's first move
    ids, sc = s.search("the data", k=10)
    assert s.termdict_files == []  # fell back, permanently for this epoch
    assert ids.tolist() == want_ids.tolist()
    assert sc.tolist() == want_sc.tolist()


def test_termdict_rebuilt_for_new_epoch_in_window(td_index):
    """Append + sidecar rebuild inside the window: term_stats (global df)
    was rewritten in place, so the old-epoch reader CANNOT lazily serve —
    mixing fresh df with old segments would be a torn snapshot matching
    neither epoch. The cold _idf path must detect the stats.json epoch
    move, re-bind whole, and serve the NEW epoch (the ES reader-reopen
    analogue) — with the new-epoch sidecar validated and bound."""
    idx = td_index
    s = LocalSearcher(idx, compact="off")  # old epoch, sidecar bound
    assert s.termdict_files
    old_segs = [int(x) for x in s.seg_ids]

    append_index_from_corpus(
        rd.from_arrow(_corpus_table(
            ["https://td/new1"], ["zzznovelterm the data the data"])),
        idx, BuildConfig(docs_per_segment=50))
    ensure_termdict(idx)  # sidecar rebuilt for the NEW epoch
    meta = mf.read_json(os.path.join(idx, "termdict", "meta.json"))
    assert meta["seg_ids"] != old_segs

    ref = LocalSearcher(idx, termdict="off", compact="off")  # new epoch
    want_ids, want_sc = ref.search("the data", k=10)
    ids, sc = s.search("the data", k=10)
    assert [int(x) for x in s.seg_ids] == meta["seg_ids"]  # re-bound
    assert ids.tolist() == want_ids.tolist()
    assert sc.tolist() == want_sc.tolist()
    # the appended doc is visible to the re-bound reader
    assert len(s.search("zzznovelterm", k=10)[0]) == 1
    # and the sidecar it now trusts is the new epoch's
    assert s._td_bounds() is not None


def test_reader_under_mutation_loop_never_stale(td_index):
    """Interleaved merge/append/termdict churn against an auto-refreshing
    reader: after every mutation the reader's next answer must equal a
    fresh fan-out searcher's answer on the CURRENT epoch (refresh_interval
    0.0 re-binds each query), across sidecar present/absent/stale states."""
    idx = td_index
    reader = LocalSearcher(idx, refresh_interval=0.0, compact="off")
    q = "the data"

    def check():
        fresh = LocalSearcher(idx, termdict="off", compact="off")
        want_ids, want_sc = fresh.search(q, k=10)
        ids, sc = reader.search(q, k=10)
        assert ids.tolist() == want_ids.tolist()
        assert sc.tolist() == want_sc.tolist()

    check()
    drop_termdict(idx)
    check()
    merge_segments(idx, group_size=3)
    check()
    ensure_termdict(idx)
    check()
    for i in range(3):
        append_index_from_corpus(
            rd.from_arrow(_corpus_table(
                [f"https://td/loop{i}"], [f"loopdoc{i} the data"])),
            idx, BuildConfig(docs_per_segment=50))
        check()
        ensure_termdict(idx)
        check()
    merge_segments(idx, group_size=4)
    check()
