"""Incremental append — generation segments + url upserts (beyond the
reference, whose only refresh story is delete + full reload,
``/root/reference/run-elastic-search.sh:84-104``).

Semantics
---------
* ``append_index(input_path, index_dir, cfg)`` extracts and cleans the new
  batch, dedups it WITHIN the batch (keep-first by ``(url, warc_ts)`` — the
  build rule), and builds NEW segments whose doc ids continue at the current
  ``stats.n_docs``; segment ids live in the next free million-block (the
  same id namespace discipline as merge's ``MERGED_ID_BASE``).
* Cross-generation identity is URL UPSERT: an appended url that already
  exists in the index supersedes the old document — the old GLOBAL doc id
  is recorded in ``tombstones/gen-<base>.json`` and every search path drops
  tombstoned ids before top-k selection. Like Lucene deleted docs, the
  superseded docs still count in df / avgdl until a full rebuild (scores of
  surviving docs shift by at most the deleted docs' statistical weight —
  the exact ES behavior between merges).
* ``strict_duplicates=True`` treats BOTH intra-batch duplicates and
  cross-generation upserts as fatal create conflicts (D1 parity).

Commit protocol / crash safety
------------------------------
Segment files + manifests commit first but stay INVISIBLE: searchers only
serve segments whose ``doc_id_base + n_docs <= stats.n_docs``. The atomic
``stats.json`` rewrite (new ``n_docs``, ``dl_total``, ``tombstone_files``,
``generations``) is the single visibility point — a crash mid-append leaves
a consistent old index plus invisible garbage that the next append sweeps.
``LocalSearcher.refresh()`` / ``refresh_interval`` pick appends up live.

Exactness: ``dl_total`` is carried as an integer, so after appending
disjoint batches the recomputed ``avgdl`` (and therefore every BM25 score)
is bit-identical to a from-scratch build over the union — the basis of the
``incremental_append`` driver gate entry.
"""

from __future__ import annotations

import math
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..stages.extract import extract_batch
from . import manifest as mf
from .build import (
    BuildConfig,
    DuplicateUrlError,
    _build_bucket,
    _corpus_columns,
    _finalize,
    _ncpus,
    _partition_block,
    _segment_boundaries,
    _write_corpus_block,
    pin_worker_threads,
    seg_docs_path,
    seg_terms_path,
)

APPEND_ID_BASE = 2_000_000


def _next_gen_base(committed: dict[int, dict]) -> int:
    top = max([APPEND_ID_BASE - 1, *committed.keys()])
    return (top // 1_000_000 + 1) * 1_000_000


def sweep_invisible_segments(index_dir: str, n_docs_visible: int) -> list[int]:
    """Remove committed-but-invisible segments (doc range beyond the stats
    visibility point) left by a crashed append. Returns swept ids."""
    swept = []
    for sid, m in mf.committed_segments(index_dir).items():
        if int(m["doc_id_base"]) >= n_docs_visible and sid >= APPEND_ID_BASE:
            for p in (seg_terms_path(index_dir, sid),
                      seg_docs_path(index_dir, sid)):
                d = os.path.dirname(p)
                if os.path.isdir(d):
                    shutil.rmtree(d)
            mp = mf.manifest_path(index_dir, sid)
            if os.path.exists(mp):
                os.unlink(mp)
            swept.append(sid)
    return swept


@ray.remote
def _bucket_stats_urls(*minis: pa.Table):
    """waveA for appends: (n_docs, dl_sum, n_dups, dup_examples,
    unique_urls ndarray) — urls come back so the driver can probe existing
    segments for upserts (driver memory: one pointer-sized row per appended
    unique url; shard giant appends into multiple calls)."""
    pin_worker_threads()
    tabs = [m for m in minis if m.num_rows]
    if not tabs:
        return 0, 0, 0, [], np.empty(0, dtype=object)
    t = pa.concat_tables(tabs).combine_chunks().sort_by(
        [("url", "ascending"), ("warc_ts", "ascending")])
    urls = np.asarray(t["url"].to_numpy(zero_copy_only=False), dtype=object)
    first = np.ones(len(urls), dtype=bool)
    first[1:] = urls[1:] != urls[:-1]
    dl = t["doc_len"].to_numpy()
    return (int(first.sum()), int(dl[first].sum()),
            int(len(urls) - first.sum()), urls[~first][:3].tolist(),
            urls[first])


@ray.remote
def _match_urls(docs_path: str, urls_ref) -> np.ndarray:
    """Doc ids in one existing segment whose url is being re-ingested."""
    pin_worker_threads()
    urls = urls_ref if isinstance(urls_ref, np.ndarray) else ray.get(urls_ref)
    t = pq.read_table(docs_path, columns=["doc_id", "url"])
    seg_urls = np.asarray(t["url"].to_numpy(zero_copy_only=False),
                          dtype=object)
    hit = np.isin(seg_urls, urls)
    return t["doc_id"].to_numpy()[hit]


def append_index(input_path: str, index_dir: str,
                 cfg: BuildConfig | None = None) -> dict:
    """Append raw webtext at ``input_path`` to an existing index."""
    cfg = cfg or BuildConfig()
    urls_ds = rd.read_parquet(input_path, columns=["url"])
    n_est = urls_ds.count()
    boundaries = _segment_boundaries(urls_ds, n_est, cfg) if n_est else []
    errors_dir = os.path.join(index_dir, "errors")
    n_blocks = max(2 * _ncpus(), 16, math.ceil(max(n_est, 1) / 125_000))
    src = rd.read_parquet(
        input_path, override_num_blocks=n_blocks
    ).map_batches(
        extract_batch,
        fn_kwargs={"errors_dir": errors_dir,
                   "max_doc_bytes": cfg.max_doc_bytes},
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
    )
    return _run_append(src, index_dir, cfg, boundaries)


def append_index_from_corpus(corpus: rd.Dataset, index_dir: str,
                             cfg: BuildConfig | None = None) -> dict:
    """Append an already-cleaned corpus Dataset (columns url, warc_ts,
    text, lang, doc_len) to an existing index."""
    cfg = cfg or BuildConfig()
    mat = corpus.materialize()
    n_est = mat.count()
    boundaries = (_segment_boundaries(mat.select_columns(["url"]), n_est, cfg)
                  if n_est else [])
    return _run_append(mat, index_dir, cfg, boundaries)


def _run_append(source: rd.Dataset, index_dir: str, cfg: BuildConfig,
                boundaries: list[str]) -> dict:
    stats_path = os.path.join(index_dir, "stats.json")
    if not os.path.exists(stats_path):
        raise FileNotFoundError(
            f"append requires an existing index at {index_dir}")
    stats = mf.read_json(stats_path)
    want_analyzers = {"text": "standard", **{f: a for f, _s, a in cfg.fields}}
    if stats.get("field_analyzers", {"text": "standard"}) != want_analyzers:
        raise ValueError(
            "append field/analyzer config must match the index: "
            f"{stats.get('field_analyzers')} vs {want_analyzers}")
    base_docs = int(stats["n_docs"])
    if "dl_total" not in stats:
        raise ValueError("index predates dl_total tracking; rebuild before "
                         "appending (avgdl exactness requires integer sums)")
    sweep_invisible_segments(index_dir, base_docs)
    committed = mf.committed_segments(index_dir)
    gen_base = _next_gen_base(committed)
    timings: dict[str, float] = {}

    corpus_dir = os.path.join(index_dir, "corpus_gen", f"gen-{gen_base}")
    if os.path.isdir(corpus_dir):
        shutil.rmtree(corpus_dir)
    os.makedirs(corpus_dir, exist_ok=True)
    n_buckets = len(boundaries) + 1
    cols = _corpus_columns(cfg)
    part_task = _partition_block.options(num_returns=2 * n_buckets)
    t0 = time.perf_counter()
    write_refs, data_refs, mini_refs = [], [], []
    keep: list = []
    i = 0
    for bundle in source.iter_internal_ref_bundles():
        keep.append(bundle)
        for block_ref in bundle.block_refs:
            write_refs.append(_write_corpus_block.remote(
                block_ref, corpus_dir, f"part-{i:06d}.parquet"))
            rets = part_task.remote(block_ref, boundaries, n_buckets, cols)
            data_refs.append(list(rets[:n_buckets]))
            mini_refs.append(list(rets[n_buckets:]))
            i += 1
    del keep
    timings["corpus"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    stats_pb = ray.get(
        [_bucket_stats_urls.remote(*per_b) for per_b in zip(*mini_refs)]
    ) if mini_refs else []
    del mini_refs
    per_bucket = np.array([s[0] for s in stats_pb], dtype=np.int64)
    if len(per_bucket) == 0:
        per_bucket = np.zeros(n_buckets, dtype=np.int64)
    new_docs = int(per_bucket.sum())
    new_dl = sum(s[1] for s in stats_pb)
    n_dups = sum(s[2] for s in stats_pb)
    if cfg.strict_duplicates and n_dups:
        raise DuplicateUrlError(
            n_dups, [u for s in stats_pb for u in s[3]][:5])
    new_urls = (np.concatenate([s[4] for s in stats_pb])
                if stats_pb else np.empty(0, dtype=object))

    # upsert probe: which existing VISIBLE docs carry a re-ingested url
    deleted_new: np.ndarray = np.empty(0, np.int64)
    if len(new_urls) and committed:
        urls_ref = ray.put(new_urls)
        matches = ray.get([
            _match_urls.remote(seg_docs_path(index_dir, s), urls_ref)
            for s in sorted(committed)
        ])
        deleted_new = (np.unique(np.concatenate(matches))
                       if any(len(m) for m in matches)
                       else np.empty(0, np.int64))
        if len(deleted_new):
            # a url re-ingested a SECOND time matches its original doc id
            # again; without this filter n_deleted / n_upserts inflate
            # (search is unaffected — _load_deleted dedupes)
            from .search import _drop_deleted, _load_deleted

            already = _load_deleted(index_dir, stats)
            if len(already):
                deleted_new = deleted_new[
                    _drop_deleted(already, deleted_new)]
    if cfg.strict_duplicates and len(deleted_new):
        raise DuplicateUrlError(
            len(deleted_new),
            [u for u in new_urls[:5].tolist()])

    total_docs = base_docs + new_docs
    dl_total = int(stats["dl_total"]) + int(new_dl)
    new_avgdl = (dl_total / total_docs) if total_docs else 0.0
    offsets = base_docs + np.r_[0, np.cumsum(per_bucket)[:-1]]
    gen_plan = {
        "boundaries": boundaries,
        "offsets": {int(gen_base + b): int(offsets[b])
                    for b in range(n_buckets)},
        "per_segment_docs": per_bucket.tolist(),
        "n_docs": total_docs,
        "n_duplicates": n_dups,
        "avgdl": new_avgdl,
        "dl_total": dl_total,
        "n_segments": len(committed) + int((per_bucket > 0).sum()),
        "seed": cfg.seed,
        "generation": gen_base,
    }
    mf.write_json_atomic(
        os.path.join(index_dir, "generations", f"gen-{gen_base}.json"),
        {k: (v if k != "offsets" else {str(a): b for a, b in v.items()})
         for k, v in gen_plan.items()})
    timings["plan"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    plan_ref = ray.put(gen_plan)
    if new_docs:
        build_refs = [
            _build_bucket.remote(index_dir, int(gen_base + b), plan_ref, cfg,
                                 *[blk[b] for blk in data_refs])
            for b in range(n_buckets) if per_bucket[b] > 0
        ]
        del data_refs
        ray.get(build_refs)
    else:
        del data_refs
    timings["segments"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    ray.get(write_refs)
    with open(os.path.join(corpus_dir, "_SUCCESS"), "w") as f:
        f.write("")
    tombstone_files = list(stats.get("tombstone_files", []))
    if len(deleted_new):
        tpath = os.path.join("tombstones", f"gen-{gen_base}.json")
        mf.write_json_atomic(
            os.path.join(index_dir, tpath),
            {"generation": gen_base,
             "deleted_doc_ids": [int(d) for d in deleted_new]})
        tombstone_files.append(tpath)
    # term_stats / termdict must cover the new generation: force rebuilds
    ts_dir = os.path.join(index_dir, "term_stats")
    if os.path.isdir(ts_dir):
        shutil.rmtree(ts_dir)
    from .build import drop_termdict
    from .pruned import drop_pruned

    drop_termdict(index_dir)
    drop_pruned(index_dir)
    out = _finalize(index_dir, gen_plan, cfg, timings, extra={
        "dl_total": dl_total,
        "tombstone_files": tombstone_files,
        "n_deleted": int(stats.get("n_deleted", 0)) + int(len(deleted_new)),
        "generations": [*stats.get("generations", []), {
            "generation": gen_base,
            "n_docs": new_docs,
            "n_upserts": int(len(deleted_new)),
            "doc_id_base": base_docs,
        }],
    })
    timings["finalize"] = round(time.perf_counter() - t0, 3)
    if cfg.auto_compact_segments is not None:
        committed_now = mf.committed_segments(index_dir)
        if len(committed_now) > cfg.auto_compact_segments:
            from .merge import compact_to

            t0 = time.perf_counter()
            survivors = compact_to(index_dir, cfg.auto_compact_segments, cfg)
            timings["compact"] = round(time.perf_counter() - t0, 3)
            out["n_segments"] = len(survivors)
    return out


def _delete_partials(batch: pa.Table, *, index_dir: str, field: str,
                     terms: list[str], mode: str, qhash: str) -> pa.Table:
    """Task: per-segment tombstone writer for one query.

    Writes ``tombstones/dbq-<qhash>-seg<K>.json`` atomically with a
    DETERMINISTIC name, so task retries overwrite the same payload and
    re-running the same delete is idempotent. Files are inert until the
    driver's stats.json rewrite lists them (the single visibility point).
    The (stats, tombstones) state comes from the mtime-keyed worker cache,
    so already-deleted docs are excluded from the new counts."""
    from .aggs import _matched_ids, worker_state
    from .search import _drop_deleted

    _stats, deleted = worker_state(index_dir)
    paths, counts = [], []
    for seg_id in batch["segment_id"].to_pylist():
        seg_id = int(seg_id)
        ids = _matched_ids(index_dir, seg_id, field, terms, mode)
        if len(deleted) and len(ids):
            ids = ids[_drop_deleted(deleted, ids)]
        if len(ids) == 0:
            continue
        rel = os.path.join(
            "tombstones", f"dbq-{qhash}-seg{seg_id:06d}.json")
        mf.write_json_atomic(
            os.path.join(index_dir, rel),
            {"query_hash": qhash, "segment_id": seg_id,
             "deleted_doc_ids": [int(d) for d in ids]})
        paths.append(rel)
        counts.append(len(ids))
    return pa.table({"path": pa.array(paths, pa.string()),
                     "n": pa.array(counts, pa.int64())})


def delete_by_query(index_dir: str, query: str, field: str | None = None,
                    mode: str = "or",
                    concurrency: int | None = None) -> int:
    """ES ``_delete_by_query``: tombstone every currently-visible doc
    matching the match query. Per-segment workers write one tombstone
    file each (nothing matched-set-sized reaches the driver); one atomic
    ``stats.json`` rewrite makes them visible — a crash beforehand leaves
    the index unchanged with inert orphan files. Lucene deletion
    semantics: df / avgdl keep counting the deleted docs; segment merges
    carry tombstones through unchanged (global term_stats cannot shrink
    per-merge), and the expunge-deletes analogue is a REINDEX of the
    live docs (``export.reindex_matches`` — tested in
    ``test_snapshot.py``). Every search / agg / export path drops
    tombstoned ids. Returns the number of docs deleted."""
    import hashlib

    from .search import DEFAULT_FIELD, _field_analyzer, _load_stats, \
        _visible_seg_ids, query_terms

    field = field or DEFAULT_FIELD
    stats = _load_stats(index_dir)
    terms = sorted(set(query_terms(query, _field_analyzer(stats, field))))
    seg_ids, _vis = _visible_seg_ids(index_dir, stats)
    if not terms or not seg_ids:
        return 0
    qhash = hashlib.md5(
        f"{field}:{mode}:{' '.join(terms)}".encode()).hexdigest()[:12]
    parts = (
        rd.from_items([{"segment_id": s} for s in seg_ids])
        .map_batches(
            _delete_partials,
            fn_kwargs={
                "index_dir": index_dir, "field": field, "terms": terms,
                "mode": mode, "qhash": qhash},
            batch_format="pyarrow", batch_size=8,
            concurrency=concurrency)
        .take_all()  # one (path, count) row per touched segment
    )
    new_files = [p["path"] for p in parts]
    n_deleted = int(sum(p["n"] for p in parts))
    if not new_files:
        return 0
    listed = list(stats.get("tombstone_files", []))
    listed += [p for p in new_files if p not in listed]
    stats["tombstone_files"] = listed
    stats["n_deleted"] = int(stats.get("n_deleted", 0)) + n_deleted
    mf.write_json_atomic(os.path.join(index_dir, "stats.json"), stats)
    return n_deleted


def update_by_query(index_dir: str, query: str, set_columns: dict[str, str],
                    field: str | None = None, mode: str = "or",
                    cfg: BuildConfig | None = None) -> dict:
    """ES ``_update_by_query``: every currently-visible doc matching the
    match query gets the ``set_columns`` literal overrides (the
    ``ctx._source.X = v`` script shape) and is re-ingested as an upsert
    generation — the url identity tombstones the old versions atomically
    (the same machinery as append), so a crash mid-update leaves the old
    docs visible, never a mix. Matched docs stream from the scroll path
    into the append builder; nothing matched-set-sized reaches the
    driver. Returns the append stats (n_upserts == matched count)."""
    import pyarrow.compute as _pc

    from ..functions.analyzers import token_count_batch
    from .export import export_matches
    from .search import DEFAULT_FIELD

    field = field or DEFAULT_FIELD
    bad = set(set_columns) - {"lang", "text"}
    if bad:
        raise ValueError(f"update_by_query can set lang/text, got {bad}")
    ds = export_matches(index_dir, query, field=field, mode=mode,
                        stored_columns=("text", "lang", "warc_ts"))

    def to_corpus(t: pa.Table) -> pa.Table:
        n = t.num_rows
        text = _pc.cast(t["text"], pa.large_string())
        lang = t["lang"]
        if "text" in set_columns:
            text = pa.array([set_columns["text"]] * n, pa.large_string())
        if "lang" in set_columns:
            lang = pa.array([set_columns["lang"]] * n, pa.string())
        return pa.table({
            "url": t["url"],
            "warc_ts": _pc.cast(t["warc_ts"], pa.timestamp("us")),
            "text": text,
            "lang": lang,
            "doc_len": pa.array(token_count_batch(text), pa.int32()),
        })

    return append_index_from_corpus(
        ds.map_batches(to_corpus, batch_format="pyarrow"), index_dir,
        cfg or BuildConfig())
