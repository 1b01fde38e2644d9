"""Index build pipeline — Ray-Data-native, 4 resumable phases.

Replaces the reference's load path (Mongo cursor -> enrich -> transform ->
ES ``_bulk``, ``/root/reference/companybindex/main.go:105-279``) plus the
index construction ES performs from ``config/search_scheme.json``. Shape:

  A. corpus:   read_parquet(webtext) -> HtmlExtractor actor pool
               (extract text, reject side-writes, doc_len) -> drop html ->
               write cleaned corpus parquet.                     [no shuffle]
  B. plan:     url-range segment boundaries from a seeded sample; exact
               post-dedup per-segment doc counts + doc-length sums via a
               url-only groupby; prefix sums -> per-segment doc_id offsets,
               global N / avgdl -> plan.json.              [url-only shuffle]
  C. segments: corpus -> bucket by url range -> groupby(bucket) ->
               one vectorized SegmentBuilder per segment: dedup-by-url
               (D1), dense doc_id = offset + rank, tokenize, tf, encode
               postings (delta+varint+block-max), atomic segment write +
               lineage manifest.                         [the main shuffle]
  D. finalize: global term stats (term -> df) for BM25 idf; stats.json.
                                                      [small term shuffle]

Skew design: the shuffle key is the url-range bucket — uniform by
construction — so Zipf-head terms never concentrate on one worker; a head
term simply appears in every segment (the ES 3-shard analogue,
``search_scheme.json:4-5``). Doc ids are global-rank-of-url: invariant to
boundary placement, parallelism and retries (SURVEY.md §7 hard part (a)).

Resumability: phase A commits ``corpus/_SUCCESS``; phase B ``plan.json``;
phase C one manifest per segment (atomic tmp+rename) — a resumed build
filters committed segments out *before* the shuffle; phase D ``stats.json``.
"""

from __future__ import annotations

import hashlib
import math
import os
import shutil
import time
import uuid
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from ..functions.analyzers import standard_tokenize_batch
from ..stages.extract import count_rejects, extract_batch
from . import blobs, codec, manifest as mf


def seg_terms_path(index_dir: str, seg_id: int) -> str:
    return os.path.join(index_dir, "terms", f"segment={seg_id:06d}", "part-0.parquet")


def seg_docs_path(index_dir: str, seg_id: int) -> str:
    return os.path.join(index_dir, "docs", f"segment={seg_id:06d}", "part-0.parquet")


@dataclass
class BuildConfig:
    # None -> auto: n_docs / (4 * num_cpus), clamped to [1_000, 200_000] so
    # segments outnumber workers (parallel phase C) but one segment's text
    # still fits a worker's heap at web scale.
    docs_per_segment: int | None = None
    extract_batch_size: int = 1024
    extract_concurrency: tuple[int, int] | int | None = None  # None -> (1, ncpus)
    boundary_sample_per_segment: int = 200
    seed: int = 42
    # parquet row-group size for term tables: term lookups read whole row
    # groups (min/max pruning over the term-sorted file), so smaller groups
    # => less read amplification per query term
    index_block_rows: int = 1024
    enable_metrics: bool = False  # push counters to the ST2 metrics actor
    # extra indexed fields beyond the main ("text", standard-analyzer) one:
    # (field_name, source_column, analyzer_name) — the ES multi-field
    # analogue (search_scheme.json:140-198); analyzer_name from
    # functions.analyzers.ANALYZERS
    fields: tuple = ()
    # index token positions for the main text field (enables phrase
    # queries; ES index_options=positions default on text fields —
    # 'docs'-only variants per search_scheme.json:167-170 are the default
    # here for compactness)
    index_positions: bool = False
    # quarantine html payloads larger than this to errors/oversize_payload
    # instead of extracting them (web-scale poison guard); None = unlimited
    max_doc_bytes: int | None = None
    # parquet codec for the encoded-postings byte columns (doc_ids_enc,
    # tfs_enc, positions_enc). "none" (default): the varint stream is the
    # compression (ES/Lucene precedent) — cold term lookups skip snappy
    # decompress (measured 2.4x faster filtered reads at 2M docs: 803 ->
    # 340ms for 5 terms x 243 segments) at ~+50% term-file bytes.
    # "snappy": smallest files, slower cold reads.
    postings_compression: str = "none"
    # physical terms layout: True (default) splits the encoded-postings
    # byte columns into a per-segment sidecar binary with byte-range
    # columns in the parquet (index/blobs.py — the Lucene terms-dict/.doc
    # shape; cold queries range-read only the postings they touch). False
    # keeps them inline in parquet. Forced inline when
    # postings_compression != "none" (compressed cells can't be
    # range-read). Readers auto-detect the layout per segment.
    postings_sidecar: bool = True
    # pack each (block x bucket) cell into one compressed Arrow-IPC payload
    # row before the segment shuffle ('zstd' | 'lz4' | None). Cuts exchange
    # rows ~1000x and bytes 2-3x — worth it when the exchange crosses a
    # NETWORK (multi-node); on this single box the exchange is a memcpy and
    # packing measured net-negative (iso @1M docs: raw 18.6/10.6s at 2/8
    # cpus vs packed-zstd 31.1/13.7s), so default off
    shuffle_pack_codec: str | None = None
    # fused-exchange slice compression ("zstd"/"lz4"/None): packs each
    # per-(block, bucket-group) slice into one compressed Arrow-IPC payload
    # so the exchange's object-store residency shrinks ~2x — measured at 8M
    # docs / 8 cpus this removed a 63% per-task compute inflation under
    # plasma residency (22.5k vs 14.0k docs/task-sec) and cut the build
    # 124.6 -> 106.6 s, while staying neutral at 100k and at 2 cpus; it is
    # also the multi-node network-shuffle shape (ship compressed bytes).
    # Default ON; EDLR_FUSED_PACK=none disables at runtime.
    fused_pack_codec: str | None = "zstd"
    # D1 create-conflict parity: the reference treats a duplicate _id as
    # FATAL (companybindex/main.go:216-222 aborts the load on a bulk item
    # create conflict). Default off — the engine's default semantics
    # (keep-first dedup + counted duplicates in manifests/stats) are
    # strictly more useful for web crawls; True fails the build with
    # example urls before any segment is committed.
    strict_duplicates: bool = False
    # serving-side merge policy (simplified Lucene tiered merge): when set,
    # append runs compact_to(index_dir, N) after committing its generation
    # so repeated incremental batches can't grow segment fan-out unbounded
    # (~1 ms cold-query cost per segment file). None = manual `compact`.
    auto_compact_segments: int | None = None


class DuplicateUrlError(ValueError):
    """Raised by strict_duplicates builds when the input has >1 row per url
    (the reference's bulk-create-conflict fatal, main.go:216-222)."""

    def __init__(self, n_duplicates: int, examples: list[str]):
        self.n_duplicates = n_duplicates
        self.examples = examples
        super().__init__(
            f"{n_duplicates} duplicate url(s) in input "
            f"(strict_duplicates=True); examples: {examples[:5]}")


def _ncpus() -> int:
    try:
        return int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        return 4


def pin_worker_threads() -> None:
    """Cap pyarrow's internal thread pool to this task's CPU share.

    Arrow sizes its pool to hardware concurrency and ignores the
    OMP_NUM_THREADS Ray sets per worker — N workers x N arrow threads
    thrashes the node (measured 10-17x slowdown in segment builds). Call at
    the top of every arrow-heavy worker function; idempotent.
    """
    want = max(1, int(os.environ.get("OMP_NUM_THREADS", "1")))
    if pa.cpu_count() != want:
        pa.set_cpu_count(want)


# --- phase A --------------------------------------------------------------

def _clear_errors_dir(errors_dir: str) -> None:
    """Remove a previous attempt's reject side-writes before a fresh
    extract pass. Retries ENOTEMPTY/EBUSY: a concurrent process building
    into the same index dir (two bench runs sharing a scratch path, or a
    straggler task from a killed build) can land a side-write file between
    rmtree's scan and rmdir. Cleanup must not kill the build — after the
    retries, leftover files only over-count rejects, so warn and proceed."""
    for _ in range(3):
        try:
            shutil.rmtree(errors_dir)
            return
        except FileNotFoundError:
            return
        except OSError:
            time.sleep(0.2)
    shutil.rmtree(errors_dir, ignore_errors=True)


def _build_corpus(input_path: str, index_dir: str, cfg: BuildConfig) -> None:
    corpus_dir = os.path.join(index_dir, "corpus")
    success = os.path.join(corpus_dir, "_SUCCESS")
    if os.path.exists(success):
        return
    if os.path.isdir(corpus_dir):
        shutil.rmtree(corpus_dir)
    errors_dir = os.path.join(index_dir, "errors")
    # the corpus phase is restarting from scratch: clear its side-writes so
    # a resumed-after-crash build doesn't double-count rejects (files from
    # the aborted attempt would otherwise accumulate alongside the new ones)
    if os.path.isdir(errors_dir):
        _clear_errors_dir(errors_dir)
    # stateless tasks, not an actor pool: a pool sized to the node starves
    # the read/write operators of CPU slots and serializes the phase
    ds = rd.read_parquet(input_path, override_num_blocks=max(2 * _ncpus(), 16))
    ds = ds.map_batches(
        extract_batch,
        fn_kwargs={"errors_dir": errors_dir,
                   "max_doc_bytes": cfg.max_doc_bytes},
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
    )
    ds.write_parquet(corpus_dir)
    with open(success, "w") as f:
        f.write("")


# --- phase B --------------------------------------------------------------

def _docs_per_segment(cfg: BuildConfig, n_est: int) -> int:
    if cfg.docs_per_segment:
        return cfg.docs_per_segment
    # ~2 segments per CPU for parallelism; >=4000 docs so per-segment fixed
    # costs (parquet writes, manifest) stay a small fraction; <=200k so one
    # segment's text fits a worker heap at web scale
    return int(min(200_000, max(4_000, math.ceil(n_est / (2 * _ncpus())))))


def _segment_boundaries(urls_ds: rd.Dataset, n_est: int, cfg: BuildConfig) -> list[str]:
    """Seeded-sample url quantiles -> S-1 range cut points. Boundary placement
    affects only segment membership, never doc ids (global url rank)."""
    n_segments = max(1, math.ceil(n_est / _docs_per_segment(cfg, n_est)))
    if n_segments == 1:
        return []
    want = n_segments * cfg.boundary_sample_per_segment
    frac = min(1.0, want / max(1, n_est))
    sample = urls_ds.random_sample(frac, seed=cfg.seed).take_all()
    urls = sorted(r["url"] for r in sample)
    if not urls:
        return []
    cuts = []
    for k in range(1, n_segments):
        cuts.append(urls[min(len(urls) - 1, k * len(urls) // n_segments)])
    return sorted(set(cuts))


def _bucket_of(urls: np.ndarray, boundaries: list[str]) -> np.ndarray:
    if not boundaries:
        return np.zeros(len(urls), dtype=np.int32)
    return np.searchsorted(np.array(boundaries, dtype=object), urls,
                           side="right").astype(np.int32)


def _make_plan(index_dir: str, cfg: BuildConfig) -> dict:
    plan_path = os.path.join(index_dir, "plan.json")
    if os.path.exists(plan_path):
        return mf.read_json(plan_path)
    corpus_dir = os.path.join(index_dir, "corpus")
    urls_ds = rd.read_parquet(corpus_dir, columns=["url", "doc_len", "warc_ts"])
    n_est = urls_ds.count()
    if n_est == 0:
        plan = {"boundaries": [], "offsets": [0], "n_docs": 0, "avgdl": 0.0,
                "n_segments": 0, "seed": cfg.seed}
        mf.write_json_atomic(plan_path, plan)
        return plan
    plan_cutoff = int(os.environ.get("EDLR_PLAN_CUTOFF", "5000000"))
    if n_est <= plan_cutoff:
        # driver fast path: one url-column pull, exact boundaries/counts via
        # Arrow C++ kernels (urls are ~1% of corpus bytes; above the cutoff,
        # fall back to the fully distributed path). The previous
        # numpy-object lexsort + searchsorted cost ~2s at 1M rows — a fixed
        # driver term that caps scaling; sort_by is multi-threaded C++.
        import pyarrow.compute as pc

        tbl = pa.concat_tables(
            ray.get(urls_ds.to_arrow_refs())).combine_chunks()
        # same keep-first rule as phase C: (url asc, warc_ts asc), so plan
        # avgdl is computed over exactly the docs that get indexed
        tbl_s = tbl.sort_by([("url", "ascending"), ("warc_ts", "ascending")])
        n_rows = tbl_s.num_rows
        urls_col = tbl_s["url"].combine_chunks()
        first_tail = pc.not_equal(urls_col.slice(1),
                                  urls_col.slice(0, n_rows - 1))
        first = np.ones(n_rows, dtype=bool)
        if n_rows > 1:
            first[1:] = first_tail.to_numpy(zero_copy_only=False)
        uniq = tbl_s.filter(pa.array(first))
        n_docs = uniq.num_rows
        n_dups = n_rows - n_docs
        if cfg.strict_duplicates and n_dups:
            dup_urls = np.asarray(
                urls_col.to_numpy(zero_copy_only=False), dtype=object)[~first]
            raise DuplicateUrlError(n_dups, dup_urls[:5].tolist())
        dps = _docs_per_segment(cfg, n_docs)
        n_segments = max(1, math.ceil(n_docs / dps))
        # cut INDICES into the deduped url order: per-bucket counts are the
        # index differences — urls are unique here, so no re-searching
        cuts = sorted({min(n_docs - 1, k * n_docs // n_segments)
                       for k in range(1, n_segments)})
        uniq_urls = uniq["url"]
        boundaries = [uniq_urls[i].as_py() for i in cuts]
        n_segments = len(boundaries) + 1
        per_bucket = np.diff(np.r_[0, cuts, n_docs]).astype(np.int64)
        offsets = np.r_[0, np.cumsum(per_bucket)[:-1]]
        dl_total = int(pc.sum(uniq["doc_len"]).as_py() or 0)
    else:
        boundaries = _segment_boundaries(urls_ds.select_columns(["url"]), n_est, cfg)
        # re-read with CPU-sized blocks: the bucket shuffle's cost tracks
        # upstream block count (see _build_segments)
        urls_ds = rd.read_parquet(corpus_dir,
                                  columns=["url", "doc_len", "warc_ts"],
                                  override_num_blocks=max(2 * _ncpus(), 8))

        def add_bucket(t: pa.Table) -> pa.Table:
            pin_worker_threads()
            urls = np.asarray(t["url"].to_numpy(zero_copy_only=False), dtype=object)
            return t.append_column("bucket", pa.array(_bucket_of(urls, boundaries)))

        def distinct_stats(t: pa.Table) -> pa.Table:
            # keep-first by (url, warc_ts) — the exact phase-C dedup rule,
            # vectorized (Arrow sort + run-boundary mask, no pandas groups)
            pin_worker_threads()
            t = t.combine_chunks().sort_by(
                [("url", "ascending"), ("warc_ts", "ascending")])
            urls = np.asarray(t["url"].to_numpy(zero_copy_only=False),
                              dtype=object)
            first = np.ones(len(urls), dtype=bool)
            first[1:] = urls[1:] != urls[:-1]
            dl = t["doc_len"].to_numpy()
            dup_ex = urls[~first][:1]
            return pa.table({
                "bucket": pa.array([int(t["bucket"][0].as_py())], pa.int32()),
                "n_docs": pa.array([int(first.sum())], pa.int64()),
                "dl_sum": pa.array([int(dl[first].sum())], pa.int64()),
                "n_dups": pa.array([int(len(urls) - first.sum())], pa.int64()),
                "dup_example": pa.array(
                    [str(dup_ex[0]) if len(dup_ex) else None], pa.string()),
            })

        counts = (
            urls_ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(distinct_stats, batch_format="pyarrow")
            .to_pandas()
            .sort_values("bucket")
        )
        n_segments = len(boundaries) + 1
        per_bucket = np.zeros(n_segments, dtype=np.int64)
        per_bucket[counts["bucket"].to_numpy()] = counts["n_docs"].to_numpy()
        offsets = np.r_[0, np.cumsum(per_bucket)[:-1]]
        n_docs = int(per_bucket.sum())
        n_dups = int(counts["n_dups"].sum())
        dl_total = int(counts["dl_sum"].sum())
        if cfg.strict_duplicates and n_dups:
            raise DuplicateUrlError(
                n_dups, counts["dup_example"].dropna().tolist()[:5])
    plan = {
        "boundaries": boundaries,
        "offsets": offsets.tolist(),
        "per_segment_docs": per_bucket.tolist(),
        "n_docs": n_docs,
        "n_duplicates": n_dups,
        "avgdl": (dl_total / n_docs) if n_docs else 0.0,
        "dl_total": int(dl_total),
        "n_segments": n_segments,
        "seed": cfg.seed,
    }
    mf.write_json_atomic(plan_path, plan)
    return plan


# --- phase C --------------------------------------------------------------

def doc_idx_positions(doc_idx: np.ndarray) -> np.ndarray:
    """Within-doc token positions from an ascending doc-index stream."""
    n = len(doc_idx)
    if n == 0:
        return np.empty(0, np.int64)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = doc_idx[1:] != doc_idx[:-1]
    starts = np.flatnonzero(change)
    lengths = np.diff(np.r_[starts, n])
    return np.arange(n, dtype=np.int64) - np.repeat(starts, lengths)


ENC_COLUMNS = ("doc_ids_enc", "tfs_enc", "positions_enc")


def _write_segment_files(index_dir: str, seg_id: int, terms: pa.Table,
                         docs: pa.Table, row_group_size: int,
                         postings_compression: str = "none",
                         sidecar: bool = True) -> None:
    """Atomic segment publish: write each table into a tmp dir and rename.

    Layout is hive-partitioned per table (``terms/segment=K/``,
    ``docs/segment=K/``) so a whole-index read is ONE threaded
    pyarrow/Ray read with partition+predicate pushdown. The manifest written
    after both renames is the commit point (crash between renames leaves an
    uncommitted dir that the next build overwrites).

    Terms layout: with ``postings_compression == "none"`` (default) the
    encoded-postings byte columns split into a consolidated sidecar binary
    (``postings-0.bin``) with byte-range columns in the parquet — the
    Lucene terms-dict/.doc shape; cold queries range-read exactly the
    postings they touch (see ``blobs.py``). Compressed postings can't be
    range-read, so a non-"none" codec keeps them inline in parquet.
    """
    if "segment_id" not in terms.column_names:
        terms = terms.append_column(
            "segment_id",
            pa.array(np.full(terms.num_rows, seg_id, dtype=np.int32)))
    blob: bytes | None = None
    if sidecar and postings_compression == "none":
        terms, blob = blobs.split_for_write(terms)
    for sub, tbl, rgs in (("terms", terms, row_group_size),
                          ("docs", docs, 1 << 20)):
        final_dir = os.path.join(index_dir, sub, f"segment={seg_id:06d}")
        tmp_dir = final_dir + f".tmp-{uuid.uuid4().hex}"
        os.makedirs(tmp_dir, exist_ok=True)
        comp = {c: ("NONE" if c in ENC_COLUMNS
                    and postings_compression == "none" else "SNAPPY")
                for c in tbl.column_names}
        pq.write_table(tbl, os.path.join(tmp_dir, "part-0.parquet"),
                       row_group_size=rgs, compression=comp)
        if sub == "terms" and blob is not None:
            with open(os.path.join(tmp_dir, blobs.BLOB_NAME), "wb") as f:
                f.write(blob)
        if os.path.isdir(final_dir):
            shutil.rmtree(final_dir)  # uncommitted leftover from a crash
        os.replace(tmp_dir, final_dir)


def read_segment_terms(index_dir: str, seg_id: int) -> pa.Table:
    """Full logical terms table for one segment (enc columns materialized
    from the sidecar when the segment uses the blob layout). Canonical
    column order, so tables from mixed-layout segments concat cleanly."""
    path = seg_terms_path(index_dir, seg_id)
    tbl = pq.read_table(path)
    if blobs.has_sidecar(tbl.schema):
        tbl = blobs.materialize_enc(
            tbl, lambda _s: path,
            want_positions="pos_nbytes" in tbl.column_names,
            want_blocks=True)
    order = ["field", "term", "df", "doc_ids_enc", "tfs_enc",
             "block_last_doc", "block_max_impact", "block_doc_byte_off",
             "block_tf_byte_off", "max_impact", "positions_enc"]
    return tbl.select([c for c in order if c in tbl.column_names])


def _corpus_columns(cfg: BuildConfig) -> list[str]:
    """Columns phase C actually needs: shuffle nothing else."""
    cols = ["url", "warc_ts", "text", "doc_len"]
    for _fname, src_col, _an in cfg.fields:
        if src_col not in cols:
            cols.append(src_col)
    return cols


def _pack_cell(sub: pa.Table, codec: str | None) -> bytes:
    """One (input block x bucket) cell -> an Arrow IPC payload (optionally
    compressed). Packed shuffles move ~(n_blocks x n_buckets) rows through
    the exchange instead of n_docs and shrink the bytes crossing it — the
    multi-node/network shuffle shape (see BuildConfig.shuffle_pack_codec)."""
    sink = pa.BufferOutputStream()
    opts = pa.ipc.IpcWriteOptions(compression=codec)
    with pa.ipc.new_stream(sink, sub.schema, options=opts) as w:
        w.write_table(sub)
    return sink.getvalue().to_pybytes()


def _unpack_cells(payloads: list[bytes]) -> pa.Table:
    tabs = [pa.ipc.open_stream(pa.BufferReader(p)).read_all() for p in payloads]
    return pa.concat_tables(tabs)


def _build_segment(group: pa.Table, index_dir: str, plan: dict,
                   cfg: BuildConfig) -> pa.Table:
    """Vectorized per-segment build: dedup, doc ids, tokenize, encode, commit.

    ``group`` is either raw doc rows with a ``bucket`` column, or packed
    cells (bucket, payload) from :func:`_pack_cell`."""
    pin_worker_threads()
    t0 = time.perf_counter()
    seg_id = int(group["bucket"][0].as_py())
    if "payload" in group.column_names:
        group = _unpack_cells(group["payload"].to_pylist())
    n_input = group.num_rows
    # groups arrive as many zero-copy slices of shuffle outputs; every kernel
    # below is much faster over contiguous buffers
    group = group.combine_chunks()
    group = group.sort_by([("url", "ascending"), ("warc_ts", "ascending")])
    urls = np.asarray(group["url"].to_numpy(zero_copy_only=False), dtype=object)
    first = np.ones(len(urls), dtype=bool)
    first[1:] = urls[1:] != urls[:-1]
    deduped = group.filter(pa.array(first))
    n_docs = deduped.num_rows
    n_dups = n_input - n_docs
    base = int(plan["offsets"][seg_id])
    doc_ids = base + np.arange(n_docs, dtype=np.int64)
    doc_len = deduped["doc_len"].to_numpy().astype(np.int64)

    import pyarrow.compute as pc

    def encode_field(field: str, doc_idx: np.ndarray, tokens: pa.Array,
                     dls_per_doc: np.ndarray, avgdl: float | None,
                     with_positions: bool = False) -> pa.Table:
        """Posting table for one field. Integer term ids end to end:
        dictionary-encode the flat token column (one C++ hash pass), rank
        the (small) vocab lexicographically, then a single np.unique over
        rank*n_docs+doc yields tf per posting already sorted by
        (term, doc). No per-posting Python string objects — the object path
        was superlinear in segment size (allocator + compare cost)."""
        enc = tokens.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        tids = enc.indices.to_numpy().astype(np.int64)
        vocab = enc.dictionary
        vocab_order = pc.sort_indices(vocab).to_numpy().astype(np.int64)
        rank = np.empty(len(vocab), dtype=np.int64)
        rank[vocab_order] = np.arange(len(vocab), dtype=np.int64)
        key = rank[tids] * np.int64(max(n_docs, 1)) + doc_idx
        uk, tfs_s = np.unique(key, return_counts=True)
        rank_s = uk // max(n_docs, 1)
        d_s = (uk % max(n_docs, 1)).astype(np.int64)
        table = codec.build_posting_table(
            rank_s, doc_ids[d_s], tfs_s.astype(np.int64), dls_per_doc[d_s],
            avgdl,
        )
        vocab_sorted = vocab.take(pa.array(vocab_order))
        term_strings = vocab_sorted.take(
            pa.array(table["term"].astype(np.int64)))
        offs = pa.array(table["block_offsets"].astype(np.int32), pa.int32())
        nt = len(table["term"])
        cols = {
            "field": pa.array([field] * nt, pa.string()),
            "term": pc.cast(term_strings, pa.string()),
            "df": pa.array(table["df"], pa.int64()),
            "doc_ids_enc": pa.array(table["doc_ids_enc"], pa.binary()),
            "tfs_enc": pa.array(table["tfs_enc"], pa.binary()),
            "block_last_doc": pa.ListArray.from_arrays(
                offs, pa.array(table["block_last_flat"], pa.int64())),
            "block_max_impact": pa.ListArray.from_arrays(
                offs, pa.array(table["block_max_flat"], pa.float64())),
            "block_doc_byte_off": pa.ListArray.from_arrays(
                offs, pa.array(table["block_doc_off_flat"], pa.int64())),
            "block_tf_byte_off": pa.ListArray.from_arrays(
                offs, pa.array(table["block_tf_off_flat"], pa.int64())),
            "max_impact": pa.array(table["max_impact"], pa.float64()),
        }
        if with_positions and len(rank_s) == 0:
            cols["positions_enc"] = pa.array([], pa.binary())
        elif with_positions:
            # token stream is (doc asc, position asc); a stable sort by term
            # rank groups it into (term, doc) runs with positions ascending —
            # the same (term, doc) order np.unique produced above.
            positions = doc_idx_positions(doc_idx)
            stable = np.argsort(rank[tids], kind="stable")
            pos_sorted = positions[stable]
            posting_starts = np.r_[0, np.cumsum(tfs_s)[:-1]]
            gaps = codec.delta_encode_runs(
                pos_sorted.astype(np.uint64), posting_starts)
            pos_bytes, pos_lens = codec.varint_encode(gaps)
            # per-term byte slices: term boundary = last posting's last byte
            run_change = np.empty(len(rank_s), dtype=bool)
            run_change[0] = True
            run_change[1:] = rank_s[1:] != rank_s[:-1]
            term_starts = np.flatnonzero(run_change)
            term_ends = np.r_[term_starts[1:], len(rank_s)]
            byte_ends = np.cumsum(pos_lens)
            post_ends = np.cumsum(tfs_s)
            term_byte_end = byte_ends[post_ends[term_ends - 1] - 1]
            term_byte_start = np.r_[0, term_byte_end[:-1]]
            buf = pos_bytes.tobytes()
            cols["positions_enc"] = pa.array(
                [buf[int(s):int(e)]
                 for s, e in zip(term_byte_start, term_byte_end)],
                pa.binary())
        elif cfg.index_positions:
            cols["positions_enc"] = pa.array([None] * nt, pa.binary())
        return pa.table(cols)

    doc_idx, tokens, _dl = standard_tokenize_batch(deduped["text"])
    field_tables = [encode_field("text", doc_idx, tokens, doc_len,
                                 float(plan["avgdl"]),
                                 with_positions=cfg.index_positions)]
    docs_cols = {
        "doc_id": pa.array(doc_ids, pa.int64()),
        "url": deduped["url"],
        "doc_len": pa.array(doc_len.astype(np.int32), pa.int32()),
        "segment_id": pa.array(np.full(n_docs, seg_id, dtype=np.int32)),
    }
    field_dl_sums: dict[str, int] = {}
    from ..functions.analyzers import analyze_column

    for fname, src_col, analyzer_name in cfg.fields:
        f_idx, f_toks, f_dl = analyze_column(deduped[src_col], analyzer_name)
        f_dl64 = f_dl.astype(np.int64)
        # global avgdl for extra fields is unknown at encode time: block-max
        # bounds use the avgdl-free upper bound (see codec.bm25_tf_impact);
        # exact scoring uses stats.json per-field avgdl at query time.
        # index_positions applies to EVERY text field (ES records positions
        # on all text fields by default, search_scheme.json:140-198), so
        # phrase queries work on multi-fields too.
        field_tables.append(encode_field(fname, f_idx, f_toks, f_dl64, None,
                                         with_positions=cfg.index_positions))
        docs_cols[f"doc_len_{fname}"] = pa.array(f_dl, pa.int32())
        field_dl_sums[fname] = int(f_dl64.sum())

    terms_out = pa.concat_tables(field_tables).combine_chunks()
    # within a field terms are sorted; keep field-major order for row-group
    # pruning on (field, term)
    docs_out = pa.table(docs_cols)
    _write_segment_files(index_dir, seg_id, terms_out, docs_out,
                         cfg.index_block_rows, cfg.postings_compression,
                         cfg.postings_sidecar)

    secs = time.perf_counter() - t0
    if cfg.enable_metrics:
        from ..state import metrics as _metrics

        h = _metrics.get_or_create()
        h.incr.remote("indexed", int(n_docs), partition=f"segment-{seg_id}")
        h.incr.remote("duplicates", int(n_dups), partition=f"segment-{seg_id}")
    checksum = hashlib.md5("\n".join(urls[first].tolist()).encode()).hexdigest()
    n_postings = int(pc.sum(terms_out["df"]).as_py() or 0)
    mf.write_manifest(
        index_dir, seg_id,
        {
            # avgdl the text-field block-max bounds were encoded under:
            # after appends move the global avgdl, searchers scale stored
            # bounds by max(1, avgdl_now/encode_avgdl) to stay admissible
            "encode_avgdl": float(plan["avgdl"]),
            "n_input_rows": int(n_input),
            "n_docs": int(n_docs),
            "n_duplicates": int(n_dups),
            "n_terms": terms_out.num_rows,
            "n_postings": n_postings,
            "field_dl_sums": field_dl_sums,
            "doc_id_base": base,
            "url_checksum": checksum,
            "build_secs": round(secs, 4),
            "docs_per_sec": round(n_docs / secs, 2) if secs > 0 else None,
        },
    )
    return pa.table(
        {
            "segment_id": pa.array([seg_id], pa.int32()),
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_terms": pa.array([terms_out.num_rows], pa.int64()),
            "n_postings": pa.array([n_postings], pa.int64()),
            "n_duplicates": pa.array([n_dups], pa.int64()),
            "build_secs": pa.array([secs], pa.float64()),
        }
    )


def _build_segments(index_dir: str, plan: dict, cfg: BuildConfig) -> list[dict]:
    # resume skips every bucket whose docs live in SOME segment — including
    # buckets absorbed into merged segments (mf.covered_buckets)
    done = mf.covered_buckets(index_dir)
    boundaries = plan["boundaries"]
    corpus_dir = os.path.join(index_dir, "corpus")
    # Shuffle reduce-side parallelism follows the upstream block count —
    # but it must track the CPU budget, NOT n_segments: the sort-shuffle's
    # cost grows with block count (sample/sort/reduce per block, B x B
    # partition fragments), and map_groups already yields each bucket's
    # group separately inside a reduce task, so segments in the same block
    # just build sequentially. Measured at 1M docs / 122 segments / 8 cpus:
    # 122 blocks -> 10-12s exchange, 16 blocks -> 2.8s, identical groups.
    # Prune to the columns phase C consumes.
    ds = rd.read_parquet(
        corpus_dir, columns=_corpus_columns(cfg),
        override_num_blocks=int(os.environ.get("EDLR_SHUFFLE_BLOCKS", "0")) or max(2 * _ncpus(), 8))

    done_ref = ray.put(frozenset(done))
    plan_ref = ray.put(plan)

    def add_bucket_filter(t: pa.Table) -> pa.Table:
        urls = np.asarray(t["url"].to_numpy(zero_copy_only=False), dtype=object)
        b = _bucket_of(urls, boundaries)
        t = t.append_column("bucket", pa.array(b))
        skip = ray.get(done_ref)
        if skip:
            keep = ~np.isin(b, np.fromiter(skip, dtype=np.int32))
            t = t.filter(pa.array(keep))
        return t

    def pack_by_bucket(t: pa.Table) -> pa.Table:
        """Assign buckets, drop finished ones, and PACK each bucket's rows
        into one payload row (see _pack_cell): the groupby then shuffles
        ~(blocks x buckets) small rows, not every doc."""
        pin_worker_threads()
        t = add_bucket_filter(t)
        b = t["bucket"].to_numpy()
        t = t.drop_columns(["bucket"])
        if t.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int32()),
                             "payload": pa.array([], pa.binary())})
        order = np.argsort(b, kind="stable")
        t = t.take(pa.array(order)).combine_chunks()
        bs = b[order]
        starts = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
        ends = np.r_[starts[1:], len(bs)]
        return pa.table({
            "bucket": pa.array(bs[starts], pa.int32()),
            "payload": pa.array(
                [_pack_cell(t.slice(int(s), int(e - s)), cfg.shuffle_pack_codec)
                 for s, e in zip(starts, ends)], pa.binary()),
        })

    def seg_fn(group: pa.Table) -> pa.Table:
        return _build_segment(group, index_dir, ray.get(plan_ref), cfg)

    packed = cfg.shuffle_pack_codec is not None
    staged = (ds.map_batches(pack_by_bucket, batch_format="pyarrow",
                             batch_size=None)
              if packed else
              ds.map_batches(add_bucket_filter, batch_format="pyarrow"))
    summaries = (
        staged.groupby("bucket")
        .map_groups(seg_fn, batch_format="pyarrow")
        .take_all()
    )
    return summaries


# --- fused fresh-build path (manual exchange, overlapped phases) ----------
#
# The 4-phase path above re-reads the corpus parquet twice (plan + segments)
# and routes the segment exchange through Ray Data's sort-based shuffle,
# whose cost is dominated by per-job terms that do not shrink with CPU count
# (boundary sampling, per-block sorts, shuffle-block materialization, the
# all-to-all barrier — measured ~24 s at 4M docs regardless of 2 vs 8 CPUs;
# the segments phase scaled 0.59 while per-task build times were flat).
# Fresh builds therefore run this fused plan:
#
#   1. boundaries: one pruned url-column pass over the INPUT (quantile
#      sample — placement only affects segment membership, never doc ids);
#   2. ONE streaming pass: read -> extract; each finished block concurrently
#      (a) writes a corpus parquet part (resumability — same bytes as
#      phase A) and (b) partitions into per-bucket-GROUP slices returned
#      as separate driver-owned objects (ceil(n/BUILD_GROUP) data slices +
#      ceil(n/STATS_GROUP) (url, warc_ts, doc_len) count minis, each with
#      an int32 bucket column for local re-split) — ref fan-out per block
#      is O(buckets/BUILD_GROUP), and a ray.wait throttle on unfinished
#      write/partition tasks backpressures the streaming extract so the
#      exchange holds ~1x corpus (the slices) + a bounded block window;
#   3. fixed-range count wave over the minis (~5% of corpus bytes): exact
#      post-dedup counts -> prefix-sum doc-id offsets -> plan.json
#      (identical content/semantics to _make_plan);
#   4. fixed-range build wave: each task concatenates its bucket range's
#      slices, re-splits on the bucket column and runs the same vectorized
#      ``_build_segment`` (dedup, dense ids, tokenize, encode, atomic
#      manifest commit) per bucket.
#
# The exchange is raw Ray tasks because the Dataset API cannot express a
# range-partition by *known* boundaries without a sort: every object is
# owned by the driver (lineage-reconstructible), data crosses the object
# store exactly once, and there is no sample/sort/fragment machinery.
# Resume runs through the SAME plan whenever plan.json survived (see
# _fused_route). Fused and phased builds agree on the semantic contract
# (doc ids are global url ranks in both; search results bitwise-equal);
# segment MEMBERSHIP may differ — the plans quantile-sample boundaries
# from the input vs the extracted corpus (test_fuzz_round4).

def _fused_route(index_dir: str) -> tuple[bool, dict | None, bool]:
    """(use_fused, plan_override, corpus_done) routing for a build attempt.

    Fresh indexes run the fused plan. A RESUMED build runs fused too when
    plan.json survived the crash (boundaries + doc-id offsets are frozen,
    committed buckets ship no rows through the exchange); the one state
    fused cannot resume is a corpus committed before any plan landed
    (phased phase-A crash) — the phased path owns that shape. EDLR_FUSED=0
    forces the phased path everywhere."""
    corpus_done = os.path.exists(
        os.path.join(index_dir, "corpus", "_SUCCESS"))
    if os.environ.get("EDLR_FUSED", "1") == "0":
        return False, None, corpus_done
    plan_path = os.path.join(index_dir, "plan.json")
    if os.path.exists(plan_path):
        return True, mf.read_json(plan_path), corpus_done
    if corpus_done or mf.committed_segments(index_dir):
        return False, None, corpus_done
    return True, None, corpus_done


@ray.remote
def _write_corpus_block(tbl: pa.Table, corpus_dir: str, name: str) -> int:
    pin_worker_threads()
    pq.write_table(tbl, os.path.join(corpus_dir, name))
    return tbl.num_rows


_MINI_COLS = ["url", "warc_ts", "doc_len"]


@ray.remote
def _partition_block(tbl: pa.Table, boundaries: list[str], n_buckets: int,
                     cols: list[str]):
    """One corpus block -> 2*n_buckets driver-owned objects: the bucket's
    data slice (columns ``cols``) and its count mini (``_MINI_COLS``).
    Slices of a taken table serialize compactly (verified: ~row bytes, not
    buffer bytes), so each bucket ships only its own rows."""
    pin_worker_threads()
    t = tbl.select(cols).combine_chunks()
    urls = np.asarray(t["url"].to_numpy(zero_copy_only=False), dtype=object)
    b = _bucket_of(urls, boundaries)
    order = np.argsort(b, kind="stable")
    ts = t.take(pa.array(order))
    bs = b[order]
    empty = ts.slice(0, 0)
    datas: list[pa.Table] = [empty] * n_buckets
    if len(bs):
        starts = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
        ends = np.r_[starts[1:], len(bs)]
        for s, e in zip(starts, ends):
            datas[int(bs[s])] = ts.slice(int(s), int(e - s))
    minis = [d.select(_MINI_COLS) for d in datas]
    return tuple(datas) + tuple(minis)


# buckets per stats task / segments per build task: grouping amortizes the
# per-task scheduling + arg-serialization cost (485 one-bucket tasks cost
# ~4s of driver time regardless of CPU count — pure Amdahl overhead).
# Values are leg-independent so every cluster size runs identical work units.
STATS_GROUP = 16
BUILD_GROUP = 4

# max unfinished corpus-write + partition tasks before the fused bundle
# loop blocks on ray.wait: bounds how many EXTRACT blocks sit in the object
# store awaiting their two consumers (backpressure propagates up through
# the streaming source), so exchange residency stays ~1x corpus (the
# bucket slices) + this window instead of 2x.
FUSED_INFLIGHT = max(4 * os.cpu_count() if os.cpu_count() else 32, 32)


def _group_cuts(n_buckets: int, group: int) -> np.ndarray:
    """Bucket-group boundaries: groups are FIXED ranges
    [g*group, (g+1)*group) so group membership never depends on which
    buckets happen to be live — every block's slice g covers the same
    bucket range and can be concatenated downstream."""
    return np.r_[np.arange(0, n_buckets, group, dtype=np.int64), n_buckets]


@ray.remote
def _partition_block_grouped(tbl: pa.Table, boundaries: list[str],
                             n_buckets: int, cols: list[str],
                             skip: frozenset[int],
                             pack: str | None = None):
    """One corpus block -> per-bucket-GROUP driver-owned objects:
    ``ceil(n/BUILD_GROUP)`` data slices (columns ``cols`` + an int32
    ``bucket`` column, rows bucket-sorted) then ``ceil(n/STATS_GROUP)``
    count minis (``_MINI_COLS`` + ``bucket``). Grouped returns bound the
    driver's ref fan-out at O(blocks x buckets / BUILD_GROUP) — the
    per-(block, bucket) shape was the first thing to break at 8M+ docs
    (object metadata + residency). Buckets in ``skip`` (resume: already
    committed) ship no rows. Slices of a taken table serialize compactly
    (verified: ~row bytes, not buffer bytes)."""
    pin_worker_threads()
    t = tbl.select(cols).combine_chunks()
    urls = np.asarray(t["url"].to_numpy(zero_copy_only=False), dtype=object)
    b = _bucket_of(urls, boundaries)
    if skip:
        keep = ~np.isin(b, np.fromiter(skip, dtype=np.int32))
        t = t.filter(pa.array(keep))
        b = b[keep]
    t = t.append_column("bucket", pa.array(b.astype(np.int32)))
    order = np.argsort(b, kind="stable")
    ts = t.take(pa.array(order))
    bs = b[order]
    mini_cols = [*_MINI_COLS, "bucket"]
    d_cuts = _group_cuts(n_buckets, BUILD_GROUP)
    s_cuts = _group_cuts(n_buckets, STATS_GROUP)
    d_pos = np.searchsorted(bs, d_cuts)
    s_pos = np.searchsorted(bs, s_cuts)
    datas = [ts.slice(int(d_pos[i]), int(d_pos[i + 1] - d_pos[i]))
             for i in range(len(d_cuts) - 1)]
    minis = [ts.select(mini_cols).slice(int(s_pos[i]),
                                        int(s_pos[i + 1] - s_pos[i]))
             for i in range(len(s_cuts) - 1)]
    if pack is not None:
        # DATA slices only: they are the residency (text column); minis are
        # ~6% of corpus and packing them just adds a decode to the
        # low-parallelism stats wave
        datas = [_pack_cell(d, pack) for d in datas]
    return tuple(datas) + tuple(minis)


@ray.remote
def _bucket_stats_group(bucket_lo: int, n_in_group: int,
                        *minis: pa.Table) -> list[tuple]:
    """Stats for one FIXED bucket range [bucket_lo, bucket_lo+n): per-bucket
    (n_docs, dl_sum, n_dups, dup_examples) after keep-first dedup by
    (url asc, warc_ts asc) — the exact phase-C rule, vectorized across the
    whole group via the carried ``bucket`` column."""
    pin_worker_threads()
    if minis and isinstance(minis[0], bytes):
        minis = [pa.ipc.open_stream(pa.BufferReader(p)).read_all()
                 for p in minis]
    tabs = [m for m in minis if m.num_rows]
    if not tabs:
        return [(0, 0, 0, [])] * n_in_group
    t = pa.concat_tables(tabs).combine_chunks().sort_by(
        [("bucket", "ascending"), ("url", "ascending"),
         ("warc_ts", "ascending")])
    urls = np.asarray(t["url"].to_numpy(zero_copy_only=False), dtype=object)
    bk = t["bucket"].to_numpy().astype(np.int64)
    first = np.ones(len(urls), dtype=bool)
    first[1:] = (urls[1:] != urls[:-1]) | (bk[1:] != bk[:-1])
    dl = t["doc_len"].to_numpy()
    rel = bk - bucket_lo
    n_docs = np.bincount(rel[first], minlength=n_in_group)
    dl_sum = np.bincount(rel[first], weights=dl[first].astype(np.float64),
                         minlength=n_in_group)
    n_dups = np.bincount(rel[~first], minlength=n_in_group)
    examples: dict[int, list[str]] = {}
    for i in np.flatnonzero(~first)[:3 * n_in_group]:
        ex = examples.setdefault(int(rel[i]), [])
        if len(ex) < 3:
            ex.append(urls[i])
    return [(int(n_docs[g]), int(dl_sum[g]), int(n_dups[g]),
             examples.get(g, [])) for g in range(n_in_group)]


@ray.remote
def _build_bucket(index_dir: str, seg_id: int, plan: dict, cfg: BuildConfig,
                  *parts: pa.Table) -> int:
    pin_worker_threads()
    tabs = [p for p in parts if p.num_rows]
    group = pa.concat_tables(tabs)
    group = group.append_column(
        "bucket", pa.array(np.full(group.num_rows, seg_id, dtype=np.int32)))
    _build_segment(group, index_dir, plan, cfg)
    return seg_id


@ray.remote
def _build_bucket_group(index_dir: str, bucket_lo: int, n_in_group: int,
                        plan: dict, cfg: BuildConfig,
                        *parts: pa.Table) -> list[int]:
    """Build the segments of one FIXED bucket range sequentially in one
    task; ``parts`` are that range's data slices from every block (rows
    bucket-sorted, seg id == the carried ``bucket`` value in fresh
    builds). Empty buckets (or resume-skipped ones, which ship no rows)
    build nothing."""
    pin_worker_threads()
    if parts and isinstance(parts[0], bytes):
        parts = [pa.ipc.open_stream(pa.BufferReader(p)).read_all()
                 for p in parts]
    tabs = [p for p in parts if p.num_rows]
    if not tabs:
        return []
    g = pa.concat_tables(tabs).combine_chunks()
    bk = g["bucket"].to_numpy()
    order = np.argsort(bk, kind="stable")
    gs = g.take(pa.array(order))
    bs = bk[order]
    built: list[int] = []
    starts = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
    ends = np.r_[starts[1:], len(bs)]
    for s, e in zip(starts, ends):
        sub = gs.slice(int(s), int(e - s))
        _build_segment(sub, index_dir, plan, cfg)
        built.append(int(bs[s]))
    return built


def _run_fused(source: rd.Dataset, index_dir: str, cfg: BuildConfig,
               timings: dict[str, float], boundaries: list[str],
               plan_override: dict | None = None,
               write_corpus: bool = True) -> dict:
    """Run the fused exchange+build over ``source`` (extract output or a
    clean corpus Dataset). See the section comment above for the plan.

    Resume: ``plan_override`` reuses a committed plan.json (boundaries and
    doc-id offsets are frozen — the stats wave is skipped and already-
    committed buckets ship no rows through the exchange); ``write_corpus=
    False`` skips the corpus part writes when corpus/_SUCCESS already
    exists and ``source`` is the corpus itself."""
    corpus_dir = os.path.join(index_dir, "corpus")
    if write_corpus:
        if os.path.isdir(corpus_dir):
            shutil.rmtree(corpus_dir)
        os.makedirs(corpus_dir, exist_ok=True)
    n_buckets = len(boundaries) + 1
    skip = frozenset(mf.covered_buckets(index_dir)) if plan_override else \
        frozenset()
    cols = _corpus_columns(cfg)
    d_cuts = _group_cuts(n_buckets, BUILD_GROUP)
    s_cuts = _group_cuts(n_buckets, STATS_GROUP)
    n_dg, n_sg = len(d_cuts) - 1, len(s_cuts) - 1
    pack = os.environ.get("EDLR_FUSED_PACK") or cfg.fused_pack_codec
    if pack in ("", "none", "0"):
        pack = None
    part_task = _partition_block_grouped.options(num_returns=n_dg + n_sg)
    t0 = time.perf_counter()
    write_refs: list = []
    data_refs: list[list] = []   # [block][data_group]
    mini_refs: list[list] = []   # [block][stats_group]
    pending: list = []           # in-flight write+partition, for throttling
    i = 0
    for bundle in source.iter_internal_ref_bundles():
        for block_ref, bmeta in bundle.blocks:
            # Ray Data normalizes all-empty blocks to ZERO-column tables
            # (schema lost), which would KeyError in the partitioner —
            # and an empty block contributes nothing anyway. Seen when a
            # lazy source (e.g. reindex of a heavily-tombstoned index)
            # yields fully-filtered upstream blocks.
            if bmeta.num_rows == 0:
                continue
            if write_corpus:
                w = _write_corpus_block.remote(
                    block_ref, corpus_dir, f"part-{i:06d}.parquet")
                write_refs.append(w)
                pending.append(w)
            rets = part_task.remote(block_ref, boundaries, n_buckets, cols,
                                    skip, pack)
            data_refs.append(list(rets[:n_dg]))
            mini_refs.append(list(rets[n_dg:]))
            pending.append(rets[0])
            i += 1
            # bound extract-block residency: blocks stay pinned only by
            # their two consumers' args; throttling the consumer backlog
            # backpressures the streaming source
            if len(pending) > FUSED_INFLIGHT:
                done, pending = ray.wait(
                    pending, num_returns=len(pending) - FUSED_INFLIGHT // 2)
    timings["corpus"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    if plan_override is not None:
        plan = plan_override
        per_bucket = np.asarray(plan["per_segment_docs"], dtype=np.int64)
        n_docs = int(plan["n_docs"])
        mini_refs.clear()
    else:
        if mini_refs:
            gtasks = []
            for g in range(n_sg):
                flat = [blk[g] for blk in mini_refs]
                gtasks.append(_bucket_stats_group.remote(
                    int(s_cuts[g]), int(s_cuts[g + 1] - s_cuts[g]), *flat))
            stats_per_bucket = [t for res in ray.get(gtasks) for t in res]
        else:
            stats_per_bucket = []
        per_bucket = np.array([s[0] for s in stats_per_bucket],
                              dtype=np.int64)
        if len(per_bucket) == 0:
            per_bucket = np.zeros(n_buckets, dtype=np.int64)
        n_docs = int(per_bucket.sum())
        dl_total = sum(s[1] for s in stats_per_bucket)
        n_dups = sum(s[2] for s in stats_per_bucket)
        if cfg.strict_duplicates and n_dups:
            raise DuplicateUrlError(
                n_dups, [u for s in stats_per_bucket for u in s[3]][:5])
        offsets = np.r_[0, np.cumsum(per_bucket)[:-1]]
        plan = {
            "boundaries": boundaries,
            "offsets": offsets.tolist(),
            "per_segment_docs": per_bucket.tolist(),
            "n_docs": n_docs,
            "n_duplicates": n_dups,
            "avgdl": (dl_total / n_docs) if n_docs else 0.0,
            "dl_total": int(dl_total),
            "n_segments": n_buckets if n_docs else 0,
            "seed": cfg.seed,
        }
        mf.write_json_atomic(os.path.join(index_dir, "plan.json"), plan)
    timings["plan"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    plan_ref = ray.put(plan)
    del mini_refs  # minis free as soon as their stats tasks finish
    if n_docs:
        build_refs = []
        for g in range(n_dg):
            lo, hi = int(d_cuts[g]), int(d_cuts[g + 1])
            todo = [b for b in range(lo, hi)
                    if per_bucket[b] > 0 and b not in skip]
            if not todo:
                continue
            flat = [blk[g] for blk in data_refs]
            build_refs.append(_build_bucket_group.remote(
                index_dir, lo, hi - lo, plan_ref, cfg, *flat))
        # drop the driver's slice refs NOW: each slice stays pinned only by
        # its pending build task's args, so store memory frees group by
        # group as waveB progresses instead of all-at-once at the end
        del data_refs
        ray.get(build_refs)
    else:
        del data_refs
    timings["segments"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    ray.get(write_refs)
    if write_corpus:
        with open(os.path.join(corpus_dir, "_SUCCESS"), "w") as f:
            f.write("")
    stats = _finalize(index_dir, plan, cfg, timings)
    timings["finalize"] = round(time.perf_counter() - t0, 3)
    return stats


# --- phase D --------------------------------------------------------------

def _build_termdict(index_dir: str, term_files: list[str],
                    seg_ids: list[int], cfg: BuildConfig) -> None:
    """Consolidated term-dictionary sidecar: every segment's PHYSICAL
    dictionary rows (field, term, df, max_impact, segment_id, blob byte
    ranges, blk_n — no postings) re-sorted by (field, term, segment_id)
    into one place. A cold LocalSearcher lookup then prunes row groups of
    O(1) files instead of fanning out a footer parse + filtered read to
    every segment's term file (~1.6 ms/file; 497 segments at 4M docs put
    cold p95 at 329 ms — VERDICT r3 #4). Postings still come from the
    per-segment blob sidecars via byte-range preads.

    This is a SERVING-side artifact (the Lucene force-merge/optimize
    analogue), deliberately NOT part of ``_finalize``: building it re-reads
    and re-sorts every dictionary row, a driver-heavy step that measurably
    flattened index-build scaling when it ran inline (8M docs: finalize
    2.8 s -> 17.3 s at 8 cpus). It builds on demand — ``ensure_termdict``
    explicitly, or ``LocalSearcher(termdict="auto")`` at bind once the
    segment count makes the fan-out hurt — and after merges.

    Sidecar layout only (inline layouts would drag the encoded postings
    through the sort). ``meta.json`` records the segment set; readers
    ignore a termdict whose set no longer matches (merge/append/compact
    also remove it eagerly)."""
    td_dir = os.path.join(index_dir, "termdict")
    want = [int(s) for s in seg_ids]
    if os.path.exists(os.path.join(td_dir, "_SUCCESS")):
        try:
            have = mf.read_json(os.path.join(td_dir, "meta.json"))["seg_ids"]
        except (OSError, KeyError, ValueError):
            have = None
        if have == want:
            return
    if os.path.isdir(td_dir):
        shutil.rmtree(td_dir)
    if not term_files:
        return
    schema = pq.ParquetFile(term_files[0]).schema_arrow
    if "blob_off" not in schema.names:  # inline layout: keep per-seg reads
        return
    total = sum(pq.ParquetFile(f).metadata.num_rows for f in term_files)
    os.makedirs(td_dir, exist_ok=True)
    if total <= int(os.environ.get("EDLR_FINALIZE_CUTOFF", "50000000")):
        tt = pq.read_table(term_files)
        tt = tt.sort_by([("field", "ascending"), ("term", "ascending"),
                         ("segment_id", "ascending")])
        tmp = os.path.join(td_dir, f"part-0.parquet.tmp-{uuid.uuid4().hex}")
        pq.write_table(tt, tmp, row_group_size=cfg.index_block_rows)
        os.replace(tmp, os.path.join(td_dir, "part-0.parquet"))
    else:
        (rd.read_parquet(term_files)
         .sort(["field", "term", "segment_id"])
         .write_parquet(td_dir))
    mf.write_json_atomic(os.path.join(td_dir, "meta.json"),
                         {"seg_ids": want})
    with open(os.path.join(td_dir, "_SUCCESS"), "w") as f:
        f.write("")


def ensure_termdict(index_dir: str, cfg: BuildConfig | None = None) -> None:
    """Build (or refresh) the consolidated term dictionary for the index's
    current VISIBLE segment set. Idempotent; safe to call concurrently
    (atomic per-file writes + a _SUCCESS gate; a stale set rebuilds)."""
    from .search import _load_stats, _visible_seg_ids

    stats = _load_stats(index_dir)
    seg_ids, _vis = _visible_seg_ids(index_dir, stats)
    _build_termdict(index_dir,
                    [seg_terms_path(index_dir, s) for s in seg_ids],
                    seg_ids, cfg or BuildConfig())


def drop_termdict(index_dir: str) -> None:
    """Remove the consolidated dictionary (stale after any operation that
    rewrites segments: merge/compact, append, wipe)."""
    td_dir = os.path.join(index_dir, "termdict")
    if os.path.isdir(td_dir):
        shutil.rmtree(td_dir)


def _finalize(index_dir: str, plan: dict, cfg: BuildConfig,
              timings: dict[str, float], extra: dict | None = None) -> dict:
    """``extra`` keys are merged into stats.json before the atomic write —
    the append path uses this so visibility (n_docs), tombstone file list
    and generation lineage land in ONE atomic commit."""
    stats_path = os.path.join(index_dir, "stats.json")
    manifests = mf.committed_segments(index_dir)
    term_files = [seg_terms_path(index_dir, s) for s in sorted(manifests)]
    term_stats_dir = os.path.join(index_dir, "term_stats")
    if not os.path.exists(os.path.join(term_stats_dir, "_SUCCESS")):
        if os.path.isdir(term_stats_dir):
            shutil.rmtree(term_stats_dir)
        os.makedirs(term_stats_dir, exist_ok=True)
        total_terms = sum(m["n_terms"] for m in manifests.values())
        if plan["n_docs"] > 0 and term_files:
            # driver cutoff: (field, term, df) rows are ~50 B each, so 50M
            # rows is ~2.5 GB — one threaded read + C++ group_by beats a
            # distributed sort-shuffle by ~10x well past this point
            # (measured: 29M rows in seconds vs 70s+ distributed at 8M
            # docs). Above it, the Ray groupby path takes over.
            if total_terms <= int(os.environ.get(
                    "EDLR_FINALIZE_CUTOFF", "50000000")):
                # small vocab: one threaded read + C++ group_by on the driver
                # beats three distributed stages of overhead
                tt = pq.read_table(term_files, columns=["field", "term", "df"])
                agg = (tt.group_by(["field", "term"]).aggregate([("df", "sum")])
                       .rename_columns(["field", "term", "df"])
                       .sort_by([("field", "ascending"), ("term", "ascending")]))
                pq.write_table(agg, os.path.join(term_stats_dir, "part-0.parquet"),
                               row_group_size=cfg.index_block_rows)
            else:
                (
                    rd.read_parquet(term_files, columns=["field", "term", "df"])
                    .groupby(["field", "term"])
                    .aggregate(Sum("df", alias_name="df"))
                    .sort(["field", "term"])
                    .write_parquet(term_stats_dir)
                )
        with open(os.path.join(term_stats_dir, "_SUCCESS"), "w") as f:
            f.write("")
    rejects = count_rejects(os.path.join(index_dir, "errors"))
    n_docs = plan["n_docs"]
    per_field: dict[str, dict[str, float]] = {
        "text": {"avgdl": plan["avgdl"]}}
    for fname, _src, _an in cfg.fields:
        dl_sum = sum(m.get("field_dl_sums", {}).get(fname, 0)
                     for m in manifests.values())
        per_field[fname] = {"avgdl": (dl_sum / n_docs) if n_docs else 0.0}
    stats = {
        "n_docs": plan["n_docs"],
        "avgdl": plan["avgdl"],
        # integer doc-length total: appends add to it exactly, so the
        # recomputed avgdl matches a from-scratch build bit-for-bit
        "dl_total": int(plan.get(
            "dl_total", round(plan["avgdl"] * plan["n_docs"]))),
        "per_field": per_field,
        "field_analyzers": {"text": "standard",
                            **{f: a for f, _s, a in cfg.fields}},
        "index_positions": cfg.index_positions,
        "n_segments": plan["n_segments"],
        "n_duplicates": sum(m["n_duplicates"] for m in manifests.values()),
        "n_postings": sum(m["n_postings"] for m in manifests.values()),
        "rejects": rejects,
        "bm25": {"k1": codec.BM25_K1, "b": codec.BM25_B},
        "per_segment": {
            str(k): {
                "n_docs": m["n_docs"],
                "build_secs": m["build_secs"],
                "docs_per_sec": m["docs_per_sec"],
            }
            for k, m in sorted(manifests.items())
        },
        "phase_secs": timings,
    }
    if extra:
        stats.update(extra)
    mf.write_json_atomic(stats_path, stats)
    return stats


# --- entry ----------------------------------------------------------------

def build_index_from_corpus(corpus: rd.Dataset, index_dir: str,
                            cfg: BuildConfig | None = None) -> dict:
    """Build an index from an already-cleaned corpus Dataset (columns
    url, warc_ts, text, lang, doc_len) — phase A becomes a plain write.
    Used when the input is a text table rather than raw HTML webtext."""
    cfg = cfg or BuildConfig()
    os.makedirs(index_dir, exist_ok=True)
    timings: dict[str, float] = {}
    use_fused, plan_override, corpus_done = _fused_route(index_dir)
    if use_fused:
        t = time.perf_counter()
        if plan_override is not None:
            boundaries = list(plan_override["boundaries"])
            if corpus_done:  # committed corpus replaces the caller's input
                corpus = rd.read_parquet(
                    os.path.join(index_dir, "corpus"),
                    override_num_blocks=max(2 * _ncpus(), 16))
            mat = corpus if corpus_done else corpus.materialize()
        else:
            mat = corpus.materialize()
            n_est = mat.count()
            boundaries = (_segment_boundaries(mat.select_columns(["url"]),
                                              n_est, cfg) if n_est else [])
        timings["bounds"] = round(time.perf_counter() - t, 3)
        return _run_fused(mat, index_dir, cfg, timings, boundaries,
                          plan_override=plan_override,
                          write_corpus=not corpus_done)
    corpus_dir = os.path.join(index_dir, "corpus")
    success = os.path.join(corpus_dir, "_SUCCESS")
    t = time.perf_counter()
    if not os.path.exists(success):
        if os.path.isdir(corpus_dir):
            shutil.rmtree(corpus_dir)
        corpus.write_parquet(corpus_dir)
        with open(success, "w") as f:
            f.write("")
    timings["corpus"] = round(time.perf_counter() - t, 3)
    return _build_after_corpus(index_dir, cfg, timings)


def _build_after_corpus(index_dir: str, cfg: BuildConfig,
                        timings: dict[str, float]) -> dict:
    t = time.perf_counter()
    plan = _make_plan(index_dir, cfg)
    timings["plan"] = round(time.perf_counter() - t, 3)
    t = time.perf_counter()
    if plan["n_docs"] > 0:
        _build_segments(index_dir, plan, cfg)
    timings["segments"] = round(time.perf_counter() - t, 3)
    t = time.perf_counter()
    stats = _finalize(index_dir, plan, cfg, timings)
    timings["finalize"] = round(time.perf_counter() - t, 3)
    return stats


def build_index(input_path: str, index_dir: str,
                cfg: BuildConfig | None = None) -> dict:
    """Build (or resume) the full inverted index; returns stats.json content.

    Fresh builds run the fused overlapped plan (see the fused section
    comment); resumed builds (corpus/plan/manifests already on disk) run
    the 4-phase path, which skips completed work. ``EDLR_FUSED=0`` forces
    the phased path everywhere."""
    cfg = cfg or BuildConfig()
    os.makedirs(index_dir, exist_ok=True)
    timings: dict[str, float] = {}
    use_fused, plan_override, corpus_done = _fused_route(index_dir)
    if use_fused:
        t = time.perf_counter()
        if plan_override is not None and corpus_done:
            # resume after the corpus committed: source the exchange from
            # the durable corpus (no re-extract), skip committed buckets
            boundaries = list(plan_override["boundaries"])
            src = rd.read_parquet(
                os.path.join(index_dir, "corpus"),
                override_num_blocks=max(2 * _ncpus(), 16))
            timings["bounds"] = round(time.perf_counter() - t, 3)
            return _run_fused(src, index_dir, cfg, timings, boundaries,
                              plan_override=plan_override,
                              write_corpus=False)
        errors_dir = os.path.join(index_dir, "errors")
        if plan_override is None and os.path.isdir(errors_dir):
            _clear_errors_dir(errors_dir)  # resume keeps retry-safe sinks
        if plan_override is not None:
            # corpus never committed: re-extract, but keep the FROZEN
            # boundaries/offsets so resumed doc ids are bitwise-identical
            boundaries = list(plan_override["boundaries"])
            n_est = int(plan_override["n_docs"])
        else:
            # boundary sample over the INPUT's url column only (pruned
            # read): reject rows shift quantiles negligibly and never
            # affect doc ids
            urls_ds = rd.read_parquet(input_path, columns=["url"])
            n_est = urls_ds.count()
            boundaries = (_segment_boundaries(urls_ds, n_est, cfg)
                          if n_est else [])
        timings["bounds"] = round(time.perf_counter() - t, 3)
        # block count scales with rows (~125k docs / ~300MB of text per
        # block) so one block + its partition copy stays a small fraction
        # of a worker heap, and never below 2 blocks per CPU
        n_blocks = max(2 * _ncpus(), 16, math.ceil(n_est / 125_000))
        src = rd.read_parquet(
            input_path, override_num_blocks=n_blocks
        ).map_batches(
            extract_batch,
            fn_kwargs={"errors_dir": errors_dir,
                       "max_doc_bytes": cfg.max_doc_bytes},
            batch_format="pyarrow",
            batch_size=cfg.extract_batch_size,
        )
        return _run_fused(src, index_dir, cfg, timings, boundaries,
                          plan_override=plan_override,
                          write_corpus=True)
    t = time.perf_counter()
    _build_corpus(input_path, index_dir, cfg)
    timings["corpus"] = round(time.perf_counter() - t, 3)
    return _build_after_corpus(index_dir, cfg, timings)
