"""Segment merge / compaction (the Lucene-merge analogue).

Segments hold contiguous, disjoint doc-id ranges in url order, and every
posting list stores its first doc id absolute + the rest as gaps. Merging
two ADJACENT segments therefore never re-encodes posting bodies: for a term
in both, the merged stream is ``enc_A ++ reencode_first(enc_B)`` where only
B's first varint is rewritten from absolute to a gap from A's last doc id —
O(1) bytes touched per term. Block-max metadata concatenates (a short
boundary block keeps valid bounds); df adds; max_impact maxes.

``merge_segments(index_dir, group_size)`` compacts runs of adjacent
committed segments, publishing each merged segment atomically (files first,
then a combined manifest replacing the inputs' manifests) and refreshing
``stats.json``. Search is oblivious: it discovers segments from manifests.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import codec
from . import manifest as mf
from .build import BuildConfig, _write_segment_files, seg_docs_path, seg_terms_path


def _reencode_first(enc: bytes, prev_last: int) -> bytes:
    """Rewrite the leading absolute-doc varint as a gap from prev_last."""
    first = codec.varint_decode(np.frombuffer(enc, dtype=np.uint8))
    # decode only needs the first value; find its byte length
    b = np.frombuffer(enc, dtype=np.uint8)
    L = int(np.flatnonzero((b & 0x80) == 0)[0]) + 1
    v = int(first[0])
    gap_bytes, _ = codec.varint_encode(np.array([v - prev_last], dtype=np.uint64))
    return gap_bytes.tobytes() + enc[L:]


def _merge_term_tables(parts: list[pa.Table]) -> pa.Table:
    """Merge per-segment term tables (each sorted by field, term)."""
    import pandas as pd

    frames = []
    for si, t in enumerate(parts):
        df = t.to_pandas()
        df["_seg"] = si
        frames.append(df)
    allt = pd.concat(frames, ignore_index=True)
    allt = allt.sort_values(["field", "term", "_seg"], kind="stable")

    has_positions = "positions_enc" in allt.columns
    out = {c: [] for c in ("field", "term", "df", "doc_ids_enc", "tfs_enc",
                           "block_last_doc", "block_max_impact", "max_impact")}
    if has_positions:
        out["positions_enc"] = []
    for (field, term), g in allt.groupby(["field", "term"], sort=False):
        rows = g.to_dict("records")
        doc_enc = bytes(rows[0]["doc_ids_enc"])
        tf_enc = bytes(rows[0]["tfs_enc"])
        blast = list(rows[0]["block_last_doc"])
        bmax = list(rows[0]["block_max_impact"])
        df_total = int(rows[0]["df"])
        mx = float(rows[0]["max_impact"])
        pos_enc = rows[0].get("positions_enc")
        pos_enc = bytes(pos_enc) if pos_enc is not None else None
        for r in rows[1:]:
            prev_last = int(blast[-1])
            doc_enc += _reencode_first(bytes(r["doc_ids_enc"]), prev_last)
            tf_enc += bytes(r["tfs_enc"])
            blast.extend(r["block_last_doc"])
            bmax.extend(r["block_max_impact"])
            df_total += int(r["df"])
            mx = max(mx, float(r["max_impact"]))
            if has_positions:
                rp = r.get("positions_enc")
                if pos_enc is not None and rp is not None:
                    pos_enc += bytes(rp)  # within-doc: no boundary fix needed
                elif rp is not None:
                    pos_enc = bytes(rp)
        out["field"].append(field)
        out["term"].append(term)
        out["df"].append(df_total)
        out["doc_ids_enc"].append(doc_enc)
        out["tfs_enc"].append(tf_enc)
        out["block_last_doc"].append([int(x) for x in blast])
        out["block_max_impact"].append([float(x) for x in bmax])
        out["max_impact"].append(mx)
        if has_positions:
            out["positions_enc"].append(pos_enc)
    if has_positions:
        pos_col = {"positions_enc": pa.array(out["positions_enc"], pa.binary())}
    else:
        pos_col = {}
    return pa.table({
        **pos_col,
        "field": pa.array(out["field"], pa.string()),
        "term": pa.array(out["term"], pa.string()),
        "df": pa.array(out["df"], pa.int64()),
        "doc_ids_enc": pa.array(out["doc_ids_enc"], pa.binary()),
        "tfs_enc": pa.array(out["tfs_enc"], pa.binary()),
        "block_last_doc": pa.array(out["block_last_doc"], pa.list_(pa.int64())),
        "block_max_impact": pa.array(out["block_max_impact"], pa.list_(pa.float64())),
        "max_impact": pa.array(out["max_impact"], pa.float64()),
    })


def merge_segments(index_dir: str, group_size: int = 2,
                   cfg: BuildConfig | None = None) -> list[int]:
    """Compact adjacent committed segments in runs of ``group_size``.

    Returns the surviving segment ids. Doc ids are untouched (ranges stay
    contiguous); term_stats and global stats are unaffected except
    ``n_segments``/``per_segment`` which are refreshed in stats.json.
    """
    cfg = cfg or BuildConfig()
    manifests = mf.committed_segments(index_dir)
    seg_ids = sorted(manifests)
    survivors: list[int] = []
    t_all = time.perf_counter()
    for i in range(0, len(seg_ids), group_size):
        run = seg_ids[i:i + group_size]
        if len(run) == 1:
            survivors.append(run[0])
            continue
        t0 = time.perf_counter()
        term_parts = [pq.read_table(seg_terms_path(index_dir, s)) for s in run]
        doc_parts = [pq.read_table(seg_docs_path(index_dir, s)) for s in run]
        merged_terms = _merge_term_tables(term_parts)
        merged_docs = pa.concat_tables(doc_parts).combine_chunks()
        keep = run[0]
        _write_segment_files(index_dir, keep, merged_terms, merged_docs,
                             cfg.index_block_rows)
        secs = time.perf_counter() - t0
        combined = {
            "n_input_rows": sum(manifests[s]["n_input_rows"] for s in run),
            "n_docs": sum(manifests[s]["n_docs"] for s in run),
            "n_duplicates": sum(manifests[s]["n_duplicates"] for s in run),
            "n_terms": merged_terms.num_rows,
            "n_postings": sum(manifests[s]["n_postings"] for s in run),
            "field_dl_sums": {
                k: sum(manifests[s].get("field_dl_sums", {}).get(k, 0)
                       for s in run)
                for k in manifests[run[0]].get("field_dl_sums", {})
            },
            "doc_id_base": manifests[run[0]]["doc_id_base"],
            "url_checksum": "+".join(manifests[s]["url_checksum"] for s in run),
            "build_secs": round(secs, 4),
            "docs_per_sec": None,
            "merged_from": run,
        }
        mf.write_manifest(index_dir, keep, combined)
        for s in run[1:]:
            os.unlink(mf.manifest_path(index_dir, s))
            for p in (seg_terms_path(index_dir, s), seg_docs_path(index_dir, s)):
                d = os.path.dirname(p)
                if os.path.isdir(d):
                    import shutil

                    shutil.rmtree(d)
        survivors.append(keep)
    # refresh stats.json segment counts
    stats_path = os.path.join(index_dir, "stats.json")
    if os.path.exists(stats_path):
        stats = mf.read_json(stats_path)
        new_manifests = mf.committed_segments(index_dir)
        stats["n_segments"] = len(new_manifests)
        stats["per_segment"] = {
            str(k): {"n_docs": m["n_docs"], "build_secs": m["build_secs"],
                     "docs_per_sec": m.get("docs_per_sec")}
            for k, m in sorted(new_manifests.items())
        }
        stats.setdefault("merges", []).append(
            {"group_size": group_size, "secs": round(time.perf_counter() - t_all, 3)})
        mf.write_json_atomic(stats_path, stats)
    return survivors
