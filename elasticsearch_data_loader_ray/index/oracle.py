"""Brute-force BM25 oracle — the rank-identity reference for the engine.

Computes top-k straight from a webtext table with no index, no segments, no
compression: dedup by url (first wins), doc_id = global url rank, scalar
standard-analyzer tokenization, exact df/avgdl, then per query accumulate
``idf * tf_impact`` over terms in lexicographic order (the same float64
operation order the exact engine mode uses, so scores compare bitwise).

This is the analogue of the reference's golden-bytes test style
(``/root/reference/companybindex/main_test.go:165-172``): an independent,
simple implementation the distributed engine must match exactly.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

from ..functions.analyzers import analyze
from . import codec
from .search import query_terms


def corpus_from_webtext(webtext: pa.Table) -> tuple[list[str], list[list[str]]]:
    """The engine's exact corpus rule: drop rejects FIRST (phase A removes
    NULL/empty rows before anything else), then keep the min-(url, warc_ts)
    row per url (phase C sorts by (url, warc_ts) and keeps the first).
    A url whose earliest row is a reject but that has a later valid payload
    is therefore INDEXED (from the valid row) — first-occurrence-in-input
    dedup would wrongly drop it.

    Returns (urls_sorted, tokens_per_doc); doc_id = position in urls_sorted.
    """
    rows = [(u, ts, x) for u, ts, x in zip(webtext["url"].to_pylist(),
                                           webtext["warc_ts"].to_pylist(),
                                           webtext["text"].to_pylist())
            if x]  # rejects (None or "") removed before dedup
    rows.sort(key=lambda r: (r[0], r[1]))  # keep-first by (url, warc_ts)
    seen: dict[str, str] = {}
    for u, _ts, x in rows:
        if u not in seen:
            seen[u] = x
    urls = sorted(seen)
    toks = [analyze("standard", seen[u]) for u in urls]
    return urls, toks


def bm25_topk(webtext: pa.Table, queries: pa.Table,
              k1: float = codec.BM25_K1, b: float = codec.BM25_B) -> pa.Table:
    """Exact top-k for each query -> (query_id, rank, doc_id, score)."""
    urls, toks = corpus_from_webtext(webtext)
    n_docs = len(urls)
    dl = np.array([len(t) for t in toks], dtype=np.float64)
    avgdl = float(dl.mean()) if n_docs else 0.0
    # postings: term -> (doc_ids asc, tfs)
    postings: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    tf_maps = [Counter(t) for t in toks]
    vocab: dict[str, list[tuple[int, int]]] = {}
    for d, cnt in enumerate(tf_maps):
        for term, tf in cnt.items():
            vocab.setdefault(term, []).append((d, tf))
    for term, posts in vocab.items():
        ids = np.array([p[0] for p in posts], dtype=np.int64)
        tfs = np.array([p[1] for p in posts], dtype=np.float64)
        postings[term] = (ids, tfs)

    out_q, out_r, out_d, out_s = [], [], [], []
    for row in queries.to_pylist():
        qid, k = int(row["query_id"]), int(row.get("k", 10))
        terms = [t for t in query_terms(row["query"]) if t in postings]
        scores = np.zeros(n_docs, dtype=np.float64)
        touched = np.zeros(n_docs, dtype=bool)
        for t in terms:  # lexicographic order (query_terms sorts)
            ids, tfs = postings[t]
            idf = float(codec.bm25_idf(len(ids), n_docs))
            scores[ids] += idf * codec.bm25_tf_impact(tfs, dl[ids], avgdl)
            touched[ids] = True
        cand = np.flatnonzero(touched)
        sc = scores[cand]
        order = np.lexsort((cand, -sc))[:k]
        for r, i in enumerate(order, start=1):
            out_q.append(qid); out_r.append(r)
            out_d.append(int(cand[i])); out_s.append(float(sc[i]))
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_r, pa.int64()),
            "doc_id": pa.array(out_d, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        }
    )
