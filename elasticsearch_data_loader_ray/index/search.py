"""BM25 top-k query engine over the segment index.

Reproduces the query capability the reference delegates to ElasticSearch
(``/root/reference/config/search_scheme.json`` text fields; ES 7 default BM25
k1=1.2, b=0.75): analyze the query with the target field's analyzer, look up
postings per (field, term) (J2), score BM25 with **global** df/avgdl, return
top-k by (score desc, doc_id asc). Multi-fields (different analyzer chains
over the same source column, ``search_scheme.json:140-198``) are separate
``field`` values in the term tables; each query targets one field
(default ``text``).

Execution: one stateful searcher actor pool over a Dataset of segments; each
task scores its segments against all queries (queries + idf broadcast via
``ray.put``) and emits per-segment top-k; a ``groupby(query_id)`` merge
produces the global top-k (A5 tree-merge analogue).

Scoring modes:

* exact (default): accumulate every query term in lexicographic term order —
  bitwise-identical float64 scores vs the brute-force oracle.
* maxscore (``use_maxscore=True``): terms processed in descending
  idf*max_impact; once the remaining upper bound cannot beat the current
  k-th score, remaining terms only update already-touched docs (classic
  MaxScore, using the term-level bound from the block-max metadata).
  Rank-identical; scores equal to ~1e-12 (float association order differs).
"""

from __future__ import annotations

import os
import re
import time
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..functions.analyzers import analyze
from . import blobs, codec
from . import manifest as mf
from .build import seg_docs_path, seg_terms_path

DEFAULT_FIELD = "text"


@dataclass
class SearchConfig:
    use_maxscore: bool = False
    concurrency: tuple[int, int] | int = (1, 8)
    segments_per_batch: int = 4


def _dl_column(field: str) -> str:
    return "doc_len" if field == DEFAULT_FIELD else f"doc_len_{field}"


def query_terms(query: str, analyzer: str = "standard") -> list[str]:
    """Analyzer terms, deduplicated, lexicographically sorted.

    Duplicate query terms count once (documented choice; the oracle and the
    DuckDB SQL use the same rule), and sorted order fixes the float64
    accumulation order for bitwise reproducibility.
    """
    return sorted(set(analyze(analyzer, query)))


def _load_stats(index_dir: str) -> dict:
    return mf.read_json(os.path.join(index_dir, "stats.json"))


def _file_sig(path: str) -> tuple[int, int] | None:
    """(mtime_ns, size) epoch fingerprint of an atomically-replaced file;
    None when absent. mf.write_json_atomic always os.replace()s, so any
    committed mutation changes the signature."""
    try:
        st = os.stat(path)
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return None


def _visible_seg_ids(index_dir: str, stats: dict) -> tuple[list[int], dict]:
    """Committed segments whose doc range is covered by ``stats.n_docs`` —
    the append visibility gate: an append commits segment files/manifests
    first, and the atomic stats.json rewrite is the visibility point, so a
    searcher must never serve a segment whose doc ids reach past it."""
    ms = mf.committed_segments(index_dir)
    n = int(stats.get("n_docs", 0))
    vis = {s: m for s, m in ms.items()
           if int(m["doc_id_base"]) + int(m["n_docs"]) <= n}
    return sorted(vis), vis


def _load_deleted(index_dir: str, stats: dict) -> np.ndarray:
    """Sorted global doc ids tombstoned by url upserts (appends)."""
    out = []
    for rel in stats.get("tombstone_files", []):
        p = os.path.join(index_dir, rel)
        if os.path.exists(p):
            out.append(np.asarray(mf.read_json(p)["deleted_doc_ids"],
                                  dtype=np.int64))
    if not out:
        return np.empty(0, np.int64)
    return np.unique(np.concatenate(out))


def _drop_deleted(deleted: np.ndarray, ids: np.ndarray) -> np.ndarray:
    """keep-mask over ``ids`` given the sorted tombstone array."""
    if len(deleted) == 0 or len(ids) == 0:
        return np.ones(len(ids), dtype=bool)
    pos = np.searchsorted(deleted, ids)
    ok = pos < len(deleted)
    posc = np.minimum(pos, len(deleted) - 1)
    return ~(ok & (deleted[posc] == ids))


def _bound_scale(vis_manifests: dict, stats: dict) -> float:
    """Admissibility factor for stored text-field block-max bounds.

    Bounds were encoded under each segment's build-time avgdl
    (``encode_avgdl`` in its manifest); after appends move the global
    avgdl UP, the true impact can exceed the stored bound by at most
    ``avgdl_now / encode_avgdl`` (denominator-term scaling), so pruning
    multiplies bounds by the max such ratio. Fresh builds: exactly 1.0."""
    avg = float(stats.get("avgdl", 0.0) or 0.0)
    scale = 1.0
    for m in vis_manifests.values():
        enc = float(m.get("encode_avgdl", 0.0) or 0.0)
        if enc > 0 and avg > enc:
            scale = max(scale, avg / enc)
    return scale


def _field_analyzer(stats: dict, field: str) -> str:
    return stats.get("field_analyzers", {}).get(field, "standard")


def _avgdl(stats: dict, field: str) -> float:
    pf = stats.get("per_field", {})
    if field in pf:
        return float(pf[field]["avgdl"])
    return float(stats["avgdl"])


def _term_filters(by_field: dict[str, list[str]]):
    """Pushdown-friendly filter expression.

    (field==f AND (term==t1 OR term==t2 ...)) OR ... — equality OR-chains
    instead of ``isin``: pyarrow prunes parquet row groups for comparison
    expressions but NOT for set-lookup, which degrades to a full scan
    (measured 115ms vs 60ms per query on a 25-segment index).
    """
    import functools
    import operator

    import pyarrow.dataset as pads

    parts = []
    for f, ts in by_field.items():
        if not ts:
            continue
        terms_expr = functools.reduce(
            operator.or_, [pads.field("term") == t for t in ts])
        parts.append((pads.field("field") == f) & terms_expr)
    if not parts:
        return None
    return functools.reduce(operator.or_, parts)


def load_global_idf(index_dir: str,
                    by_field: dict[str, list[str]]) -> tuple[dict, dict, int]:
    """Global df per (field, term) from term_stats -> (idf map, df map,
    n_docs), both maps keyed (field, term)."""
    stats = _load_stats(index_dir)
    n_docs = int(stats["n_docs"])
    ts_dir = os.path.join(index_dir, "term_stats")
    idf: dict[tuple[str, str], float] = {}
    dfs: dict[tuple[str, str], int] = {}
    filters = _term_filters(by_field)
    if filters is not None and n_docs:
        files = [os.path.join(ts_dir, f) for f in sorted(os.listdir(ts_dir))
                 if f.endswith(".parquet")]
        if files:
            tbl = pq.read_table(files, filters=filters)
            for f, t, df in zip(tbl["field"].to_pylist(),
                                tbl["term"].to_pylist(),
                                tbl["df"].to_pylist()):
                idf[(f, t)] = float(codec.bm25_idf(int(df), n_docs))
                dfs[(f, t)] = int(df)
    return idf, dfs, n_docs


def _parse_boosted_fields(fields) -> tuple:
    """ES ``"name^boost"`` field syntax -> ((name, boost), ...)."""
    out = []
    for f in fields:
        name, _, bs = str(f).partition("^")
        out.append((name, float(bs) if bs else 1.0))
    return tuple(out)


def _in_sorted(sorted_ids: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Boolean membership mask of ``vals`` in an ascending-sorted array."""
    if len(sorted_ids) == 0 or len(vals) == 0:
        return np.zeros(len(vals), dtype=bool)
    pos = np.searchsorted(sorted_ids, vals)
    np.minimum(pos, len(sorted_ids) - 1, out=pos)
    return sorted_ids[pos] == vals


def _range_dl_field(rf: str) -> str:
    """Range-filter field name -> the indexed field whose per-doc token
    count backs it. ``word_count`` is the ES ``token_count`` sub-field the
    reference declares on the name field (search_scheme.json:171-174); it
    equals the default field's doc length under its analyzer."""
    return DEFAULT_FIELD if rf == "word_count" else rf


from functools import lru_cache as _lru


@_lru(maxsize=4096)
def _null_dv_ids_segment_impl(index_dir: str, seg_id: int, column: str,
                              _mtime_ns: int) -> np.ndarray:
    import pyarrow.parquet as _pq

    from .aggs import _dv_path

    t = _pq.read_table(_dv_path(index_dir, column, seg_id),
                       columns=["doc_id", column])
    nulls = t.filter(pc.is_null(t[column]))["doc_id"].to_numpy()
    return np.sort(nulls.astype(np.int64))


def _null_dv_ids_segment(index_dir: str, seg_id: int, column: str
                         ) -> np.ndarray:
    """Sorted GLOBAL doc ids with a null ``column`` doc-value in the
    segment — O(missing docs) memory, never O(segment). Cached per
    (segment shard file, mtime)."""
    from .aggs import _dv_path

    p = _dv_path(index_dir, column, seg_id)
    return _null_dv_ids_segment_impl(index_dir, int(seg_id), column,
                                     os.stat(p).st_mtime_ns)


_QS_RANGE_RE = re.compile(
    r"(\w+):\[\s*(\*|-?\d+(?:\.\d+)?)\s+TO\s+(\*|-?\d+(?:\.\d+)?)\s*\]")


def parse_query_string(q: str) -> dict:
    """Lucene-classic ``query_string``-lite parser -> ES ``bool`` body.

    Supported syntax (the flat subset; no parens/boosts/phrases):

    * bare terms — optional OR clauses (``should``, one clause per
      whitespace token, ``minimum_should_match=1`` like Lucene's
      default_operator=OR);
    * ``+term`` — required (``must``);
    * ``-term`` — prohibited (``must_not``);
    * ``word_count:[lo TO hi]`` — non-scoring range filter on the
      per-doc token count (either end ``*`` for open).

    The output feeds :func:`prepare_bool_spec` unchanged, so local and
    distributed serving and the DuckDB oracle all share one lowering.
    """
    must: list[str] = []
    should: list[str] = []
    must_not: list[str] = []
    filters: list[dict] = []

    def _range(m: re.Match) -> str:
        r: dict = {"field": m.group(1)}
        if m.group(2) != "*":
            r["gte"] = float(m.group(2))
        if m.group(3) != "*":
            r["lte"] = float(m.group(3))
        filters.append({"range": r})
        return " "

    rest = _QS_RANGE_RE.sub(_range, q)
    for tok in rest.split():
        if tok.startswith("+") and len(tok) > 1:
            must.append(tok[1:])
        elif tok.startswith("-") and len(tok) > 1:
            must_not.append(tok[1:])
        else:
            should.append(tok)
    bq: dict = {}
    if must:
        bq["must"] = must
    if should:
        bq["should"] = should
        # documented convention: bare terms are optional-OR, but at
        # least one must match unless required (+) clauses exist —
        # Lucene default_operator=OR. Range syntax lowers to REQUIRED
        # non-scoring filter context (ES bool filter), so a doc
        # matching only the range never matches the bare terms' clause.
        bq["minimum_should_match"] = 0 if must else 1
    if must_not:
        bq["must_not"] = must_not
    if filters:
        bq["filter"] = filters
    return bq


def prepare_bool_spec(bq: dict, field: str, analyzer: str) -> dict:
    """Normalize an ES ``bool`` query body into analyzed term lists.

    Clause semantics (ES bool query / Lucene BooleanQuery, coord-free):

    * ``must``: list of match-query strings; every clause must match (>=1
      of its analyzed terms present) and contributes its matching terms'
      BM25 sum to the score.
    * ``should``: optional match clauses; matching ones add to the score.
      At least ``minimum_should_match`` must match — ES default 1 when the
      query has no must/filter context, else 0.
    * ``must_not``: match clauses; a doc containing ANY of their terms is
      excluded. Never scored.
    * ``filter``: non-scoring required context. Supported shapes:
      ``{"term": {"field": f, "value": tok}}`` — raw (unanalyzed) token
      present in field ``f`` (defaults to the query field);
      ``{"terms": {"field": f, "values": [...]}}`` — ANY of the raw
      tokens present (the ES terms query); and
      ``{"range": {"field": "word_count", "gte": x, "lte": y}}`` — per-doc
      token count bounds (both ends optional); and
      ``{"exists": {"field": f}}`` — the doc must have a non-null value
      for doc-value column ``f`` (ES exists query; resolved against the
      column's doc-values shards, null ids only, so the filter costs
      O(missing docs), not O(corpus)).

    The returned spec carries per-clause term lists (``query_terms``
    order: deduped, sorted — fixes float accumulation order) plus a
    ``load`` map of every (field -> terms) the index must fetch, so both
    serving paths read postings once and score identically."""
    must = [query_terms(s, analyzer) for s in bq.get("must", ())]
    should = [query_terms(s, analyzer) for s in bq.get("should", ())]
    must_not = [query_terms(s, analyzer) for s in bq.get("must_not", ())]
    filter_terms: list[tuple[str, str]] = []
    range_dl: list[tuple[str, float, float]] = []
    filter_any: list[tuple[str, list[str]]] = []
    exists: list[str] = []
    for flt in bq.get("filter", ()):
        if "term" in flt:
            f = flt["term"].get("field", field)
            filter_terms.append((f, str(flt["term"]["value"])))
        elif "terms" in flt:
            # ES terms query: the doc must contain ANY of the raw tokens
            f = flt["terms"].get("field", field)
            filter_any.append((f, sorted({str(v) for v in
                                          flt["terms"]["values"]})))
        elif "range" in flt:
            r = dict(flt["range"])
            range_dl.append((str(r.get("field", "word_count")),
                             float(r.get("gte", float("-inf"))),
                             float(r.get("lte", float("inf")))))
        elif "exists" in flt:
            exists.append(str(flt["exists"]["field"]))
        else:
            raise ValueError(f"unsupported bool filter clause {flt!r}")
    # terms_set analogue: per-doc dynamic minimum_should_match (ES
    # minimum_should_match_script ``min(params.num_terms,
    # max(1, doc[source].value / divisor))``) — `should` clauses are the
    # term set, `source` a token_count-backed doc-value (word_count).
    msm_div = bq.get("minimum_should_match_divisor")
    msm_src = str(bq.get("minimum_should_match_source", "word_count"))
    msm = bq.get("minimum_should_match")
    if msm is None:
        msm = 0 if (must or filter_terms or filter_any or range_dl
                    or exists or msm_div) else 1
    load: dict[str, list[str]] = {
        field: sorted({t for cl in (*must, *should, *must_not) for t in cl})}
    for f, t in filter_terms:
        load.setdefault(f, []).append(t)
    for f, vs in filter_any:
        load.setdefault(f, []).extend(vs)
    load = {f: sorted(set(ts)) for f, ts in load.items() if ts}
    return {"field": field, "must": must, "should": should,
            "must_not": must_not, "filter_terms": filter_terms,
            "filter_any": filter_any, "exists": exists,
            "range_dl": range_dl, "msm": int(msm), "load": load,
            "msm_div": int(msm_div) if msm_div else 0, "msm_src": msm_src}


def _bool_clause_ids(clause_terms, runs_of) -> np.ndarray:
    """Sorted unique doc ids matching any of a clause's terms, given a
    ``term -> [(ids, tfs), ...]`` runs lookup."""
    runs = [ids for t in clause_terms for ids, _tfs in runs_of(t)]
    if not runs:
        return np.empty(0, np.int64)
    if len(runs) == 1:
        return runs[0]
    return np.unique(np.concatenate(runs))


def _auto_fuzziness(term: str) -> int:
    """ES ``AUTO`` fuzziness: 0 for terms under 3 chars, 1 for 3-5, 2
    for longer."""
    n = len(term)
    return 0 if n < 3 else (1 if n <= 5 else 2)


def _flat_bytes(terms: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """String array -> (N x maxlen uint8 matrix zero-padded, byte lengths),
    built from the Arrow buffers — no per-row Python."""
    a = terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms
    if not pa.types.is_large_string(a.type) and not pa.types.is_large_binary(a.type):
        a = pc.cast(a, pa.large_binary())
    elif pa.types.is_large_string(a.type):
        a = pc.cast(a, pa.large_binary())
    n = len(a)
    off = np.frombuffer(a.buffers()[1], np.int64)[a.offset:a.offset + n + 1]
    data = np.frombuffer(a.buffers()[2], np.uint8)
    lens = np.diff(off)
    if n == 0:
        return np.zeros((0, 1), np.uint8), lens
    L = max(int(lens.max()), 1)
    col = np.arange(L)
    mask = col < lens[:, None]
    src = off[:-1, None] + col
    mat = np.zeros((n, L), np.uint8)
    mat[mask] = data[src[mask]]
    return mat, lens


def levenshtein_vec(query: str, terms: pa.Array) -> np.ndarray:
    """Classic Levenshtein distance from ``query`` to every candidate
    term, vectorized across candidates: DP rows over the query's bytes;
    the within-row insertion recurrence is resolved closed-form with a
    prefix-min (``cur[j] = j + min_{l<=j}(t[l] - l)``), so each query
    char is O(1) numpy passes over the candidate matrix. Byte-domain
    (utf-8) — identical to character distance for ASCII terms (the
    DuckDB ``levenshtein`` oracle is character-based)."""
    mat, lens = _flat_bytes(terms)
    n, L = mat.shape
    if n == 0:
        return np.empty(0, np.int32)
    q = np.frombuffer(query.encode(), np.uint8)
    jr = np.arange(L + 1, dtype=np.int32)
    prev = np.tile(jr, (n, 1))
    for i, qc in enumerate(q, 1):
        t = np.minimum(prev[:, 1:] + 1,
                       prev[:, :-1] + (mat != qc).astype(np.int32))
        u = np.concatenate(
            [np.full((n, 1), i, np.int32), t], axis=1)
        u -= jr
        np.minimum.accumulate(u, axis=1, out=u)
        prev = u + jr
    return prev[np.arange(n), lens]


def _prefix_upper(p: str) -> str | None:
    """Smallest string greater than every string with prefix ``p``."""
    b = bytearray(p.encode())
    while b:
        if b[-1] < 0xFF:
            b[-1] += 1
            return bytes(b).decode("utf-8", "surrogateescape")
        b.pop()
    return None


def _read_term_dict(index_dir: str, field: str,
                    prefix: str = "") -> pa.Table:
    """(term, df) rows of the global term dictionary for ``field``,
    optionally restricted to a literal prefix. The prefix becomes a
    closed range filter (``p <= term < next(p)``) — pyarrow prunes
    term_stats row groups on the comparison, so a prefixed expansion
    reads only the dictionary slice it needs."""
    import pyarrow.dataset as pads

    flt = pads.field("field") == field
    if prefix:
        flt = flt & (pads.field("term") >= prefix)
        hi = _prefix_upper(prefix)
        if hi is not None:
            flt = flt & (pads.field("term") < hi)
    ts_dir = os.path.join(index_dir, "term_stats")
    files = [os.path.join(ts_dir, f) for f in sorted(os.listdir(ts_dir))
             if f.endswith(".parquet")]
    if not files:
        return pa.table({"term": pa.array([], pa.string()),
                         "df": pa.array([], pa.int64())})
    return pq.read_table(files, columns=["term", "df"], filters=flt)


def _fuzzy_candidates(index_dir: str, field: str, q: str,
                      max_dist: int, prefix_length: int,
                      ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Dictionary terms within classic Levenshtein ``max_dist`` of ``q``
    sharing its first ``prefix_length`` chars — the candidate step shared
    by fuzzy expansion and the term suggester. Returns (terms, dfs,
    distances); the prefix prunes the dictionary read and a byte-length
    prefilter skips the Levenshtein for hopeless rows. Distances are
    byte-domain (like levenshtein_vec — see its docstring caveat)."""
    empty = (np.empty(0, object), np.empty(0, np.int64),
             np.empty(0, np.int64))
    tbl = _read_term_dict(index_dir, field, q[:prefix_length])
    if tbl.num_rows == 0:
        return empty
    lens = pc.binary_length(tbl["term"]).to_numpy()
    near = np.abs(lens - len(q.encode())) <= max_dist
    tbl = tbl.filter(pa.array(near))
    if tbl.num_rows == 0:
        return empty
    d = levenshtein_vec(q, tbl["term"])
    ok = d <= max_dist
    if not ok.any():
        return empty
    sel = tbl.filter(pa.array(ok))
    return (np.array(sel["term"].to_pylist(), dtype=object),
            sel["df"].to_numpy(), d[ok])


def expand_fuzzy(index_dir: str, field: str, qterm: str,
                 fuzziness="AUTO", prefix_length: int = 1,
                 max_expansions: int = 50) -> list[str]:
    """ES fuzzy term expansion over the global term dictionary: terms
    sharing the first ``prefix_length`` chars within Levenshtein distance
    ``fuzziness`` (``"AUTO"`` = ES length-scaled), ranked by (df desc,
    term asc) and capped at ``max_expansions`` — the Lucene
    top-terms-by-frequency rewrite. Transpositions count 2 (classic
    distance, matching the DuckDB oracle), unlike ES's default
    Damerau variant. ``prefix_length`` defaults to 1 (ES default is 0)
    so the dictionary read prunes to one prefix slice; pass 0 for the
    full-vocabulary scan."""
    f = (_auto_fuzziness(qterm)
         if str(fuzziness).upper() == "AUTO" else int(fuzziness))
    if f == 0:
        tbl = _read_term_dict(index_dir, field, qterm[:prefix_length])
        if tbl.num_rows == 0:
            return []
        m = pc.equal(tbl["term"], qterm)
        return tbl.filter(m)["term"].to_pylist()
    terms, dfs, _d = _fuzzy_candidates(index_dir, field, qterm, f,
                                       prefix_length)
    order = np.lexsort((terms, -dfs))[:max_expansions]
    return terms[order].tolist()


def expand_wildcard(index_dir: str, field: str, pattern: str) -> list[str]:
    """ES wildcard-query term expansion: dictionary terms matching the
    pattern (``*`` = any run, ``?`` = one char), sorted. The literal
    prefix before the first wildcard prunes the dictionary read; the
    match itself is one vectorized ``match_like`` kernel. Literal ``%``
    and ``_`` in the pattern are escaped before the LIKE translation."""
    cut = len(pattern)
    for ch in "*?":
        if (i := pattern.find(ch)) != -1:
            cut = min(cut, i)
    tbl = _read_term_dict(index_dir, field, pattern[:cut])
    if tbl.num_rows == 0:
        return []
    like = (pattern.replace("\\", "\\\\").replace("%", "\\%")
            .replace("_", "\\_").replace("*", "%").replace("?", "_"))
    m = pc.match_like(tbl["term"], like)
    return sorted(tbl.filter(m)["term"].to_pylist())


def expand_regexp(index_dir: str, field: str, pattern: str) -> list[str]:
    """ES regexp-query term expansion: dictionary terms whose ENTIRE text
    matches the pattern (Lucene anchors regexp queries implicitly),
    sorted. Any literal prefix of the pattern prunes the dictionary
    read; the match is one vectorized RE2 kernel — the same engine the
    DuckDB oracle uses, so expansion semantics are bit-identical."""
    # longest literal prefix: stop at the first regex metacharacter
    cut = len(pattern)
    for i, ch in enumerate(pattern):
        if ch in ".?*+()[]{}|^$\\":
            cut = i
            break
    tbl = _read_term_dict(index_dir, field, pattern[:cut])
    if tbl.num_rows == 0:
        return []
    m = pc.match_substring_regex(tbl["term"], f"^(?:{pattern})$")
    return sorted(tbl.filter(m)["term"].to_pylist())


def suggest_completions(index_dir: str, prefixes: list[str],
                        field: str = DEFAULT_FIELD,
                        size: int = 5) -> pa.Table:
    """ES completion suggester (search-as-you-type): for each prefix,
    the top dictionary terms carrying it, ranked by weight — here the
    term's document frequency, ES's default when no explicit weights
    are indexed — then term-ascending. Each prefix reads only its
    closed dictionary range (row-group-pruned), so cost tracks the
    prefix's vocabulary slice, not the corpus. Returns
    (prefix, suggestion, weight) rows."""
    out_p, out_s, out_w = [], [], []
    for p in prefixes:
        p = p.lower()
        tbl = _read_term_dict(index_dir, field, p)
        if tbl.num_rows == 0:
            continue
        # duplicate (term) rows across generations sum their dfs
        agg = tbl.group_by("term").aggregate([("df", "sum")])
        terms = np.asarray(agg["term"].to_pylist())
        dfs = agg["df_sum"].to_numpy()
        order = np.lexsort((terms, -dfs))[:size]
        out_p.extend([p] * len(order))
        out_s.extend(terms[order].tolist())
        out_w.extend(dfs[order].tolist())
    return pa.table({
        "prefix": pa.array(out_p, pa.string()),
        "suggestion": pa.array(out_s, pa.string()),
        "weight": pa.array(out_w, pa.int64()),
    })


def suggest_terms(index_dir: str, inputs: list[str],
                  field: str = DEFAULT_FIELD, max_edits: int = 2,
                  prefix_length: int = 1, size: int = 5) -> pa.Table:
    """ES term suggester (did-you-mean): for each input token, dictionary
    terms within ``max_edits`` classic Levenshtein (transpositions count
    2, matching the DuckDB oracle) sharing the first ``prefix_length``
    chars, ranked (distance asc, df desc, term asc), top ``size``.
    Distance-0 hits are excluded (the input itself needs no suggestion).
    Each input reads only its prefix's dictionary slice."""
    out_i, out_s, out_d, out_f = [], [], [], []
    for q in inputs:
        q = q.lower()
        terms, dfs, dd = _fuzzy_candidates(index_dir, field, q,
                                           max_edits, prefix_length)
        keep = dd >= 1  # the input itself needs no suggestion
        terms, dfs, dd = terms[keep], dfs[keep], dd[keep]
        if len(terms) == 0:
            continue
        order = np.lexsort((terms, -dfs, dd))[:size]
        out_i.extend([q] * len(order))
        out_s.extend(terms[order].tolist())
        out_d.extend(dd[order].tolist())
        out_f.extend(dfs[order].tolist())
    return pa.table({
        "input": pa.array(out_i, pa.string()),
        "suggestion": pa.array(out_s, pa.string()),
        "distance": pa.array(out_d, pa.int64()),
        "df": pa.array(out_f, pa.int64()),
    })


def suggest_phrase(index_dir: str, text: str,
                   field: str = DEFAULT_FIELD, max_edits: int = 2,
                   prefix_length: int = 1) -> pa.Table:
    """ES phrase suggester (documented simplification: unigram-df LM in
    place of ES's bigram stupid-backoff — per-doc positions exist but
    corpus bigram counts are not materialized). Per analyzed token the
    candidate set is the dictionary slice within ``max_edits`` classic
    Levenshtein sharing the first ``prefix_length`` chars, INCLUDING the
    token itself at distance 0 (a correctly-spelled token keeps itself:
    distance-ascending rank puts d=0 first); each slot's winner is
    ranked (distance asc, df desc, term asc), and the whole-phrase
    suggestion is the per-slot winners joined in order. A slot with no
    candidates keeps its input token (distance -1, df 0). Returns one
    row per slot plus the assembled ``phrase`` on every row."""
    from ..functions.analyzers import analyze

    stats = _load_stats(index_dir)
    tokens = list(analyze(_field_analyzer(stats, field), text))
    out = {"slot": [], "input_token": [], "suggestion": [],
           "distance": [], "df": []}
    chosen = []
    for slot, tok in enumerate(tokens):
        terms, dfs, dd = _fuzzy_candidates(index_dir, field, tok,
                                           max_edits, prefix_length)
        if len(terms) == 0:
            pick, dist, dfv = tok, -1, 0
        else:
            b = np.lexsort((terms, -dfs, dd))[0]
            pick, dist, dfv = str(terms[b]), int(dd[b]), int(dfs[b])
        chosen.append(pick)
        out["slot"].append(slot)
        out["input_token"].append(tok)
        out["suggestion"].append(pick)
        out["distance"].append(dist)
        out["df"].append(dfv)
    phrase = " ".join(chosen)
    return pa.table({
        "slot": pa.array(out["slot"], pa.int64()),
        "input_token": pa.array(out["input_token"], pa.string()),
        "suggestion": pa.array(out["suggestion"], pa.string()),
        "distance": pa.array(out["distance"], pa.int64()),
        "df": pa.array(out["df"], pa.int64()),
        "phrase": pa.array([phrase] * len(chosen), pa.string()),
    })


def expand_prefix(index_dir: str, field: str, prefix: str,
                  max_expansions: int = 50) -> list[str]:
    """ES prefix / match_phrase_prefix term expansion: dictionary terms
    with the literal prefix, in term order, capped at ``max_expansions``
    (Lucene collects prefix terms in term order and stops at the cap).
    The prefix prunes the dictionary read to one closed range."""
    tbl = _read_term_dict(index_dir, field, prefix)
    return sorted(set(tbl["term"].to_pylist()))[:max_expansions]


def _prepare(queries, stats: dict) -> list[tuple[int, str, list[str], int, str]]:
    qrows = queries.to_pylist() if isinstance(queries, pa.Table) else list(queries)
    out = []
    for q in qrows:
        if q.get("bool") is not None:  # ES bool query body (dict or JSON)
            bq = q["bool"]
            if isinstance(bq, str):
                import json as _json
                bq = _json.loads(bq)
            field = q.get("field") or DEFAULT_FIELD
            spec = prepare_bool_spec(bq, field, _field_analyzer(stats, field))
            out.append((int(q["query_id"]), field, spec,
                        int(q.get("k", 10)), "bool"))
            continue
        if q.get("fields"):  # multi_match: per-field analyzed term lists
            fields = _parse_boosted_fields(q["fields"])
            combine = q.get("multi_type", "most_fields")
            if combine not in ("most_fields", "best_fields"):
                raise ValueError(f"unknown multi_type {combine!r}")
            terms_by_field = {
                f: query_terms(q["query"], _field_analyzer(stats, f))
                for f, _b in fields}
            out.append((int(q["query_id"]), fields, terms_by_field,
                        int(q.get("k", 10)), f"multi:{combine}"))
            continue
        field = q.get("field") or DEFAULT_FIELD
        mode = q.get("mode", "or")
        if mode == "fuzzy":
            # expansion happens against the index term dictionary in
            # search()/LocalSearcher — params ride along in the mode tag
            terms = query_terms(q["query"], _field_analyzer(stats, field))
            tag = (f"fuzzy:{q.get('fuzziness', 'AUTO')}"
                   f":{int(q.get('prefix_length', 1))}"
                   f":{int(q.get('max_expansions', 50))}")
            out.append((int(q["query_id"]), field, terms,
                        int(q.get("k", 10)), tag))
            continue
        if mode in ("wildcard", "regexp"):
            # raw pattern, never analyzed (ES wildcard/regexp contract)
            out.append((int(q["query_id"]), field, [str(q["query"])],
                        int(q.get("k", 10)), mode))
            continue
        if mode == "function_score":
            terms = query_terms(q["query"], _field_analyzer(stats, field))
            out.append((int(q["query_id"]), field, terms,
                        int(q.get("k", 10)),
                        f"fscore:{q.get('modifier', 'log1p')}"))
            continue
        if mode == "boosting":
            an = _field_analyzer(stats, field)
            out.append((int(q["query_id"]), field,
                        {"pos": query_terms(q["query"], an),
                         "neg": query_terms(q.get("negative", ""), an)},
                        int(q.get("k", 10)),
                        f"boosting:{float(q.get('negative_boost', 0.5))!r}"))
            continue
        if mode == "phrase":
            # ordered token sequence, duplicates kept (position matching)
            terms = list(analyze(_field_analyzer(stats, field), q["query"]))
        else:
            terms = query_terms(q["query"], _field_analyzer(stats, field))
        out.append((int(q["query_id"]), field, terms, int(q.get("k", 10)),
                    mode))
    return out


class SegmentSearcher:
    """Actor: scores segment batches against the broadcast query set."""

    def __init__(self, index_dir: str, prepared_ref, idf_ref,
                 avgdl_by_field: dict[str, float], use_maxscore: bool):
        def deref(x):
            return ray.get(x) if isinstance(x, ray.ObjectRef) else x

        self.index_dir = index_dir
        self.queries = deref(prepared_ref)  # [(qid, field, [terms], k, mode)]
        self.idf = deref(idf_ref)           # {(field, term): idf}
        self.avgdl = avgdl_by_field
        self.use_maxscore = use_maxscore
        stats = _load_stats(index_dir)
        self._deleted = _load_deleted(index_dir, stats)
        self._bscale = _bound_scale(
            _visible_seg_ids(index_dir, stats)[1], stats)
        self.by_field: dict[str, list[str]] = {}
        self._extra_dl: set[str] = set()
        self._rangeonly_bool = False
        for _qid, field, terms, _k, _m in self.queries:
            if _m == "bool":
                # bool specs load every clause term (filter/must_not terms
                # included — they gate matching even without an idf entry)
                for f, ts in terms["load"].items():
                    self.by_field.setdefault(f, []).extend(ts)
                for rf, _lo, _hi in terms["range_dl"]:
                    self._extra_dl.add(_range_dl_field(rf))
                if terms.get("msm_div"):
                    self._extra_dl.add(_range_dl_field(terms["msm_src"]))
                if not terms["load"]:
                    self._rangeonly_bool = True
                continue
            if isinstance(_m, str) and _m.startswith("boosting:"):
                got = self.by_field.setdefault(field, [])
                got.extend(t for t in terms["pos"]
                           if (field, t) in self.idf)
                # negative terms gate demotion; no idf entry needed
                got.extend(terms["neg"])
                continue
            items = (terms.items() if isinstance(terms, dict)
                     else [(field, terms)])
            for f, ts in items:
                got = self.by_field.setdefault(f, [])
                got.extend(t for t in ts if (f, t) in self.idf)
        # drop fields with no surviving terms: their doc_len_<field> column
        # may not exist and they contribute nothing
        self.by_field = {f: sorted(set(ts))
                         for f, ts in self.by_field.items() if ts}

    def _load_segment(self, seg_id: int):
        filters = _term_filters(self.by_field)
        if filters is None:
            if not self._rangeonly_bool:
                return None
            # a term-less (range-filter-only) bool query still needs the
            # segment's doc range + doc lengths
            docs = pq.read_table(
                seg_docs_path(self.index_dir, seg_id),
                columns=["doc_id", *sorted({_dl_column(f)
                                            for f in self._extra_dl})])
            if docs.num_rows == 0:
                return None
            base = int(docs["doc_id"][0].as_py())
            dl = {f: docs[_dl_column(f)].to_numpy().astype(np.float64)
                  for f in self._extra_dl}
            return base, docs.num_rows, dl, {}, {}
        path = seg_terms_path(self.index_dir, seg_id)
        need_positions = any(m == "phrase" for *_rest, m in self.queries)
        schema = pq.read_schema(path)
        if blobs.has_sidecar(schema):
            cols = ["field", "term", "df", "max_impact", "segment_id",
                    *blobs.RANGE_COLUMNS]
            if "pos_nbytes" not in schema.names:
                cols.remove("pos_nbytes")
            tt = pq.read_table(path, columns=cols, filters=filters)
            tt = blobs.materialize_enc(tt, lambda _s: path,
                                       want_positions=need_positions)
        else:
            cols = ["field", "term", "df", "doc_ids_enc", "tfs_enc",
                    "max_impact"]
            if need_positions:
                cols.append("positions_enc")
            tt = pq.read_table(path, columns=cols, filters=filters)
        dl_fields = set(self.by_field) | self._extra_dl
        dl_cols = sorted({_dl_column(f) for f in dl_fields})
        docs = pq.read_table(seg_docs_path(self.index_dir, seg_id),
                             columns=["doc_id", *dl_cols])
        if docs.num_rows == 0:
            return None
        base = int(docs["doc_id"][0].as_py())
        dl = {f: docs[_dl_column(f)].to_numpy().astype(np.float64)
              for f in dl_fields}
        postings: dict[tuple[str, str], tuple] = {}
        positions: dict[tuple[str, str], dict[int, np.ndarray]] = {}
        for i in range(tt.num_rows):
            key = (tt["field"][i].as_py(), tt["term"][i].as_py())
            ids, tfs = codec.decode_postings(
                tt["doc_ids_enc"][i].as_py(), tt["tfs_enc"][i].as_py(),
                int(tt["df"][i].as_py()),
            )
            postings[key] = (ids, tfs, float(tt["max_impact"][i].as_py()))
            if need_positions:
                enc_pos = tt["positions_enc"][i].as_py()
                if enc_pos is not None:
                    positions[key] = _positions_by_doc(ids, tfs, enc_pos)
        return base, docs.num_rows, dl, postings, positions

    def _score_conjunctive(self, field: str, terms: list[str], k: int,
                           base: int, dl: np.ndarray,
                           postings: dict) -> tuple[np.ndarray, np.ndarray]:
        """AND semantics (ES bool-must analogue): docs containing ALL query
        terms, BM25-scored; a term absent from the index matches nothing.
        Segments hold disjoint doc ranges, so per-segment intersection is
        exact."""
        keys = [(field, t) for t in terms]
        if not keys or any(kk not in self.idf for kk in keys):
            return np.empty(0, np.int64), np.empty(0, np.float64)
        if any(kk not in postings for kk in keys):
            return np.empty(0, np.int64), np.empty(0, np.float64)
        avgdl = self.avgdl[field]
        cand = postings[keys[0]][0]
        for kk in keys[1:]:
            cand = np.intersect1d(cand, postings[kk][0], assume_unique=True)
            if len(cand) == 0:
                return np.empty(0, np.int64), np.empty(0, np.float64)
        if len(self._deleted):
            cand = cand[_drop_deleted(self._deleted, cand)]
            if len(cand) == 0:
                return np.empty(0, np.int64), np.empty(0, np.float64)
        loc = cand - base
        scores = np.zeros(len(cand), dtype=np.float64)
        for kk in keys:  # lexicographic order (query_terms sorts)
            ids, tfs, _ = postings[kk]
            pos = np.searchsorted(ids, cand)
            scores += self.idf[kk] * codec.bm25_tf_impact(
                tfs[pos], dl[loc], avgdl)
        if len(cand) > k:
            kth = np.partition(scores, -k)[-k]
            keep = scores >= kth
            cand, scores = cand[keep], scores[keep]
        order = np.lexsort((cand, -scores))[:k]
        return cand[order].astype(np.int64), scores[order]

    def _score_phrase(self, field: str, seq: list[str], k: int, base: int,
                      dl: np.ndarray, postings: dict,
                      positions: dict) -> tuple[np.ndarray, np.ndarray]:
        """Phrase semantics per segment (doc ranges disjoint -> exact).
        Same scoring convention as PhraseSearcher: docs where the token
        sequence occurs, sum(idf of unique terms) * impact(phrase_freq)."""
        uniq = sorted(set(seq))
        keys = [(field, t) for t in uniq]
        if (not keys or any(kk not in self.idf for kk in keys)
                or any(kk not in postings for kk in keys)
                or any(kk not in positions for kk in keys)):
            return np.empty(0, np.int64), np.empty(0, np.float64)
        cand = postings[keys[0]][0]
        for kk in keys[1:]:
            cand = np.intersect1d(cand, postings[kk][0], assume_unique=True)
            if len(cand) == 0:
                return np.empty(0, np.int64), np.empty(0, np.float64)
        if len(self._deleted):
            cand = cand[_drop_deleted(self._deleted, cand)]
        idf_sum = float(sum(self.idf[(field, t)] for t in uniq))
        avgdl = self.avgdl[field]
        hits, freqs = [], []
        for d in cand:
            fq = _phrase_freq([positions[(field, t)][int(d)] for t in seq])
            if fq > 0:
                hits.append(int(d))
                freqs.append(fq)
        if not hits:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        hits_a = np.array(hits, dtype=np.int64)
        scores = idf_sum * codec.bm25_tf_impact(
            np.array(freqs, dtype=np.float64), dl[hits_a - base], avgdl)
        order = np.lexsort((hits_a, -scores))[:k]
        return hits_a[order], scores[order]

    def _score_query(self, field: str, terms: list[str], k: int, base: int,
                     n: int, dl: np.ndarray,
                     postings: dict) -> tuple[np.ndarray, np.ndarray]:
        keys = [(field, t) for t in terms]
        keys = [kk for kk in keys if kk in postings and kk in self.idf]
        if not keys:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        avgdl = self.avgdl[field]
        scores = np.zeros(n, dtype=np.float64)
        touched = np.zeros(n, dtype=bool)
        if not self.use_maxscore:
            for kk in keys:  # lexicographic order fixed by query_terms()
                ids, tfs, _ = postings[kk]
                loc = ids - base
                scores[loc] += self.idf[kk] * codec.bm25_tf_impact(
                    tfs, dl[loc], avgdl)
                touched[loc] = True
        else:
            ubs = [(self.idf[kk] * postings[kk][2] * self._bscale, kk)
                   for kk in keys]
            ubs.sort(reverse=True)
            remaining = sum(u for u, _ in ubs)
            theta = -np.inf
            for u, kk in ubs:
                ids, tfs, _ = postings[kk]
                loc = ids - base
                if remaining < theta:
                    keep = touched[loc]
                    loc, tfs = loc[keep], tfs[keep]
                    if len(loc) == 0:
                        remaining -= u
                        continue
                scores[loc] += self.idf[kk] * codec.bm25_tf_impact(
                    tfs, dl[loc], avgdl)
                touched[loc] = True
                remaining -= u
                # theta over NON-deleted docs only: a tombstoned doc in the
                # top-k would inflate the bar and over-prune legit docs
                loc_t = np.flatnonzero(touched)
                if len(self._deleted):
                    loc_t = loc_t[_drop_deleted(self._deleted, loc_t + base)]
                cand = scores[loc_t]
                if len(cand) > k:
                    theta = np.partition(cand, -k)[-k]
        loc = np.flatnonzero(touched)
        sc = scores[loc]
        if len(self._deleted):
            keepd = _drop_deleted(self._deleted, loc + base)
            loc, sc = loc[keepd], sc[keepd]
        if len(loc) > k:
            kth = np.partition(sc, -k)[-k]
            keep = sc >= kth  # keep ALL ties at the k-th score for tie-break
            loc, sc = loc[keep], sc[keep]
        order = np.lexsort((loc, -sc))[:k]
        return (loc[order] + base).astype(np.int64), sc[order]

    def _score_multi(self, fields: tuple, terms_by_field: dict, k: int,
                     combine: str, base: int, n: int,
                     dl_by_field: dict[str, np.ndarray],
                     postings: dict) -> tuple[np.ndarray, np.ndarray]:
        """multi_match semantics per segment (ES multi_match analogue).

        ``most_fields``: combined score = SUM over fields of that field's
        (boost x) BM25 score (its own analyzer terms, df, dl and avgdl;
        idf over the global doc count — the engine's single-field
        convention). ``best_fields``: MAX over boosted field scores (ES
        dis_max with tie_breaker=0). ``fields`` is ((name, boost), ...)
        from the ES ``"name^boost"`` syntax. Accumulation is (field,
        term)-major over ascending doc ids — the same per-doc addition
        order as LocalSearcher.search_multi, so both paths are
        bitwise-identical."""
        scores = np.zeros(n, dtype=np.float64)
        touched = np.zeros(n, dtype=bool)
        plain_sum = (combine == "most_fields"
                     and all(b == 1.0 for _f, b in fields))
        fsc = scores if plain_sum else np.zeros(n)
        for field, boost in fields:
            if field not in self.by_field or field not in self.avgdl:
                continue
            dlf = dl_by_field.get(field)
            if dlf is None:
                continue
            avgdl = self.avgdl[field]
            if not plain_sum:
                fsc[:] = 0.0
            for t in terms_by_field.get(field, ()):
                kk = (field, t)
                if kk not in postings or kk not in self.idf:
                    continue
                ids, tfs, _mi = postings[kk]
                loc = ids - base
                fsc[loc] += self.idf[kk] * codec.bm25_tf_impact(
                    tfs, dlf[loc], avgdl)
                touched[loc] = True
            if not plain_sum:
                if combine == "best_fields":
                    np.maximum(scores, boost * fsc, out=scores)
                else:
                    scores += boost * fsc
        loc = np.flatnonzero(touched)
        sc = scores[loc]
        if len(self._deleted):
            keepd = _drop_deleted(self._deleted, loc + base)
            loc, sc = loc[keepd], sc[keepd]
        if len(loc) > k:
            kth = np.partition(sc, -k)[-k]
            keep = sc >= kth
            loc, sc = loc[keep], sc[keep]
        order = np.lexsort((loc, -sc))[:k]
        return (loc[order] + base).astype(np.int64), sc[order]

    def _score_bool(self, spec: dict, k: int, base: int, n: int,
                    dl_by_field: dict[str, np.ndarray],
                    postings: dict, seg_id: int = -1
                    ) -> tuple[np.ndarray, np.ndarray]:
        """ES bool query per segment (see ``prepare_bool_spec`` for the
        clause semantics). Segments hold disjoint doc ranges and every
        posting of a doc lives in its segment, so must/filter/must_not
        resolution within the segment is globally exact. Accumulation is
        clause-major, term order as analyzed — the same per-doc addition
        order as ``LocalSearcher.search_bool`` (bitwise-identical)."""
        field = spec["field"]
        empty = (np.empty(0, np.int64), np.empty(0, np.float64))

        def runs_of(f):
            return lambda t: ([postings[(f, t)][:2]]
                              if (f, t) in postings else [])

        score_runs = runs_of(field)
        # candidate doc ids (absolute)
        if spec["must"]:
            cand = None
            for cl in spec["must"]:
                ids = _bool_clause_ids(cl, score_runs)
                cand = ids if cand is None else np.intersect1d(
                    cand, ids, assume_unique=True)
                if len(cand) == 0:
                    return empty
        elif spec["should"]:
            cand = _bool_clause_ids(
                [t for cl in spec["should"] for t in cl], score_runs)
        elif spec["filter_terms"] or spec.get("filter_any"):
            cand = None
        else:  # range-only: every doc in the segment
            cand = np.arange(base, base + n, dtype=np.int64)
        for f, t in spec["filter_terms"]:
            ids = _bool_clause_ids([t], runs_of(f))
            cand = ids if cand is None else np.intersect1d(
                cand, ids, assume_unique=True)
            if len(cand) == 0:
                return empty
        for f, vs in spec.get("filter_any", ()):
            ids = _bool_clause_ids(vs, runs_of(f))
            cand = ids if cand is None else np.intersect1d(
                cand, ids, assume_unique=True)
            if len(cand) == 0:
                return empty
        if cand is None or len(cand) == 0:
            return empty
        for rf, lo, hi in spec["range_dl"]:
            dlf = dl_by_field.get(_range_dl_field(rf))
            if dlf is None:
                return empty
            v = dlf[cand - base]
            cand = cand[(v >= lo) & (v <= hi)]
            if len(cand) == 0:
                return empty
        for col in spec.get("exists", ()):
            nulls = _null_dv_ids_segment(self.index_dir, seg_id, col)
            if len(nulls):
                cand = cand[_drop_deleted(nulls, cand)]
                if len(cand) == 0:
                    return empty
        for cl in spec["must_not"]:
            nids = _bool_clause_ids(cl, score_runs)
            if len(nids):
                cand = cand[~_in_sorted(nids, cand)]
                if len(cand) == 0:
                    return empty
        if spec["msm"] > 0 and spec["should"]:
            cnt = np.zeros(len(cand), np.int64)
            for cl in spec["should"]:
                cnt += _in_sorted(_bool_clause_ids(cl, score_runs), cand)
            cand = cand[cnt >= spec["msm"]]
            if len(cand) == 0:
                return empty
        if spec.get("msm_div") and spec["should"]:
            # terms_set: required(doc) = min(n_clauses,
            # max(1, floor(dl_src / divisor))) — per-doc dynamic msm
            cnt = np.zeros(len(cand), np.int64)
            for cl in spec["should"]:
                cnt += _in_sorted(_bool_clause_ids(cl, score_runs), cand)
            src = dl_by_field[_range_dl_field(spec["msm_src"])]
            req = np.minimum(
                len(spec["should"]),
                np.maximum(1, src[cand - base].astype(np.int64)
                           // spec["msm_div"]))
            cand = cand[cnt >= req]
            if len(cand) == 0:
                return empty
        if len(self._deleted):
            cand = cand[_drop_deleted(self._deleted, cand)]
            if len(cand) == 0:
                return empty
        scores = np.zeros(len(cand), dtype=np.float64)
        dlf = dl_by_field.get(field)
        avgdl = self.avgdl.get(field)
        for cl in (*spec["must"], *spec["should"]):
            for t in cl:
                kk = (field, t)
                if kk not in postings or kk not in self.idf:
                    continue
                ids, tfs, _mi = postings[kk]
                hit = _in_sorted(ids, cand)
                pos = np.searchsorted(ids, cand[hit])
                scores[hit] += self.idf[kk] * codec.bm25_tf_impact(
                    tfs[pos], dlf[cand[hit] - base], avgdl)
        if len(cand) > k:
            kth = np.partition(scores, -k)[-k]
            keep = scores >= kth
            cand, scores = cand[keep], scores[keep]
        order = np.lexsort((cand, -scores))[:k]
        return cand[order].astype(np.int64), scores[order]

    def _score_function(self, field: str, terms: list[str], k: int,
                        base: int, n: int, dl: np.ndarray,
                        postings: dict, modifier: str
                        ) -> tuple[np.ndarray, np.ndarray]:
        """function_score per segment: exhaustive OR accumulation
        (the multiplicative factor breaks MaxScore bound admissibility),
        modifier applied BEFORE the per-segment top-k cut — valid because
        a doc's postings live entirely in its segment. Bitwise-identical
        to ``LocalSearcher.search_function_score`` (same accumulation
        order, same elementwise modifier)."""
        keys = [(field, t) for t in terms
                if (field, t) in postings and (field, t) in self.idf]
        if not keys:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        avgdl = self.avgdl[field]
        scores = np.zeros(n, dtype=np.float64)
        touched = np.zeros(n, dtype=bool)
        for kk in keys:  # lexicographic order fixed by query_terms()
            ids, tfs, _ = postings[kk]
            loc = ids - base
            scores[loc] += self.idf[kk] * codec.bm25_tf_impact(
                tfs, dl[loc], avgdl)
            touched[loc] = True
        loc = np.flatnonzero(touched)
        sc = scores[loc]
        if len(self._deleted):
            keepd = _drop_deleted(self._deleted, loc + base)
            loc, sc = loc[keepd], sc[keepd]
        fv = dl[loc]
        if modifier == "log1p":
            sc = sc * np.log(1.0 + fv)
        elif modifier == "sqrt":
            sc = sc * np.sqrt(fv)
        elif modifier == "none":
            sc = sc * fv
        else:
            raise ValueError(f"unknown modifier {modifier!r}")
        if len(loc) > k:
            kth = np.partition(sc, -k)[-k]
            keep = sc >= kth
            loc, sc = loc[keep], sc[keep]
        order = np.lexsort((loc, -sc))[:k]
        return (loc[order] + base).astype(np.int64), sc[order]

    def _score_boosting(self, field: str, terms: dict, k: int,
                        base: int, n: int, dl: np.ndarray,
                        postings: dict, negative_boost: float
                        ) -> tuple[np.ndarray, np.ndarray]:
        """boosting query per segment: exhaustive OR accumulation of the
        positive terms, then docs matching any negative term demoted by
        ``negative_boost`` BEFORE the per-segment top-k cut — valid
        because a doc's postings live entirely in its segment.
        Bitwise-identical to ``LocalSearcher.search_boosting`` (same
        accumulation order, same elementwise multiply)."""
        keys = [(field, t) for t in terms["pos"]
                if (field, t) in postings and (field, t) in self.idf]
        if not keys:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        avgdl = self.avgdl[field]
        scores = np.zeros(n, dtype=np.float64)
        touched = np.zeros(n, dtype=bool)
        for kk in keys:  # lexicographic order fixed by query_terms()
            ids, tfs, _ = postings[kk]
            loc = ids - base
            scores[loc] += self.idf[kk] * codec.bm25_tf_impact(
                tfs, dl[loc], avgdl)
            touched[loc] = True
        neg = np.zeros(n, dtype=bool)
        for t in terms["neg"]:
            kk = (field, t)
            if kk in postings:
                neg[postings[kk][0] - base] = True
        scores[neg] *= negative_boost
        loc = np.flatnonzero(touched)
        sc = scores[loc]
        if len(self._deleted):
            keepd = _drop_deleted(self._deleted, loc + base)
            loc, sc = loc[keepd], sc[keepd]
        if len(loc) > k:
            kth = np.partition(sc, -k)[-k]
            keep = sc >= kth
            loc, sc = loc[keep], sc[keep]
        order = np.lexsort((loc, -sc))[:k]
        return (loc[order] + base).astype(np.int64), sc[order]

    def _score_union_const(self, field: str, terms: list[str], k: int,
                           postings: dict
                           ) -> tuple[np.ndarray, np.ndarray]:
        """Constant-score union (ES wildcard/multi-term constant_score
        rewrite): docs containing ANY of the expanded terms, score 1.0,
        ordered by doc_id asc."""
        runs = [postings[(field, t)][0] for t in terms
                if (field, t) in postings]
        if not runs:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        ids = runs[0] if len(runs) == 1 else np.unique(np.concatenate(runs))
        if len(self._deleted):
            ids = ids[_drop_deleted(self._deleted, ids)]
        ids = ids[:k]
        return ids.astype(np.int64), np.ones(len(ids), np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_q, out_d, out_s = [], [], []
        for seg_id in batch["segment_id"].to_pylist():
            loaded = self._load_segment(int(seg_id))
            if loaded is None:
                continue
            base, n, dl, postings, positions = loaded
            for qid, field, terms, k, mode in self.queries:
                if mode == "bool":
                    ids, sc = self._score_bool(terms, int(k), base, n,
                                               dl, postings,
                                               seg_id=int(seg_id))
                    out_q.extend([qid] * len(ids))
                    out_d.extend(ids.tolist())
                    out_s.extend(sc.tolist())
                    continue
                if mode.startswith("multi:"):
                    if not any(f in self.by_field for f, _b in field):
                        continue
                    ids, sc = self._score_multi(
                        field, terms, int(k), mode.split(":", 1)[1],
                        base, n, dl, postings)
                    out_q.extend([qid] * len(ids))
                    out_d.extend(ids.tolist())
                    out_s.extend(sc.tolist())
                    continue
                if field not in self.by_field:  # no indexed terms: no hits
                    continue
                if mode.startswith("fscore:"):
                    ids, sc = self._score_function(
                        field, terms, int(k), base, n, dl[field],
                        postings, mode.split(":", 1)[1])
                elif mode.startswith("boosting:"):
                    ids, sc = self._score_boosting(
                        field, terms, int(k), base, n, dl[field],
                        postings, float(mode.split(":", 1)[1]))
                elif mode == "union_const":
                    ids, sc = self._score_union_const(field, terms, int(k),
                                                      postings)
                elif mode == "and":
                    ids, sc = self._score_conjunctive(field, terms, int(k),
                                                      base, dl[field], postings)
                elif mode == "phrase":
                    ids, sc = self._score_phrase(field, terms, int(k), base,
                                                 dl[field], postings, positions)
                else:
                    ids, sc = self._score_query(field, terms, int(k), base, n,
                                                dl[field], postings)
                out_q.extend([qid] * len(ids))
                out_d.extend(ids.tolist())
                out_s.extend(sc.tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "doc_id": pa.array(out_d, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )


def _parse_rg_bounds(files: list[str]) -> list[tuple]:
    """Per file ``(ParquetFile, [(fmin, tmin, fmax, tmax)] per row group)``
    from the footers. Parquet string min/max may be truncated, but
    truncation keeps them conservative (min a prefix <= true min, max >=
    true max), so containment tests stay valid. ``bounds`` is None when a
    file lacks usable statistics."""
    idx = []
    for path in files:
        pf = pq.ParquetFile(path)
        md = pf.metadata
        rg0 = md.row_group(0)
        ci_of = {rg0.column(ci).path_in_schema: ci
                 for ci in range(rg0.num_columns)}
        bounds: list[tuple] | None = []
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            fs = rg.column(ci_of["field"]).statistics
            ts = rg.column(ci_of["term"]).statistics
            if (fs is None or ts is None or not fs.has_min_max
                    or not ts.has_min_max):
                bounds = None
                break
            bounds.append((fs.min, ts.min, fs.max, ts.max))
        idx.append((pf, bounds))
    return idx


class LocalSearcher:
    """Warm single-process serving path: global doc-length arrays loaded
    once, per-query postings fetched with ONE threaded multi-file parquet
    read ((field, term)-predicate pushdown over all segments' term tables).
    Accumulation is per term in lexicographic order into a global dense
    score array — bitwise-identical to the distributed path (each doc's
    additions happen in the same order).
    """

    #: auto-consolidate threshold: below this many segments the per-segment
    #: fan-out is already cheap and the one-time sort isn't worth paying
    TERMDICT_AUTO_SEGMENTS = 64
    #: above this many segments, skip-path per-run probe overhead makes
    #: block-max LOSE even with a rare term (measured: 592 vs 347 ms at
    #: 500 uncompacted segments, round 4) — auto routing falls back to
    #: exact full decode, and "auto" compaction kicks in at bind
    BLOCKMAX_MAX_SEGMENTS = 256
    #: bind-time auto-compaction threshold + target: a fresh searcher on a
    #: many-hundreds-of-segments index pays a one-time tiered merge down to
    #: the target (the Lucene force-merge analogue) so every later query
    #: runs on the measured-winning layout
    COMPACT_AUTO_SEGMENTS = 384
    COMPACT_TARGET = 64

    def __init__(self, index_dir: str, refresh_interval: float | None = None,
                 termdict: str = "auto", compact: str = "auto"):
        """``refresh_interval`` (seconds) is the ES ``refresh_interval``
        analogue (reference ``config/search_scheme.json:6`` sets 30s): when
        set, every search first checks — at most once per interval — whether
        the committed segment set changed (a merge or an incremental build)
        and epoch-swaps onto the new segments. ``None`` = explicit
        :meth:`refresh` only.

        ``termdict``: ``"auto"`` uses the consolidated dictionary sidecar
        when present and builds it ONCE at bind when the segment count
        exceeds :attr:`TERMDICT_AUTO_SEGMENTS` (a one-time optimize cost,
        reported nowhere near per-query latency); ``"build"`` forces the
        build at bind; ``"off"`` never uses it.

        ``compact``: ``"auto"`` runs a one-time tiered compaction at bind
        when the visible segment count exceeds
        :attr:`COMPACT_AUTO_SEGMENTS` — above that, skip-path probe
        overhead makes block-max lose outright (the round-4 500-segment
        measurement), so compaction is the serving-side prerequisite, not
        a routing decision. Skipped silently on read-only dirs or when
        another process holds the compaction lock (routing then falls back
        to exact decode via :attr:`BLOCKMAX_MAX_SEGMENTS`). ``"off"``
        never compacts."""
        self.index_dir = index_dir
        self.refresh_interval = refresh_interval
        self._termdict_mode = termdict
        self._compact_mode = compact
        self._last_refresh_check = time.monotonic()
        self._bind()

    def _maybe_auto_compact(self) -> bool:
        """Bind-time auto-compaction (see ``compact="auto"``). Returns True
        when a compaction ran (caller re-reads stats/manifests). Guarded by
        an O_CREAT|O_EXCL lock file so concurrent binds don't run two
        merges that would allocate the same fresh segment ids; a crashed
        holder's lock is broken after 1h (serving stays correct without
        compaction — just on the slower exact path)."""
        if getattr(self, "_compact_mode", "auto") != "auto":
            return False
        seg_ids, _vis = _visible_seg_ids(self.index_dir,
                                         _load_stats(self.index_dir))
        if len(seg_ids) <= self.COMPACT_AUTO_SEGMENTS:
            return False
        lock = os.path.join(self.index_dir, ".compact_lock")
        try:
            st = os.stat(lock)
            if time.time() - st.st_mtime > 3600:
                os.unlink(lock)
        except OSError:
            pass
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except OSError:
            return False  # held by another binder, or read-only dir
        try:
            with os.fdopen(fd, "w") as f:
                f.write(str(os.getpid()))
            from .merge import compact_to

            compact_to(self.index_dir, self.COMPACT_TARGET)
            return True
        finally:
            try:
                os.unlink(lock)
            except OSError:
                pass

    def _bind(self) -> None:
        """Bind this searcher to the CURRENT committed segment set."""
        import pyarrow.dataset as pads

        index_dir = self.index_dir
        self._maybe_auto_compact()
        # epoch fingerprint, taken BEFORE the stats read: if stats.json is
        # replaced between the two, the sig is older than the loaded stats
        # and the next cold _idf harmlessly re-binds once more
        self._stats_sig = _file_sig(os.path.join(index_dir, "stats.json"))
        self.stats = _load_stats(index_dir)
        self.n_docs = int(self.stats["n_docs"])
        self.seg_ids, vis = _visible_seg_ids(index_dir, self.stats)
        self._deleted = _load_deleted(index_dir, self.stats)
        self._bscale = _bound_scale(vis, self.stats)
        self.term_files = [seg_terms_path(index_dir, s) for s in self.seg_ids]
        self.term_ds = (pads.dataset(self.term_files) if self.term_files else None)
        self.doc_files = [seg_docs_path(index_dir, s) for s in self.seg_ids]
        self._dl: dict[str, np.ndarray] = {}
        self._idf_cache: dict[tuple[str, str], float | None] = {}
        self._df_cache: dict[tuple[str, str], int] = {}
        # hot postings cache (serving path): decoded runs per (field, term),
        # FIFO-evicted; repeated/overlapping queries skip the parquet read
        self._postings_cache: dict[tuple[str, str], list] = {}
        self._postings_cache_cap = 8192
        # blocked-reader cache for the skip paths (AND / disjunctive
        # block-max): encoded bytes + block metadata per (field, term);
        # readers memoize decoded blocks, so repeated queries skip both the
        # parquet read AND re-decoding hot blocks
        self._blocked_cache: dict[tuple[str, str], list[tuple]] = {}
        self._blocked_cache_cap = 8192
        # impact cache: per-(field, term) BM25 contribution arrays
        # (idf * tf-impact per posting) — query-INDEPENDENT, so warm
        # hot-term OR queries reduce to scatter-add + top-k (the dl
        # gather + kernel were ~half the warm cost for stopword queries).
        # Byte-budgeted LRU; idf/dl/avgdl are fixed per epoch, so entries
        # never go stale within a bind.
        from collections import OrderedDict
        self._contrib_cache: "OrderedDict[tuple, list[np.ndarray]]" = \
            OrderedDict()
        self._contrib_cache_bytes = 0
        # exact-request result cache (see search()); per-epoch by
        # construction — _bind recreates it on every swap
        self._request_cache: "OrderedDict[tuple, tuple]" = OrderedDict()
        # per-column doc-value caches (exists-filter null ids, numeric
        # decay values) — epoch-scoped like every cache above: an append
        # adds docs whose null/value rows the old entries don't carry
        self._null_dv_cache: dict[str, np.ndarray] = {}
        self._dv_num_cache: dict[str, np.ndarray] = {}
        self.last_block_stats = (0, 0)  # (decoded, total) of last AND query
        # per-file row-group (field, term) bounds, parsed lazily from
        # parquet footers once per epoch (see _read_terms_direct)
        self._rg_index: list[tuple] | None = None
        # consolidated term-dictionary sidecar (build._build_termdict):
        # dictionary lookups prune row groups of O(1) files instead of
        # fanning out to every segment's term file. Valid only while its
        # recorded segment set matches this epoch's visible set.
        import glob as _glob

        self.termdict_files: list[str] = []
        self._td_rg_index: list[tuple] | None = None
        mode = getattr(self, "_termdict_mode", "auto")
        if mode == "build" or (mode == "auto" and len(self.seg_ids)
                               > self.TERMDICT_AUTO_SEGMENTS):
            try:
                from .build import ensure_termdict

                ensure_termdict(index_dir)
            except OSError:
                pass  # read-only index dir: fan-out path serves
        td_dir = os.path.join(index_dir, "termdict")
        if mode != "off" and os.path.exists(os.path.join(td_dir, "_SUCCESS")):
            try:
                meta = mf.read_json(os.path.join(td_dir, "meta.json"))
            except (OSError, ValueError):
                meta = {}
            if meta.get("seg_ids") == [int(s) for s in self.seg_ids]:
                self.termdict_files = sorted(
                    _glob.glob(os.path.join(td_dir, "*.parquet")))
        # statically-pruned postings sidecar (index/pruned.py) — powers
        # the OPT-IN or_strategy="pruned" path only; epoch-validated like
        # the termdict
        self.pruned_files: list[str] = []
        self._pruned_rg_index: list[tuple] | None = None
        self._pruned_cache: "OrderedDict[tuple, tuple | None]" = \
            OrderedDict()
        pr_dir = os.path.join(index_dir, "pruned")
        if os.path.exists(os.path.join(pr_dir, "_SUCCESS")):
            try:
                pmeta = mf.read_json(os.path.join(pr_dir, "meta.json"))
            except (OSError, ValueError):
                pmeta = {}
            if pmeta.get("seg_ids") == [int(s) for s in self.seg_ids]:
                self.pruned_files = sorted(
                    _glob.glob(os.path.join(pr_dir, "*.parquet")))
        self.last_pruned_bound = 0.0

    def _read_terms(self, dict_cols: list[str], terms_by_field: dict,
                    positions: bool = False) -> pa.Table:
        """Filtered term-dictionary read WITH encoded postings materialized,
        for either layout: inline (enc columns live in parquet) or blob
        sidecar (small byte-range columns in parquet; postings fetched with
        coalesced ``pread`` s of exactly the needed ranges — the cold-query
        path stops paying for whole row-group binary column chunks).
        Block-metadata columns in ``dict_cols`` likewise come from the
        parquet when present (inline / v1 sidecar) or the blob (v2)."""
        filt = _term_filters(terms_by_field)
        schema = self.term_ds.schema
        if not blobs.has_sidecar(schema):
            cols = [*dict_cols, "doc_ids_enc", "tfs_enc"]
            if positions:
                cols.append("positions_enc")
            tt = self._read_terms_direct(cols, terms_by_field)
            if tt is not None:
                return tt
            return self.term_ds.to_table(columns=cols, filter=filt)
        blocks_from_blob = ("blk_n" in schema.names
                            and any(c in blobs.BLOCK_COLUMNS
                                    for c in dict_cols))
        cols = [c for c in dict_cols
                if not (blocks_from_blob and c in blobs.BLOCK_COLUMNS)]
        cols += ["segment_id", "blob_off", "doc_nbytes", "tf_nbytes"]
        if blocks_from_blob:
            cols.append("blk_n")
        if positions and "pos_nbytes" in schema.names:
            cols.append("pos_nbytes")
        elif blocks_from_blob and "pos_nbytes" in schema.names:
            cols.append("pos_nbytes")  # needed to locate the block tail
        tt = self._read_terms_direct(cols, terms_by_field)
        if tt is None:  # missing row-group stats: dataset filter fallback
            tt = self.term_ds.to_table(columns=cols, filter=filt)
        return blobs.materialize_enc(
            tt, lambda sid: seg_terms_path(self.index_dir, sid),
            want_positions=positions, want_blocks=blocks_from_blob)

    def _rg_bounds(self) -> list[tuple]:
        """Per term-file ``(ParquetFile, [(fmin, tmin, fmax, tmax)]
        per row group)`` — footers parsed ONCE per epoch. Parquet string
        min/max may be truncated, but truncation keeps them conservative
        (min a prefix <= true min, max >= true max), so containment tests
        stay valid."""
        if self._rg_index is None:
            self._rg_index = _parse_rg_bounds(self.term_files)
        return self._rg_index

    def _td_bounds(self) -> list[tuple] | None:
        """Row-group bounds of the consolidated termdict, or None when the
        sidecar is absent/unusable for this epoch (per-segment fan-out
        path runs instead)."""
        if not self.termdict_files:
            return None
        if self._td_rg_index is None:
            # a concurrent merge/append may drop_termdict (or rebuild
            # part-0.parquet under the same name for a NEW segment set)
            # between _bind and this first-query footer parse. Catch the
            # removal, then re-validate meta.json AFTER parsing: the
            # rebuild sequence is rmtree -> part files -> meta.json ->
            # _SUCCESS, so if meta still names OUR epoch's seg_ids the
            # files we just parsed were ours.
            try:
                idx = _parse_rg_bounds(self.termdict_files)
                meta = mf.read_json(os.path.join(
                    self.index_dir, "termdict", "meta.json"))
            except (OSError, ValueError):
                self.termdict_files = []
                return None
            if (meta.get("seg_ids") != [int(s) for s in self.seg_ids]
                    or any(b is None for _pf, b in idx)):
                self.termdict_files = []
                return None
            self._td_rg_index = idx
        return self._td_rg_index

    def _read_terms_direct(self, cols: list[str], terms_by_field: dict
                           ) -> pa.Table | None:
        """Row-group-pruned term-dictionary read: segment term files are
        sorted by (field, term), so footer min/max statistics locate each
        looked-up term in 1–2 row groups; only those decode. Replaces the
        pyarrow dataset filter scan whose per-file evaluation machinery
        (~1 ms x files x terms) dominated cold dictionary reads at 4M docs.
        Returns None when any file lacks usable statistics (caller falls
        back to the dataset filter)."""
        pairs = sorted((f, t) for f, ts in terms_by_field.items()
                       for t in ts)
        rg_index = self._td_bounds()
        if rg_index is None:
            rg_index = self._rg_bounds()
        if any(bounds is None for _pf, bounds in rg_index):
            return None
        # filter keys may not be in the projection: read them, filter,
        # then drop the extras (matches dataset-filter semantics)
        extra = [c for c in ("field", "term") if c not in cols]
        term_sets = {f: pa.array(sorted(ts))
                     for f, ts in terms_by_field.items()}

        def _one(entry) -> pa.Table | None:
            pf, bounds = entry
            need = sorted({
                g for g, (fmin, tmin, fmax, tmax) in enumerate(bounds)
                if any((fmin, tmin) <= p <= (fmax, tmax) for p in pairs)})
            if not need:
                return None
            # inner use_threads off: per-call pool spin-up costs more than
            # it saves on ~1000-row groups; parallelism comes from the
            # cross-file map below
            t = pf.read_row_groups(need, columns=cols + extra,
                                   use_threads=False)
            mask = None
            for f, vs in term_sets.items():
                m = pc.and_(pc.equal(t["field"], f),
                            pc.is_in(t["term"], value_set=vs))
                mask = m if mask is None else pc.or_(mask, m)
            t = t.filter(mask)
            return t.drop_columns(extra) if extra else t

        if len(rg_index) > 8:  # pyarrow reads release the GIL
            from concurrent.futures import ThreadPoolExecutor
            if not hasattr(self, "_rg_pool"):
                self._rg_pool = ThreadPoolExecutor(4)
            parts = list(self._rg_pool.map(_one, rg_index))
        else:
            parts = [_one(e) for e in rg_index]
        out = [t for t in parts if t is not None]
        if not out:
            schema = self.term_ds.schema
            return pa.table({c: pa.array([], schema.field(c).type)
                             for c in cols})
        return pa.concat_tables(out)

    def refresh(self) -> bool:
        """Epoch swap: re-resolve the committed segment set and, if it
        changed (segment merge, incremental build), rebind files and drop
        every derived cache. Returns True when a swap happened. Readers
        in-flight on the old epoch are unaffected (segment files are
        immutable; merge publishes under NEW ids and the combined manifest
        is the atomic commit point)."""
        new_ids, _ = _visible_seg_ids(self.index_dir,
                                      _load_stats(self.index_dir))
        if new_ids == self.seg_ids:
            return False
        self._bind()
        return True

    def _maybe_auto_refresh(self) -> None:
        if self.refresh_interval is None:
            return
        now = time.monotonic()
        if now - self._last_refresh_check >= self.refresh_interval:
            self._last_refresh_check = now
            self.refresh()

    def _dl_for(self, field: str) -> np.ndarray:
        """Doc-length lookup array for ``field`` — a read-only float64
        memmap over a flat sidecar file (``doclen/<field>.<n_docs>.f64``),
        built once per index from the docs tables and shared by every
        process serving it. Fancy indexing touches only the pages holding
        the looked-up doc ids, so per-query resident memory tracks the
        query's postings, not the corpus (the Lucene norms-file shape);
        values are small integers, exactly representable, so scores are
        bitwise-identical to the previous dense in-heap array."""
        if field not in self._dl:
            self._dl[field] = self._doclen_map(field)
        return self._dl[field]

    def _doclen_map(self, field: str) -> np.ndarray:
        import uuid as _uuid

        n = self.n_docs
        if n == 0 or not self.doc_files:
            return np.zeros(max(n, 1), dtype=np.float64)
        path = os.path.join(self.index_dir, "doclen", f"{field}.{n}.f64")
        if not os.path.exists(path):
            try:
                os.makedirs(os.path.dirname(path), exist_ok=True)
                tmp = f"{path}.tmp-{_uuid.uuid4().hex}"
                arr = np.memmap(tmp, dtype=np.float64, mode="w+", shape=(n,))
                for f in self.doc_files:
                    dt = pq.read_table(f, columns=["doc_id", _dl_column(field)])
                    arr[dt["doc_id"].to_numpy()] = \
                        dt[_dl_column(field)].to_numpy()
                arr.flush()
                del arr
                os.replace(tmp, path)  # atomic: concurrent builders race safely
            except OSError:  # read-only index dir: dense in-heap fallback
                arr = np.zeros(n, dtype=np.float64)
                dt = pq.read_table(self.doc_files,
                                   columns=["doc_id", _dl_column(field)])
                arr[dt["doc_id"].to_numpy()] = dt[_dl_column(field)].to_numpy()
                return arr
        return np.memmap(path, dtype=np.float64, mode="r", shape=(n,))

    def _dv_hours(self, column: str) -> np.ndarray:
        """Per-doc numeric doc-value lookup for a timestamp ``column`` in
        WHOLE HOURS since the Unix epoch — a read-only float64 memmap
        sidecar (``doclen/dv.<column>.<n_docs>.f64``) built once from the
        column's doc-values shards, same page-touch behavior as
        :meth:`_dl_for` (per-query residency tracks the candidates, not
        the corpus). Hours keep the values exactly representable in
        float64 (raw microseconds would not be); docs with a null value
        get NaN (decay treats them as non-matching the function, ES
        skip-missing)."""
        cache = getattr(self, "_dv_num_cache", None)
        if cache is None:
            cache = self._dv_num_cache = {}
        if column in cache:
            return cache[column]
        import uuid as _uuid

        from .aggs import _dv_path, build_doc_values

        n = self.n_docs
        if n == 0:
            return np.zeros(max(n, 1), dtype=np.float64)
        path = os.path.join(self.index_dir, "doclen",
                            f"dv.{column}.{n}.f64")
        if not os.path.exists(path):
            build_doc_values(self.index_dir, column)

            def fill(arr):
                for s in self.seg_ids:
                    dt = pq.read_table(_dv_path(self.index_dir, column,
                                                int(s)),
                                       columns=["doc_id", column])
                    col = dt[column].cast(pa.int64())
                    ok = np.asarray(pc.is_valid(col))
                    # integer floordiv BEFORE the float cast: raw
                    # microseconds exceed float64's exact-integer range
                    iv = np.asarray(pc.fill_null(col, 0),
                                    dtype=np.int64) // 3_600_000_000
                    v = iv.astype(np.float64)
                    v[~ok] = np.nan
                    arr[dt["doc_id"].to_numpy()] = v

            try:
                os.makedirs(os.path.dirname(path), exist_ok=True)
                tmp = f"{path}.tmp-{_uuid.uuid4().hex}"
                arr = np.memmap(tmp, dtype=np.float64, mode="w+",
                                shape=(n,))
                arr[:] = np.nan
                fill(arr)
                arr.flush()
                del arr
                os.replace(tmp, path)
            except OSError:  # read-only index dir: dense in-heap fallback
                arr = np.full(n, np.nan, dtype=np.float64)
                fill(arr)
                cache[column] = arr
                return arr
        out = np.memmap(path, dtype=np.float64, mode="r", shape=(n,))
        cache[column] = out
        return out

    def search_decay(self, query: str, k: int = 10,
                     field: str = DEFAULT_FIELD, column: str = "warc_ts",
                     origin_hours: float = 0.0, scale_hours: float = 240.0,
                     offset_hours: float = 0.0, decay: float = 0.5,
                     ) -> tuple[np.ndarray, np.ndarray]:
        """ES ``function_score`` with a ``gauss`` decay on a timestamp
        doc-value: ``score = BM25 * exp(-max(0, |x - origin| - offset)^2
        / (2 sigma^2))`` with ``sigma^2 = scale^2 / (2 ln(1/decay))`` —
        the value at ``origin±(offset+scale)`` is exactly ``decay``.
        All distances in whole hours (exactly representable, see
        :meth:`_dv_hours`). The multiplicative factor breaks block-max
        admissibility, so this routes through exhaustive accumulation
        with the modifier applied before the top-k cut — the same shape
        as ``search_function_score``. Docs missing the doc-value score 0
        for the function (dropped from the top-k unless k exceeds the
        matched set)."""
        self._maybe_auto_refresh()
        all_terms = query_terms(query, _field_analyzer(self.stats, field))
        idf = self._idf(field, all_terms)
        terms = [t for t in all_terms if t in idf]
        if not terms or self.term_ds is None:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        hours = self._dv_hours(column)
        sigma2 = (scale_hours * scale_hours) / (2.0 * np.log(1.0 / decay))

        def mod(sc, loc):
            d = np.abs(hours[loc] - origin_hours) - offset_hours
            d = np.maximum(d, 0.0)
            g = np.exp(-(d * d) / (2.0 * sigma2))
            return sc * np.where(np.isnan(g), 0.0, g)

        dl = self._dl_for(field)
        return self._search_or_fulldecode(
            field, terms, k, idf, dl, _avgdl(self.stats, field),
            score_mod=mod)

    def _idf(self, field: str, terms: list[str]) -> dict[str, float]:
        missing = [t for t in terms if (field, t) not in self._idf_cache]
        if missing:
            # term_stats is a GLOBAL sidecar that append/merge/delete
            # rewrite in place (the old generation's rows are gone), so a
            # reader bound to the old epoch cannot lazily mix fresh df with
            # its old segment set — that would be a torn snapshot matching
            # NEITHER epoch. Detect the epoch move (stats.json is the
            # atomic commit point of every mutation) and re-bind first:
            # the reader serves the new epoch whole, like an ES reader
            # reopen. Warm (fully cached) queries keep serving the bound
            # epoch from memory.
            if _file_sig(os.path.join(
                    self.index_dir, "stats.json")) != self._stats_sig:
                self._bind()
                missing = list(terms)
            got, dfs, _ = load_global_idf(self.index_dir, {field: missing})
            for t in missing:
                self._idf_cache[(field, t)] = got.get((field, t))
                self._df_cache[(field, t)] = dfs.get((field, t), 0)
        return {t: v for t in terms
                if (v := self._idf_cache.get((field, t))) is not None}

    def _search_and_blockskip(self, field: str, terms: list[str], k: int,
                              idf: dict[str, float], dl: np.ndarray,
                              avgdl: float) -> tuple[np.ndarray, np.ndarray]:
        """Conjunctive top-k with block-max skipping.

        The rarest term drives; every other term is probed via
        ``BlockedPostings.lookup_many`` which decodes ONLY the 128-posting
        blocks that can contain a surviving candidate (``block_last_doc``
        binary search — the WAND skipping primitive). Scores accumulate per
        term in lexicographic order, so results are bitwise-identical to the
        full-decode path. ``self.last_block_stats`` records
        (blocks_decoded, blocks_total) for observability.
        """
        names = self.term_ds.schema.names
        if "block_doc_byte_off" not in names and "blk_n" not in names:
            # index built before block byte offsets existed: full decode
            return self._search_and_fulldecode(field, terms, k, idf, dl, avgdl)
        # cost model: probing costs ~driver_df per other term and loses the
        # vectorized-decode advantage (~8x); skip-read only pays when the
        # driver is selective relative to the other lists. df comes from the
        # blocked cache when every term is already hot (no read at all).
        if all((field, t) in self._blocked_cache for t in terms):
            df_of_g = {t: sum(r[0].df for r in self._blocked_cache[(field, t)])
                       for t in terms}
        else:
            df_tbl = self.term_ds.to_table(
                columns=["term", "df"], filter=_term_filters({field: terms}))
            df_of_g = {}
            for t, d in zip(df_tbl["term"].to_pylist(),
                            df_tbl["df"].to_pylist()):
                df_of_g[t] = df_of_g.get(t, 0) + int(d)
        if any(df_of_g.get(t, 0) == 0 for t in terms):
            self.last_block_stats = (0, 0)
            return np.empty(0, np.int64), np.empty(0, np.float64)
        min_df = min(df_of_g.values())
        other_total = sum(df_of_g.values()) - min_df
        if min_df * 8 * max(1, len(terms) - 1) >= other_total:
            return self._search_and_fulldecode(field, terms, k, idf, dl, avgdl)
        runs = self._load_blocked_runs(field, terms)
        readers: dict[str, list[codec.BlockedPostings]] = {
            t: [r[0] for r in runs[t]] for t in terms}
        if any(not rs for rs in readers.values()):
            self.last_block_stats = (0, 0)
            return np.empty(0, np.int64), np.empty(0, np.float64)
        dec0 = sum(r.blocks_decoded for rs in readers.values() for r in rs)
        df_of = {t: sum(r.df for r in readers[t]) for t in terms}
        driver = min(terms, key=lambda t: df_of[t])
        # driver decodes fully; every other term probed lazily
        cand = np.concatenate([r.block(b)[0] for r in readers[driver]
                               for b in range(r.n_blocks)])
        if len(self._deleted):
            cand = cand[_drop_deleted(self._deleted, cand)]
        others = [t for t in terms if t != driver]
        others.sort(key=lambda t: df_of[t])  # rarest first: shrink fastest
        tf_by_term: dict[str, np.ndarray] = {}
        def probe(t: str, cand: np.ndarray) -> np.ndarray:
            """tf per candidate: runs are ordered disjoint ranges, so slice
            the (ascending) candidate array per run instead of scanning the
            whole set against every run."""
            runs = readers[t]
            if len(runs) == 1:
                return runs[0].lookup_many(cand)
            out = np.zeros(len(cand), dtype=np.int64)
            lo = 0
            for r in runs:
                hi = int(np.searchsorted(cand, int(r.block_last[-1]), "right"))
                if hi > lo:
                    out[lo:hi] = r.lookup_many(cand[lo:hi])
                lo = hi
                if lo >= len(cand):
                    break
            return out

        for t in others:
            tfs = probe(t, cand)
            keep = tfs > 0
            cand = cand[keep]
            tf_by_term[t] = tfs[keep]
            for u in others:
                if u in tf_by_term and u != t:
                    tf_by_term[u] = tf_by_term[u][keep]
            if len(cand) == 0:
                break
        blocks_decoded = sum(r.blocks_decoded for rs in readers.values()
                             for r in rs) - dec0
        blocks_total = sum(r.n_blocks for rs in readers.values() for r in rs)
        self.last_block_stats = (blocks_decoded, blocks_total)
        if len(cand) == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        # driver tfs for surviving candidates
        tf_by_term[driver] = probe(driver, cand)
        scores = np.zeros(len(cand), dtype=np.float64)
        for t in terms:  # lexicographic order -> bitwise-stable accumulation
            scores += idf[t] * codec.bm25_tf_impact(
                tf_by_term[t].astype(np.float64), dl[cand], avgdl)
        if len(cand) > k:
            kth = np.partition(scores, -k)[-k]
            keep = scores >= kth
            cand, scores = cand[keep], scores[keep]
        order = np.lexsort((cand, -scores))[:k]
        return cand[order].astype(np.int64), scores[order]

    def _load_blocked_runs(self, field: str, terms: list[str]
                           ) -> dict[str, list[tuple]] | None:
        """(BlockedPostings, block_max_impact, max_impact) runs per term,
        runs sorted by doc range; None if the index predates block byte
        offsets. Served from ``_blocked_cache`` — only terms not yet cached
        touch parquet, and cached readers keep their decoded-block memos
        across queries (warm path does no I/O)."""
        names = self.term_ds.schema.names
        if "block_doc_byte_off" not in names and "blk_n" not in names:
            return None
        missing = [t for t in terms if (field, t) not in self._blocked_cache]
        if missing:
            tt = self._read_terms(
                ["term", "df", "max_impact", "block_last_doc",
                 "block_max_impact", "block_doc_byte_off",
                 "block_tf_byte_off"],
                {field: missing},
            )
            fresh: dict[str, list[tuple]] = {t: [] for t in missing}
            views = {c: blobs._list_views(tt[c])
                     for c in ("block_last_doc", "block_max_impact",
                               "block_doc_byte_off", "block_tf_byte_off")}
            term_col = tt["term"].to_pylist()
            df_col = tt["df"].to_numpy()
            tmax_col = tt["max_impact"].to_numpy()
            for i in range(tt.num_rows):
                t = term_col[i]

                def _lst(c: str, dt, i=i):
                    offs_c, vals_c = views[c]
                    return vals_c[offs_c[i]:offs_c[i + 1]].astype(
                        dt, copy=False)

                reader = codec.BlockedPostings(
                    tt["doc_ids_enc"][i].as_py(), tt["tfs_enc"][i].as_py(),
                    int(df_col[i]),
                    _lst("block_last_doc", np.int64),
                    _lst("block_doc_byte_off", np.int64),
                    _lst("block_tf_byte_off", np.int64),
                )
                bmax = _lst("block_max_impact", np.float64)
                tmax = float(tmax_col[i])
                fresh[t].append((reader, bmax, tmax))
            for t in missing:
                fresh[t].sort(key=lambda r: int(r[0].block_last[0]))
                while len(self._blocked_cache) >= self._blocked_cache_cap:
                    self._blocked_cache.pop(next(iter(self._blocked_cache)))
                self._blocked_cache[(field, t)] = fresh[t]
        return {t: self._blocked_cache[(field, t)] for t in terms}

    @staticmethod
    def _per_run(cand: np.ndarray, runs: list[tuple], fn,
                 dtype) -> np.ndarray:
        """Apply ``fn(run_tuple, ascending_cand_slice)`` per run: runs hold
        ordered disjoint doc ranges, so each run sees only its slice of the
        (ascending) candidate array."""
        out = np.zeros(len(cand), dtype=dtype)
        lo = 0
        for r in runs:
            hi = int(np.searchsorted(cand, int(r[0].block_last[-1]), "right"))
            if hi > lo:
                out[lo:hi] = fn(r, cand[lo:hi])
            lo = hi
            if lo >= len(cand):
                break
        return out

    def _search_or_blockmax(self, field: str, terms: list[str], k: int,
                            idf: dict[str, float], dl: np.ndarray,
                            avgdl: float) -> tuple[np.ndarray, np.ndarray]:
        """Disjunctive (OR) top-k with block-max pruning — the ES/Lucene
        block-max WAND capability (Ding & Suel 2011), organized MaxScore-
        style for vectorized execution:

        * terms sorted by upper bound ``idf * max_impact``; an ESSENTIAL
          prefix is fully decoded (vectorized dense accumulation) to seed
          candidates and a k-th-score lower bound theta;
        * each NON-essential term is probed candidate-at-a-block: a
          candidate whose ``partial + idf*block_max(block) + suffix_ub``
          cannot reach theta is dropped permanently (strict <, so a
          dropped doc can never tie into the top-k), and surviving
          candidates decode ONLY the blocks they land in
          (``BlockedPostings`` skip primitive);
        * the essential prefix grows until the exact k-th score strictly
          exceeds the non-essential upper-bound sum R — the certificate
          that no doc outside the essential union can rank (ES executes
          OR queries with the same bound; Lucene WANDScorer);
        * survivors are re-scored in LEXICOGRAPHIC term order, so returned
          scores are bitwise-identical to the exhaustive path and the
          brute-force oracle.

        ``self.last_block_stats`` reports (blocks_decoded, blocks_total).
        """
        runs = self._load_blocked_runs(field, terms)
        if runs is None:
            return self._search_or_fulldecode(field, terms, k, idf, dl, avgdl)
        terms = [t for t in terms if runs[t]]
        if not terms:
            self.last_block_stats = (0, 0)
            return np.empty(0, np.int64), np.empty(0, np.float64)
        bscale = self._bscale  # appended-index bound admissibility factor
        ub = {t: idf[t] * max(r[2] for r in runs[t]) * bscale for t in terms}
        order = sorted(terms, key=lambda t: (-ub[t], t))
        # cached readers carry decode counts from earlier queries: report
        # this query's decodes relative to the load-time baseline
        dec0 = sum(r[0].blocks_decoded for t in terms for r in runs[t])

        def stats() -> tuple[int, int]:
            dec = sum(r[0].blocks_decoded for t in terms for r in runs[t])
            tot = sum(r[0].n_blocks for t in terms for r in runs[t])
            return dec - dec0, tot

        for n_ess in range(1, len(order) + 1):
            ess, rest = order[:n_ess], order[n_ess:]
            r_total = float(sum(ub[t] for t in rest))
            # essential union: full decode (block reader, so stats count it).
            # Compact accumulation over the union of essential doc ids —
            # same per-doc addition order as a dense array indexed by doc id
            # (term-major, ids ascending within a term), bitwise-identical,
            # but peak memory tracks the decoded postings, not n_docs.
            ess_lists: dict[str, tuple[np.ndarray, np.ndarray]] = {}
            for t in ess:
                parts = [r[0].block(b) for r in runs[t]
                         for b in range(r[0].n_blocks)]
                ids = np.concatenate([p[0] for p in parts])
                tfs = np.concatenate([p[1] for p in parts])
                ess_lists[t] = (ids, tfs)
            alive = np.unique(np.concatenate(
                [ess_lists[t][0] for t in ess]))  # ascending
            partial = np.zeros(len(alive), dtype=np.float64)
            for t in ess:
                ids, tfs = ess_lists[t]
                pos = np.searchsorted(alive, ids)
                partial[pos] += idf[t] * codec.bm25_tf_impact(
                    tfs.astype(np.float64), dl[ids], avgdl)
            if len(self._deleted):  # tombstoned docs can never rank
                keepm = _drop_deleted(self._deleted, alive)
                alive, partial = alive[keepm], partial[keepm]
            theta = (float(np.partition(partial, -k)[-k])
                     if len(partial) >= k else -np.inf)
            tf_rest: dict[str, np.ndarray] = {}
            suffix = r_total
            for t in rest:
                suffix -= ub[t]
                # block-max prune: max gain from t at each candidate's block
                bm = self._per_run(
                    alive, runs[t],
                    lambda r, c: np.where(
                        (b := np.searchsorted(r[0].block_last, c))
                        < r[0].n_blocks,
                        idf[t] * bscale
                        * r[1][np.minimum(b, r[0].n_blocks - 1)], 0.0),
                    np.float64)
                keep = partial + bm + suffix >= theta
                if not keep.all():
                    alive, partial = alive[keep], partial[keep]
                    for u in tf_rest:
                        tf_rest[u] = tf_rest[u][keep]
                tfs = self._per_run(
                    alive, runs[t],
                    lambda r, c: r[0].lookup_many(c), np.int64)
                tf_rest[t] = tfs
                nz = tfs > 0
                partial[nz] += idf[t] * codec.bm25_tf_impact(
                    tfs[nz].astype(np.float64), dl[alive[nz]], avgdl)
                if len(partial) >= k:
                    theta = max(theta, float(np.partition(partial, -k)[-k]))
            # partial is now EXACT for survivors; certify the essential set:
            # any doc outside the essential union scores <= r_total, so the
            # k-th survivor score must STRICTLY beat it (ties lose on doc_id)
            theta_final = (float(np.partition(partial, -k)[-k])
                           if len(partial) >= k else -np.inf)
            if rest and not (theta_final > r_total):
                continue  # grow the essential prefix and retry
            if not len(alive):
                self.last_block_stats = stats()
                return np.empty(0, np.int64), np.empty(0, np.float64)
            # top-k slice, then bitwise-exact lex-order rescore. `partial`
            # was accumulated in upper-bound term order while the rescore
            # below runs in lex order; float addition order can move a sum
            # by an ulp either way, so cut with a few-ulp slack to keep
            # near-tie docs for the rescore to decide (ADVICE r2).
            if len(alive) > k:
                kth = np.partition(partial, -k)[-k]
                for _ in range(4):
                    kth = np.nextafter(kth, -np.inf)
                sel = partial >= kth
                alive = alive[sel]
                for u in tf_rest:
                    tf_rest[u] = tf_rest[u][sel]
            sc = np.zeros(len(alive), dtype=np.float64)
            for t in sorted(terms):
                if t in tf_rest:
                    tfv = tf_rest[t]
                else:
                    ids, tfs = ess_lists[t]
                    pos = np.searchsorted(ids, alive)
                    okm = pos < len(ids)
                    posc = np.minimum(pos, len(ids) - 1)
                    okm &= ids[posc] == alive
                    tfv = np.where(okm, tfs[posc], 0)
                nz = tfv > 0
                sc[nz] += idf[t] * codec.bm25_tf_impact(
                    tfv[nz].astype(np.float64), dl[alive[nz]], avgdl)
            if len(alive) > k:
                kth = np.partition(sc, -k)[-k]
                keep2 = sc >= kth
                alive, sc = alive[keep2], sc[keep2]
            self.last_block_stats = stats()
            ordr = np.lexsort((alive, -sc))[:k]
            return alive[ordr].astype(np.int64), sc[ordr]
        raise AssertionError("unreachable: essential set covers all terms")

    def _search_single_term_blockmax(self, field: str, term: str, k: int,
                                     idf: dict[str, float], dl: np.ndarray,
                                     avgdl: float
                                     ) -> tuple[np.ndarray, np.ndarray] | None:
        """Single-term top-k by block-max upper bound — the degenerate
        block-max WAND case where the pivot IS the whole query.

        Blocks are visited in descending ``idf * block_max * bscale``
        order; only blocks whose bound can still reach the running exact
        k-th score decode (measured at 4M docs: ~k of ~30k blocks survive
        for a stopword — the decode volume drops from the whole posting
        list to a handful of 128-posting blocks). Bitwise-identical to the
        exhaustive path: each score is the same single product, an
        undecoded block's docs all score strictly below the final k-th
        (we stop only when ``kth > ub``, and kth never decreases), and the
        final cut is the same ``lexsort((ids, -sc))[:k]``.

        Returns None (caller falls back) when the index predates block
        metadata or the bound is too flat to prune (needed blocks exceed a
        third of the list — per-block decode overhead would beat one bulk
        decode)."""
        runs_all = self._load_blocked_runs(field, [term])
        if runs_all is None or not runs_all.get(term):
            return None
        rl = runs_all[term]
        readers = [r[0] for r in rl]
        w = float(idf[term]) * self._bscale
        ubs = np.concatenate([r[1] for r in rl]) * w
        n_blocks = len(ubs)
        run_of = np.repeat(np.arange(len(rl)),
                           [r.n_blocks for r in readers])
        blk_of = np.concatenate([np.arange(r.n_blocks) for r in readers])
        order = np.argsort(-ubs, kind="stable")
        dec0 = sum(r.blocks_decoded for r in readers)
        cand_ids: list[np.ndarray] = []
        cand_sc: list[np.ndarray] = []
        n_cand = 0
        kth = -np.inf
        i = 0
        chunk = max(16, k // 8)
        while i < n_blocks:
            if kth > ubs[order[i]]:
                break
            for bi in order[i:i + chunk]:
                ids, tfs = readers[run_of[bi]].block(int(blk_of[bi]))
                if len(self._deleted):
                    keepm = _drop_deleted(self._deleted, ids)
                    ids, tfs = ids[keepm], tfs[keepm]
                if not len(ids):
                    continue
                cand_ids.append(ids)
                cand_sc.append(idf[term] * codec.bm25_tf_impact(
                    tfs.astype(np.float64), dl[ids], avgdl))
                n_cand += len(ids)
            i += chunk
            if n_cand >= k:
                sc = np.concatenate(cand_sc)
                kth = float(np.partition(sc, -k)[-k])
                if i < n_blocks and kth <= ubs[order[i]]:
                    # flat-bound bail: if the blocks still admissible under
                    # the current bound exceed a third of the list, chunked
                    # decode loses to one bulk decode — let the exhaustive
                    # path take it
                    if int((ubs >= kth).sum()) > n_blocks // 3:
                        return None
        self.last_block_stats = (
            sum(r.blocks_decoded for r in readers) - dec0, n_blocks)
        if not cand_ids:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        loc = np.concatenate(cand_ids)
        sc = np.concatenate(cand_sc)
        if len(loc) > k:
            kthf = np.partition(sc, -k)[-k]
            keep = sc >= kthf
            loc, sc = loc[keep], sc[keep]
        ordr = np.lexsort((loc, -sc))[:k]
        return loc[ordr].astype(np.int64), sc[ordr]

    # fulldecode accumulation-layout gate (module-level so tests can force
    # either path; both are bitwise-identical)
    _DENSE_MIN_POSTINGS = 1 << 19
    # single-term block-max gate: below this df one bulk decode beats
    # per-block ranked decode (class attr so tests can force the path)
    _SINGLE_TERM_BLOCKMAX_MIN_DF = 100_000

    def _search_or_fulldecode(self, field: str, terms: list[str], k: int,
                              idf: dict[str, float], dl: np.ndarray,
                              avgdl: float,
                              after: tuple[float, int] | None = None,
                              score_mod=None,
                              ) -> tuple[np.ndarray, np.ndarray]:
        """Exhaustive OR scoring (lexicographic accumulation) — the default
        serving path and the bitwise reference for the block-max path.

        Accumulates into a COMPACT array over the union of posting doc ids
        instead of a dense O(n_docs) score array: per-doc addition order is
        unchanged (term-major, ascending ids within each term), so scores
        are bitwise-identical while peak memory tracks the query's
        postings, not the corpus. Two layouts, picked by posting density
        over the doc-id span and bitwise-equivalent (contributions are
        elementwise, each (doc, term) adds exactly once, per-doc term order
        is the query order in both):

        - sparse (default): union via np.unique + searchsorted scatter —
          O(P log P) but proportional to the postings touched.
        - windowed dense (high-df queries, e.g. stopwords at web scale):
          scatter-add into a reused fixed-size window buffer over doc-id
          ranges — O(P), no sort; the O(P log P) union sort was the
          measured hot cost (574 ms warm for a 4-common-term query at 4M
          docs). The buffer is ≤ 8 MiB regardless of corpus size."""
        by_term = self._postings_for(field, terms)
        contribs = self._contribs_for(field, terms, by_term, idf, dl, avgdl)
        return self._accumulate_or(terms, by_term, contribs, k,
                                   after, score_mod)

    def _accumulate_or(self, terms: list[str], by_term: dict, contribs: dict,
                       k: int, after: tuple[float, int] | None = None,
                       score_mod=None) -> tuple[np.ndarray, np.ndarray]:
        """Shared OR accumulation + top-k tail over precomputed per-term
        (doc-id run, contribution) pairs — used by the exact full-decode
        path and the opt-in statically-pruned path (index/pruned.py)."""
        runs = [ids for t in terms for ids, _tfs in by_term.get(t, [])]
        if not runs:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        total = sum(len(r) for r in runs)
        span_lo = min(int(r[0]) for r in runs)
        span_hi = max(int(r[-1]) for r in runs) + 1
        if (total >= self._DENSE_MIN_POSTINGS
                and total * 16 >= span_hi - span_lo):
            loc, sc = self._accumulate_windowed(
                terms, by_term, contribs, span_lo, span_hi,
                k, self._deleted, after, score_mod)
        else:
            loc = np.unique(np.concatenate(runs))
            sc = np.zeros(len(loc), dtype=np.float64)
            for t in terms:  # lexicographic accumulation order
                for (ids, _tfs), contrib in zip(by_term.get(t, []),
                                                contribs.get(t, [])):
                    pos = np.searchsorted(loc, ids)
                    sc[pos] += contrib
            if score_mod is not None:  # function_score: modify pre-cut
                sc = score_mod(sc, loc)
        if len(self._deleted):  # upsert tombstones: drop before top-k
            keep = _drop_deleted(self._deleted, loc)
            loc, sc = loc[keep], sc[keep]
        if after is not None:  # keyset cursor: keep strictly-after rows
            a_s, a_d = float(after[0]), int(after[1])
            keep = (sc < a_s) | ((sc == a_s) & (loc > a_d))
            loc, sc = loc[keep], sc[keep]
        if len(loc) > k:
            kth = np.partition(sc, -k)[-k]
            keep = sc >= kth
            loc, sc = loc[keep], sc[keep]
        order = np.lexsort((loc, -sc))[:k]
        return loc[order].astype(np.int64), sc[order]

    @staticmethod
    def _accumulate_windowed(terms: list[str], by_term: dict,
                             contribs: dict, span_lo: int, span_hi: int,
                             k: int, deleted: np.ndarray,
                             after: tuple[float, int] | None = None,
                             score_mod=None,
                             ) -> tuple[np.ndarray, np.ndarray]:
        """Dense scatter-add accumulation over fixed doc-id windows.

        One reused ``W``-double buffer (8 MiB); for each window, every
        query term's run slice falling in the window scatter-adds its
        contribution (ascending ids -> near-sequential writes), then the
        window's top-``k`` (ties kept) compact out. BM25 contributions are
        strictly positive (idf = ln(1+x), x > 0; tf impact > 0), so
        ``> 0`` identifies touched docs. Windows are zeroed lazily — only
        when a run intersects them — and the caller's density gate bounds
        the per-posting amortized zero/scan cost.

        The per-window cut is lossless for the caller's global top-k
        (scores are final within a window — each doc lives in exactly one
        window — so a global top-k member is necessarily in its window's
        top-k; ``>= kth`` keeps boundary ties). Upsert tombstones are
        dropped BEFORE the cut so a deleted doc can't displace a live one.
        This keeps the returned candidate set O(k x windows) instead of
        O(postings) — the measured cost at 4M docs was materializing the
        3.7M-row scored union."""
        W = 1 << 20
        edges = np.arange(span_lo, span_hi + W, W, dtype=np.int64)
        edges[-1] = span_hi
        n_win = len(edges) - 1
        # contributions precomputed (and impact-cached) by the caller:
        # the window loop only scatter-adds precomputed slices. Values are
        # bitwise-unchanged (elementwise kernel, slicing commutes).
        flat: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        for t in terms:
            for (ids, _tfs), contrib in zip(by_term.get(t, []),
                                            contribs.get(t, [])):
                flat.append((ids, contrib, np.searchsorted(ids, edges)))
        buf = np.empty(W, dtype=np.float64)
        out_loc: list[np.ndarray] = []
        out_sc: list[np.ndarray] = []
        for w in range(n_win):
            w_lo = int(edges[w])
            span = int(edges[w + 1]) - w_lo
            touched = False
            for ids, contrib, splits in flat:
                a, b = int(splits[w]), int(splits[w + 1])
                if a == b:
                    continue
                if not touched:
                    buf[:span] = 0.0
                    touched = True
                buf[ids[a:b] - w_lo] += contrib[a:b]
            if not touched:
                continue
            nz = np.flatnonzero(buf[:span] > 0.0)
            loc_w = nz + w_lo
            sc_w = buf[nz]
            if score_mod is not None:
                # modify BEFORE the per-window cut: the cut must rank by
                # the FINAL score or a top-k member could be dropped
                sc_w = score_mod(sc_w, loc_w)
            if len(deleted):
                keep = _drop_deleted(deleted, loc_w)
                loc_w, sc_w = loc_w[keep], sc_w[keep]
            if after is not None:
                # cursor filter BEFORE the window cut: the per-window
                # top-k then bounds the filtered set, so page-2+ hits
                # (all below the page-1 kth) survive
                a_s, a_d = float(after[0]), int(after[1])
                keep = (sc_w < a_s) | ((sc_w == a_s) & (loc_w > a_d))
                loc_w, sc_w = loc_w[keep], sc_w[keep]
            if len(loc_w) > k:
                kth = np.partition(sc_w, -k)[-k]
                keep = sc_w >= kth
                loc_w, sc_w = loc_w[keep], sc_w[keep]
            out_loc.append(loc_w)
            out_sc.append(sc_w)
        if not out_loc:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        return np.concatenate(out_loc), np.concatenate(out_sc)

    def _postings_for(self, field: str, terms: list[str]
                      ) -> dict[str, list[tuple[np.ndarray, np.ndarray]]]:
        """Decoded postings per term through the FIFO cache."""
        by_term: dict[str, list[tuple[np.ndarray, np.ndarray]]] = {}
        missing = []
        for t in terms:
            cached = self._postings_cache.get((field, t))
            if cached is not None:
                by_term[t] = cached
            else:
                missing.append(t)
        if missing:
            tt = self._read_terms(["term", "df"], {field: missing})
            n = tt.num_rows
            doc_col, tf_col = tt["doc_ids_enc"], tt["tfs_enc"]
            df_col = tt["df"].to_numpy()
            term_col = tt["term"].to_pylist()

            def _dec(i: int):
                return codec.decode_postings(
                    doc_col[i].as_py(), tf_col[i].as_py(), int(df_col[i]))

            # serial on purpose: the varint kernel is a chain of short
            # numpy ops that never release the GIL long enough to win —
            # measured 123 ms serial vs 138/163/249 ms at 2/4/8 threads
            # for a 7M-posting query at 4M docs
            for i in range(n):
                by_term.setdefault(term_col[i], []).append(_dec(i))
            for t in missing:
                if len(self._postings_cache) >= self._postings_cache_cap:
                    self._postings_cache.pop(next(iter(self._postings_cache)))
                self._postings_cache[(field, t)] = by_term.get(t, [])
        return by_term

    # impact-cache byte budget (class attr so tests can shrink it)
    _CONTRIB_CACHE_CAP = int(os.environ.get("EDLR_IMPACT_CACHE_MB",
                                            "256")) << 20

    def _contribs_for(self, field: str, terms: list[str], by_term: dict,
                      idf: dict[str, float], dl: np.ndarray, avgdl: float
                      ) -> dict[str, list[np.ndarray]]:
        """Per-run BM25 contribution arrays (``idf[t] * tf_impact``),
        parallel to ``by_term``'s runs, through the byte-budgeted LRU.
        Values are exactly what the inline computation produced — caching
        changes nothing bitwise."""
        out: dict[str, list[np.ndarray]] = {}
        for t in terms:
            key = (field, t)
            got = self._contrib_cache.get(key)
            if got is None:
                got = [idf[t] * codec.bm25_tf_impact(tfs, dl[ids], avgdl)
                       for ids, tfs in by_term.get(t, [])]
                nb = sum(c.nbytes for c in got)
                if nb <= self._CONTRIB_CACHE_CAP:
                    self._contrib_cache[key] = got
                    self._contrib_cache_bytes += nb
                    while (self._contrib_cache_bytes
                           > self._CONTRIB_CACHE_CAP):
                        _k, v = self._contrib_cache.popitem(last=False)
                        self._contrib_cache_bytes -= sum(c.nbytes
                                                         for c in v)
            else:
                self._contrib_cache.move_to_end(key)
            out[t] = got
        return out

    def _pruned_lookup(self, field: str, terms: list[str]) -> dict:
        """term -> (doc_ids, contribs, eps) from the pruned sidecar, or
        None per term absent from it (df below the build's min_df). Rows
        are (field, term, doc_base)-sorted, so per-term segment runs
        concatenate into ascending global doc ids; reads are row-group
        pruned via footer min/max, results FIFO-cached per epoch."""
        missing = [t for t in terms
                   if (field, t) not in self._pruned_cache]
        if missing and self.pruned_files:
            if self._pruned_rg_index is None:
                try:
                    idx = _parse_rg_bounds(self.pruned_files)
                    meta = mf.read_json(os.path.join(
                        self.index_dir, "pruned", "meta.json"))
                except (OSError, ValueError):
                    idx, meta = None, {}
                if (idx is None or any(b is None for _pf, b in idx)
                        or meta.get("seg_ids")
                        != [int(s) for s in self.seg_ids]):
                    self.pruned_files = []
                else:
                    self._pruned_rg_index = idx
            if self._pruned_rg_index is not None:
                pairs = sorted((field, t) for t in missing)
                chunks: dict[str, list[tuple]] = {}
                for pf, bounds in self._pruned_rg_index:
                    need = sorted({
                        g for g, (fmin, tmin, fmax, tmax)
                        in enumerate(bounds)
                        if any((fmin, tmin) <= p <= (fmax, tmax)
                               for p in pairs)})
                    if not need:
                        continue
                    tb = pf.read_row_groups(need, use_threads=False)
                    fl = tb["field"].to_pylist()
                    tl = tb["term"].to_pylist()
                    db = tb["doc_base"].to_pylist()
                    ep = tb["eps"].to_pylist()
                    for i in range(tb.num_rows):
                        if fl[i] == field and tl[i] in missing:
                            chunks.setdefault(tl[i], []).append(
                                (db[i], tb["doc_ids"][i].as_py(),
                                 tb["contribs"][i].as_py(), ep[i]))
                for t in missing:
                    got = chunks.get(t)
                    if not got:
                        entry = None
                    else:
                        got.sort(key=lambda r: r[0])
                        ids = np.frombuffer(
                            b"".join(r[1] for r in got), dtype=np.int64)
                        con = np.frombuffer(
                            b"".join(r[2] for r in got), dtype=np.float64)
                        entry = (ids, con, float(max(r[3] for r in got)))
                    if len(self._pruned_cache) >= 64:
                        self._pruned_cache.popitem(last=False)
                    self._pruned_cache[(field, t)] = entry
        return {t: self._pruned_cache.get((field, t)) for t in terms}

    def _search_or_pruned(self, field: str, terms: list[str], k: int,
                          idf: dict[str, float], dl: np.ndarray,
                          avgdl: float) -> tuple[np.ndarray, np.ndarray]:
        """Opt-in approximate disjunction over statically-pruned postings
        (index/pruned.py): sidecar terms scatter-add PRECOMPUTED exact
        contributions (no decode, no dl gather); terms below the pruning
        df threshold fall back to the exact path, so selective terms lose
        nothing. Same float64 accumulation order as the exact path —
        a returned doc's score is exact iff all its query-term postings
        were kept, else a lower bound; ``last_pruned_bound`` carries the
        summed per-term error bound for this query."""
        got = self._pruned_lookup(field, terms) if self.pruned_files \
            else {t: None for t in terms}
        miss = [t for t in terms if got.get(t) is None]
        full: dict = {}
        cf: dict = {}
        if miss:
            full = self._postings_for(field, miss)
            cf = self._contribs_for(field, miss, full, idf, dl, avgdl)
        by_term: dict = {}
        contribs: dict = {}
        bound = 0.0
        for t in terms:
            g = got.get(t)
            if g is not None:
                ids, con, eps = g
                by_term[t] = [(ids, None)]
                contribs[t] = [con]
                bound += eps
            else:
                by_term[t] = full.get(t, [])
                contribs[t] = cf.get(t, [])
        self.last_pruned_bound = bound
        return self._accumulate_or(terms, by_term, contribs, k)

    def _search_and_fulldecode(self, field: str, terms: list[str], k: int,
                               idf: dict[str, float], dl: np.ndarray,
                               avgdl: float) -> tuple[np.ndarray, np.ndarray]:
        """Conjunctive top-k via full posting decode (pre-block-offset
        index format fallback; results identical to the block-skip path)."""
        tt = self._read_terms(["term", "df"], {field: terms})
        by_term: dict[str, list[tuple[np.ndarray, np.ndarray]]] = {}
        for i in range(tt.num_rows):
            t = tt["term"][i].as_py()
            ids, tfs = codec.decode_postings(
                tt["doc_ids_enc"][i].as_py(), tt["tfs_enc"][i].as_py(),
                int(tt["df"][i].as_py()))
            by_term.setdefault(t, []).append((ids, tfs))
        merged: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for t in terms:
            runs = sorted(by_term.get(t, []), key=lambda r: r[0][0])
            if not runs:
                return np.empty(0, np.int64), np.empty(0, np.float64)
            merged[t] = (np.concatenate([r[0] for r in runs]),
                         np.concatenate([r[1] for r in runs]))
        cand = merged[terms[0]][0]
        for t in terms[1:]:
            cand = np.intersect1d(cand, merged[t][0], assume_unique=True)
            if len(cand) == 0:
                return np.empty(0, np.int64), np.empty(0, np.float64)
        if len(self._deleted):
            cand = cand[_drop_deleted(self._deleted, cand)]
            if len(cand) == 0:
                return np.empty(0, np.int64), np.empty(0, np.float64)
        sc = np.zeros(len(cand), dtype=np.float64)
        for t in terms:  # lexicographic order
            ids, tfs = merged[t]
            pos = np.searchsorted(ids, cand)
            sc += idf[t] * codec.bm25_tf_impact(tfs[pos], dl[cand], avgdl)
        if len(cand) > k:
            kth = np.partition(sc, -k)[-k]
            keep = sc >= kth
            cand, sc = cand[keep], sc[keep]
        order = np.lexsort((cand, -sc))[:k]
        return cand[order].astype(np.int64), sc[order]

    def more_like_this(self, doc_url: str, k: int = 10,
                       field: str = DEFAULT_FIELD,
                       max_query_terms: int = 5,
                       ) -> tuple[np.ndarray, np.ndarray]:
        """ES more_like_this: find docs similar to one document. The
        source doc's terms are ranked by ``round(tf * idf, 6)`` (ties:
        term asc — rounding makes the selection reproducible across
        engines), the top ``max_query_terms`` become a standard BM25 OR
        query, and the source doc itself is excluded from the hits
        (Lucene MLT semantics)."""
        from .export import term_vectors

        tv = term_vectors(self.index_dir, [doc_url], field)
        if tv.num_rows == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        terms = tv["term"].to_pylist()
        tfs = tv["tf"].to_numpy().astype(np.float64)
        idf = self._idf(field, terms)
        sel_score = np.round(
            tfs * np.array([idf.get(t, 0.0) for t in terms]), 6)
        t_arr = np.array(terms, dtype=object)
        order = np.lexsort((t_arr, -sel_score))[:max_query_terms]
        selected = sorted(t_arr[order].tolist())
        # source doc's engine id: url-filtered docs-table reads (row
        # groups prune on the url range; stop at the first hit)
        src = None
        for seg in self.seg_ids:
            docs = pq.read_table(seg_docs_path(self.index_dir, seg),
                                 columns=["doc_id"],
                                 filters=[("url", "==", doc_url)])
            if docs.num_rows:
                src = int(docs["doc_id"][0].as_py())
                break
        ids, sc = self.search(" ".join(selected), k=k + 1, field=field,
                              or_strategy="exact")
        if src is not None:
            keep = ids != src
            ids, sc = ids[keep], sc[keep]
        return ids[:k], sc[:k]

    def rescore(self, query: str, phrase: str | None = None,
                k: int = 10, window_size: int = 50,
                query_weight: float = 1.0, rescore_weight: float = 2.0,
                field: str = DEFAULT_FIELD,
                ) -> tuple[np.ndarray, np.ndarray]:
        """ES rescore API: re-rank the top ``window_size`` docs of the
        BM25 ranking with a phrase query —
        ``new = query_weight * bm25 + rescore_weight * phrase_score``
        (phrase_score 0 when the phrase doesn't occur; the documented
        PhraseSearcher convention otherwise). ``phrase`` defaults to the
        query itself (ES's common usage). With non-negative weights and
        k <= window_size the global top-k provably lives inside the
        window, so nothing outside it is scored twice."""
        if k > window_size:
            raise ValueError("rescore requires k <= window_size")
        # the window cut uses ROUNDED primary scores (6 dp) with doc-id
        # tie-break — the repo-wide determinism convention, so the window
        # membership is reproducible across engines and runs
        ids, sc = self.search(query, k=window_size + 20, field=field,
                              or_strategy="exact")
        if len(ids) == 0:
            return ids, sc
        cut = np.lexsort((ids, -np.round(sc, 6)))[:window_size]
        ids, sc = ids[cut], sc[cut]
        p_ids, p_sc, _fq = PhraseSearcher(self).search(
            phrase or query, k=window_size, field=field,
            within=np.sort(ids))
        ph = dict(zip(p_ids.tolist(), p_sc.tolist()))
        new = (query_weight * sc
               + rescore_weight * np.array([ph.get(int(d), 0.0)
                                            for d in ids]))
        order = np.lexsort((ids, -new))[:k]
        return ids[order], new[order]

    def explain(self, query: str, doc_id: int,
                field: str = DEFAULT_FIELD) -> dict:
        """ES ``_explain`` analogue: per-term BM25 contribution breakdown
        for one document. Sum of contributions == the search score bitwise
        (same accumulation order)."""
        terms = query_terms(query, _field_analyzer(self.stats, field))
        idf = self._idf(field, terms)
        dl = self._dl_for(field)
        avgdl = _avgdl(self.stats, field)
        parts = []
        total = 0.0
        for t in sorted(tt for tt in terms if tt in idf):
            tf = 0
            cached = self._postings_cache.get((field, t))
            runs = cached
            if runs is None:
                tbl = self._read_terms(["term", "df"], {field: [t]})
                runs = []
                for i in range(tbl.num_rows):
                    runs.append(codec.decode_postings(
                        tbl["doc_ids_enc"][i].as_py(), tbl["tfs_enc"][i].as_py(),
                        int(tbl["df"][i].as_py())))
            for ids, tfs in runs:
                j = int(np.searchsorted(ids, doc_id))
                if j < len(ids) and int(ids[j]) == doc_id:
                    tf = int(tfs[j])
                    break
            impact = float(codec.bm25_tf_impact(
                np.array([tf], dtype=np.float64),
                np.array([dl[doc_id]]), avgdl)[0]) if tf else 0.0
            contrib = idf[t] * impact
            total += contrib
            # global df — postings runs span all visible generations, so
            # the sum of run lengths is the scoring df (Lucene keeps df
            # through tombstones until compaction, as the scorer does)
            df_t = int(sum(len(ids) for ids, _tfs in runs))
            parts.append({"term": t, "tf": tf, "df": df_t, "idf": idf[t],
                          "dl": float(dl[doc_id]), "avgdl": avgdl,
                          "contribution": contrib})
        return {"doc_id": int(doc_id), "score": total, "terms": parts,
                "bm25": {"k1": codec.BM25_K1, "b": codec.BM25_B}}

    def search_after(self, query: str, after: tuple[float, int] | None,
                     k: int = 10, field: str = DEFAULT_FIELD,
                     ) -> tuple[np.ndarray, np.ndarray]:
        """Keyset pagination over the BM25 ranking (ES search_after
        analogue): return the next ``k`` hits strictly after the
        ``(score, doc_id)`` cursor in (score desc, doc_id asc) order.
        ``after=None`` is the first page. Deterministic: the cursor is the
        last row of the previous page.

        Routed through the exhaustive-accumulation path with the cursor
        applied before the top-k cut, so a page-2+ request costs the same
        as page 1 (no full ranking, candidate memory bounded by the
        windowed accumulator) and scores are bitwise-identical to
        ``search()``'s."""
        if after is None:
            return self.search(query, k=k, field=field)
        self._maybe_auto_refresh()
        all_terms = query_terms(query, _field_analyzer(self.stats, field))
        idf = self._idf(field, all_terms)
        terms = [t for t in all_terms if t in idf]
        if not terms or self.term_ds is None:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        return self._search_or_fulldecode(
            field, terms, k, idf, self._dl_for(field),
            _avgdl(self.stats, field),
            after=(float(after[0]), int(after[1])))

    def search_function_score(self, query: str, k: int = 10,
                              field: str = DEFAULT_FIELD,
                              modifier: str = "log1p",
                              factor_field: str | None = None,
                              ) -> tuple[np.ndarray, np.ndarray]:
        """ES ``function_score`` with a ``field_value_factor`` over the
        per-doc token count: ``score = BM25 * modifier(word_count)``
        (modifier: ``log1p`` -> ln(1 + v), ``sqrt``, ``none``). The
        multiplicative factor breaks block-max upper-bound admissibility,
        so this routes through exhaustive accumulation with the modifier
        applied BEFORE the top-k cut (per window in the dense
        accumulator). ``factor_field`` defaults to the scored field's own
        doc length."""
        self._maybe_auto_refresh()
        all_terms = query_terms(query, _field_analyzer(self.stats, field))
        idf = self._idf(field, all_terms)
        terms = [t for t in all_terms if t in idf]
        if not terms or self.term_ds is None:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        dl = self._dl_for(field)
        fv = (dl if factor_field in (None, field, "word_count")
              else self._dl_for(factor_field))
        if modifier == "log1p":
            def mod(sc, loc):
                return sc * np.log(1.0 + fv[loc])
        elif modifier == "sqrt":
            def mod(sc, loc):
                return sc * np.sqrt(fv[loc])
        elif modifier == "none":
            def mod(sc, loc):
                return sc * fv[loc]
        else:
            raise ValueError(f"unknown modifier {modifier!r}")
        return self._search_or_fulldecode(
            field, terms, k, idf, dl, _avgdl(self.stats, field),
            score_mod=mod)

    def search_boosting(self, positive: str, negative: str,
                        negative_boost: float = 0.5, k: int = 10,
                        field: str = DEFAULT_FIELD,
                        ) -> tuple[np.ndarray, np.ndarray]:
        """ES ``boosting`` query: rank by the positive query's BM25
        score, demoting (NOT excluding — that is must_not) any doc that
        also matches the negative query by ``negative_boost``
        (``0 < negative_boost < 1`` demotes; ES allows >1 too).

        Like function_score, the multiplicative demotion breaks
        block-max upper-bound admissibility, so this routes through
        exhaustive accumulation with the demotion applied BEFORE the
        top-k cut via the ``score_mod`` hook (both accumulation
        layouts). The negative match set is the union of the negative
        terms' posting ids — one sorted-membership test per candidate
        batch, no per-row work."""
        self._maybe_auto_refresh()
        analyzer = _field_analyzer(self.stats, field)
        pos_terms = query_terms(positive, analyzer)
        idf = self._idf(field, pos_terms)
        terms = [t for t in pos_terms if t in idf]
        if not terms or self.term_ds is None:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        neg_terms = sorted(set(query_terms(negative, analyzer)))
        neg_by = (self._postings_for(field, neg_terms)
                  if neg_terms else {})
        neg_runs = [ids for t in neg_terms for ids, _tfs in
                    neg_by.get(t, [])]
        neg_ids = (np.unique(np.concatenate(neg_runs)) if neg_runs
                   else np.empty(0, np.int64))
        nb = float(negative_boost)

        def mod(sc, loc):
            if len(neg_ids) == 0:
                return sc
            pos = np.searchsorted(neg_ids, loc)
            pos = np.minimum(pos, len(neg_ids) - 1)
            hit = neg_ids[pos] == loc
            out = sc.copy()
            out[hit] *= nb
            return out

        dl = self._dl_for(field)
        return self._search_or_fulldecode(
            field, terms, k, idf, dl, _avgdl(self.stats, field),
            score_mod=mod)

    def _null_dv_ids(self, column: str) -> np.ndarray:
        """Sorted global doc ids with a null ``column`` doc-value across
        all bound segments (exists-filter support) — built lazily once
        per column (ensures the doc-values shards exist), O(missing
        docs) memory."""
        cache = getattr(self, "_null_dv_cache", None)
        if cache is None:
            cache = self._null_dv_cache = {}
        if column not in cache:
            from .aggs import build_doc_values

            build_doc_values(self.index_dir, column)
            parts = [_null_dv_ids_segment(self.index_dir, int(s), column)
                     for s in self.seg_ids]
            cache[column] = (np.sort(np.concatenate(parts))
                             if parts else np.empty(0, np.int64))
        return cache[column]

    def search_bool(self, bq: dict, k: int = 10,
                    field: str = DEFAULT_FIELD
                    ) -> tuple[np.ndarray, np.ndarray]:
        """ES ``bool`` query analogue — see ``prepare_bool_spec`` for the
        clause semantics (must / should / must_not / filter term + range,
        ``minimum_should_match``). Score = sum of BM25 contributions of
        every matching must/should clause term (clause-major, analyzed
        term order) — bitwise-identical to the distributed
        ``SegmentSearcher._score_bool`` path."""
        self._maybe_auto_refresh()
        spec = prepare_bool_spec(bq, field,
                                 _field_analyzer(self.stats, field))
        empty = (np.empty(0, np.int64), np.empty(0, np.float64))
        if self.n_docs == 0:
            return empty
        sc_terms = sorted({t for cl in (*spec["must"], *spec["should"])
                           for t in cl})
        idf = self._idf(field, sc_terms)
        by_term = (self._postings_for(
            field, [t for t in sc_terms if t in idf])
            if self.term_ds is not None else {})
        mn_terms = sorted({t for cl in spec["must_not"] for t in cl})
        mn_by = (self._postings_for(field, mn_terms)
                 if mn_terms and self.term_ds is not None else {})

        def score_runs(t):
            return by_term.get(t, [])

        if spec["must"]:
            cand = None
            for cl in spec["must"]:
                ids = _bool_clause_ids(cl, score_runs)
                cand = ids if cand is None else np.intersect1d(
                    cand, ids, assume_unique=True)
                if len(cand) == 0:
                    return empty
        elif spec["should"]:
            cand = _bool_clause_ids(
                [t for cl in spec["should"] for t in cl], score_runs)
        elif spec["filter_terms"] or spec.get("filter_any"):
            cand = None
        else:  # range-/exists-only filter context: every doc
            cand = np.arange(self.n_docs, dtype=np.int64)
        for f, t in spec["filter_terms"]:
            fb = (self._postings_for(f, [t])
                  if self.term_ds is not None else {})
            ids = _bool_clause_ids([t], lambda tt: fb.get(tt, []))
            cand = ids if cand is None else np.intersect1d(
                cand, ids, assume_unique=True)
            if len(cand) == 0:
                return empty
        for f, vs in spec.get("filter_any", ()):
            fb = (self._postings_for(f, vs)
                  if self.term_ds is not None else {})
            ids = _bool_clause_ids(vs, lambda tt: fb.get(tt, []))
            cand = ids if cand is None else np.intersect1d(
                cand, ids, assume_unique=True)
            if len(cand) == 0:
                return empty
        if cand is None or len(cand) == 0:
            return empty
        for rf, lo, hi in spec["range_dl"]:
            v = self._dl_for(_range_dl_field(rf))[cand]
            cand = cand[(v >= lo) & (v <= hi)]
            if len(cand) == 0:
                return empty
        for col in spec.get("exists", ()):
            nulls = self._null_dv_ids(col)
            if len(nulls):
                cand = cand[_drop_deleted(nulls, cand)]
                if len(cand) == 0:
                    return empty
        for cl in spec["must_not"]:
            nids = _bool_clause_ids(cl, lambda t: mn_by.get(t, []))
            if len(nids):
                cand = cand[~_in_sorted(nids, cand)]
                if len(cand) == 0:
                    return empty
        if spec["msm"] > 0 and spec["should"]:
            cnt = np.zeros(len(cand), np.int64)
            for cl in spec["should"]:
                cnt += _in_sorted(_bool_clause_ids(cl, score_runs), cand)
            cand = cand[cnt >= spec["msm"]]
            if len(cand) == 0:
                return empty
        if spec.get("msm_div") and spec["should"]:
            # terms_set: per-doc dynamic msm (see _score_bool — identical)
            cnt = np.zeros(len(cand), np.int64)
            for cl in spec["should"]:
                cnt += _in_sorted(_bool_clause_ids(cl, score_runs), cand)
            src = self._dl_for(_range_dl_field(spec["msm_src"]))
            req = np.minimum(
                len(spec["should"]),
                np.maximum(1, src[cand].astype(np.int64)
                           // spec["msm_div"]))
            cand = cand[cnt >= req]
            if len(cand) == 0:
                return empty
        if len(self._deleted):
            cand = cand[_drop_deleted(self._deleted, cand)]
            if len(cand) == 0:
                return empty
        scores = np.zeros(len(cand), dtype=np.float64)
        live = [t for t in sc_terms if t in idf]
        contribs = self._contribs_for(field, live, by_term, idf,
                                      self._dl_for(field),
                                      _avgdl(self.stats, field))
        for cl in (*spec["must"], *spec["should"]):
            for t in cl:
                if t not in idf:
                    continue
                for (ids, _tfs), contrib in zip(by_term.get(t, []),
                                                contribs.get(t, [])):
                    hit = _in_sorted(ids, cand)
                    pos = np.searchsorted(ids, cand[hit])
                    scores[hit] += contrib[pos]
        if len(cand) > k:
            kth = np.partition(scores, -k)[-k]
            keep = scores >= kth
            cand, scores = cand[keep], scores[keep]
        order = np.lexsort((cand, -scores))[:k]
        return cand[order].astype(np.int64), scores[order]

    def search_bool_prefix(self, query: str, k: int = 10,
                           field: str = DEFAULT_FIELD
                           ) -> tuple[np.ndarray, np.ndarray]:
        """ES ``match_bool_prefix``: every analyzed term but the last is
        a scored term clause in a bool ``should``; the LAST term is a
        PREFIX query — constant_score rewrite, +1.0 per matching doc (the
        same convention as the wildcard/regexp tail). msm=1: a doc
        matches on any full term OR any dictionary expansion of the
        prefix. Expansion is UNBOUNDED (Lucene prefix queries build a
        bitset over every matching term — no max_expansions cap), pruned
        to one closed dictionary range by ``expand_prefix``."""
        self._maybe_auto_refresh()
        empty = (np.empty(0, np.int64), np.empty(0, np.float64))
        seq = list(analyze(_field_analyzer(self.stats, field), query))
        if not seq or self.term_ds is None:
            return empty
        fixed, prefix = seq[:-1], seq[-1]
        exps = expand_prefix(self.index_dir, field, prefix, 1 << 30)
        uniq_fixed = sorted(set(fixed))
        idf = self._idf(field, uniq_fixed)
        live = [t for t in uniq_fixed if t in idf]
        by = self._postings_for(field, live) if live else {}
        exp_by = self._postings_for(field, exps) if exps else {}
        runs = [ids for t in live for ids, _tfs in by.get(t, [])]
        eruns = [ids for t in exps for ids, _tfs in exp_by.get(t, [])]
        if not runs and not eruns:
            return empty
        cand = np.unique(np.concatenate(runs + eruns))
        if len(self._deleted):
            cand = cand[_drop_deleted(self._deleted, cand)]
        if len(cand) == 0:
            return empty
        scores = np.zeros(len(cand), np.float64)
        contribs = self._contribs_for(field, live, by, idf,
                                      self._dl_for(field),
                                      _avgdl(self.stats, field))
        for t in live:  # lexicographic accumulation, the OR convention
            for (ids, _tfs), contrib in zip(by.get(t, []),
                                            contribs.get(t, [])):
                hit = _in_sorted(ids, cand)
                pos = np.searchsorted(ids, cand[hit])
                scores[hit] += contrib[pos]
        if eruns:
            edocs = (eruns[0] if len(eruns) == 1
                     else np.unique(np.concatenate(eruns)))
            scores[_in_sorted(edocs, cand)] += 1.0
        if len(cand) > k:
            kth = np.partition(scores, -k)[-k]
            keep = scores >= kth
            cand, scores = cand[keep], scores[keep]
        order = np.lexsort((cand, -scores))[:k]
        return cand[order].astype(np.int64), scores[order]

    def search_fuzzy(self, query: str, k: int = 10,
                     field: str = DEFAULT_FIELD, fuzziness="AUTO",
                     prefix_length: int = 1, max_expansions: int = 50
                     ) -> tuple[np.ndarray, np.ndarray]:
        """ES match-with-fuzziness analogue: each analyzed query term
        expands against the term dictionary (``expand_fuzzy``: shared
        prefix, Levenshtein <= fuzziness, top-df cap), then the union of
        expansions is scored as a plain OR query (each expanded term with
        its own df/idf) — bitwise-identical to the distributed rewrite
        in ``search()``."""
        self._maybe_auto_refresh()
        empty = (np.empty(0, np.int64), np.empty(0, np.float64))
        if self.term_ds is None:
            return empty
        qterms = query_terms(query, _field_analyzer(self.stats, field))
        exp = sorted({e for t in qterms
                      for e in expand_fuzzy(self.index_dir, field, t,
                                            fuzziness, prefix_length,
                                            max_expansions)})
        idf = self._idf(field, exp)
        terms = [t for t in exp if t in idf]
        if not terms:
            return empty
        return self._search_or_fulldecode(field, terms, k, idf,
                                          self._dl_for(field),
                                          _avgdl(self.stats, field))

    def search_wildcard(self, pattern: str, k: int = 10,
                        field: str = DEFAULT_FIELD
                        ) -> tuple[np.ndarray, np.ndarray]:
        """ES wildcard query analogue (``*`` any run, ``?`` one char):
        dictionary terms matching the raw (unanalyzed) pattern, docs
        containing any of them, constant score 1.0, doc_id order — the
        Lucene constant_score multi-term rewrite."""
        self._maybe_auto_refresh()
        empty = (np.empty(0, np.int64), np.empty(0, np.float64))
        if self.term_ds is None:
            return empty
        exp = expand_wildcard(self.index_dir, field, pattern)
        return self._union_const_topk(field, exp, k)

    def _union_const_topk(self, field: str, exp: list[str], k: int
                          ) -> tuple[np.ndarray, np.ndarray]:
        """Shared constant_score multi-term tail: union the expanded
        terms' postings, drop tombstones, first-k by doc_id."""
        empty = (np.empty(0, np.int64), np.empty(0, np.float64))
        if not exp:
            return empty
        by_term = self._postings_for(field, exp)
        runs = [ids for t in exp for ids, _tfs in by_term.get(t, [])]
        if not runs:
            return empty
        ids = runs[0] if len(runs) == 1 else np.unique(np.concatenate(runs))
        if len(self._deleted):
            ids = ids[_drop_deleted(self._deleted, ids)]
        ids = ids[:k]
        return ids.astype(np.int64), np.ones(len(ids), np.float64)

    def search_regexp(self, pattern: str, k: int = 10,
                      field: str = DEFAULT_FIELD
                      ) -> tuple[np.ndarray, np.ndarray]:
        """ES regexp query analogue: dictionary terms whose entire text
        matches the (unanalyzed, implicitly anchored) RE2 pattern, docs
        containing any of them, constant score 1.0, doc_id order — the
        same Lucene constant_score multi-term rewrite as wildcard."""
        self._maybe_auto_refresh()
        if self.term_ds is None:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        exp = expand_regexp(self.index_dir, field, pattern)
        return self._union_const_topk(field, exp, k)

    #: request-cache capacity (ES shard-request-cache analogue): exact
    #: (mode, field, query, k) top-k results, LRU, dropped on epoch swap
    _REQUEST_CACHE_CAP = 1024

    def search(self, query: str, k: int = 10,
               field: str = DEFAULT_FIELD,
               mode: str = "or",
               or_strategy: str = "auto") -> tuple[np.ndarray, np.ndarray]:
        """``or_strategy``: 'exact' always decodes every query term's
        postings (lexicographic accumulation); 'blockmax' runs the
        disjunctive block-max path; 'auto' picks blockmax when the df skew
        suggests skipping pays (rare term + long common lists). Scores are
        bitwise-identical across those three. 'pruned' (OPT-IN, never
        chosen by auto) serves high-df terms from the statically-pruned
        sidecar when one is built for this epoch (index/pruned.py) —
        approximate for dense ORs; see ``last_pruned_bound``.

        Repeated identical requests are served from an exact result cache
        (the ES shard-request-cache analogue): keyed on the full request,
        holding the returned (ids, scores) verbatim, dropped wholesale on
        any epoch swap (refresh/merge/append) — a hit changes nothing but
        latency."""
        self._maybe_auto_refresh()
        rq_key = (mode, field, query, int(k), or_strategy)
        hit = self._request_cache.get(rq_key)
        if hit is not None:
            self._request_cache.move_to_end(rq_key)
            return hit
        res = self._search_uncached(query, k, field, mode, or_strategy)
        # freeze before caching: the same array objects are handed to every
        # future hit, so an in-place mutation by one caller must not poison
        # the cache (the ES request cache is safe because it stores bytes)
        for arr in res:
            if isinstance(arr, np.ndarray):
                arr.setflags(write=False)
        self._request_cache[rq_key] = res
        while len(self._request_cache) > self._REQUEST_CACHE_CAP:
            self._request_cache.popitem(last=False)
        return res

    def _search_uncached(self, query: str, k: int, field: str, mode: str,
                         or_strategy: str) -> tuple[np.ndarray, np.ndarray]:
        self.last_pruned_bound = 0.0  # only _search_or_pruned sets it
        if mode == "fuzzy":
            return self.search_fuzzy(query, k, field)
        if mode == "wildcard":
            return self.search_wildcard(query, k, field)
        all_terms = query_terms(query, _field_analyzer(self.stats, field))
        idf = self._idf(field, all_terms)
        terms = [t for t in all_terms if t in idf]
        if mode == "phrase":
            ids, sc, _fq = PhraseSearcher(self).search(query, k, field)
            return ids, sc
        if mode == "and":
            if len(terms) != len(all_terms) or not terms or self.term_ds is None:
                return np.empty(0, np.int64), np.empty(0, np.float64)
            return self._search_and_blockskip(
                field, terms, k, idf, self._dl_for(field),
                _avgdl(self.stats, field))
        if not terms or self.term_ds is None:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        dl = self._dl_for(field)
        avgdl = _avgdl(self.stats, field)
        if or_strategy == "pruned":  # opt-in approximate (index/pruned.py)
            return self._search_or_pruned(field, terms, k, idf, dl, avgdl)
        if (or_strategy in ("auto", "blockmax") and len(terms) == 1
                and (or_strategy == "blockmax"
                     or len(self.seg_ids) <= self.BLOCKMAX_MAX_SEGMENTS)
                and self._df_cache.get((field, terms[0]), 0)
                > self._SINGLE_TERM_BLOCKMAX_MIN_DF):
            res = self._search_single_term_blockmax(
                field, terms[0], k, idf, dl, avgdl)
            if res is not None:
                return res
        use_blockmax = or_strategy == "blockmax"
        if or_strategy == "auto" and len(terms) > 1:
            # df is already hot: the _idf call above filled _df_cache
            dfs = sorted(self._df_cache.get((field, t), 0) for t in terms)
            # skipping pays only when the decode volume is large AND a
            # genuinely RARE term exists (its idf x max_impact drives the
            # theta bound up so the giant lists' blocks prune). Measured
            # at ~100k docs (sum df ~2e5): exact full-decode beats
            # block-max both cold and warm, so the volume gate sits at
            # 500k postings. Re-measured at 3.9M docs / 62 segments
            # (round 4): with a rare term block-max wins 2-7x ('the of a
            # w0100 w2000': 120 vs 620 ms cold); without one it loses
            # 3-6x ('data search': 1030 vs 254 ms) — this gate picks
            # correctly in both regimes. NOTE segment count is the hidden
            # variable: at 500 uncompacted segments per-run probe
            # overhead makes block-max lose even WITH a rare term
            # (592 vs 347 ms on the same query) — compaction
            # (compact_to / auto_compact_segments) is the serving-side
            # prerequisite, not a routing decision.
            # the segment-count term encodes that measurement: on a
            # many-segment index (read-only, or lock held, so bind-time
            # auto-compaction couldn't run) exact decode wins regardless
            use_blockmax = (bool(dfs)
                            and len(self.seg_ids) <= self.BLOCKMAX_MAX_SEGMENTS
                            and sum(dfs) > 500_000
                            and dfs[0] * 8 < sum(dfs) - dfs[0])
        if use_blockmax:
            return self._search_or_blockmax(field, terms, k, idf, dl, avgdl)
        return self._search_or_fulldecode(field, terms, k, idf, dl, avgdl)

    def search_multi(self, query: str, k: int = 10,
                     fields: tuple = (DEFAULT_FIELD,),
                     combine: str = "most_fields"
                     ) -> tuple[np.ndarray, np.ndarray]:
        """ES multi_match analogue across indexed fields.

        ``most_fields``: per-field (boost x) BM25 scores (each field's own
        analyzer, df, dl, avgdl; idf over the global doc count) SUMMED; a
        doc matching in any field is a candidate. ``best_fields``: the MAX
        boosted per-field score (dis_max, tie_breaker=0). ``fields``
        entries accept the ES ``"name^boost"`` syntax. Tie-break (score
        desc, doc_id asc). Accumulation is (field, term)-major over
        ascending doc ids — bitwise-identical to the distributed
        SegmentSearcher multi path (same per-doc addition order)."""
        if combine not in ("most_fields", "best_fields"):
            raise ValueError(f"unknown multi_type {combine!r}")
        self._maybe_auto_refresh()
        empty = (np.empty(0, np.int64), np.empty(0, np.float64))
        if self.term_ds is None:
            return empty
        parsed = _parse_boosted_fields(fields)
        field_runs = []  # (field, boost, terms, by_term, dl, avgdl, idf)
        for f, boost in parsed:
            all_terms = query_terms(query, _field_analyzer(self.stats, f))
            idf = self._idf(f, all_terms)
            terms = [t for t in all_terms if t in idf]
            if not terms:
                continue
            field_runs.append((f, boost, terms, self._postings_for(f, terms),
                               self._dl_for(f), _avgdl(self.stats, f), idf))
        runs = [ids for _f, _b, terms, bt, _dl, _ad, _idf in field_runs
                for t in terms for ids, _tfs in bt.get(t, [])]
        if not runs:
            return empty
        plain_sum = (combine == "most_fields"
                     and all(b == 1.0 for _f, b in parsed))
        loc = np.unique(np.concatenate(runs))
        sc = np.zeros(len(loc), dtype=np.float64)
        fsc = sc if plain_sum else np.zeros(len(loc))
        for f, boost, terms, by_term, dl, avgdl, idf in field_runs:
            if not plain_sum:
                fsc[:] = 0.0
            contribs = self._contribs_for(f, terms, by_term, idf, dl, avgdl)
            for t in terms:  # (field, term)-major accumulation order
                for (ids, _tfs), contrib in zip(by_term.get(t, []),
                                                contribs.get(t, [])):
                    pos = np.searchsorted(loc, ids)
                    fsc[pos] += contrib
            if not plain_sum:
                if combine == "best_fields":
                    np.maximum(sc, boost * fsc, out=sc)
                else:
                    sc += boost * fsc
        if len(self._deleted):
            keep = _drop_deleted(self._deleted, loc)
            loc, sc = loc[keep], sc[keep]
        if len(loc) > k:
            kth = np.partition(sc, -k)[-k]
            keep = sc >= kth
            loc, sc = loc[keep], sc[keep]
        order = np.lexsort((loc, -sc))[:k]
        return loc[order].astype(np.int64), sc[order]


def _phrase_freq(seq_positions: list[np.ndarray]) -> int:
    """Number of phrase occurrences given per-sequence-term position arrays
    (ascending) for ONE document."""
    ok = seq_positions[0]
    for i in range(1, len(seq_positions)):
        if len(ok) == 0:
            return 0
        ok = ok[np.isin(ok + i, seq_positions[i], assume_unique=False)]
    return int(len(ok))


def _positions_by_doc(ids: np.ndarray, tfs: np.ndarray,
                      positions_enc: bytes) -> dict[int, np.ndarray]:
    """Decode one term-run's positions stream -> {doc_id: positions asc}."""
    total = int(tfs.sum())
    vals = codec.varint_decode(np.frombuffer(positions_enc, dtype=np.uint8),
                               total)
    starts = np.r_[0, np.cumsum(tfs)[:-1]].astype(np.int64)
    flat = codec.delta_decode_runs(vals, starts)
    out: dict[int, np.ndarray] = {}
    for j, d in enumerate(ids):
        s = int(starts[j])
        e = s + int(tfs[j])
        out[int(d)] = flat[s:e]
    return out


class PhraseSearcher:
    """Phrase (match_phrase analogue) search over a positions-enabled index.

    Requires ``BuildConfig(index_positions=True)``. Scoring (documented
    convention, mirrored by the pytest oracle): docs where the exact token
    sequence occurs, scored ``sum(idf of unique terms, lex order) *
    bm25_tf_impact(phrase_freq, dl, avgdl)``; tie-break (score desc,
    doc_id asc).
    """

    def __init__(self, local: "LocalSearcher"):
        self.local = local

    def search(self, query: str, k: int = 10,
               field: str = DEFAULT_FIELD,
               within: np.ndarray | None = None,
               ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """``within``: optional sorted doc-id array restricting the
        candidate set (the rescore window) — positions are still read
        term-major, but the per-doc scoring loop is bounded by it."""
        lo = self.local
        if (lo.term_ds is not None
                and not blobs.has_positions(lo.term_ds.schema)):
            raise ValueError(
                "index was built without positions "
                "(BuildConfig.index_positions=True required)")
        seq = list(analyze(_field_analyzer(lo.stats, field), query))
        if not seq:
            return (np.empty(0, np.int64), np.empty(0, np.float64),
                    np.empty(0, np.int64))
        uniq = sorted(set(seq))
        idf = lo._idf(field, uniq)
        if len(idf) != len(uniq):  # a term absent anywhere -> no phrase
            return (np.empty(0, np.int64), np.empty(0, np.float64),
                    np.empty(0, np.int64))
        tt = lo._read_terms(["term", "df"], {field: uniq}, positions=True)
        per_term_docs: dict[str, list[np.ndarray]] = {t: [] for t in uniq}
        per_term_pos: dict[str, dict[int, np.ndarray]] = {t: {} for t in uniq}
        for i in range(tt.num_rows):
            t = tt["term"][i].as_py()
            enc_pos = tt["positions_enc"][i].as_py()
            if enc_pos is None:
                raise ValueError(
                    "index was built without positions "
                    "(BuildConfig.index_positions=True required)")
            ids, tfs = codec.decode_postings(
                tt["doc_ids_enc"][i].as_py(), tt["tfs_enc"][i].as_py(),
                int(tt["df"][i].as_py()))
            per_term_docs[t].append(ids)
            per_term_pos[t].update(_positions_by_doc(ids, tfs, enc_pos))
        cand = None
        for t in uniq:
            docs_t = (np.concatenate(per_term_docs[t])
                      if per_term_docs[t] else np.empty(0, np.int64))
            docs_t = np.sort(docs_t)
            cand = docs_t if cand is None else np.intersect1d(
                cand, docs_t, assume_unique=True)
            if len(cand) == 0:
                return (np.empty(0, np.int64), np.empty(0, np.float64),
                        np.empty(0, np.int64))
        if within is not None:
            cand = np.intersect1d(cand, within, assume_unique=True)
            if len(cand) == 0:
                return (np.empty(0, np.int64), np.empty(0, np.float64),
                        np.empty(0, np.int64))
        if len(lo._deleted):
            cand = cand[_drop_deleted(lo._deleted, cand)]
        dl = lo._dl_for(field)
        avgdl = _avgdl(lo.stats, field)
        idf_sum = float(sum(idf[t] for t in uniq))
        hits, freqs = [], []
        for d in cand:
            fq = _phrase_freq([per_term_pos[t][int(d)] for t in seq])
            if fq > 0:
                hits.append(int(d))
                freqs.append(fq)
        if not hits:
            return (np.empty(0, np.int64), np.empty(0, np.float64),
                    np.empty(0, np.int64))
        hits_a = np.array(hits, dtype=np.int64)
        freqs_a = np.array(freqs, dtype=np.float64)
        scores = idf_sum * codec.bm25_tf_impact(freqs_a, dl[hits_a], avgdl)
        order = np.lexsort((hits_a, -scores))[:k]
        return hits_a[order], scores[order], freqs_a[order].astype(np.int64)

    def search_prefix(self, query: str, k: int = 10,
                      field: str = DEFAULT_FIELD, max_expansions: int = 50,
                      ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """ES ``match_phrase_prefix`` analogue: the analyzed query's last
        token is a PREFIX — the phrase matches wherever the fixed tokens
        occur consecutively followed by any dictionary term carrying the
        prefix (first ``max_expansions`` in term order, the Lucene
        rewrite). Scoring convention (documented, mirrored by tests):
        ``(sum(idf of unique fixed terms, lex order) + idf(min(n, sum df
        of matched expansions)))  * bm25_tf_impact(freq, dl, avgdl)``
        where freq counts positions completing the phrase with ANY
        expansion; tie-break (score desc, doc_id asc)."""
        lo = self.local
        if (lo.term_ds is not None
                and not blobs.has_positions(lo.term_ds.schema)):
            raise ValueError(
                "index was built without positions "
                "(BuildConfig.index_positions=True required)")
        seq = list(analyze(_field_analyzer(lo.stats, field), query))
        empty = (np.empty(0, np.int64), np.empty(0, np.float64),
                 np.empty(0, np.int64))
        if not seq:
            return empty
        fixed, prefix = seq[:-1], seq[-1]
        exps = expand_prefix(lo.index_dir, field, prefix, max_expansions)
        if not exps:
            return empty
        uniq_fixed = sorted(set(fixed))
        idf = lo._idf(field, uniq_fixed)
        if len(idf) != len(uniq_fixed):
            return empty
        uniq = sorted(set(uniq_fixed) | set(exps))
        tt = lo._read_terms(["term", "df"], {field: uniq}, positions=True)
        per_term_docs: dict[str, list[np.ndarray]] = {t: [] for t in uniq}
        per_term_pos: dict[str, dict[int, np.ndarray]] = {t: {} for t in uniq}
        df_of: dict[str, int] = {t: 0 for t in uniq}
        for i in range(tt.num_rows):
            t = tt["term"][i].as_py()
            enc_pos = tt["positions_enc"][i].as_py()
            if enc_pos is None:
                raise ValueError(
                    "index was built without positions "
                    "(BuildConfig.index_positions=True required)")
            ids, tfs = codec.decode_postings(
                tt["doc_ids_enc"][i].as_py(), tt["tfs_enc"][i].as_py(),
                int(tt["df"][i].as_py()))
            per_term_docs[t].append(ids)
            per_term_pos[t].update(_positions_by_doc(ids, tfs, enc_pos))
            df_of[t] += len(ids)
        cand = None
        for t in uniq_fixed:
            docs_t = (np.concatenate(per_term_docs[t])
                      if per_term_docs[t] else np.empty(0, np.int64))
            docs_t = np.sort(docs_t)
            cand = docs_t if cand is None else np.intersect1d(
                cand, docs_t, assume_unique=True)
            if len(cand) == 0:
                return empty
        exp_runs = [np.sort(np.concatenate(per_term_docs[t]))
                    for t in exps if per_term_docs[t]]
        if not exp_runs:
            return empty
        exp_docs = (exp_runs[0] if len(exp_runs) == 1
                    else np.unique(np.concatenate(exp_runs)))
        cand = exp_docs if cand is None else np.intersect1d(
            cand, exp_docs, assume_unique=True)
        if len(lo._deleted):
            cand = cand[_drop_deleted(lo._deleted, cand)]
        if len(cand) == 0:
            return empty
        dl = lo._dl_for(field)
        avgdl = _avgdl(lo.stats, field)
        idf_fixed = float(sum(idf[t] for t in uniq_fixed))
        exp_df = min(int(lo.stats["n_docs"]),
                     sum(df_of[t] for t in exps))
        idf_slot = float(codec.bm25_idf(exp_df, int(lo.stats["n_docs"])))
        hits, freqs = [], []
        off = len(fixed)
        for d in cand:
            di = int(d)
            last = np.concatenate([per_term_pos[t][di] for t in exps
                                   if di in per_term_pos[t]])
            if len(last) == 0:
                continue
            if not fixed:
                fq = len(last)
            else:
                chain = [per_term_pos[t][di] for t in fixed]
                ok = chain[0]
                for i in range(1, len(chain)):
                    ok = ok[np.isin(ok + i, chain[i], assume_unique=False)]
                    if len(ok) == 0:
                        break
                fq = (int(np.isin(ok + off, last).sum())
                      if len(ok) else 0)
            if fq > 0:
                hits.append(di)
                freqs.append(fq)
        if not hits:
            return empty
        hits_a = np.array(hits, dtype=np.int64)
        freqs_a = np.array(freqs, dtype=np.float64)
        scores = (idf_fixed + idf_slot) * codec.bm25_tf_impact(
            freqs_a, dl[hits_a], avgdl)
        order = np.lexsort((hits_a, -scores))[:k]
        return hits_a[order], scores[order], freqs_a[order].astype(np.int64)

    def span_near(self, clauses: list[str], slop: int = 0,
                  field: str = DEFAULT_FIELD) -> np.ndarray:
        """ES ``span_near`` with ``in_order=true``: docs where the clause
        terms occur in order with at most ``slop`` total intervening
        positions (``slop=0`` = exact adjacency = phrase). Returns the
        sorted matching doc ids (span queries are match predicates here;
        callers score the matched set as ES does with sloppy-freq — the
        doc set is the oracle-checkable contract).

        Per-doc cost is a vectorized DP over the clause position arrays:
        ``mincost(q) = q - 1 - max_{p<q}(p - mincost(p))`` per step, so
        each step is one searchsorted + one prefix-max over the previous
        clause's positions — O(total positions) per doc, no pairwise
        blowup. Each clause is a single analyzed term (span_term)."""
        lo = self.local
        if (lo.term_ds is not None
                and not blobs.has_positions(lo.term_ds.schema)):
            raise ValueError(
                "index was built without positions "
                "(BuildConfig.index_positions=True required)")
        analyzer = _field_analyzer(lo.stats, field)
        seq: list[str] = []
        for c in clauses:
            toks = list(analyze(analyzer, c))
            if len(toks) != 1:
                raise ValueError(
                    f"span_near clause {c!r} must analyze to one term")
            seq.append(toks[0])
        if not seq:
            return np.empty(0, np.int64)
        uniq = sorted(set(seq))
        tt = lo._read_terms(["term", "df"], {field: uniq}, positions=True)
        per_term_docs: dict[str, list[np.ndarray]] = {t: [] for t in uniq}
        per_term_pos: dict[str, dict[int, np.ndarray]] = {t: {} for t in uniq}
        for i in range(tt.num_rows):
            t = tt["term"][i].as_py()
            enc_pos = tt["positions_enc"][i].as_py()
            if enc_pos is None:
                raise ValueError(
                    "index was built without positions "
                    "(BuildConfig.index_positions=True required)")
            ids, tfs = codec.decode_postings(
                tt["doc_ids_enc"][i].as_py(), tt["tfs_enc"][i].as_py(),
                int(tt["df"][i].as_py()))
            per_term_docs[t].append(ids)
            per_term_pos[t].update(_positions_by_doc(ids, tfs, enc_pos))
        cand = None
        for t in uniq:
            docs_t = (np.sort(np.concatenate(per_term_docs[t]))
                      if per_term_docs[t] else np.empty(0, np.int64))
            cand = docs_t if cand is None else np.intersect1d(
                cand, docs_t, assume_unique=True)
            if len(cand) == 0:
                return np.empty(0, np.int64)
        if len(lo._deleted):
            cand = cand[_drop_deleted(lo._deleted, cand)]
        hits = []
        for d in cand:
            di = int(d)
            chain = [per_term_pos[t][di] for t in seq]
            # DP over the ordered chain: carry, per position p of the
            # current clause, the minimal total gap of any in-order
            # span ending at p; prefix-max of (p - cost) makes each
            # transition a binary search instead of a cross product.
            cost = np.zeros(len(chain[0]), dtype=np.int64)
            best = chain[0] - cost  # p - cost(p), prefix-maxed below
            alive = True
            for i in range(1, len(chain)):
                prefmax = np.maximum.accumulate(best)
                q = chain[i]
                idx = np.searchsorted(chain[i - 1], q) - 1
                ok = idx >= 0
                if not ok.any():
                    alive = False
                    break
                q = q[ok]
                cost = q - 1 - prefmax[idx[ok]]
                best = q - cost
                chain[i] = q
            if alive and (cost <= slop).any():
                hits.append(di)
        return np.array(sorted(hits), dtype=np.int64)


    def intervals_all_of(self, clauses: list[str], max_gaps: int = 0,
                         ordered: bool = False,
                         field: str = DEFAULT_FIELD) -> np.ndarray:
        """ES ``intervals`` query, ``all_of`` source: docs where every
        clause term occurs inside one window with at most ``max_gaps``
        non-matching positions between the chosen occurrences.

        ``ordered=true`` is exactly the span_near DP (total in-order
        gap budget), so it delegates. ``ordered=false`` is the minimal
        covering window over k position lists: merge the doc's per-term
        positions, two-pointer sweep for the smallest span containing
        all k terms, match iff span_width - k <= max_gaps. O(total
        positions) per doc. Clause terms must be distinct single tokens
        (the span_term restriction shared with span_near)."""
        if ordered:
            return self.span_near(clauses, slop=max_gaps, field=field)
        lo = self.local
        if (lo.term_ds is not None
                and not blobs.has_positions(lo.term_ds.schema)):
            raise ValueError(
                "index was built without positions "
                "(BuildConfig.index_positions=True required)")
        analyzer = _field_analyzer(lo.stats, field)
        seq: list[str] = []
        for c in clauses:
            toks = list(analyze(analyzer, c))
            if len(toks) != 1:
                raise ValueError(
                    f"intervals clause {c!r} must analyze to one term")
            seq.append(toks[0])
        if len(set(seq)) != len(seq):
            raise ValueError("intervals all_of clauses must be distinct")
        if not seq:
            return np.empty(0, np.int64)
        uniq = sorted(set(seq))
        tt = lo._read_terms(["term", "df"], {field: uniq}, positions=True)
        per_term_docs: dict[str, list[np.ndarray]] = {t: [] for t in uniq}
        per_term_pos: dict[str, dict[int, np.ndarray]] = {t: {} for t in uniq}
        for i in range(tt.num_rows):
            t = tt["term"][i].as_py()
            enc_pos = tt["positions_enc"][i].as_py()
            if enc_pos is None:
                raise ValueError(
                    "index was built without positions "
                    "(BuildConfig.index_positions=True required)")
            ids, tfs = codec.decode_postings(
                tt["doc_ids_enc"][i].as_py(), tt["tfs_enc"][i].as_py(),
                int(tt["df"][i].as_py()))
            per_term_docs[t].append(ids)
            per_term_pos[t].update(_positions_by_doc(ids, tfs, enc_pos))
        cand = None
        for t in uniq:
            docs_t = (np.sort(np.concatenate(per_term_docs[t]))
                      if per_term_docs[t] else np.empty(0, np.int64))
            cand = docs_t if cand is None else np.intersect1d(
                cand, docs_t, assume_unique=True)
            if len(cand) == 0:
                return np.empty(0, np.int64)
        if len(lo._deleted):
            cand = cand[_drop_deleted(lo._deleted, cand)]
        k = len(seq)
        hits = []
        for d in cand:
            di = int(d)
            arrs = [per_term_pos[t][di] for t in seq]
            lab = np.concatenate(
                [np.full(len(a), i, np.int64) for i, a in enumerate(arrs)])
            pos = np.concatenate(arrs)
            o = np.argsort(pos)
            pos, lab = pos[o], lab[o]
            cnt = np.zeros(k, np.int64)
            have, left, best = 0, 0, 1 << 60
            for right in range(len(pos)):
                c = lab[right]
                cnt[c] += 1
                if cnt[c] == 1:
                    have += 1
                while have == k:
                    best = min(best, int(pos[right] - pos[left]) + 1)
                    cl = lab[left]
                    cnt[cl] -= 1
                    if cnt[cl] == 0:
                        have -= 1
                    left += 1
            if best - k <= max_gaps:
                hits.append(di)
        return np.array(sorted(hits), dtype=np.int64)


def highlight_matches(local: "LocalSearcher", query: str,
                      field: str = DEFAULT_FIELD) -> pa.Table:
    """ES highlighter primitive: for every doc matching an OR match query,
    the FIRST occurrence position (token index) of each query term present
    — the fragment anchor an ES unified-highlighter builds snippets
    around. We anchor on token positions from the positional index rather
    than re-analyzed character offsets (the index stores positions, not
    offsets; a snippet stage joins the stored text by doc range, as
    ``export_matches`` does).

    Fully vectorized: the positions stream stores each run's first value
    absolute (codec.delta_encode_runs), so the per-doc first position is
    ``varint_decode(positions_enc)[run_starts]`` — no per-doc loop and no
    full position decode. Requires ``BuildConfig(index_positions=True)``.

    Returns (doc_id, term, first_pos) sorted by (doc_id, term).
    """
    lo = local
    if (lo.term_ds is not None
            and not blobs.has_positions(lo.term_ds.schema)):
        raise ValueError("index was built without positions "
                         "(BuildConfig.index_positions=True required)")
    terms = sorted(set(analyze(_field_analyzer(lo.stats, field), query)))
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "term": pa.array([], pa.string()),
                      "first_pos": pa.array([], pa.int64())})
    if not terms:
        return empty
    tt = lo._read_terms(["term", "df"], {field: terms}, positions=True)
    out_d, out_t, out_p = [], [], []
    for i in range(tt.num_rows):
        enc_pos = tt["positions_enc"][i].as_py()
        if enc_pos is None:
            raise ValueError("index was built without positions "
                             "(BuildConfig.index_positions=True required)")
        ids, tfs = codec.decode_postings(
            tt["doc_ids_enc"][i].as_py(), tt["tfs_enc"][i].as_py(),
            int(tt["df"][i].as_py()))
        if len(lo._deleted):
            keep = _drop_deleted(lo._deleted, ids)
            if not keep.any():
                continue
        else:
            keep = None
        starts = np.r_[0, np.cumsum(tfs)[:-1]].astype(np.int64)
        vals = codec.varint_decode(
            np.frombuffer(enc_pos, dtype=np.uint8), int(tfs.sum()))
        firsts = vals[starts]
        if keep is not None:
            ids, firsts = ids[keep], firsts[keep]
        out_d.append(ids)
        out_t.extend([tt["term"][i].as_py()] * len(ids))
        out_p.append(firsts)
    if not out_d:
        return empty
    d = np.concatenate(out_d)
    p = np.concatenate(out_p).astype(np.int64)
    t = np.array(out_t, dtype=object)
    order = np.lexsort((t, d))
    return pa.table({"doc_id": pa.array(d[order], pa.int64()),
                     "term": pa.array(t[order].tolist(), pa.string()),
                     "first_pos": pa.array(p[order], pa.int64())})


def search_inprocess(index_dir: str, queries: pa.Table | list[dict],
                     searcher: LocalSearcher | None = None) -> pa.Table:
    """Single-process query path over a (reusable) LocalSearcher."""
    qrows = queries.to_pylist() if isinstance(queries, pa.Table) else list(queries)
    searcher = searcher or LocalSearcher(index_dir)
    out_q, out_r, out_d, out_s = [], [], [], []
    for q in qrows:
        if q.get("bool") is not None:
            bq = q["bool"]
            if isinstance(bq, str):
                import json as _json
                bq = _json.loads(bq)
            ids, sc = searcher.search_bool(
                bq, int(q.get("k", 10)), q.get("field") or DEFAULT_FIELD)
        elif q.get("mode") == "fuzzy":
            ids, sc = searcher.search_fuzzy(
                q["query"], int(q.get("k", 10)),
                q.get("field") or DEFAULT_FIELD,
                q.get("fuzziness", "AUTO"),
                int(q.get("prefix_length", 1)),
                int(q.get("max_expansions", 50)))
        elif q.get("mode") == "wildcard":
            ids, sc = searcher.search_wildcard(
                q["query"], int(q.get("k", 10)),
                q.get("field") or DEFAULT_FIELD)
        elif q.get("mode") == "regexp":
            ids, sc = searcher.search_regexp(
                q["query"], int(q.get("k", 10)),
                q.get("field") or DEFAULT_FIELD)
        elif q.get("mode") == "boosting":
            ids, sc = searcher.search_boosting(
                q["query"], q.get("negative", ""),
                float(q.get("negative_boost", 0.5)),
                int(q.get("k", 10)), q.get("field") or DEFAULT_FIELD)
        elif q.get("fields"):
            ids, sc = searcher.search_multi(
                q["query"], int(q.get("k", 10)), tuple(q["fields"]),
                q.get("multi_type", "most_fields"))
        else:
            ids, sc = searcher.search(q["query"], int(q.get("k", 10)),
                                      q.get("field") or DEFAULT_FIELD,
                                      q.get("mode", "or"))
        for r, (i, s) in enumerate(zip(ids, sc), start=1):
            out_q.append(int(q["query_id"])); out_r.append(r)
            out_d.append(int(i)); out_s.append(float(s))
    return pa.table({
        "query_id": pa.array(out_q, pa.int64()),
        "rank": pa.array(out_r, pa.int64()),
        "doc_id": pa.array(out_d, pa.int64()),
        "score": pa.array(out_s, pa.float64()),
    })


def search(index_dir: str, queries: pa.Table | list[dict],
           cfg: SearchConfig | None = None) -> pa.Table:
    """Run BM25 top-k for a query table -> (query_id, rank, doc_id, score).

    ``queries`` columns: query_id, query, k (schema.QUERIES); an optional
    ``field`` key targets a non-default indexed field.
    """
    cfg = cfg or SearchConfig()
    stats = _load_stats(index_dir)
    prepared = _prepare(queries, stats)
    rewritten = []
    for qid, field, terms, k, mode in prepared:
        if isinstance(mode, str) and mode.startswith("fuzzy:"):
            # multi-term rewrite: union of per-term expansions, then plain
            # OR scoring over the expanded set (Lucene blended rewrite
            # simplified to per-term idf — documented in expand_fuzzy)
            _tag, fz, plen, mx = mode.split(":")
            exp = sorted({e for t in terms
                          for e in expand_fuzzy(index_dir, field, t, fz,
                                                int(plen), int(mx))})
            rewritten.append((qid, field, exp, k, "or"))
        elif mode == "wildcard":
            exp = expand_wildcard(index_dir, field, terms[0])
            rewritten.append((qid, field, exp, k, "union_const"))
        elif mode == "regexp":
            exp = expand_regexp(index_dir, field, terms[0])
            rewritten.append((qid, field, exp, k, "union_const"))
        else:
            rewritten.append((qid, field, terms, k, mode))
    prepared = rewritten
    for _qid, field, _terms, _k, mode in prepared:
        if mode == "phrase":
            if not stats.get("index_positions"):
                raise ValueError(
                    "phrase queries require an index built with "
                    "BuildConfig(index_positions=True)")
    by_field: dict[str, list[str]] = {}
    has_bool = False
    exists_cols: set[str] = set()
    for _qid, field, terms, _k, _m in prepared:
        if _m == "bool":
            has_bool = True
            for f, ts in terms["load"].items():
                by_field.setdefault(f, []).extend(ts)
            by_field.setdefault(field, [])  # avgdl for the scored field
            exists_cols.update(terms.get("exists", ()))
        elif isinstance(_m, str) and _m.startswith("boosting:"):
            by_field.setdefault(field, []).extend(terms["pos"])
            by_field[field].extend(terms["neg"])
        elif isinstance(terms, dict):  # multi_match: {field: [terms]}
            for f, ts in terms.items():
                by_field.setdefault(f, []).extend(ts)
        else:
            by_field.setdefault(field, []).extend(terms)
    by_field = {f: sorted(set(ts)) for f, ts in by_field.items()}
    if exists_cols:
        # exists filters read doc-values shards in the actors; build them
        # ONCE on the driver so actors never race on shard creation
        from .aggs import build_doc_values

        for colx in sorted(exists_cols):
            build_doc_values(index_dir, colx)
    idf, _dfs, _n = load_global_idf(index_dir, by_field)
    avgdl_by_field = {f: _avgdl(stats, f) for f in by_field}
    seg_ids, _vis = _visible_seg_ids(index_dir, stats)
    empty = pa.table(
        {"query_id": pa.array([], pa.int64()), "rank": pa.array([], pa.int64()),
         "doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
    )
    if not seg_ids or (not idf and not has_bool):
        return empty

    prepared_ref = ray.put(prepared)
    idf_ref = ray.put(idf)
    per_segment = (
        rd.from_items([{"segment_id": s} for s in seg_ids])
        .map_batches(
            SegmentSearcher,
            fn_constructor_kwargs={
                "index_dir": index_dir,
                "prepared_ref": prepared_ref,
                "idf_ref": idf_ref,
                "avgdl_by_field": avgdl_by_field,
                "use_maxscore": cfg.use_maxscore,
            },
            batch_format="pyarrow",
            batch_size=cfg.segments_per_batch,
            concurrency=cfg.concurrency,
        )
    )
    import pandas as pd

    k_of = {qid: k for qid, _f, _t, k, _m in prepared}

    def merge_topk(df: pd.DataFrame) -> pd.DataFrame:
        qid = int(df["query_id"].iloc[0])
        k = k_of[qid]
        df = df.sort_values(["score", "doc_id"], ascending=[False, True]).head(k)
        df = df.reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[["query_id", "rank", "doc_id", "score"]]

    merged = (
        per_segment.groupby("query_id")
        .map_groups(merge_topk, batch_format="pandas")
        .to_pandas()
    )
    if len(merged) == 0:
        return empty
    merged = merged.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(merged, preserve_index=False)
