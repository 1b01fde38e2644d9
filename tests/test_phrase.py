"""Positional index + phrase queries vs a brute-force oracle."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from elasticsearch_data_loader_ray import fixtures
from elasticsearch_data_loader_ray.functions.analyzers import analyze
from elasticsearch_data_loader_ray.index import codec
from elasticsearch_data_loader_ray.index.build import BuildConfig, build_index
from elasticsearch_data_loader_ray.index.oracle import corpus_from_webtext
from elasticsearch_data_loader_ray.index.search import LocalSearcher, PhraseSearcher

N = 700


@pytest.fixture(scope="module")
def pos_index(tmp_path_factory):
    src = tmp_path_factory.mktemp("ph_src")
    t = fixtures.generate_webtext(N)
    pq.write_table(t, str(src / "p.parquet"))
    out = str(tmp_path_factory.mktemp("ph_idx"))
    build_index(str(src), out,
                BuildConfig(docs_per_segment=150, index_positions=True))
    return out, t


def brute_phrase(t, phrase: str):
    """(doc_id, phrase_freq) via direct token-sequence scan, + scores."""
    urls, toks = corpus_from_webtext(t)
    seq = analyze("standard", phrase)
    dl = np.array([len(x) for x in toks], dtype=np.float64)
    avgdl = float(dl.mean())
    n = len(toks)
    uniq = sorted(set(seq))
    dfs = {u: sum(u in set(tk) for tk in toks) for u in uniq}
    idf_sum = float(sum(codec.bm25_idf(dfs[u], n) for u in uniq))
    out = {}
    for d, tk in enumerate(toks):
        c = sum(1 for i in range(len(tk) - len(seq) + 1)
                if tk[i:i + len(seq)] == seq)
        if c:
            out[d] = (c, idf_sum * float(codec.bm25_tf_impact(
                np.array([c], dtype=np.float64),
                np.array([dl[d]]), avgdl)[0]))
    return out


@pytest.mark.parametrize("phrase", ["the data", "data search", "the the",
                                    "acme limited", "zzq missing"])
def test_phrase_matches_brute(pos_index, phrase):
    idx, t = pos_index
    ps = PhraseSearcher(LocalSearcher(idx))
    ids, scores, freqs = ps.search(phrase, k=1000)
    want = brute_phrase(t, phrase)
    got = {int(d): (int(f), float(s)) for d, s, f in zip(ids, scores, freqs)}
    assert set(got) == set(want), (phrase, len(got), len(want))
    for d in got:
        assert got[d][0] == want[d][0], (phrase, d)
        assert got[d][1] == pytest.approx(want[d][1], rel=1e-12)


def test_phrase_rank_order(pos_index):
    idx, _ = pos_index
    ps = PhraseSearcher(LocalSearcher(idx))
    ids, scores, _ = ps.search("the data", k=10)
    assert len(ids) <= 10
    assert all(scores[i] >= scores[i + 1] for i in range(len(scores) - 1))


def test_phrase_requires_positions(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(fixtures.generate_webtext(120), str(src / "p.parquet"))
    out = str(tmp_path / "idx")
    build_index(str(src), out, BuildConfig(docs_per_segment=100))
    ps = PhraseSearcher(LocalSearcher(out))
    with pytest.raises((ValueError, KeyError, Exception)):
        ps.search("the data", k=5)


def test_distributed_phrase_matches_local(pos_index):
    from elasticsearch_data_loader_ray.index.search import search

    idx, _t = pos_index
    local = PhraseSearcher(LocalSearcher(idx))
    for phrase in ["the data", "data search", "the the"]:
        ids, scores, _ = local.search(phrase, k=25)
        dist = search(idx, [{"query_id": 0, "query": phrase, "k": 25,
                             "mode": "phrase"}]).to_pandas()
        assert dist["doc_id"].tolist() == ids.tolist()
        assert dist["score"].tolist() == scores.tolist()  # bitwise


def test_phrase_survives_merge(pos_index, tmp_path_factory):
    from elasticsearch_data_loader_ray.index.merge import merge_segments

    idx, t = pos_index
    ps = PhraseSearcher(LocalSearcher(idx))
    before = ps.search("the data", k=50)
    merge_segments(idx, group_size=3)
    after = PhraseSearcher(LocalSearcher(idx)).search("the data", k=50)
    assert before[0].tolist() == after[0].tolist()
    assert before[1].tolist() == after[1].tolist()


def test_phrase_on_multifield(tmp_path_factory):
    """index_positions covers EVERY text field: phrase search on a
    non-default field (simple analyzer -> letters-only token stream)
    matches a brute token-sequence scan over that field's analyzer."""
    src = tmp_path_factory.mktemp("phmf_src")
    t = fixtures.generate_webtext(300)
    pq.write_table(t, str(src / "p.parquet"))
    out = str(tmp_path_factory.mktemp("phmf_idx"))
    stats = build_index(str(src), out, BuildConfig(
        docs_per_segment=80, index_positions=True,
        fields=(("text_simple", "text", "simple"),),
    ))
    # brute: engine dedup rule, then the field's own analyzer stream
    rows = [(u, ts, x) for u, ts, x in zip(t["url"].to_pylist(),
                                           t["warc_ts"].to_pylist(),
                                           t["text"].to_pylist()) if x]
    rows.sort(key=lambda r: (r[0], r[1]))
    seen = {}
    for u, _ts, x in rows:
        seen.setdefault(u, x)
    toks = [analyze("simple", seen[u]) for u in sorted(seen)]
    phrase = "the data"
    seq = analyze("simple", phrase)
    dl = np.array([len(x) for x in toks], dtype=np.float64)
    avgdl = float(stats["per_field"]["text_simple"]["avgdl"])
    assert avgdl == pytest.approx(dl.mean())
    uniq = sorted(set(seq))
    dfs = {u: sum(u in set(tk) for tk in toks) for u in uniq}
    idf_sum = float(sum(codec.bm25_idf(dfs[u], len(toks)) for u in uniq))
    want = {}
    for d, tk in enumerate(toks):
        c = sum(1 for i in range(len(tk) - len(seq) + 1)
                if tk[i:i + len(seq)] == seq)
        if c:
            want[d] = (c, idf_sum * float(codec.bm25_tf_impact(
                np.array([c], dtype=np.float64), np.array([dl[d]]), avgdl)[0]))
    ps = PhraseSearcher(LocalSearcher(out))
    ids, scores, freqs = ps.search(phrase, k=1000, field="text_simple")
    got = {int(d): (int(f), float(s)) for d, s, f in zip(ids, scores, freqs)}
    assert set(got) == set(want)
    for d in got:
        assert got[d][0] == want[d][0]
        assert got[d][1] == pytest.approx(want[d][1], rel=1e-12)
    # distributed path agrees on the multi-field phrase
    from elasticsearch_data_loader_ray.index.search import search as dsearch

    dist = dsearch(out, [{"query_id": 0, "query": phrase, "k": 20,
                          "mode": "phrase", "field": "text_simple"}]).to_pandas()
    loc_ids, loc_sc, _ = ps.search(phrase, k=20, field="text_simple")
    assert dist["doc_id"].tolist() == loc_ids.tolist()
    assert dist["score"].tolist() == loc_sc.tolist()


def brute_prefix(t, phrase: str, max_expansions: int = 50):
    """match_phrase_prefix oracle: fixed tokens consecutive, then any
    vocabulary term with the last token as prefix (term-order expansion
    cap), with the documented score convention."""
    urls, toks = corpus_from_webtext(t)
    seq = analyze("standard", phrase)
    fixed, prefix = seq[:-1], seq[-1]
    vocab = sorted({w for tk in toks for w in tk})
    exps = [w for w in vocab if w.startswith(prefix)][:max_expansions]
    if not exps:
        return {}
    eset = set(exps)
    dl = np.array([len(x) for x in toks], dtype=np.float64)
    avgdl = float(dl.mean())
    n = len(toks)
    uniq_fixed = sorted(set(fixed))
    dfs = {u: sum(u in set(tk) for tk in toks) for u in uniq_fixed}
    if any(dfs[u] == 0 for u in uniq_fixed):
        return {}
    idf_fixed = float(sum(codec.bm25_idf(dfs[u], n) for u in uniq_fixed))
    exp_df = min(n, sum(sum(e in set(tk) for tk in toks) for e in exps))
    idf_slot = float(codec.bm25_idf(exp_df, n))
    out = {}
    for d, tk in enumerate(toks):
        c = sum(1 for i in range(len(tk) - len(seq) + 1)
                if tk[i:i + len(fixed)] == fixed
                and tk[i + len(fixed)] in eset)
        if c:
            out[d] = (c, (idf_fixed + idf_slot) * float(
                codec.bm25_tf_impact(np.array([c], dtype=np.float64),
                                     np.array([dl[d]]), avgdl)[0]))
    return out


@pytest.mark.parametrize("phrase", ["the da", "data s", "s", "the data s",
                                    "zzq missing pre"])
def test_match_phrase_prefix_matches_brute(pos_index, phrase):
    idx, t = pos_index
    ps = PhraseSearcher(LocalSearcher(idx))
    ids, scores, freqs = ps.search_prefix(phrase, k=100000)
    want = brute_prefix(t, phrase)
    got = {int(d): (int(f), float(s)) for d, s, f in zip(ids, scores, freqs)}
    assert set(got) == set(want), (phrase, len(got), len(want))
    for d in got:
        assert got[d][0] == want[d][0], (phrase, d)
        assert got[d][1] == pytest.approx(want[d][1], rel=1e-12)


def test_match_phrase_prefix_expansion_cap(pos_index):
    idx, t = pos_index
    ps = PhraseSearcher(LocalSearcher(idx))
    ids1, _s1, _f1 = ps.search_prefix("the s", k=100000, max_expansions=1)
    want = brute_prefix(t, "the s", max_expansions=1)
    assert set(int(d) for d in ids1) == set(want)


def test_highlight_first_positions_match_brute(pos_index):
    from elasticsearch_data_loader_ray.index.search import highlight_matches

    idx, t = pos_index
    got = highlight_matches(LocalSearcher(idx), "the data search").to_pandas()
    urls, toks = corpus_from_webtext(t)
    want = {}
    for d, tk in enumerate(toks):
        for q in ("the", "data", "search"):
            if q in tk:
                want[(d, q)] = tk.index(q)
    assert {(int(r.doc_id), r.term): int(r.first_pos)
            for r in got.itertuples()} == want
    # deterministic order
    assert got.sort_values(["doc_id", "term"]).reset_index(drop=True).equals(
        got.reset_index(drop=True))


def test_rescore_combines_primary_and_phrase(pos_index):
    from elasticsearch_data_loader_ray.index.search import LocalSearcher

    idx, t = pos_index
    lo = LocalSearcher(idx)
    W, QW, RW = 15, 1.0, 2.0
    ids, sc = lo.rescore("the data search", "the data", k=10,
                         window_size=W, query_weight=QW, rescore_weight=RW)
    # brute: rounded-score window cut over the exact primary ranking,
    # then the documented combination
    p_ids, p_sc = lo.search("the data search", k=W + 20,
                            or_strategy="exact")
    cut = np.lexsort((p_ids, -np.round(p_sc, 6)))[:W]
    w_ids, w_sc = p_ids[cut], p_sc[cut]
    ph = brute_phrase(t, "the data")
    new = QW * w_sc + RW * np.array(
        [ph.get(int(d), (0, 0.0))[1] for d in w_ids])
    order = np.lexsort((w_ids, -new))[:10]
    assert ids.tolist() == w_ids[order].tolist()
    assert np.allclose(sc, new[order], rtol=1e-12)
    # the phrase must actually reorder the window for the test to bite
    assert ids.tolist() != w_ids[:10].tolist()
    with pytest.raises(ValueError, match="window"):
        lo.rescore("the data", k=20, window_size=10)


def brute_span_near(t, clauses: list[str], slop: int) -> list[int]:
    """In-order span_near oracle: exists p1<...<pn with total gap <= slop."""
    _urls, toks = corpus_from_webtext(t)
    seq = [analyze("standard", c)[0] for c in clauses]
    hits = []
    for d, tk in enumerate(toks):
        pos = [[i for i, w in enumerate(tk) if w == s] for s in seq]
        if any(not p for p in pos):
            continue
        # exhaustive min-total-gap (test-sized docs)
        best = {p: 0 for p in pos[0]}
        for layer in pos[1:]:
            nxt = {}
            for q in layer:
                cands = [c + (q - p - 1) for p, c in best.items() if p < q]
                if cands:
                    nxt[q] = min(cands)
            best = nxt
            if not best:
                break
        if best and min(best.values()) <= slop:
            hits.append(d)
    return hits


@pytest.mark.parametrize("clauses,slop", [
    (["data", "query"], 0),
    (["data", "query"], 2),
    (["the", "data", "query"], 1),
    (["fast", "scan"], 5),
    (["the", "the"], 0),  # repeated term: strict position ordering
])
def test_span_near_matches_brute(pos_index, clauses, slop):
    out, t = pos_index
    ps = PhraseSearcher(LocalSearcher(out))
    got = ps.span_near(clauses, slop=slop)
    assert got.tolist() == brute_span_near(t, clauses, slop)


def test_span_near_slop0_equals_phrase(pos_index):
    out, _t = pos_index
    ps = PhraseSearcher(LocalSearcher(out))
    ids, _sc, _fq = ps.search("data query", k=10**9)
    assert ps.span_near(["data", "query"], slop=0).tolist() == sorted(
        ids.tolist())


def brute_intervals(t, terms: list[str], max_gaps: int) -> list[int]:
    """Unordered all_of oracle: exhaustive choice of one position per
    term, window width - k <= max_gaps (test-sized docs)."""
    import itertools

    _urls, toks = corpus_from_webtext(t)
    seq = [analyze("standard", c)[0] for c in terms]
    k = len(seq)
    hits = []
    for d, tk in enumerate(toks):
        pos = [[i for i, w in enumerate(tk) if w == s] for s in seq]
        if any(not p for p in pos):
            continue
        ok = any(max(ch) - min(ch) + 1 - k <= max_gaps
                 for ch in itertools.product(*pos))
        if ok:
            hits.append(d)
    return hits


@pytest.mark.parametrize("terms,gaps", [
    (["data", "query"], 0),
    (["data", "query"], 2),
    (["the", "data", "query"], 1),
    (["fast", "scan"], 4),
    (["slow", "merge", "page"], 6),
])
def test_intervals_unordered_matches_brute(pos_index, terms, gaps):
    out, t = pos_index
    ps = PhraseSearcher(LocalSearcher(out))
    got = ps.intervals_all_of(terms, max_gaps=gaps)
    assert got.tolist() == brute_intervals(t, terms, gaps)


def test_intervals_ordered_delegates_to_span_near(pos_index):
    out, _t = pos_index
    ps = PhraseSearcher(LocalSearcher(out))
    a = ps.intervals_all_of(["data", "query"], max_gaps=2, ordered=True)
    b = ps.span_near(["data", "query"], slop=2)
    assert a.tolist() == b.tolist()


def test_intervals_unordered_superset_of_ordered(pos_index):
    out, _t = pos_index
    ps = PhraseSearcher(LocalSearcher(out))
    uo = set(ps.intervals_all_of(["data", "query"], max_gaps=1).tolist())
    o = set(ps.intervals_all_of(["data", "query"], max_gaps=1,
                                ordered=True).tolist())
    assert o <= uo
