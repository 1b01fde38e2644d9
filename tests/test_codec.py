"""Round-trip and property tests for the posting-list codec."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from elasticsearch_data_loader_ray.index import codec


def test_varint_roundtrip_simple():
    vals = np.array([0, 1, 127, 128, 300, 2**21, 2**35, 2**63], dtype=np.uint64)
    buf, lens = codec.varint_encode(vals)
    assert lens.tolist() == [1, 1, 1, 2, 2, 4, 6, 10]
    out = codec.varint_decode(buf, len(vals))
    assert out.tolist() == vals.tolist()


def test_varint_empty():
    buf, lens = codec.varint_encode(np.empty(0, dtype=np.uint64))
    assert len(buf) == 0
    assert len(codec.varint_decode(buf)) == 0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63), max_size=200))
def test_varint_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.uint64)
    buf, _ = codec.varint_encode(vals)
    assert codec.varint_decode(buf).tolist() == xs


def test_delta_runs():
    ids = np.array([5, 9, 20, 3, 4, 100], dtype=np.uint64)
    starts = np.array([0, 3])
    gaps = codec.delta_encode_runs(ids, starts)
    assert gaps.tolist() == [5, 4, 11, 3, 1, 96]
    assert codec.delta_decode(gaps[:3]).tolist() == [5, 9, 20]
    assert codec.delta_decode(gaps[3:]).tolist() == [3, 4, 100]


def _brute_posting_table(terms, doc_ids, tfs, dls, avgdl):
    """Scalar-Python reference for build_posting_table."""
    from collections import defaultdict

    per_term = defaultdict(list)
    for t, d, f, dl in zip(terms, doc_ids, tfs, dls):
        per_term[t].append((d, f, dl))
    out = {}
    for t, posts in per_term.items():
        posts.sort()
        ids = [p[0] for p in posts]
        fs = [p[1] for p in posts]
        imp = [
            f * (codec.BM25_K1 + 1) / (f + codec.BM25_K1 * (1 - codec.BM25_B + codec.BM25_B * dl / avgdl))
            for _, f, dl in posts
        ]
        blocks_last, blocks_max = [], []
        for i in range(0, len(posts), codec.BLOCK_SIZE):
            blocks_last.append(max(ids[i : i + codec.BLOCK_SIZE]))
            blocks_max.append(max(imp[i : i + codec.BLOCK_SIZE]))
        out[t] = (ids, fs, blocks_last, blocks_max, max(imp))
    return out


def test_build_posting_table_matches_brute():
    rng = np.random.default_rng(7)
    n_docs, n_posts = 50, 600
    terms = rng.choice(np.array(["the", "cat", "hat", "zebra", "q"], dtype=object), n_posts)
    doc_ids = rng.choice(n_docs, n_posts, replace=True).astype(np.int64)
    # dedupe (term, doc) pairs: keep first
    _, first = np.unique(np.char.add(terms.astype(str), doc_ids.astype(str)), return_index=True)
    terms, doc_ids = terms[first], doc_ids[first]
    tfs = rng.integers(1, 9, len(terms)).astype(np.int64)
    dls = (doc_ids % 17 + 5).astype(np.int64)
    avgdl = 11.3

    order = np.lexsort((doc_ids, terms.astype(str)))
    table = codec.build_posting_table(
        terms[order], doc_ids[order], tfs[order], dls[order], avgdl
    )
    brute = _brute_posting_table(terms, doc_ids, tfs, dls, avgdl)
    assert sorted(table["term"].tolist()) == sorted(brute)
    blast, bmax = codec.block_lists(table)
    for i, t in enumerate(table["term"]):
        ids, fs = codec.decode_postings(
            table["doc_ids_enc"][i], table["tfs_enc"][i], int(table["df"][i])
        )
        b_ids, b_fs, b_last, b_max, b_term_max = brute[t]
        assert ids.tolist() == b_ids
        assert fs.tolist() == b_fs
        assert blast[i] == b_last
        assert bmax[i] == pytest.approx(b_max)
        assert table["max_impact"][i] == pytest.approx(b_term_max)


def test_block_boundaries_multi_block():
    # one term with 300 postings -> 3 blocks of 128/128/44
    n = 300
    terms = np.array(["t"] * n, dtype=object)
    ids = np.arange(0, 2 * n, 2, dtype=np.int64)
    tfs = np.ones(n, dtype=np.int64)
    dls = np.full(n, 10, dtype=np.int64)
    table = codec.build_posting_table(terms, ids, tfs, dls, 10.0)
    assert table["df"].tolist() == [n]
    blast, _ = codec.block_lists(table)
    assert len(blast[0]) == 3
    assert blast[0] == [2 * 127, 2 * 255, 2 * 299]
    out_ids, _ = codec.decode_postings(table["doc_ids_enc"][0], table["tfs_enc"][0], n)
    assert out_ids.tolist() == ids.tolist()


def test_blocked_postings_lazy_decode():
    n = 700
    terms = np.array(["t"] * n, dtype=object)
    ids = np.arange(3, 3 + 5 * n, 5, dtype=np.int64)
    tfs = (np.arange(n) % 7 + 1).astype(np.int64)
    dls = np.full(n, 10, dtype=np.int64)
    table = codec.build_posting_table(terms, ids, tfs, dls, 10.0)
    blast, _ = codec.block_lists(table)
    offs = table["block_offsets"]
    bp = codec.BlockedPostings(
        table["doc_ids_enc"][0], table["tfs_enc"][0], n,
        np.array(blast[0]),
        table["block_doc_off_flat"][offs[0]:offs[1]],
        table["block_tf_off_flat"][offs[0]:offs[1]],
    )
    assert bp.n_blocks == (n + codec.BLOCK_SIZE - 1) // codec.BLOCK_SIZE
    # every block decodes to the right slice
    for b in range(bp.n_blocks):
        got_ids, got_tfs = bp.block(b)
        s = b * codec.BLOCK_SIZE
        e = min(n, s + codec.BLOCK_SIZE)
        assert got_ids.tolist() == ids[s:e].tolist()
        assert got_tfs.tolist() == tfs[s:e].tolist()
    # lazy lookup decodes exactly one block
    bp2 = codec.BlockedPostings(
        table["doc_ids_enc"][0], table["tfs_enc"][0], n,
        np.array(blast[0]),
        table["block_doc_off_flat"][offs[0]:offs[1]],
        table["block_tf_off_flat"][offs[0]:offs[1]],
    )
    probe = int(ids[400])
    assert bp2.lookup(probe) == int(tfs[400])
    assert bp2.lookup(probe + 1) == 0  # absent doc
    assert bp2.blocks_decoded == 1
    # vectorized lookup over a sparse candidate set
    cand = ids[[10, 300, 699]].copy()
    cand_plus = np.sort(np.r_[cand, [1]])  # 1 is absent
    out = bp2.lookup_many(cand_plus)
    want = {int(ids[i]): int(tfs[i]) for i in (10, 300, 699)}
    for d, tf in zip(cand_plus, out):
        assert tf == want.get(int(d), 0)
    assert bp2.blocks_decoded <= 4


def test_bm25_idf():
    assert codec.bm25_idf(1, 2) == pytest.approx(np.log(1 + 1.5 / 1.5))
    assert float(codec.bm25_idf(10, 10)) == pytest.approx(np.log(1 + 0.5 / 10.5))
