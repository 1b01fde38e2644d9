"""Golden tests for the analyzer chains (FIXTURES.md §4; semantics from
/root/reference/config/search_scheme.json)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from elasticsearch_data_loader_ray.functions import analyzers as an


def test_standard_tokenizer():
    assert an.tokenize_standard("Hello, World! 42") == ["Hello", "World", "42"]
    assert an.tokenize_standard("") == []
    assert an.tokenize_standard("under_score") == ["under", "score"]
    assert an.tokenize_standard("café crème") == ["café", "crème"]


def test_whitespace_and_keyword_tokenizers():
    assert an.tokenize_whitespace("A  B\tC") == ["A", "B", "C"]
    assert an.tokenize_keyword("A B C") == ["A B C"]
    assert an.tokenize_keyword("") == []


def test_edge_ngram_banana():
    # FIXTURES.md: "Banana" -> ba..banana under analyzer_edge_ngram_token
    assert an.analyze("analyzer_edge_ngram_token", "Banana") == [
        "ba", "ban", "bana", "banan", "banana",
    ]


def test_edge_ngram_bounds():
    assert an.tokenize_edge_ngram("a") == []
    long = "x" * 30
    grams = an.tokenize_edge_ngram(long)
    assert grams[0] == "xx" and grams[-1] == "x" * 20 and len(grams) == 19


def test_asciifolding_preserve_original():
    assert an.analyze("analyzer_whitespace_token", "café") == ["cafe", "café"]
    assert an.analyze("analyzer_whitespace_token", "plain") == ["plain"]


def test_whitespace_remove_startswith():
    assert an.analyze("analyzer_startswith", "A B C") == ["abc"]


def test_ws_punc_remove():
    assert an.analyze("startswith_no_ws_punc", "A.B, C-D") == ["abcd"]


def test_unique_filter():
    assert an.analyze("analyzer_unique_tf", "the cat the hat") == [
        "the", "cat", "hat",
    ]


def test_limit_first():
    assert an.analyze("analyzer_limit_first", "Alpha Beta") == ["alpha"]


def test_keyword_token_sort_amp_mapping():
    # FIXTURES.md: "A & B" -> ["aandb"] (char-map & -> and, strip special,
    # keyword tokenize, lowercase, fold, trim, ws-remove)
    assert an.analyze("analyzer_keyword_token_sort", "A & B") == ["aandb"]


def test_analyzer_elastic_no_lowercase():
    assert an.analyze("analyzer_elastic", "Hello World") == ["Hello", "World"]


def test_simple_analyzer_letters_only():
    assert an.analyze("simple", "Acme42 Ltd") == ["acme", "ltd"]


def test_token_count():
    assert an.token_count("TEST LIMITED") == 2
    assert an.token_count("") == 0


def test_batch_tokenizer_matches_scalar():
    texts = [
        "Hello, World! 42",
        "café crème BRÛLÉE",
        "",
        None,
        "the the the cat",
        "A & B LIMITED...",
    ]
    arr = pa.array(texts, pa.string())
    doc_idx, tokens, doc_len = an.standard_tokenize_batch(arr)
    toks = tokens.to_pylist()
    for r, t in enumerate(texts):
        expect = an.analyze("standard", t) if t else []
        got = [tok for i, tok in zip(doc_idx, toks) if i == r]
        assert got == expect, (r, got, expect)
        assert doc_len[r] == len(expect)
    assert doc_idx.dtype == np.int64 and doc_len.dtype == np.int32


def test_batch_token_count():
    arr = pa.array(["one two", "three", ""], pa.string())
    assert an.token_count_batch(arr).tolist() == [2, 1, 0]


def test_byte_tokenizer_matches_re2_path():
    """_tokenize_bytes (LUT remap + single-byte split) must be identical to
    the RE2 path on fixtures, slices, Latin-1 case/punct edges; exotic rows
    must route the batch to the fallback."""
    import numpy as np

    from elasticsearch_data_loader_ray import fixtures
    from elasticsearch_data_loader_ray.functions.analyzers import (
        _tokenize_arrow, _tokenize_bytes, standard_tokenize_batch)

    texts = fixtures.generate_webtext(400)["text"].combine_chunks()
    for col in [texts, texts.slice(101, 99)]:
        b, a = _tokenize_bytes(col), _tokenize_arrow(col)
        assert b is not None
        assert b[1].to_pylist() == a[1].to_pylist()
        assert np.array_equal(b[0], a[0]) and np.array_equal(b[2], a[2])
    edges = pa.array(["Hello WORLD", "", None, "  --x--  ", "CaFé SEÑOR",
                      "ZÜrich grüß", "0AbC9", "«quoted» ×5 ÷2", "µ0"])
    b, a = _tokenize_bytes(edges), _tokenize_arrow(edges)
    assert b is not None and b[1].to_pylist() == a[1].to_pylist()
    hard = pa.array(["İstanbul", "中文 mixed", "🎉 party"])
    assert _tokenize_bytes(hard) is None  # exotic rows -> RE2 fallback
    p, q = standard_tokenize_batch(hard), _tokenize_arrow(hard)
    assert p[1].to_pylist() == q[1].to_pylist()
