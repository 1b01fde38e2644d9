"""Fixture generator determinism + byte-identical extraction invariant."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from elasticsearch_data_loader_ray import fixtures
from elasticsearch_data_loader_ray.stages.extract import (
    HtmlExtractor,
    count_rejects,
    extract_text,
)


def test_generator_deterministic():
    a = fixtures.generate_webtext(300)
    b = fixtures.generate_webtext(300)
    assert a.equals(b)
    c = fixtures.generate_webtext(300, seed=7)
    assert not a.equals(c)


def test_generator_reject_rows_present():
    t = fixtures.generate_webtext(500)
    html = t["html"].to_pylist()
    text = t["text"].to_pylist()
    urls = t["url"].to_pylist()
    assert any(h is None for h in html)          # missing payload
    assert any(x == "" for x in text)            # empty text
    assert len(urls) != len(set(urls))           # duplicate urls
    assert any(x and fixtures._OVERSIZED_TOKEN in x for x in text)


def test_extraction_byte_identical_per_url():
    t = fixtures.generate_webtext(400)
    for i in range(t.num_rows):
        h = t["html"][i].as_py()
        if h is None:
            continue
        assert extract_text(h) == t["text"][i].as_py(), t["url"][i].as_py()


def test_extractor_stage_filters_and_side_writes(tmp_path):
    t = fixtures.generate_webtext(400)
    errors_dir = str(tmp_path / "errors")
    ex = HtmlExtractor(errors_dir=errors_dir)
    out = ex(t)
    # all surviving rows: text non-empty and byte-identical to golden
    golden = {u: x for u, x in zip(t["url"].to_pylist(), t["text"].to_pylist())}
    for u, x in zip(out["url"].to_pylist(), out["text"].to_pylist()):
        assert x == golden[u] and x != ""
    n_null = sum(h is None for h in t["html"].to_pylist())
    n_empty = sum(x == "" for x in t["text"].to_pylist())
    assert out.num_rows == t.num_rows - n_null - n_empty
    rej = count_rejects(errors_dir)
    assert rej["missing_payload"] == n_null
    assert rej["empty_text"] == n_empty
    # doc_len matches the standard analyzer token count
    from elasticsearch_data_loader_ray.functions.analyzers import analyze

    for i in range(min(20, out.num_rows)):
        assert out["doc_len"][i].as_py() == len(analyze("standard", out["text"][i].as_py()))


def test_queries_fixture():
    q = fixtures.generate_queries()
    assert q.num_rows >= 12
    assert q["k"].to_pylist() == [10] * q.num_rows


def test_vectorized_extract_matches_scalar_adversarial():
    """extract_text_batch must be byte-identical to the scalar regex on
    inputs that stress every fallback route: unknown entities, nested
    openings, stray closes, unclosed tags, bare '&', invalid UTF-8."""
    from elasticsearch_data_loader_ray.stages.extract import (
        extract_text, extract_text_batch)

    cases = [
        b"<p>a &nbsp; b</p>",                    # entity outside the five
        b"<p>x <p>y</p> tail",                   # two openings, one close
        b"<p>a</p> stray </p><p>b</p>",          # close without opening
        b"<p>unclosed trailing",
        b"<p>&amp;lt;</p><p>&quot;q&#x27;</p>",  # chained entities
        b"no paragraphs at all", b"", None,
        b"<p>line1\nline2</p>\n<p class='x'>z</p>",
        b"<p>a&amp;&amp;b</p>", b"<p>&</p>",
        b"\xff\xfe<p>bad utf8</p>",              # invalid utf-8 batch route
        b"<p>&amp;#x27;</p>", b"<p>&amp;amp;</p>", b"<p>&&amp;</p>",
        b"<pre>code</pre><p>real</p>",
    ]
    got = extract_text_batch(pa.array(cases, pa.binary())).to_pylist()
    want = [None if b is None else extract_text(b) for b in cases]
    assert got == want


def test_token_count_batch_matches_tokenizer():
    from elasticsearch_data_loader_ray.functions.analyzers import (
        standard_tokenize_batch, token_count_batch)
    import numpy as np

    t = fixtures.generate_webtext(300)
    texts = t["text"].combine_chunks()
    assert np.array_equal(token_count_batch(texts),
                          standard_tokenize_batch(texts)[2])
    edge = pa.array(["Hé½llo 世界 a_b", "", None, "  --  ", "ß ß",
                     "中文 分词 test", "🎉 party 🎉time", "a", "é", "½½ ½",
                     "_", "µ0"], pa.string())
    assert np.array_equal(token_count_batch(edge),
                          standard_tokenize_batch(edge)[2])
    sl = texts.slice(101, 99)  # nonzero array offset
    assert np.array_equal(token_count_batch(sl),
                          standard_tokenize_batch(sl)[2])
