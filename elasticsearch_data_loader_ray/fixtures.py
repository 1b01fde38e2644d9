"""Deterministic synthetic webtext generator (FIXTURES.md §1-§3).

Produces the authoritative input shape (BASELINE.json ``input_hint``):
``(url, warc_ts, html, text, lang)``. The ``html`` column wraps the golden
``text`` paragraph-by-paragraph with escaped entities, tag noise and
comments, so HTML->text extraction is a real transform whose output must be
byte-identical to ``text`` per url (the per-row invariant).

Determinism: single seeded ``numpy.random.default_rng``; generation order is
row order, independent of parallelism; ``warc_ts`` is a deterministic ramp
from 2024-01-01 (FIXTURES.md §5).

Reject rows are mixed in at fixed deterministic positions (FIXTURES.md §2):

* ``i % 97 == 13``  -> missing payload: html NULL, text NULL
* ``i % 89 == 17``  -> empty text: valid html wrapper, zero paragraphs
* ``i % 101 == 19`` -> exact duplicate of row i-1 (same url, same payload)
* ``i % 61 == 23``  -> an oversized (>256 char) token in the text
"""

from __future__ import annotations

import html as _html
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

_HEAD_WORDS = [
    "the", "and", "of", "to", "a", "in", "is", "for", "on", "with", "as",
    "by", "at", "from", "this", "that", "are", "be", "or", "an", "it",
    "data", "search", "index", "query", "page", "web", "site", "info", "news",
]
_DIACRITIC_WORDS = [
    "café", "crème", "zürich", "naïve", "résumé", "señor", "göteborg",
    "münchen", "brûlée", "façade",
]
_CORP_SUFFIXES = ["LIMITED", "PLC", "LTD", "LLP", "UNLIMITED", "CYF",
                  "COMMUNITY INTEREST COMPANY", "L.T.D"]
_CORP_STEMS = ["ACME", "GRAFT", "NORTHERN", "WIDGET", "SMITH & JONES",
               "BLUE RIVER", "CASTLE", "HARBOUR", "KESTREL", "ORION"]
_LANGS = ["en"] * 17 + ["cy", "fr", ""]

VOCAB_SIZE = 4000
_OVERSIZED_TOKEN = "k" * 300  # exercises ignore_above:256 (O3)


def _vocab() -> list[str]:
    vocab = list(_HEAD_WORDS) + list(_DIACRITIC_WORDS)
    vocab += [f"w{i:04d}" for i in range(VOCAB_SIZE - len(vocab))]
    return vocab


def _zipf_probs(n: int, s: float = 1.05) -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    return p / p.sum()


def _doc_text(rng: np.random.Generator, vocab: np.ndarray, probs: np.ndarray,
              n_tokens: int, corp_line: str | None, oversized: bool) -> str:
    toks = vocab[rng.choice(len(vocab), size=n_tokens, p=probs)].tolist()
    # deterministic decoration: capitalization, punctuation, '&' joins
    for j in range(0, n_tokens, 11):
        toks[j] = toks[j].capitalize()
    for j in range(7, n_tokens, 12):
        toks[j] = toks[j] + "."
    for j in range(9, n_tokens, 29):
        toks[j] = toks[j] + " & " + toks[j][::-1]
    if oversized:
        toks[n_tokens // 2] = _OVERSIZED_TOKEN
    paras = [" ".join(toks[k : k + 60]) for k in range(0, n_tokens, 60)]
    if corp_line is not None:
        paras.insert(0, corp_line)
    return "\n\n".join(paras)


def _render_html(text: str, i: int) -> bytes:
    """Wrap golden text in noisy-but-invertible HTML (see extract.py)."""
    paras = text.split("\n\n") if text else []
    title = _html.escape(text[:40]) if text else "empty"
    buf = [
        "<html><head>",
        f"<title>{title}</title>",
        '<meta charset="utf-8"/>',
        "</head><body>",
        f"<!-- crawl-noise {i % 1013} -->",
    ]
    for k, p in enumerate(paras):
        esc = _html.escape(p, quote=False)
        if k % 3 == 2:
            buf.append(f'<div class="wrap{k % 5}">')
            buf.append(f'  <p id="p{k}">{esc}</p>')
            buf.append("</div>")
        else:
            buf.append(f'<p class="c{k % 7}">{esc}</p>')
    buf.append(f"<footer>site {i % 97}</footer>")
    buf.append("</body></html>")
    return "\n".join(buf).encode("utf-8")


def generate_webtext(n_docs: int, seed: int = SEED,
                     start: int = 0) -> pa.Table:
    """Generate ``n_docs`` rows of the WEBTEXT table (includes reject rows).

    ``start`` offsets the global row index ``i`` (urls, timestamps, reject
    patterns stay globally consistent) while the rng is local — the chunked
    generator uses it to produce disjoint row ranges independently."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab(), dtype=object)
    probs = _zipf_probs(len(vocab))
    base_ts = datetime(2024, 1, 1)

    urls: list[str | None] = []
    tss: list[datetime] = []
    htmls: list[bytes | None] = []
    texts: list[str | None] = []
    langs: list[str] = []

    n_tok_arr = (10 + 490 * rng.random(n_docs) ** 2).astype(np.int64)
    corp_pick = rng.random(n_docs)
    for j in range(n_docs):
        i = start + j
        ts = base_ts + timedelta(seconds=int(i))
        lang = _LANGS[i % len(_LANGS)]
        if i % 101 == 19 and j > 0 and urls[-1] is not None:
            # exact duplicate of the previous row (D1 create-conflict analogue)
            urls.append(urls[-1]); tss.append(tss[-1])
            htmls.append(htmls[-1]); texts.append(texts[-1]); langs.append(langs[-1])
            continue
        url = f"https://site{i % 97}.example/page/{i}"
        if i % 97 == 13:
            urls.append(url); tss.append(ts)
            htmls.append(None); texts.append(None); langs.append(lang)
            continue
        if i % 89 == 17:
            urls.append(url); tss.append(ts)
            htmls.append(_render_html("", i)); texts.append(""); langs.append(lang)
            continue
        corp_line = None
        if corp_pick[j] < 0.2:
            stem = _CORP_STEMS[i % len(_CORP_STEMS)]
            suf = _CORP_SUFFIXES[i % len(_CORP_SUFFIXES)]
            corp_line = f"{stem} {suf}"
        text = _doc_text(rng, vocab, probs, int(n_tok_arr[j]), corp_line,
                         oversized=(i % 61 == 23))
        urls.append(url); tss.append(ts)
        htmls.append(_render_html(text, i)); texts.append(text); langs.append(lang)

    from .schema import WEBTEXT

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.large_string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=WEBTEXT,
    )


PARALLEL_GEN_MIN_DOCS = 4_000_001  # sizes <= 4M keep legacy byte-identity


def write_webtext(path: str, n_docs: int, seed: int = SEED,
                  rows_per_file: int = 25_000) -> str:
    """Write the webtext table as a directory of parquet files (parallel-read
    friendly). Chunked generation keeps memory bounded; chunk boundaries do
    not affect content (single rng consumed in row order).

    Above ``PARALLEL_GEN_MIN_DOCS`` rows the per-chunk generator runs
    instead (one seeded rng per file via SeedSequence(seed, chunk), Ray
    tasks when a cluster is up): content differs from the sequential
    generator at the same size but is equally deterministic — existing
    cached fixtures at <= 4M docs stay byte-identical.
    """
    import os

    if n_docs > PARALLEL_GEN_MIN_DOCS - 1:
        return _write_webtext_chunked(path, n_docs, seed, rows_per_file)
    os.makedirs(path, exist_ok=True)
    rng_table = generate_webtext(n_docs, seed)
    for fi, start in enumerate(range(0, n_docs, rows_per_file)):
        chunk = rng_table.slice(start, rows_per_file)
        pq.write_table(chunk, os.path.join(path, f"part-{fi:05d}.parquet"),
                       row_group_size=4096)
    return path


def _chunk_seed(seed: int, chunk: int) -> int:
    return int(np.random.SeedSequence([seed, chunk]).generate_state(1)[0])


def _gen_chunk_file(path: str, fi: int, start: int, rows: int,
                    seed: int) -> str:
    t = generate_webtext(rows, seed=_chunk_seed(seed, fi), start=start)
    out = f"{path}/part-{fi:05d}.parquet"
    pq.write_table(t, out, row_group_size=4096)
    return out


def _write_webtext_chunked(path: str, n_docs: int, seed: int,
                           rows_per_file: int) -> str:
    import os

    os.makedirs(path, exist_ok=True)
    spans = [(fi, start, min(rows_per_file, n_docs - start))
             for fi, start in enumerate(range(0, n_docs, rows_per_file))]
    try:
        import ray
        use_ray = ray.is_initialized()
    except ImportError:  # pragma: no cover
        use_ray = False
    if use_ray:
        import ray

        gen = ray.remote(_gen_chunk_file)
        ray.get([gen.remote(path, fi, start, rows, seed)
                 for fi, start, rows in spans])
    else:
        for fi, start, rows in spans:
            _gen_chunk_file(path, fi, start, rows, seed)
    return path


def generate_queries() -> pa.Table:
    """The reference query set (FIXTURES.md §3): head/tail terms, mixes,
    absent term, diacritic//&/case variants, corporate-suffix phrase."""
    qs = [
        "the",                      # single head term
        "w3989",                    # single tail term
        "data search",              # 2-term mix
        "index query page web",     # 4-term mix
        "the of a w0100 w2000",     # 5-term head+tail mix
        "zzqmissingzz",             # absent from corpus
        "café",                     # diacritic form
        "cafe",                     # folded form (distinct term)
        "crème brûlée",
        "smith & jones",            # '&' variant ('&' drops at tokenization)
        "THE DATA",                 # case variant
        "acme limited",             # corporate-suffix phrase
        "widget plc",
        "the the cat",              # duplicate query term
        "w0042",
        "news info site w1500",
    ]
    from .schema import QUERIES

    return pa.table(
        {
            "query_id": pa.array(range(len(qs)), pa.int64()),
            "query": pa.array(qs, pa.string()),
            "k": pa.array([10] * len(qs), pa.int64()),
        },
        schema=QUERIES,
    )
