"""HTML -> text extraction stage with reject side-outputs.

Mirrors the reference's validity filtering and error side-sinks:

* missing payload (NULL ``html``) ≙ nil ``Data`` ->
  ``transform/transform.go:37-40`` skip + ``missingCompanyData`` error file;
* empty extracted text ≙ empty ``CompanyName`` ->
  ``transform/transform.go:42-45`` skip + ``missingCompanyName`` error file;
* error side-sinks are append-only per-kind outputs
  (``/root/reference/write/write.go:8-16,45-131``) — here parquet files under
  ``<errors_dir>/<kind>/``.

The extractor is a callable class for ``map_batches(..., concurrency=N)``:
regex compilation happens once per actor in ``__init__`` (ST3/ST4 analogue),
per-batch work is Arrow in / Arrow out. Extraction is the inverse of the
fixture generator's rendering: the text content of every ``<p>`` element in
document order, entity-unescaped, joined with a blank line — golden-tested
byte-identical to the fixture ``text`` column (the per-row invariant from
BASELINE.json ``input_hint``).
"""

from __future__ import annotations

import html as _html
import os
import re
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.analyzers import token_count_batch

REJECT_MISSING_PAYLOAD = "missing_payload"
REJECT_EMPTY_TEXT = "empty_text"


def extract_text(html_bytes: bytes, pattern: re.Pattern[str] | None = None) -> str:
    """Extract golden text from one HTML payload (scalar reference path)."""
    pat = pattern or _P_TAG
    doc = html_bytes.decode("utf-8", errors="replace")
    return "\n\n".join(_html.unescape(m) for m in pat.findall(doc))


_P_TAG = re.compile(r"<p[^>]*>(.*?)</p>", re.DOTALL)


def _side_write(errors_dir: str | None, kind: str, batch: pa.Table) -> None:
    if errors_dir is None or batch.num_rows == 0:
        return
    d = os.path.join(errors_dir, kind)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"part-{uuid.uuid4().hex}.parquet")
    pq.write_table(batch.select(["url", "warc_ts", "lang"]), path)


def extract_batch(batch: pa.Table, errors_dir: str | None = None) -> pa.Table:
    """map_batches stage: webtext batch -> corpus batch (+ reject side-writes).

    Output columns: url, warc_ts, text, lang, doc_len. Rejected rows are
    dropped from the output and appended under ``errors_dir/<kind>/``.
    Stateless by design — the only "state" is a module-compiled regex — so it
    runs as elastic Ray tasks rather than a CPU-reserving actor pool (the
    reference likewise builds a fresh Transformer per batch,
    ``companybindex/main.go:170-171``).
    """
    from ..index.build import pin_worker_threads

    pin_worker_threads()
    html_col = batch["html"]
    if isinstance(html_col, pa.ChunkedArray):
        html_col = html_col.combine_chunks()
    null_mask = np.asarray(html_col.is_null())

    texts: list[str | None] = [None] * batch.num_rows
    raw = html_col.to_pylist()
    for i, payload in enumerate(raw):
        if payload is not None:
            texts[i] = extract_text(payload, _P_TAG)
    text_arr = pa.array(texts, pa.large_string())
    empty_mask = (~null_mask) & (np.asarray(pc.equal(
        text_arr.fill_null("\x00"), "")))

    _side_write(errors_dir, REJECT_MISSING_PAYLOAD, batch.filter(pa.array(null_mask)))
    _side_write(errors_dir, REJECT_EMPTY_TEXT, batch.filter(pa.array(empty_mask)))

    keep = ~(null_mask | empty_mask)
    out = batch.select(["url", "warc_ts", "lang"]).filter(pa.array(keep))
    kept_text = text_arr.filter(pa.array(keep))
    out = out.append_column("text", kept_text)
    out = out.append_column(
        "doc_len", pa.array(token_count_batch(kept_text), pa.int32())
    )
    return out.select(["url", "warc_ts", "text", "lang", "doc_len"])


class HtmlExtractor:
    """Callable-class form of :func:`extract_batch` (actor-pool variant for
    callers that want constructor-time configuration, e.g. a heavier parser).
    """

    def __init__(self, errors_dir: str | None = None):
        self.pattern = _P_TAG
        self.errors_dir = errors_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        return extract_batch(batch, self.errors_dir)


def count_rejects(errors_dir: str) -> dict[str, int]:
    """Total rejected rows per kind from the side-written parquet files."""
    out: dict[str, int] = {}
    for kind in (REJECT_MISSING_PAYLOAD, REJECT_EMPTY_TEXT):
        d = os.path.join(errors_dir, kind)
        n = 0
        if os.path.isdir(d):
            for f in os.listdir(d):
                if f.endswith(".parquet"):
                    n += pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
        out[kind] = n
    return out
