"""HTML -> text extraction stage with reject side-outputs.

Mirrors the reference's validity filtering and error side-sinks:

* missing payload (NULL ``html``) ≙ nil ``Data`` ->
  ``transform/transform.go:37-40`` skip + ``missingCompanyData`` error file;
* empty extracted text ≙ empty ``CompanyName`` ->
  ``transform/transform.go:42-45`` skip + ``missingCompanyName`` error file;
* per-row STAGE FAILURES are quarantined, not fatal — the reference's
  transport-error sinks (``postRequestErrors``, ``unexpectedResponse``,
  ``alphaKeyErrors``; ``/root/reference/write/write.go:8-16,45-131``) have
  no network analogue here, but their semantic — a failing record lands in
  a per-kind side-sink with a reason and the partition completes — maps to
  the ``extract_error`` (exception during extraction) and
  ``oversize_payload`` (html larger than ``max_doc_bytes``) kinds;
* error side-sinks are per-kind parquet outputs under
  ``<errors_dir>/<kind>/``. File names are DETERMINISTIC per input batch
  (content digest), so Ray task retries overwrite their own previous
  side-write instead of double-counting rejects.

The extractor is a callable class for ``map_batches(..., concurrency=N)``:
regex compilation happens once per actor in ``__init__`` (ST3/ST4 analogue),
per-batch work is Arrow in / Arrow out. Extraction is the inverse of the
fixture generator's rendering: the text content of every ``<p>`` element in
document order, entity-unescaped, joined with a blank line — golden-tested
byte-identical to the fixture ``text`` column (the per-row invariant from
BASELINE.json ``input_hint``).
"""

from __future__ import annotations

import hashlib
import html as _html
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.analyzers import token_count_batch

REJECT_MISSING_PAYLOAD = "missing_payload"
REJECT_EMPTY_TEXT = "empty_text"
REJECT_OVERSIZE = "oversize_payload"
REJECT_STAGE_ERROR = "extract_error"


def extract_text(html_bytes: bytes, pattern: re.Pattern[str] | None = None) -> str:
    """Extract golden text from one HTML payload (scalar reference path)."""
    pat = pattern or _P_TAG
    doc = html_bytes.decode("utf-8", errors="replace")
    return "\n\n".join(_html.unescape(m) for m in pat.findall(doc))


_P_TAG = re.compile(r"<p[^>]*>(.*?)</p>", re.DOTALL)

# entities the vectorized unescape handles; &amp; must be replaced LAST so
# "&amp;lt;" -> "&lt;" exactly like html.unescape's single pass
_VEC_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                 ("&#x27;", "'"), ("&amp;", "&")]
_OPEN_RE = r"(?s)<p[^>]*>"


def extract_text_batch(html_col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized :func:`extract_text` over a binary column (nulls pass
    through as nulls). Byte-identical to the scalar path: rows the Arrow
    kernels cannot reproduce exactly — an entity outside the five standard
    ones, a fragment with several ``<p`` openings (nested-tag ambiguity),
    or invalid UTF-8 — are detected and routed to the scalar regex per row.

    Pipeline (all Arrow C++ kernels over the whole batch):
    cast utf8 -> split on ``</p>`` -> drop each doc's tail fragment ->
    keep fragments with exactly one ``<p[^>]*>`` opening -> strip through
    the opening tag -> chained entity replacement -> per-doc binary_join.
    """
    if isinstance(html_col, pa.ChunkedArray):
        html_col = html_col.combine_chunks()
    n = len(html_col)
    null_mask = np.asarray(html_col.is_null())
    try:
        docs = pc.cast(html_col, pa.large_string())  # validates utf-8
    except pa.ArrowInvalid:
        # rare poison: per-row scalar path for the whole batch (decode with
        # errors="replace" cannot be expressed as an Arrow cast)
        return pa.array(
            [None if b is None else extract_text(b) for b in html_col.to_pylist()],
            pa.large_string())
    docs = docs.fill_null("")
    scalar_mask = np.zeros(n, dtype=bool)

    frags = pc.split_pattern(docs, "</p>")
    flat = frags.values if hasattr(frags, "values") else frags.combine_chunks().values
    offs = np.asarray(frags.offsets if hasattr(frags, "offsets")
                      else frags.combine_chunks().offsets)
    counts = np.diff(offs)
    doc_of = np.repeat(np.arange(n), counts)
    # the fragment after a doc's final "</p>" has no terminating close tag:
    # dropped (the scalar regex requires the close)
    is_tail = np.zeros(len(flat), dtype=bool)
    is_tail[offs[1:] - 1] = True

    n_open = np.asarray(pc.count_substring_regex(flat, _OPEN_RE))
    # >1 opening before one close: the scalar regex anchors at the FIRST
    # opening, the vector strip at the LAST -> route the doc to scalar
    multi = ~is_tail & (n_open > 1)
    if multi.any():
        scalar_mask |= np.bincount(doc_of[multi], minlength=n).astype(bool)

    keep = ~is_tail & (n_open == 1)
    # exactly one opening -> non-greedy == greedy anchor, and RE2 runs the
    # lazy form ~4x faster here
    content = pc.replace_substring_regex(
        flat.filter(pa.array(keep)), pattern=r"(?s)^.*?<p[^>]*>",
        replacement="", max_replacements=1)

    # unescape is applied to CONTENT only, so entity safety is decided on
    # content: every '&' must start one of the five known entities (then the
    # chained replace, &amp; last, is byte-equal to html.unescape's single
    # pass); any other '&' routes that doc to the scalar path
    n_amp = np.asarray(pc.count_substring(content, "&"))
    has_amp = n_amp > 0
    if has_amp.any():
        n_known = np.asarray(pc.count_substring_regex(
            content, r"&(amp|lt|gt|quot|#x27);"))
        frag_bad = n_amp != n_known
        if frag_bad.any():
            scalar_mask |= np.bincount(doc_of[keep][frag_bad],
                                       minlength=n).astype(bool)
        # replace only the fragments that contain '&' (usually few)
        amp_arr = pa.array(has_amp)
        sub = content.filter(amp_arr)
        for ent, ch in _VEC_ENTITIES:
            sub = pc.replace_substring(sub, pattern=ent, replacement=ch)
        content = pc.replace_with_mask(content, amp_arr, sub)
    kept_per_doc = np.bincount(doc_of[keep], minlength=n)
    new_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(kept_per_doc, out=new_offs[1:])
    joined = pc.binary_join(
        pa.LargeListArray.from_arrays(pa.array(new_offs, pa.int64()), content),
        pa.scalar("\n\n", pa.large_string()))

    scalar_mask &= ~null_mask
    if scalar_mask.any():
        out = np.asarray(joined.to_numpy(zero_copy_only=False), dtype=object)
        raw = html_col.to_pylist()
        for i in np.flatnonzero(scalar_mask):
            out[i] = extract_text(raw[i])
        out[null_mask] = None
        return pa.array(out, pa.large_string())
    if null_mask.any():
        joined = pc.if_else(pa.array(~null_mask), joined,
                            pa.scalar(None, pa.large_string()))
    return joined


def _batch_digest(batch: pa.Table) -> str:
    """Deterministic per-batch id: digest of the url column. A retried Ray
    task reproduces the same batch -> same side-write filename -> the retry
    OVERWRITES its own earlier file instead of appending a duplicate."""
    h = hashlib.md5()
    for u in batch["url"].to_pylist():
        h.update((u or "\x00").encode())
        h.update(b"\n")
    h.update(str(batch.num_rows).encode())
    return h.hexdigest()


def _side_write(errors_dir: str | None, kind: str, batch: pa.Table,
                digest: str, errors: list[str] | None = None) -> None:
    if errors_dir is None or batch.num_rows == 0:
        return
    d = os.path.join(errors_dir, kind)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"part-{digest}.parquet")
    out = batch.select(["url", "warc_ts", "lang"])
    if errors is not None:
        out = out.append_column("error", pa.array(errors, pa.string()))
    tmp = path + ".tmp"
    pq.write_table(out, tmp)
    os.replace(tmp, path)  # atomic: readers never see partial files


def extract_batch(batch: pa.Table, errors_dir: str | None = None,
                  max_doc_bytes: int | None = None) -> pa.Table:
    """map_batches stage: webtext batch -> corpus batch (+ reject side-writes).

    Output columns: url, warc_ts, text, lang, doc_len. Rejected rows are
    dropped from the output and land under ``errors_dir/<kind>/``:
    validity kinds (missing_payload, empty_text), the oversize guard
    (``max_doc_bytes``), and ``extract_error`` — any per-row exception is
    quarantined with its message so a poison record never fails the
    partition (reference ``write/write.go:45-131`` side-sink semantics).
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
    oversize_mask = np.zeros(batch.num_rows, dtype=bool)
    error_mask = np.zeros(batch.num_rows, dtype=bool)
    error_msgs: list[str] = []

    if max_doc_bytes is not None:
        oversize_mask = (~null_mask) & (
            np.asarray(pc.binary_length(html_col).fill_null(0)) > max_doc_bytes)
    try:
        # vectorized hot path; oversize rows nulled so no work is done on them
        work = (html_col if not oversize_mask.any() else
                pc.if_else(pa.array(oversize_mask), None, html_col))
        text_arr = extract_text_batch(work)
    except Exception:
        # a row broke even the Arrow kernels: per-row loop so the poison
        # record is quarantined and the partition still completes
        texts: list[str | None] = [None] * batch.num_rows
        raw = html_col.to_pylist()
        for i, payload in enumerate(raw):
            if payload is None or oversize_mask[i]:
                continue
            try:
                texts[i] = extract_text(payload, _P_TAG)
            except Exception as e:  # quarantine, never fail the partition
                error_mask[i] = True
                error_msgs.append(f"{type(e).__name__}: {e}")
        text_arr = pa.array(texts, pa.large_string())
    empty_mask = (~(null_mask | oversize_mask | error_mask)) & (
        np.asarray(pc.equal(text_arr.fill_null("\x00"), "")))

    digest = _batch_digest(batch)
    _side_write(errors_dir, REJECT_MISSING_PAYLOAD,
                batch.filter(pa.array(null_mask)), digest)
    _side_write(errors_dir, REJECT_EMPTY_TEXT,
                batch.filter(pa.array(empty_mask)), digest)
    _side_write(errors_dir, REJECT_OVERSIZE,
                batch.filter(pa.array(oversize_mask)), digest)
    _side_write(errors_dir, REJECT_STAGE_ERROR,
                batch.filter(pa.array(error_mask)), digest, errors=error_msgs)

    keep = ~(null_mask | empty_mask | oversize_mask | error_mask)
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

    def __init__(self, errors_dir: str | None = None,
                 max_doc_bytes: int | None = None):
        self.pattern = _P_TAG
        self.errors_dir = errors_dir
        self.max_doc_bytes = max_doc_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        return extract_batch(batch, self.errors_dir, self.max_doc_bytes)


def count_rejects(errors_dir: str) -> dict[str, int]:
    """Total rejected rows per kind from the side-written parquet files.
    Every kind directory present is counted (validity kinds always appear
    in the output, even at zero, for a stable stats.json shape)."""
    out: dict[str, int] = {REJECT_MISSING_PAYLOAD: 0, REJECT_EMPTY_TEXT: 0}
    if os.path.isdir(errors_dir):
        for kind in sorted(os.listdir(errors_dir)):
            d = os.path.join(errors_dir, kind)
            if not os.path.isdir(d):
                continue
            n = 0
            for f in os.listdir(d):
                if f.endswith(".parquet"):
                    n += pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
            out[kind] = n
    return out
