"""PII detection / redaction over text columns (training-data hygiene).

A 100-TB pretraining pipeline scrubs personally-identifiable information
before anything else sees the text. This stage is the vectorized Ray-side
kernel: RE2 regexes via ``pyarrow.compute`` (``count_substring_regex`` /
``replace_substring_regex``), zero Python-per-row work, so it composes
into any ``map_batches`` chain at full Arrow speed.

Contract notes:

* Counts are taken on the RAW text, then redaction is applied in the
  fixed declared order (email, ipv4, phone) — an email containing an
  IP-shaped host is counted once as an email and redacted by the email
  pass first. The DuckDB oracle mirrors both the patterns and the order.
* Patterns are RE2-compatible (pyarrow and DuckDB both run RE2), so the
  engine and the SQL oracle are bit-identical by construction — no
  lookarounds, ASCII classes only.
* Nulls map to empty strings (count 0, redacted "").

The reference loader has no PII path (it ships registry data); this is
part of the beyond-reference training-data surface the build brief asks
for, next to dedup/langid/quality in ``pipelines/catalog.py``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, replacement) — applied in this order
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email",
     "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
     "[EMAIL]"),
    ("ipv4",
     "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b",
     "[IP]"),
    ("phone",
     "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b",
     "[PHONE]"),
)


def pii_counts(texts: pa.Array | pa.ChunkedArray) -> dict[str, pa.Array]:
    """Per-document match counts for every PII pattern, on the raw text.

    Returns ``{"n_<name>": int64 array}`` — one vectorized RE2 scan per
    pattern, no row loop.
    """
    t = pc.fill_null(texts, "")
    return {
        f"n_{name}": pc.cast(pc.count_substring_regex(t, pat), pa.int64())
        for name, pat, _rep in PII_PATTERNS
    }


def pii_redact(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Replace every PII match with its placeholder token, in the fixed
    declared order. Nulls become empty strings."""
    red = pc.fill_null(texts, "")
    for _name, pat, rep in PII_PATTERNS:
        red = pc.replace_substring_regex(red, pattern=pat, replacement=rep)
    return red


def pii_scan_batch(batch: pa.Table, text_col: str = "text",
                   redact: bool = True) -> pa.Table:
    """``map_batches`` kernel: append per-pattern counts (and optionally
    the redacted text) to the batch."""
    out = batch
    for col, arr in pii_counts(batch[text_col]).items():
        out = out.append_column(col, arr)
    if redact:
        out = out.append_column(f"{text_col}_redacted",
                                pii_redact(batch[text_col]))
    return out
