"""C4-style line-level cleaning (Raffel et al. 2020, "Exploring the
Limits of Transfer Learning" §2.2 — the public C4 heuristics).

Per LINE (``\\n``-separated):

* keep only lines ending in a terminal punctuation mark (``. ! ? "``);
* keep only lines with at least ``MIN_WORDS_PER_LINE`` (5) words
  (whitespace-split, as C4 counts them);
* drop any line containing the word ``javascript`` (case-insensitive).

Per PAGE (document):

* drop pages containing the phrase ``lorem ipsum`` (case-insensitive);
* drop pages containing a curly brace ``{``;
* drop pages with fewer than ``MIN_KEPT_LINES`` (3) surviving lines
  (C4's "fewer than 3 sentences" rule applied post-line-filter).

Everything is vectorized over Arrow columns: one ``split_pattern`` to
the flat line table, one RE2 scan per line rule, and an offsets-based
regroup — no per-row Python. The reference has no cleaning stage (it
ships records to ES verbatim); this is part of the training-data
surface layered on the same corpus schema.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MIN_WORDS_PER_LINE = 5
MIN_KEPT_LINES = 3
# terminal punctuation per C4: period, exclamation, question, end quote
_TERMINAL_RE = r'[.!?"]$'
_BAD_LINE_RE = r"(?i)\bjavascript\b"
_LOREM_RE = r"(?i)lorem ipsum"


def _as_large(col) -> pa.Array:
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if not pa.types.is_large_string(a.type):
        a = pc.cast(a, pa.large_string())
    return a


def c4_clean(texts: pa.Array | pa.ChunkedArray) -> dict[str, pa.Array]:
    """Apply the C4 rules to a text column. Returns parallel arrays:
    ``n_lines`` (int64), ``n_kept`` (int64), ``keep`` (bool — the page
    survives), ``cleaned`` (large_string — surviving lines joined by
    ``\\n``; empty string for dropped pages, mirroring a filter+project
    pipeline that never materializes dropped pages)."""
    t = pc.fill_null(_as_large(texts), "")
    n = len(t)
    lines = pc.split_pattern(t, "\n")  # large_list<large_string>
    lines = lines.combine_chunks() if isinstance(
        lines, pa.ChunkedArray) else lines
    flat = lines.flatten()
    offs = lines.offsets.to_numpy(zero_copy_only=False)
    n_lines = np.diff(offs).astype(np.int64)

    terminal = pc.match_substring_regex(flat, _TERMINAL_RE)
    # C4 counts words by whitespace split; a line of k words has k-1
    # separators — count separators on the whitespace-collapsed trim
    trimmed = pc.utf8_trim_whitespace(flat)
    n_words = pc.add(
        pc.count_substring_regex(trimmed, r"\s+"),
        pc.cast(pc.greater(pc.utf8_length(trimmed), 0), pa.int32()))
    bad = pc.match_substring_regex(flat, _BAD_LINE_RE)
    keep_line = np.asarray(
        pc.and_(pc.and_(terminal, pc.invert(bad)),
                pc.greater_equal(n_words, MIN_WORDS_PER_LINE)))

    parent = np.repeat(np.arange(n), n_lines)
    kept_per_doc = np.bincount(parent[keep_line], minlength=n
                               ).astype(np.int64)

    lorem = pc.match_substring_regex(t, _LOREM_RE)
    brace = pc.match_substring(t, "{")
    keep_doc = (~np.asarray(pc.or_(lorem, brace))) & (
        kept_per_doc >= MIN_KEPT_LINES)

    # regroup surviving lines of surviving pages (dropped pages emit "")
    final_line = keep_line & keep_doc[parent]
    kept_flat = flat.filter(pa.array(final_line))
    counts = np.bincount(parent[final_line], minlength=n)
    new_offs = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    regrouped = pa.LargeListArray.from_arrays(
        pa.array(new_offs, pa.int64()), kept_flat)
    cleaned = pc.binary_join(regrouped, pa.scalar("\n", pa.large_string()))
    return {
        "n_lines": pa.array(n_lines, pa.int64()),
        "n_kept": pa.array(kept_per_doc, pa.int64()),
        "keep": pa.array(keep_doc, pa.bool_()),
        "cleaned": cleaned,
    }
