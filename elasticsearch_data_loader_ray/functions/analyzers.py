"""Analyzer chains — native re-implementation of the ES analysis DDL.

The reference declares its analysis chain in
``/root/reference/config/search_scheme.json`` (tokenizers :75-81, filters
:59-74, char_filters :82-94, named analyzers :8-57); ElasticSearch executes
it. Here every tokenizer / filter / char-filter is a pure Python function and
every named analyzer is a composition, so the index build and the query path
share one implementation.

Two layers:

* scalar layer (``tokenize_*`` / ``filter_*`` / ``analyze(name, text)``):
  exact per-string semantics, used for keyword-ish fields, query analysis and
  golden tests (FIXTURES.md §4).
* batch layer (``standard_tokenize_batch``): the hot path for the inverted
  index build — pyarrow.compute RE2 kernels over whole Arrow columns, no
  per-row Python. Its token stream is identical to
  ``analyze("standard", text)`` (golden-tested).

Fidelity notes (documented deviations):

* The "standard" tokenizer approximates UAX#29 word segmentation as maximal
  runs of Unicode letters/digits (``[\\p{L}\\p{N}]+`` in RE2 /
  ``[^\\W_]+`` in Python ``re``).  This matches UAX#29 for
  letter/digit/diacritic text (our corpus) and, critically, is expressible
  identically in pyarrow, Python and DuckDB (the correctness oracle).
* ``edge_ngram`` follows the ES tokenizer default (``token_chars: []``): the
  whole input is one "word"; n-grams are leading edges of the full string,
  min_gram=2 / max_gram=20 (search_scheme.json:76-81).
"""

from __future__ import annotations

import re
import unicodedata
from collections.abc import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# --- tokenizer regexes ----------------------------------------------------
# RE2 flavor (pyarrow.compute, DuckDB) and Python-re flavor of the same class.
RE2_TOKEN_DELIM = r"[^\p{L}\p{N}]+"
RE2_TOKEN = r"[\p{L}\p{N}]+"
_PY_TOKEN = re.compile(r"[^\W_]+", re.UNICODE)
_PY_LETTERS = re.compile(r"[^\W\d_]+", re.UNICODE)  # ES "lowercase"/"simple" tokenizer
_WS_RUN = re.compile(r"\s+")
# Java \p{Punct} = ASCII punctuation; the filter pattern [\s+|\p{Punct}]
# is a char class of whitespace + punctuation (search_scheme.json:69-73).
_WS_PUNC = re.compile(r"[\s!-/:-@\[-`{-~]")
_NON_ALNUM_ASCII = re.compile(r"[^a-zA-Z0-9]")

EDGE_NGRAM_MIN = 2  # search_scheme.json:78
EDGE_NGRAM_MAX = 20  # search_scheme.json:79
KEYWORD_IGNORE_ABOVE = 256  # search_scheme.json:105,109,113,117


# --- tokenizers (F1-F4) ---------------------------------------------------

def tokenize_standard(text: str) -> list[str]:
    """F1 — 'standard' tokenizer (UAX#29-approx; see module docstring)."""
    return _PY_TOKEN.findall(text)


def tokenize_whitespace(text: str) -> list[str]:
    """F2 — 'whitespace' tokenizer: maximal non-whitespace runs."""
    return text.split()


def tokenize_keyword(text: str) -> list[str]:
    """F3 — 'keyword' tokenizer: whole value is one token ('' -> no token)."""
    return [text] if text else []


def tokenize_letters(text: str) -> list[str]:
    """ES 'lowercase'/'letter' tokenizer core: maximal letter runs."""
    return _PY_LETTERS.findall(text)


def tokenize_edge_ngram(
    text: str, min_gram: int = EDGE_NGRAM_MIN, max_gram: int = EDGE_NGRAM_MAX
) -> list[str]:
    """F4 — 'edge_ngram' tokenizer, ES defaults (token_chars=[]):

    leading-edge n-grams of the whole input, lengths min_gram..max_gram.
    """
    n = len(text)
    return [text[:k] for k in range(min_gram, min(max_gram, n) + 1)]


# --- token filters (F5-F11) ----------------------------------------------

def _lower(s: str) -> str:
    """Unicode simple-mapping lowercase via the same Arrow kernel the batch
    tokenizer uses (utf8_lower), so scalar and batch analysis agree even for
    full-casing characters like 'İ' (str.lower gives a 2-codepoint result,
    utf8_lower the simple 1-codepoint mapping)."""
    if s.isascii():
        return s.lower()
    return pc.utf8_lower(pa.scalar(s)).as_py()


def filter_lowercase(tokens: list[str]) -> list[str]:
    """F5 — Unicode lowercase (simple mapping, matching the batch layer)."""
    return [_lower(t) for t in tokens]


def fold_ascii(text: str) -> str:
    """NFKD-decompose and strip combining marks (asciifolding core)."""
    return "".join(
        c for c in unicodedata.normalize("NFKD", text) if not unicodedata.combining(c)
    )


def filter_asciifolding_preserve(tokens: list[str]) -> list[str]:
    """F6 — asciifolding with preserve_original: folded token first, then the
    original when it differs (search_scheme.json:60-63; FIXTURES.md café case).
    """
    out: list[str] = []
    for t in tokens:
        folded = fold_ascii(t)
        out.append(folded)
        if folded != t:
            out.append(t)
    return out


def filter_whitespace_remove(tokens: list[str]) -> list[str]:
    """F7 — pattern_replace \\s+ -> '' (search_scheme.json:64-68)."""
    return [_WS_RUN.sub("", t) for t in tokens]


def filter_ws_punc_remove(tokens: list[str]) -> list[str]:
    """F8 — pattern_replace [\\s+|\\p{Punct}] -> '' (search_scheme.json:69-73)."""
    return [_WS_PUNC.sub("", t) for t in tokens]


def filter_unique(tokens: list[str]) -> list[str]:
    """F9 — drop duplicate tokens, first occurrence kept."""
    seen: set[str] = set()
    out = []
    for t in tokens:
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out


def filter_limit_first(tokens: list[str]) -> list[str]:
    """F10 — 'limit' filter, default max_token_count=1."""
    return tokens[:1]


def filter_trim(tokens: list[str]) -> list[str]:
    """F11 — strip surrounding whitespace."""
    return [t.strip() for t in tokens]


# --- char filters (F12, F13) ---------------------------------------------

def char_filter_remove_special(text: str) -> str:
    """F12 — pattern_replace [^a-zA-Z0-9] -> '' (search_scheme.json:83-87)."""
    return _NON_ALNUM_ASCII.sub("", text)


def char_filter_amp_mapping(text: str) -> str:
    """F13 — mapping '& => and' (search_scheme.json:88-93)."""
    return text.replace("&", "and")


# --- named analyzers (search_scheme.json:8-57 + built-ins) ----------------

def _chain(
    char_filters: list[Callable[[str], str]],
    tokenizer: Callable[[str], list[str]],
    filters: list[Callable[[list[str]], list[str]]],
) -> Callable[[str], list[str]]:
    def analyzer(text: str) -> list[str]:
        for cf in char_filters:
            text = cf(text)
        tokens = tokenizer(text)
        for f in filters:
            tokens = f(tokens)
        return tokens

    return analyzer


ANALYZERS: dict[str, Callable[[str], list[str]]] = {
    # search_scheme.json:9-12
    "analyzer_startswith": _chain(
        [], tokenize_keyword, [filter_lowercase, filter_whitespace_remove]
    ),
    # search_scheme.json:13-16
    "startswith_no_ws_punc": _chain(
        [], tokenize_keyword, [filter_lowercase, filter_ws_punc_remove]
    ),
    # search_scheme.json:17-20
    "analyzer_unique_tf": _chain(
        [],
        tokenize_standard,
        [filter_lowercase, filter_whitespace_remove, filter_unique],
    ),
    # search_scheme.json:21-24
    "analyzer_limit_first": _chain(
        [], tokenize_standard, [filter_lowercase, filter_limit_first]
    ),
    # search_scheme.json:25-27 (tokenizer only — no lowercase)
    "analyzer_elastic": _chain([], tokenize_standard, []),
    # search_scheme.json:28-35
    "analyzer_whitespace_token": _chain(
        [], tokenize_whitespace, [filter_lowercase, filter_asciifolding_preserve]
    ),
    # search_scheme.json:36-49 (char filters apply in declared order)
    "analyzer_keyword_token_sort": _chain(
        [char_filter_amp_mapping, char_filter_remove_special],
        tokenize_keyword,
        [
            filter_lowercase,
            filter_asciifolding_preserve,
            filter_trim,
            filter_whitespace_remove,
        ],
    ),
    # search_scheme.json:50-57
    "analyzer_edge_ngram_token": _chain(
        [], tokenize_edge_ngram, [filter_lowercase, filter_asciifolding_preserve]
    ),
    # ES built-in 'simple' (search_scheme.json:159-162)
    "simple": _chain([], tokenize_letters, [filter_lowercase]),
    # ES built-in 'standard' = standard tokenizer + lowercase (default on
    # plain text fields, search_scheme.json:163-178) — the BM25 index analyzer.
    "standard": _chain([], tokenize_standard, [filter_lowercase]),
}


def analyze(name: str, text: str) -> list[str]:
    """Run named analyzer ``name`` over ``text`` -> token list."""
    return ANALYZERS[name](text)


def token_count(text: str) -> int:
    """F14 — 'token_count' field type with the standard analyzer
    (search_scheme.json:171-174): number of standard-analyzer tokens.
    """
    return len(ANALYZERS["standard"](text))


# --- batch layer (hot path) ----------------------------------------------

def standard_tokenize_batch(
    texts: pa.ChunkedArray | pa.Array,
) -> tuple[np.ndarray, pa.Array, np.ndarray]:
    """Vectorized 'standard' analyzer over an Arrow string column.

    Returns ``(doc_index, tokens, doc_len)`` where ``tokens`` is the flat
    Arrow string array of all tokens in order, ``doc_index[i]`` is the row
    each token came from, and ``doc_len[r]`` is the token count of row ``r``
    (BM25 ``dl`` / F14). Nulls tokenize to zero tokens.

    Fast path: token boundaries + lowercasing computed directly on the
    UTF-8 byte buffer with the class/lowercase tables (ASCII + safe 2-byte
    codepoints; ~6x faster than the RE2 split — the split's unicode-class
    automaton dominated segment builds). Batches containing 3/4-byte
    sequences or case-expanding codepoints fall back to the RE2 path; both
    paths are identity-tested against each other and the scalar analyzer.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    fast = _tokenize_bytes(texts)
    if fast is not None:
        return fast
    return _tokenize_arrow(texts)


def _tokenize_arrow(
    texts: pa.Array,
) -> tuple[np.ndarray, pa.Array, np.ndarray]:
    """RE2 path: one regex split over the lowercased column, then numpy
    offset arithmetic to drop the empty edge fragments."""
    n = len(texts)
    lowered = pc.utf8_lower(texts)
    lists = pc.split_pattern_regex(lowered, pattern=RE2_TOKEN_DELIM)
    lists = lists.fill_null([])  # null text -> no tokens
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    offsets = np.asarray(lists.offsets)
    lengths = np.diff(offsets)
    doc_index = np.repeat(np.arange(n, dtype=np.int64), lengths)
    # split_pattern_regex leaves '' fragments at delimiter-adjacent edges
    keep = np.asarray(pc.not_equal(flat, "").combine_chunks()
                      if isinstance(flat, pa.ChunkedArray) else pc.not_equal(flat, ""))
    tokens = flat.filter(pa.array(keep))
    doc_index = doc_index[keep]
    doc_len = np.bincount(doc_index, minlength=n).astype(np.int32)
    return doc_index, tokens, doc_len


def _lower_luts() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(ascii lowercase byte map, 2-byte pair lowercase map, 2-byte-safe
    mask). A 2-byte codepoint is SAFE when lowercasing is 1:1 onto another
    2-byte codepoint (no expansion like U+0130) and does not change its
    token class — everything else routes the batch to the RE2 path."""
    low1 = np.arange(256, dtype=np.uint8)
    low1[65:91] += 32
    low2 = np.zeros((30 * 64, 2), dtype=np.uint8)
    safe2 = np.zeros(30 * 64, dtype=bool)
    for lead in range(0xC2, 0xE0):
        for cont in range(0x80, 0xC0):
            i = (lead - 0xC2) * 64 + (cont - 0x80)
            cp = ((lead & 0x1F) << 6) | (cont & 0x3F)
            lo = chr(cp).lower()
            enc = lo.encode("utf-8")
            if len(lo) == 1 and len(enc) == 2 and (
                    bool(_PY_TOKEN.fullmatch(lo)) ==
                    bool(_PY_TOKEN.fullmatch(chr(cp)))):
                low2[i] = list(enc)
                safe2[i] = True
    return low1, low2, safe2


_LOW1, _LOW2, _SAFE2 = _lower_luts()


def _ascii_map() -> np.ndarray:
    """Combined lowercase+delimiter single-byte map: ASCII token chars ->
    lowercase, ASCII non-token -> space; bytes >= 0x80 identity (2-byte
    pairs fixed up separately)."""
    m = np.full(256, 0x20, dtype=np.uint8)
    m[128:] = np.arange(128, 256, dtype=np.uint8)
    for lo, hi in [(48, 58), (97, 123)]:
        m[lo:hi] = np.arange(lo, hi, dtype=np.uint8)
    m[65:91] = np.arange(97, 123, dtype=np.uint8)
    return m


_ASCII_MAP = _ascii_map()


def _tokenize_bytes(
    texts: pa.Array,
) -> tuple[np.ndarray, pa.Array, np.ndarray] | None:
    """Byte-domain tokenize+lowercase; None if the batch needs the RE2
    path (3/4-byte sequences or unsafe 2-byte codepoints present).

    One LUT pass rewrites the whole buffer to "lowercased tokens separated
    by spaces" (2-byte pairs lowered or blanked pairwise), the ORIGINAL
    offsets are reused zero-copy, and Arrow's single-byte split does the
    token extraction in C++."""
    arr = pc.fill_null(texts, "")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return (np.empty(0, np.int64), pa.array([], pa.string()),
                np.zeros(0, np.int32))
    width = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    all_offs = np.frombuffer(arr.buffers()[1], dtype=width)
    offs = all_offs[arr.offset:arr.offset + n + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8,
                         count=int(offs[-1]))[int(offs[0]):]
    if (data >= 0xE0).any():
        return None
    out = _ASCII_MAP[data]
    li = np.flatnonzero((data >= 0xC2) & (data < 0xE0))
    if len(li):
        li = li[li + 1 < len(data)]
        pair_idx = (data[li].astype(np.int64) - 0xC2) * 64 \
            + (data[li + 1].astype(np.int64) - 0x80)
        if not _SAFE2[pair_idx].all():
            return None
        is_tok = _LUT2[pair_idx]
        t_i = li[is_tok]
        out[t_i] = _LOW2[pair_idx[is_tok], 0]
        out[t_i + 1] = _LOW2[pair_idx[is_tok], 1]
        d_i = li[~is_tok]
        out[d_i] = 0x20
        out[d_i + 1] = 0x20
    off0 = int(offs[0])
    remapped = pa.Array.from_buffers(
        pa.large_utf8() if width is np.int64 else pa.utf8(), n,
        [None, pa.py_buffer(np.ascontiguousarray(offs - off0)),
         pa.py_buffer(out)])
    lists = pc.split_pattern(remapped, " ")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    l_offs = np.asarray(lists.offsets)
    lengths = np.diff(l_offs)
    doc_index = np.repeat(np.arange(n, dtype=np.int64), lengths)
    keep = np.asarray(pc.not_equal(flat, ""))
    tokens = flat.filter(pa.array(keep))
    doc_index = doc_index[keep]
    doc_len = np.bincount(doc_index, minlength=n).astype(np.int32)
    return doc_index, tokens, doc_len


def _tokclass_luts() -> tuple[np.ndarray, np.ndarray]:
    """Byte-level token-character classification tables.

    ``lut1[b]``: is single byte ``b`` (ASCII) a token char.
    ``lut2[(lead-0xC2)*64 + (cont-0x80)]``: is the 2-byte UTF-8 sequence's
    codepoint (U+0080..U+07FF) a token char — built from the scalar
    analyzer's own ``[^\\W_]`` class, so byte counting is exact by
    construction.
    """
    lut1 = np.zeros(256, dtype=bool)
    for lo, hi in [(48, 58), (65, 91), (97, 123)]:
        lut1[lo:hi] = True
    lut2 = np.zeros(30 * 64, dtype=bool)
    for lead in range(0xC2, 0xE0):
        for cont in range(0x80, 0xC0):
            cp = ((lead & 0x1F) << 6) | (cont & 0x3F)
            if _PY_TOKEN.fullmatch(chr(cp)):
                lut2[(lead - 0xC2) * 64 + (cont - 0x80)] = True
    return lut1, lut2


_LUT1, _LUT2 = _tokclass_luts()


def _token_count_bytes(offs: np.ndarray, data: np.ndarray) -> np.ndarray:
    """Count token runs per row directly on the UTF-8 byte buffer (rows must
    contain no 3/4-byte sequences — caller routes those to RE2)."""
    tok = _LUT1[data]
    lead2 = (data >= 0xC2) & (data < 0xE0)
    if lead2.any():
        li = np.flatnonzero(lead2)
        li = li[li + 1 < len(data)]
        tok[li] = _LUT2[(data[li].astype(np.int64) - 0xC2) * 64
                        + (data[li + 1].astype(np.int64) - 0x80)]
        # continuation byte inherits its lead's class (single continuation
        # only: 2-byte sequences)
        tok[li + 1] = tok[li]
    starts = tok.copy()
    starts[1:] &= ~tok[:-1]
    # run starts are sparse (~1 per 6 bytes): count per row via positions +
    # searchsorted instead of a full-buffer cumsum (~10x cheaper)
    pos = np.flatnonzero(starts)
    cnt = (np.searchsorted(pos, offs[1:])
           - np.searchsorted(pos, offs[:-1]))
    # a row whose first char is a token char after a row ending in one is a
    # fresh run (rows are adjacent in the buffer)
    b = offs[:-1]
    inner = np.flatnonzero((b > 0) & (offs[1:] > b))
    if len(inner):
        add = tok[b[inner]] & tok[b[inner] - 1]
        cnt[inner[add]] += 1
    return cnt


def token_count_batch(texts: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Vectorized F14 token counts (== len(analyze('standard', t)) per row).

    Counting needs no token MATERIALIZATION: a token count is the number of
    ``[\\p{L}\\p{N}]+`` runs (lowercasing cannot change letter/digit class
    membership, so it is skipped). Rows made of ASCII + 2-byte UTF-8 are
    counted with numpy byte tables (memory-bandwidth fast path); rows with
    any 3/4-byte sequence (CJK etc.) fall back to one RE2 scan. Nulls
    count 0.
    """
    arr = pc.fill_null(texts, "")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.int32)
    width = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    all_offs = np.frombuffer(arr.buffers()[1], dtype=width)
    offs = all_offs[arr.offset:arr.offset + n + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8,
                         count=int(offs[-1]))[offs[0]:]
    offs = offs - offs[0]
    hi = np.flatnonzero(data >= 0xE0)
    if len(hi):
        hi_rows = np.unique(np.searchsorted(offs, hi, side="right") - 1)
        hi_mask = np.zeros(n, dtype=bool)
        hi_mask[hi_rows] = True
        out = _token_count_bytes(offs, data)
        sub = arr.filter(pa.array(hi_mask))
        out[hi_mask] = np.asarray(
            pc.count_substring_regex(sub, RE2_TOKEN)).astype(np.int64)
        return out.astype(np.int32)
    return _token_count_bytes(offs, data).astype(np.int32)


def analyze_column(texts: pa.ChunkedArray | pa.Array,
                   analyzer_name: str) -> tuple[np.ndarray, pa.Array, np.ndarray]:
    """Named-analyzer version of :func:`standard_tokenize_batch`.

    Returns ``(doc_index, tokens, doc_len)``. 'standard' takes the RE2 batch
    fast path; other chains (keyword-ish multi-fields — short token streams)
    run the scalar analyzer per row with the chain compiled once.
    """
    if analyzer_name == "standard":
        return standard_tokenize_batch(texts)
    fn = ANALYZERS[analyzer_name]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    flat: list[str] = []
    lengths = np.zeros(n, dtype=np.int64)
    for i, v in enumerate(texts.to_pylist()):
        if not v:
            continue
        toks = fn(v)
        lengths[i] = len(toks)
        flat.extend(toks)
    doc_index = np.repeat(np.arange(n, dtype=np.int64), lengths)
    return doc_index, pa.array(flat, pa.string()), lengths.astype(np.int32)
