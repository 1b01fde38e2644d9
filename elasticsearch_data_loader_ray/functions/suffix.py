"""F15 — corporate-name suffix split, semantics-exact re-implementation.

Reference behavior (``/root/reference/format/format.go:99-118``):

1. strip trailing non-word chars ``[^A-Za-z0-9_]+$`` from the name;
2. scan a fixed table of corporate suffixes **in declaration order** and take
   the FIRST entry that is a suffix of the stripped name;
3. ``name_start = stripped` with a trailing ``" " + suffix`` removed (if the
   stripped name IS the suffix, or the suffix is not preceded by a space,
   nothing is removed — Go ``strings.TrimSuffix`` semantics);
4. ``name_ending = name[len(name_start):]`` — original bytes preserved;
5. no table entry matches -> ``(name, "")``.

The suffix table is configuration data reproduced verbatim from
``/root/reference/format/format.go:10-82`` (legal-form suffixes; order is
semantically significant — e.g. "CBC" precedes "CBCN").
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_NON_WORD_END = re.compile(r"[^A-Za-z0-9_]+$")

COMPANY_NAME_ENDINGS: tuple[str, ...] = (
    "AEIE", "ANGHYFYNGEDIG", "C.B.C", "C.C.C", "C.I.C", "CBC", "CBCN", "CBP",
    "CCC", "CCG CYF", "CCG CYFYNGEDIG", "CIC", "COMMUNITY INTEREST COMPANY",
    "COMMUNITY INTEREST P.L.C", "COMMUNITY INTEREST PLC",
    "COMMUNITY INTEREST PUBLIC LIMITED COMPANY", "CWMNI BUDDIANT C.C.C",
    "CWMNI BUDDIANT CCC", "CWMNI BUDDIANT CYMUNEDOL C.C.C",
    "CWMNI BUDDIANT CYMUNEDOL CCC",
    "CWMNI BUDDIANT CYMUNEDOL CYHOEDDUS CYFYNGEDIG",
    "CWMNI BUDDIANT CYMUNEDOL", "CWMNI BUDDSODDIA CHYFALAF NEWIDIOL",
    "CWMNI BUDDSODDIANT PENAGORED", "CWMNI CELL GWARCHODEDIG",
    "CWMNI CYFYNGEDIG CYHOEDDUS", "CYF", "CYFYNGEDIG", "EEIG", "EESV", "EOFG",
    "EOOS", "EUROPEAN ECONOMIC INTEREST GROUPING", "GEIE", "GELE", "ICVC",
    "INVESTMENT COMPANY WITH VARIABLE CAPITAL", "L.P", "L.T.D",
    "LIMITED - THE", "LIMITED LIABILITY PARTNERSHIP", "LIMITED PARTNERSHIP",
    "LIMITED THE", "LIMITED", "LIMITED-THE", "LIMITED...THE", "LIMITED..THE",
    "LIMITED.THE", "LLP", "LP", "LTD", "LTD...THE", "LTD..THE", "LTD.THE",
    "OEIC", "OPEN-ENDED INVESTMENT COMPANY", "P.L.C", "PAC",
    "PARTNERIAETH ATEBOLRWYDD CYFYNGEDIG", "PARTNERIAETH CYFYNGEDIG",
    "PCC LIMITED", "PCC LTD", "PCC", "PLC", "PROTECTED CELL COMPANY",
    "PUBLIC LIMITED COMPANY .THE", "PUBLIC LIMITED COMPANY THE",
    "PUBLIC LIMITED COMPANY", "PUBLIC LIMITED COMPANY.THE", "UNLIMITED",
    "UNLTD",
)


def split_company_name_endings(name: str) -> tuple[str, str]:
    """Split ``name`` into ``(name_start, name_ending)`` — see module doc."""
    stripped = _NON_WORD_END.sub("", name)
    for cne in COMPANY_NAME_ENDINGS:
        if stripped.endswith(cne):
            if stripped.endswith(" " + cne):
                name_start = stripped[: -len(cne) - 1]
            else:
                name_start = stripped  # TrimSuffix(stripped, " "+cne) no-op
            return name_start, name[len(name_start):]
    return name, ""


def _gather_strings(data: np.ndarray, row_starts: np.ndarray,
                    lens: np.ndarray) -> pa.Array:
    """Assemble a string array from per-row (byte_start, byte_len) slices of
    one shared UTF-8 buffer — fully vectorized fancy-index gather."""
    lens = lens.astype(np.int64)
    total = int(lens.sum())
    out_off = np.r_[0, np.cumsum(lens)]
    idx = (np.repeat(row_starts.astype(np.int64), lens)
           + np.arange(total, dtype=np.int64)
           - np.repeat(out_off[:-1], lens))
    return pa.Array.from_buffers(
        pa.large_utf8(), len(lens),
        [None, pa.py_buffer(out_off), pa.py_buffer(data[idx])])


def split_company_name_endings_batch(names: pa.Array | pa.ChunkedArray) -> pa.Table:
    """Vectorized ``split_company_name_endings`` over a string column ->
    table(name_start, name_ending). Byte-exact vs the scalar function:

    * the trailing strip and the 72 suffix probes are ASCII patterns, so the
      byte domain and the codepoint domain agree for any valid UTF-8;
    * first-match-in-declared-order = 72 ``pc.ends_with`` passes that only
      claim still-unmatched rows;
    * slicing happens at ASCII boundaries (the space before a matched
      suffix), so byte cuts never split a multi-byte character.
    """
    import pyarrow.compute as pc

    if isinstance(names, pa.ChunkedArray):
        names = names.combine_chunks()
    n = len(names)
    if n == 0:
        return pa.table({"name_start": pa.array([], pa.string()),
                         "name_ending": pa.array([], pa.string())})
    valid = np.asarray(names.is_valid())
    filled = pc.fill_null(names, "")
    stripped = pc.replace_substring_regex(
        filled, pattern=r"[^A-Za-z0-9_]+$", replacement="")
    match_len = np.zeros(n, dtype=np.int64)   # bytes removed from stripped
    unmatched = np.ones(n, dtype=bool)
    for cne in COMPANY_NAME_ENDINGS:
        m = np.asarray(pc.ends_with(stripped, pattern=cne)) & unmatched
        if not m.any():
            continue
        sp = np.asarray(pc.ends_with(stripped, pattern=" " + cne))
        match_len[m & sp] = len(cne) + 1
        unmatched &= ~m
    # byte lengths of name / stripped per row (large_string-safe)
    def _bytes_of(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        width = np.int64 if pa.types.is_large_string(arr.type) else np.int32
        offs = np.frombuffer(arr.buffers()[1], dtype=width)[
            arr.offset:arr.offset + len(arr) + 1].astype(np.int64)
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8,
                             count=int(offs[-1]))[offs[0]:]
        return offs - offs[0], data

    name_offs, name_data = _bytes_of(filled)
    strip_offs, _sd = _bytes_of(stripped)
    name_len = np.diff(name_offs)
    strip_len = np.diff(strip_offs)
    start_len = np.where(unmatched, name_len, strip_len - match_len)
    starts_arr = _gather_strings(name_data, name_offs[:-1], start_len)
    ends_arr = _gather_strings(name_data, name_offs[:-1] + start_len,
                               name_len - start_len)
    if not valid.all():
        null_s = pa.scalar(None, pa.large_utf8())
        vmask = pa.array(valid)
        starts_arr = pc.if_else(vmask, starts_arr, null_s)
        ends_arr = pc.if_else(vmask, ends_arr, null_s)
    return pa.table(
        {"name_start": pc.cast(starts_arr, pa.string()),
         "name_ending": pc.cast(ends_arr, pa.string())}
    )
