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


def split_company_name_endings_batch(names: pa.Array | pa.ChunkedArray) -> pa.Table:
    """Vectorized wrapper: string column -> table(name_start, name_ending).

    The per-string scan is first-match-in-declared-order over 72 suffixes —
    cheap enough that the scalar function over a numpy object array is fine
    for this cold (keyword-field) path.
    """
    vals = names.to_numpy(zero_copy_only=False)
    starts = np.empty(len(vals), dtype=object)
    ends = np.empty(len(vals), dtype=object)
    for i, v in enumerate(vals):
        if v is None:
            starts[i] = None
            ends[i] = None
        else:
            starts[i], ends[i] = split_company_name_endings(v)
    return pa.table(
        {"name_start": pa.array(starts, pa.string()),
         "name_ending": pa.array(ends, pa.string())}
    )
