"""S6/J1 — deterministic in-process alpha-key enrichment.

The reference enriches each batch by POSTing names to an external alpha-key
HTTP service and joining the response back positionally
(``/root/reference/eshttp/eshttp.go:78-102``,
``/root/reference/companybindex/main.go:226-247``). The service itself is not
part of the reference repo, so this engine replaces it with a deterministic
pure function with the same interface contract: batch of names in ->
positionally aligned ``(same_as_alpha_key, ordered_alpha_key)`` out, empty
input name ("spacer", ``transform/transform.go:96-99``) -> empty keys.

Key definition (deterministic, suffix/punctuation-normalizing — the same
normalization family as ``analyzer_keyword_token_sort``,
``search_scheme.json:36-49``):

* ``same_as_alpha_key(name)``  = uppercase("& -> AND"(name)) stripped of
  ``[^A-Z0-9]``.
* ``ordered_alpha_key(name)`` = same, computed over ``name_start`` (the name
  with its corporate suffix removed per F15).
"""

from __future__ import annotations

import re

from .suffix import split_company_name_endings

_NON_ALNUM = re.compile(r"[^A-Z0-9]")


def same_as_alpha_key(name: str) -> str:
    if not name:
        return ""
    return _NON_ALNUM.sub("", name.replace("&", "AND").upper())


def ordered_alpha_key(name: str) -> str:
    if not name:
        return ""
    name_start, _ = split_company_name_endings(name)
    return same_as_alpha_key(name_start)


def alpha_keys_bulk(names: list[str]) -> list[tuple[str, str]]:
    """Batch interface mirroring the bulk endpoint: positional alignment is
    guaranteed (output[i] corresponds to names[i]; '' name -> ('','')).
    """
    return [(same_as_alpha_key(n), ordered_alpha_key(n)) for n in names]


def same_as_alpha_key_batch(names):
    """Vectorized :func:`same_as_alpha_key` over an Arrow string column.

    ASCII rows run entirely through Arrow kernels; rows with non-ASCII
    characters fall back to the scalar function (Python ``str.upper`` does
    FULL case mapping — e.g. ``ß -> SS`` — which ``pc.utf8_upper``'s simple
    mapping would miss, and the DuckDB oracle uses full mapping too).
    Nulls stay null.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(names, pa.ChunkedArray):
        names = names.combine_chunks()
    filled = pc.fill_null(names, "")
    keys = pc.replace_substring_regex(
        pc.utf8_upper(pc.replace_substring(filled, "&", "AND")),
        pattern="[^A-Z0-9]", replacement="")
    non_ascii = np.flatnonzero(~np.asarray(pc.string_is_ascii(filled)))
    if len(non_ascii):
        vals = keys.to_pylist()
        raw = filled.to_pylist()
        for i in non_ascii:
            vals[int(i)] = same_as_alpha_key(raw[int(i)])
        keys = pa.array(vals, pa.string())
    if names.null_count:
        keys = pc.if_else(names.is_valid(), keys,
                          pa.scalar(None, pa.string()))
    return pc.cast(keys, pa.string())


def ordered_alpha_key_batch(names):
    """Vectorized :func:`ordered_alpha_key`: suffix-split batch kernel for
    ``name_start``, then the alpha-key kernel. Empty names -> ''."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .suffix import split_company_name_endings_batch

    starts = split_company_name_endings_batch(names)["name_start"]
    if isinstance(starts, pa.ChunkedArray):
        starts = starts.combine_chunks()
    return same_as_alpha_key_batch(starts)
