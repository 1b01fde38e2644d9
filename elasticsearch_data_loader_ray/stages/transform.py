"""M5 — full record transform: the EsCompany-document analogue.

Mirrors ``TransformMongoCompanyToEsCompany``
(``/root/reference/transform/transform.go:36-73``) field-for-field over web
documents:

| reference field (elastic.go) | here |
|---|---|
| ``ID``                              | ``id`` (url or stringified doc id) |
| ``company_type``                    | ``lang`` |
| ``kind = searchresults#company``    | ``kind = searchresults#document`` |
| ``links.self = /company/{ID}``      | ``links_self = /doc/{id}`` |
| ``items.corporate_name``            | ``title`` (first paragraph, <=120 chars) |
| ``items.corporate_name_start/_ending`` (F15) | ``title_start`` / ``title_ending`` |
| ``items.record_type = companies``   | ``record_type = documents`` |
| ``items.alpha_key / ordered_alpha_key`` (S6) | same names |
| ``ordered_alpha_key_with_id = key+":"+ID`` | same (transform.go:70) |

Keyword fields honor ``ignore_above: 256``
(``search_scheme.json:105,109,113,117``): values longer than 256 chars are
NULLed in the ``*_keyword`` columns (excluded from keyword indexing) while
the source value is preserved.
"""

from __future__ import annotations

import pyarrow as pa

KIND = "searchresults#document"
RECORD_TYPE = "documents"
IGNORE_ABOVE = 256
TITLE_MAX = 120


def doc_title(text: str) -> str:
    """The 'corporate_name' analogue: first paragraph, capped at 120 chars."""
    return text.split("\n\n", 1)[0][:TITLE_MAX]


def _keyword_mask(values: "pa.Array"):
    """O3 — ignore_above: keyword values >256 chars are not indexed (NULL)."""
    import pyarrow.compute as pc

    return pc.if_else(
        pc.less_equal(pc.utf8_length(values), IGNORE_ABOVE), values,
        pa.scalar(None, pa.string()))


def transform_records(batch: pa.Table, id_column: str = "url",
                      text_column: str = "text",
                      lang_column: str = "lang") -> pa.Table:
    """webtext/corpus batch -> EsDoc-shaped batch (flat columns).

    Rows with NULL or empty text are dropped (M2/M3 — the caller's extract
    stage normally side-writes them first). Fully vectorized: title slicing,
    the 72-suffix split, alpha keys and the keyword masks are Arrow/numpy
    batch kernels (``split_company_name_endings_batch`` /
    ``same_as_alpha_key_batch``), no per-row Python.

    Integer computed fields (ES declares them in
    ``search_scheme.json:119-128`` — ``corporate_stripped_len`` — and
    ``:171-174`` — the ``word_count`` token_count sub-field):

    * ``title_stripped_len``: character length of ``title_start`` (the
      corporate-suffix-stripped title);
    * ``word_count``: standard-analyzer token count of ``title`` (F14).
    """
    import pyarrow.compute as pc

    from ..functions.alphakey import same_as_alpha_key_batch
    from ..functions.analyzers import token_count_batch
    from ..functions.suffix import split_company_name_endings_batch

    keep = pc.and_(batch[text_column].is_valid(),
                   pc.not_equal(batch[text_column], ""))
    batch = batch.filter(keep)
    n = batch.num_rows
    ids = pc.cast(batch[id_column], pa.string())
    texts = batch[text_column]
    # first paragraph, capped at TITLE_MAX codepoints (== doc_title per row)
    titles = pc.cast(pc.utf8_slice_codeunits(
        pc.list_element(pc.split_pattern(texts, "\n\n", max_splits=1), 0),
        0, TITLE_MAX), pa.string())
    if isinstance(titles, pa.ChunkedArray):
        titles = titles.combine_chunks()
    split = split_company_name_endings_batch(titles)
    title_start = split["name_start"]
    if isinstance(title_start, pa.ChunkedArray):
        title_start = title_start.combine_chunks()
    alpha = same_as_alpha_key_batch(titles)
    ordered = same_as_alpha_key_batch(title_start)
    okwid = pc.binary_join_element_wise(ordered, ids, ":")

    return pa.table({
        "id": ids,
        "kind": pa.array([KIND] * n, pa.string()),
        "record_type": pa.array([RECORD_TYPE] * n, pa.string()),
        "lang": batch[lang_column],
        "links_self": pc.binary_join_element_wise(
            pa.scalar("/doc"), ids, "/"),
        "title": titles,
        "title_start": title_start,
        "title_ending": split["name_ending"],
        "alpha_key": alpha,
        "ordered_alpha_key": ordered,
        "ordered_alpha_key_with_id": okwid,
        # ES-declared integer computed fields
        "title_stripped_len": pc.cast(pc.utf8_length(title_start),
                                      pa.int64()),
        "word_count": pa.array(
            token_count_batch(titles).astype("int64"), pa.int64()),
        # keyword (exact-match) projections with ignore_above masking
        "title_keyword": _keyword_mask(titles),
        "alpha_key_keyword": _keyword_mask(alpha),
        "ordered_alpha_key_with_id_keyword": _keyword_mask(okwid),
    })
