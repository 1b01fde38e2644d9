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

from ..functions.alphakey import ordered_alpha_key, same_as_alpha_key
from ..functions.suffix import split_company_name_endings

KIND = "searchresults#document"
RECORD_TYPE = "documents"
IGNORE_ABOVE = 256
TITLE_MAX = 120


def doc_title(text: str) -> str:
    """The 'corporate_name' analogue: first paragraph, capped at 120 chars."""
    return text.split("\n\n", 1)[0][:TITLE_MAX]


def _keyword_mask(values: list[str | None]) -> list[str | None]:
    """O3 — ignore_above: keyword values >256 chars are not indexed (NULL)."""
    return [v if v is not None and len(v) <= IGNORE_ABOVE else None
            for v in values]


def transform_records(batch: pa.Table, id_column: str = "url",
                      text_column: str = "text",
                      lang_column: str = "lang") -> pa.Table:
    """webtext/corpus batch -> EsDoc-shaped batch (flat columns).

    Rows with NULL or empty text are dropped (M2/M3 — the caller's extract
    stage normally side-writes them first).
    """
    import pyarrow.compute as pc

    keep = pc.and_(batch[text_column].is_valid(),
                   pc.not_equal(batch[text_column], ""))
    batch = batch.filter(keep)
    ids = [str(x) for x in batch[id_column].to_pylist()]
    texts = batch[text_column].to_pylist()
    langs = batch[lang_column].to_pylist()

    titles = [doc_title(x) for x in texts]
    splits = [split_company_name_endings(t) for t in titles]
    alpha = [same_as_alpha_key(t) for t in titles]
    ordered = [ordered_alpha_key(t) for t in titles]
    n = len(ids)
    okwid = [f"{o}:{i}" for o, i in zip(ordered, ids)]

    return pa.table({
        "id": pa.array(ids, pa.string()),
        "kind": pa.array([KIND] * n, pa.string()),
        "record_type": pa.array([RECORD_TYPE] * n, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "links_self": pa.array([f"/doc/{i}" for i in ids], pa.string()),
        "title": pa.array(titles, pa.string()),
        "title_start": pa.array([s[0] for s in splits], pa.string()),
        "title_ending": pa.array([s[1] for s in splits], pa.string()),
        "alpha_key": pa.array(alpha, pa.string()),
        "ordered_alpha_key": pa.array(ordered, pa.string()),
        "ordered_alpha_key_with_id": pa.array(okwid, pa.string()),
        # keyword (exact-match) projections with ignore_above masking
        "title_keyword": pa.array(_keyword_mask(titles), pa.string()),
        "alpha_key_keyword": pa.array(_keyword_mask(alpha), pa.string()),
        "ordered_alpha_key_with_id_keyword": pa.array(
            _keyword_mask(okwid), pa.string()),
    })
