"""Alphabetical-search index — the reference's actual product surface.

The Go loader feeds an ES index whose purpose is *alphabetical company
search*: deterministic ordering and paging over
``ordered_alpha_key_with_id`` (O1, ``transform/transform.go:70``;
keyword mapping ``search_scheme.json:115-117``) plus prefix matching via the
``analyzer_startswith`` family. This module owns that capability natively:

* ``build_alpha_index``: corpus -> EsDoc transform (M5) -> global sort by
  ``ordered_alpha_key_with_id`` -> sorted Parquet run with small row groups.
  Parquet min/max stats over the sorted key make every lookup a
  row-group-pruned range scan (the keyword-index J2 analogue).
* ``alpha_prefix_search(prefix)``: all keys starting with ``prefix`` (the
  ``startswith`` multi-field query), first ``limit`` in key order.
* ``alpha_page_after(after_key)``: keyset pagination — the alphabetical
  browse API (ES search_after analogue).
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.dataset as pads
import ray.data as rd

from ..stages.transform import transform_records

KEY = "ordered_alpha_key_with_id"


def build_alpha_index(corpus: rd.Dataset, out_dir: str,
                      id_column: str = "url") -> str:
    """Transform + globally sort by the alpha key; write the sorted run."""
    success = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(success):
        return out_dir
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    (
        corpus.map_batches(transform_records, batch_format="pyarrow",
                           fn_kwargs={"id_column": id_column})
        .select_columns(["id", KEY, "title", "title_start", "alpha_key"])
        .sort(KEY)
        .write_parquet(out_dir, row_group_size=2048)
    )
    with open(success, "w") as f:
        f.write("")
    return out_dir


def _dataset(alpha_dir: str) -> pads.Dataset:
    files = sorted(
        os.path.join(alpha_dir, f) for f in os.listdir(alpha_dir)
        if f.endswith(".parquet")
    )
    return pads.dataset(files)


def alpha_prefix_search(alpha_dir: str, prefix: str, limit: int = 20) -> pa.Table:
    """Keys starting with ``prefix``, ordered, first ``limit`` rows."""
    ds = _dataset(alpha_dir)
    f = (pads.field(KEY) >= prefix) & (pads.field(KEY) < prefix + "￿")
    t = ds.to_table(filter=f)
    t = t.sort_by([(KEY, "ascending"), ("id", "ascending")])
    return t.slice(0, limit)


def alpha_page_after(alpha_dir: str, after_key: str, size: int = 20) -> pa.Table:
    """Keyset pagination: the ``size`` keys strictly after ``after_key``."""
    ds = _dataset(alpha_dir)
    t = ds.to_table(filter=pads.field(KEY) > after_key)
    t = t.sort_by([(KEY, "ascending"), ("id", "ascending")])
    return t.slice(0, size)
