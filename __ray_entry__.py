"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

* ``entry()`` — flagship pipeline on sf0.001: build the inverted index from
  the documents table through the full engine (corpus -> segments -> term
  stats) and run the BM25 reference queries; returns the top-k table.
* ``queries()`` / ``oracle_sql()`` — one entry per implemented operator
  family from SURVEY.md §2 plus the training-data ops (dedup, similarity
  search, text analysis); SQL oracles for everything SQL-expressible
  (minhash_lsh_pairs and simhash are rows-only by nature).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: BM25 index build + top-k on /root/testdata/sf0.001."""
    from elasticsearch_data_loader_ray.pipelines import catalog

    return catalog.q_bm25_topk("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from elasticsearch_data_loader_ray.pipelines import catalog

    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    from elasticsearch_data_loader_ray.pipelines import catalog

    return catalog.oracle_sql()
