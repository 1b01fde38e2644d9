"""q_bm25_topk doc-id robustness: the engine's internal ids are rank-of-url,
and results must map back to ORIGINAL documents.doc_id values even when ids
have gaps or rows have invalid text (ADVICE r1: rank==doc_id held only by
fixture accident)."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _doctored_documents(tmp_path) -> str:
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    # punch doc_id gaps: drop every 7th row entirely
    keep = np.ones(t.num_rows, dtype=bool)
    keep[::7] = False
    t = t.filter(pa.array(keep))
    # invalidate some texts (engine must skip them; ids of later docs shift
    # in rank space but NOT in the reported doc_id)
    texts = t["text"].to_pylist()
    for i in range(3, len(texts), 11):
        texts[i] = None if i % 2 else ""
    t = t.set_column(t.schema.get_field_index("text"), "text",
                     pa.array(texts, t["text"].type))
    sf = tmp_path / "sf_doctored"
    sf.mkdir()
    pq.write_table(t, str(sf / "documents.parquet"))
    return str(sf)


def test_bm25_ids_survive_gaps_and_invalid_rows(tmp_path):
    from elasticsearch_data_loader_ray.pipelines import catalog

    sf = _doctored_documents(tmp_path)
    got = catalog.q_bm25_topk(sf)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = con.sql(catalog._sql_bm25_topk()).df()
    g = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    w = want.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert g["doc_id"].tolist() == w["doc_id"].tolist()
    assert np.allclose(g["score"], w["score"], rtol=0, atol=0)
    # the doctored ids are non-dense, so rank != doc_id somewhere
    assert g["doc_id"].tolist() != list(range(len(g)))
