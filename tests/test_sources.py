from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from elasticsearch_data_loader_ray import fixtures
from elasticsearch_data_loader_ray.sources.webtext import (
    read_webtext,
    write_webtext_jsonl,
)


def test_jsonl_roundtrip_matches_parquet(tmp_path):
    t = fixtures.generate_webtext(100)
    pq.write_table(t, str(tmp_path / "w.parquet"))
    write_webtext_jsonl(t, str(tmp_path / "w.jsonl"))
    a = (read_webtext(str(tmp_path / "w.parquet")).to_pandas()
         .sort_values("url").reset_index(drop=True))
    b = (read_webtext(str(tmp_path / "w.jsonl"), format="jsonl").to_pandas()
         .sort_values("url").reset_index(drop=True))
    assert a["url"].tolist() == b["url"].tolist()
    assert a["text"].tolist() == b["text"].tolist()
    assert a["html"].tolist() == b["html"].tolist()
    assert a["warc_ts"].tolist() == b["warc_ts"].tolist()


def test_unsupported_format():
    with pytest.raises(ValueError, match="unsupported"):
        read_webtext("/tmp/x", format="xml")
