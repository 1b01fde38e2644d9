"""Webtext source adapters (S1/S2 analogue).

The reference's source is a MongoDB full-collection cursor scan
(``/root/reference/companybindex/main.go:105-113``); ours is a Dataset read
of the WEBTEXT shape from any of the supported encodings. Parquet is the
primary (columnar, prunable) format; JSON-lines and CSV adapters exist for
ingest parity — both normalize to the canonical Arrow schema (html arrives
base64 in text formats since they cannot carry raw bytes).
"""

from __future__ import annotations

import base64

import pyarrow as pa
import ray.data as rd

from ..schema import WEBTEXT


def read_webtext(path: str, format: str = "parquet",
                 columns: list[str] | None = None) -> rd.Dataset:
    """Read a webtext table as a Dataset in the canonical schema."""
    if format == "parquet":
        return rd.read_parquet(path, columns=columns)
    if format in ("json", "jsonl"):
        ds = rd.read_json(path)
    elif format == "csv":
        ds = rd.read_csv(path)
    else:
        raise ValueError(f"unsupported webtext format: {format}")

    def normalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        html = [base64.b64decode(x) if x else None
                for x in t["html_b64"].to_pylist()]
        out = pa.table({
            "url": pc.cast(t["url"], pa.string()),
            "warc_ts": pc.cast(t["warc_ts"], pa.timestamp("us")),
            "html": pa.array(html, pa.binary()),
            "text": pc.cast(t["text"], pa.large_string()),
            "lang": pc.cast(t["lang"], pa.string()),
        }, schema=WEBTEXT)
        return out.select(columns) if columns else out

    return ds.map_batches(normalize, batch_format="pyarrow")


def write_webtext_jsonl(table: pa.Table, path: str) -> None:
    """Test helper: webtext Arrow table -> JSON-lines file (html as b64)."""
    import json

    with open(path, "w") as f:
        for row in table.to_pylist():
            row = dict(row)
            h = row.pop("html")
            row["html_b64"] = base64.b64encode(h).decode() if h else None
            row["warc_ts"] = row["warc_ts"].isoformat()
            f.write(json.dumps(row) + "\n")
