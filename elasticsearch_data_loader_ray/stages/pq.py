"""Product quantization (PQ) over embedding columns — Jégou et al. 2011,
"Product Quantization for Nearest Neighbor Search" (public).

The compression tier of the similarity scale path (alongside the LSH and
IVF routing tiers): each vector splits into ``M`` subspaces, each
subspace quantized to one of ``K`` codebook centroids (seeded Lloyd
k-means on a bounded strided sample — the IVF trainer, reused), so an
N x D float32 corpus becomes N x M uint8 codes (32x compression at
D=64, M=8). Queries never decompress: ADC (asymmetric distance
computation) precomputes one (M, K) table of squared subdistances per
query, and a code scan is M table gathers + a sum per candidate —
vectorized over the whole batch.

At 100 TB the codes table is what scans (the float vectors stay cold in
object storage for an optional exact re-rank); the scan distributes as
ordinary ``map_batches`` partial top-k over the codes parquet, merged
on the driver — bounded by queries x k x blocks, never corpus size.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .ivf import _kmeans, _to_mat

PQ_SEED = 20111  # distinct from IVF's seed so stacked IVF+PQ decorrelate


def pq_train(sample: np.ndarray, m: int = 8, k: int = 16) -> np.ndarray:
    """Per-subspace seeded k-means codebooks, shape (m, k, d/m)."""
    n, d = sample.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    dsub = d // m
    books = np.empty((m, min(k, n), dsub), np.float64)
    for j in range(m):
        books[j] = _kmeans(
            np.ascontiguousarray(sample[:, j * dsub:(j + 1) * dsub],
                                 dtype=np.float64),
            min(k, n), seed=PQ_SEED + j)
    return books


def pq_encode(vecs: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) float -> (n, m) uint8 nearest-centroid codes, one argmin
    matmul per subspace."""
    m, _k, dsub = books.shape
    codes = np.empty((len(vecs), m), np.uint8)
    for j in range(m):
        sub = vecs[:, j * dsub:(j + 1) * dsub]
        d2 = ((sub ** 2).sum(axis=1)[:, None]
              + (books[j] ** 2).sum(axis=1)[None, :]
              - 2.0 * (sub @ books[j].T))
        codes[:, j] = d2.argmin(axis=1).astype(np.uint8)
    return codes


def pq_reconstruct(codes: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Decode codes back to the centroid concatenation (the quantized
    vector) — used by tests to bound reconstruction error."""
    m, _k, dsub = books.shape
    out = np.empty((len(codes), m * dsub), np.float64)
    for j in range(m):
        out[:, j * dsub:(j + 1) * dsub] = books[j][codes[:, j]]
    return out


def pq_build(emb_path: str, out_dir: str, m: int = 8, k: int = 16,
             id_col: str = "vec_id", embedding_col: str = "embedding",
             sample_limit: int = 20_000) -> str:
    """Train codebooks on a bounded strided sample, broadcast them once,
    and encode the whole column with one ``map_batches`` pass into a
    codes parquet (id + m uint8 code columns packed as binary)."""
    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    import pyarrow.parquet as pq_

    pf = pq_.ParquetFile(emb_path)
    total = pf.metadata.num_rows
    stride = max(1, total // max(1, sample_limit))
    chunks: list[np.ndarray] = []
    got = 0
    for bi, batch in enumerate(pf.iter_batches(columns=[embedding_col],
                                               batch_size=1024)):
        if bi % stride:
            continue
        take = min(len(batch), sample_limit - got)
        chunks.append(_to_mat(batch.column(0).slice(0, take)))
        got += take
        if got >= sample_limit:
            break
    sample = np.concatenate(chunks)
    books = pq_train(sample, m, k)
    with open(os.path.join(out_dir, "codebooks.json"), "w") as f:
        json.dump({"m": m, "k": int(books.shape[1]),
                   "dsub": int(books.shape[2]),
                   "books": books.tolist()}, f)
    bref = ray.put(books)

    def encode(t: pa.Table) -> pa.Table:
        b = ray.get(bref)
        codes = pq_encode(_to_mat(t[embedding_col]).astype(np.float64), b)
        col = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(m), len(codes),
            [None, pa.py_buffer(np.ascontiguousarray(codes).tobytes())])
        return pa.table({id_col: t[id_col], "code": col})

    (rd.read_parquet(emb_path, columns=[id_col, embedding_col])
     .map_batches(encode, batch_format="pyarrow")
     .write_parquet(os.path.join(out_dir, "codes")))
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        f.write("")
    return out_dir


def _load_books(out_dir: str) -> np.ndarray:
    with open(os.path.join(out_dir, "codebooks.json")) as f:
        meta = json.load(f)
    return np.array(meta["books"], np.float64)


def _code_matrix(col: pa.ChunkedArray | pa.Array, m: int) -> np.ndarray:
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    buf = a.buffers()[-1]  # fixed_size_binary data buffer
    flat = np.frombuffer(buf, np.uint8,
                         count=len(a) * m, offset=a.offset * m)
    return flat.reshape(len(a), m)


def pq_topk(out_dir: str, query_vecs: np.ndarray, query_ids: list[int],
            k: int = 10, id_col: str = "vec_id") -> pa.Table:
    """ADC top-k: per query an (M, K) squared-subdistance table, then a
    distributed code scan — each ``map_batches`` block gathers+sums its
    codes against every query's table and emits its local top-k; the
    driver merge is bounded by queries x k x blocks. Returns
    (query_vec_id, rank, vec_id, adc_dist) with adc_dist the ADC squared
    L2 estimate, rank ascending by (adc_dist, vec_id)."""
    books = _load_books(out_dir)
    m, kk, dsub = books.shape
    nq = len(query_ids)
    luts = np.empty((nq, m, kk), np.float64)
    for j in range(m):
        sub = query_vecs[:, j * dsub:(j + 1) * dsub]
        luts[:, j, :] = ((sub ** 2).sum(axis=1)[:, None]
                         + (books[j] ** 2).sum(axis=1)[None, :]
                         - 2.0 * (sub @ books[j].T))
    lref = ray.put(luts)

    def scan(t: pa.Table) -> pa.Table:
        lt = ray.get(lref)
        codes = _code_matrix(t["code"], m)
        ids = t[id_col].to_numpy()
        out_q, out_v, out_d = [], [], []
        for qi in range(nq):
            d = lt[qi][np.arange(m)[None, :], codes].sum(axis=1)
            dr = np.round(d, 6)
            sel = np.lexsort((ids, dr))[:k]
            out_q.extend([qi] * len(sel))
            out_v.extend(ids[sel].tolist())
            out_d.extend(dr[sel].tolist())
        return pa.table({"qi": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "adc_dist": pa.array(out_d, pa.float64())})

    parts = (rd.read_parquet(os.path.join(out_dir, "codes"))
             .map_batches(scan, batch_format="pyarrow")
             .to_pandas())  # <= queries x k x blocks rows
    out_q, out_r, out_v, out_d = [], [], [], []
    for qi, qid in enumerate(query_ids):
        g = parts[parts["qi"] == qi]
        order = np.lexsort((g["vec_id"].to_numpy(),
                            g["adc_dist"].to_numpy()))[:k]
        for r, j in enumerate(order, start=1):
            out_q.append(qid)
            out_r.append(r)
            out_v.append(int(g["vec_id"].to_numpy()[j]))
            out_d.append(float(g["adc_dist"].to_numpy()[j]))
    return pa.table({
        "query_vec_id": pa.array(out_q, pa.int64()),
        "rank": pa.array(out_r, pa.int64()),
        "vec_id": pa.array(out_v, pa.int64()),
        "adc_dist": pa.array(out_d, pa.float64()),
    })
