"""IVF (inverted-file) approximate nearest neighbors over embedding columns.

The second ANN scale path (alongside the hyperplane-LSH variant in
``similarity.py``): a coarse quantizer (seeded Lloyd k-means on a sample)
partitions vectors by nearest centroid; the index is written
hive-partitioned by centroid so a query reads ONLY its ``n_probe`` nearest
lists. Everything is deterministic (fixed seed, fixed iteration count).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

IVF_SEED = 4242
KMEANS_ITERS = 10


def _sq_dists(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise squared distances via the matmul identity — one (n, k)
    intermediate instead of an O(n*k*dim) broadcast tensor."""
    return ((a ** 2).sum(axis=1)[:, None]
            + (b ** 2).sum(axis=1)[None, :]
            - 2.0 * (a @ b.T))


def _kmeans(sample: np.ndarray, k: int, iters: int = KMEANS_ITERS,
            seed: int = IVF_SEED) -> np.ndarray:
    """Seeded Lloyd iterations; empty clusters re-seeded deterministically."""
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=k, replace=False)].copy()
    for _ in range(iters):
        assign = _sq_dists(sample, centroids).argmin(axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
            else:
                centroids[c] = sample[rng.integers(0, len(sample))]
    return centroids


def _to_mat(col) -> np.ndarray:
    from .similarity import vec_matrix

    return vec_matrix(col)  # flat-buffer reshape, no per-row Python lists


def ivf_build(emb_path: str, out_dir: str, n_centroids: int = 16,
              id_col: str = "vec_id", embedding_col: str = "embedding",
              sample_limit: int = 20_000) -> str:
    """Build the IVF index: centroids.json + vectors hive-partitioned by
    nearest-centroid list id."""
    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    import pyarrow.parquet as pq

    # bounded streaming sample: every Nth batch up to sample_limit rows —
    # never materializes the full column on the driver, and strided batches
    # avoid head-of-file bias in sorted inputs
    pf = pq.ParquetFile(emb_path)
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
    sample = np.concatenate(chunks) if chunks else np.empty((0, 1))
    k = min(n_centroids, len(sample))
    centroids = _kmeans(sample, k)
    with open(os.path.join(out_dir, "centroids.json"), "w") as f:
        json.dump(centroids.tolist(), f)
    cref = ray.put(centroids)

    def assign(t: pa.Table) -> pa.Table:
        cents = ray.get(cref)
        vecs = _to_mat(t[embedding_col])
        return t.append_column("ivf_list", pa.array(
            _sq_dists(vecs, cents).argmin(axis=1).astype(np.int32)))

    (rd.read_parquet(emb_path, columns=[id_col, embedding_col])
     .map_batches(assign, batch_format="pyarrow")
     .write_parquet(os.path.join(out_dir, "lists"),
                    partition_cols=["ivf_list"]))
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        f.write("")
    return out_dir


def ivf_topk(out_dir: str, query_vecs: np.ndarray, query_ids: list[int],
             k: int = 10, n_probe: int = 4,
             id_col: str = "vec_id",
             embedding_col: str = "embedding") -> pa.Table:
    """Probe the ``n_probe`` nearest lists per query; brute-force cosine
    within. Returns (query_vec_id, rank, vec_id, cos_sim) plus the set of
    lists actually read in ``ivf_topk.last_lists_read`` for observability."""
    import pyarrow.dataset as pads

    with open(os.path.join(out_dir, "centroids.json")) as f:
        centroids = np.array(json.load(f))
    probes = np.argsort(_sq_dists(query_vecs, centroids), axis=1)[:, :n_probe]
    wanted = sorted({int(x) for row in probes for x in row})
    ivf_topk.last_lists_read = wanted
    ds = pads.dataset(os.path.join(out_dir, "lists"), partitioning="hive")
    import functools
    import operator

    flt = functools.reduce(operator.or_,
                           [pads.field("ivf_list") == w for w in wanted])
    t = ds.to_table(columns=[id_col, embedding_col, "ivf_list"], filter=flt)
    vecs = _to_mat(t[embedding_col])
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    vn = vecs / norms
    vids = t[id_col].to_numpy()
    lists = t["ivf_list"].to_numpy().astype(np.int64)
    qnorms = np.linalg.norm(query_vecs, axis=1, keepdims=True)
    qnorms[qnorms == 0] = 1.0  # zero query vector -> cos 0, not NaN
    qn = query_vecs / qnorms
    out_q, out_r, out_v, out_s = [], [], [], []
    for qi, qid in enumerate(query_ids):
        mask = np.isin(lists, probes[qi])
        if not mask.any():
            continue
        sims = vn[mask] @ qn[qi]
        cand_ids = vids[mask]
        sims_r = np.round(sims, 6)
        order = np.lexsort((cand_ids, -sims_r))[:k]
        for r, j in enumerate(order, start=1):
            out_q.append(qid); out_r.append(r)
            out_v.append(int(cand_ids[j])); out_s.append(float(sims_r[j]))
    return pa.table({
        "query_vec_id": pa.array(out_q, pa.int64()),
        "rank": pa.array(out_r, pa.int64()),
        "vec_id": pa.array(out_v, pa.int64()),
        "cos_sim": pa.array(out_s, pa.float64()),
    })
