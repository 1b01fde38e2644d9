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


def _kmeans(sample: np.ndarray, k: int, iters: int = KMEANS_ITERS,
            seed: int = IVF_SEED) -> np.ndarray:
    """Seeded Lloyd iterations; empty clusters re-seeded deterministically."""
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=k, replace=False)].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
            else:
                centroids[c] = sample[rng.integers(0, len(sample))]
    return centroids


def _to_mat(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col.to_pylist()])


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

    sample_tbl = pq.read_table(emb_path, columns=[embedding_col])
    sample = _to_mat(sample_tbl[embedding_col])[:sample_limit]
    k = min(n_centroids, len(sample))
    centroids = _kmeans(sample, k)
    with open(os.path.join(out_dir, "centroids.json"), "w") as f:
        json.dump(centroids.tolist(), f)
    cref = ray.put(centroids)

    def assign(t: pa.Table) -> pa.Table:
        cents = ray.get(cref)
        vecs = _to_mat(t[embedding_col])
        d = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return t.append_column("ivf_list", pa.array(
            d.argmin(axis=1).astype(np.int32)))

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
    d = ((query_vecs[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(d, axis=1)[:, :n_probe]
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
    qn = query_vecs / np.linalg.norm(query_vecs, axis=1, keepdims=True)
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
