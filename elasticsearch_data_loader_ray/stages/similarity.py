"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k (numpy matmul per batch against a
broadcast query matrix) — ``pipelines/catalog.q_embedding_topk``.

Scale path (this module): random-hyperplane LSH bucketing. Vectors are
assigned a ``n_planes``-bit signature bucket in one ``map_batches`` pass;
a query probes its own bucket plus the ``n_probes`` nearest (Hamming-1)
buckets and brute-forces only those candidates. At 10^12 scale the bucketed
table is written hive-partitioned by bucket so a probe reads only its
buckets' files; here the candidate filter is an in-pipeline mask.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

N_PLANES = 12
LSH_SEED = 777


def _planes(dim: int, n_planes: int = N_PLANES) -> np.ndarray:
    rng = np.random.default_rng(LSH_SEED)
    p = rng.standard_normal((dim, n_planes))
    return p / np.linalg.norm(p, axis=0, keepdims=True)


def signature(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Bucket id per row: sign bits of vecs @ planes packed to uint32."""
    bits = (vecs @ planes) > 0
    weights = (1 << np.arange(planes.shape[1], dtype=np.uint32))
    return (bits.astype(np.uint32) @ weights).astype(np.int64)


def probe_buckets(q_sig: int, n_probes: int, n_planes: int = N_PLANES) -> list[int]:
    """The query's bucket plus its Hamming-1 neighbors (multi-probe LSH)."""
    out = [int(q_sig)]
    for b in range(min(n_probes, n_planes)):
        out.append(int(q_sig) ^ (1 << b))
    return out


def add_bucket_column(ds: rd.Dataset, dim: int,
                      embedding_col: str = "embedding") -> rd.Dataset:
    planes_ref = ray.put(_planes(dim))

    def xf(t: pa.Table) -> pa.Table:
        planes = ray.get(planes_ref)
        vecs = np.stack([np.asarray(v, dtype=np.float64)
                         for v in t[embedding_col].to_pylist()])
        return t.append_column("lsh_bucket", pa.array(signature(vecs, planes)))

    return ds.map_batches(xf, batch_format="pyarrow")


def ann_topk(emb_path: str, query_vec_ids: list[int], k: int = 10,
             n_probes: int = 6, id_col: str = "vec_id",
             embedding_col: str = "embedding") -> pa.Table:
    """Multi-probe LSH ANN: returns (query_vec_id, rank, vec_id, cos_sim).

    Exactness caveat (by design — this is the approximate scale path):
    recall depends on n_probes/n_planes; the pytest gate asserts recall@k
    against the brute-force baseline.
    """
    import pyarrow.parquet as pq

    qt = pq.read_table(emb_path, filters=[(id_col, "in", query_vec_ids)])
    dim = len(qt[embedding_col][0].as_py())
    planes = _planes(dim)
    q_ids = qt[id_col].to_pylist()
    q_mat = np.stack([np.asarray(v, dtype=np.float64)
                      for v in qt[embedding_col].to_pylist()])
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_sigs = signature(q_mat, planes)
    wanted: dict[int, list[int]] = {}
    for qi, sig in zip(q_ids, q_sigs):
        for b in probe_buckets(int(sig), n_probes):
            wanted.setdefault(b, []).append(qi)
    wanted_ref = ray.put(wanted)
    q_ref = ray.put((q_ids, q_norm))
    planes_ref = ray.put(planes)

    def score(t: pa.Table) -> pa.Table:
        want = ray.get(wanted_ref)
        ids_q, qm = ray.get(q_ref)
        pl = ray.get(planes_ref)
        vecs = np.stack([np.asarray(v, dtype=np.float64)
                         for v in t[embedding_col].to_pylist()])
        sigs = signature(vecs, pl)
        mask = np.isin(sigs, np.fromiter(want.keys(), dtype=np.int64))
        if not mask.any():
            return pa.table({"query_vec_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "cos_sim": pa.array([], pa.float64())})
        vecs, sigs = vecs[mask], sigs[mask]
        vids = t[id_col].to_numpy()[mask]
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        vn = vecs / norms
        out_q, out_v, out_s = [], [], []
        for c, qid in enumerate(ids_q):
            cand = np.isin(sigs, np.fromiter(
                (b for b, qs in want.items() if qid in qs), dtype=np.int64))
            if not cand.any():
                continue
            sims = vn[cand] @ qm[c]
            take = min(k + 5, len(sims))
            if len(sims) > take:
                kth = np.partition(sims, -take)[-take]
                part = np.flatnonzero(sims >= kth)  # keep boundary ties
            else:
                part = np.arange(len(sims))
            out_q.extend([qid] * len(part))
            out_v.extend(vids[cand][part].tolist())
            out_s.extend(sims[part].tolist())
        return pa.table({"query_vec_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "cos_sim": pa.array(out_s, pa.float64())})

    parts = (rd.read_parquet(emb_path, columns=[id_col, embedding_col])
             .map_batches(score, batch_format="pyarrow").to_pandas())
    parts["cos_sim"] = np.round(parts["cos_sim"].to_numpy(dtype=np.float64), 6)
    parts = parts.sort_values(["query_vec_id", "cos_sim", "vec_id"],
                              ascending=[True, False, True])
    parts["rank"] = parts.groupby("query_vec_id").cumcount() + 1
    parts = parts[parts["rank"] <= k]
    return pa.Table.from_pandas(
        parts[["query_vec_id", "rank", "vec_id", "cos_sim"]].reset_index(drop=True))
