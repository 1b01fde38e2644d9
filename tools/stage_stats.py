"""Print Ray Data per-stage execution stats for the index-build pipelines.

The build's phases normally consume their Datasets internally; this tool
re-runs each phase's pipeline shape against a (small) input and prints
``ds.stats()`` so per-operator wall/cpu/memory breakdowns are inspectable —
the feedback loop used to find the actor-pool starvation, shuffle-width and
thread-thrash issues documented in BASELINE.md / memory.

Usage: python tools/stage_stats.py [n_docs]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from elasticsearch_data_loader_ray import fixtures
    from elasticsearch_data_loader_ray.index import build as B
    from elasticsearch_data_loader_ray.stages.extract import extract_batch

    src = f"/tmp/stage_stats_src_{n_docs}"
    if not os.path.exists(os.path.join(src, "_OK")):
        shutil.rmtree(src, ignore_errors=True)
        os.makedirs(src)
        pq.write_table(fixtures.generate_webtext(n_docs), f"{src}/p.parquet")
        open(os.path.join(src, "_OK"), "w").close()

    print("=== phase A shape: read -> extract (tasks) ===")
    corpus = (rd.read_parquet(src, override_num_blocks=16)
              .map_batches(extract_batch, batch_format="pyarrow",
                           batch_size=1024)
              .materialize())
    print(corpus.stats())

    print("\n=== phase C shape: bucket -> groupby(bucket) -> segment build ===")
    idx = "/tmp/stage_stats_idx"
    shutil.rmtree(idx, ignore_errors=True)
    os.makedirs(idx)
    corpus.write_parquet(os.path.join(idx, "corpus"))
    open(os.path.join(idx, "corpus", "_SUCCESS"), "w").close()
    cfg = B.BuildConfig(docs_per_segment=max(2000, n_docs // 8))
    plan = B._make_plan(idx, cfg)
    boundaries = plan["boundaries"]
    plan_ref = ray.put(plan)

    def add_bucket(t: pa.Table) -> pa.Table:
        urls = np.asarray(t["url"].to_numpy(zero_copy_only=False), dtype=object)
        return t.append_column("bucket", pa.array(B._bucket_of(urls, boundaries)))

    def seg_fn(group: pa.Table) -> pa.Table:
        return B._build_segment(group, idx, ray.get(plan_ref), cfg)

    summaries = (
        rd.read_parquet(os.path.join(idx, "corpus"),
                        override_num_blocks=max(plan["n_segments"], 8))
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(seg_fn, batch_format="pyarrow")
        .materialize()
    )
    print(summaries.stats())
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
