"""Serving-latency protocol at multi-million-doc scale (BASELINE.md).

Reproduces the round-4 serving measurement end-to-end and adds the
round-5 pruned-path comparison:

  build 3.875M synthetic webtext docs (500 x 8k-doc segments, cached
  under /tmp) -> one-time compact_to(64) (now automatic at LocalSearcher
  bind) -> ensure_termdict -> build_pruned_postings -> fresh searcher ->
  24-query mix (fixture queries + head-term ORs + needle+haystack + a
  miss): cold pass then 2 warm passes per strategy, plus pruned-vs-exact
  top-10 fidelity (overlap + score error + the per-query error bound).

Usage: python tools/serve_bench.py            # prints one JSON line
Env: EDLR_SERVE_DOCS (3875000), EDLR_SERVE_SEGDOCS (8000),
     EDLR_PRUNE_MIN_DF (100000), EDLR_PRUNE_FRAC (0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("EDLR_SERVE_DOCS", "3875000"))
SEG_DOCS = int(os.environ.get("EDLR_SERVE_SEGDOCS", "8000"))
MIN_DF = int(os.environ.get("EDLR_PRUNE_MIN_DF", "100000"))
FRAC = float(os.environ.get("EDLR_PRUNE_FRAC", "0.1"))
ROOT = f"/tmp/edlr_serve/{N_DOCS}_{SEG_DOCS}"

EXTRA_QUERIES = [
    "the of a",                  # 3 head terms
    "the of a and to in",        # 6 head terms
    "the of a with for",         # 5 head terms
    "index query page web site", # 5 mid-df terms
    "data web page",
    "page",
    "the w1500",                 # needle + haystack
    "w2000 w0042",               # two needles
]


def query_mix() -> list[str]:
    from elasticsearch_data_loader_ray import fixtures

    qs = fixtures.generate_queries()["query"].to_pylist()
    return qs + EXTRA_QUERIES  # 16 + 8 = 24


def main_impl(ray) -> None:
    from elasticsearch_data_loader_ray import fixtures
    from elasticsearch_data_loader_ray.index.build import (
        BuildConfig,
        build_index,
        ensure_termdict,
    )
    from elasticsearch_data_loader_ray.index.pruned import (
        build_pruned_postings,
    )
    from elasticsearch_data_loader_ray.index.search import LocalSearcher

    src = os.path.join(ROOT, "src")
    idx = os.path.join(ROOT, "index")
    timings: dict[str, float] = {}
    if not os.path.exists(os.path.join(src, "_COMPLETE")):
        import shutil

        shutil.rmtree(src, ignore_errors=True)
        fixtures.write_webtext(src, N_DOCS)
        open(os.path.join(src, "_COMPLETE"), "w").close()
    if not os.path.exists(os.path.join(idx, "_SERVE_OK")):
        import shutil

        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.perf_counter()
        build_index(src, idx, BuildConfig(docs_per_segment=SEG_DOCS))
        timings["build_secs"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        # bind-time auto-compaction (LocalSearcher compact="auto") is the
        # default path now; bind once to trigger it, timed separately
        LocalSearcher(idx)
        timings["auto_compact_secs"] = round(time.perf_counter() - t0, 1)
        open(os.path.join(idx, "_SERVE_OK"), "w").close()
    t0 = time.perf_counter()
    ensure_termdict(idx)
    timings["termdict_secs"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    n_lists = build_pruned_postings(idx, min_df=MIN_DF, keep_frac=FRAC)
    timings["pruned_build_secs"] = round(time.perf_counter() - t0, 1)

    qs = query_mix()
    out: dict = {"n_docs": N_DOCS, "seg_docs": SEG_DOCS, "queries": len(qs),
                 "pruned_lists": n_lists, "min_df": MIN_DF,
                 "keep_frac": FRAC, **timings}
    for strategy in ("auto", "pruned"):
        s = LocalSearcher(idx)  # fresh bind per strategy: cold caches
        lat_cold, lat_warm = [], []
        per_q = {}
        for rnd in range(3):
            s._request_cache.clear()
            for q in qs:
                t0 = time.perf_counter()
                s.search(q, k=10, or_strategy=strategy)
                dt = time.perf_counter() - t0
                (lat_cold if rnd == 0 else lat_warm).append(dt)
                if rnd == 0:
                    per_q[q] = round(dt * 1000, 1)
        lat_cold.sort()
        lat_warm.sort()
        out[strategy] = {
            "cold_p50_ms": round(1000 * lat_cold[len(lat_cold) // 2], 1),
            "cold_p95_ms": round(
                1000 * lat_cold[int(0.95 * len(lat_cold)) - 1], 1),
            "warm_p50_ms": round(1000 * lat_warm[len(lat_warm) // 2], 1),
            "warm_p95_ms": round(
                1000 * lat_warm[int(0.95 * len(lat_warm)) - 1], 1),
            "cold_worst_ms": round(1000 * lat_cold[-1], 1),
            "cold_per_query_ms": per_q,
        }
    # fidelity: pruned vs exact top-10
    s = LocalSearcher(idx)
    fid = {}
    for q in qs:
        ids_e, sc_e = s.search(q, k=10, or_strategy="exact")
        ids_p, sc_p = s.search(q, k=10, or_strategy="pruned")
        if len(ids_e) == 0:  # term absent from corpus: nothing to rank
            continue
        inter = set(ids_e.tolist()) & set(ids_p.tolist())
        fid[q] = {"overlap": len(inter), "of": len(ids_e),
                  "bound": round(float(s.last_pruned_bound), 3)}
    out["fidelity"] = fid
    out["overlap_mean"] = round(
        sum(v["overlap"] / v["of"] for v in fid.values()) / len(fid), 3)
    print(json.dumps(out))
    import ray as _ray

    _ray.shutdown()


if __name__ == "__main__":
    import ray

    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    main_impl(ray)
