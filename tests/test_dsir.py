"""DSIR hashed-ngram importance weights: bucket hash determinism and
the selection signal's direction on the fixture corpus."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from elasticsearch_data_loader_ray.pipelines.catalog import (
    DSIR_BUCKETS,
    DSIR_TARGET_LANG,
    _md5_bucket,
    q_dsir_weights,
)

SF0001 = "/root/testdata/sf0.001"


def test_md5_bucket_deterministic_and_bounded():
    grams = ["the", "fast join", "a", "spark", "the data", ""]
    b1 = _md5_bucket(grams)
    b2 = _md5_bucket(grams)
    assert (b1 == b2).all()
    assert ((0 <= b1) & (b1 < DSIR_BUCKETS)).all()
    # known value pins the hash definition the SQL oracle mirrors
    import hashlib

    assert b1[0] == int(hashlib.md5(b"the").hexdigest()[:6],
                        16) % DSIR_BUCKETS


def test_rrf_hybrid_fusion_semantics(ray_session):
    from elasticsearch_data_loader_ray.pipelines.catalog import (
        RRF_K,
        RRF_TOPK,
        q_rrf_hybrid,
    )

    got = q_rrf_hybrid(SF0001).to_pandas()
    assert len(got) == RRF_TOPK
    assert got["rank"].tolist() == list(range(1, RRF_TOPK + 1))
    s = got["rrf_score"].to_numpy()
    assert (np.diff(s) <= 0).all()  # fused score descends with rank
    # a score above 1/(K+1) is only reachable by appearing in BOTH
    # rankings; the top fused doc must exceed the single-ranking maximum
    assert s[0] > 1.0 / (RRF_K + 1)
    assert (s <= 2.0 / (RRF_K + 1) + 1e-9).all()
    # deterministic
    again = q_rrf_hybrid(SF0001).to_pandas()
    assert got.equals(again)


def test_dsir_weights_favor_target_language(ray_session):
    got = q_dsir_weights(SF0001).to_pandas()
    lang = pq.read_table(f"{SF0001}/documents.parquet",
                         columns=["doc_id", "lang"]).to_pandas()
    m = got.merge(lang, on="doc_id")
    # every doc with >=1 token is scored
    assert (m["n_feats"] > 0).all()
    tgt = m[m["lang"] == DSIR_TARGET_LANG]["log_weight"]
    rest = m[m["lang"] != DSIR_TARGET_LANG]["log_weight"]
    assert len(tgt) and len(rest)
    # importance resampling must up-weight the target class on average
    assert tgt.mean() > rest.mean()
    assert np.isfinite(m["log_weight"]).all()
