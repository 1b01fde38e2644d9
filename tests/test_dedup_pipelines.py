"""Dedup-family pipeline internals: the vectorized shingle kernel vs the
scalar reference, the distributed MinHash exact-verify stage vs the exact
all-pairs path, and the SimHash golden (the one permanently rows-only
entry — a committed digest keeps refactors from silently changing it)."""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_data_loader_ray.functions import analyzers as an
from elasticsearch_data_loader_ray.pipelines import catalog as cat

SF0001 = "/root/testdata/sf0.001"


def _write_docs(tmp_path, texts) -> str:
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.large_string()),
    })
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def test_shingle_rows_match_scalar(tmp_path):
    """The Arrow-vectorized shingle builder must reproduce the scalar
    _shingles set (incl. short docs, empties, nulls, unicode)."""
    texts = ["the quick brown fox jumps", "one two", "single", "", None,
             "a b c a b c a b c", "Hello, WORLD! foo bar baz",
             "½ token mix 漢字 test here", "dup dup dup dup"]
    d = _write_docs(tmp_path, texts)
    got = cat._doc_shingles_ds(d).to_pandas()
    want = {}
    for i, x in enumerate(texts):
        sh = cat._shingles(an.analyze("standard", x or ""))
        if sh:
            want[i] = sh
    assert {int(i): set(g["shingle"]) for i, g in got.groupby("doc_id")} == want
    for i, g in got.groupby("doc_id"):
        assert (g["n"] == len(want[int(i)])).all()


def test_minhash_distributed_verify_matches_exact(tmp_path):
    """The block-task verify stage (no driver shingle dict) must produce
    the identical verified-pair contract as the exact all-pairs join."""
    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo")
    texts = []
    for i in range(40):
        texts.append(f"{base} doc{i} unique{i} filler{i} tail{i}")
    # 6 near-dup groups: same long text with one token changed
    for g in range(6):
        texts.append(f"{base} group{g} shared shared2 shared3")
        texts.append(f"{base} group{g} shared shared2 shared3x")
    d = _write_docs(tmp_path, texts)
    lsh = cat.q_minhash_lsh_pairs(d)
    lsh = lsh.to_pandas() if hasattr(lsh, "to_pandas") else lsh
    exact = cat.q_ngram_jaccard_pairs(d)
    exact = (exact.to_pandas() if hasattr(exact, "to_pandas") else exact)
    exact = exact.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    assert len(lsh) >= 6
    assert lsh[["doc_a", "doc_b"]].values.tolist() == \
        exact[["doc_a", "doc_b"]].values.tolist()
    assert np.allclose(lsh["jaccard"], exact["jaccard"])


def test_minhash_verify_many_blocks(tmp_path):
    """Force multiple doc blocks + cross-block pairs through the verify
    stage (block boundaries must not drop or duplicate pairs)."""
    old = cat._VERIFY_DOCS_PER_BLOCK
    cat._VERIFY_DOCS_PER_BLOCK = 4  # ~10 docs -> 3 blocks
    try:
        bases = [" ".join(f"p{i // 2}w{j}" for j in range(30))
                 for i in range(10)]
        texts = [f"{bases[i]} tail" if i % 2 == 0
                 else f"{bases[i]} tailx" for i in range(10)]
        d = _write_docs(tmp_path, texts)
        got = cat.q_minhash_lsh_pairs(d)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        # pairs (0,1), (2,3), ... all >= 0.8 Jaccard, spanning blocks
        assert got[["doc_a", "doc_b"]].values.tolist() == \
            [[2 * i, 2 * i + 1] for i in range(5)]
    finally:
        cat._VERIFY_DOCS_PER_BLOCK = old


@pytest.mark.skipif(not os.path.exists(SF0001), reason="testdata absent")
def test_simhash_golden_sf0001():
    """Committed digest of the exact 64-bit SimHash values on the driver
    fixture corpus (VERDICT r3 #7): q_simhash has no SQL oracle, so this
    golden is its refactor guard."""
    df = cat.q_simhash(SF0001).to_pandas().sort_values("doc_id")
    assert len(df) == 500
    payload = ";".join(f"{int(a)}:{int(b)}"
                       for a, b in zip(df["doc_id"], df["simhash"]))
    assert hashlib.md5(payload.encode()).hexdigest() == \
        "18f2f5675dd7eb113146535bec35a329"
