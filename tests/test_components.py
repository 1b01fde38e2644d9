"""Distributed connected components (alternating large/small-star) vs a
reference union-find on random graphs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from elasticsearch_data_loader_ray.stages.components import (
    connected_components)


def _reference(u, v):
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(u, v):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    nodes = sorted(set(u) | set(v))
    return {n: find(n) for n in nodes}


@pytest.mark.parametrize("seed,n_nodes,n_edges", [
    (1, 50, 40),       # forest-ish: many components
    (2, 200, 400),     # dense: few giant components
    (3, 1000, 300),    # sparse with long chains
])
def test_star_rounds_match_union_find(seed, n_nodes, n_edges):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, n_nodes, n_edges).tolist()
    v = rng.integers(0, n_nodes, n_edges).tolist()
    uv = [(a, b) for a, b in zip(u, v) if a != b]
    u, v = [a for a, _ in uv], [b for _, b in uv]
    edges = rd.from_arrow(pa.table({"u": pa.array(u, pa.int64()),
                                    "v": pa.array(v, pa.int64())}))
    got = connected_components(edges)
    want = _reference(u, v)
    have = dict(zip(got["node"].to_pylist(), got["component"].to_pylist()))
    assert have == want


def test_long_chain_converges_logarithmically():
    # a 256-node path: naive propagation needs 256 rounds; star rounds
    # must collapse it well inside max_rounds
    n = 256
    edges = rd.from_arrow(pa.table({
        "u": pa.array(list(range(n - 1)), pa.int64()),
        "v": pa.array(list(range(1, n)), pa.int64())}))
    got = connected_components(edges, max_rounds=16)
    assert set(got["component"].to_pylist()) == {0}
    assert got.num_rows == n


def test_empty_edges():
    edges = rd.from_arrow(pa.table({"u": pa.array([], pa.int64()),
                                    "v": pa.array([], pa.int64())}))
    got = connected_components(edges)
    assert got.num_rows == 0
