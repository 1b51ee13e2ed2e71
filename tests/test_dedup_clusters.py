"""Connected-components / keeper-selection dedup clustering
(operators/dedup.py) against a hand-checkable graph and a pure-Python
union-find reference on a random graph."""

from __future__ import annotations

import random

import pytest

from geojson_vt_cpp_spark.operators.dedup import connected_components, dedup_clusters

pytestmark = pytest.mark.spark


def _uf_components(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min reachable id per node
    comp: dict[int, list[int]] = {}
    for x in range(n_nodes):
        comp.setdefault(find(x), []).append(x)
    return {x: min(members) for members in comp.values() for x in members}


def test_clusters_fixed_graph(spark):
    # components: {0,1,2} (chain), {3,4} (pair), {5} (singleton)
    edges = [(0, 1), (1, 2), (3, 4)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    got = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["is_keeper"])
        for r in dedup_clusters(pairs, docs).collect()
    }
    assert got == {
        0: (0, 3, 1), 1: (0, 3, 0), 2: (0, 3, 0),
        3: (3, 2, 1), 4: (3, 2, 0),
        5: (5, 1, 1),
    }


def test_long_chain_converges(spark):
    # diameter 12 chain: needs several propagation rounds, still exact
    n = 13
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    comp = connected_components(pairs, docs, src="doc_a", dst="doc_b", node_col="doc_id")
    assert {(r["id"], r["comp"]) for r in comp.collect()} == {(i, 0) for i in range(n)}


def test_tableio_rounds_match_and_resume(spark, tmp_path):
    """table_io= swaps per-round localCheckpoint for manifest-gated parquet
    stages: identical labels, and a second run resumes every round from its
    manifest (snapshot ids unchanged)."""
    from geojson_vt_cpp_spark.sources.table_io import TableIO

    edges = [(0, 1), (1, 2), (2, 3), (5, 6)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    want = {(r["id"], r["comp"]) for r in connected_components(
        pairs, docs, src="doc_a", dst="doc_b", node_col="doc_id").collect()}

    wd = str(tmp_path / "cc")
    io = TableIO(spark, wd)
    stats: dict = {}
    got = {(r["id"], r["comp"]) for r in connected_components(
        pairs, docs, src="doc_a", dst="doc_b", node_col="doc_id",
        table_io=io, stats_out=stats).collect()}
    assert got == want and stats["rounds"] >= 4  # chain diameter 3 + confirm

    snaps = {
        n: io.read_manifest(n)["snapshot_id"]
        for n in ["cc_edges"] + [f"cc_round_{i:02d}" for i in range(stats["rounds"])]
    }
    got2 = {(r["id"], r["comp"]) for r in connected_components(
        pairs, docs, src="doc_a", dst="doc_b", node_col="doc_id",
        table_io=TableIO(spark, wd)).collect()}
    assert got2 == want
    assert {n: io.read_manifest(n)["snapshot_id"] for n in snaps} == snaps


def test_non_convergence_raises(spark):
    # a chain whose diameter exceeds max_iters must fail loudly, not return
    # partially-propagated (wrong) labels
    n = 13
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            pairs, docs, src="doc_a", dst="doc_b", node_col="doc_id", max_iters=3
        )


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    n = 80
    edges = sorted({tuple(sorted(rng.sample(range(n), 2))) for _ in range(60)})
    want = _uf_components(n, edges)
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    comp = connected_components(pairs, docs, src="doc_a", dst="doc_b", node_col="doc_id")
    got = {r["id"]: r["comp"] for r in comp.collect()}
    assert got == want
