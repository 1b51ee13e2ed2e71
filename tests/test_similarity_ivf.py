"""IVF ANN: exact when probing all clusters; good recall at partial probe."""

from __future__ import annotations

import numpy as np
import pytest

from geojson_vt_cpp_spark.operators.similarity import ivf_index, ivf_search

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()


def _brute_topk(embs_rows, q, k):
    ids = [r["vec_id"] for r in embs_rows]
    mat = np.array([list(r["embedding"]) for r in embs_rows], dtype=np.float64)
    d2 = ((mat - np.asarray(q)) ** 2).sum(axis=1)
    order = sorted(range(len(ids)), key=lambda i: (d2[i], ids[i]))
    return [ids[i] for i in order[:k]]


def test_ivf_exact_with_full_probe(spark, embs):
    assignments, centroids = ivf_index(embs, n_centroids=8, iters=2)
    assignments = assignments.cache()
    rows = embs.collect()
    q = [float(v) for v in rows[0]["embedding"]]
    got = [r["vec_id"] for r in ivf_search(assignments, centroids, q, k=10, n_probe=8)
           .orderBy("ann_rank").collect()]
    assert got == _brute_topk(rows, q, 10)


def test_ivf_partial_probe_recall(spark, embs):
    assignments, centroids = ivf_index(embs, n_centroids=8, iters=2)
    assignments = assignments.cache()
    rows = embs.collect()
    recalls = []
    for qi in (0, 7, 42):
        q = [float(v) for v in rows[qi]["embedding"]]
        got = {r["vec_id"] for r in ivf_search(assignments, centroids, q, k=10, n_probe=3).collect()}
        want = set(_brute_topk(rows, q, 10))
        recalls.append(len(got & want) / 10)
    assert sum(recalls) / len(recalls) >= 0.5  # ANN at 3/8 clusters probed

    # every vector is assigned to exactly one cluster
    n = embs.count()
    assert assignments.count() == n
    assert assignments.select("vec_id").distinct().count() == n


def test_ivf_deterministic(spark, embs):
    a1, c1 = ivf_index(embs, n_centroids=4, iters=1)
    a2, c2 = ivf_index(embs, n_centroids=4, iters=1)
    m1 = {r["vec_id"]: r["cluster_id"] for r in a1.collect()}
    m2 = {r["vec_id"]: r["cluster_id"] for r in a2.collect()}
    assert m1 == m2


def test_ivf_index_partition_pruning(spark, embs, tmp_path):
    """The documented scale path (similarity.py module docstring): write the
    assignments partitioned by cluster_id; the probe filter must become
    partition pruning at the parquet scan (only n_probe/n_centroids of the
    data read), and search results over the pruned table must equal the
    in-memory search."""
    assignments, centroids = ivf_index(embs, n_centroids=8, iters=2)
    path = str(tmp_path / "ivf_index")
    assignments.write.partitionBy("cluster_id").parquet(path)
    stored = spark.read.parquet(path)

    q = [float(v) for v in embs.limit(1).collect()[0]["embedding"]]
    got_stored = ivf_search(stored, centroids, q, k=10, n_probe=2).collect()
    got_mem = ivf_search(assignments, centroids, q, k=10, n_probe=2).collect()
    assert [(r["vec_id"], r["ann_rank"]) for r in got_stored] == [
        (r["vec_id"], r["ann_rank"]) for r in got_mem
    ]

    # plan evidence: the cluster_id IN (...) probe reaches the scan as a
    # partition filter, and pruning leaves <= n_probe of 8 partitions
    probe = [
        r["cluster_id"]
        for r in centroids.limit(2).collect()
    ]
    from pyspark.sql import functions as F

    plan = (
        stored.where(F.col("cluster_id").isin(probe))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "cluster_id" in pf, pf


def test_ivf_batch_matches_single(spark, embs):
    """Batched multi-query search == the single-query operator per query,
    at the SAME partial probe (both approximate the same way: identical
    probe selection and tie-breaks)."""
    from pyspark.sql import functions as F

    from geojson_vt_cpp_spark.operators.similarity import ivf_search_batch

    assignments, centroids = ivf_index(embs, n_centroids=8, iters=2)
    assignments = assignments.cache()
    qids = [0, 7, 42]
    queries = embs.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    batch = ivf_search_batch(
        assignments, centroids, queries, k=10, n_probe=3
    ).collect()
    by_q: dict = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append((r["ann_rank"], r["vec_id"]))
    rows = {r["vec_id"]: r for r in embs.collect()}
    for qid in qids:
        q = [float(v) for v in rows[qid]["embedding"]]
        single = [
            (r["ann_rank"], r["vec_id"])
            for r in ivf_search(assignments, centroids, q, k=10, n_probe=3).collect()
        ]
        assert sorted(by_q[qid]) == sorted(single), qid


def test_ivf_batch_no_driver_collect_in_probe(spark, embs):
    """The batch probe stays a DataFrame: building the plan must not run a
    job (the single-query path collects centroid ids; the batch path may
    not — that is its reason to exist at scale)."""
    from pyspark.sql import functions as F

    from geojson_vt_cpp_spark.operators.similarity import ivf_search_batch

    assignments, centroids = ivf_index(embs, n_centroids=4, iters=1)
    queries = embs.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    before = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    plan = ivf_search_batch(assignments, centroids, queries, k=5, n_probe=2)
    after = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    assert len(after) == len(before), "plan construction submitted a job"
    assert plan.count() > 0
