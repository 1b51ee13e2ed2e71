"""Near-duplicate *clustering*: pairs -> connected components -> keeper.

A production training-data dedup runs three stages: candidate pairs (the
MinHash-LSH / embedding-LSH queries in ``functions/dialect_sql.py``),
grouping the pair graph into components, and picking one canonical keeper
per component. This module adds the last two as DataFrame operators.

``connected_components`` is iterative min-label propagation: every node
starts labeled with itself; each round every node takes the min label over
itself and its neighbors; fixpoint is reached after O(graph diameter)
rounds. All heavy work is joins + partial-aggregable ``min`` groupBys —
shuffle-on-key only, no driver-side graph state. Convergence is detected
with one cheap aggregate per round: labels are monotonically non-increasing,
so ``sum(label)`` is strictly decreasing until the fixpoint (no second join
needed). Per-round ``localCheckpoint`` truncates the iterative plan exactly
like the pyramid BFS (operators/pyramid.py:212); at cluster scale swap for
the reliable TableIO parquet checkpoint.

Scale notes: near-dup graphs at 100 TB are short-diameter (near-cliques of
copies), so rounds stay in the low single digits; pathological long chains
are bounded by ``max_iters``. The alternating large-star/small-star
optimization (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14 — public literature) halves round count but adds a shuffle
per round; plain min-propagation wins at low diameters, which is the dedup
regime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "id",
    max_iters: int = 20,
) -> DataFrame:
    """(id, component) for every node; component = min node id reachable.

    ``edges`` may be directed pairs (a < b is fine) — they are symmetrized
    here. Nodes absent from ``edges`` keep themselves as their component
    (singleton clusters).
    """
    spark = edges.sparkSession
    n_parts = max(spark.sparkContext.defaultParallelism * 2, 8)
    sym = (
        edges.select(F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst"))
        .unionByName(
            edges.select(F.col(dst).cast("long").alias("src"), F.col(src).cast("long").alias("dst"))
        )
        .repartition(n_parts, "dst")
        .localCheckpoint()
    )
    labels = nodes.select(
        F.col(node_col).cast("long").alias("id"),
        F.col(node_col).cast("long").alias("comp"),
    )
    prev_sum = None
    for _ in range(max_iters):
        msgs = sym.join(labels, sym["dst"] == labels["id"]).select(
            F.col("src").alias("id"), "comp"
        )
        labels = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .repartition(n_parts, "id")
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("comp")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def dedup_clusters(
    pairs: DataFrame,
    docs: DataFrame,
    pair_cols: tuple[str, str] = ("doc_a", "doc_b"),
    doc_col: str = "doc_id",
    max_iters: int = 20,
) -> DataFrame:
    """Near-dup pair graph -> (doc_id, cluster_id, cluster_size, is_keeper).

    cluster_id is the min doc_id in the component; the keeper is that
    canonical doc (is_keeper=1). Every document appears — docs with no
    near-dup pair form singleton clusters of size 1.
    """
    comp = connected_components(
        pairs, docs, src=pair_cols[0], dst=pair_cols[1], node_col=doc_col,
        max_iters=max_iters,
    ).select(F.col("id").alias("doc_id"), F.col("comp").alias("cluster_id"))
    sizes = comp.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return comp.join(sizes, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        (F.col("doc_id") == F.col("cluster_id")).cast("int").alias("is_keeper"),
    )
