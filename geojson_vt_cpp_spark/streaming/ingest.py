"""Streaming documents ingest: readStream -> span extract -> convert.

The extract/convert stage is stateless (posexplode + filter + mapInPandas),
so it runs unchanged on a streaming DataFrame; late/duplicate documents are
handled by the sink's idempotency key (doc_id, span_idx, feature_idx,
member_seq). Tiling itself stays batch (the pyramid's per-zoom stop
conditions are global aggregates — the reference has no incremental
semantics to mirror); the intended pattern at scale is stream-ingest
features into a partitioned table, then run incremental pyramid builds over
new partitions via the checkpointed batch pipeline (sources/table_io.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from geojson_vt_cpp_spark.operators.convert import extract_features
from geojson_vt_cpp_spark.sources.documents import DOCUMENTS_SCHEMA


def stream_extract_features(
    spark: SparkSession,
    source_dir: str,
    tolerance: float,
    on_error: str = "skip",
) -> DataFrame:
    """File-source streaming ingest of documents (one JSON doc per line)
    into the features stream. Returns a streaming DataFrame; attach a
    writeStream sink (parquet/memory) + checkpointLocation to run."""
    docs = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .json(source_dir)
    )
    # skip-on-error in streams: a poison document must not wedge the query
    return extract_features(docs, tolerance, on_error=on_error)
