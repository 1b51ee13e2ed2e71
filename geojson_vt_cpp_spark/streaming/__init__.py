"""Streaming surface.

The reference is fully batch — it has NO streaming operators (SURVEY.md
§2.7: "on the fly" means lazy drill-down, not streams). This package adds
the Spark-native streaming ingest a large-scale pipeline needs anyway:
Structured Streaming over the same Arrow kernels (stateless extract/convert
is legal in streaming queries), checkpointed via the standard streaming
checkpoint mechanism.
"""

from geojson_vt_cpp_spark.streaming.ingest import stream_extract_features

__all__ = ["stream_extract_features"]
