"""Stateless single-tile slice — ``geoJSONToTile`` (geojsonvt.hpp:70-92).

The minimum end-to-end pipeline: documents -> extract/convert at the
z-scaled tolerance -> optional antimeridian wrap -> optional x/y clip to the
buffered tile window -> quantize. One linear DataFrame plan, no pyramid, no
driver state; used by the flagship ``entry()`` smoke query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geojson_vt_cpp_spark.config import TileOptions
from geojson_vt_cpp_spark.operators import codec
from geojson_vt_cpp_spark.operators.clip_stage import clip_fixed_window
from geojson_vt_cpp_spark.operators.convert import extract_features
from geojson_vt_cpp_spark.operators.pyramid import quantize
from geojson_vt_cpp_spark.operators.wrap import wrap_features


def geojson_to_tile_df(
    docs_df: DataFrame,
    z: int,
    x: int,
    y: int,
    options: TileOptions | None = None,
    wrap: bool = False,
    clip: bool = False,
    on_error: str = "raise",
) -> DataFrame:
    """documents -> quantized features of tile (z, x, y), as a DataFrame.

    Mirrors geoJSONToTile: convert tolerance ``(tolerance/extent)/2^z``,
    clip window ``[(x-p)/z2, (x+1+p)/z2] x [(y-p)/z2, (y+1+p)/z2]`` with
    p = buffer/extent; clip is forced on when lineMetrics. The reference
    passes (minAll,maxAll)=(-1,2) so clips always run per-feature.
    """
    o = options or TileOptions()
    z2 = 1 << z
    tolerance = (o.tolerance / o.extent) / z2
    feats = extract_features(docs_df, tolerance, on_error=on_error)
    if wrap:
        feats = wrap_features(feats, o.buffer / o.extent, o.line_metrics)
    if clip or o.line_metrics:
        p = o.buffer / o.extent
        feats = clip_fixed_window(feats, 0, (x - p) / z2, (x + 1 + p) / z2, o.line_metrics)
        feats = clip_fixed_window(feats, 1, (y - p) / z2, (y + 1 + p) / z2, o.line_metrics)
    assigned = feats.select(
        F.lit(z).alias("z"),
        F.lit(x).cast("long").alias("tx"),
        F.lit(y).cast("long").alias("ty"),
        "*",
    )

    # the one-shot path quantizes at the z-scaled tolerance for EVERY z
    # (geojsonvt.hpp:80,91 — not the maxZoom-zero rule), so fake max_zoom
    from geojson_vt_cpp_spark.config import Options

    qopts = Options(
        tolerance=o.tolerance, extent=o.extent, buffer=o.buffer,
        line_metrics=o.line_metrics, max_zoom=z + 1,
    )
    return quantize(assigned, qopts)
