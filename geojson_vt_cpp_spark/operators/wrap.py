"""Antimeridian wrap stage (``include/mapbox/geojsonvt/wrap.hpp``).

One tiny aggregate decides whether world copies are needed at all (the
common case — no features near the dateline — costs a single agg and zero
rewrites, mirroring the reference's early return at ``wrap.hpp:25-26``);
otherwise three fixed-window clip passes produce left/center/right copies,
the side copies shifted by +-1 world width with JVM-native array transforms
(no Python for the shift). Output order is carried by ``copy_tag``
(left=0, center=1, right=2; ``wrap.hpp:31-40``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geojson_vt_cpp_spark.operators.clip_stage import clip_fixed_window


def _shift(df: DataFrame, offset: float, copy_tag: int) -> DataFrame:
    """shiftCoords (wrap.hpp:10-17) — pure column expressions."""
    off = F.lit(float(offset))
    return (
        df.withColumn("xs", F.transform("xs", lambda v: v + off))
        .withColumn("minx", F.col("minx") + off)
        .withColumn("maxx", F.col("maxx") + off)
        .withColumn("copy_tag", F.lit(copy_tag))
    )


def wrap_features(feats: DataFrame, buffer: float, line_metrics: bool,
                  max_kernel_parts: int | None = None) -> DataFrame:
    """``detail::wrap`` — returns the input unchanged when no feature can
    reach the left/right world-copy windows.

    Emptiness of the side copies is decided by the same per-feature
    accept/reject predicates the clip applies (clip.hpp:287-293), folded
    into one aggregate; zero-point features (EMPTY geometry or a retained
    empty clip result) carry the inverted bbox sentinel (minx > maxx) and
    are trivially accepted by every window, so their presence alone
    activates wrap (faithful to the reference).
    """
    agg = feats.agg(
        F.sum(
            ((F.col("maxx") >= -1 - buffer) & (F.col("minx") < buffer)).cast("int")
        ).alias("n_left"),
        F.sum(
            ((F.col("maxx") >= 1 - buffer) & (F.col("minx") < 2 + buffer)).cast("int")
        ).alias("n_right"),
        F.sum((F.col("minx") > F.col("maxx")).cast("int")).alias("n_empty"),
        # rows the CENTER window cannot trivially accept (its Python-kernel
        # upper bound; same scan, free) — sizes the clip stages below
        F.sum(
            (~((F.col("minx") >= -buffer) & (F.col("maxx") < 1 + buffer))).cast("int")
        ).alias("n_center_mid"),
    ).first()
    n_left = (agg["n_left"] or 0) + (agg["n_empty"] or 0)
    n_right = (agg["n_right"] or 0) + (agg["n_empty"] or 0)
    if n_left == 0 and n_right == 0:
        return feats

    def kp(n_rows: int) -> int | None:
        # size each window's Python stage to its measured row count: the
        # per-task runner handshake dominates when few rows cross
        if max_kernel_parts is None:
            return None
        return max(1, min(max_kernel_parts, n_rows // 256 + 1))

    left = clip_fixed_window(feats, 0, -1 - buffer, buffer, line_metrics,
                             kp(n_left))
    center = clip_fixed_window(feats, 0, -buffer, 1 + buffer, line_metrics,
                               kp(int(agg["n_center_mid"] or 0)))
    right = clip_fixed_window(feats, 0, 1 - buffer, 2 + buffer, line_metrics,
                              kp(n_right))
    return (
        _shift(left, 1.0, 0)
        .unionByName(center)
        .unionByName(_shift(right, -1.0, 2))
    )
