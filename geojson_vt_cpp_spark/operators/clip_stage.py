"""Arrow-batched clip stages shared by wrap, the pyramid split, and one-shot
tile slicing.

Each stage is a ``mapInPandas`` kernel: whole Arrow batches cross the
Python boundary once, then the per-feature clip runs in numpy
(:func:`geojson_vt_cpp_spark.functions.kernels.clip_feature`). This is the
Spark re-expression of ``detail::clip<I>`` (``clip.hpp:264-317``): the
reference's per-call trivial accept/reject on (minAll, maxAll) is exactly
equivalent to the per-feature bbox test when applied row-wise (group-min >=
k1 implies every feature-min >= k1, and so on), so no per-tile grouping or
shuffle is needed — clips are fully narrow transforms.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from geojson_vt_cpp_spark.functions import kernels as K
from geojson_vt_cpp_spark.operators import codec


def iter_rows(pdf: pd.DataFrame) -> Iterator[dict]:
    cols = list(pdf.columns)
    for vals in zip(*(pdf[c].values for c in cols)):
        yield dict(zip(cols, vals))


def _emit_clipped(row: dict, geoms, line_metrics: bool) -> list[dict]:
    """Expand a clip_feature result into output rows.

    "accept" re-emits the row unchanged (the reference copies the feature,
    ``clip.hpp:290-291``); a >1 fan-out (lineMetrics) extends ``slice_path``
    with a zero-padded component per slice so emission order is preserved
    through subsequent sorts (``clip.hpp:303-311``).
    """
    if geoms == "accept":
        return [row]
    out = []
    fan = len(geoms) > 1
    for j, g in enumerate(geoms):
        r = dict(row)
        r.update(codec.geom_to_cols(g))
        if fan:
            r["slice_path"] = row["slice_path"] + f"|{j:04d}"
        out.append(r)
    return out


def clip_fixed_window(features_df, axis: int, k1: float, k2: float,
                      line_metrics: bool):
    """Clip every feature to one fixed slab [k1, k2) — used by wrap and the
    one-shot tile path, where the window does not depend on the row."""
    schema = features_df.schema

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for row in iter_rows(pdf):
                g = codec.row_to_geom(row)
                minv = row["minx"] if axis == 0 else row["miny"]
                maxv = row["maxx"] if axis == 0 else row["maxy"]
                res = K.clip_feature(g, minv, maxv, axis, k1, k2, line_metrics)
                rows.extend(_emit_clipped(row, res, line_metrics))
            yield codec.rows_to_pdf(rows, schema)

    return features_df.mapInPandas(kernel, schema)


def split_children(assigned_df, buffer: int, extent: int, line_metrics: bool):
    """The 4-way pyramid split as one narrow mapInPandas pass.

    Input rows are features assigned to level-z tiles (columns z/tx/ty);
    output rows are the same features clipped into the four buffered child
    quadrants at level z+1 — the clip cascade of ``splitTile``
    (``geojsonvt.hpp:237-254``: x-clip into left/right halves, then y-clip
    each half), with buffer margin p = 0.5*buffer/extent scaled by 1/2^z.
    No shuffle: each feature expands into <= 4 child rows in place.
    """
    schema = assigned_df.schema
    p = 0.5 * buffer / extent

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for row in iter_rows(pdf):
                z = int(row["z"])
                x = int(row["tx"])
                y = int(row["ty"])
                z2 = float(1 << z)
                g = codec.row_to_geom(row)
                for dx, xk1, xk2 in (
                    (0, (x - p) / z2, (x + 0.5 + p) / z2),
                    (1, (x + 0.5 - p) / z2, (x + 1 + p) / z2),
                ):
                    res_x = K.clip_feature(
                        g, row["minx"], row["maxx"], 0, xk1, xk2, line_metrics
                    )
                    xrows = _emit_clipped(row, res_x, line_metrics)
                    for xr in xrows:
                        gx = g if res_x == "accept" else codec.row_to_geom(xr)
                        for dy, yk1, yk2 in (
                            (0, (y - p) / z2, (y + 0.5 + p) / z2),
                            (1, (y + 0.5 - p) / z2, (y + 1 + p) / z2),
                        ):
                            res_y = K.clip_feature(
                                gx, xr["miny"], xr["maxy"], 1, yk1, yk2,
                                line_metrics,
                            )
                            for yr in _emit_clipped(xr, res_y, line_metrics):
                                out = dict(yr)
                                out["z"] = z + 1
                                out["tx"] = 2 * x + dx
                                out["ty"] = 2 * y + dy
                                rows.append(out)
            yield codec.rows_to_pdf(rows, schema)

    return assigned_df.mapInPandas(kernel, schema)
