"""geojson_vt_cpp_spark — a PySpark-native spatial-join + vector-tiling engine.

A from-scratch reimplementation of the capabilities of mapbox/geojson-vt-cpp
(reference at /root/reference, ~1,240 LoC of header-only C++14) as an idiomatic
Spark engine: columnar ragged-array geometry, vectorized numpy kernels inside
Arrow-batched ``mapInPandas`` stages, a BFS-per-zoom tile pyramid instead of the
reference's recursive DFS (``include/mapbox/geojsonvt.hpp:178-258``), and
spatial-join operators (cell index, point-in-polygon, kNN, raster overlay) the
reference does not have but the target workload demands.

Public API mirrors the reference's three entry points
(``include/mapbox/geojsonvt.hpp:70-150``):

- :func:`geojson_vt_cpp_spark.operators.tile_one_shot.geojson_to_tile`
  — stateless single-tile slice (``geoJSONToTile``).
- :class:`geojson_vt_cpp_spark.operators.pyramid.TilePyramid`
  — index build + ``get_tile`` with lazy drill-down (``GeoJSONVT``).
- :mod:`geojson_vt_cpp_spark.operators.spatial_join` — PIP / kNN / overlay.
"""

from geojson_vt_cpp_spark.config import Options, TileOptions, to_id

__all__ = ["Options", "TileOptions", "to_id"]
