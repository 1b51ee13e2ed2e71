"""Spark pipeline vs the driver-side kernel mirror on an input with NO
golden: countries.geojson (180 features, the reference's benchmark data).
Catches orchestration divergence (ordering, drill bookkeeping, wrap
activation) on data the golden suites never touch."""

from __future__ import annotations

import pytest

from geojson_vt_cpp_spark.config import Options
from geojson_vt_cpp_spark.operators.pyramid import TilePyramid
from geojson_vt_cpp_spark.sources.documents import documents_from_fixture

from .golden_utils import compare_tiles, my_feature_to_golden_shape
from .local_pyramid import gen_tiles

pytestmark = pytest.mark.spark


def test_countries_spark_matches_local_mirror(spark):
    text = open("/root/repo/fixtures/countries.geojson").read()
    # convert the mirror's engine-shaped features to the golden JSON shape
    # compare_tiles expects on its second argument
    mirror = {
        k: [my_feature_to_golden_shape(f) for f in v]
        for k, v in gen_tiles(text, 4, 500, False).items()
    }

    docs = documents_from_fixture(spark, text, "countries")
    pyr = TilePyramid.from_documents(
        docs, Options(max_zoom=14, index_max_zoom=4, index_max_points=500)
    )
    mine = pyr.all_tiles()
    errs = compare_tiles(mine, mirror, strict_geometry=True)
    assert not errs, errs[:10]
    # stats agree too
    assert len(mine) == len(mirror)
    pyr.close()
