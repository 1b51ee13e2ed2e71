"""Batch get_tiles: hits + drill-down misses in one DataFrame read, equal to
the per-tile getTile results."""

from __future__ import annotations

import pytest

from geojson_vt_cpp_spark.config import Options
from geojson_vt_cpp_spark.operators.pyramid import TilePyramid
from geojson_vt_cpp_spark.sources.documents import documents_from_fixture

from .golden_utils import load_fixture

pytestmark = pytest.mark.spark


def test_get_tiles_batch_matches_single(spark):
    docs = documents_from_fixture(spark, load_fixture("us-states.json"), "us-states")
    pyr = TilePyramid.from_documents(docs, Options())
    # the reference test's exact request set (test.cpp:203-221) so the
    # drill accounting must land on total == 37, plus a wraparound dup
    reqs = [
        (0, 0, 0),          # hit (the default index's only eager tile)
        (7, 37, 48),        # miss -> drill-down
        (9, 148, 192),      # deeper miss -> drill-down
        (11, 800, 400),     # unreachable -> absent from output
        (7, 37 + 128, 48),  # x wraparound duplicate of (7,37,48)
    ]
    batch = pyr.get_tiles(reqs)
    got = {}
    for r in batch.select("z", "tx", "ty").distinct().collect():
        got[(r["z"], r["tx"], r["ty"])] = True
    assert (7, 37, 48) in got and (9, 148, 192) in got and (0, 0, 0) in got
    assert (11, 800, 400) not in got

    # per-tile equality with the single-tile path
    single = pyr.get_tile(7, 37, 48)
    n_batch = batch.where("z = 7 and tx = 37 and ty = 48").count()
    assert n_batch == len(single.features)
    assert pyr.total == 37  # same drill accounting as the single-tile path
    pyr.close()
