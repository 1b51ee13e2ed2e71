"""as_of_join vs pandas merge_asof on random keyed time series, plus the
tie-at-equal-timestamp inclusivity contract."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from geojson_vt_cpp_spark.operators.temporal import as_of_join

pytestmark = pytest.mark.spark


def test_as_of_join_matches_merge_asof(spark):
    rng = np.random.RandomState(17)
    n_l, n_r = 400, 300
    left = pd.DataFrame({
        "event_id": np.arange(n_l),
        "user_id": rng.randint(0, 20, n_l),
        "t": rng.randint(0, 10_000, n_l).astype("int64"),
    })
    right = pd.DataFrame({
        "event_id": np.arange(n_r) + 10_000,
        "user_id": rng.randint(0, 20, n_r),
        "t": rng.randint(0, 10_000, n_r).astype("int64"),
        "value": rng.rand(n_r).round(6),
    })
    # dedupe (user, t) on the right: merge_asof picks the LAST of equal
    # keys while the window picks by id tie-break — equal-ts semantics are
    # covered deterministically in the explicit test below
    right = right.drop_duplicates(["user_id", "t"], keep="first")

    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    got = {
        r["event_id"]: r["asof_value"]
        for r in as_of_join(ldf, rdf, key="user_id", ts="t").collect()
    }

    want_df = pd.merge_asof(
        left.sort_values(["t", "event_id"]).reset_index(drop=True),
        right.sort_values("t").reset_index(drop=True),
        on="t", by="user_id", direction="backward", suffixes=("", "_r"),
    )
    want = {int(r.event_id): (None if pd.isna(r.value) else float(r.value))
            for r in want_df.itertuples()}
    assert set(got) == set(want) and len(got) == n_l
    for k in want:
        g = got[k]
        if want[k] is None:
            assert g is None, k
        else:
            assert g == pytest.approx(want[k], abs=0), k


def test_as_of_join_equal_timestamp_inclusive(spark):
    ldf = spark.createDataFrame(
        [(1, 100, 5), (2, 100, 4)], "event_id long, user_id long, t long"
    )
    rdf = spark.createDataFrame(
        [(9, 100, 5, 1.25), (8, 100, 3, 9.0)],
        "event_id long, user_id long, t long, value double",
    )
    got = {r["event_id"]: r["asof_value"]
           for r in as_of_join(ldf, rdf, key="user_id", ts="t").collect()}
    assert got == {1: 1.25, 2: 9.0}  # t=5 right row matches the t=5 left row
