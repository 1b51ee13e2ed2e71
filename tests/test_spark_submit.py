"""Ship-it path: the zipped package must run under spark-submit --py-files
(north rule packaging requirement)."""

from __future__ import annotations

import subprocess
import sys

import pytest

JOB = """
from pyspark.sql import SparkSession
from geojson_vt_cpp_spark import Options, TilePyramid, documents_from_fixture
spark = SparkSession.builder.getOrCreate()
docs = documents_from_fixture(
    spark, open("/root/reference/test/fixtures/polygon-bug.json").read(), "pb")
pyr = TilePyramid.from_documents(docs, Options(buffer=1024))
t = pyr.get_tile(5, 19, 9)
assert t.features[0]["parts"] == [
    [[3072, 3072], [5120, 3072], [5120, 5120], [3072, 5120], [3072, 3072]]]
print("SUBMIT_OK")
"""


@pytest.mark.spark
def test_spark_submit_py_files(tmp_path):
    out = subprocess.run(
        ["bash", "/root/repo/scripts/package.sh"], capture_output=True, text=True
    )
    assert out.returncode == 0, out.stderr
    job = tmp_path / "job.py"
    job.write_text(JOB)
    run = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", "/root/repo/dist/geojson_vt_cpp_spark.zip",
            str(job),
        ],
        capture_output=True, text=True, timeout=300, cwd=str(tmp_path),
    )
    assert "SUBMIT_OK" in run.stdout, run.stderr[-2000:]
