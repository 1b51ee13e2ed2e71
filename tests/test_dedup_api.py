"""DataFrame-API wrappers over the training-data operators: results must be
identical to the dual-dialect SQL the oracle harness already validates."""

from __future__ import annotations

import pytest

from geojson_vt_cpp_spark.operators import dedup as DD

SF_DIR = "/root/testdata/sf0.01"

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_text_operators_run_and_agree(spark, docs):
    n = docs.count()
    assert DD.dedup_exact(docs).count() == n
    sig = DD.minhash_signatures(docs)
    assert sig.count() == n and set(sig.columns) == {"doc_id", "mh0", "mh1", "mh2", "mh3"}
    assert DD.simhash(docs).count() == n
    assert DD.lang_id(docs).count() == n
    assert DD.quality_score(docs).count() == n
    assert DD.token_stats(docs).count() == n
    fp = DD.fingerprint(docs)
    assert fp.select("fingerprint").distinct().count() == n  # no dups at sf0.01
    assert DD.ngram_jaccard(docs).count() > 0


def test_embedding_operators(spark, embs):
    topk = DD.cosine_top_k(embs).collect()
    assert len(topk) == 10
    assert [r["sim_rank"] for r in sorted(topk, key=lambda r: r["sim_rank"])] == list(range(1, 11))
    assert DD.lsh_buckets(embs).count() == embs.count()
    nd = DD.embedding_near_dup(embs)
    assert nd.count() > 0
    assert all(r["cosine"] >= 0.35 for r in nd.collect())


def test_custom_column_names(spark, docs):
    renamed = docs.selectExpr("doc_id as id", "text as body", "lang")
    out = DD.dedup_exact(renamed, text_col="body", id_col="id")
    assert out.count() == docs.count()
