"""Training-data operators as a DataFrame API: deduplication, similarity,
text analysis.

Each operator delegates to the dual-dialect SQL templates in
:mod:`geojson_vt_cpp_spark.functions.dialect_sql` — fully declarative Spark
SQL (Catalyst plans everything: the minhash explode is a Generate, the band
join an ordinary equi-join it can broadcast or skew-split), with DuckDB
oracle parity guaranteed by construction.

Scale notes (10^12 docs):
- exact dedup: hash-groupBy, map-side combine free;
- minhash/LSH: shingle explode is narrow; the band self-join shuffles on
  (band values) — salted by band index by construction (two bands = two
  joins unioned), AQE handles residual hot buckets;
- simhash: bit votes are a two-level aggregate (partial aggregation does
  the heavy lifting before the shuffle);
- embedding near-dup: hyperplane-LSH buckets bound the candidate pairs;
  exact cosine refines only bucket mates.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame

from geojson_vt_cpp_spark.functions import dialect_sql as D


def _run(df: DataFrame, view: str, name: str, text_col: str = "text",
         id_col: str = "doc_id") -> DataFrame:
    tmp = f"{view}_{uuid.uuid4().hex[:8]}"
    sel = df.selectExpr(f"{id_col} as doc_id", f"{text_col} as text",
                        *(["lang"] if "lang" in df.columns else ["'?' as lang"]))
    sel.createOrReplaceTempView(tmp)
    sql = D.queries_sql("spark")[name].replace("documents", tmp)
    return df.sparkSession.sql(sql)


def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, text_hash, n_copies) — exact duplicates share a hash."""
    return _run(docs, "dedup_exact", "dedup_exact", text_col, id_col)


def minhash_signatures(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """4x60-bit minhash over char-8-gram shingles."""
    return _run(docs, "mh_sig", "dedup_minhash_signatures", text_col, id_col)


def minhash_near_dup_pairs(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """LSH band join (2 bands x 2 rows) -> candidate near-dup pairs."""
    return _run(docs, "mh_pairs", "dedup_minhash_pairs", text_col, id_col)


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """16-bit simhash per document (word-hash bit majority)."""
    return _run(docs, "simhash", "dedup_simhash", text_col, id_col)


def ngram_jaccard(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact char-4-gram Jaccard over deterministic candidate pairs."""
    return _run(docs, "jaccard", "dedup_ngram_jaccard", text_col, id_col)


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language guess + per-language scores."""
    return _run(docs, "langid", "text_lang_id", text_col, id_col)


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / token / stopword quality features + combined score."""
    return _run(docs, "quality", "text_quality_score", text_col, id_col)


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace-token counts, distinct tokens, length extremes."""
    return _run(docs, "tokens", "text_token_stats", text_col, id_col)


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Normalized-text fingerprints (md5 + portable 60-bit)."""
    return _run(docs, "fp", "text_fingerprint", text_col, id_col)


def _run_emb(df: DataFrame, name: str, vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    tmp = f"emb_{uuid.uuid4().hex[:8]}"
    df.selectExpr(f"{id_col} as vec_id", f"{vec_col} as embedding").createOrReplaceTempView(tmp)
    sql = D.queries_sql("spark")[name].replace("embeddings", tmp)
    return df.sparkSession.sql(sql)


def cosine_top_k(embs: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Brute-force cosine top-k vs the query vector (vec_id=0 by template)."""
    return _run_emb(embs, "sim_cosine_topk", vec_col, id_col)


def lsh_buckets(embs: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """8-bit random-hyperplane LSH bucket per vector (ANN scale path)."""
    return _run_emb(embs, "sim_lsh_buckets", vec_col, id_col)


def embedding_near_dup(embs: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """LSH-bucketed candidate pairs refined by exact cosine threshold."""
    return _run_emb(embs, "dedup_embedding_neardup", vec_col, id_col)
