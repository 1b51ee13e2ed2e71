"""Rolling-hash fingerprint kernel: vectorized implementation vs a naive
per-window reference, plus shift-robustness and the Spark surface."""

from __future__ import annotations

import pytest

from geojson_vt_cpp_spark.functions.text import (
    ROLL_BASE,
    ROLL_MOD,
    doc_fingerprint,
    fingerprint_documents,
    rolling_hash_np,
)


def naive_window_hash(text: str, window: int) -> list[int]:
    b = text.encode("utf-8", "ignore")
    w = min(window, len(b))
    out = []
    for i in range(len(b) - w + 1):
        h = 0
        for c in b[i:i + w]:
            h = (h * ROLL_BASE + c) % ROLL_MOD
        out.append(h)
    return out


def test_rolling_hash_matches_naive():
    text = "the quick brown fox jumps over the lazy dog" * 3
    got = [int(v) for v in rolling_hash_np(text, 16)]
    assert got == naive_window_hash(text, 16)


def test_fingerprint_shift_robustness():
    base = "".join(f"word{i} " for i in range(200))  # non-repetitive
    shifted = "PREFIX!! " + base  # local edit at the front
    a = set(doc_fingerprint(base, window=16, keep=8))
    b = set(doc_fingerprint(shifted, window=16, keep=8))
    # winnowed minima survive a prefix edit almost entirely (the edit only
    # adds ~9 windows out of ~1390)
    assert len(a & b) >= 6


def test_fingerprint_documents_spark(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").limit(50)
    out = fingerprint_documents(docs, window=32, keep=4).collect()
    assert len(out) == 50
    assert all(len(r["fp"]) == 4 for r in out)
    # deterministic: same doc -> same fingerprint
    one = docs.limit(1).collect()[0]
    assert doc_fingerprint(one["text"], 32, 4) == [
        int(v) for v in next(r["fp"] for r in out if r["doc_id"] == one["doc_id"])
    ]
