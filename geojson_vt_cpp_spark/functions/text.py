"""Text kernels that need per-character state (not SQL-expressible):
polynomial rolling-hash document fingerprints, Arrow-vectorized.

The SQL-expressible text operators (lang-id, quality, token stats, md5
fingerprints) live in dialect_sql.py with DuckDB oracles; this module holds
the true rolling hash (Rabin-Karp style) used for shift-robust
fingerprinting and content-defined chunking at scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

ROLL_BASE = 257
ROLL_MOD = (1 << 61) - 1  # Mersenne prime


def rolling_hash_np(text: str, window: int = 64) -> np.ndarray:
    """All window rolling hashes of ``text`` (vectorized via cumulative
    polynomial prefix hashes under a Mersenne-prime modulus)."""
    b = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8).astype(object)
    n = len(b)
    if n == 0:
        return np.empty(0, dtype=object)
    # prefix[i] = hash of first i chars; object dtype: python ints (exact)
    powers = [1] * (n + 1)
    for i in range(1, n + 1):
        powers[i] = (powers[i - 1] * ROLL_BASE) % ROLL_MOD
    prefix = [0] * (n + 1)
    for i in range(n):
        prefix[i + 1] = (prefix[i] * ROLL_BASE + int(b[i])) % ROLL_MOD
    w = min(window, n)
    out = [
        (prefix[i + w] - prefix[i] * powers[w]) % ROLL_MOD
        for i in range(n - w + 1)
    ]
    return np.asarray(out, dtype=object)


def doc_fingerprint(text: str, window: int = 64, keep: int = 4) -> list[int]:
    """Winnowed fingerprint: the ``keep`` smallest window hashes (order-
    stable, shift-robust — a local edit changes only nearby windows)."""
    h = rolling_hash_np(text, window)
    if len(h) == 0:
        return []
    return sorted(int(v) for v in np.sort(h)[:keep])


def fingerprint_documents(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    window: int = 64, keep: int = 4,
) -> DataFrame:
    """(doc_id, fp array<long>) rolling-hash fingerprints, Arrow-batched."""

    @pandas_udf("array<long>")
    def fp(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: doc_fingerprint(t or "", window, keep))

    return docs.select(
        F.col(id_col).alias("doc_id"), fp(F.col(text_col)).alias("fp")
    )
