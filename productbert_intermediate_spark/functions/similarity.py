"""String / vector similarity functions (SURVEY.md §2.2 P13, §2.7 M1/M3).

Column-level functions stay JVM-side (levenshtein, jaccard, cosine via
F.zip_with/F.aggregate). Jaro-Winkler and the hashed text embedding have no
Spark built-in and run as Arrow-batched pandas UDFs (batch-at-a-time Python,
never row-at-a-time plan-level UDFs).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

# ---------------------------------------------------------------- Jaro-Winkler


def jaro_py(s1: str, s2: str) -> float:
    """Jaro similarity (public algorithm; Jaro 1989)."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    flags1 = [False] * len1
    flags2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c:
                flags1[i] = True
                flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(len1):
        if flags1[i]:
            while not flags2[k]:
                k += 1
            if s1[i] != s2[k]:
                transpositions += 1
            k += 1
    transpositions //= 2
    m = float(matches)
    return (m / len1 + m / len2 + (m - transpositions) / m) / 3.0


def jaro_winkler_py(s1: str | None, s2: str | None, p: float = 0.1) -> float:
    """Jaro-Winkler similarity (Winkler 1990), prefix scale p, max prefix 4."""
    if s1 is None or s2 is None:
        return 0.0
    j = jaro_py(s1, s2)
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a == b:
            prefix += 1
        else:
            break
    return j + prefix * p * (1.0 - j)


@pandas_udf(DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:  # pragma: no cover
    return pd.Series(
        [jaro_winkler_py(x, y) for x, y in zip(a.tolist(), b.tolist())],
        dtype="float64",
    )


def jaro_winkler(a: Column, b: Column) -> Column:
    return jaro_winkler_udf(a, b)


# ------------------------------------------------------- JVM-side similarities


def levenshtein_norm(a: Column, b: Column) -> Column:
    """1 - lev(a,b)/max(len) — JVM-side, null-safe (null → 0.0)."""
    a_ = F.coalesce(a, F.lit(""))
    b_ = F.coalesce(b, F.lit(""))
    denom = F.greatest(F.length(a_), F.length(b_))
    return F.when(denom == 0, F.lit(1.0)).otherwise(
        1.0 - F.levenshtein(a_, b_) / denom.cast("double")
    )


def token_jaccard(a: Column, b: Column) -> Column:
    """Jaccard over token arrays: |a∩b| / |a∪b| — JVM-side."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / union.cast("double")
    )


def array_dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns — JVM-side (zip_with+aggregate)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def array_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def array_cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns — JVM-side."""
    denom = array_norm(a) * array_norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(array_dot(a, b) / denom)


# --------------------------------------------------- hashed text embedding

EMBED_DIM = 256


def _stable_hash(token: str, salt: str) -> int:
    """Deterministic 64-bit hash (blake2b) — stable across processes/runs."""
    h = hashlib.blake2b(f"{salt}\x00{token}".encode("utf-8"), digest_size=8)
    return int.from_bytes(h.digest(), "little")


def embed_texts(texts: list[str | None], dim: int = EMBED_DIM) -> np.ndarray:
    """Deterministic hashing-trick embedding of token+char-3gram features.

    Stand-in for the reference's BERT pooler embedding (model/model.py:43-55):
    a unit-normalized bag-of-features projection. The cosine of two such
    embeddings is a high-recall textual-similarity signal; the production
    scorer combines it with string features and a calibrated threshold.
    """
    out = np.zeros((len(texts), dim), dtype=np.float64)
    for row, text in enumerate(texts):
        if not text:
            continue
        feats: list[str] = text.split()
        for tok in list(feats):
            padded = f"^{tok}$"
            feats.extend(padded[i : i + 3] for i in range(len(padded) - 2))
        for ft in feats:
            h = _stable_hash(ft, "emb")
            idx = h % dim
            sign = 1.0 if (h >> 63) & 1 else -1.0
            out[row, idx] += sign
        norm = np.linalg.norm(out[row])
        if norm > 0:
            out[row] /= norm
    return out


def embedding_cosine_batch(left: pd.Series, right: pd.Series) -> pd.Series:
    """Batched cosine of hashed embeddings for two text Series."""
    lv = embed_texts(left.tolist())
    rv = embed_texts(right.tolist())
    return pd.Series(np.einsum("ij,ij->i", lv, rv), dtype="float64")


@pandas_udf(DoubleType())
def embedding_cosine_udf(a: pd.Series, b: pd.Series) -> pd.Series:  # pragma: no cover
    return embedding_cosine_batch(a, b)
