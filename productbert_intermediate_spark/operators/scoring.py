"""Pairwise scoring stage: candidate pairs → scored match edges (SURVEY §2.7 M1).

The reference scores pairs with a fine-tuned BERT + linear head and thresholds
sigmoid(logit) at 0.5 (/root/reference/src/productbert/model/model.py:28-55,
model/metric.py:21-27, test.py:54-93). This engine keeps the same decision
shape — features → logit → sigmoid → 0.5 threshold — but computes it as a
distributed DataFrame plan:

* hydration: two equi-joins pairs⋈offers (J1, build_intermediate_training_set
  .py:57-63), broadcast when the offer side is small;
* sequence building: per-attribute token truncation (title 50 / brand 5 /
  desc 100 / spec 200 — process_to_bert.py:193-202) then
  brand+' '+title+' '+description+' '+spec (_att_to_seq_lspc, :152-159);
* features: JVM-side levenshtein/jaccard/brand/price + Arrow-batched
  embedding-cosine and Jaro-Winkler pandas UDFs (one UDF call each per
  batch — never per-row Python);
* calibrated logistic scoring: weights fit offline on labeled pairs
  (fit_calibration, deterministic full-batch gradient descent), broadcast
  into the plan as literals — the Spark-side analog of consuming a frozen
  fine-tuned matcher.

Scale: the stage is hydration-join + map. With offers bucketed by id the
joins are shuffle-light; everything after is embarrassingly parallel.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import (
    embedding_cosine_udf,
    jaro_winkler_udf,
    levenshtein_norm,
    token_jaccard,
)
from ..functions.text import token_prefix, token_set

PAIR_ATTRS = ("title", "description", "brand", "price", "specTableContent")

# truncation limits mirror the reference's _cut_lspc (process_to_bert.py:193-202)
_CUTS = {"title": 50, "brand": 5, "description": 100, "specTableContent": 200}

FEATURES = (
    "emb_cos",
    "jw_title",
    "lev_title",
    "jac_tokens",
    "digit_jac",
    "brand_match",
    "price_sim",
)

# Calibrated on the deterministic synthetic corpus (2000 pages, seed 42) via
# scripts/calibrate.py (train accuracy 1.0000 on 1000 gold pairs); refit when
# the corpus or feature set changes.
DEFAULT_WEIGHTS: dict[str, float] = {
    "bias": -5.289333,
    "emb_cos": 2.974409,
    "jw_title": -2.574342,
    "lev_title": 0.158940,
    "jac_tokens": 3.217069,
    "digit_jac": 8.483275,
    "brand_match": 0.728343,
    "price_sim": -0.909595,
}


def hydrate_pairs(
    pairs: DataFrame, offers: DataFrame, broadcast_offers: bool = False
) -> DataFrame:
    """(id_l, id_r) → + {attr}_left/{attr}_right columns (J1, two equi-joins)."""
    side = offers.select(
        "id", *[F.col(a).alias(a) for a in PAIR_ATTRS]
    )
    if broadcast_offers:
        side = F.broadcast(side)
    left = side.select(
        F.col("id").alias("id_l"),
        *[F.col(a).alias(f"{a}_left") for a in PAIR_ATTRS],
    )
    right = side.select(
        F.col("id").alias("id_r"),
        *[F.col(a).alias(f"{a}_right") for a in PAIR_ATTRS],
    )
    return pairs.join(left, "id_l").join(right, "id_r")


def build_sequence(side: str):
    """brand+' '+title+' '+description+' '+spec after per-attr truncation."""
    cols = []
    for attr in ("brand", "title", "description", "specTableContent"):
        c = F.coalesce(F.col(f"{attr}_{side}"), F.lit(""))
        cols.append(token_prefix(c, _CUTS[attr]))
    return F.concat_ws(" ", *cols)


def blocking_text(side: str, desc_tokens: int = 5):
    """title + first-5 description tokens, lowered — the reference's
    discriminative pair text (title_for_ts, sample_intermediate_training_
    sets.py:197-205). Full descriptions drown the entity signal in
    boilerplate, so similarity features are computed on this text while the
    full truncated sequence remains available via build_sequence."""
    title = F.coalesce(F.col(f"title_{side}"), F.lit(""))
    desc5 = token_prefix(F.coalesce(F.col(f"description_{side}"), F.lit("")), desc_tokens)
    return F.lower(F.concat_ws(" ", title, desc5))


def pair_features(hydrated: DataFrame) -> DataFrame:
    """Add the FEATURES columns to a hydrated pair table."""
    df = hydrated.withColumn("_seq_l", blocking_text("left")).withColumn(
        "_seq_r", blocking_text("right")
    )
    title_l = F.coalesce(F.col("title_left"), F.lit(""))
    title_r = F.coalesce(F.col("title_right"), F.lit(""))
    price_l = F.regexp_replace(F.coalesce(F.col("price_left"), F.lit("")), "[^0-9.]", "")
    price_r = F.regexp_replace(F.coalesce(F.col("price_right"), F.lit("")), "[^0-9.]", "")
    pl = F.when(price_l.rlike(r"^[0-9]+(\.[0-9]+)?$"), price_l.cast("double"))
    pr = F.when(price_r.rlike(r"^[0-9]+(\.[0-9]+)?$"), price_r.cast("double"))
    df = (
        df.withColumn("emb_cos", embedding_cosine_udf("_seq_l", "_seq_r"))
        .withColumn("jw_title", jaro_winkler_udf(F.lower(title_l), F.lower(title_r)))
        .withColumn("lev_title", levenshtein_norm(F.lower(title_l), F.lower(title_r)))
        .withColumn("jac_tokens", token_jaccard(token_set(F.col("_seq_l")), token_set(F.col("_seq_r"))))
        .withColumn(
            # jaccard over digit-bearing tokens: product codes / MPNs are the
            # highest-precision match signal in product ER (the reference's
            # corpus carries them inside titles; matching papers key on them)
            "digit_jac",
            F.when(
                (
                    F.size(F.filter(token_set(F.col("_seq_l")), lambda t: t.rlike(r"\d")))
                    == 0
                )
                & (
                    F.size(F.filter(token_set(F.col("_seq_r")), lambda t: t.rlike(r"\d")))
                    == 0
                ),
                0.5,
            ).otherwise(
                token_jaccard(
                    F.filter(token_set(F.col("_seq_l")), lambda t: t.rlike(r"\d")),
                    F.filter(token_set(F.col("_seq_r")), lambda t: t.rlike(r"\d")),
                )
            ),
        )
        .withColumn(
            "brand_match",
            F.when(
                F.col("brand_left").isNull() | F.col("brand_right").isNull(), 0.5
            ).otherwise(
                (F.lower("brand_left") == F.lower("brand_right")).cast("double")
            ),
        )
        .withColumn(
            "price_sim",
            F.when(pl.isNull() | pr.isNull(), 0.5).otherwise(
                1.0 - F.least(F.lit(1.0), F.abs(pl - pr) / F.greatest(pl, pr, F.lit(1e-9)))
            ),
        )
    )
    return df.drop("_seq_l", "_seq_r")


def score_pairs(
    features_df: DataFrame, weights: dict[str, float] | None = None
) -> DataFrame:
    """logit = w·x + b; score = sigmoid(logit); match = score > 0.5.

    The 0.5 threshold is the reference's decision rule (metric.py:21-27).
    """
    w = weights or DEFAULT_WEIGHTS
    logit = F.lit(float(w["bias"]))
    for feat in FEATURES:
        logit = logit + F.lit(float(w[feat])) * F.col(feat)
    df = features_df.withColumn("logit", logit)
    df = df.withColumn("score", F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit"))))
    return df.withColumn("match", (F.col("score") > 0.5))


def score_candidates(
    pairs: DataFrame,
    offers: DataFrame,
    weights: dict[str, float] | None = None,
    broadcast_offers: bool = False,
) -> DataFrame:
    """Full scoring stage: hydrate → features → calibrated score."""
    return score_pairs(
        pair_features(hydrate_pairs(pairs, offers, broadcast_offers)), weights
    )


# --------------------------------------------------------------- calibration


def fit_calibration(
    features: pd.DataFrame,
    labels: np.ndarray | pd.Series,
    lr: float = 0.5,
    iters: int = 2000,
    l2: float = 1e-4,
) -> dict[str, float]:
    """Deterministic full-batch logistic regression on labeled pair features.

    Driver-side by design: the labeled gold standard is small (like the
    reference's training sets); the fitted weights are broadcast into the
    distributed scoring plan. Zero-init + fixed iteration count → the same
    input always yields the same weights.
    """
    X = features[list(FEATURES)].to_numpy(dtype=np.float64)
    y = np.asarray(labels, dtype=np.float64)
    Xb = np.hstack([np.ones((len(X), 1)), X])
    w = np.zeros(Xb.shape[1])
    n = len(y)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xb @ w)))
        grad = Xb.T @ (p - y) / n + l2 * w
        w -= lr * grad
    out = {"bias": float(w[0])}
    for i, feat in enumerate(FEATURES):
        out[feat] = float(w[i + 1])
    return out


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))
