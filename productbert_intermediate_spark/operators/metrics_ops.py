"""Evaluation aggregates (SURVEY.md §2.4 A4/A5): confusion matrix + P/R/F1.

One-pass conditional-sum aggregation replaces the reference's tensor loops
(/root/reference/src/productbert/model/metric.py:29-59); the scalar
zero-division guards mirror utils/util.py:30-50 (undefined → None instead of
the reference's 'undefined' string / sys.exit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_counts(
    df: DataFrame, pred: str = "match", label: str = "label"
) -> dict[str, int]:
    """tp/fp/tn/fn in a single aggregation pass."""
    p = F.col(pred).cast("boolean")
    y = F.col(label).cast("int")
    row = df.agg(
        F.sum(F.when(p & (y == 1), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(p & (y == 0), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~p & (y == 0), 1).otherwise(0)).alias("tn"),
        F.sum(F.when(~p & (y == 1), 1).otherwise(0)).alias("fn"),
    ).collect()[0]
    return {k: int(row[k] or 0) for k in ("tp", "fp", "tn", "fn")}


def prec_rec_f1(counts: dict[str, int]) -> dict[str, float | None]:
    """Precision/recall/F1 with the reference's zero-division guards."""
    tp, fp, fn = counts["tp"], counts["fp"], counts["fn"]
    precision = tp / (tp + fp) if (tp + fp) > 0 else None
    recall = tp / (tp + fn) if (tp + fn) > 0 else None
    if precision and recall and (precision + recall) > 0:
        f1 = 2 * precision * recall / (precision + recall)
    else:
        f1 = None
    return {"precision": precision, "recall": recall, "f1": f1}


def evaluate_pairwise(
    entities: DataFrame, labeled_pairs: DataFrame
) -> dict[str, float | int | None]:
    """Pairwise F1 of entity assignments against labeled gold pairs.

    prediction(pair) := both sides resolved to the same entity_id.
    Pairs whose sides are missing from the entity table count as
    predicted-nonmatch (an unresolvable offer can never be claimed equal).
    """
    e = entities.select("id", "entity_id")
    joined = (
        labeled_pairs.select("id_left", "id_right", "label")
        .join(e.withColumnRenamed("id", "id_left").withColumnRenamed("entity_id", "e_l"), "id_left", "left")
        .join(e.withColumnRenamed("id", "id_right").withColumnRenamed("entity_id", "e_r"), "id_right", "left")
        .withColumn(
            "match",
            F.col("e_l").isNotNull()
            & F.col("e_r").isNotNull()
            & (F.col("e_l") == F.col("e_r")),
        )
    )
    counts = confusion_counts(joined)
    out: dict[str, float | int | None] = dict(counts)
    out.update(prec_rec_f1(counts))
    return out
