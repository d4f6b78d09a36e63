"""Meta-blocking: weight candidate pairs by blocking evidence, prune weak ones.

Key-based blocking (rare-token, LSH bands, sorted neighborhood) trades recall
for a bounded pair budget, but the budget it emits is still dominated by
pairs that co-occur under ONE key by coincidence. Meta-blocking (Papadakis,
Koutrika, Palpanas, Nejdl, "Meta-Blocking: Taking Entity Resolution to the
Next Level", TKDE 2014 — public algorithm) restructures the block collection
into a weighted pair graph — weight = how much blocking evidence supports
the pair — and prunes low-weight edges BEFORE the expensive scorer runs.
At 10^12 offers this is the difference between scoring every coincidental
co-occurrence and scoring only corroborated candidates: published results
cut comparisons 10-100× at negligible recall cost.

The reference has no counterpart (its pairs come pre-labeled from the WDC
corpus, /root/reference/README.md:25-38); this is net-new capability for
the end-to-end resolver.

Weighting scheme: CBS (common blocks scheme) — the number of distinct
blocking keys a pair co-occurs under, computed by aggregating the
pre-distinct pair expansion (blocking._bounded_pair_expansion), so weighting
costs one groupBy over rows the expansion already produces; no extra join
against the key table.

Pruning schemes (both INTEGER-EXACT — the mean comparisons are cross-
multiplied, `w·n ≥ Σw`, so no float divide can diverge between engines or
partition counts):

* WEP (weighted edge pruning): keep pairs strictly above the GLOBAL mean
  weight. One scalar aggregate (two longs to the driver), one filter.
* WNP (weighted node pruning): keep a pair if its weight is at or above the
  mean weight of EITHER endpoint's pairs — node-local thresholds adapt to
  skew (a hub id with thousands of weak pairs prunes aggressively; a quiet
  id keeps its best evidence). Two partial-aggregable groupBys + two
  equi-joins of the pair table against a node-sized side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .blocking import DEFAULT_MAX_BLOCK_SIZE, _bounded_pair_expansion


def pair_key_weights(
    keys: DataFrame,
    max_block_size: int = DEFAULT_MAX_BLOCK_SIZE,
    tracker=None,
    assume_distinct_keys: bool = False,
) -> DataFrame:
    """(id, key) → (id_l, id_r, weight): CBS weight = # keys shared.

    Same block-size gating and drop observability as
    candidate_pairs_from_keys — weighting must not resurrect pairs the
    size cap dropped. Requires distinct (id, key) input rows for the
    weight to mean "distinct shared keys" (both in-repo key generators
    emit distinct rows; see block_offers's assume_distinct_keys note).
    """
    expanded = _bounded_pair_expansion(
        keys, max_block_size, tracker, assume_distinct_keys
    )
    return expanded.groupBy("id_l", "id_r").agg(
        F.count("*").cast("long").alias("weight")
    )


def prune_pairs_wep(weighted: DataFrame) -> DataFrame:
    """Weighted edge pruning: keep pairs with weight > global mean.

    Exact integer form: w · n_pairs > Σ weights. The two scalars ride one
    aggregate to the driver and inline into the filter as literals — no
    cross join, no second pass over the pair table's lineage.
    """
    row = weighted.agg(
        F.count("*").alias("n"), F.sum("weight").alias("s")
    ).collect()[0]
    n, s = int(row["n"]), int(row["s"] or 0)
    return weighted.where(F.col("weight") * F.lit(n) > F.lit(s))


def prune_pairs_wnp(weighted: DataFrame) -> DataFrame:
    """Weighted node pruning: keep pairs at/above either endpoint's mean.

    Node means stay distributed (one symmetric union + groupBy — the node
    table is corpus-sized, never collected); the comparison is the exact
    integer cross-multiplication per side, OR-ed (the scheme is
    redundancy-positive: evidence that satisfies either endpoint keeps
    the pair).
    """
    sym = weighted.select(F.col("id_l").alias("_id"), "weight").unionAll(
        weighted.select(F.col("id_r").alias("_id"), "weight")
    )
    mu = sym.groupBy("_id").agg(
        F.count("*").alias("_cnt"), F.sum("weight").alias("_sum")
    )
    return (
        weighted.join(
            mu.select(
                F.col("_id").alias("id_l"),
                F.col("_cnt").alias("_cnt_l"),
                F.col("_sum").alias("_sum_l"),
            ),
            "id_l",
        )
        .join(
            mu.select(
                F.col("_id").alias("id_r"),
                F.col("_cnt").alias("_cnt_r"),
                F.col("_sum").alias("_sum_r"),
            ),
            "id_r",
        )
        .where(
            (F.col("weight") * F.col("_cnt_l") >= F.col("_sum_l"))
            | (F.col("weight") * F.col("_cnt_r") >= F.col("_sum_r"))
        )
        .select("id_l", "id_r", "weight")
    )
