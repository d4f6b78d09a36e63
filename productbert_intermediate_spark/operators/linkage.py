"""Clean-clean record linkage: candidate pairs ACROSS two sources only.

The reference resolves one corpus against itself (dedup ER — every script
from sample_intermediate_training_sets.py onward assumes a single offers
table). Linking two separately-curated tables (last quarter's catalog vs
a new feed, two crawls of different marketplaces) is the sibling task
with one extra invariant: records WITHIN a side are already known
distinct, so the blocker must emit cross-side pairs only — a within-side
pair is not just wasted scoring, it is a wrong candidate.

Same key machinery as dedup blocking (operators/blocking.py): token
document frequencies are computed over the UNION of both sides (a token
rare in the combined corpus is exactly as discriminative for a cross
pair as for a dedup pair), rare-token keys + optional MinHash-LSH band
keys, then a per-key size gate and a key-equi-join that produces only
(left id, right id) pairs.

Scale shape: one union, the shared tokenize/df-prune pipeline, one
two-level count-distinct aggregation per key (partial-aggregable), a
semi-join gate, and one equi-join on key whose per-key output is capped
at ``max_block_pairs`` BEFORE the join runs — no cartesians, no
collect, skew bounded by the gate exactly like candidate_pairs_from_keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import blocking as B


def link_candidate_pairs(
    left: DataFrame,
    right: DataFrame,
    min_df: int = B.DEFAULT_MIN_DF,
    max_df_frac: float = B.DEFAULT_MAX_DF_FRAC,
    max_rare_df: int | None = None,
    num_hashes: int = B.DEFAULT_NUM_HASHES,
    bands: int = B.DEFAULT_BANDS,
    use_lsh: bool = True,
    max_block_pairs: int = B.DEFAULT_MAX_BLOCK_SIZE**2,
    group_col: str = "category",
    tracker=None,
) -> DataFrame:
    """left, right (id, title, description, <group_col>) → distinct
    candidate (id_l, id_r) with id_l from left and id_r from right.

    Both sides must carry the same id type (they are union-tagged into
    one corpus for df computation). A key is expanded only when it has
    at least one id on EACH side and its cross product n_l · n_r is at
    most ``max_block_pairs`` (the linkage analog of dedup's
    max_block_size: the gate bounds emitted pairs per key, and with it
    the join's worst skew). Pass a ``MetricTracker`` as ``tracker`` to
    observe the recall trade: ``link_dropped_keys`` /
    ``link_dropped_pairs`` count what the gate forfeited, riding
    ``observe()`` on the sizes aggregate — zero extra jobs.
    """

    def _tagged(df: DataFrame, side: str) -> DataFrame:
        return B.build_title_for_ts(df).select(
            F.struct(
                F.lit(side).alias("side"), F.col("id").alias("oid")
            ).alias("id"),
            F.col(group_col),
            "tokens",
        )

    union = _tagged(left, "l").unionByName(_tagged(right, "r"))
    pruned = B.prune_tokens_by_df(union, min_df, max_df_frac, group_col)
    if use_lsh:
        # two key families consume `pruned` with different projections
        # (same rationale as block_offers): cut lineage once, read twice
        pruned = pruned.localCheckpoint(eager=True)
    keys = B.rare_token_keys(
        pruned, max_rare_df or B.DEFAULT_MAX_BLOCK_SIZE, group_col
    )
    if use_lsh:
        keys = keys.unionByName(
            B.minhash_band_keys(pruned, num_hashes, bands, group_col)
        )

    k = keys.select(
        F.col("id.side").alias("_side"), F.col("id.oid").alias("_oid"), "key"
    )
    # count_distinct ignores the NULLs the when() emits for the other side
    n_l = F.count_distinct(
        F.when(F.col("_side") == "l", F.col("_oid"))
    ).alias("_nl")
    n_r = F.count_distinct(
        F.when(F.col("_side") == "r", F.col("_oid"))
    ).alias("_nr")
    sizes = k.groupBy("key").agg(n_l, n_r)
    if tracker is not None:
        crossable = (F.col("_nl") >= 1) & (F.col("_nr") >= 1)
        over = crossable & (
            F.col("_nl") * F.col("_nr") > F.lit(max_block_pairs)
        )
        sizes = tracker.attach(
            sizes,
            link_dropped_keys=over.cast("long"),
            link_dropped_pairs=F.when(
                over, F.col("_nl") * F.col("_nr")
            ).otherwise(F.lit(0)),
        )
    ok = sizes.where(
        (F.col("_nl") >= 1)
        & (F.col("_nr") >= 1)
        & (F.col("_nl") * F.col("_nr") <= max_block_pairs)
    ).select("key")
    kl = k.where(F.col("_side") == "l").join(ok, "key", "left_semi").select(
        "key", F.col("_oid").alias("id_l")
    )
    kr = k.where(F.col("_side") == "r").join(ok, "key", "left_semi").select(
        "key", F.col("_oid").alias("id_r")
    )
    # (id, key) rows are distinct per family by construction (rare keys
    # explode an array_distinct token set; band keys emit one row per
    # (id, band) with the band index baked into the key), so the join's
    # only duplication is a pair meeting under multiple keys — one distinct
    return kl.join(kr, "key").select("id_l", "id_r").distinct()
