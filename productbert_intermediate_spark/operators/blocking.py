"""Blocking stage: offers → candidate pairs (SURVEY.md §3.2, §2.3 J5/J6).

The reference generates candidate pairs by building per-cluster / per-category
gensim TF indexes in RAM and querying top-k
(/root/reference/src/processing/sample-training-sets/
sample_intermediate_training_sets.py:27-190). That design needs the whole
category in one process. Here the same *capability* — surface pairs of offers
likely to match, bounded per offer, skew-controlled — is a distributed plan:

1. ``title_for_ts``  — title + first-5 description tokens, lowered, token-set
   (byte-for-byte the reference's blocking text, :197-205).
2. document-frequency pruning — drop tokens with df < min_df or
   df > max_df_frac·N within category (the reference's Dictionary
   filter_extremes(no_below=2, no_above=0.8), :33-34,100-101).
3. two blocking-key families:
   * rare-token keys: each offer emits its R rarest tokens as
     (category, token) keys — high-recall equivalent of the reference's
     "shared discriminative tokens" TF-index hits;
   * MinHash-LSH band keys: K hashes / B bands over the token set —
     catches jaccard-similar pairs whose rare tokens were pruned.
4. oversized blocking keys are DROPPED at ``max_block_size`` — the exact
   skew-control move of the reference's 2..80 cluster cap (:233-240);
   AQE skew-join handles residual imbalance.
5. pair expansion is JVM-side: groupBy(key) → sorted id array → nested
   ``transform`` generates (id_l < id_r) combinations without a join;
   one shuffle for the groupBy, one for the symmetric-dedup distinct
   (least/greatest canonicalization, SURVEY §2.4 A13).

Scale: every step is a hash-shuffle on bounded-cardinality keys; the
combination expansion is capped at max_block_size²/2 rows per key; no
driver-side collection anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_prefix, token_set

DEFAULT_MIN_DF = 2
DEFAULT_MAX_DF_FRAC = 0.8
DEFAULT_RARE_TOKENS = 3
DEFAULT_NUM_HASHES = 16
DEFAULT_BANDS = 8
DEFAULT_MAX_BLOCK_SIZE = 100


def build_title_for_ts(offers: DataFrame, desc_tokens: int = 5) -> DataFrame:
    """Add ``tokens``: set(lower(title + ' ' + first-5 desc tokens).split())."""
    desc5 = token_prefix(F.coalesce(F.col("description"), F.lit("")), desc_tokens)
    combined = F.concat_ws(" ", F.coalesce(F.col("title"), F.lit("")), desc5)
    return offers.withColumn("tokens", token_set(combined))


def prune_tokens_by_df(
    offers: DataFrame,
    min_df: int = DEFAULT_MIN_DF,
    max_df_frac: float = DEFAULT_MAX_DF_FRAC,
    group_col: str = "category",
    narrow: bool = False,
) -> DataFrame:
    """Keep tokens with min_df ≤ df ≤ max_df_frac·N within each group.

    Returns offers with ``tokens`` replaced by the pruned array and ``tok_df``
    (aligned df counts, ascending-rarity sorted) added for rare-token keys.

    ``narrow=True`` returns ONLY (id, <group_col>, tokens, tok_df) — the
    exact projection the key generators read — skipping the corpus-sized
    join back onto ``offers`` (one full shuffle join removed, guide §2.4).
    Two deliberate narrow-mode differences, both invisible to key
    generation: offers whose every token was pruned are absent instead of
    carrying an empty array (they emit no keys either way), and the group
    column holds the NULL-sentinel normalization (the generators coalesce
    to the same sentinel themselves).

    NULL group values form their own group: the df aggregation and the
    token re-join run on a null-coalesced key, because plain equi-joins
    treat NULL != NULL — without this, every NULL-category offer would
    lose all its tokens here and silently never enter a candidate pair.
    """
    gn = "_gnorm"
    base = offers.withColumn(
        gn, F.coalesce(F.col(group_col).cast("string"), F.lit("\x00<null>"))
    )
    toks = base.select("id", gn, F.explode("tokens").alias("token"))
    group_sizes = base.groupBy(gn).agg(F.count("*").alias("_n"))
    # df per (group, token) rides ONE shuffle of the token rows — a count
    # window over the (gn, token) partition — instead of the old
    # groupBy-count + join-back shape, which consumed `toks` twice (the
    # corpus scan + tokenize + explode ran once per consumer; the two
    # exchanges carry different payloads, so ReuseExchange cannot apply)
    # and paid a second token-level exchange for the join (guide §2.4).
    # Window skew equals the old join's skew: both hash-partition the token
    # rows by (gn, token), and a token's row count is bounded by its group
    # size. Group sizes are group-cardinality-sized — broadcast.
    w = Window.partitionBy(gn, "token")
    kept_toks = (
        toks.withColumn("df", F.count(F.lit(1)).over(w))
        .join(F.broadcast(group_sizes), gn)
        .where(
            (F.col("df") >= min_df)
            & (F.col("df") <= (F.col("_n") * F.lit(max_df_frac)))
        )
    )
    kept_base = kept_toks.groupBy("id")
    if narrow:
        return kept_base.agg(
            # gn is functionally determined by id — carrying it through
            # the aggregation replaces the join back onto offers
            F.first(gn).alias(group_col),
            F.array_sort(F.collect_list(F.struct("df", "token"))).alias("_dt"),
        ).select(
            "id",
            group_col,
            F.col("_dt.token").alias("tokens"),
            F.col("_dt.df").alias("tok_df"),
        )
    kept = kept_base.agg(
        F.array_sort(F.collect_list(F.struct("df", "token"))).alias("_dt"),
    ).select(
        "id",
        F.col("_dt.token").alias("tokens"),
        F.col("_dt.df").alias("tok_df"),
    )
    return offers.drop("tokens").join(kept, "id", "left").withColumn(
        "tokens", F.coalesce(F.col("tokens"), F.array().cast("array<string>"))
    )


def rare_token_keys(
    offers: DataFrame,
    max_rare_df: int = DEFAULT_MAX_BLOCK_SIZE,
    group_col: str = "category",
) -> DataFrame:
    """Emit (id, key) for EVERY token with df ≤ max_rare_df.

    A per-offer "R rarest" selection cannot guarantee two matching offers
    pick the same keys (punctuation variants / local adjectives crowd out
    the shared discriminative tokens). A df threshold does: any token two
    offers share that is rarer than the threshold produces a collision,
    and the resulting block size is bounded by df ≤ max_rare_df — skew
    control falls out of the key definition itself. This mirrors the
    reference guarantee that within-cluster mates always meet in the
    per-cluster index (sample_intermediate_training_sets.py:33-39) while
    its 2..80 cluster cap bounds the work (:233-240).

    ``tokens``/``tok_df`` come df-ascending-sorted from prune_tokens_by_df,
    so the selection is a JVM-side zip+filter, no extra shuffle.
    """
    zipped = F.arrays_zip(
        F.coalesce(F.col("tok_df"), F.array().cast("array<bigint>")).alias("df"),
        F.col("tokens").alias("token"),
    )
    rare = F.filter(zipped, lambda s: s["df"] <= max_rare_df)
    # NULL group → explicit sentinel: concat_ws silently SKIPS null args,
    # which would emit a shorter key that can't be told apart by segment
    return offers.select(
        "id",
        F.coalesce(F.col(group_col).cast("string"), F.lit("\x00<null>")).alias("_g"),
        F.explode(rare).alias("_s"),
    ).select(
        "id",
        F.concat_ws("\x00", F.lit("tok"), "_g", F.col("_s.token")).alias("key"),
    )


def minhash_band_keys(
    offers: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    group_col: str = "category",
) -> DataFrame:
    """Emit (id, key) LSH band keys over the token set — all JVM-side.

    minhash_s = min(xxhash64(token, s)); band key = hash of its row slice.
    """
    if bands <= 0 or num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be a positive multiple of "
            f"bands ({bands}); otherwise trailing hashes are computed but "
            "silently dropped from every band key"
        )
    rows = num_hashes // bands

    def _mh(seed: int):
        # one-arg lambda only: F.transform treats two-arg lambdas as
        # (element, index), which would silently replace the seed.
        lit_seed = F.lit(seed)
        return F.array_min(
            F.transform("tokens", lambda t: F.xxhash64(t, lit_seed))
        ).alias(f"_mh{seed}")

    sig = [_mh(s) for s in range(num_hashes)]
    with_sig = offers.where(F.size("tokens") > 0).select(
        "id",
        F.coalesce(F.col(group_col).cast("string"), F.lit("\x00<null>")).alias("_g"),
        *sig,
    )
    band_keys = [
        F.concat_ws(
            "\x00",
            F.lit(f"lsh{b}"),
            "_g",
            F.xxhash64(*[F.col(f"_mh{b * rows + r}") for r in range(rows)]).cast(
                "string"
            ),
        ).alias(f"_band{b}")
        for b in range(bands)
    ]
    return with_sig.select(
        "id", F.explode(F.array(*band_keys)).alias("key")
    )


def candidate_pairs_from_keys(
    keys: DataFrame,
    max_block_size: int = DEFAULT_MAX_BLOCK_SIZE,
    tracker=None,
    assume_distinct_keys: bool = False,
) -> DataFrame:
    """(id, key) → distinct candidate (id_l < id_r) pairs.

    Skew safety: block sizes are counted FIRST (distinct counting plans as
    two partial-aggregable levels — group by (key, id), then count per key —
    so each map task contributes a few bytes per group, never a per-key id
    buffer) and only keys within [2, max_block_size] reach the collect_set.
    Collecting before filtering would materialize a degenerate key's entire
    id list in one aggregation buffer: rare-token keys are df-bounded by
    construction, but LSH band keys are not (thousands of near-identical
    token sets share one band), and that single buffer OOMs an executor at
    web scale. The count pass and the collect pass hash-partition on the
    same key, so AQE plans the semi-join shuffle-light.

    Sizes count DISTINCT ids per key by default: a key generator that
    repeats a key for one id must not inflate a block past max_block_size
    and silently drop it (pair output is governed by collect_set, which
    dedupes anyway — the size gate must measure the same thing). Distinct
    counting plans as one extra aggregation level (~12% of the blocking
    stage measured at 20k pages); callers whose generators PROVABLY emit
    distinct (id, key) rows pass assume_distinct_keys=True to use the
    plain partial-aggregable count — block_offers does (its rare-token
    keys explode an array_distinct token set, its band keys emit one row
    per (id, band)).

    Pass a ``metrics_ops.MetricTracker`` as ``tracker`` to make the recall
    trade OBSERVABLE: the cap silently forfeits every pair inside an
    oversized block, and nothing else in the output reveals how much was
    dropped. The counters ride ``observe()`` on the sizes aggregate — zero
    extra jobs — and harvest as ``blocking_dropped_keys`` /
    ``blocking_dropped_rows`` (ids inside dropped blocks) /
    ``blocking_dropped_pairs`` (candidate pairs forfeited, n·(n−1)/2 per
    dropped key) via ``tracker.total(...)`` after the query's action runs.
    """
    return _bounded_pair_expansion(
        keys, max_block_size, tracker, assume_distinct_keys
    ).distinct()


def gate_oversized_keys(
    keys: DataFrame,
    max_block_size: int,
    tracker=None,
    assume_distinct_keys: bool = False,
) -> DataFrame:
    """Semi-join away keys with more than ``max_block_size`` ids (and the
    pairless n=1 keys). The counting pass is partial-aggregable; see
    candidate_pairs_from_keys for why counting precedes any collect."""
    counter = F.count("*") if assume_distinct_keys else F.count_distinct("id")
    sizes = keys.groupBy("key").agg(counter.alias("_n"))
    if tracker is not None:
        over = F.col("_n") > max_block_size
        sizes = tracker.attach(
            sizes,
            blocking_dropped_keys=over.cast("long"),
            blocking_dropped_rows=F.when(over, F.col("_n")).otherwise(F.lit(0)),
            blocking_dropped_pairs=F.when(
                over, F.col("_n") * (F.col("_n") - 1) / 2
            ).otherwise(F.lit(0.0)),
        )
    return keys.join(
        sizes.where(
            (F.col("_n") >= 2) & (F.col("_n") <= max_block_size)
        ).select("key"),
        "key",
        "left_semi",
    )


def expand_bounded_keys(bounded_keys: DataFrame) -> DataFrame:
    """(id, key) with per-key id counts ALREADY bounded → one (id_l < id_r)
    row per co-occurrence key. Callers must guarantee the bound (via
    gate_oversized_keys, or a key family whose size is capped by
    construction — rare-token keys' df ≤ max_rare_df); an unbounded key
    here would materialize its whole id list in one aggregation buffer."""
    bounded = bounded_keys.groupBy("key").agg(
        F.array_sort(F.collect_set("id")).alias("ids")
    )
    # pairs = [(ids[i], ids[j]) for i < j] — generated without a join
    pairs = bounded.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ids",
                    lambda x, i: F.transform(
                        F.slice(
                            "ids",
                            i + F.lit(2),
                            F.greatest(F.size("ids") - i - 1, F.lit(0)),
                        ),
                        lambda y: F.struct(
                            x.alias("id_l"), y.alias("id_r")
                        ),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select("p.id_l", "p.id_r")


def _bounded_pair_expansion(
    keys: DataFrame,
    max_block_size: int,
    tracker=None,
    assume_distinct_keys: bool = False,
) -> DataFrame:
    """candidate_pairs_from_keys without the terminal distinct: one
    (id_l < id_r) row PER KEY the pair co-occurs under. Multiplicity is
    meaningful — it is exactly the common-blocks-scheme weight
    metablocking.pair_key_weights aggregates — so this stays private to
    callers that know whether they want it (candidate_pairs_from_keys
    collapses it; pair weighting counts it)."""
    return expand_bounded_keys(
        gate_oversized_keys(keys, max_block_size, tracker, assume_distinct_keys)
    )


def pair_budget_curve(
    offers: DataFrame,
    thresholds: tuple[int, ...] | list[int],
    min_df: int = DEFAULT_MIN_DF,
    max_df_frac: float = DEFAULT_MAX_DF_FRAC,
    max_block_size: int = DEFAULT_MAX_BLOCK_SIZE,
    group_col: str = "category",
) -> DataFrame:
    """Per ``max_rare_df`` threshold: EXACT pair-expansion cost of the
    rare-token key family, from token dfs alone — no keys materialized, no
    pairs expanded.

    For a threshold t, every (group, token) key with
    max(2, min_df) ≤ df ≤ min(t, max_block_size, max_df_frac·|group|)
    expands to df·(df−1)/2 rows in candidate_pairs_from_keys (the
    pre-``distinct`` output of the combination generator; keys past
    max_block_size are dropped there, keys under 2 emit nothing). That
    per-key sum — NOT the post-dedup distinct-pair count — is the cost a
    budget must bound at web scale: it is the row count the pair-expansion
    stage emits and the ``distinct`` must shuffle, the quantity that
    explodes when a threshold is set generously on a 10^12-page corpus.

    Returns one row per threshold that admits ≥1 key:
    (max_rare_df, n_keys, est_pairs). Thresholds admitting no key emit no
    row (callers treat absence as zero cost).

    Scale: the same one-pass explode + groupBy df computation the blocking
    stage itself runs, then an O(vocab × len(thresholds)) map-side explode
    into a partial-aggregable groupBy on the tiny threshold key — no
    global window, no driver collect.
    """
    ts = sorted({int(t) for t in thresholds})
    if not ts:
        raise ValueError("thresholds must be non-empty")
    gn = "_gnorm"
    base = build_title_for_ts(offers).withColumn(
        gn, F.coalesce(F.col(group_col).cast("string"), F.lit("\x00<null>"))
    )
    toks = base.select(gn, F.explode("tokens").alias("token"))
    group_sizes = base.groupBy(gn).agg(F.count("*").alias("_n"))
    eligible = (
        toks.groupBy(gn, "token")
        .agg(F.count("*").alias("df"))
        .join(group_sizes, gn)
        .where(
            (F.col("df") >= F.lit(max(2, min_df)))
            & (F.col("df") <= (F.col("_n") * F.lit(max_df_frac)))
            & (F.col("df") <= F.lit(max_block_size))
        )
        .select("df")
    )
    return (
        eligible.select(
            F.explode(F.array(*[F.lit(t) for t in ts])).alias("max_rare_df"),
            "df",
        )
        .where(F.col("df") <= F.col("max_rare_df"))
        .groupBy("max_rare_df")
        .agg(
            F.count("*").alias("n_keys"),
            F.expr("sum(df * (df - 1) DIV 2)").alias("est_pairs"),
        )
    )


def choose_max_rare_df(
    offers: DataFrame,
    pair_budget: int,
    thresholds: tuple[int, ...] | list[int] = (2, 3, 5, 8, 13, 21, 34, 55, 89),
    min_df: int = DEFAULT_MIN_DF,
    max_df_frac: float = DEFAULT_MAX_DF_FRAC,
    max_block_size: int = DEFAULT_MAX_BLOCK_SIZE,
    group_col: str = "category",
) -> tuple[int, list[dict]]:
    """Pick the largest candidate ``max_rare_df`` whose estimated rare-token
    pair-expansion cost fits ``pair_budget``; returns (threshold, curve).

    Recall grows with the threshold (every key admitted at t is admitted at
    t' > t), so the largest affordable threshold dominates the smaller
    ones. If even the smallest candidate exceeds the budget, that smallest
    candidate is returned — blocking always needs SOME threshold; the
    overrun is visible in the returned curve (est_pairs > pair_budget) and
    it is the caller's decision to tighten max_block_size instead.

    The collect is len(thresholds) rows — a planning decision, not a data
    path. The curve is returned (and recorded by run_pipeline) so the
    decision is auditable after the fact.
    """
    curve_df = pair_budget_curve(
        offers, thresholds,
        min_df=min_df, max_df_frac=max_df_frac,
        max_block_size=max_block_size, group_col=group_col,
    )
    by_t = {int(r["max_rare_df"]): r.asDict() for r in curve_df.collect()}
    ts = sorted({int(t) for t in thresholds})
    curve = [
        by_t.get(t, {"max_rare_df": t, "n_keys": 0, "est_pairs": 0})
        for t in ts
    ]
    affordable = [
        c["max_rare_df"] for c in curve if c["est_pairs"] <= pair_budget
    ]
    return (max(affordable) if affordable else ts[0]), curve


def block_offers(
    offers: DataFrame,
    min_df: int = DEFAULT_MIN_DF,
    max_df_frac: float = DEFAULT_MAX_DF_FRAC,
    max_rare_df: int | None = None,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    max_block_size: int = DEFAULT_MAX_BLOCK_SIZE,
    use_lsh: bool = True,
    exclude_cluster_ids: DataFrame | None = None,
    tracker=None,
    sn_window: int | None = None,
    sn_key_chars: int = 12,
    meta_prune: str | None = None,
) -> DataFrame:
    """offers → candidate pairs (id_l, id_r), id_l < id_r, distinct.

    exclude_cluster_ids: optional single-column DF of cluster ids to anti-join
    away before blocking (the reference's GS exclusion, J4 — only meaningful
    on corpora that carry a cluster_id column).

    sn_window: optional third blocking pass — sorted-neighborhood pairs
    (sorted_neighborhood_pairs) over the first ``sn_key_chars`` characters
    of the whitespace-normalized title, unioned with the key-based
    candidates. Catches near-misses that share NO surviving token key
    (every shared token pruned as too-common, typos inside every rare
    token) at a guaranteed-linear |corpus|·window extra pair budget.

    meta_prune: optional meta-blocking pass (operators/metablocking) over
    the key-based candidates — ``"wep"`` (global-mean edge pruning) or
    ``"wnp"`` (node-local mean pruning). Weights aggregate the SAME pair
    expansion the plain path distincts, so turning this on swaps the
    distinct for a count groupBy plus the prune — it never re-runs key
    generation. Applies only to key-based pairs; sorted-neighborhood
    pairs (which carry no key-co-occurrence weight) union in after.
    """
    if meta_prune not in (None, "wep", "wnp"):
        raise ValueError(f"meta_prune must be wep|wnp|None, got {meta_prune!r}")
    if exclude_cluster_ids is not None and "cluster_id" in offers.columns:
        offers = offers.join(
            F.broadcast(exclude_cluster_ids.select("cluster_id").distinct()),
            "cluster_id",
            "left_anti",
        )
    tokenized = build_title_for_ts(offers)
    pruned = prune_tokens_by_df(tokenized, min_df, max_df_frac, narrow=True)
    if use_lsh:
        # Two key-generation branches consume `pruned` with different
        # projections before their first shuffles, so exchange reuse cannot
        # apply — without a lineage cut each branch re-runs the tokenize +
        # df-prune pipeline (explode + groupBy + join back over the corpus).
        # One eager materialization, read twice. Bench-neutral at 20k pages
        # (the pipeline is cheap there); at corpus scale one local-disk
        # write beats re-running a corpus-wide shuffle pipeline per branch.
        pruned = pruned.localCheckpoint(eager=True)
    rare = rare_token_keys(pruned, max_rare_df or max_block_size)
    lsh = minhash_band_keys(pruned, num_hashes, bands) if use_lsh else None
    keys = rare.unionByName(lsh) if lsh is not None else rare
    if meta_prune:
        from .metablocking import (
            pair_key_weights,
            prune_pairs_wep,
            prune_pairs_wnp,
        )

        weighted = pair_key_weights(
            keys, max_block_size, tracker=tracker, assume_distinct_keys=True
        )
        pruner = prune_pairs_wep if meta_prune == "wep" else prune_pairs_wnp
        pairs = pruner(weighted).select("id_l", "id_r")
    elif (max_rare_df or max_block_size) <= max_block_size and tracker is None:
        # Rare-token keys are size-bounded BY CONSTRUCTION (a key's id count
        # is its token df, filtered to ≤ max_rare_df ≤ max_block_size), so
        # the count+semi-join gate proves nothing for them: only the LSH
        # band family (unbounded — thousands of near-identical token sets
        # can share a band) goes through the gate. A df=1 key expands to
        # zero pairs either way, so skipping the n≥2 half of the gate is
        # also result-neutral. Guide §2.4: remove shuffles the data's own
        # invariants make redundant. Tracker runs keep the single gated
        # pass — its drop counters ride the one sizes aggregate (rare keys
        # never trip them under this bound, so totals are identical).
        gated = (
            gate_oversized_keys(
                lsh, max_block_size, assume_distinct_keys=True
            )
            if lsh is not None
            else None
        )
        all_keys = rare.unionByName(gated) if gated is not None else rare
        pairs = expand_bounded_keys(all_keys).distinct()
    else:
        pairs = candidate_pairs_from_keys(
            keys, max_block_size, tracker=tracker, assume_distinct_keys=True
        )
    if sn_window:
        from ..functions.text import lower_ws_normalize

        keyed = offers.select(
            "id",
            F.substring(
                lower_ws_normalize(F.coalesce(F.col("title"), F.lit(""))),
                1,
                sn_key_chars,
            ).alias("key"),
        )
        pairs = pairs.unionByName(
            sorted_neighborhood_pairs(keyed, sn_window)
        ).distinct()
    return pairs


def sorted_neighborhood_pairs(
    keyed: DataFrame, window: int, id_col: str = "id", key_col: str = "key"
) -> DataFrame:
    """Sorted-neighborhood blocking: (id, key) → candidate pairs whose rank
    distance under the (key, id) total order is ≤ ``window``.

    The third classic blocking family (Hernández & Stolfo's merge/purge,
    SIGMOD 1995 — public algorithm) beside this module's rare-token and
    MinHash-LSH keys: instead of equality buckets, sort the corpus by a
    fuzzy key (e.g. a normalized-title prefix) and pair every record with
    its ``window`` successors — catching near-misses that share no exact
    key (typos past the prefix, reordered tokens) at a guaranteed-linear
    pair budget of |corpus|·window.

    Scale shape: a single-partition global window over 10^12 rows is the
    obvious wrong plan, so the global rank is computed as range-sort +
    per-partition local rank + a partition-count-bounded offset collect
    (one row per partition — a scalar-class driver round-trip), exactly the
    distributed ranking a real cluster needs. Pairing then needs no window
    function at all: with block = rank div window, a successor within
    ``window`` ranks lives in the same or the next block, so each row
    equi-joins against exactly two block keys — shuffle on a dense integer
    key, no skew (blocks have ≤ window rows by construction), no range join.

    Output: distinct (id_l < id_r) canonical pairs, same contract as
    candidate_pairs_from_keys. Ties in ``key`` are totally ordered by id,
    so the output is deterministic at any partition count.
    """
    spark = keyed.sparkSession
    src = keyed.select(F.col(id_col).alias("id"), F.col(key_col).alias("key"))
    n_parts = spark.sparkContext.defaultParallelism
    # Freeze spark_partition_id() as DATA before the window: the window's
    # own exchange re-evaluates expressions, so partitioning the window by
    # the live spark_partition_id() would rank against the post-shuffle
    # partition layout, not the range-sorted one. localCheckpoint
    # materializes the range layout's partition ids as an ordinary column.
    parted = (
        src.repartitionByRange(n_parts, "key", "id")
        .withColumn("_part", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    ranked_local = parted.select(
        "id",
        "_part",
        (F.row_number().over(
            Window.partitionBy("_part").orderBy("key", "id")
        ) - 1).alias("_local_rn"),
    )
    # one row per partition — bounded by the partition count, not the data
    counts = {
        r["_part"]: r["_n"]
        for r in parted.groupBy("_part").agg(F.count("*").alias("_n")).collect()
    }
    offsets, acc = {}, 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    off_df = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "_part int, _off long"
        )
    )
    ranked = ranked_local.join(off_df, "_part").select(
        "id", (F.col("_local_rn") + F.col("_off")).alias("rn")
    )
    ranked = ranked.localCheckpoint(eager=True)
    blk = F.floor(F.col("rn") / F.lit(window))
    left = ranked.select("id", "rn", blk.alias("_blk"))
    right = ranked.select(
        F.col("id").alias("_rid"),
        F.col("rn").alias("_rrn"),
        F.explode(F.array(blk, blk - 1)).alias("_blk"),
    )
    pairs = (
        left.join(right, "_blk")
        .where(
            (F.col("_rrn") > F.col("rn"))
            & (F.col("_rrn") <= F.col("rn") + window)
        )
        .select(
            F.least("id", "_rid").alias("id_l"),
            F.greatest("id", "_rid").alias("id_r"),
        )
        .distinct()
    )
    return pairs
