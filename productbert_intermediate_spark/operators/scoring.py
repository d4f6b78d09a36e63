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
    "bias": -5.274684,
    "emb_cos": 3.223317,
    "jw_title": -2.588305,
    "lev_title": 0.136982,
    "jac_tokens": 3.140547,
    "digit_jac": 8.362032,
    "brand_match": 0.655505,
    "price_sim": -0.914059,
}

# JVM-features-only preset: the two pandas-UDF features (embedding cosine,
# Jaro-Winkler) contribute weight 0, so logit/score/match become closed-form
# over levenshtein/jaccard/brand/price — every term SQL-expressible, which
# lets an external SQL engine mirror the scorer's full decision arithmetic
# exactly (the driver's er_score_pairs_jvm oracle). Adding 0·x to the fold
# is bit-exact (±0.0), so the remaining terms accumulate in the same IEEE
# order as the full scorer's fold.
JVM_ONLY_WEIGHTS: dict[str, float] = {
    **DEFAULT_WEIGHTS,
    "emb_cos": 0.0,
    "jw_title": 0.0,
}


def prepare_offers_for_scoring(offers: DataFrame) -> DataFrame:
    """Precompute per-offer scoring inputs ONCE (not once per pair):

    * ``_btext``  — blocking text (title + first-5 desc tokens, lowered)
    * ``_toks`` / ``_dtoks`` — token set and digit-bearing token set

    Embeddings are deliberately NOT materialized as a column: a 2KB vector
    per offer turns every downstream join/shuffle into a bandwidth problem
    and (if broadcast) a serial driver bottleneck. The embedding is instead
    recomputed from ``_btext`` inside the pair-scoring UDF behind a
    per-executor text→vector memo, so the Python cost stays O(distinct
    offers) while only ~100-byte strings flow through the shuffles.
    """
    title = F.coalesce(F.col("title"), F.lit(""))
    desc5 = token_prefix(F.coalesce(F.col("description"), F.lit("")), 5)
    btext = F.lower(F.concat_ws(" ", title, desc5))
    out = offers.withColumn("_btext", btext)
    out = out.withColumn("_toks", token_set(F.col("_btext")))
    out = out.withColumn(
        "_dtoks", F.filter("_toks", lambda t: t.rlike(r"\d"))
    )
    # lowered title / brand are per-OFFER values the pair features read on
    # both sides — lower once here, not once per pair side (lower(NULL) is
    # NULL, so the brand_match null check is unchanged)
    out = out.withColumn(
        "_lt", F.lower(F.coalesce(F.col("title"), F.lit("")))
    ).withColumn("_lb", F.lower(F.col("brand")) if "brand" in offers.columns
                 else F.lit(None).cast("string"))
    # Parsed price is a PER-OFFER value: run the locale regex chain once
    # per offer here instead of once per pair side downstream (the
    # candidate:offer ratio is 10-100x; measured ~1s of the 4.5s feature
    # stage at 1.14M pairs). Same expression ⇒ identical doubles.
    pv = (
        _price_value("price")
        if "price" in offers.columns
        else F.lit(None).cast("double")
    )
    return out.withColumn("_pv", pv)


def hydrate_pairs(
    pairs: DataFrame,
    offers: DataFrame,
    broadcast_offers: bool = False,
    prepared: bool = False,
    attrs: tuple[str, ...] = PAIR_ATTRS,
    prepared_cols: tuple[str, ...] = ("_btext", "_toks", "_dtoks"),
) -> DataFrame:
    """(id_l, id_r) → + {attr}_left/{attr}_right columns (J1, two equi-joins).

    prepared=True also carries the per-offer scoring columns from
    prepare_offers_for_scoring through both joins. ``attrs``/``prepared_cols``
    narrow the hydrated columns — long text fields a caller doesn't need
    should never transit the join (or the broadcast) at all.
    """
    extra = prepared_cols if prepared else ()
    # Both joins consume the SAME side subplan; the per-side renames happen
    # AFTER the join, so the two exchanges canonicalize equal and Spark's
    # ReuseExchange materializes the side ONCE (one driver-serial broadcast
    # build — or one shuffle write — instead of two). Renaming before the
    # join defeats this: the exchanges differ and both run.
    side = offers.select("id", *attrs, *extra)
    lhs = side.alias("_hyd_l")
    rhs = side.alias("_hyd_r")
    if broadcast_offers:
        lhs, rhs = F.broadcast(lhs), F.broadcast(rhs)
    p = pairs.alias("_hyd_p")
    return (
        p.join(lhs, F.col("_hyd_p.id_l") == F.col("_hyd_l.id"))
        .join(rhs, F.col("_hyd_p.id_r") == F.col("_hyd_r.id"))
        .select(
            F.col("_hyd_p.*"),
            *[F.col(f"_hyd_l.{a}").alias(f"{a}_left") for a in (*attrs, *extra)],
            *[F.col(f"_hyd_r.{a}").alias(f"{a}_right") for a in (*attrs, *extra)],
        )
    )


def hydrate_pairs_salted(
    pairs: DataFrame,
    offers: DataFrame,
    n_salts: int = 8,
    hot_threshold: int = 100_000,
    prepared: bool = False,
    attrs: tuple[str, ...] = PAIR_ATTRS,
    prepared_cols: tuple[str, ...] = ("_btext", "_toks", "_dtoks"),
) -> DataFrame:
    """hydrate_pairs with differential hot-id salting (operators/skew.py).

    Same output as hydrate_pairs (row-for-row, asserted in tests/test_skew
    .py), but an id whose SUMMED appearance count across both pair sides
    exceeds ``hot_threshold`` is spread over ``n_salts`` shuffle partitions
    in both hydration joins instead of landing whole in one. The count runs
    over the union of the id_l and id_r columns — so 60k left + 60k right
    trips a 100k threshold (deliberately conservative: salting a warm key
    costs one extra dim replica row; missing a hot one costs a straggler) —
    and ONE salted offers subplan then serves both joins; as in
    hydrate_pairs, the per-side renames happen after the joins, so
    ReuseExchange materializes that subplan once.

    Use on the streamed (non-broadcast) path only: a broadcast hydration
    join has no shuffle to skew.
    """
    from .skew import hot_keys, salt_dim, salted_skew_join

    extra = prepared_cols if prepared else ()
    side = offers.select("id", *attrs, *extra)
    pair_ids = pairs.select(F.col("id_l").alias("_pid")).unionByName(
        pairs.select(F.col("id_r").alias("_pid"))
    )
    # Four consumers (two dim probes + two fact taggings) would each re-run
    # the pair-id count without this cut; the hot set is bounded tiny
    # (≤ 2·|pairs| / hot_threshold rows), so materialize it once.
    hot = hot_keys(pair_ids, "_pid", hot_threshold).localCheckpoint(eager=True)
    salted = salt_dim(side, "id", hot, n_salts)
    pair_cols = pairs.columns
    hyd = (*attrs, *extra)
    step1 = salted_skew_join(
        pairs.alias("_hyd_p"),
        None,
        "id_l",
        dim_key="id",
        n_salts=n_salts,
        spread_cols=("id_r",),
        salted_dim=salted.alias("_hyd_l"),
        hot=hot,
    )
    # Rename the left side's hydrated columns NOW (fresh attribute ids, dim
    # `id` dropped): both joins descend from the same `salted` plan, and
    # without this the second join's dim references are ambiguous self-join
    # attributes. The rename sits on the FACT side of join 2 — the dim-side
    # exchange under both joins is still the identical `salted` shuffle, so
    # ReuseExchange is unaffected.
    left = step1.select(
        *pair_cols,
        *[F.col(f"_hyd_l.{a}").alias(f"{a}_left") for a in hyd],
    )
    step2 = salted_skew_join(
        left,
        None,
        "id_r",
        dim_key="id",
        n_salts=n_salts,
        spread_cols=("id_l",),
        salted_dim=salted.alias("_hyd_r"),
        hot=hot,
    )
    return step2.select(
        *pair_cols,
        *[f"{a}_left" for a in hyd],
        *[F.col(f"_hyd_r.{a}").alias(f"{a}_right") for a in hyd],
    )


def build_sequence(side: str):
    """brand+' '+title+' '+description+' '+spec after per-attr truncation."""
    cols = []
    for attr in ("brand", "title", "description", "specTableContent"):
        c = F.coalesce(F.col(f"{attr}_{side}"), F.lit(""))
        cols.append(token_prefix(c, _CUTS[attr]))
    return F.concat_ws(" ", *cols)


def _blocking_text_expr(title_col: str, desc_col: str, desc_tokens: int = 5):
    """ONE definition of the discriminative pair text — the per-pair
    (suffixed) and per-offer variants below must stay byte-identical or
    the encoder's tokenize-once path silently drifts from its text twin."""
    title = F.coalesce(F.col(title_col), F.lit(""))
    desc5 = token_prefix(F.coalesce(F.col(desc_col), F.lit("")), desc_tokens)
    return F.lower(F.concat_ws(" ", title, desc5))


def blocking_text(side: str, desc_tokens: int = 5):
    """title + first-5 description tokens, lowered — the reference's
    discriminative pair text (title_for_ts, sample_intermediate_training_
    sets.py:197-205). Full descriptions drown the entity signal in
    boilerplate, so similarity features are computed on this text while the
    full truncated sequence remains available via build_sequence."""
    return _blocking_text_expr(
        f"title_{side}", f"description_{side}", desc_tokens
    )


def offer_blocking_text(desc_tokens: int = 5):
    """blocking_text over the raw (pre-hydration) offer columns — used to
    compute per-OFFER state once (vocabulary corpus, pretokenized encoder
    ids) instead of once per pair side."""
    return _blocking_text_expr("title", "description", desc_tokens)


# Shared feature-column builders: pair_features (the calibration-time path,
# scripts/calibrate.py fits DEFAULT_WEIGHTS on these) and
# build_pair_features_narrow (the scoring-time path) MUST compute identical
# expressions, or calibrated weights silently stop matching the features
# they are applied to. One definition each, used by both.


def _price_value(col_name: str):
    """Price string → double, locale-robust (WDC prices are multi-locale).

    Deterministic disambiguation over the first numeric run:

    * both ``.`` and ``,`` present → the LAST-occurring separator is the
      decimal mark, the other is grouping ("1.234,56" → 1234.56,
      "1,234.56" → 1234.56);
    * comma only → decimal iff a single comma with 1-2 trailing digits
      ("12,99" → 12.99), else grouping ("1,234" → 1234);
    * dot only → grouping iff repeated ("1.234.567" → 1234567), else
      decimal ("9.99" — a lone "1.234" reads as the en-locale 1.234; with
      no currency hint the en default is the documented tie-break);
    * unparseable → NULL (the 0.5-neutral feature fallback downstream).
    """
    # Perf note: this chain costs ~2.4s of a 22s features stage at 2.65M
    # pairs vs the old strip-everything parser (interleaved A/B, min-of-4);
    # a fast-path guard (skip the chain when the numeric run has no comma
    # and ≤1 dot) measured SLOWER than the plain chain — branch predicates
    # are paid on every row while codegen already short-circuits the
    # when-chain — so the unguarded form stands.
    s = F.coalesce(F.col(col_name), F.lit(""))
    # Join space/NBSP/narrow-NBSP/thin-space digit GROUPING ("1 234,56" —
    # fr/ru WDC locales) into one contiguous run BEFORE extraction:
    # otherwise the numeric run stops at the space and "1 234,56" parses to
    # the confidently-wrong 1.0. Strictly 3-digit groups only, so "2 for
    # 10.99" ("10" is not a group) keeps its separate numbers.
    s = F.regexp_replace(
        s,
        "(?<=[0-9])[ \\x{00A0}\\x{202F}\\x{2009}](?=[0-9]{3}([^0-9]|$))",
        "",
    )
    core = F.regexp_extract(s, r"([0-9][0-9.,]*)", 1)
    # ",[^.]*$" ⟺ some comma has no dot after it ⟺ comma occurs last
    comma_decimal_both = core.rlike(r"\.") & core.rlike(r",[^.]*$")
    comma_decimal_only = ~core.rlike(r"\.") & core.rlike(r"^[0-9]+,[0-9]{1,2}$")
    cleaned = (
        F.when(
            comma_decimal_both | comma_decimal_only,
            F.replace(
                F.replace(core, F.lit("."), F.lit("")), F.lit(","), F.lit(".")
            ),
        )
        .when(core.rlike(r"\..*\."), F.regexp_replace(core, r"[.,]", ""))
        .otherwise(F.replace(core, F.lit(","), F.lit("")))
    )
    return F.when(cleaned.rlike(r"^[0-9]+(\.[0-9]+)?$"), cleaned.cast("double"))


def _price_sim_from_values(pl, pr):
    """price_sim over ALREADY-parsed price doubles (one _price_value per
    offer in prepare_offers_for_scoring, not one per pair side)."""
    return F.when(pl.isNull() | pr.isNull(), 0.5).otherwise(
        1.0 - F.least(F.lit(1.0), F.abs(pl - pr) / F.greatest(pl, pr, F.lit(1e-9)))
    )


def _price_sim_col():
    return _price_sim_from_values(
        _price_value("price_left"), _price_value("price_right")
    )


def _brand_match_col():
    return F.when(
        F.col("brand_left").isNull() | F.col("brand_right").isNull(), 0.5
    ).otherwise((F.lower("brand_left") == F.lower("brand_right")).cast("double"))


def _digit_jac_col(dtoks_l, dtoks_r):
    # jaccard over digit-bearing tokens: product codes / MPNs are the
    # highest-precision match signal in product ER (the reference's corpus
    # carries them inside titles; matching papers key on them)
    return F.when(
        (F.size(dtoks_l) == 0) & (F.size(dtoks_r) == 0), 0.5
    ).otherwise(token_jaccard(dtoks_l, dtoks_r))


def pair_features(hydrated: DataFrame) -> DataFrame:
    """Add the FEATURES columns to a hydrated pair table.

    Accepts either a plain hydrated table (attrs only — per-offer inputs are
    derived in-plan) or one hydrated with prepared=True (per-offer embedding
    and token sets carried through the join; the fast path).
    """
    prepared = "_btext_left" in hydrated.columns
    if prepared:
        df = hydrated
        seq_l, seq_r = F.col("_btext_left"), F.col("_btext_right")
        toks_l, toks_r = F.col("_toks_left"), F.col("_toks_right")
        dtoks_l, dtoks_r = F.col("_dtoks_left"), F.col("_dtoks_right")
        emb_cos = embedding_cosine_udf(seq_l, seq_r)
    else:
        df = hydrated.withColumn("_seq_l", blocking_text("left")).withColumn(
            "_seq_r", blocking_text("right")
        )
        seq_l, seq_r = F.col("_seq_l"), F.col("_seq_r")
        toks_l, toks_r = token_set(seq_l), token_set(seq_r)
        dtoks_l = F.filter(token_set(seq_l), lambda t: t.rlike(r"\d"))
        dtoks_r = F.filter(token_set(seq_r), lambda t: t.rlike(r"\d"))
        emb_cos = embedding_cosine_udf(seq_l, seq_r)

    title_l = F.coalesce(F.col("title_left"), F.lit(""))
    title_r = F.coalesce(F.col("title_right"), F.lit(""))
    df = (
        df.withColumn("emb_cos", emb_cos)
        .withColumn("jw_title", jaro_winkler_udf(F.lower(title_l), F.lower(title_r)))
        .withColumn("lev_title", levenshtein_norm(F.lower(title_l), F.lower(title_r)))
        .withColumn("jac_tokens", token_jaccard(toks_l, toks_r))
        .withColumn("digit_jac", _digit_jac_col(dtoks_l, dtoks_r))
        .withColumn("brand_match", _brand_match_col())
        .withColumn("price_sim", _price_sim_col())
    )
    drop_cols = [c for c in ("_seq_l", "_seq_r") if c in df.columns]
    drop_cols += [
        c
        for c in df.columns
        if c.startswith(("_btext", "_emb", "_toks", "_dtoks", "_pv"))
    ]
    return df.drop(*drop_cols)


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


# Above this many offers, the per-executor text index is no longer
# broadcastable and pair texts ship through the Arrow channel instead.
# Sized by bytes, not wishful thinking: an index row is ~120B of blocking
# text + 1KB of float32 embedding (dim 256), so 300k offers ≈ 350MB — well
# inside Spark's broadcast limit and a 8-16GB driver heap. The same bound
# gates the hydration-join broadcast (prepared offers carry token arrays,
# ~0.5KB/row → ~150MB).
TEXT_BROADCAST_MAX_OFFERS = 300_000


# Above this many offers the index embeddings are computed distributed
# (mapInPandas) instead of on the driver. Crossover measured at 57k offers
# on local[32]: driver embed ≈ 3s serial vs distributed ≈ embed/cores +
# ~1.3s Arrow transfer+assembly — the driver path wins small corpora, the
# distributed path wins as soon as serial embed time exceeds the fixed
# transfer cost (and removes a linear-in-corpus serial floor at scale).
INDEX_DISTRIBUTED_EMBED_MIN_OFFERS = 100_000


def build_text_index_broadcast(offers: DataFrame, n_offers: int | None = None):
    """Collect the per-offer scoring index (ids, float32 embeddings, texts,
    title lengths) and broadcast it. One-time setup per scoring run — the
    analog of loading the frozen matcher before the eval loop.

    Beyond INDEX_DISTRIBUTED_EMBED_MIN_OFFERS offers, embeddings are
    computed DISTRIBUTED (mapInPandas, float32 bytes through Arrow) and
    only assembled on the driver — driver-side embedding is a serial floor
    that grows linearly with the corpus. embed_texts is row-local
    (per-text feature hashing, per-row normalization), so both paths are
    bit-identical at any batch shape (pinned by test).
    """
    import numpy as np

    from ..functions.similarity import (
        EMBED_DIM,
        build_offer_text_index,
        embed_texts,
    )

    prepped = prepare_offers_for_scoring(offers)
    sel = prepped.select(
        "id",
        "_btext",
        F.length(F.lower(F.coalesce("title", F.lit("")))).alias("_tl"),
    )
    if n_offers is None:
        n_offers = offers.count()
    if n_offers < INDEX_DISTRIBUTED_EMBED_MIN_OFFERS:
        pdf = sel.toPandas()
        index = build_offer_text_index(
            pdf["id"].to_numpy(),
            pdf["_btext"].tolist(),
            pdf["_tl"].fillna(0).to_numpy(),
        )
        return offers.sparkSession.sparkContext.broadcast(index)

    def _embed(batches):  # pragma: no cover - executed by Spark
        import pandas as pd

        for pdf in batches:
            vecs = embed_texts(pdf["_btext"].tolist()).astype(np.float32)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "_btext": pdf["_btext"],
                    "_tl": pdf["_tl"].fillna(0).astype("int32"),
                    "_emb": [v.tobytes() for v in vecs],
                }
            )

    pdf = sel.mapInPandas(
        _embed, schema="id long, _btext string, _tl int, _emb binary"
    ).toPandas()
    order = np.argsort(pdf["id"].to_numpy())
    sorted_ids = pdf["id"].to_numpy()[order]
    texts = [t or "" for t in pdf["_btext"].tolist()]
    texts = [texts[i] for i in order]
    blobs = pdf["_emb"].to_numpy()[order]
    emb = (
        np.frombuffer(b"".join(blobs), dtype=np.float32).reshape(
            len(sorted_ids), EMBED_DIM
        )
        if len(sorted_ids)
        else np.zeros((0, EMBED_DIM), dtype=np.float32)
    )
    index = {
        "ids": sorted_ids,
        "emb": emb,
        "texts": texts,
        "tlens": pdf["_tl"].to_numpy()[order].astype(np.int32),
    }
    return offers.sparkSession.sparkContext.broadcast(index)


def score_candidates(
    pairs: DataFrame,
    offers: DataFrame,
    weights: dict[str, float] | None = None,
    broadcast_offers: bool = False,
    feature_partitions: int | None = None,
    use_text_broadcast: bool | None = None,
    text_index_broadcast=None,
    n_offers: int | None = None,
    salt_hot_ids: tuple[int, int] | None = None,
) -> DataFrame:
    """Full scoring stage, shuffle- and Python-lean:

    1. per-offer inputs once (blocking text + token sets, all JVM);
    2. hydration joins; every JVM feature (levenshtein, token/digit jaccard,
       brand, price) is computed IN the join output projection;
    3. project down to ids + features and repartition explicitly — AQE would
       coalesce this CPU-bound stage to one task by byte size; a user
       repartition pins the parallelism;
    4. ONE pandas UDF computes embedding-cosine + Jaro-Winkler per pair.
       Two text-delivery strategies:
         * broadcast (default when |offers| ≤ TEXT_BROADCAST_MAX_OFFERS):
           an id→(text, title_len) dict is broadcast once and only TWO LONG
           IDS cross the Arrow boundary per pair — measured ~2.5× faster at
           local[32] because JVM-side string serialization otherwise starves
           the Python workers;
         * streamed (the 10^12-doc path): pair texts flow through Arrow.
    5. calibrated logistic score, 0.5 threshold.

    Output: (id_l, id_r, *FEATURES, logit, score, match) — narrow by design;
    downstream stages (clustering, metrics) never need the attribute text.
    """
    if use_text_broadcast is None and text_index_broadcast is None:
        # Callers that already know the offer count (pipeline stages read it
        # from the checkpoint manifest) pass n_offers and skip the extra job.
        if n_offers is None:
            n_offers = offers.count()
        use_text_broadcast = n_offers <= TEXT_BROADCAST_MAX_OFFERS
    small_offers = text_index_broadcast is not None or bool(use_text_broadcast)
    if small_offers and text_index_broadcast is None:
        text_index_broadcast = build_text_index_broadcast(offers, n_offers=n_offers)
    narrow = build_pair_features_narrow(
        pairs,
        offers,
        keep_texts=not small_offers,
        broadcast_offers=broadcast_offers or small_offers,
        feature_partitions=feature_partitions,
        salt_hot_ids=salt_hot_ids,
    )
    return apply_pair_scorer(
        narrow, text_index_broadcast if small_offers else None, weights
    )


def build_pair_features_narrow(
    pairs: DataFrame,
    offers: DataFrame,
    keep_texts: bool = False,
    broadcast_offers: bool = False,
    feature_partitions: int | None = None,
    salt_hot_ids: tuple[int, int] | None = None,
) -> DataFrame:
    """Candidate pairs → narrow per-pair feature table (ids, JVM features,
    and — when keep_texts — the pair texts for the streamed scorer).

    salt_hot_ids=(n_salts, hot_threshold) opts the streamed path into
    differential hot-id salting: the source repartition spreads by pair
    hash instead of id_l (a hot id_l would otherwise concentrate in one
    partition by construction), and the hydration joins run through
    hydrate_pairs_salted. Ignored on the broadcast path (no shuffle).
    """
    spark = pairs.sparkSession
    n_parts = feature_partitions or spark.sparkContext.defaultParallelism * 2
    # pin parallelism at the SOURCE: the candidate table usually arrives
    # AQE-coalesced to few partitions, which would serialize the hydrate map
    # side and everything fused after it.
    salting = salt_hot_ids is not None and not broadcast_offers
    if salting:
        from .skew import salted_repartition_pairs

        pairs = salted_repartition_pairs(pairs, n_parts)
    else:
        pairs = pairs.repartition(n_parts, "id_l")
    prepped = prepare_offers_for_scoring(offers)
    # hydrate ONLY what the feature projection reads: the precomputed
    # lowered title/brand, token sets and the pre-parsed price double
    # (_pv — the raw price string and its regex chain stay per-offer) —
    # description/specTableContent (the long fields) and, on the id-keyed
    # path, _btext never enter the join or the broadcast. This is most of
    # the broadcast's bytes and the dominant non-scaling (driver-serial)
    # cost of a scoring run.
    attrs: tuple[str, ...] = ()
    pcols = (
        ("_btext", "_toks", "_dtoks", "_pv", "_lt", "_lb")
        if keep_texts
        else ("_toks", "_dtoks", "_pv", "_lt", "_lb")
    )
    if salting:
        n_salts, hot_threshold = salt_hot_ids
        hydrated = hydrate_pairs_salted(
            pairs, prepped, n_salts=n_salts, hot_threshold=hot_threshold,
            prepared=True, attrs=attrs, prepared_cols=pcols,
        )
    else:
        hydrated = hydrate_pairs(
            pairs, prepped, broadcast_offers, prepared=True,
            attrs=attrs, prepared_cols=pcols,
        )

    title_l = F.col("_lt_left")
    title_r = F.col("_lt_right")
    passthrough = [c for c in pairs.columns if c not in ("id_l", "id_r")]
    text_cols = (
        [
            F.length(title_l).alias("_tl_l"),
            F.length(title_r).alias("_tl_r"),
            F.col("_btext_left").alias("_b_l"),
            F.col("_btext_right").alias("_b_r"),
        ]
        if keep_texts
        else []
    )
    brand_match = F.when(
        F.col("_lb_left").isNull() | F.col("_lb_right").isNull(), 0.5
    ).otherwise((F.col("_lb_left") == F.col("_lb_right")).cast("double"))
    narrow = hydrated.select(
        "id_l",
        "id_r",
        *passthrough,
        levenshtein_norm(title_l, title_r).alias("lev_title"),
        token_jaccard(F.col("_toks_left"), F.col("_toks_right")).alias("jac_tokens"),
        _digit_jac_col(F.col("_dtoks_left"), F.col("_dtoks_right")).alias("digit_jac"),
        brand_match.alias("brand_match"),
        _price_sim_from_values(
            F.col("_pv_left"), F.col("_pv_right")
        ).alias("price_sim"),
        *text_cols,
    )
    # Deliberate exchange between the JVM feature map and the Python stage:
    # fusing them was re-tested this round after the per-offer hoists
    # (price parse, lowering) and is BIMODAL on this box — 6.8-22.5s for
    # the fused stage vs a steady 6.8-8.0s decoupled (the single fused
    # task runs JVM producer and Python consumer concurrently per task,
    # oversubscribing the cores). The decoupled shape stands; rows are
    # ids + feature doubles (~60B), so the shuffle is cheap.
    return narrow.repartition(n_parts, "id_l", "id_r")


def apply_pair_scorer(
    narrow: DataFrame,
    text_index_broadcast=None,
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """The scorer stage proper: one pandas-UDF pass (embedding cosine +
    Jaro-Winkler) over a narrow pair-feature table, then the calibrated
    logistic threshold. Input rows carry (id_l, id_r, JVM features) and —
    in the streamed-text variant — the pair texts (_b_l/_b_r/_tl_l/_tl_r).

    This is the unit the north-rule throughput metric times:
    candidate-pairs-scored/second.
    """
    if text_index_broadcast is not None:
        from ..functions.similarity import make_id_pair_scores_udf

        udf = make_id_pair_scores_udf(text_index_broadcast)
        scored = narrow.withColumn("_ps", udf("id_l", "id_r"))
    else:
        from ..functions.similarity import pair_text_scores_udf

        scored = narrow.withColumn(
            "_ps", pair_text_scores_udf("_b_l", "_b_r", "_tl_l", "_tl_r")
        ).drop("_tl_l", "_tl_r", "_b_l", "_b_r")
    scored = (
        scored.withColumn("emb_cos", F.col("_ps.emb_cos"))
        .withColumn("jw_title", F.col("_ps.jw"))
        .drop("_ps")
    )
    return score_pairs(scored, weights)


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


# Fixed-point scale for distributed-calibration aggregations: per-row
# gradient/Hessian contributions are bounded by 1 (features and |p-y| live
# in [0,1]), so decimal(38,18) sums hold 10^20 rows without overflow while
# staying EXACT — integer/decimal addition is commutative, so the fitted
# weights are bit-identical at any partitioning, which float sums are not.
_CALIB_DECIMAL = "decimal(38,18)"


def fit_calibration_distributed(
    features_df: DataFrame,
    label_col: str = "label",
    iters: int = 25,
    l2: float = 1e-4,
    tol: float | None = 1e-9,
    stats: dict | None = None,
) -> dict[str, float]:
    """Distributed logistic calibration over a labeled pair-feature table.

    The driver-side ``fit_calibration`` is right for reference-sized gold
    sets (thousands of pairs); at the 100 TB design point labeled pairs
    arrive in the millions and the features must never funnel through the
    driver. This fits the SAME model (logistic + l2) with IRLS/Newton:
    each iteration aggregates the 8×8 Hessian ``XᵀRX`` and gradient
    ``Xᵀ(y−p)`` in ONE Spark job (44 decimal sums — partial-aggregable,
    map-side combined), and the driver solves the 8×8 system. ~15-25
    iterations reach the optimum GD needs thousands of steps for, so the
    serial floor is tens of jobs regardless of data size.

    Determinism: all row contributions are cast to decimal(38,18) before
    summation — exact, order-independent arithmetic — so the returned
    weights are bit-identical at any parallelism (the same device as the
    IVF trainer's fixed-point sums). Zero init; ``iters`` is the ceiling.

    Early stop (``tol``): the loop ends once the Newton step's max
    component |Δw| drops below ``tol``. The stop decision is itself
    parallelism-invariant — Δw is a driver-side function of the decimal
    aggregates, which are bit-identical at any partitioning — so early
    stop cuts the typical job count roughly in half without giving up the
    bit-identity guarantee. ``tol=None`` restores the fixed-count loop.
    The returned weights can differ from the fixed-count run only below
    ``tol`` (converged Newton steps shrink quadratically: once a step is
    < 1e-9 the remaining movement is far below any downstream use).

    ``stats``: optional dict the fitter fills with ``{"iters": <n run>}``
    so callers/tests can observe how many Spark jobs the loop spent.
    """
    import numpy as np

    cols = ["_bias", *FEATURES]
    base = features_df.select(
        F.lit(1.0).alias("_bias"),
        *[F.col(f) for f in FEATURES],
        F.col(label_col).cast("double").alias("_y"),
    )
    # NULL rows would silently skew the fit: F.sum skips NULL per-aggregate,
    # so a NULL label drops out of the gradient but not the Hessian or the
    # l2·n regularizer — an inconsistent Newton system. Filter them so every
    # aggregate and the row count see the same population (the driver-side
    # fitter on the same rows would propagate NaN and fail loudly instead).
    notnull = F.col("_y").isNotNull()
    for f in FEATURES:
        notnull = notnull & F.col(f).isNotNull()
    base = base.where(notnull)
    base = base.persist()
    try:
        w = np.zeros(len(cols))
        n = base.count()
        iters_run = 0
        for _ in range(iters):
            iters_run += 1
            logit = sum(
                (F.col(c) * float(w[i]) for i, c in enumerate(cols)),
                F.lit(0.0),
            )
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
            r = p * (F.lit(1.0) - p)
            aggs = []
            for i, ci in enumerate(cols):
                aggs.append(
                    F.sum((F.col(ci) * (F.col("_y") - p)).cast(_CALIB_DECIMAL))
                    .alias(f"g{i}")
                )
                for j, cj in enumerate(cols[: i + 1]):
                    aggs.append(
                        F.sum((F.col(ci) * F.col(cj) * r).cast(_CALIB_DECIMAL))
                        .alias(f"h{i}_{j}")
                    )
            row = base.agg(*aggs).collect()[0]
            g = np.array([float(row[f"g{i}"]) for i in range(len(cols))])
            H = np.zeros((len(cols), len(cols)))
            for i in range(len(cols)):
                for j in range(i + 1):
                    H[i, j] = H[j, i] = float(row[f"h{i}_{j}"])
            # same objective as fit_calibration: mean NLL + (l2/2)·|w|²
            # with the penalty on EVERY weight including bias — the two
            # fitters must converge to the same optimum
            reg = l2 * n * np.eye(len(cols))
            grad = g - l2 * n * w
            delta = np.linalg.solve(H + reg + 1e-9 * np.eye(len(cols)), grad)
            w = w + delta
            if tol is not None and float(np.max(np.abs(delta))) < tol:
                break
        if stats is not None:
            stats["iters"] = iters_run
        out = {"bias": float(w[0])}
        for i, feat in enumerate(FEATURES):
            out[feat] = float(w[i + 1])
        return out
    finally:
        base.unpersist()
