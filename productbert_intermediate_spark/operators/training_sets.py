"""Training-set construction: positives + negatives → labeled pair table.

Distributed re-expression of the reference's three-script stage
(/root/reference/src/processing/sample-training-sets/):

* positive pairs — within each ground-truth cluster, rank co-members by
  text similarity (>0), keep up to ``num_best``; "hard" positives are the
  LEAST similar tail, "random" positives a seeded pick from the rest
  (sample_intermediate_training_sets.py:27-91).
* negative pairs — per category, each query offer's top-``num_best`` most
  similar offers, drop sim ≥ 1.0 (near-exact copies), keep the best offer
  per candidate cluster (diversity), drop same-cluster; "hard" negatives
  are the MOST similar head, "random" negatives a seeded draw from the
  whole category excluding self/same-cluster/already-chosen (:93-190).
* hard/random split arithmetic — m = min(available, amount); m == 1 → all
  hard; odd m → hard = m//2 + 1; even → half/half
  (:63-76,157-168; process_intermediate_training_sets.py:19-40 re-applies
  the same formula when subselecting to 15/5 per offer).
* orientation dedup — one orientation per unordered pair
  (process_intermediate_training_sets.py:70-89; we keep the canonical
  (min,max) orientation — equal as a SET, the property the reference's
  insertion-order loop guarantees).
* seeded left/right swap + ``pair_id = "{l}#{r}"`` + GS exclusion in both
  orientations (build_intermediate_training_set.py:41-53).

Where the reference queries a per-category gensim index over ALL offers,
the distributed plan draws candidates from an EXACT threshold-similarity
join (operators/setsim.py — prefix filter, no false negatives above the
threshold) and ranks those; random negatives come from a seeded permutation
of the category with systematic probing — same distributional shape as the
reference's reject-resample loop, O(n log n + k·queries) instead of a
quadratic scan, deterministic under the seed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .setsim import jaccard_similarity_join


def _md5(col: Column) -> Column:
    return F.md5(F.encode(col, "utf-8"))


def hard_random_counts(available: Column, amount: int) -> tuple[Column, Column]:
    """The reference's split arithmetic: (n_hard, n_random) from availability."""
    m = F.least(available, F.lit(amount))
    hard = (
        F.when(m == 1, F.lit(1))
        .when(m % 2 == 1, F.floor(m / 2) + 1)
        .otherwise(F.floor(m / 2))
        .cast("long")
    )
    return hard, (m - hard).cast("long")


def token_cosine(a: Column, b: Column) -> Column:
    """Binary-vector cosine over token sets: |a∩b| / sqrt(|a|·|b|) — JVM-side
    stand-in for the reference's sparse TF cosine (deterministic; the
    selection pipeline, not gensim's float weights, is the parity target)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    denom = F.sqrt(F.size(a).cast("double") * F.size(b).cast("double"))
    return F.when(denom > 0, inter / denom).otherwise(F.lit(0.0))


def candidate_similarities(
    corpus: DataFrame,
    sim_threshold: float,
    group_col: str = "category",
    id_col: str = "id",
    toks_col: str = "tokens",
) -> DataFrame:
    """Both-orientation (query_id, cand_id, sim) pairs with jaccard ≥ threshold
    within group — exact via prefix filtering, the distributed analog of the
    reference's per-category similarity index probe."""
    und = jaccard_similarity_join(
        corpus, id_col, toks_col, sim_threshold, group_cols=[group_col]
    )
    fwd = und.select(
        F.col("id_a").alias("query_id"), F.col("id_b").alias("cand_id"),
        F.col("jaccard").alias("sim"),
    )
    rev = und.select(
        F.col("id_b").alias("query_id"), F.col("id_a").alias("cand_id"),
        F.col("jaccard").alias("sim"),
    )
    return fwd.unionByName(rev)


def hard_negative_pairs(
    corpus: DataFrame,
    candidates: DataFrame,
    amount: int = 20,
    num_best: int = 200,
) -> DataFrame:
    """The reference's negative filter chain over a candidate pool:

    top-num_best per query → drop sim ≥ 1.0 → best per candidate cluster →
    drop same-cluster → keep the n_hard MOST similar
    (sample_intermediate_training_sets.py:128-170).

    corpus must carry (id, cluster_id); candidates (query_id, cand_id, sim).
    Returns (query_id, cand_id, sim, rank).
    """
    meta = corpus.select(
        F.col("id"), F.col("cluster_id")
    )
    cand = (
        candidates.join(
            meta.select(
                F.col("id").alias("query_id"),
                F.col("cluster_id").alias("_qc"),
            ),
            "query_id",
        )
        .join(
            meta.select(
                F.col("id").alias("cand_id"),
                F.col("cluster_id").alias("_cc"),
            ),
            "cand_id",
        )
    )
    w_top = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    cand = (
        cand.withColumn("_r0", F.row_number().over(w_top))
        .where(F.col("_r0") <= num_best)
        .where(F.col("sim") < 1.0)
    )
    w_div = Window.partitionBy("query_id", "_cc").orderBy(
        F.desc("sim"), F.asc("cand_id")
    )
    cand = (
        cand.withColumn("_r1", F.row_number().over(w_div))
        .where(F.col("_r1") == 1)
        .where(F.col("_cc") != F.col("_qc"))
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    w_all = Window.partitionBy("query_id")
    cand = cand.withColumn("avail", F.count("*").over(w_all)).withColumn(
        "rank", F.row_number().over(w_rank)
    )
    n_hard, _ = hard_random_counts(F.col("avail"), amount)
    return cand.where(F.col("rank") <= n_hard).select(
        "query_id", "cand_id", "sim", "rank", "avail"
    )


def random_negative_pairs(
    corpus: DataFrame,
    hard: DataFrame,
    amount: int = 20,
    seed: int = 42,
    oversample: int = 4,
    group_col: str = "category",
) -> DataFrame:
    """Seeded category draws excluding self / same-cluster / hard-chosen.

    The reference reject-resamples from the whole category
    (sample_intermediate_training_sets.py:176-185). Distributed analog:
    every category member gets a position in ONE seeded permutation
    (md5-ranked); each query probes consecutive positions starting at its
    own hash, drops ineligible hits, keeps the first n_random. The probe
    window is sized per query from its eligibility: oversample × k × n /
    eligible positions (eligible = category size − own-cluster size −
    already-chosen hard negatives), falling back to the WHOLE category
    when eligibility is scarce — so a query inside a dominant cluster
    still collects min(k, eligible) negatives exactly, like the
    reference's unbounded reject loop, instead of silently undersampling.
    Deterministic, and O(k·n/eligible) probes per query via an equi-join
    on (category, position) — no category scan in the common case.
    """
    w_perm = Window.partitionBy(group_col).orderBy(
        _md5(F.concat(F.col("cand_id").cast("string"), F.lit(f":perm{seed}")))
    )
    perm = corpus.select(
        group_col,
        F.col("id").alias("cand_id"),
        F.col("cluster_id").alias("_cc"),
    ).withColumn("_pos", F.row_number().over(w_perm) - 1)
    cat_sizes = perm.groupBy(group_col).agg(F.max("_pos") + 1).toDF(group_col, "_n")

    # the reference sizes BOTH halves from one availability count
    # (possible_pairs_len); the hard chain carries it out as `avail`, so
    # n_random = min(avail, amount) - n_hard, exactly
    per_query = hard.groupBy("query_id").agg(
        F.count("*").alias("_nh"), F.first("avail").alias("_avail")
    )
    clus_sizes = corpus.groupBy(F.col("cluster_id").alias("_qc")).agg(
        F.count("*").alias("_qcn")
    )
    queries = (
        corpus.select(
            group_col,
            F.col("id").alias("query_id"),
            F.col("cluster_id").alias("_qc"),
        )
        .join(per_query, "query_id")
        .join(cat_sizes, group_col)
        .join(clus_sizes, "_qc")
    )
    n_rand = (
        F.least(F.col("_avail"), F.lit(amount)) - F.col("_nh")
    ).cast("int")
    base = F.pmod(
        F.xxhash64(F.col("query_id"), F.lit(seed)), F.col("_n")
    ).cast("long")
    # eligibility-aware window: expected eligible hits in `window` probes is
    # window · eligible / n; demanding oversample·k + 8 of them makes the
    # shortfall probability ≈ P(Poisson(oversample·k + 8) < k) — negligible
    # for every k. Queries with SCARCE eligibility (≤ 2k) take a separate
    # branch below that walks the whole permutation as a streamed join.
    eligible = F.greatest(
        F.col("_n") - F.col("_qcn") - F.col("_nh"), F.lit(0)
    )
    headroom = F.col("_k") * oversample + F.lit(8)
    window = F.least(
        F.col("_n"),
        F.greatest(
            headroom,
            F.ceil(headroom.cast("double") * F.col("_n") / eligible).cast(
                "long"
            ),
        ),
    )
    active = queries.withColumn("_k", n_rand).where(F.col("_k") > 0)
    scarce_cond = eligible <= F.col("_k") * 2

    probes = active.where(~scarce_cond).select(
        group_col, "query_id", "_qc", "_n", "_k", base.alias("_base"),
        F.explode(F.sequence(F.lit(1), window)).alias("_i"),
    ).withColumn("_pos", F.pmod(F.col("_base") + F.col("_i"), F.col("_n")))
    joined = (
        probes.join(perm, [group_col, "_pos"])
        .where(F.col("_cc") != F.col("_qc"))
        .where(F.col("cand_id") != F.col("query_id"))
        .join(
            hard.select("query_id", "cand_id"),
            ["query_id", "cand_id"],
            "left_anti",
        )
    )
    # Scarce branch: almost everything in the category is ineligible, so a
    # probe walk would need window ≈ n — exploding n sequence rows PER QUERY
    # (quadratic in the category). Instead join the query directly to the
    # category's permutation (streamed equi-join on the category key, no
    # exploded shuffle), filter to eligible, and order by each candidate's
    # distance along the permutation walk from the query's seed position —
    # exactly the rows and order the window walk would have produced.
    scarce = active.where(scarce_cond).select(
        group_col, "query_id", "_qc", "_n", "_k", base.alias("_base")
    )
    joined_scarce = (
        scarce.join(perm, group_col)
        .where(F.col("_cc") != F.col("_qc"))
        .where(F.col("cand_id") != F.col("query_id"))
        .join(
            hard.select("query_id", "cand_id"),
            ["query_id", "cand_id"],
            "left_anti",
        )
        .withColumn(
            "_i",
            F.pmod(F.col("_pos") - F.col("_base") - 1, F.col("_n")) + 1,
        )
    )
    cols = ["query_id", "cand_id", "_k", "_i"]
    all_hits = joined.select(*cols).unionByName(joined_scarce.select(*cols))
    w_pick = Window.partitionBy("query_id").orderBy("_i")
    return (
        all_hits.withColumn("_r", F.row_number().over(w_pick))
        .where(F.col("_r") <= F.col("_k"))
        .select("query_id", "cand_id")
    )


def positive_pairs(
    corpus: DataFrame,
    amount: int = 20,
    num_best: int = 80,
    seed: int = 42,
    toks_col: str = "tokens",
) -> DataFrame:
    """Within-cluster pairs: sim > 0, top-num_best; hard = least-similar
    tail, random = seeded pick from the head remainder
    (sample_intermediate_training_sets.py:27-91). Assumes cluster sizes are
    capped upstream (the reference's 2..80 band, A1) so the within-cluster
    self-join is bounded."""
    side = corpus.select("id", "cluster_id", toks_col)
    other = side.select(
        F.col("id").alias("cand_id"),
        F.col("cluster_id").alias("cluster_id"),
        F.col(toks_col).alias("_ctoks"),
    )
    pairs = (
        side.withColumnRenamed("id", "query_id")
        .join(other, "cluster_id")
        .where(F.col("query_id") != F.col("cand_id"))
        .withColumn("sim", token_cosine(F.col(toks_col), F.col("_ctoks")))
        .where(F.col("sim") > 0)
    )
    w_top = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    pairs = pairs.withColumn("_r", F.row_number().over(w_top)).where(
        F.col("_r") <= num_best
    )
    w_all = Window.partitionBy("query_id")
    n = F.count("*").over(w_all)
    n_hard, n_rand = hard_random_counts(n, amount)
    pairs = pairs.withColumn("_n", n).withColumn("_nh", n_hard).withColumn(
        "_nr", n_rand
    )
    hard = pairs.where(F.col("_r") > F.col("_n") - F.col("_nh")).select(
        "query_id", "cand_id", F.lit("hard").alias("bucket")
    )
    rest = pairs.where(F.col("_r") <= F.col("_n") - F.col("_nh"))
    w_rand = Window.partitionBy("query_id").orderBy(
        _md5(
            F.concat(
                F.col("query_id").cast("string"),
                F.lit("#"),
                F.col("cand_id").cast("string"),
                F.lit(f":pos{seed}"),
            )
        )
    )
    rand = (
        rest.withColumn("_rr", F.row_number().over(w_rand))
        .where(F.col("_rr") <= F.col("_nr"))
        .select("query_id", "cand_id", F.lit("random").alias("bucket"))
    )
    return hard.unionByName(rand)


def orientation_dedup(pairs: DataFrame) -> DataFrame:
    """One orientation per unordered pair (canonical min/max survivor) —
    set-equal to the reference's insertion-order loop
    (process_intermediate_training_sets.py:70-89)."""
    return pairs.select(
        F.least("query_id", "cand_id").alias("id_a"),
        F.greatest("query_id", "cand_id").alias("id_b"),
        *[c for c in pairs.columns if c not in ("query_id", "cand_id")],
    ).dropDuplicates(["id_a", "id_b"])


def seeded_swap(pairs: DataFrame, seed: int = 42) -> DataFrame:
    """Randomize left/right orientation with a seeded coin; add pair_id
    (build_intermediate_training_set.py:44-53)."""
    coin = F.substring(
        _md5(
            F.concat(
                F.col("id_a").cast("string"),
                F.lit("#"),
                F.col("id_b").cast("string"),
                F.lit(f":swap{seed}"),
            )
        ),
        1,
        1,
    )
    flip = coin < "8"
    out = pairs.withColumn(
        "id_left", F.when(flip, F.col("id_b")).otherwise(F.col("id_a"))
    ).withColumn(
        "id_right", F.when(flip, F.col("id_a")).otherwise(F.col("id_b"))
    )
    return out.withColumn(
        "pair_id",
        F.concat(
            F.col("id_left").cast("string"), F.lit("#"), F.col("id_right").cast("string")
        ),
    ).drop("id_a", "id_b")


def uncertainty_sample(
    scored: DataFrame,
    k: int,
    score_col: str = "score",
    key_cols: tuple[str, ...] = ("id_l", "id_r"),
    boundary: float = 0.5,
    per: str | None = None,
) -> DataFrame:
    """Active-learning pair selection: the k scored pairs NEAREST the
    decision boundary — the rows whose human label most improves the next
    matcher, the natural successor to the reference's one-shot heuristic
    training set (build_intermediate_training_set.py builds pairs once;
    iterating on a deployed matcher means labeling where it is unsure).

    Deterministic by construction: total order (|score - boundary| asc,
    *key_cols asc), so the same input yields the same sample at any
    parallelism — the property every other sampler in this module pins
    (seeded_swap, hard_random_counts). Output adds an ``uncertainty``
    column so the labeling UI can show the margin.

    Scale shape: global top-k compiles to TakeOrderedAndProject —
    per-partition heaps merged on the driver, k rows moved, no full sort,
    no single-partition exchange. With ``per`` set, selection is k per
    stratum instead (a partitioned row_number window — one shuffle on the
    stratum key), buying label diversity when one hub block would
    otherwise monopolize the budget.
    """
    u = F.abs(F.col(score_col) - F.lit(boundary))
    out = scored.withColumn("uncertainty", u)
    order = [F.asc("uncertainty")] + [F.asc(c) for c in key_cols]
    if per is None:
        return out.orderBy(*order).limit(k)
    w = Window.partitionBy(per).orderBy(*order)
    return (
        out.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def build_training_pairs(
    corpus: DataFrame,
    amount: int = 15,
    pos_num_best: int = 80,
    neg_num_best: int = 200,
    neg_sim_threshold: float = 0.2,
    seed: int = 42,
    gs_pairs: DataFrame | None = None,
    group_col: str = "category",
    toks_col: str = "tokens",
) -> DataFrame:
    """corpus(id, cluster_id, category, tokens) → labeled, swapped pair table.

    gs_pairs: optional (id_a, id_b) gold-standard pairs excluded in BOTH
    orientations (build_intermediate_training_set.py:41-43).
    """
    pos = positive_pairs(corpus, amount, pos_num_best, seed, toks_col)
    cands = candidate_similarities(
        corpus, neg_sim_threshold, group_col=group_col, toks_col=toks_col
    )
    hard_neg = hard_negative_pairs(corpus, cands, amount, neg_num_best)
    rand_neg = random_negative_pairs(corpus, hard_neg, amount, seed, group_col=group_col)
    neg = hard_neg.select("query_id", "cand_id").unionByName(
        rand_neg.select("query_id", "cand_id")
    )
    labeled = (
        orientation_dedup(pos.select("query_id", "cand_id"))
        .withColumn("label", F.lit(1))
        .unionByName(
            orientation_dedup(neg).withColumn("label", F.lit(0))
        )
        # a pair sampled both as positive (co-cluster) and negative cannot
        # happen by construction (negatives are cross-cluster); dedup anyway
        .dropDuplicates(["id_a", "id_b"])
    )
    if gs_pairs is not None:
        gs_canon = gs_pairs.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        ).distinct()
        labeled = labeled.join(gs_canon, ["id_a", "id_b"], "left_anti")
    return seeded_swap(labeled, seed)
