"""Transitive clustering: match edges → entity ids (SURVEY.md §2.9).

The reference never computes clusters — cluster_id is ground truth in its
corpus and the matcher emits independent pairwise decisions
(/root/reference/src/productbert/test.py:87-93). The north rule closes the
loop: transitive closure of the predicted match graph, computed as iterative
large-star / small-star connected components in DataFrame joins (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC 2014 — public
algorithm). Converges in O(log n) rounds; every round is two self-join-free
groupBy-min passes; lineage is cut per round with localCheckpoint so plans
stay O(1) deep at any scale.

Output: (id, entity_id) where entity_id = min member id of the component —
deterministic, join-free to interpret.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Size-based per-round parallelism: each round's edge set is re-coalesced to
# ~this many edges per partition (an (u,v) long pair is ~16B + row overhead,
# so 500k edges ≈ 10-20 MB — a healthy task size). CC edge sets SHRINK
# geometrically across rounds; with AQE on, runtime coalescing already
# collapses the tiny late-round shuffles (measured: 1 partition from round
# 0 on a 46k-edge graph, per-round cost ~1.2s at BOTH local[8] and
# local[32] — the round cost is the driver-synchronous fixpoint check, not
# task fan-out). This explicit coalesce makes the checkpointed width
# data-sized even when AQE is disabled. At web scale the quotient exceeds
# the core count and the cap never binds.
_EDGES_PER_PARTITION = 500_000


def _canonical(edges: DataFrame) -> DataFrame:
    """Symmetric dedup + self-loop removal: (u>v) canonical orientation."""
    return (
        edges.select(
            F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame, dedup: bool = True) -> DataFrame:
    """For each node n: link every strictly-larger neighbor to min(Γ(n) ∪ n).

    ``dedup=False`` skips the terminal distinct: _small_star is
    duplicate-insensitive (its min aggregation ignores multiplicity and
    its own terminal distinct collapses duplicated relink rows), so the
    fixpoint loop saves one exchange per round by deferring the dedup to
    small-star's existing one (guide §2.4). Standalone callers keep the
    distinct contract.
    """
    sym = edges.select("u", "v").unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    out = (
        sym.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
    )
    return out.distinct() if dedup else out


def _small_star(edges: DataFrame) -> DataFrame:
    """For each node n over smaller-or-equal neighbors N: link N ∪ {n} to min."""
    # edges are (u > v) oriented: neighbors-smaller-than-u of u are exactly v's
    m = edges.groupBy("u").agg(F.min("v").alias("m"))
    relink = (
        edges.join(m, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_link = m.select("u", F.col("m").alias("v"))
    return relink.unionAll(self_link).where(F.col("u") != F.col("v")).distinct()


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    src: str = "id_l",
    dst: str = "id_r",
    max_iterations: int = 50,
    checkpoint_each_round: bool = True,
) -> DataFrame:
    """Match edges → (id, entity_id) via alternating large-star/small-star.

    Only nodes that appear in edges are returned; callers union isolated
    nodes back with entity_id = id (see assign_entities).
    """
    cur = _canonical(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    )
    if checkpoint_each_round:
        # Materialize the canonical edge set ONCE before iterating: the
        # round-0 star plans reference their input in several branches
        # (sym-union + groupBy + join), and without this cut each branch
        # re-evaluates the upstream edge-producing plan (e.g. the scorer)
        # — measured 18.3s -> 4.8s for round 0 on a 172k-edge graph whose
        # edges came from a cached-but-wide scoring plan.
        cur = cur.localCheckpoint(eager=True)
    sc = edges.sparkSession.sparkContext
    prev_fp = None
    for _ in range(max_iterations):
        # _large_star output is ALREADY canonical: every emitted edge is
        # (v_orig, m) with m = min(Γ(u) ∪ u) ≤ u < v_orig, self-loops
        # impossible — so the old _canonical() wrapper here only
        # re-derived greatest/least and re-shuffled a second distinct per
        # round. dedup=False additionally defers large-star's own
        # distinct to small-star's terminal one (min aggregation is
        # duplicate-insensitive), leaving the round with exactly one
        # dedup exchange — the one the fingerprint/fixpoint contract
        # needs. Identical edge sets per round (pinned by test).
        cur = _large_star(cur, dedup=False)
        cur = _small_star(cur)
        # small_star output is already (u > v) oriented.
        # Size-based coalesce BEFORE the checkpoint: the previous round's
        # fingerprint gives this round's input edge count for free, and
        # coalesce (no shuffle) caps the checkpointed partition count at
        # what the data actually needs — every subsequent round reads and
        # launches tasks at that width.
        if prev_fp is not None:
            parts = max(1, min(
                sc.defaultParallelism,
                prev_fp[0] // _EDGES_PER_PARTITION + 1,
            ))
            cur = cur.coalesce(parts)
        # LAZY checkpoint + ONE action per round: the aggregation below
        # materializes the checkpoint as a side effect AND computes the
        # fingerprint and the early-star convergence test together — the
        # fingerprint job and the early-star semi-join job of the previous
        # shape are merged into a single driver round-trip (guide §1.2; the
        # per-round sync is the algorithm's O(log n) serial floor, so
        # halving the actions per round halves that floor).
        #
        # Early convergence: a star-shaped edge set (no member is also a
        # root — u-set ∩ v-set = ∅) IS the fixpoint: both stars are the
        # identity on it (large-star re-emits (member, root) from the
        # root's group; small-star's min per member is its root). The old
        # loop only detected convergence one round LATER, via fp equality,
        # paying a full two-star round that provably changes nothing.
        # nonstar flags any node that is both some edge's u and some
        # edge's v — zero ⟺ star-shaped.
        if checkpoint_each_round:
            cur = cur.localCheckpoint(eager=False)
            # One two-level aggregation computes all three loop signals:
            # each edge (u, v) emits a u-node row carrying the edge's hash
            # and a v-node row carrying NULL; per node, max(iu)/max(iv)
            # record which roles it plays while count/bit_xor fold the
            # (null-skipping) edge hashes; the global fold then yields
            #   n       = edge count          (fingerprint, as before)
            #   h       = xor of edge hashes  (two-level xor == flat xor)
            #   nonstar = ∃ node that is both a u and a v
            # Every stage is partial-aggregable; no observe() (AQE's
            # empty-relation propagation drops CollectMetrics subtrees on
            # empty inputs) and no separate semi-join job.
            half_u = cur.select(
                F.col("u").alias("_node"),
                F.lit(1).alias("_iu"),
                F.lit(0).alias("_iv"),
                F.xxhash64("u", "v").alias("_h"),
            )
            half_v = cur.select(
                F.col("v").alias("_node"),
                F.lit(0).alias("_iu"),
                F.lit(1).alias("_iv"),
                F.lit(None).cast("long").alias("_h"),
            )
            per_node = (
                half_u.unionAll(half_v)
                .groupBy("_node")
                .agg(
                    F.max("_iu").alias("_iu"),
                    F.max("_iv").alias("_iv"),
                    F.count("_h").alias("_n"),
                    F.bit_xor("_h").alias("_hx"),
                )
            )
            row = per_node.agg(
                F.coalesce(F.sum("_n"), F.lit(0)).alias("n"),
                F.coalesce(F.bit_xor("_hx"), F.lit(0)).alias("h"),
                F.coalesce(
                    F.max(
                        ((F.col("_iu") + F.col("_iv")) == 2).cast("int")
                    ),
                    F.lit(0),
                ).alias("nonstar"),
            ).collect()[0]
            fp = (int(row["n"]), int(row["h"]))
            if fp == prev_fp:
                break
            prev_fp = fp
            if int(row["nonstar"]) == 0:
                break
        else:
            fp = _fingerprint(cur)
            if fp == prev_fp:
                break
            prev_fp = fp
    # converged: every edge is (member, component-min)
    members = cur.select(F.col("u").alias("id"), F.col("v").alias("entity_id"))
    roots = cur.select(F.col("v").alias("id"), F.col("v").alias("entity_id"))
    return members.unionAll(roots).distinct()


def assign_entities(offers: DataFrame, match_edges: DataFrame) -> DataFrame:
    """offers + match edges → (id, entity_id); isolated offers get entity_id=id."""
    comp = connected_components(match_edges)
    return (
        offers.select("id")
        .join(comp, "id", "left")
        .select(
            "id", F.coalesce("entity_id", F.col("id")).alias("entity_id")
        )
    )


def split_giant_components(
    edges: DataFrame,
    max_size: int,
    ladder: list[float],
    src: str = "id_l",
    dst: str = "id_r",
    score: str = "score",
) -> DataFrame:
    """Bound entity size: re-cluster oversized components on stronger edges.

    Transitive closure's web-scale failure mode is CHAINING: a handful of
    borderline match edges (accessory listings, boilerplate titles) bridge
    otherwise-distinct products into one giant component — at 10^12 offers a
    single mega-entity can swallow a measurable fraction of the corpus and
    makes survivorship/golden records meaningless. The reference never hits
    this (its cluster ids are ground truth and its corpus construction caps
    clusters at 80 members, sample_intermediate_training_sets.py:233-240);
    an end-to-end resolver must handle it.

    Deterministic ladder semantics: compute connected components over ALL
    edges, then for each threshold t in ``ladder`` (ascending scores), take
    every component larger than ``max_size``, keep only its edges with
    ``score >= t``, and re-run connected components on that subgraph —
    members that lose all edges become singletons (entity_id = id).
    Components at or under ``max_size`` are never touched, so confident
    small entities are stable regardless of the ladder. A component still
    oversized after the last rung stays as-is (best effort — the honest
    output for a genuinely dense clique is the clique).

    Scale shape: ONE corpus-wide sizes pass (the first rung's), then the
    working set narrows to giant members only — a component that is ≤
    max_size (whether it started small or a rung shrank it) is frozen into
    the result and never re-scanned, so rung 2..R cost O(|giants| log
    |giants|) in both the sizes pass and the CC, not O(corpus). The frozen
    parts are unioned lazily at the end — no per-rung corpus-sized
    materialization; only the (small) working assignment is checkpointed
    per rung. Emptiness of the oversized set is checked per rung (one
    scalar driver round-trip) so the common no-giants case pays one count.

    Returns (id, entity_id) for every node that appears in ``edges`` —
    same contract as connected_components; callers union isolated offers
    back via assign_entities-style coalesce.
    """
    weighted = edges.select(
        F.col(src).alias("id_l"), F.col(dst).alias("id_r"),
        F.col(score).alias("score"),
    ).localCheckpoint(eager=True)
    # `work` is the assignment still subject to splitting; starts as the
    # full closure, narrows to giant members after the first rung. `frozen`
    # accumulates the ≤ max_size parts (lazy — unioned once at the end).
    work = connected_components(weighted)
    frozen: list[DataFrame] = []
    for t in sorted(ladder):
        sizes = work.groupBy("entity_id").agg(F.count("*").alias("_n"))
        big = sizes.where(F.col("_n") > max_size).select("entity_id")
        # at most |work|/max_size rows by construction; cut lineage so the
        # three consumers below don't each re-run the CC-plus-count plan
        big = big.localCheckpoint(eager=True)
        if big.isEmpty():
            break
        frozen.append(work.join(big, "entity_id", "left_anti"))
        big_members = (
            work.join(big, "entity_id", "left_semi")
            .select("id")
            .localCheckpoint(eager=True)
        )
        strong = (
            weighted.where(F.col("score") >= t)
            .join(big_members.withColumnRenamed("id", "id_l"), "id_l", "left_semi")
            .join(big_members.withColumnRenamed("id", "id_r"), "id_r", "left_semi")
        )
        sub = connected_components(strong)
        work = (
            big_members.join(sub, "id", "left")
            .select("id", F.coalesce("entity_id", F.col("id")).alias("entity_id"))
            .localCheckpoint(eager=True)
        )
    out = work
    for part in frozen:
        out = out.unionByName(part)
    return out
