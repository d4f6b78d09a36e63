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

# The disjoint-space remap id*2 + side is exact only for 0 ≤ id < 2^62:
# negative ids break the parity/shift inversion and ids ≥ 2^62 overflow
# silently. Asserted per row at every remap site (ADVICE r5) — one branch
# per row, evaluated alongside the multiply the row already pays.
_MAX_REMAP_ID = 1 << 62


def _checked_remap(id_col, side_bit: int):
    return F.when(
        (id_col >= 0) & (id_col < F.lit(_MAX_REMAP_ID)),
        id_col * 2 + side_bit,
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "linkage id remap precondition violated "
                    "(need 0 <= id < 2^62): id="
                ),
                id_col.cast("string"),
            )
        )
    )


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
    sn_window: int | None = None,
    sn_key_chars: int = 12,
    meta_prune: str | None = None,
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

    ``sn_window=w`` adds the sorted-neighborhood family (block_offers'
    third blocking pass, linkage flavor): both catalogs sort TOGETHER
    under the first ``sn_key_chars`` characters of the normalized title
    and every record pairs with its ``w`` rank-successors — catching
    near-misses that share no exact key — with within-side neighbor
    pairs filtered out afterward (the clean-clean invariant). Linear
    (|l|+|r|)·w pair budget before the cross filter.

    ``meta_prune='wep'|'wnp'`` applies meta-blocking to the key-derived
    cross pairs (operators/metablocking — Papadakis et al.): the CBS
    weight of a cross pair is its number of distinct shared kept keys
    (the key join's multiplicity, which the plain path collapses with
    ``distinct()``), pruned by the exact integer global-mean (WEP) or
    per-endpoint-mean (WNP) rule. The SN family, when enabled, unions in
    AFTER pruning, exactly as block_offers orders the passes.
    """

    def _tagged(df: DataFrame, side_bit: int) -> DataFrame:
        # Disjoint-long tagging (id*2 + side) instead of a (side, oid)
        # struct: every downstream groupBy/join/collect then keys on a
        # plain bigint, which shuffles and compares measurably cheaper
        # than a struct at identical semantics. The remap precondition
        # (0 ≤ id < 2^62, see remap_link_pairs) is ASSERTED per row so an
        # out-of-range id fails loudly instead of silently corrupting
        # pairs (ADVICE r5).
        return B.build_title_for_ts(df).select(
            _checked_remap(F.col("id"), side_bit).alias("id"),
            F.col(group_col),
            "tokens",
        )

    union = _tagged(left, 0).unionByName(_tagged(right, 1))
    pruned = B.prune_tokens_by_df(
        union, min_df, max_df_frac, group_col, narrow=True
    )
    if use_lsh:
        # two key families consume `pruned` with different projections
        # (same rationale as block_offers): cut lineage once, read twice
        pruned = pruned.localCheckpoint(eager=True)
    rare_bound = max_rare_df or B.DEFAULT_MAX_BLOCK_SIZE
    rare = B.rare_token_keys(pruned, rare_bound, group_col)
    lsh = (
        B.minhash_band_keys(pruned, num_hashes, bands, group_col)
        if use_lsh
        else None
    )

    def _flat(keys: DataFrame) -> DataFrame:
        # side = low bit, oid = arithmetic shift back (exact inverse of
        # the *2+side remap for the asserted id range)
        return keys.select(
            F.pmod(F.col("id"), F.lit(2)).alias("_side"),
            F.shiftright(F.col("id"), 1).alias("_oid"),
            F.col("id").alias("_rid"),
            "key",
        )

    # (id, key) rows are distinct per family by construction (rare keys
    # explode an array_distinct token set; band keys emit one row per
    # (id, band) with the band index baked into the key) — the same
    # invariant block_offers passes as assume_distinct_keys=True — so
    # per-key sizes are plain conditional counts, not count_distinct
    # (which plans an extra Expand + two-level distinct aggregation).
    n_l = F.count(F.when(F.col("_side") == 0, 1)).alias("_nl")
    n_r = F.count(F.when(F.col("_side") == 1, 1)).alias("_nr")

    def _gate(k: DataFrame, track: bool) -> DataFrame:
        sizes = k.groupBy("key").agg(n_l, n_r)
        if track and tracker is not None:
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
        return k.join(ok, "key", "left_semi")

    def _cross_expand(k: DataFrame) -> DataFrame:
        """Per key: sorted per-side id arrays → JVM cross product — the
        dedup path's join-free expansion, linkage flavor. Buffer-safe: a
        gated key holds ≤ 2·max_block_pairs ids (n_l·n_r ≤ cap with both
        ≥ 1 bounds each side at cap); a bypassed rare key holds ≤ its
        token df ≤ rare_bound. An empty side yields no pairs, exactly as
        the old kl⋈kr equi-join emitted nothing for one-sided keys."""
        grouped = k.groupBy("key").agg(
            F.array_sort(
                F.collect_set(F.when(F.col("_side") == 0, F.col("_oid")))
            ).alias("_ids_l"),
            F.array_sort(
                F.collect_set(F.when(F.col("_side") == 1, F.col("_oid")))
            ).alias("_ids_r"),
        )
        return grouped.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "_ids_l",
                        lambda x: F.transform(
                            "_ids_r",
                            lambda y: F.struct(
                                x.alias("id_l"), y.alias("id_r")
                            ),
                        ),
                    )
                )
            ).alias("p")
        ).select("p.id_l", "p.id_r")

    # A rare-token key's worst-case cross product is split(df) =
    # ⌊df/2⌋·⌈df/2⌉ with df ≤ rare_bound: when that fits max_block_pairs
    # the gate can never drop a rare key, so only the (unbounded) LSH band
    # family pays the count+semi-join pass — the same by-construction
    # bypass block_offers applies (guide §2.4). meta_prune needs the
    # per-key join multiplicity as its CBS weight, so it keeps the single
    # gated join path unchanged.
    rare_prebounded = (
        (rare_bound // 2) * ((rare_bound + 1) // 2) <= max_block_pairs
    )
    if meta_prune is None and rare_prebounded and tracker is None:
        bounded = _flat(rare)
        if lsh is not None:
            bounded = bounded.unionByName(_gate(_flat(lsh), track=False))
        pairs = _cross_expand(bounded)
    else:
        k = _flat(rare.unionByName(lsh) if lsh is not None else rare)
        gated = _gate(k, track=True)
        # the join and (when requested) the meta-prune run on the REMAPPED
        # ids: prune_pairs_wnp/wep union id_l/id_r into one node column,
        # so overlapping catalog id spaces would otherwise merge a left
        # and an unrelated right record into one node and corrupt the
        # keep/drop means (ADVICE r5, medium). The disjoint even/odd space
        # makes that impossible; ids unmap right before return.
        kl = gated.where(F.col("_side") == 0).select(
            "key", F.col("_rid").alias("id_l")
        )
        kr = gated.where(F.col("_side") == 1).select(
            "key", F.col("_rid").alias("id_r")
        )
        # per-key multiplicity = number of shared kept keys (CBS weight)
        pairs = kl.join(kr, "key").select("id_l", "id_r")
        if meta_prune:
            if meta_prune not in ("wep", "wnp"):
                raise ValueError(
                    f"meta_prune={meta_prune!r}: expected wep|wnp"
                )
            from .metablocking import prune_pairs_wep, prune_pairs_wnp

            # kl/kr rows are distinct per (id, key) (see the join
            # comment), so the join's per-pair multiplicity IS the CBS
            # weight: the number of distinct kept keys the pair shares
            weighted = pairs.groupBy("id_l", "id_r").agg(
                F.count("*").cast("long").alias("weight")
            )
            pruner = (
                prune_pairs_wep if meta_prune == "wep" else prune_pairs_wnp
            )
            pairs = pruner(weighted).select("id_l", "id_r")
        pairs = pairs.select(
            F.shiftright("id_l", 1).alias("id_l"),
            F.shiftright("id_r", 1).alias("id_r"),
        )
    if sn_window:
        # Sorted-neighborhood pass over the UNION (block_offers' third
        # family, linkage flavor): the two catalogs sort together under the
        # same normalized-title-prefix order — a left record's nearest
        # cross-side neighbors in that order are exactly the near-misses
        # equality keys drop — and within-side neighbor pairs are filtered
        # OUT afterward (the clean-clean invariant: a within-side pair is a
        # wrong candidate, not a wasted one). Ids ride the disjoint
        # id*2 + side remap so the two catalogs' key spaces can't collide
        # in the rank order; the parity carries the side through the
        # canonical (id_l < id_r) output for the cross filter + re-orient.
        from ..functions.text import lower_ws_normalize

        sn_key = F.substring(
            lower_ws_normalize(F.coalesce(F.col("title"), F.lit(""))),
            1,
            sn_key_chars,
        )
        keyed = left.select(
            _checked_remap(F.col("id"), 0).alias("id"), sn_key.alias("key")
        ).unionByName(
            right.select(
                _checked_remap(F.col("id"), 1).alias("id"),
                sn_key.alias("key"),
            )
        )
        sn = B.sorted_neighborhood_pairs(keyed, sn_window)
        cross = sn.where(
            F.pmod(F.col("id_l"), F.lit(2)) != F.pmod(F.col("id_r"), F.lit(2))
        )
        # canonical order in the remapped space may put the RIGHT record
        # first; re-orient by parity, then undo the remap
        lid = F.when(
            F.pmod(F.col("id_l"), F.lit(2)) == 0, F.col("id_l")
        ).otherwise(F.col("id_r"))
        rid = F.when(
            F.pmod(F.col("id_l"), F.lit(2)) == 1, F.col("id_l")
        ).otherwise(F.col("id_r"))
        pairs = pairs.unionByName(
            cross.select(
                # integer shift, not float division: exact at any id size
                F.shiftright(lid, 1).alias("id_l"),
                F.shiftright(rid, 1).alias("id_r"),
            )
        )
    return pairs.distinct()


def remap_link_pairs(cands: DataFrame) -> DataFrame:
    """(id_l, id_r) in the two catalogs' own id spaces → the disjoint
    internal space (left ids ↦ id*2, right ids ↦ id*2+1). Order-preserving
    within each side, so any (score, id_l, id_r) total order downstream is
    the same order the original ids would give. Requires 0 ≤ id < 2^62
    (the extraction ids are SKU-scale longs, extract.py:112 — a catalog
    keyed on raw 64-bit hashes would need a dense re-key first,
    operators/ids); the range is asserted per row (ADVICE r5), so a
    violating id fails the job loudly instead of corrupting pairs."""
    return cands.select(
        _checked_remap(F.col("id_l"), 0).alias("id_l"),
        _checked_remap(F.col("id_r"), 1).alias("id_r"),
    )


def unmap_link_ids(df: DataFrame) -> DataFrame:
    """Inverse of remap_link_pairs on a result table: both remapped id
    columns back to the catalogs' own ids via arithmetic shift (floor
    division — the exact inverse for the asserted 0 ≤ id < 2^62 range,
    and, unlike SQL ``div``'s truncate-toward-zero, also the correct
    floor for any negative value that slipped in)."""
    return df.withColumn("id_l", F.shiftright("id_l", 1)).withColumn(
        "id_r", F.shiftright("id_r", 1)
    )


def tagged_union_for_scoring(left: DataFrame, right: DataFrame) -> DataFrame:
    """The scorer's offers side: both catalogs projected to exactly the
    columns scoring reads, remapped into the disjoint id space, unioned,
    and cut out of the downstream stage with an eager localCheckpoint.

    The checkpoint is a measured necessity, not tidiness: fused into the
    scoring stage, the two union branches' duplicated expression trees
    push the generated whole-stage-codegen method past the JVM's hard
    64KB limit and the ENTIRE feature stage silently drops to interpreted
    execution (dedup's single-branch offers side compiles fine, the union
    does not). The materialized table is the same order of bytes as the
    text index the scorer broadcasts anyway."""
    from .scoring import PAIR_ATTRS as S_PAIR_ATTRS

    keep = ["id"] + [a for a in S_PAIR_ATTRS if a in left.columns]
    return (
        left.withColumn("id", _checked_remap(F.col("id"), 0))
        .select(*keep)
        .unionByName(
            right.withColumn("id", _checked_remap(F.col("id"), 1)).select(*keep)
        )
        .localCheckpoint(eager=True)
    )


def link_records(
    left: DataFrame,
    right: DataFrame,
    weights: dict[str, float] | None = None,
    one_to_one: str | None = "greedy",
    n_left: int | None = None,
    n_right: int | None = None,
    blocking: dict | None = None,
    tracker=None,
    score_col: str = "logit",
    match_only: bool = True,
) -> DataFrame:
    """End-to-end clean-clean linkage: two offer-schema tables →
    (id_l, id_r, *FEATURES, logit, score, match) resolved pairs.

    The linkage counterpart of run_pipeline's block→score tail: candidates
    from ``link_candidate_pairs`` (cross-side only, per-key pair cap),
    scored by the calibrated logistic matcher (scoring.score_candidates —
    the SAME feature family and decision rule as dedup, reference
    metric.py:21-27 threshold), then the linkage-specific decision layer:
    because each side is already deduplicated, conflicts are resolved by
    one-to-one assignment (operators/assignment.py), NOT transitive
    closure.

    ``one_to_one``: ``"greedy"`` (default; sequential-greedy matching =
    1/2-approx max-weight), ``"mutual"`` (reciprocal best — more
    conservative), or ``None`` (return every above-threshold pair,
    conflicts included — the input a downstream human-review queue wants).

    ``score_col`` ranks the assignment's preference order. The default is
    ``"logit"``, not ``"score"``: sigmoid saturates to float 1.0 above
    logit ≈ 36, so ranking on the post-sigmoid score would collapse
    genuinely different strong pairs into id-order ties; the logit is the
    same order in exact arithmetic with no saturation.

    ``match_only=False`` assigns over ALL scored candidates instead of
    only those clearing the decision threshold — every record gets its
    best available partner with the ``match`` flag saying whether the
    pair clears the rule, the shape a review queue consumes.

    The two id spaces may overlap (two catalogs' autoincrement keys
    usually do): internally ids are remapped to the disjoint space
    ``id*2 + side`` for the shared scoring machinery and mapped back on
    output — map-only both ways, order-preserving within each side, so
    the assignment total order (score desc, id_l, id_r) is unchanged.

    Scale shape: one union + the capped blocking chain, the scorer's
    hydration joins + one Arrow crossing, then two window ranks
    (mutual) or the dominant-pair fixpoint (greedy) over the MATCHED
    pairs only — the post-threshold table, orders of magnitude smaller
    than the candidate set. ``n_left``/``n_right`` (row counts, e.g.
    from checkpoint manifests) let the scorer pick its broadcast-vs-
    streamed text path without an extra count job.
    """
    from .assignment import greedy_one_to_one, reciprocal_best_match
    from .scoring import score_candidates

    if one_to_one not in (None, "greedy", "mutual"):
        raise ValueError(
            f"one_to_one={one_to_one!r}: expected 'greedy', 'mutual' or None"
        )
    cands = link_candidate_pairs(left, right, tracker=tracker, **(blocking or {}))
    # Cut lineage between blocking and scoring (the analog of
    # run_pipeline's candidate_pairs stage checkpoint — two longs/row).
    cands = cands.localCheckpoint(eager=True)
    pairs_u = remap_link_pairs(cands)
    union = tagged_union_for_scoring(left, right)
    n_union = (
        n_left + n_right if n_left is not None and n_right is not None else None
    )
    # Materialize the scored table BEFORE filtering on `match`: a filter
    # on a computed column re-inlines the full logit/feature expression
    # tree into the filter stage (score/match/filter each carry their own
    # copy past CollapseProject), which alone crosses the 64KB codegen
    # limit — measured on the DEDUP path too; run_pipeline never sees it
    # because its scored_pairs stage checkpoints to parquet before the
    # clustering filter, and this is the in-memory analog of that barrier.
    scored = score_candidates(
        pairs_u, union, weights=weights, n_offers=n_union
    ).localCheckpoint(eager=True)
    if match_only:
        scored = scored.where("match")
    if one_to_one == "greedy":
        resolved = greedy_one_to_one(scored, score_col)
    elif one_to_one == "mutual":
        resolved = reciprocal_best_match(scored, score_col)
    else:
        resolved = scored
    return unmap_link_ids(resolved)
