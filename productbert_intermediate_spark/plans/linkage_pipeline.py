"""End-to-end clean-clean linkage pipeline: two page corpora → a matching.

The linkage sibling of plans/pipeline.run_pipeline — the reference is
dedup-only (one offers corpus through every script,
/root/reference/README.md:25-38), but linking two separately-curated
catalogs is the same machinery with two invariants swapped: candidates
must be CROSS-side only (operators/linkage.link_candidate_pairs), and
conflicts resolve by one-to-one assignment, not transitive closure
(operators/assignment.py — each side is already deduplicated).

Stage layout (each through StageCatalog, resumable, params-keyed):

    offers_left / offers_right   extraction per catalog
    link_candidates              cross-side blocking (drop counters in
                                 the manifest, same no-silent-caps rule
                                 as dedup)
    link_scored                  the shared scorer over the union-tagged
                                 disjoint id space, ids mapped BACK
                                 before the checkpoint (the stored table
                                 is in the catalogs' own id spaces);
                                 scorer="fs" inserts a checkpointed
                                 feature stage first, exactly like
                                 run_pipeline's fs path — the 1969
                                 Fellegi-Sunter setting IS two-file
                                 linkage, so the unsupervised matcher is
                                 the natural choice when no labels exist
    link_matches                 the decision layer: greedy / mutual
                                 one-to-one over above-threshold pairs

The parquet stage checkpoints double as the codegen barriers
link_records needs localCheckpoints for (operators/linkage.py:
tagged_union_for_scoring) — a resumed run re-reads plain scans and no
stage ever re-fuses the union or the computed-``match`` filter into the
scoring plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import scoring as S
from ..operators.extract import extract_offers
from ..operators.linkage import (
    link_candidate_pairs,
    remap_link_pairs,
    tagged_union_for_scoring,
    unmap_link_ids,
)
from ..sources.catalog import StageCatalog
from ..sources.readers import read_pages
from .pipeline import _params_key


def run_linkage(
    spark: SparkSession,
    left_pages_path: str,
    right_pages_path: str,
    workdir: str,
    weights: dict[str, float] | None = None,
    scorer: str = "logistic",
    one_to_one: str = "greedy",
    blocking_params: dict | None = None,
    match_only: bool = True,
    labeled_path: str | None = None,
    force: bool = False,
) -> dict:
    """Execute (or resume) the linkage pipeline; returns a run report.

    ``scorer``: ``"logistic"`` (calibrated feature scorer, ranks the
    assignment on the logit — see link_records on sigmoid saturation) or
    ``"fs"`` (unsupervised Fellegi-Sunter over the same checkpointed
    feature table; ranks on the posterior). ``one_to_one``: ``"greedy"``
    or ``"mutual"`` (operators/assignment.py). ``match_only=False``
    assigns over ALL scored candidates and keeps the decision flag as
    the ``match`` column (review-queue shape).

    The stored ``link_scored`` / ``link_matches`` tables carry the
    catalogs' OWN ids — the disjoint remap is an internal detail of the
    scoring stage, so a left id and a right id may collide numerically
    in those tables; (id_l, id_r) columns are the namespaces.

    ``labeled_path``: parquet of gold CROSS-catalog pairs
    (id_left, id_right, label) — id_left in the left catalog's id space,
    id_right in the right's; no orientation normalization (the sides are
    distinct namespaces, unlike dedup's symmetric pairs). Adds
    ``report["pairwise_eval"]`` — P/R/F1 of the DECISION LAYER's output
    (a true pair the assignment rejected because its endpoint matched
    better elsewhere counts as a miss: one-to-one is part of the
    decision being graded) — and a checkpointed ``link_threshold_curve``
    stage (metrics_ops.pr_threshold_sweep over the scorer's raw scores
    on labeled pairs the blocker surfaced) with the F1-max cutoff in
    ``report["threshold_eval"]``, mirroring run_pipeline's labeled runs.
    """
    if scorer not in ("logistic", "fs"):
        raise ValueError(f"unknown scorer {scorer!r} (logistic|fs)")
    if one_to_one not in ("greedy", "mutual"):
        raise ValueError(f"unknown one_to_one {one_to_one!r} (greedy|mutual)")
    weights = weights or S.DEFAULT_WEIGHTS
    bp = dict(blocking_params or {})
    cat = StageCatalog(spark, workdir)
    report: dict = {"stages": {}}

    sides = {}
    for side, path in (("left", left_pages_path), ("right", right_pages_path)):
        k = _params_key(src=path, side=side)
        df, resumed = cat.write_or_resume(
            f"offers_{side}",
            lambda path=path: extract_offers(read_pages(spark, path)).where(
                F.col("id").isNotNull()
            ),
            params_key=k,
            force=force,
        )
        sides[side] = (df, k)
        report["stages"][f"offers_{side}"] = {"resumed": resumed}
    (left, k_l), (right, k_r) = sides["left"], sides["right"]

    from ..operators.metrics_ops import MetricTracker

    tracker = MetricTracker()
    k_cand = _params_key(parent_l=k_l, parent_r=k_r, **bp)

    def _drop_metrics() -> dict:
        tracker.harvest()
        return {
            "link_dropped_keys": int(tracker.total("link_dropped_keys")),
            "link_dropped_pairs": int(tracker.total("link_dropped_pairs")),
        }

    cands, resumed = cat.write_or_resume(
        "link_candidates",
        lambda: link_candidate_pairs(left, right, tracker=tracker, **bp),
        params_key=k_cand,
        force=force,
        extra_after=_drop_metrics,
    )
    report["stages"]["link_candidates"] = {"resumed": resumed}

    n_l = (cat.latest_entry("offers_left") or {}).get("rows")
    n_r = (cat.latest_entry("offers_right") or {}).get("rows")
    n_union = n_l + n_r if n_l is not None and n_r is not None else None

    fs_stats: dict = {}
    if scorer == "logistic":
        k_scored = _params_key(parent=k_cand, scorer="logistic", weights=weights)
        rank_col = "logit"

        def build_scored() -> DataFrame:
            return unmap_link_ids(
                S.score_candidates(
                    remap_link_pairs(cands),
                    tagged_union_for_scoring(left, right),
                    weights=weights,
                    n_offers=n_union,
                ).select("id_l", "id_r", *S.FEATURES, "logit", "score", "match")
            )

    else:  # fs
        from ..operators.fellegi_sunter import (
            FS_FEATURE_THRESHOLDS,
            score_features_fs,
        )

        # Checkpoint the feature table first (run_pipeline's fs rationale:
        # the EM fit's count pass and the scoring pass each scan it once;
        # re-running the pandas-UDF feature stage twice would double the
        # expensive step).
        k_feat = _params_key(parent=k_cand, stage="link_pair_features")
        feats, fres = cat.write_or_resume(
            "link_pair_features",
            lambda: unmap_link_ids(
                S.score_candidates(
                    remap_link_pairs(cands),
                    tagged_union_for_scoring(left, right),
                    n_offers=n_union,
                ).select("id_l", "id_r", *S.FEATURES)
            ),
            params_key=k_feat,
            force=force,
        )
        report["stages"]["link_pair_features"] = {"resumed": fres}
        k_scored = _params_key(
            parent=k_feat, scorer="fs", thresholds=FS_FEATURE_THRESHOLDS
        )
        rank_col = "score"
        build_scored = lambda: score_features_fs(feats, stats=fs_stats)  # noqa: E731

    scored, resumed = cat.write_or_resume(
        "link_scored", build_scored, params_key=k_scored, force=force
    )
    report["stages"]["link_scored"] = {"resumed": resumed}
    if scorer == "fs" and fs_stats:
        report["stages"]["link_scored"].update(fs_stats)

    from ..operators.assignment import greedy_one_to_one, reciprocal_best_match

    assign = greedy_one_to_one if one_to_one == "greedy" else reciprocal_best_match
    k_match = _params_key(
        parent=k_scored, one_to_one=one_to_one, match_only=match_only,
        rank_col=rank_col,
    )
    pool = scored.where("match") if match_only else scored
    matches, resumed = cat.write_or_resume(
        "link_matches",
        lambda: assign(pool, rank_col),
        params_key=k_match,
        force=force,
    )
    report["stages"]["link_matches"] = {"resumed": resumed}

    report["counts"] = {
        "offers_left": int((cat.latest_entry("offers_left") or {}).get("rows", 0)),
        "offers_right": int((cat.latest_entry("offers_right") or {}).get("rows", 0)),
        "link_candidates": int(
            (cat.latest_entry("link_candidates") or {}).get("rows", 0)
        ),
        "link_scored": int((cat.latest_entry("link_scored") or {}).get("rows", 0)),
        "link_matches": int((cat.latest_entry("link_matches") or {}).get("rows", 0)),
    }
    cand_entry = cat.latest_entry("link_candidates") or {}
    report["blocking"] = {
        k: cand_entry[k]
        for k in ("link_dropped_keys", "link_dropped_pairs")
        if k in cand_entry
    }
    if labeled_path:
        from ..operators.metrics_ops import (
            confusion_counts,
            pr_threshold_sweep,
            prec_rec_f1,
        )

        labeled = spark.read.parquet(labeled_path).select(
            "id_left", "id_right", "label"
        )
        # predict on the stored DECISION flag, not mere assignment: with
        # match_only=False the link_matches table contains every record's
        # best assigned partner including below-threshold pairs
        # (match=false), and grading those as positives skews P/R/F1 for
        # review-queue runs (ADVICE r5)
        pred = labeled.join(
            matches.select(
                F.col("id_l").alias("id_left"),
                F.col("id_r").alias("id_right"),
                F.col("match").alias("_m"),
            ),
            ["id_left", "id_right"],
            "left",
        ).withColumn("match", F.coalesce(F.col("_m"), F.lit(False)))
        counts = confusion_counts(pred)
        metrics: dict = dict(counts)
        metrics.update(prec_rec_f1(counts))
        report["pairwise_eval"] = metrics

        # PR curve over the scorer's raw scores on labeled pairs the
        # blocker surfaced (pairs blocking missed are the blocker's
        # recall loss, not the cutoff's — run_pipeline's rationale)
        lab_scored = scored.select("id_l", "id_r", "score").join(
            labeled.select(
                F.col("id_left").alias("id_l"),
                F.col("id_right").alias("id_r"),
                "label",
            ),
            ["id_l", "id_r"],
        )
        curve = pr_threshold_sweep(lab_scored)
        cat.write("link_threshold_curve", curve, params_key=k_match)
        best = (
            cat.read("link_threshold_curve")
            .orderBy(F.desc_nulls_last("f1"), F.asc("threshold"))
            .limit(1)
            .collect()
        )
        report["threshold_eval"] = {
            "n_labeled_scored": lab_scored.count(),
            "best": best[0].asDict() if best else {},
        }

    report["matches"] = matches
    return report
