"""End-to-end ER pipeline: pages → offers → candidates → edges → entities.

The distributed, resumable equivalent of the reference's fixed script order
(/root/reference/README.md:25-38). Each stage checkpoints through
StageCatalog; a rerun resumes after the last complete stage (matching the
reference's USE_TEMP_* caching flags, sample_intermediate_training_sets.py:
15-17, upgraded with manifest lineage per the north rule).

Run on a cluster as (zip built by scripts/make_pyfiles_zip.py; the driver
script never sets master, so submit-side flags pick the cluster):
    spark-submit --master <cluster> \
        --py-files dist/productbert_intermediate_spark.zip \
        scripts/submit_pipeline.py \
        --pages <path> --workdir <path> [--labeled <path>]
tests/test_spark_submit.py exercises exactly this invocation.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import blocking as B
from ..operators import scoring as S
from ..operators.clustering import assign_entities
from ..operators.extract import extract_offers
from ..operators.metrics_ops import evaluate_pairwise
from ..sources.readers import read_pages
from ..sources.catalog import StageCatalog


def _params_key(**kwargs) -> str:
    blob = json.dumps(kwargs, sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def run_pipeline(
    spark: SparkSession,
    pages_path: str,
    workdir: str,
    labeled_path: str | None = None,
    weights: dict[str, float] | None = None,
    blocking_params: dict | None = None,
    truth_path: str | None = None,
    training_amount: int = 15,
    scorer: str = "logistic",
    force: bool = False,
    offers_buckets: int | None = 0,
    salt_hot_ids: tuple[int, int] | None = None,
    stabilize_against: str | None = None,
    pair_budget: int | None = None,
    max_entity_size: int | None = None,
    split_ladder: tuple[float, ...] = (0.6, 0.7, 0.8, 0.9, 0.95),
) -> dict:
    """Execute (or resume) the full pipeline; returns a run report dict.

    ``scorer`` picks the matcher for the scored_pairs stage:

    * ``"logistic"`` (default) — calibrated feature scorer
      (scoring.score_candidates): JVM similarity features + one Arrow
      crossing, the throughput path;
    * ``"encoder"`` — the reference's transformer-shaped decision stack
      (bert_scoring.score_candidates_with_encoder): tokenize → pair-encode
      → frozen encoder → sigmoid → 0.5 threshold
      (/root/reference/src/productbert/test.py:54-93). The default encoder
      is the honestly-labeled IDF-weighted frozen stand-in; a real
      fine-tuned model drops into the same seam.
    * ``"fs"`` — UNSUPERVISED Fellegi-Sunter matcher
      (fellegi_sunter.score_features_fs): the same feature stage as the
      logistic path, checkpointed (``fs_pair_features``), then agreement
      gammas → EM-fitted m/u/λ → posterior, no labels anywhere. The
      bootstrap path for a corpus with no gold standard yet; the fitted
      parameters land in the run report (stages.scored_pairs.fs_*).

    All emit (id_l, id_r, …, score, match); stage checkpoints are
    keyed on the scorer choice, so switching scorers invalidates
    scored_pairs and downstream but resumes offers/candidates.

    ``salt_hot_ids=(n_salts, hot_threshold)`` opts the logistic scorer's
    hydration joins into differential hot-id salting (operators/skew.py).
    Off by default because block_offers's candidates are structurally
    skew-bounded already: an id appears in at most (blocking keys per
    offer) × max_block_size pairs — a few hundred with default params —
    so no id can concentrate a shuffle partition. Turn it on when the
    candidate table comes from OUTSIDE capped blocking (an external
    candidate list, knn negatives, a streaming join), where one id may
    carry millions of pairs. The salted plan is row-identical to the
    plain one (tests/test_skew.py), so it deliberately does NOT enter the
    stage params_key: flipping it never invalidates a checkpoint.

    ``stabilize_against=<previous workdir>`` re-keys this run's entity ids
    against that run's final assignment (operators/entity_ids.
    stabilize_entity_ids): every entity whose membership survives keeps
    its id, fresh ids start above the previous run's max. The stabilized
    table checkpoints as stage ``entities_stable`` (and is what the
    report's counts/evaluations see); inherited/fresh entity counts land
    in ``report["stabilize"]``. Pass the PREVIOUS run's workdir — its
    ``entities_stable`` (if it has one — chaining runs) or ``entities``
    stage is the anchor. Re-running in place (``stabilize_against ==
    workdir``, typically with ``force=True`` after the corpus grew) is
    supported: the previous assignment is snapshotted to stage
    ``entities_prev`` before any stage rebuild can overwrite it.

    ``max_entity_size=<cap>`` turns on the giant-component guard
    (operators/clustering.split_giant_components): after transitive
    closure, any entity larger than the cap is re-clustered on
    progressively stronger match edges (``split_ladder`` — calibrated
    scores, ascending; the default rungs walk 0.6→0.95). Entities at or
    under the cap are untouched, so the guard never perturbs confident
    small clusters; a component still oversized after the last rung stays
    as-is (a genuinely dense clique IS one entity). The cap and ladder
    enter the stage params_key — changing them rebuilds ``entities``
    and downstream — and the count of still-oversized entities lands in
    ``report["stages"]["entities"]["oversized_after_split"]``.

    ``pair_budget=<max expansion rows>`` data-drives the rare-token
    ``max_rare_df`` threshold instead of taking it as a constant:
    blocking.choose_max_rare_df costs each candidate threshold EXACTLY
    from token document frequencies (one tokenize + groupBy pass, no
    pairs materialized) and picks the largest whose rare-token
    pair-expansion row count fits the budget — the knob a 10^12-page run
    tunes blindly today becomes a measured decision. The chosen threshold
    and the full (threshold, n_keys, est_pairs) curve land in
    ``report["stages"]["candidate_pairs"]`` and the stage manifest, so
    the decision is auditable after the run. The planning pass runs only
    when the stage actually rebuilds (the stage key carries the budget,
    and the choice is a deterministic function of the checkpointed
    offers, so a resume needs no re-plan). Mutually exclusive with an
    explicit ``blocking_params["max_rare_df"]``.
    """
    weights = weights or S.DEFAULT_WEIGHTS
    bp = {
        "min_df": B.DEFAULT_MIN_DF,
        "max_df_frac": B.DEFAULT_MAX_DF_FRAC,
        "max_block_size": B.DEFAULT_MAX_BLOCK_SIZE,
        "num_hashes": B.DEFAULT_NUM_HASHES,
        "bands": B.DEFAULT_BANDS,
        "max_rare_df": None,
        "sn_window": None,
        "meta_prune": None,
        **(blocking_params or {}),
    }
    if pair_budget is not None and bp["max_rare_df"] is not None:
        raise ValueError(
            "pair_budget and blocking_params['max_rare_df'] both set — "
            "the budget exists to choose max_rare_df; pass one or the other"
        )
    cat = StageCatalog(spark, workdir)
    report: dict = {"stages": {}}

    prev_entities: DataFrame | None = None
    k_anchor: str | None = None
    if stabilize_against is not None:
        prev_cat = StageCatalog(spark, stabilize_against)
        prev_stage = next(
            (s for s in ("entities_stable", "entities") if prev_cat.exists(s)),
            None,
        )
        if prev_stage is None:
            raise ValueError(
                f"stabilize_against={stabilize_against!r} has no entities "
                "stage to anchor ids to (expected entities_stable or "
                "entities under that workdir)"
            )
        # the anchor's manifest entry identifies WHICH assignment we key
        # against — without it, a later run with a changed anchor would
        # resume a stale entities_stable checkpoint
        k_anchor = _params_key(
            anchor=stabilize_against,
            stage=prev_stage,
            entry=prev_cat.latest_entry(prev_stage),
        )
        prev_entities = prev_cat.read(prev_stage).select("id", "entity_id")
        if os.path.realpath(stabilize_against) == os.path.realpath(workdir):
            # In-place re-run: the stage rebuilds below overwrite the very
            # files prev_entities reads, so snapshot the previous assignment
            # to its own stage FIRST. The snapshot only READS the entities
            # stage — a crash mid-snapshot leaves it intact, and the
            # catalog's data→token→manifest commit order keeps a partial
            # entities_prev invisible to exists().
            cat.write(
                "entities_prev",
                prev_entities,
                params_key=_params_key(anchor=prev_stage),
            )
            prev_entities = cat.read("entities_prev").select("id", "entity_id")

    k_offers = _params_key(src=pages_path)
    # The offers checkpoint is re-joined on `id` by every downstream stage
    # (pair hydration ×2, entity assignment, training-set builds), so it is
    # checkpointed BUCKETED on id: one up-front shuffle at write time buys a
    # shuffle-free offers side in each of those joins — the dominant
    # repeated exchange of the pipeline at 100 TB. `offers_buckets=0`
    # (default) sizes the bucket count to the session's shuffle
    # parallelism; None disables bucketing (plain parquet checkpoint);
    # write_or_resume rebuilds if an existing checkpoint's layout differs.
    bucket_spec = None
    if offers_buckets is not None:
        n_buckets = offers_buckets or int(
            spark.conf.get("spark.sql.shuffle.partitions")
        )
        bucket_spec = (["id"], n_buckets)
    # schema-pinned scan (sources.readers.PAGES_SCHEMA): inferred schemas
    # drift between files at web scale; a bad pages directory should fail
    # at the declared scan boundary, not inside the extraction UDF
    offers, resumed = cat.write_or_resume(
        "offers",
        lambda: extract_offers(read_pages(spark, pages_path)).where(
            F.col("id").isNotNull()
        ),
        params_key=k_offers,
        force=force,
        bucket_by=bucket_spec,
        sort_cols=["id"] if bucket_spec else None,
    )
    report["stages"]["offers"] = {"resumed": resumed}

    from ..operators.metrics_ops import MetricTracker

    k_pairs = _params_key(parent=k_offers, pair_budget=pair_budget, **bp)
    # Dropped-block observability (no-silent-caps): the size cap forfeits
    # every pair inside an oversized block; these observe()-backed counters
    # ride the stage's own write job and land in the manifest entry, so the
    # recall trade is measurable per run instead of silent.
    block_tracker = MetricTracker()
    budget_decision: dict = {}

    def _blocking_metrics() -> dict:
        block_tracker.harvest()
        return {
            "blocking_dropped_keys": int(block_tracker.total("blocking_dropped_keys")),
            "blocking_dropped_rows": int(block_tracker.total("blocking_dropped_rows")),
            "blocking_dropped_pairs": int(block_tracker.total("blocking_dropped_pairs")),
            **budget_decision,
        }

    def _build_candidates() -> DataFrame:
        max_rare_df = bp["max_rare_df"]
        if pair_budget is not None:
            max_rare_df, curve = B.choose_max_rare_df(
                offers,
                pair_budget,
                min_df=bp["min_df"],
                max_df_frac=bp["max_df_frac"],
                max_block_size=bp["max_block_size"],
            )
            budget_decision.update(
                {
                    "pair_budget": int(pair_budget),
                    "chosen_max_rare_df": int(max_rare_df),
                    "pair_budget_curve": [
                        {k: int(v) for k, v in c.items()} for c in curve
                    ],
                }
            )
        return B.block_offers(
            offers,
            min_df=bp["min_df"],
            max_df_frac=bp["max_df_frac"],
            max_rare_df=max_rare_df,
            max_block_size=bp["max_block_size"],
            num_hashes=bp["num_hashes"],
            bands=bp["bands"],
            tracker=block_tracker,
            sn_window=bp["sn_window"],
            meta_prune=bp["meta_prune"],
        )

    candidates, resumed = cat.write_or_resume(
        "candidate_pairs",
        _build_candidates,
        params_key=k_pairs,
        force=force,
        extra_after=_blocking_metrics,
    )
    report["stages"]["candidate_pairs"] = {"resumed": resumed, **budget_decision}

    n_offers = (cat.latest_entry("offers") or {}).get("rows")

    if scorer == "logistic":
        k_scored = _params_key(parent=k_pairs, weights=weights)
        build_scored = lambda: S.score_candidates(  # noqa: E731
            candidates, offers, weights=weights, n_offers=n_offers,
            salt_hot_ids=salt_hot_ids,
        ).select("id_l", "id_r", *S.FEATURES, "logit", "score", "match")
    elif scorer == "encoder":
        from ..operators.bert_scoring import score_candidates_with_encoder

        k_scored = _params_key(parent=k_pairs, scorer="encoder")
        # unknown size must take the SAFE (non-broadcast) direction — an
        # absent manifest row count with broadcast on would ship an
        # arbitrarily large offers table to every task
        build_scored = lambda: score_candidates_with_encoder(  # noqa: E731
            candidates,
            offers,
            broadcast_offers=n_offers is not None
            and n_offers <= S.TEXT_BROADCAST_MAX_OFFERS,
        )
    elif scorer == "fs":
        from ..operators.fellegi_sunter import (
            FS_FEATURE_THRESHOLDS,
            score_features_fs,
        )

        # Checkpoint the feature table first: the EM fit's pattern-count
        # pass and the scoring pass each scan it once, and re-running the
        # pandas-UDF feature stage twice would double the expensive step.
        k_feat = _params_key(parent=k_pairs, stage="fs_features")
        feats, fres = cat.write_or_resume(
            "fs_pair_features",
            lambda: S.score_candidates(
                candidates, offers, n_offers=n_offers,
                salt_hot_ids=salt_hot_ids,
            ).select("id_l", "id_r", *S.FEATURES),
            params_key=k_feat,
            force=force,
        )
        report["stages"]["fs_pair_features"] = {"resumed": fres}
        fs_stats: dict = {}
        k_scored = _params_key(
            parent=k_feat, scorer="fs", thresholds=FS_FEATURE_THRESHOLDS
        )
        build_scored = lambda: score_features_fs(  # noqa: E731
            feats, stats=fs_stats
        )
    else:
        raise ValueError(f"unknown scorer {scorer!r} (logistic|encoder|fs)")
    scored, resumed = cat.write_or_resume(
        "scored_pairs", build_scored, params_key=k_scored, force=force
    )
    report["stages"]["scored_pairs"] = {"resumed": resumed}
    if scorer == "fs" and fs_stats:
        report["stages"]["scored_pairs"].update(fs_stats)

    if max_entity_size is None:
        k_ent = _params_key(parent=k_scored)
        build_entities = lambda: assign_entities(  # noqa: E731
            offers, scored.where("match")
        )
    else:
        from ..operators.clustering import split_giant_components

        k_ent = _params_key(
            parent=k_scored,
            max_entity_size=max_entity_size,
            split_ladder=list(split_ladder),
        )

        def build_entities():
            comp = split_giant_components(
                scored.where("match"), max_entity_size, list(split_ladder)
            )
            return (
                offers.select("id")
                .join(comp, "id", "left")
                .select(
                    "id",
                    F.coalesce("entity_id", F.col("id")).alias("entity_id"),
                )
            )

    entities, resumed = cat.write_or_resume(
        "entities", build_entities, params_key=k_ent, force=force
    )
    report["stages"]["entities"] = {"resumed": resumed}
    if max_entity_size is not None:
        oversized = (
            entities.groupBy("entity_id")
            .agg(F.count("*").alias("_n"))
            .where(F.col("_n") > max_entity_size)
            .count()
        )
        report["stages"]["entities"]["oversized_after_split"] = int(oversized)

    if prev_entities is not None:
        from ..operators.entity_ids import stabilize_entity_ids

        raw_entities = entities
        k_stab = _params_key(parent=k_ent, anchor=k_anchor)
        entities, resumed = cat.write_or_resume(
            "entities_stable",
            lambda: stabilize_entity_ids(prev_entities, raw_entities),
            params_key=k_stab,
            force=force,
        )
        report["stages"]["entities_stable"] = {"resumed": resumed}
        stab = entities.agg(
            F.count_distinct(
                F.when(F.col("inherited"), F.col("entity_id"))
            ).alias("inherited_entities"),
            F.count_distinct(
                F.when(~F.col("inherited"), F.col("entity_id"))
            ).alias("fresh_entities"),
        ).collect()[0]
        report["stabilize"] = {
            "anchor": stabilize_against,
            "inherited_entities": int(stab["inherited_entities"]),
            "fresh_entities": int(stab["fresh_entities"]),
        }
        # the per-entity delta feed (operators/entity_diff.py): what a
        # downstream consumer applies instead of re-reading the full entity
        # table — checkpointed like any stage, sized by the change set
        from ..operators.entity_diff import entity_changelog

        stable_view = entities.select("id", "entity_id")
        changelog, resumed = cat.write_or_resume(
            "entity_changelog",
            lambda: entity_changelog(prev_entities, stable_view),
            params_key=k_stab,
            force=force,
        )
        report["stages"]["entity_changelog"] = {"resumed": resumed}
        report["stabilize"]["changelog"] = {
            r["change"]: int(r["n"])
            for r in changelog.groupBy("change")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        # downstream consumers (B-cubed, pairwise eval, counts) see the
        # STABLE ids — relabel-invariant metrics are unchanged, but the
        # report/metrics tables now key on ids that survive the next run
        entities = entities.select("id", "entity_id")

    if truth_path:
        # Training-set construction (the reference's three-script stage):
        # needs ground-truth cluster ids, which live in the truth table —
        # the reference's corpus carries cluster_id natively.
        from ..operators.training_sets import build_training_pairs

        k_train = _params_key(parent=k_offers, truth=truth_path, amount=training_amount)
        training, resumed = cat.write_or_resume(
            "training_pairs",
            lambda: build_training_pairs(
                B.build_title_for_ts(
                    offers.join(
                        spark.read.parquet(truth_path).select("id", "cluster_id"),
                        "id",
                    )
                ),
                amount=training_amount,
            ),
            params_key=k_train,
            force=force,
        )
        report["stages"]["training_pairs"] = {"resumed": resumed}
        report.setdefault("counts", {})["training_pairs"] = training.count()

        # cluster-LEVEL evaluation (B-cubed): the pairwise F1 below judges
        # edge decisions; this judges the resolved partition itself —
        # over-merged entities show up here as precision loss even when
        # every labeled pair is classified correctly.
        from ..operators.metrics_ops import bcubed_metrics

        report["bcubed_eval"] = bcubed_metrics(
            entities,
            spark.read.parquet(truth_path).select(
                "id", F.col("cluster_id").alias("truth_id")
            ),
        )

    # stage row counts come from the checkpoint manifest (already computed
    # during each write) — no re-count jobs; only the two derived figures
    # (match edges, distinct entities) run aggregations.
    # one aggregate over the entity-size distribution: distinct entity
    # count plus the largest entity — the number the giant-component guard
    # exists to bound, reported whether or not the guard is on so an
    # unguarded run's chaining is visible from the report alone
    ent_stats = (
        entities.groupBy("entity_id")
        .agg(F.count("*").alias("_n"))
        .agg(
            F.count("*").alias("n_entities"),
            F.max("_n").alias("max_size"),
        )
        .collect()[0]
    )
    report["counts"] = {
        **report.get("counts", {}),
        "offers": n_offers,
        "candidate_pairs": (cat.latest_entry("candidate_pairs") or {}).get("rows"),
        "match_edges": scored.where("match").count(),
        "entities": int(ent_stats["n_entities"]),
        "max_entity_size": int(ent_stats["max_size"] or 0),
    }

    if labeled_path:
        labeled = spark.read.parquet(labeled_path)
        metrics = evaluate_pairwise(entities, labeled)
        report["pairwise_eval"] = metrics
        mdf = spark.createDataFrame(
            [
                (
                    k,
                    float(v) if v is not None else None,
                )
                for k, v in metrics.items()
            ],
            "metric string, value double",
        )
        cat.write("metrics", mdf, params_key=k_ent)

        # threshold sweep over the scorer's raw scores on the labeled
        # pairs: instead of inheriting the fixed 0.5 cutoff, report the
        # full PR curve and the F1-max threshold so the next run can set
        # it from data. Only pairs the blocker surfaced carry a score —
        # labeled pairs blocking missed are the blocker's recall loss
        # (report["bcubed_eval"] / blocking_quality's axis), not the
        # cutoff's, so they are rightly absent here. Scale shape: one
        # orientation-normalized equi-join, then the bounded-window sweep.
        from ..operators.metrics_ops import pr_threshold_sweep

        lab_scored = scored.select(
            F.least("id_l", "id_r").alias("u"),
            F.greatest("id_l", "id_r").alias("v"),
            "score",
        ).join(
            labeled.select(
                F.least("id_left", "id_right").alias("u"),
                F.greatest("id_left", "id_right").alias("v"),
                "label",
            ),
            ["u", "v"],
        )
        curve = pr_threshold_sweep(lab_scored)
        cat.write("threshold_curve", curve, params_key=k_ent)
        # best row from the checkpointed curve (same tie-break as
        # metrics_ops.best_threshold: F1-max, lowest threshold wins)
        best = (
            cat.read("threshold_curve")
            .orderBy(F.desc_nulls_last("f1"), F.asc("threshold"))
            .limit(1)
            .collect()
        )
        report["threshold_eval"] = {
            "n_labeled_scored": lab_scored.count(),
            "best": best[0].asDict() if best else {},
        }
    return report


def main() -> None:  # pragma: no cover - CLI entry
    import argparse

    from ..session import get_spark

    p = argparse.ArgumentParser()
    p.add_argument("--pages", required=True)
    p.add_argument("--workdir", required=True)
    p.add_argument("--labeled")
    p.add_argument(
        "--scorer", choices=("logistic", "encoder", "fs"), default="logistic"
    )
    p.add_argument("--force", action="store_true")
    p.add_argument(
        "--stabilize-against",
        help="previous run's workdir: carry its entity ids forward",
    )
    args = p.parse_args()
    spark = get_spark("er-pipeline")
    report = run_pipeline(
        spark, args.pages, args.workdir, labeled_path=args.labeled,
        scorer=args.scorer, force=args.force,
        stabilize_against=args.stabilize_against,
    )
    print(json.dumps(report, indent=2, default=str))
    spark.stop()


if __name__ == "__main__":  # pragma: no cover
    main()
