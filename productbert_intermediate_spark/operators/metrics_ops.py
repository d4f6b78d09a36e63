"""Evaluation aggregates (SURVEY.md §2.4 A4/A5): confusion matrix + P/R/F1.

One-pass conditional-sum aggregation replaces the reference's tensor loops
(/root/reference/src/productbert/model/metric.py:29-59); the scalar
zero-division guards mirror utils/util.py:30-50 (undefined → None instead of
the reference's 'undefined' string / sys.exit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# sentinel: an observation whose action FAILED (vs one still pending) —
# harvest() drops it instead of re-polling it to the deadline forever
_DEAD = object()


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


class MetricTracker:
    """Running mean per metric key across actions (SURVEY §2.4 A8).

    The reference accumulates (total, count, average) per metric key over
    training batches (/root/reference/src/productbert/utils/util.py:74-98).
    The Spark analog rides on ``DataFrame.observe``: ``attach`` registers
    sum/count aggregates that are computed DURING the df's next action — a
    stage's metrics cost zero extra jobs — and ``harvest`` folds them into
    the running totals. ``update``/``avg``/``result`` mirror the reference
    API for driver-side scalars.
    """

    def __init__(self, *keys: str) -> None:
        self._totals: dict[str, float] = {k: 0.0 for k in keys}
        self._counts: dict[str, int] = {k: 0 for k in keys}
        self._pending: list = []
        # public-API fallback state: one (thread, result box) per observation
        self._getters: dict[int, tuple] = {}

    def _ensure(self, key: str) -> None:
        self._totals.setdefault(key, 0.0)
        self._counts.setdefault(key, 0)

    def update(self, key: str, value: float, n: int = 1) -> None:
        self._ensure(key)
        self._totals[key] += float(value) * n
        self._counts[key] += n

    def attach(self, df: DataFrame, **metrics) -> DataFrame:
        """Register per-key value Columns; returns the observed DataFrame.

        Each key contributes sum(value) and count(value) when the returned
        df is next materialized. Call ``harvest()`` after that action.
        """
        from pyspark.sql import Observation

        obs = Observation()
        aggs = []
        for key, col in metrics.items():
            self._ensure(key)
            aggs.append(F.sum(col).alias(f"{key}__sum"))
            aggs.append(F.count(col).alias(f"{key}__n"))
        self._pending.append(obs)
        return df.observe(obs, *aggs)

    def harvest(self, timeout_s: float = 10.0) -> None:
        """Fold every COMPLETED observation into the running totals.

        Bounded wait: completed actions are always harvested (the JVM
        observation is filled by a listener thread that can lag the action
        by more than ``getRowOrEmpty``'s internal 100 ms poll, so each
        pending observation is re-polled until a SHARED ``timeout_s``
        deadline). An observation whose action never ran or failed stays
        pending for a later harvest — the tracker can never park the
        driver forever the way bare ``Observation.get`` does, and a dead
        observation costs at most the remaining deadline per harvest call,
        not an infinite wait.
        """
        import time as _time

        deadline = _time.monotonic() + timeout_s
        still_pending = []
        for obs in self._pending:
            while True:
                got = self._try_get(obs)
                if got is _DEAD:
                    # terminal: the observed action failed — drop the
                    # observation (and its getter thread's box) instead of
                    # re-polling it to the deadline on every future harvest
                    self._getters.pop(id(obs), None)
                    break
                if got is not None:
                    self._getters.pop(id(obs), None)
                    for name, val in got.items():
                        key, kind = name.rsplit("__", 1)
                        if kind == "sum":
                            self._totals[key] += float(val or 0.0)
                        else:
                            self._counts[key] += int(val or 0)
                    break
                if _time.monotonic() >= deadline:
                    still_pending.append(obs)
                    break
        self._pending = still_pending

    @staticmethod
    def _peek_completed(obs) -> bool:
        """Non-blocking-ish completion peek via the private JVM handle;
        raises wherever that handle is absent (Spark Connect) or renamed
        (future PySpark) — callers fall back to the public API then."""
        return obs._jo.getRowOrEmpty().isDefined()

    def _try_get(self, obs):
        """Completed observation's metrics dict, ``_DEAD`` if the observed
        action failed (terminal — caller must drop it), or None (pending).

        Fast path peeks the JVM result via the private ``_jo`` handle —
        ``getRowOrEmpty`` awaits up to ~100 ms internally, so the harvest
        loop is a bounded poll, not a busy spin. That handle doesn't exist
        on Spark Connect and is private API, so any failure falls back to
        the public blocking ``Observation.get`` run in ONE daemon thread
        per observation (reused across polls — a completed get is cached in
        its result box; an observation whose action never runs parks only
        the daemon thread, never the driver).
        """
        import threading
        import time as _time

        try:
            if self._peek_completed(obs):
                return obs.get  # completed → returns immediately
            return None
        except Exception:
            pass
        box = self._getters.get(id(obs))
        if box is None:
            result: dict = {}

            def _block_get() -> None:
                try:
                    result["v"] = obs.get
                except Exception:  # pragma: no cover - defensive
                    result["e"] = True

            t = threading.Thread(target=_block_get, daemon=True)
            t.start()
            self._getters[id(obs)] = (t, result)
            box = (t, result)
        t, result = box
        t.join(0.1)
        _time.sleep(0)  # yield so the getter thread can publish
        if result.get("e"):
            return _DEAD
        return result.get("v")

    def avg(self, key: str) -> float | None:
        n = self._counts.get(key, 0)
        return self._totals[key] / n if n else None

    def total(self, key: str) -> float:
        """Harvested SUM for a key — the accessor for counter-style metrics
        (e.g. dropped-key counts), where the mean over rows is meaningless."""
        return self._totals.get(key, 0.0)

    def result(self) -> dict[str, float | None]:
        return {k: self.avg(k) for k in self._totals}


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


def blocking_quality(
    candidates: DataFrame, truth: DataFrame, n_records: int
) -> DataFrame:
    """Standard blocking evaluation: pair completeness + reduction ratio.

    A blocker is judged on two axes (Christen, "Data Matching", ch. 7 —
    public methodology): what fraction of TRUE matching pairs survive into
    the candidate set (pair completeness = blocking recall; a pair dropped
    here is unrecoverable by any downstream matcher), and what fraction of
    the n·(n-1)/2 possible comparisons it avoided (reduction ratio). The
    reference never measures this — its blocking quality is implicit in
    end-task F1 — but it's the first number a user tunes min_df /
    max_block_size / bands against.

    Both inputs are (id_l, id_r); orientation and duplicates are normalized
    here (least/greatest + distinct), so callers can pass raw pair tables.
    Returns ONE row: n_candidates, n_truth, n_captured, pair_completeness,
    reduction_ratio. Scale shape: two distinct-aggregations and one
    broadcast-size join of two id-pair tables — no member data moves; the
    ratios are single IEEE divisions of exact counts, so the output is
    hash-stable across engines and parallelism.
    """

    def _norm(df: DataFrame) -> DataFrame:
        return df.select(
            F.least("id_l", "id_r").alias("u"),
            F.greatest("id_l", "id_r").alias("v"),
        ).where(F.col("u") != F.col("v")).distinct()

    c, t = _norm(candidates), _norm(truth)
    cap = c.join(t, ["u", "v"]).count()
    n_c, n_t = c.count(), t.count()
    total = n_records * (n_records - 1) / 2
    spark = candidates.sparkSession
    return spark.createDataFrame(
        [(
            n_c,
            n_t,
            cap,
            (cap / n_t) if n_t else None,
            (1.0 - n_c / total) if total else None,
        )],
        "n_candidates long, n_truth long, n_captured long, "
        "pair_completeness double, reduction_ratio double",
    )


def bcubed_cells(pred: DataFrame, truth: DataFrame) -> DataFrame:
    """Contingency cells for B-cubed cluster evaluation (Bagga & Baldwin
    1998 — the standard CLUSTER-level ER metric; pairwise P/R/F1 above
    over-weights large clusters, B-cubed averages per RECORD).

    Inputs: pred (id, entity_id), truth (id, truth_id); records present in
    both are evaluated (inner join — unlabeled records can't be judged).
    Output: one row per non-empty (entity_id, truth_id) cell with n_cell
    (records in both clusters), n_pred (predicted-cluster size), n_truth
    (truth-cluster size) — all exact integers, so the table hash-compares
    across engines and parallelism. Scale shape: one id equi-join, three
    partial-aggregable counts, two key joins; nothing touches the driver.
    """
    j = pred.join(truth, "id").select("entity_id", "truth_id")
    cells = j.groupBy("entity_id", "truth_id").agg(F.count("*").alias("n_cell"))
    psize = j.groupBy("entity_id").agg(F.count("*").alias("n_pred"))
    tsize = j.groupBy("truth_id").agg(F.count("*").alias("n_truth"))
    return cells.join(psize, "entity_id").join(tsize, "truth_id").select(
        "entity_id", "truth_id", "n_cell", "n_pred", "n_truth"
    )


def bcubed_metrics(pred: DataFrame, truth: DataFrame) -> dict[str, float | None]:
    """B-cubed precision/recall/F1 from the exact cells:

        precision = (1/N) Σ_cells n_cell² / n_pred
        recall    = (1/N) Σ_cells n_cell² / n_truth

    (each record in a cell contributes n_cell/n_pred precision, and there
    are n_cell of them). One aggregation job over the cells table.
    """
    row = bcubed_cells(pred, truth).agg(
        F.sum(F.col("n_cell") * F.col("n_cell") / F.col("n_pred")).alias("p"),
        F.sum(F.col("n_cell") * F.col("n_cell") / F.col("n_truth")).alias("r"),
        F.sum("n_cell").alias("n"),
    ).collect()[0]
    if not row["n"]:
        return {"bcubed_precision": None, "bcubed_recall": None, "bcubed_f1": None}
    p, r = row["p"] / row["n"], row["r"] / row["n"]
    f1 = 2 * p * r / (p + r) if (p + r) > 0 else None
    return {"bcubed_precision": p, "bcubed_recall": r, "bcubed_f1": f1}


def pr_threshold_sweep(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 1000,
) -> DataFrame:
    """Precision/recall/F1 at EVERY candidate decision threshold in one
    distributed pass — the sweep a user runs to pick the matcher cutoff
    instead of inheriting the reference's hard-coded 0.5
    (/root/reference/src/productbert/model/metric.py:29-33 fixes
    ``sigmoid(logit) > 0.5``; choosing it from data needs this curve).

    Scores (contract: in [0, 1]) are binned to ``n_bins`` fixed-width
    buckets; the output has one row per OCCUPIED bin b with the exact
    confusion counts of the rule ``score >= b / n_bins``:

        threshold = b / n_bins, tp, fp, fn, precision, recall, f1

    Scale shape: one partial-aggregable groupBy(bin) reduces the input to
    at most n_bins + 1 rows, and only THAT bounded table flows through the
    cumulative window — the no-partition window's single partition holds
    O(n_bins) rows by construction, never O(input). All counts are exact
    integers; the ratios are single IEEE divisions of exact counts, so the
    curve hash-compares across engines and parallelism. tp + fp >= 1 on
    every emitted row (the cumulative sum includes the row's own bin), so
    precision needs no zero-guard; recall/f1 are NULL when the input has
    no positives at all.
    """
    from pyspark.sql import Window

    pos = F.col(label_col).cast("int")
    per_bin = (
        scored.groupBy(
            F.floor(F.col(score_col) * n_bins).cast("long").alias("_bin")
        )
        .agg(
            F.sum(pos).alias("_pos"),
            F.sum(F.lit(1) - pos).alias("_neg"),
        )
    )
    w_cum = Window.orderBy(F.desc("_bin")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy(F.desc("_bin")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tp = F.sum("_pos").over(w_cum)
    fp = F.sum("_neg").over(w_cum)
    total_pos = F.sum("_pos").over(w_all)
    cum = per_bin.select(
        (F.col("_bin") / F.lit(n_bins)).alias("threshold"),
        tp.alias("tp"),
        fp.alias("fp"),
        (total_pos - tp).alias("fn"),
        (tp / (tp + fp)).alias("precision"),
        F.when(total_pos > 0, tp / total_pos).alias("recall"),
    )
    p, r = F.col("precision"), F.col("recall")
    return cum.withColumn(
        "f1", F.when(r.isNotNull() & (p + r > 0), 2 * p * r / (p + r))
    )


def score_drift_cells(
    current: DataFrame,
    baseline: DataFrame,
    score_col: str = "score",
    n_bins: int = 100,
) -> DataFrame:
    """Exact per-bin histogram cells of two score snapshots — the raw
    material for monitoring a deployed matcher: when the score
    distribution drifts off the one the threshold was swept on
    (pr_threshold_sweep), it is time to re-label (uncertainty_sample)
    and recalibrate. One row per bin occupied in EITHER snapshot
    (full-outer on bin, absent side zero-filled):

        bin, n_current, n_baseline

    All exact integers, so the table hash-compares across engines and
    parallelism. Scale shape: two partial-aggregable groupBy(bin) passes
    and one join over <= n_bins + 1 rows per side; nothing driver-side.
    """

    def binned(df: DataFrame, name: str) -> DataFrame:
        return df.groupBy(
            F.floor(F.col(score_col) * n_bins).cast("long").alias("bin")
        ).agg(F.count("*").alias(name))

    return (
        binned(current, "n_current")
        .join(binned(baseline, "n_baseline"), "bin", "full_outer")
        .select(
            "bin",
            F.coalesce("n_current", F.lit(0)).alias("n_current"),
            F.coalesce("n_baseline", F.lit(0)).alias("n_baseline"),
        )
    )


def population_stability_index(
    current: DataFrame,
    baseline: DataFrame,
    score_col: str = "score",
    n_bins: int = 100,
    epsilon: float = 1e-6,
) -> float | None:
    """PSI over :func:`score_drift_cells` — the standard drift scalar
    (rule of thumb: < 0.1 stable, 0.1-0.25 drifting, > 0.25 act). Zero
    cells are epsilon-smoothed so a bin appearing/disappearing scores a
    large-but-finite contribution. The collect is k-bounded: <= n_bins + 1
    rows for scores in [0, 1]. Returns None when either snapshot is empty
    (no distribution to compare)."""
    import math

    cells = score_drift_cells(current, baseline, score_col, n_bins).collect()
    tot_c = sum(r["n_current"] for r in cells)
    tot_b = sum(r["n_baseline"] for r in cells)
    if not tot_c or not tot_b:
        return None
    psi = 0.0
    for r in cells:
        p = max(r["n_current"] / tot_c, epsilon)
        q = max(r["n_baseline"] / tot_b, epsilon)
        psi += (p - q) * math.log(p / q)
    return psi


def best_threshold(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 1000,
) -> dict[str, float | int | None]:
    """The F1-maximizing row of :func:`pr_threshold_sweep`, ties broken
    toward the LOWEST threshold (maximal recall at equal F1) — both
    engines and any partition count agree on the winner. One k-bounded
    action (k = 1)."""
    rows = (
        pr_threshold_sweep(scored, score_col, label_col, n_bins)
        .orderBy(F.desc_nulls_last("f1"), F.asc("threshold"))
        .limit(1)
        .collect()
    )
    return rows[0].asDict() if rows else {}
