"""One-to-one match assignment: from scored pairs to a matching.

The reference stops at pairwise decisions: its matchers emit a label per
candidate pair (predict_intermediate.py writes one prediction row per
pair) and the dedup path resolves conflicts by transitive closure into
entities. Clean-clean linkage (operators/linkage.py) has a different
conflict rule: each left record corresponds to AT MOST ONE right record
and vice versa (two curated catalogs each already deduplicated), so the
post-scoring step is a bipartite matching over the scored pairs, not a
closure. This module provides the two standard decision rules:

* ``reciprocal_best_match`` — keep (l, r) iff r is l's best-scored
  partner AND l is r's best (symmetric best match; Magellan / Dedupe's
  default one-to-one heuristic). One pass, two windows.
Both treat the pair table as BIPARTITE: id_l and id_r are separate
namespaces (the clean-clean invariant — linkage.link_candidate_pairs
emits left ids on id_l and right ids on id_r only). For dirty/dedup
matching, where one id space appears on both sides, use transitive
closure (operators/clustering.py) instead — one-to-one is not the right
conflict rule there.

* ``greedy_one_to_one`` — the sequential greedy matching: walk pairs in
  (score desc, id_l, id_r) order, accept a pair iff neither endpoint is
  already matched. Greedy is a 1/2-approximation to the maximum-weight
  matching and is the usual ER choice (Hungarian is O(n^3) and needs the
  full matrix). Computed WITHOUT sequential iteration over rows: per
  round, accept every LOCALLY DOMINANT pair (first in the total order
  among all pairs sharing either endpoint), remove matched endpoints,
  repeat. With a strict total order this parallel fixpoint provably
  equals the sequential greedy result (Preis 1999; Manne & Bisseling
  2007, the distributed weighted-matching literature) — asserted against
  a literal sequential reference in tests/test_assignment.py.

Scale shape: reciprocal best is two window ranks over the pair table
(partitioned by id_l / id_r — the same shuffle keys scoring already
used). Greedy rounds are each two window ranks + one semi/anti join;
rounds needed = length of the longest "domino chain" where accepting one
pair unblocks the next (typically O(log n) on score-noise data; the
strictly-decreasing-path worst case is O(n/2), so ``max_rounds`` guards
with a loud error rather than silent truncation). Per-round
localCheckpoint keeps lineage O(1) exactly like connected components
(operators/clustering.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Deterministic strict total order on pairs: best score first, then ids.
#: Both algorithms and the tests' sequential reference use THIS order, so
#: ties never make the result partition-dependent.
def _pair_order(score_col: str):
    return [
        F.col(score_col).desc(),
        F.col("id_l").asc(),
        F.col("id_r").asc(),
    ]


def reciprocal_best_match(
    pairs: DataFrame, score_col: str = "score"
) -> DataFrame:
    """(id_l, id_r, score, ...) → the subset where each side is the
    other's rank-1 partner under (score desc, id_l, id_r).

    Output is a valid matching: rank-1 per id_l means no id_l repeats,
    rank-1 per id_r means no id_r repeats. More conservative than greedy
    (a record whose best partner prefers someone else stays unmatched
    even if its second-best is mutual) — use greedy_one_to_one when
    recall matters more than the mutual-preference guarantee.
    """
    order = _pair_order(score_col)
    rl = F.row_number().over(Window.partitionBy("id_l").orderBy(*order))
    rr = F.row_number().over(Window.partitionBy("id_r").orderBy(*order))
    return (
        pairs.withColumn("_rl", rl)
        .withColumn("_rr", rr)
        .where((F.col("_rl") == 1) & (F.col("_rr") == 1))
        .drop("_rl", "_rr")
    )


def greedy_one_to_one(
    pairs: DataFrame,
    score_col: str = "score",
    max_rounds: int = 100,
    residual_rows_budget: int = 100_000,
) -> DataFrame:
    """(id_l, id_r, score, ...) → the sequential-greedy matching.

    Equivalent to: sort pairs by (score desc, id_l, id_r); accept each
    pair whose endpoints are both still free. Implemented as the
    locally-dominant-pair fixpoint (module docstring): per round a pair
    is accepted iff it is rank 1 in that order within BOTH its id_l
    group and its id_r group among still-live pairs; its endpoints'
    remaining pairs are then discarded. Two accepted pairs can't share
    an endpoint (each is rank 1 at every endpoint it touches), and an
    induction over rounds shows the accepted set equals the sequential
    walk's.

    Residual finish: the live set shrinks geometrically (measured ~2× a
    round on real scores), so the tail of the fixpoint is many tiny
    driver-synchronous rounds over a few thousand rows. Once the live
    set fits ``residual_rows_budget`` (id/score rows — 100k ≈ single-MB
    driver transfer), it is collected and finished with the literal
    sequential walk, which by the same induction continues the fixpoint
    exactly: every pair touching an accepted endpoint is already gone,
    so the walk over the residual in (score desc, id_l, id_r) order is
    precisely the remainder of the global sequential walk. This both
    cuts the round count (bench: 10 rounds → 2) and removes the old
    RuntimeError crash path for adversarial strictly-score-decreasing
    chains: the chain's live set still shrinks every round (by at least
    the accepted pairs), so it eventually fits the budget and completes
    with the exact greedy result. max_rounds now only guards a live set
    that stops shrinking AND never fits the budget — unreachable for
    finite inputs that shrink, so the error names the budget too.
    """
    order = _pair_order(score_col)
    rl = F.row_number().over(Window.partitionBy("id_l").orderBy(*order))
    rr = F.row_number().over(Window.partitionBy("id_r").orderBy(*order))

    live = pairs.localCheckpoint(eager=True)
    accepted: DataFrame | None = None
    for _ in range(max_rounds):
        n_live = live.count()
        if n_live == 0:
            return accepted if accepted is not None else live
        if n_live <= residual_rows_budget:
            finished = _sequential_greedy_residual(live, score_col)
            return (
                finished
                if accepted is None
                else accepted.unionByName(finished)
            )
        dominant = (
            live.withColumn("_rl", rl)
            .withColumn("_rr", rr)
            .where((F.col("_rl") == 1) & (F.col("_rr") == 1))
            .drop("_rl", "_rr")
            # one round's winners are consumed three times (accumulate +
            # two anti-joins) and seed the next round's lineage
            .localCheckpoint(eager=True)
        )
        accepted = (
            dominant
            if accepted is None
            else accepted.unionByName(dominant)
        )
        matched_l = dominant.select("id_l")
        matched_r = dominant.select("id_r")
        live = (
            live.join(matched_l, "id_l", "left_anti")
            .join(matched_r, "id_r", "left_anti")
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(
        f"greedy_one_to_one did not converge in {max_rounds} rounds with "
        f"the live set never fitting residual_rows_budget="
        f"{residual_rows_budget}; raise max_rounds or the budget"
    )


def _sequential_greedy_residual(live: DataFrame, score_col: str) -> DataFrame:
    """Finish the fixpoint on a budget-bounded live set: collect only the
    (id_l, id_r, score) proxy columns, run the literal sequential greedy
    walk, and semi-join the winners back against the live rows — the full
    rows (features etc.) never transit the driver."""
    import pandas as pd

    spark = live.sparkSession
    proxy = live.select("id_l", "id_r", F.col(score_col).alias("_s"))
    # Arrow toPandas, not collect(): the proxy is up to residual_rows_budget
    # rows and row-at-a-time py4j deserialization is the measured driver
    # cost of this finish (guide §6 — Arrow for driver transfers). The
    # (score desc, id_l, id_r) order is total (pairs are unique on the id
    # columns), so the sort is deterministic.
    pdf = proxy.toPandas().sort_values(
        ["_s", "id_l", "id_r"], ascending=[False, True, True]
    )
    taken_l: set = set()
    taken_r: set = set()
    won_l: list = []
    won_r: list = []
    for il, ir in zip(pdf["id_l"].to_numpy(), pdf["id_r"].to_numpy()):
        if il in taken_l or ir in taken_r:
            continue
        taken_l.add(il)
        taken_r.add(ir)
        won_l.append(il)
        won_r.append(ir)
    if not won_l:
        return live.where(F.lit(False))
    winners = spark.createDataFrame(
        pd.DataFrame({"id_l": won_l, "id_r": won_r})
    ).hint("broadcast")
    return live.join(winners, ["id_l", "id_r"], "left_semi")
