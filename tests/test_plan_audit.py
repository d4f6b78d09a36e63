"""Physical-plan scale audit over every registry query.

A query can be value-correct at sf0.001 and still carry a plan that dies at
the 100 TB design point — a per-group cartesian, or a no-partition window
funnelling all rows through one task. This guard asserts those shapes never
(re)appear, with an explicit allowlist for the three constructs that are
bounded by something other than input size (and documents why for each).
"""

import pytest

from productbert_intermediate_spark.plans.testdata_queries import REGISTRY

from tests.conftest import TESTDATA_SF_DIR as SF_DIR

# BroadcastNestedLoopJoin is acceptable only when the broadcast side is a
# constant-size frame (here: the single query vector crossJoined against
# the corpus — a map-only broadcast scan, not an O(n^2) join).
# fs_tf_adjusted_score: term_frequency's crossJoin of a ONE-ROW broadcast
# total onto the value-domain counts plans as a BroadcastNestedLoopJoin —
# O(1) broadcast side, never O(input).
NLJ_ALLOWED = {"ann_cosine_matches", "ann_topk", "fs_tf_adjusted_score"}

# SinglePartition exchanges allowed only where the single partition holds
# O(1) or O(num_partitions) rows, never O(input):
#  - confusion_matrix: final merge of one 4-counter row (partial aggs are
#    map-side and parallel);
#  - label_encode / fk_surrogate_join / stable_entity_ids: dense_ids'
#    cumulative-offset window runs over one row per partition
#    (operators/ids.py), not over the keys (verified: the only
#    SinglePartition in stable_entity_ids' plan sits over the
#    HashAggregate(keys=[_pid]) per-partition counts).
#  - pr_threshold_sweep: the cumulative window runs over the groupBy(bin)
#    output — at most n_bins + 1 rows by construction (the partial aggs
#    that reduce the input to it are map-side and parallel), never O(input).
#  - fs_em_onestep: the EM M-step's global agg merges map-side partial sums
#    (one 13-sum row per partition) — and its INPUT is already the ≤ 2^k
#    pattern-counts table, so even the partials see ≤ 2^k rows, never the
#    candidate pairs (operators/fellegi_sunter.py scale shape).
SINGLE_PARTITION_ALLOWED = {
    "confusion_matrix",
    "label_encode",
    "fk_surrogate_join",
    "stable_entity_ids",
    "pr_threshold_sweep",
    "fs_em_onestep",
    # term_frequency's global N: the merge partition holds one count row
    # per map partition (the value-domain counts stay parallel)
    "fs_tf_adjusted_score",
}


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_plan_has_no_unjustified_scale_killers(spark, name):
    fn, _sql = REGISTRY[name]
    plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()

    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    if name not in NLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: nested-loop join in plan"
        )
    if name not in SINGLE_PARTITION_ALLOWED:
        # Catalyst's runtime bloom-filter join pruning (InjectRuntimeFilter)
        # merges map-side partial bloom buffers through one SinglePartition
        # exchange — O(num_partitions) buffers, never O(input rows). Any
        # other SinglePartition is a scale killer.
        lines = plan.splitlines()
        for i, line in enumerate(lines):
            if "Exchange SinglePartition" not in line:
                continue
            child = lines[i + 1] if i + 1 < len(lines) else ""
            assert "partial_bloom_filter_agg" in child, (
                f"{name}: single-partition exchange in plan (not a "
                f"bloom-filter merge):\n{line}\n{child}"
            )
