"""Plan-shape regression guard: no registered query may plan a
cartesian product or an unbounded non-equi (nested-loop) join.

At 100 TB a CartesianProduct or a BroadcastNestedLoopJoin over a
fact-sized side is the difference between a job and an outage; every
such plan in this repo must be one of the KNOWN bounded shapes below.
The test builds (does not execute) the physical plan for every
lazily-plannable key, so a future edit that degrades an equi-join
into a nested loop fails CI immediately.
"""

from __future__ import annotations

import pytest

from etl_stocks_with_sentiment_analysis_spark import registry

# keys whose nested-loop join is a DOCUMENTED bounded shape:
#   - 1-row parameter broadcast (crossJoin against a count/bound agg)
#   - the intentionally-quadratic recall baseline
#   - dominance test over dimension-sized aggregated points
ALLOWED_NESTED_LOOP = {
    "events_dau_wau_hll",  # 1-row sketch-bound crossJoin
    "similarity_bruteforce_topk",  # documented O(Q·N) recall baseline
    "similarity_ivf_topk",  # 1-row stride-parameter crossJoin
    "sample_temperature_mix",  # 1-row min-source-count crossJoin
    "similarity_pq_topk",  # codebook broadcast (fixed 256-row) + query non-equi
    "topk_skyline",  # dominance over groupBy-aggregated points
}

# eager families: calling the key function trains/writes before
# returning a frame — planning them here would re-run the heavy work
# the oracle gate already covers.
_EAGER_PREFIXES = ("sink_", "ml_", "udf_model", "source_backup", "source_enrich")


def test_no_unbounded_nested_loop_or_cartesian(spark, sf_dir):
    bad = []
    for key, fn in sorted(registry.all_queries().items()):
        if key.startswith(_EAGER_PREFIXES):
            continue
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            bad.append((key, "CartesianProduct"))
        if "BroadcastNestedLoopJoin" in plan and key not in ALLOWED_NESTED_LOOP:
            bad.append((key, "BroadcastNestedLoopJoin"))
    assert not bad, f"unbounded join shapes crept in: {bad}"


def test_allowed_list_is_tight(spark, sf_dir):
    """Every whitelisted key still actually plans a nested loop —
    prune the list when an implementation changes shape."""
    qs = registry.all_queries()
    stale = []
    for key in sorted(ALLOWED_NESTED_LOOP):
        plan = qs[key](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        if "BroadcastNestedLoopJoin" not in plan:
            stale.append(key)
    assert not stale, f"whitelist entries no longer needed: {stale}"
