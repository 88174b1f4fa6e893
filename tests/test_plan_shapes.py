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
# keys whose FUNCTION runs real jobs before returning a frame (KMeans
# fit, iterative label propagation to fixpoint) — planning them here
# would execute that work, and the oracle gate covers them anyway.
_EAGER_KEYS = {
    "similarity_kmeans_ivf",
    "dedup_connected_components",
    "pipeline_dedup_stack",
    "dedup_index_build",  # materializes the LSH index parquet
    "dedup_index_probe",  # ditto (probe side itself is lazy)
    "dedup_index_append",  # ditto (plus appends)
    "similarity_index_build",  # materializes the ANN index parquet
    "similarity_index_append",  # ditto (plus appends)
    "similarity_index_probe",  # ditto (probe side itself is lazy)
    "similarity_index_probe_pq",  # ditto (two-stage ADC probe)
    "similarity_index_compact",  # ditto (plus staged-swap rewrite)
    "similarity_index_kmeans",  # KMeans fit + index build in-session
    "pipeline_dbt_models",  # runs the dbt project (CTAS commits)
}


def _plans(spark, sf_dir):
    out = {}
    for key, fn in sorted(registry.all_queries().items()):
        if key.startswith(_EAGER_PREFIXES) or key in _EAGER_KEYS:
            continue
        df = fn(spark, sf_dir)
        out[key] = df._jdf.queryExecution().executedPlan().toString()
    return out


def test_plan_shapes(spark, sf_dir):
    plans = _plans(spark, sf_dir)
    bad = []
    for key, plan in plans.items():
        if "CartesianProduct" in plan:
            bad.append((key, "CartesianProduct"))
        if "BroadcastNestedLoopJoin" in plan and key not in ALLOWED_NESTED_LOOP:
            bad.append((key, "BroadcastNestedLoopJoin"))
    assert not bad, f"unbounded join shapes crept in: {bad}"
    # and the whitelist stays tight: every entry still actually plans
    # a nested loop — prune it when an implementation changes shape.
    stale = [
        key
        for key in sorted(ALLOWED_NESTED_LOOP)
        if key in plans and "BroadcastNestedLoopJoin" not in plans[key]
    ]
    assert not stale, f"whitelist entries no longer needed: {stale}"
