"""Runtime join-filtering guards: the DPP and bloom-injection queries
carry in-query structural asserts (they RAISE if the mechanism is
absent); these tests pin the surrounding contract — the pruning
reaches the SCAN node, conf mutations never leak, and the mechanisms
fire under the exact conditions the docstrings claim."""

from __future__ import annotations

from iot_simulator_datalake_spark.queries import REGISTRY
from iot_simulator_datalake_spark.queries_lake import _plan_text as _plan

SF = "/root/testdata/sf0.001"


def test_dpp_reaches_partition_filters(spark):
    df = REGISTRY["dpp_partition_pruned_join"].fn(spark, SF)
    plan = _plan(df)
    # the pruning expression must sit in the fact scan's
    # PartitionFilters (listing-time pruning), not merely appear as a
    # post-scan Filter condition
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("dynamicpruning" in ln for ln in pf), pf
    assert df.count() > 0


def test_bloom_query_restores_session_confs(spark):
    keys = ["spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold"]
    before = {k: spark.conf.get(k) for k in keys}
    res = REGISTRY["runtime_bloom_filter_join"].fn(spark, SF)
    assert res.count() > 0
    after = {k: spark.conf.get(k) for k in keys}
    assert after == before, f"conf mutation leaked: {before} -> {after}"


def test_bloom_not_injected_at_default_thresholds(spark):
    """The docstring's claim that the thresholds are what engage the
    feature locally must stay true — if a Spark upgrade starts
    injecting blooms at defaults, the query's stand-in rationale (and
    bench comparability) needs revisiting."""
    from pyspark.sql import functions as F
    from iot_simulator_datalake_spark.queries import load
    li = load(spark, SF, "lineitem").select("l_orderkey", "l_extendedprice")
    od = (load(spark, SF, "orders")
          .filter(F.col("o_orderpriority") == "1-URGENT")
          .select("o_orderkey"))
    j = li.join(od, li.l_orderkey == od.o_orderkey).groupBy().count()
    assert "might_contain" not in _plan(j)
