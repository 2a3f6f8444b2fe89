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
            "spark.sql.optimizer.runtime.bloomFilter."
            "creationSideThreshold",
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


def test_aqe_skew_query_restores_confs_and_is_nonempty(spark):
    keys = ["spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.forceOptimizeSkewedJoin"]
    before = {k: spark.conf.get(k) for k in keys}
    res = REGISTRY["aqe_skew_join_split"].fn(spark, SF)
    # the in-query raise already certifies skew=true was in the
    # executed plan; here we pin the mutation containment + substance
    assert res.count() > 0
    assert {k: spark.conf.get(k) for k in keys} == before


def test_aqe_skew_not_flagged_at_default_thresholds(spark):
    """The stand-in rationale (scaled thresholds are what engage the
    split on KB-sized replicas) must stay true, mirroring the bloom
    default-threshold guard."""
    from pyspark.sql import functions as F
    from iot_simulator_datalake_spark.queries import load
    fact = (load(spark, SF, "events")
            .select(F.when(F.col("user_id") % 4 != 0, F.lit(1))
                    .otherwise(F.col("user_id")).alias("uid"), "value")
            .repartition(16))
    dim = load(spark, SF, "customer").select(
        F.col("c_custkey").alias("uid"), "c_mktsegment")
    j = fact.join(dim.hint("merge"), "uid").groupBy("c_mktsegment").count()
    j.collect()
    final = j._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" not in final


def test_aqe_broadcast_switch_restores_and_unsets_optional_conf(spark):
    """The adaptive broadcast threshold is an OPTIONAL conf — after the
    query it must be UNSET again (not restored as a stringified None),
    or every later join in the session would silently pick up an 8MB
    adaptive threshold."""
    opt = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    assert spark.conf.get(opt, None) is None, "precondition: conf unset"
    before_static = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    res = REGISTRY["aqe_runtime_broadcast_switch"].fn(spark, SF)
    assert res.count() > 0
    assert spark.conf.get(opt, None) is None
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") \
        == before_static


def test_cbo_negative_without_stats_or_cbo_syntactic_order_stands(spark):
    """The reorder claim needs its baseline: same shape over the plain
    parquet reads (no catalog stats, CBO off = session default) must
    keep the written order — part joins before orders."""
    import re
    from pyspark.sql import functions as F
    from iot_simulator_datalake_spark.queries import load
    li = load(spark, SF, "lineitem").select(
        "l_partkey", "l_orderkey", "l_quantity")
    pt = load(spark, SF, "part").select("p_partkey", "p_brand")
    od = (load(spark, SF, "orders")
          .filter(F.col("o_totalprice") < 10000)
          .select("o_orderkey"))
    j = (li.join(pt, li.l_partkey == pt.p_partkey)
         .join(od, li.l_orderkey == od.o_orderkey)
         .groupBy("p_brand").count())
    phys = _plan(j)   # physical plan: scan Locations carry the paths
    seq = re.findall(r"(lineitem|part|orders)\.parquet", phys)
    assert seq and seq.index("part") < seq.index("orders"), seq


def test_cbo_query_restores_confs_and_drops_tables(spark):
    keys = ["spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled"]
    before = {k: spark.conf.get(k) for k in keys}
    res = REGISTRY["cbo_join_reorder"].fn(spark, SF)
    assert res.count() > 0
    assert {k: spark.conf.get(k) for k in keys} == before
    # listTables(db) also returns session-global TEMP views (other
    # tests register plenty) — only actual cbodemo-namespace tables
    # would be leaks
    leftover = [t.name for t in spark.catalog.listTables("cbodemo")
                if t.tableType != "TEMPORARY"]
    assert leftover == [], f"staged catalog tables leaked: {leftover}"
