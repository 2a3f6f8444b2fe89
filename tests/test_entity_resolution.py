"""Entity-resolution family gates: the refined-blocking variant must
keep full coverage (the property the SNM ±w mixed-rank window loses
under side imbalance) and match the full nation-blocked argmax at
least as often as the SNM baseline's measured 0.826.

The imbalance test rebuilds the ×100-replica pathology in miniature:
customers grow, suppliers stay fixed — every customer must still
receive candidates because the window lives in SUPPLIER-rank space.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_simulator_datalake_spark.queries import REGISTRY, load
from iot_simulator_datalake_spark.queries_ext import _ERB_K, _refined_pairs

SF = "/root/testdata/sf0.001"


def test_refined_er_full_coverage_and_recall(spark):
    r = (REGISTRY["entity_resolution_refined_recall_eval"]
         .fn(spark, SF).collect()[0])
    # coverage is complete BY CONSTRUCTION — the structural claim that
    # distinguishes this from the SNM window (suppliers·2w plateau)
    assert r["n_ref_matched"] == r["n_customers"]
    # at least as good as the SNM baseline's measured argmax recall
    assert r["refined_recall"] >= 0.826


def test_refined_pairs_candidate_count_is_bounded(spark):
    """Per customer, each pass contributes at most 2K candidates, so
    the (deduped) union is at most 4K — the linear pair-space bound."""
    per_cust = (_refined_pairs(spark, SF)
                .groupBy("c_id").agg(F.count(F.lit(1)).alias("n")))
    mx = per_cust.agg(F.max("n")).collect()[0][0]
    assert mx <= 4 * _ERB_K
    # and every customer with >=1 same-nation supplier is covered
    c = load(spark, SF, "customer")
    s = load(spark, SF, "supplier")
    coverable = (c.join(s, c["c_nationkey"] == s["s_nationkey"], "semi")
                 .count())
    assert per_cust.count() == coverable


def test_refined_er_survives_side_imbalance(spark, tmp_path):
    """Miniature of the ×100 replica pathology: customers replicated
    8x (key-shifted, names repeating), suppliers held fixed.  The SNM
    mixed-rank window starves replicated customers; the refined
    supplier-rank window must keep matching ALL of them."""
    import shutil
    out = tmp_path / "imb"
    out.mkdir()
    c = load(spark, SF, "customer")
    parts = [c.withColumn("c_custkey", F.col("c_custkey") + i * 10**7)
             for i in range(8)]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(str(out / "customer.parquet"))
    for t in ("supplier", "nation", "region"):
        shutil.copy(f"{SF}/{t}.parquet", out / f"{t}.parquet")
    coverable = (c.join(load(spark, SF, "supplier"),
                        c["c_nationkey"] == F.col("s_nationkey"), "semi")
                 .count())
    r = (REGISTRY["entity_resolution_refined_recall_eval"]
         .fn(spark, str(out)).collect()[0])
    assert r["n_customers"] == 8 * coverable
    assert r["n_ref_matched"] == r["n_customers"]   # no starvation
    assert r["refined_recall"] >= 0.826
