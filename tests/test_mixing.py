"""Invariant tests for corpus-composition queries (queries_mixing.py).

The oracle gate certifies cross-engine equality; these assert the
semantic invariants: mixing rates are honored exactly per the hash
coin, epoch counts bracket the configured weight, curriculum buckets
partition the corpus with contiguous positions, and everything is
deterministic across runs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_simulator_datalake_spark.queries import REGISTRY, load
from iot_simulator_datalake_spark.queries_mixing import (
    BPE_TOP, EPOCH_BP, EPOCH_DEFAULT_BP, MIX_BP)

SF = "/root/testdata/sf0.001"


def test_domain_mix_rates_and_determinism(spark):
    out = REGISTRY["domain_mix_weighted"].fn(spark, SF).cache()
    docs = load(spark, SF, "documents")
    # full-rate source keeps every doc
    full = [s for s, bp in MIX_BP.items() if bp == 10_000]
    for s in full:
        n_in = docs.where(F.col("source") == s).count()
        assert out.where(F.col("source") == s).count() == n_in
    # kept per source never exceeds input, and rate_bp column is the
    # configured rate
    got = {r["source"]: r["rate_bp"]
           for r in out.select("source", "rate_bp").distinct().collect()}
    for s, bp in got.items():
        assert bp == MIX_BP.get(s, 6_000)
    # deterministic: second run identical
    again = REGISTRY["domain_mix_weighted"].fn(spark, SF)
    assert out.exceptAll(again).count() == 0
    assert again.exceptAll(out).count() == 0


def test_epoch_upsample_brackets_weight(spark):
    out = REGISTRY["epoch_upsample"].fn(spark, SF).cache()
    per_doc = out.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("epoch").alias("lo"), F.max("epoch").alias("hi"))
    for r in per_doc.collect():
        bp = EPOCH_BP.get(r["source"], EPOCH_DEFAULT_BP)
        assert bp // 10_000 <= r["n"] <= bp // 10_000 + 1
        # epochs are contiguous 0..n-1
        assert r["lo"] == 0 and r["hi"] == r["n"] - 1
    # exactly-1.0-epoch sources replicate nothing
    exact = [s for s, bp in EPOCH_BP.items() if bp == 10_000]
    for s in exact:
        sub = per_doc.where(F.col("source") == s)
        assert sub.where(F.col("n") != 1).count() == 0


def test_curriculum_partitions_corpus(spark):
    out = REGISTRY["curriculum_order"].fn(spark, SF).cache()
    n_docs = load(spark, SF, "documents").count()
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs
    sizes = {r["bucket"]: r["n"] for r in
             out.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    assert set(sizes) == {1, 2, 3, 4}
    # nearest-rank quartiles: every bucket within ±1 of n/4 would be
    # too strict with duplicate lengths; assert no bucket dominates
    assert max(sizes.values()) < n_docs
    # positions are contiguous 1..size within each bucket
    chk = (out.groupBy("bucket")
           .agg(F.min("pos").alias("lo"), F.max("pos").alias("hi"),
                F.count(F.lit(1)).alias("n"))
           .where((F.col("lo") != 1) | (F.col("hi") != F.col("n"))))
    assert chk.count() == 0
    # monotone difficulty: max length in bucket b <= min length in b+2
    stats = (out.join(load(spark, SF, "documents"), "doc_id")
             .groupBy("bucket")
             .agg(F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi"))
             .orderBy("bucket").collect())
    for a, b in zip(stats, stats[1:]):
        assert a["lo"] <= b["lo"] and a["hi"] <= b["hi"]


def test_bpe_pairs_ranked_and_bounded(spark):
    rows = REGISTRY["bpe_pair_stats"].fn(spark, SF).collect()
    assert 0 < len(rows) <= BPE_TOP
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    # every pair is two whitespace-joined tokens
    assert all(len(r["pair"].split(" ")) == 2 for r in rows)


def test_temperature_rates_upweight_small_sources(spark):
    rows = REGISTRY["temperature_mix_rates"].fn(spark, SF).collect()
    assert sum(r["mix_ppm"] for r in rows) <= 1_000_000
    by_n = sorted(rows, key=lambda r: r["n_docs"])
    # τ<1 compresses: smallest source gets the largest upweight factor,
    # largest source the smallest, and factors cross 1000 (= 1.0×)
    assert by_n[0]["upweight_milli"] >= by_n[-1]["upweight_milli"]
    assert by_n[0]["upweight_milli"] >= 1000 >= by_n[-1]["upweight_milli"]
    # monotone: mix share still increases with size (τ>0)
    shares = [r["mix_ppm"] for r in by_n]
    assert shares == sorted(shares)
