"""Operator unit tests: dedup family recall on planted duplicates,
as-of join semantics, SCD1, rollups."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from iot_simulator_datalake_spark.operators import (
    asof_join, brute_force_topk, exact_dedup, fingerprint_dedup,
    lsh_bucket_topk, minhash_lsh_pairs, ngram_jaccard_pairs, scd1_current,
    simhash, time_rollup, window_dedup)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river"),
        (2, "the quick brown fox jumps over the lazy dog near the river"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy dog near the creek"),  # near dup of 1
        (4, "dog lazy the over jumps fox brown quick the river near the"),  # reordered 1
        (5, "completely different text about spark query engines and joins"),
        (6, "another unrelated document mentioning parquet column pruning"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_keeps_lowest_key(docs):
    kept = exact_dedup(docs, "text", "doc_id")
    ids = {r["doc_id"] for r in kept.collect()}
    assert 1 in ids and 2 not in ids          # dup collapsed to lowest key
    assert ids == {1, 3, 4, 5, 6}


def test_fingerprint_dedup_collapses_reordered(docs):
    kept = fingerprint_dedup(docs, "text", "doc_id")
    ids = {r["doc_id"] for r in kept.collect()}
    assert 4 not in ids and 2 not in ids      # reordered + exact collapse
    assert 1 in ids


def test_minhash_lsh_finds_planted_near_dups(docs):
    pairs = {(r["key_a"], r["key_b"]): r["jaccard"]
             for r in minhash_lsh_pairs(docs, "text", "doc_id",
                                        threshold=0.3).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0   # exact dup
    assert (1, 3) in pairs                             # near dup recovered
    assert all(not (a in (5, 6) or b in (5, 6)) or jac < 0.3
               for (a, b), jac in pairs.items())


def test_minhash_hot_band_guard(spark):
    # 20 identical docs form one giant band bucket; the cap excludes it
    rows = [(i, "same boilerplate text repeated again and again here")
            for i in range(20)] + \
           [(100, "a unique document about something else entirely"),
            (101, "a unique document about something else entirely!")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    uncapped = minhash_lsh_pairs(df, "text", "doc_id", threshold=0.3)
    capped = minhash_lsh_pairs(df, "text", "doc_id", threshold=0.3,
                               max_band_bucket=5)
    assert uncapped.count() >= 20 * 19 / 2        # boilerplate cluster
    got = {(r["key_a"], r["key_b"]) for r in capped.collect()}
    assert (100, 101) in got                      # small pairs survive
    assert all(a >= 100 for a, _ in got)          # giant bucket dropped


def test_ngram_jaccard_blocked(docs, spark):
    blocked = docs.withColumn("block", F.lit("all"))
    pairs = {(r["key_a"], r["key_b"]) for r in ngram_jaccard_pairs(
        blocked, "text", "doc_id", block_col="block",
        threshold=0.5).collect()}
    assert (1, 2) in pairs and (1, 3) in pairs
    assert (1, 5) not in pairs


def test_simhash_near_dups_close(docs):
    fps = {r["doc_id"]: r["simhash"] for r in
           simhash(docs, "text", "doc_id").collect()}
    assert fps[1] == fps[2]                    # identical docs, same hash
    ham_13 = bin(fps[1] ^ fps[3]).count("1")
    ham_15 = bin(fps[1] ^ fps[5]).count("1")
    assert ham_13 < ham_15                     # near dup closer than unrelated


def test_window_dedup_latest_wins(spark):
    rows = [(1, 1, "old"), (1, 2, "new"), (2, 5, "only")]
    df = spark.createDataFrame(rows, ["k", "v", "tag"])
    out = window_dedup(df, ["k"], [F.col("v").desc()])
    assert {(r["k"], r["tag"]) for r in out.collect()} == \
        {(1, "new"), (2, "only")}


def test_scd1_current_excludes_soft_deletes(spark):
    ts = datetime(2024, 1, 1)
    rows = [
        ("a", datetime(2024, 1, 1), "v1", False),
        ("a", datetime(2024, 1, 3), "v2", False),
        ("b", datetime(2024, 1, 1), "v1", False),
        ("b", datetime(2024, 1, 2), "v2", True),   # deleted last → excluded
    ]
    df = spark.createDataFrame(
        rows, ["id", "op_ts", "payload", "_is_deleted"])
    out = {r["id"]: r["payload"] for r in
           scd1_current(df, key="id").collect()}
    assert out == {"a": "v2"}


def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        [(1, 10, "e1"), (1, 20, "e2"), (1, 5, "e0"), (2, 7, "x")],
        ["k", "ts", "name"])
    right = spark.createDataFrame(
        [(1, 8, 100.0), (1, 15, 200.0), (3, 1, 999.0)],
        ["k", "ts", "price"])
    out = {r["name"]: r["right_price"] for r in
           asof_join(left, right, on="k", ts="ts").collect()}
    assert out == {"e0": None, "e1": 100.0, "e2": 200.0, "x": None}


def test_asof_join_equal_ts_included(spark):
    left = spark.createDataFrame([(1, 10, "e")], ["k", "ts", "name"])
    right = spark.createDataFrame([(1, 10, 5.0)], ["k", "ts", "v"])
    out = asof_join(left, right, on="k", ts="ts").collect()
    assert out[0]["right_v"] == 5.0


def test_asof_join_forward(spark):
    left = spark.createDataFrame([(1, 10, "e")], ["k", "ts", "name"])
    right = spark.createDataFrame(
        [(1, 8, 1.0), (1, 12, 2.0), (1, 30, 3.0)], ["k", "ts", "v"])
    out = asof_join(left, right, on="k", ts="ts",
                    direction="forward").collect()
    assert out[0]["right_v"] == 2.0


def test_time_rollup_grains(spark):
    df = spark.createDataFrame(
        [(datetime(2024, 1, 1, 10, 15), "d1", 2.0),
         (datetime(2024, 1, 1, 10, 45), "d1", 4.0),
         (datetime(2024, 1, 1, 11, 5), "d1", 10.0)],
        ["ts", "device", "value"])
    hourly = time_rollup(df, "ts", ["device"], "value", grain="hour")
    rows = {r["bucket"].hour: (r["n"], r["total"], r["avg"])
            for r in hourly.collect()}
    assert rows[10] == (2, 6.0, 3.0)
    assert rows[11] == (1, 10.0, 10.0)
    with pytest.raises(ValueError):
        time_rollup(df, "ts", [], "value", grain="fortnight")


def test_ivf_multiprobe_recall_monotone(spark):
    """IVF recall must be monotone in n_probe and reach exact recall at
    n_probe = n_centroids (every cell searched)."""
    import random
    from iot_simulator_datalake_spark.operators.similarity import ivf_topk
    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(80)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    probes = df.filter(F.col("vec_id") < 4)
    exact = {(r["probe_id"], r["vec_id"])
             for r in brute_force_topk(df, probes, k=5).collect()}

    def recall(n_probe):
        got = {(r["probe_id"], r["vec_id"]) for r in
               ivf_topk(df, probes, k=5, n_centroids=4,
                        n_probe=n_probe).collect()}
        return len(got & exact) / len(exact)

    r1, r2, r_all = recall(1), recall(2), recall(4)
    assert r1 <= r2 <= r_all
    assert r_all == 1.0                  # all cells searched ⇒ exact


def test_topk_exact_vs_lsh_recall(spark):
    import random
    rng = random.Random(0)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    probes = df.filter(F.col("vec_id") < 3)
    exact = brute_force_topk(df, probes, k=5)
    approx = lsh_bucket_topk(df, probes, k=5, n_planes=2)
    ex = {(r["probe_id"], r["vec_id"]) for r in exact.collect()}
    ap = {(r["probe_id"], r["vec_id"]) for r in approx.collect()}
    # approximate path returns valid, bucket-restricted neighbours with
    # non-trivial overlap against exact
    assert len(ap) > 0
    assert len(ex & ap) / len(ex) > 0.2


def test_banding_config_validation(spark):
    """bands > n_hashes degenerates every band key to md5(band_index)
    (all docs share all buckets — O(n²) corpus-wide); non-divisible
    bands silently drop trailing signatures.  Both must raise."""
    import pytest
    from iot_simulator_datalake_spark.operators.dedup import (
        minhash_lsh_pairs)
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="bands"):
        minhash_lsh_pairs(df, "text", "doc_id", n_hashes=6, bands=8) \
            .collect()
    with pytest.raises(ValueError, match="evenly"):
        minhash_lsh_pairs(df, "text", "doc_id", n_hashes=6, bands=4) \
            .collect()


def test_salted_join_rejects_dim_preserving_how(spark):
    """The dim side is replicated salts×, so right/full joins would
    emit one unmatched dim row PER SALT — refuse rather than corrupt."""
    import pytest
    from iot_simulator_datalake_spark.operators.skew import salted_join
    f = spark.createDataFrame([(1, "x")], ["k", "a"])
    d = spark.createDataFrame([(1, "y"), (2, "z")], ["k", "b"])
    with pytest.raises(ValueError, match="fact-preserving"):
        salted_join(f, d, "k", how="full")
    # fact-preserving forms still work and keep exact row semantics
    assert salted_join(f, d, "k", how="inner").count() == 1
    assert salted_join(f, d, "k", how="left").count() == 1


def test_salt_is_deterministic_across_recompute(spark):
    """The salt is a pure function of the row (md5), so recomputed
    partitions reproduce identical salts — rand() here would misroute
    rows between reducers after a fetch-failure recompute."""
    from iot_simulator_datalake_spark.operators.skew import _salt
    df = spark.createDataFrame([(i, f"p{i % 3}") for i in range(50)],
                               ["k", "p"])
    a = sorted((r["k"], r["s"]) for r in
               df.withColumn("s", _salt(df, 8)).collect())
    b = sorted((r["k"], r["s"]) for r in
               df.repartition(7).withColumn("s", _salt(df, 8)).collect())
    assert a == b
    assert len({s for _, s in a}) > 1   # actually spreads


def test_time_rollup_month_streaming_refused(spark):
    import pytest
    from iot_simulator_datalake_spark.operators.rollup import time_rollup
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", "a", 1.0)], "ts string, k string, v double"
    ).selectExpr("cast(ts as timestamp) ts", "k", "v")
    with pytest.raises(ValueError, match="month"):
        time_rollup(df, "ts", ["k"], "v", grain="month",
                    streaming_window=True)
    # batch month form still fine
    assert time_rollup(df, "ts", ["k"], "v", grain="month").count() == 1


def test_asof_join_null_payload_not_skipped(spark):
    """A legitimately-NULL payload value in the true as-of row must
    survive — per-column ignorenulls fills would instead carry a STALE
    value from an older right row (and mix columns across rows)."""
    left = spark.createDataFrame([(1, 3, "e")], ["k", "ts", "name"])
    right = spark.createDataFrame(
        [(1, 1, 5.0, "a"), (1, 2, None, "b")],
        ["k", "ts", "threshold", "tag"])
    out = asof_join(left, right, on="k", ts="ts").collect()[0]
    assert out["right_threshold"] is None     # NOT the stale 5.0
    assert out["right_tag"] == "b"            # whole as-of row, no mixing


def test_time_rollup_week_buckets_match_batch(spark):
    """Streaming '1 week' windows must anchor to Monday like
    date_trunc('week') — unanchored they align to the epoch Thursday
    and the batch/streaming twins emit disjoint week keys."""
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [("2026-08-15 12:00:00",), ("2026-08-10 00:00:00",),
         ("2026-08-09 23:59:59",)], ["s"]).select(
        F.col("s").cast("timestamp").alias("ts"), F.lit(1.0).alias("v"))
    b = sorted(r[0] for r in time_rollup(df, "ts", [], "v", grain="week")
               .select("bucket").collect())
    s = sorted(r[0] for r in time_rollup(df, "ts", [], "v", grain="week",
                                         streaming_window=True)
               .select("bucket").collect())
    assert b == s
    assert all(d.weekday() == 0 for d in b)   # Mondays


def test_ranged_prefix_null_sums_match_naive_window(spark):
    """Running sums over a source column WITH NULLs must hash-match
    the naive single-partition window: NULL only while no non-null
    value has appeared, never poisoned by an all-NULL bucket frame."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from iot_simulator_datalake_spark.operators.prefix import ranged_prefix
    rows = [(i, None if i % 3 == 0 else i * 10) for i in range(1, 61)]
    rows[0] = (1, None)  # leading NULL: naive prefix sum starts NULL
    df = spark.createDataFrame(rows, ["k", "x"])
    got, totals = ranged_prefix(df, [F.col("k")], rank_col="r",
                                sums={"cum": "x"}, buckets=8)
    want = df.select(
        "k", F.sum("x").over(Window.orderBy("k")
                             .rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"))
    g = {r["k"]: r["cum"] for r in got.collect()}
    w = {r["k"]: r["cum"] for r in want.collect()}
    assert g == w
    assert totals["cum"] == sum(v for _, v in rows if v is not None)


def test_sigs_with_size_matches_shingle_set_size(spark):
    """r12: the Jaccard denominators ride the signature aggregate —
    ``sz`` must equal the per-key distinct-shingle count, and the
    public minhash_signatures schema must stay sz-free."""
    from pyspark.sql import functions as F

    from iot_simulator_datalake_spark.functions.text import ngrams, tokens
    from iot_simulator_datalake_spark.operators.dedup import (
        _sigs_from_exploded, minhash_signatures)

    df = spark.createDataFrame(
        [(1, "a b c a b c d"), (2, "x y"), (3, "")],
        ["doc_id", "text"])
    ex = df.select(
        F.col("doc_id").alias("key"),
        F.explode(ngrams(tokens(F.col("text")), 3)).alias("s"))
    got = {r["key"]: r["sz"]
           for r in _sigs_from_exploded(ex, 6, with_size=True).collect()}
    want = {r["key"]: r["n"]
            for r in ex.distinct().groupBy("key")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == want
    assert "sz" not in minhash_signatures(df, "text", "doc_id").columns
