"""Invariant tests for the WAU and CEP additions (queries_behavior.py):
both reproduce from direct Python reimplementations over the raw rows.
"""

from __future__ import annotations

from collections import defaultdict
from datetime import date

from iot_simulator_datalake_spark.queries import REGISTRY, load
from iot_simulator_datalake_spark.queries_behavior import _CEP

SF = "/root/testdata/sf0.001"


def test_weekly_active_users_matches_python(spark):
    out = {r["window_end"]: r["wau"] for r in
           REGISTRY["weekly_active_users"].fn(spark, SF).collect()}
    e = load(spark, SF, "events").select("user_id", "ts").collect()
    epoch = date(1970, 1, 1)
    by_day = defaultdict(set)
    for r in e:
        by_day[(r["ts"].date() - epoch).days].add(r["user_id"])
    max_day = max(by_day)
    want = {}
    for we in range(min(by_day), max_day + 1):
        users = set()
        for d in range(we - 6, we + 1):
            users |= by_day.get(d, set())
        if users:
            want[we] = len(users)
    assert out == want
    # WAU dominates any single day's actives inside the window
    for we, wau in out.items():
        assert wau >= max(len(by_day.get(d, set()))
                          for d in range(we - 6, we + 1))


def test_cep_pattern_matches_python(spark):
    out = {(r["user_id"], r["purchase_id"]): r["latency_us"] for r in
           REGISTRY["cep_purchase_error_no_click"].fn(spark, SF).collect()}
    e = load(spark, SF, "events").select(
        "user_id", "event_id", "ts", "event_type").collect()
    seq = defaultdict(list)
    for r in e:
        us = int(r["ts"].timestamp() * 1_000_000)
        seq[r["user_id"]].append((us, r["event_id"], r["event_type"]))
    want = {}
    for u, rows in seq.items():
        rows.sort()
        for i, (tsu, eid, et) in enumerate(rows):
            if et != "purchase":
                continue
            nerr = min((t for t, _, x in rows[i + 1:] if x == "error"),
                       default=None)
            nclk = min((t for t, _, x in rows[i + 1:] if x == "click"),
                       default=None)
            if (nerr is not None and nerr - tsu <= _CEP["within_us"] and
                    (nclk is None or nclk >= nerr)):
                want[(u, eid)] = nerr - tsu
    assert out == want


def test_random_walks_are_valid_paths(spark):
    from iot_simulator_datalake_spark.queries_graph import (
        _BFS_TOPK, _WALK)
    from pyspark.sql import functions as F
    out = REGISTRY["random_walk_corpus"].fn(spark, SF).cache()
    rows = out.collect()
    n_nations = load(spark, SF, "nation").count()
    assert len(rows) == n_nations * _WALK["per_node"]
    # rebuild the edge set the walks must follow
    li = load(spark, SF, "lineitem")
    o = load(spark, SF, "orders")
    c = load(spark, SF, "customer")
    s = load(spark, SF, "supplier")
    from pyspark.sql import Window as W
    we = (li.join(o, li.l_orderkey == o.o_orderkey)
          .join(c, o.o_custkey == c.c_custkey)
          .join(s, li.l_suppkey == s.s_suppkey)
          .groupBy(s.s_nationkey.alias("src"), c.c_nationkey.alias("dst"))
          .agg(F.count(F.lit(1)).alias("w"))
          .filter(F.col("src") != F.col("dst")))
    rn = F.row_number().over(
        W.partitionBy("src").orderBy(F.col("w").desc(), "dst"))
    edges = {(r["src"], r["dst"]) for r in
             we.withColumn("rn", rn).filter(F.col("rn") <= _BFS_TOPK)
             .collect()}
    for r in rows:
        path = [int(x) for x in r["path"].split(">")]
        assert 1 <= len(path) <= _WALK["steps"] + 1
        assert path[0] == r["walk_id"] // 10
        for a, b in zip(path, path[1:]):
            assert (a, b) in edges, f"walk used non-edge {(a, b)}"
    # determinism: second run bit-identical
    again = {(r["walk_id"], r["path"]) for r in
             REGISTRY["random_walk_corpus"].fn(spark, SF).collect()}
    assert again == {(r["walk_id"], r["path"]) for r in rows}


def test_skipgram_pairs_reproduce_from_walks(spark):
    from collections import Counter
    from iot_simulator_datalake_spark.queries_graph import _SG
    out = {(r["center"], r["context"]): r["n_cooccur"] for r in
           REGISTRY["skipgram_pairs"].fn(spark, SF).collect()}
    walks = REGISTRY["random_walk_corpus"].fn(spark, SF).collect()
    want = Counter()
    for r in walks:
        path = [int(x) for x in r["path"].split(">")]
        for i, ci in enumerate(path):
            for j, cj in enumerate(path):
                if i != j and abs(i - j) <= _SG["window"]:
                    want[(ci, cj)] += 1
    assert out == dict(want)
    # symmetry: skip-gram windows are symmetric
    assert all(out.get((b, a)) == n for (a, b), n in out.items())


def test_rfm_scores_are_quintiles(spark):
    out = REGISTRY["rfm_segmentation"].fn(spark, SF).cache()
    n = out.count()
    from pyspark.sql import functions as F
    for col in ("r_score", "f_score", "m_score"):
        counts = {r[col]: r["count"] for r in
                  out.groupBy(col).count().collect()}
        assert set(counts) == {1, 2, 3, 4, 5}
        assert max(counts.values()) - min(counts.values()) <= 1
    # best recency quintile has the smallest recency values
    r5 = out.filter(F.col("r_score") == 5).agg(
        F.max("recency_days")).collect()[0][0]
    r1 = out.filter(F.col("r_score") == 1).agg(
        F.min("recency_days")).collect()[0][0]
    assert r5 <= r1


def test_abc_classes_cover_pareto_shares(spark):
    from pyspark.sql import functions as F
    out = REGISTRY["abc_pareto_classification"].fn(spark, SF).cache()
    tot = out.agg(F.sum("revenue_cents")).collect()[0][0]
    byc = {r["abc_class"]: r["s"] for r in
           out.groupBy("abc_class")
           .agg(F.sum("revenue_cents").alias("s")).collect()}
    assert set(byc) == {"A", "B", "C"}
    assert byc["A"] <= tot * 80 // 100 + 1  # A stops at the 80% boundary
    assert byc["A"] + byc["B"] <= tot * 95 // 100 + 1
    # A parts are individually at least as big as any C part
    amin = out.filter(F.col("abc_class") == "A").agg(
        F.min("revenue_cents")).collect()[0][0]
    cmax = out.filter(F.col("abc_class") == "C").agg(
        F.max("revenue_cents")).collect()[0][0]
    assert amin >= cmax


def test_new_vs_returning_accounting_identities(spark):
    from pyspark.sql import functions as F
    out = REGISTRY["new_vs_returning_daily"].fn(spark, SF).cache()
    e = load(spark, SF, "events")
    n_users = e.select("user_id").distinct().count()
    # every user is new exactly once
    assert out.agg(F.sum("new_users")).collect()[0][0] == n_users
    # per-day totals equal daily active users
    dau = {r["day"]: r["n"] for r in
           e.select(F.col("ts").cast("date").alias("day"), "user_id")
           .distinct().groupBy("day").agg(F.count("*").alias("n"))
           .collect()}
    for r in out.collect():
        assert r["new_users"] + r["returning_users"] == dau[r["day"]]


def test_weekday_seasonality_mass_conservation(spark):
    out = REGISTRY["weekday_seasonality"].fn(spark, SF).collect()
    assert len(out) == 7
    # weighted mean of factors is 1000 (mass conservation, up to floor)
    tot_days = sum(r["n_days"] for r in out)
    w = sum(r["seasonal_milli"] * r["n_days"] for r in out) / tot_days
    assert 990 <= w <= 1000


def test_chunk_dup_ratio_bounds_and_reconstruction(spark):
    from collections import Counter
    out = {r["doc_id"]: r for r in
           REGISTRY["chunk_dup_ratio"].fn(spark, SF).collect()}
    docs = _dl = [(r["doc_id"], r["text"].split(" ")) for r in
                  load(spark, SF, "documents")
                  .select("doc_id", "text").collect()]
    ch = 32
    freq = Counter()
    per_doc = {}
    for doc_id, toks in docs:
        chunks = [" ".join(toks[i * ch:(i + 1) * ch])
                  for i in range((len(toks) - 1) // ch + 1)]
        per_doc[doc_id] = chunks
        freq.update(chunks)
    for doc_id, chunks in per_doc.items():
        r = out[doc_id]
        dup = sum(1 for c in chunks if freq[c] > 1)
        assert r["n_chunks"] == len(chunks)
        assert r["n_dup_chunks"] == dup
        assert r["dup_milli"] == dup * 1000 // len(chunks)


def test_attribution_conserves_credit_exactly(spark):
    from pyspark.sql import functions as F
    from iot_simulator_datalake_spark.queries_behavior import _ATTR
    out = REGISTRY["attribution_linear"].fn(spark, SF).cache()
    e = load(spark, SF, "events")
    purchases = {r["event_id"]: round(r["value"] * 1_000_000) for r in
                 e.filter((F.col("event_type") == "purchase") &
                          F.col("value").isNotNull()).collect()}
    credited = {r["purchase_id"]: r["s"] for r in
                out.groupBy("purchase_id")
                .agg(F.sum("credit_micro").alias("s")).collect()}
    # conservation: attributed purchases sum EXACTLY to their value
    for pid, s in credited.items():
        assert s == purchases[pid]
    # touches are only the configured types
    assert {r["event_type"] for r in
            out.select("event_type").distinct().collect()} \
        <= set(_ATTR["touches"])
    # every credit row positive
    assert out.filter(F.col("credit_micro") <= 0).count() == 0


def test_zipf_fit_matches_numpy_and_is_flat_on_word_soup(spark):
    import math
    import numpy as np
    from collections import Counter
    out = REGISTRY["zipf_fit"].fn(spark, SF).collect()[0]
    docs = load(spark, SF, "documents").select("text").collect()
    cnt = Counter(t for r in docs for t in r["text"].split(" "))
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = np.array([round(math.log(i + 1) * 1e9)
                   for i in range(len(ranked))], dtype=float)
    ys = np.array([round(math.log(f) * 1e9) for _, f in ranked],
                  dtype=float)
    slope = np.polyfit(xs, ys, 1)[0]
    assert out["vocab_size"] == len(ranked)
    assert abs(out["zipf_slope"] - slope) < 1e-6
    # synthetic near-uniform vocabulary: far flatter than natural -1
    assert -0.5 < out["zipf_slope"] < 0


def test_vocab_coverage_matches_python(spark):
    from collections import Counter
    out = {r["pct"]: r["vocab_needed"] for r in
           REGISTRY["vocab_coverage_curve"].fn(spark, SF).collect()}
    docs = load(spark, SF, "documents").select("text").collect()
    cnt = Counter(t for r in docs for t in r["text"].split(" "))
    freqs = sorted(cnt.values(), reverse=True)
    tot = sum(freqs)
    for pct in (50, 90, 99):
        cum = 0
        for i, f in enumerate(freqs, 1):
            cum += f
            if cum * 100 >= tot * pct:
                assert out[pct] == i
                break
    assert out[50] <= out[90] <= out[99] <= len(freqs)


def test_quantile_normalization_properties(spark):
    from pyspark.sql import functions as F
    out = REGISTRY["quantile_normalize_scores"].fn(spark, SF).cache()
    n = load(spark, SF, "documents").count()
    assert out.count() == n                       # every doc mapped
    # monotone within source: higher raw score → ≥ normalized score
    rows = {}
    for r in out.collect():
        rows.setdefault(r["source"], []).append(
            (r["n_chars"], r["normalized_chars"]))
    for seq in rows.values():
        seq.sort()
        norms = [b for _, b in seq]
        assert norms == sorted(norms)
    # the per-source TOP doc maps to (near) the pooled maximum
    pooled_max = out.agg(F.max("n_chars")).collect()[0][0]
    tops = (out.groupBy("source")
            .agg(F.max("normalized_chars").alias("m")).collect())
    assert all(r["m"] == pooled_max for r in tops)
