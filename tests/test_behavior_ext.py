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
