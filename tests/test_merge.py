"""Unit tests for operators/merge.py: every MERGE branch on a tiny
relation, plus branch-coverage proof for the gated query's scenario."""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_simulator_datalake_spark.operators.merge import merge_into
from iot_simulator_datalake_spark.queries import REGISTRY, load

SF = "/root/testdata/sf0.001"


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "k int, name string, v int")


def test_merge_all_branches(spark):
    t = _target(spark)
    s = spark.createDataFrame(
        [(1, 100),   # matched, update-cond true  -> updated
         (2, -5),    # matched, delete-cond true  -> deleted
         (3, 1),     # matched, neither cond      -> kept unchanged
         (9, 7),     # not matched, insert-cond true  -> inserted
         (8, -1)],   # not matched, insert-cond false -> dropped
        "k int, delta int")
    out = merge_into(
        t, s, "k",
        update_set={"v": F.expr("t.v + s.delta")},
        update_cond=F.col("s.delta") >= 10,
        delete_cond=F.col("s.delta") < 0,
        insert_values={"k": F.col("s.k"), "name": F.lit("ins"),
                       "v": F.col("s.delta")},
        insert_cond=F.col("s.delta") > 0,
        check_unique_source=True)
    rows = {r["k"]: (r["name"], r["v"]) for r in out.collect()}
    assert rows == {
        1: ("a", 110),   # updated
        3: ("c", 30),    # matched but update_cond false -> unchanged
        4: ("d", 40),    # target-only survives
        9: ("ins", 7),   # inserted
    }                    # 2 deleted, 8 insert-cond-filtered


def test_merge_null_conditions_mean_not_satisfied(spark):
    """SQL MERGE fires a clause only when its condition IS TRUE: a
    NULL-evaluating delete/update/insert condition must behave as
    FALSE (keep the row unchanged / no insert), not propagate NULL
    into the keep-filter and silently delete the row."""
    t = _target(spark)
    s = spark.createDataFrame(
        [(1, None),   # matched, conds evaluate NULL -> kept UNCHANGED
         (9, None)],  # unmatched, insert-cond NULL  -> no insert
        "k int, delta int")
    out = merge_into(
        t, s, "k",
        update_set={"v": F.expr("t.v + s.delta")},
        update_cond=F.col("s.delta") >= 10,
        delete_cond=F.col("s.delta") < 0,
        insert_values={"k": F.col("s.k"), "name": F.lit("ins"),
                       "v": F.col("s.delta")},
        insert_cond=F.col("s.delta") > 0)
    rows = {r["k"]: (r["name"], r["v"]) for r in out.collect()}
    assert rows == {1: ("a", 10), 2: ("b", 20), 3: ("c", 30),
                    4: ("d", 40)}


def test_merge_without_insert_values_drops_unmatched_source(spark):
    t = _target(spark)
    s = spark.createDataFrame([(9, 1)], "k int, delta int")
    out = merge_into(t, s, "k", update_set={"v": F.expr("t.v + s.delta")})
    assert {r["k"] for r in out.collect()} == {1, 2, 3, 4}


def test_merge_schema_preserved_and_no_dupes(spark):
    t = _target(spark)
    s = spark.createDataFrame([(1, 50), (9, 2)], "k int, delta int")
    out = merge_into(t, s, "k",
                     update_set={"v": F.expr("t.v + s.delta")},
                     insert_values={"k": F.col("s.k"),
                                    "name": F.lit("ins"),
                                    "v": F.col("s.delta")})
    assert out.columns == t.columns
    assert out.count() == out.select("k").distinct().count()


def test_gated_merge_exercises_every_branch(spark):
    out = REGISTRY["merge_into_full_matrix"].fn(spark, SF).cache()
    n_target = load(spark, SF, "customer").count()
    inserted = out.filter(F.col("seg") == "NEW").count()
    upgraded = out.filter(F.col("seg") == "UPGRADED").count()
    survivors = out.count() - inserted
    deleted = n_target - survivors
    assert inserted > 0 and upgraded > 0 and deleted > 0
    assert survivors + deleted == n_target
    # inserted keys live outside the original key space
    assert (out.filter(F.col("seg") == "NEW")
            .filter(F.col("custkey") < 1000000).count() == 0)


def test_merge_rejects_duplicate_source_keys(spark):
    from iot_simulator_datalake_spark.operators.merge import (
        AmbiguousMergeSourceError)
    import pytest
    t = _target(spark)
    s = spark.createDataFrame([(1, 10), (1, 20)], "k int, delta int")
    with pytest.raises(AmbiguousMergeSourceError):
        merge_into(t, s, "k",
                   update_set={"v": F.expr("t.v + s.delta")},
                   check_unique_source=True)


def test_merge_keeps_null_key_target_rows(spark):
    """SQL MERGE must keep unmatched target rows unchanged — including
    rows whose merge key is NULL (they equi-match nothing).  Key-null
    classification would silently DELETE them; side-existence markers
    must not."""
    t = spark.createDataFrame([(None, 1), (1, 2)], "k int, v int")
    s = spark.createDataFrame([(1, 99)], "k int, v int")
    out = merge_into(t, s, "k", update_set={"v": F.col("s.v")}).collect()
    got = {r["k"]: r["v"] for r in out}
    assert got == {None: 1, 1: 99}
    # and a NULL-key SOURCE row is NOT MATCHED → inserts when asked
    out2 = merge_into(
        t, spark.createDataFrame([(None, 7)], "k int, v int"), "k",
        update_set={"v": F.col("s.v")},
        insert_values={"k": F.col("s.k"), "v": F.col("s.v")}).collect()
    assert sorted([(r["k"], r["v"]) for r in out2],
                  key=lambda p: (p[0] is None, p[1])) \
        == [(1, 2), (None, 1), (None, 7)]
