"""Tests for the training-pipeline layer: connected components,
chunking, splits, vocab/TF-IDF, PII redaction (queries_training.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_simulator_datalake_spark.operators.components import (
    connected_components)
from iot_simulator_datalake_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _comp_map(spark, edges):
    df = spark.createDataFrame(edges, ["a", "b"])
    return {r["node"]: r["comp"]
            for r in connected_components(df, "a", "b").collect()}


def test_connected_components_chain_and_islands(spark):
    # 1-2-3-4 is one chain (diameter > 1 → needs >1 iteration),
    # 10-11 an island; every node gets the min id of its component
    comp = _comp_map(spark, [(2, 1), (2, 3), (3, 4), (10, 11)])
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_string_ids(spark):
    # non-numeric node ids: Σcomp convergence is impossible (SUM over
    # strings is NULL), so the operator must fall back to the exact
    # changed-row probe instead of exiting after one round.  The chain
    # a-b-c-d needs MULTIPLE propagate rounds to reach the fixpoint —
    # a premature None == None exit would leave d labeled "b".
    comp = _comp_map(spark, [("b", "a"), ("b", "c"), ("c", "d"),
                             ("x", "y")])
    assert comp == {"a": "a", "b": "a", "c": "a", "d": "a",
                    "x": "x", "y": "x"}


def test_connected_components_distributed_path_parity(spark, monkeypatch):
    # All other graph tests are below SMALL_GRAPH_EDGES and exercise
    # the driver-side union-find; force the gate to 0 so the
    # distributed label-propagation loop (the 100-TB path) stays
    # tested, and assert both paths agree on a multi-round chain plus
    # an island — numeric ids (Σcomp convergence) and string ids
    # (changed-row probe) both.
    from iot_simulator_datalake_spark.operators import components as C
    monkeypatch.setattr(C, "SMALL_GRAPH_EDGES", -1)
    comp = _comp_map(spark, [(2, 1), (2, 3), (3, 4), (10, 11)])
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    comp = _comp_map(spark, [("b", "a"), ("b", "c"), ("c", "d")])
    assert comp == {"a": "a", "b": "a", "c": "a", "d": "a"}


def test_connected_components_null_endpoints_dropped(spark, monkeypatch):
    # A NULL endpoint is "no edge" on BOTH paths: the driver union-find
    # must not TypeError on `None < id`, and the distributed loop must
    # not emit a spurious NULL-node row — identical results either way.
    edges = [(1, 2), (None, 3), (4, None), (5, 6)]
    df = spark.createDataFrame(edges, "a long, b long")
    expect = {1: 1, 2: 1, 5: 5, 6: 5}

    def run():
        return {r["node"]: r["comp"]
                for r in connected_components(df, "a", "b").collect()}

    assert run() == expect                      # driver fast path
    from iot_simulator_datalake_spark.operators import components as C
    monkeypatch.setattr(C, "SMALL_GRAPH_EDGES", -1)
    assert run() == expect                      # distributed loop


def test_connected_components_merges_via_shared_node(spark):
    # two stars sharing node 5 collapse into one component
    comp = _comp_map(spark, [(5, 7), (5, 8), (9, 5), (20, 21)])
    assert {comp[5], comp[7], comp[8], comp[9]} == {5}
    assert comp[20] == comp[21] == 20


def test_neardup_clusters_partitions_all_docs(spark):
    out = REGISTRY["neardup_clusters"].fn(spark, SF)
    rows = out.collect()
    docs = REGISTRY["dedup_exact"].fn(spark, SF)  # any doc-table query
    # total partition: every doc appears exactly once
    assert len(rows) == len({r["doc_id"] for r in rows})
    # cluster representative is a member of the cluster
    ids = {r["doc_id"] for r in rows}
    assert all(r["cluster_id"] in ids for r in rows)
    # cluster_id is the min member (so doc_id == cluster_id picks one
    # canonical doc per cluster)
    by_cluster: dict[int, list[int]] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r["doc_id"])
    assert all(cid == min(members) for cid, members in by_cluster.items())


def test_doc_chunking_windows(spark):
    out = REGISTRY["doc_chunking"].fn(spark, SF)
    toks = {r["doc_id"]: r["toks"] for r in
            out.sparkSession.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", F.split(F.lower("text"), r"\s+").alias("toks"))
            .collect()}
    chunks: dict[int, dict[int, str]] = {}
    for r in out.collect():
        chunks.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk"]
    for doc_id, by_id in chunks.items():
        t = [x for x in toks[doc_id] if x]
        n = len(t)
        expect_chunks = 1 if n <= 32 else (n - 32 + 23) // 24 + 1
        assert sorted(by_id) == list(range(expect_chunks))
        # chunk 0 is exactly the first min(n, 32) tokens
        assert by_id[0] == " ".join(t[:32])
        # consecutive chunks overlap by chunk-minus-stride tokens
        if expect_chunks > 1:
            assert by_id[1] == " ".join(t[24:24 + 32])


def test_dataset_split_deterministic_and_total(spark):
    fn = REGISTRY["dataset_split"].fn
    a = {r["doc_id"]: r["split"] for r in fn(spark, SF).collect()}
    b = {r["doc_id"]: r["split"] for r in fn(spark, SF).collect()}
    assert a == b  # stable across runs (hash-based, not rand())
    assert set(a.values()) <= {"train", "validation", "test"}
    # roughly 80/10/10 (hash uniformity; loose bounds for 500 docs)
    n = len(a)
    train = sum(1 for s in a.values() if s == "train")
    assert 0.7 * n < train < 0.9 * n


def test_vocab_and_tfidf_shapes(spark):
    vocab = REGISTRY["vocab_topk"].fn(spark, SF).collect()
    assert [r["rank"] for r in vocab] == list(range(1, len(vocab) + 1))
    counts = [r["cnt"] for r in vocab]
    assert counts == sorted(counts, reverse=True)
    tfidf = REGISTRY["tfidf_topk"].fn(spark, SF)
    per_doc = (tfidf.groupBy("doc_id").count().select(F.max("count"))
               .first()[0])
    assert per_doc <= 3


def test_redact_removes_injected_pii(spark):
    out = REGISTRY["text_redact_pii"].fn(spark, SF).collect()
    for r in out:
        assert "@example.com" not in r["redacted"]
        assert "<EMAIL>" in r["redacted"]
        assert "<PHONE>" in r["redacted"]
        assert r["n_emails"] >= 1


def test_fuzzy_dedup_report_consistent_with_clusters(spark):
    from iot_simulator_datalake_spark.queries import REGISTRY, load
    from pyspark.sql import functions as F
    SF = "/root/testdata/sf0.001"
    rep = {r["source"]: r for r in
           REGISTRY["fuzzy_dedup_report"].fn(spark, SF).collect()}
    cl = REGISTRY["neardup_clusters"].fn(spark, SF)
    docs = load(spark, SF, "documents").select("doc_id", "source")
    j = docs.join(cl, "doc_id")
    want = {r["source"]: (r["n"], r["kept"]) for r in
            j.groupBy("source").agg(
                F.count("*").alias("n"),
                F.sum((F.col("doc_id") == F.col("cluster_id"))
                      .cast("long")).alias("kept")).collect()}
    for src, (n, kept) in want.items():
        r = rep[src]
        assert r["n_docs"] == n
        assert r["n_kept"] == kept
        assert r["n_removed"] == n - kept
        assert r["n_kept"] >= 1          # every source keeps something


def test_incremental_dedup_verdicts(spark):
    """Incremental dedup invariants at sf0.1 — the one SF whose corpus
    holds a byte-identical cross-split pair, so the exact tier actually
    fires (at sf0.01/0.001 the oracle gate certifies it only as
    agreeing-empty).  'exact' must out-rank 'near'; every verdict row
    carries a consistent (match_id, best_jaccard)."""
    from iot_simulator_datalake_spark.queries_training import (
        _DELTA_MOD, incremental_dedup_batch)
    sf = "/root/testdata/sf0.1"
    rows = incremental_dedup_batch(spark, sf).collect()
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{sf}/documents.parquet")
            .select("doc_id", "text").collect()}
    batch_ids = {i for i in docs if i % _DELTA_MOD == 0}
    assert {r["doc_id"] for r in rows} == batch_ids  # total partition
    by_verdict: dict[str, list] = {}
    for r in rows:
        by_verdict.setdefault(r["verdict"], []).append(r)
    assert by_verdict.get("exact"), "exact tier never fired at sf0.1"
    for r in by_verdict["exact"]:
        assert docs[r["match_id"]] == docs[r["doc_id"]]  # byte-identical
        assert r["match_id"] % _DELTA_MOD != 0           # matched BASE doc
    for r in by_verdict.get("near", []):
        assert r["match_id"] % _DELTA_MOD != 0
        assert r["best_jaccard"] >= 0.3
        # 'near' means NO byte-identical base doc exists (else the
        # exact tier would have out-ranked it)
        assert docs[r["match_id"]] != docs[r["doc_id"]]
    for r in by_verdict.get("new", []):
        assert r["match_id"] is None and r["best_jaccard"] is None


def test_semdedup_cap_bounds_cell_sizes(spark):
    """The capped SemDeDup variant must actually split oversized cells:
    at sf0.1 the 16 sign-cells hold ~125 vectors each (cap=64), so
    every cell splits into ≥2 sub-cells and no sub-cell holds more than
    ~2× the cap (md5 splitting is uniform-in-expectation; the fixed
    corpus makes the observed max deterministic)."""
    from iot_simulator_datalake_spark.queries_curation import (
        semdedup_prune_capped, _SEM_CAP)
    out = semdedup_prune_capped(spark, "/root/testdata/sf0.1")
    from pyspark.sql import functions as F
    sizes = (out.groupBy("cluster", "subcell")
             .agg(F.count("*").alias("n"))
             .collect())
    assert max(r["n"] for r in sizes) <= 2 * _SEM_CAP
    n_sub = {}
    for r in sizes:
        n_sub.setdefault(r["cluster"], set()).add(r["subcell"])
    assert max(len(s) for s in n_sub.values()) >= 2  # cap triggered


def test_semdedup_autok_scales_k_with_corpus(spark):
    """The auto-K rule must (a) reproduce the exact integer formula,
    (b) ENGAGE above the pinned K=8 at the gate corpus, and (c) the
    trained clustering must actually use K cells (cluster ids ⊆
    seeds 0..K-1, with more than 8 distinct ids in use)."""
    from iot_simulator_datalake_spark.queries_ml import (
        _AUTOK_TARGET, _K, auto_k_of)
    assert auto_k_of(1) == _K
    assert auto_k_of(_K * _AUTOK_TARGET + 1) == _K + 1
    assert auto_k_of(500) == 10 > _K          # gate SF engages auto-K
    from iot_simulator_datalake_spark.queries import REGISTRY
    out = REGISTRY["semdedup_autok_prune_capped"].fn(
        spark, "/root/testdata/sf0.001")
    cids = {r["cluster"] for r in out.select("cluster").distinct()
            .collect()}
    assert cids <= set(range(10))
    assert len(cids) > _K - 1  # K=10 seeds in play, not the pinned 8


def test_tiered_capped_dedup_collapses_hot_template(spark, tmp_path):
    """The tier composition the hot-band cap assumes: verbatim copies
    collapse in the EXACT tier, so capping their (overflowing) band
    bucket away loses nothing — the capped e2e report still counts
    them as removed, and every copy maps to the group's min doc_id."""
    tpl = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, "src_a", tpl) for i in range(30)]
    rows += [(100, "src_b", "completely unrelated text about engines"),
             (101, "src_b", "a third distinct document of its own")]
    (spark.createDataFrame(rows, "doc_id long, source string, text string")
     .write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet"))

    rep = {r["source"]: r for r in
           REGISTRY["fuzzy_dedup_report_capped"].fn(
               spark, str(tmp_path)).collect()}
    assert rep["src_a"]["n_docs"] == 30
    assert rep["src_a"]["n_kept"] == 1
    assert rep["src_a"]["n_removed"] == 29
    for r in rep.values():
        assert r["n_docs"] == r["n_kept"] + r["n_removed"]

    cl = {r["doc_id"]: r["cluster_id"] for r in
          REGISTRY["neardup_clusters_capped"].fn(
              spark, str(tmp_path)).collect()}
    assert all(cl[i] == 0 for i in range(30))   # copies → min doc_id
    assert len(cl) == 32                        # total partition
