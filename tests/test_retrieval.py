"""Invariant tests for the retrieval family (queries_retrieval.py):
BM25 reproduces from a Python reimplementation, the inverted index is
a lossless partition of the (term, doc) relation, recall@k is bounded
and consistent, and winsorized thresholds satisfy the nearest-rank
definition exactly.
"""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from iot_simulator_datalake_spark.queries import REGISTRY, load
from iot_simulator_datalake_spark.queries_retrieval import _BM25, _IDX

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return [(r["doc_id"], r["text"].split(" "))
            for r in load(spark, SF, "documents")
            .select("doc_id", "text").collect()]


def test_bm25_matches_python_reimplementation(spark):
    out = REGISTRY["bm25_topk"].fn(spark, SF).collect()
    docs = _docs(spark)
    n = len(docs)
    sumdl = sum(len(t) for _, t in docs)
    terms = _BM25["terms"]
    df = Counter(t for _, toks in docs for t in set(toks) if t in terms)
    k1, b = _BM25["k1"], _BM25["b"]
    scores = {}
    for doc_id, toks in docs:
        tf = Counter(t for t in toks if t in terms)
        s = 0
        for t, f in tf.items():
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            norm = f + k1 * (1 - b + b * (len(toks) * n) / sumdl)
            s += round(idf * (f * (k1 + 1)) / norm * 1e9)
        if s:
            scores[doc_id] = s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    want = want[:_BM25["topk"]]
    got = [(r["doc_id"], r["score_nano"]) for r in out]
    assert got == want
    # ranking is sorted and positive
    assert all(got[i][1] >= got[i + 1][1] for i in range(len(got) - 1))
    assert got[0][1] > 0


def test_inverted_index_is_lossless_partition(spark):
    out = REGISTRY["inverted_index_postings"].fn(spark, SF).collect()
    docs = _docs(spark)
    want = {(t, d) for d, toks in docs for t in toks}
    got = set()
    for r in out:
        ids = [int(x) for x in r["postings"].split(",")]
        assert ids == sorted(ids)                       # sorted within segment
        assert len(ids) == r["seg_df"]
        assert all(i // _IDX["segment"] == r["segment"] for i in ids)
        for i in ids:
            assert (r["term"], i) not in got            # no duplicates
            got.add((r["term"], i))
    assert got == want                                  # lossless


def test_ann_recall_bounds_and_consistency(spark):
    rows = REGISTRY["ann_recall_eval"].fn(spark, SF).collect()
    assert len(rows) == 10                              # one per probe
    for r in rows:
        assert r["k"] == 5
        assert 0 <= r["hits"] <= r["k"]
        assert r["recall_ppm"] == r["hits"] * 1_000_000 // r["k"]
    # sign-LSH with 4 planes keeps each probe's own bucket, so recall
    # can't be globally zero on clustered data
    assert sum(r["hits"] for r in rows) > 0


def test_winsorized_thresholds_are_nearest_rank(spark):
    out = {r["grp"]: r for r in
           REGISTRY["winsorized_stats"].fn(spark, SF).collect()}
    li = load(spark, SF, "lineitem").select(
        "l_returnflag", "l_extendedprice").collect()
    by = {}
    for r in li:
        by.setdefault(r["l_returnflag"], []).append(
            round(r["l_extendedprice"] * 100))
    for g, vals in by.items():
        vals.sort()
        n = len(vals)
        lo = vals[math.ceil(0.05 * n) - 1]              # nearest-rank p05
        hi = vals[math.ceil(0.95 * n) - 1]
        r = out[g]
        assert r["n"] == n and r["lo"] == lo and r["hi"] == hi
        clipped = [min(max(v, lo), hi) for v in vals]
        assert r["winsorized_mean_cent"] == sum(clipped) // n
        assert lo <= r["winsorized_mean_cent"] <= hi


def test_rrf_fuses_both_rankings(spark):
    from iot_simulator_datalake_spark.queries_retrieval import _RRF
    out = REGISTRY["hybrid_search_rrf"].fn(spark, SF).collect()
    assert len(out) == _RRF["out"]
    k = _RRF["k"]
    for r in out:
        want = 0
        if r["bm25_rank"] is not None:
            want += round(1e9 / (k + r["bm25_rank"]))
        if r["ann_rank"] is not None:
            want += round(1e9 / (k + r["ann_rank"]))
        assert r["rrf_nano"] == want
        assert r["bm25_rank"] is not None or r["ann_rank"] is not None
    # docs present in BOTH rankings outrank equal-rank singletons
    scores = [r["rrf_nano"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_phrase_search_matches_python(spark):
    from iot_simulator_datalake_spark.queries_retrieval import _PHRASE
    out = {r["doc_id"]: (r["n_hits"], r["first_pos"]) for r in
           REGISTRY["phrase_search_positional"].fn(spark, SF).collect()}
    want = {}
    for doc_id, toks in _docs(spark):
        hits = [i for i in range(len(toks) - 1)
                if toks[i] == _PHRASE[0] and toks[i + 1] == _PHRASE[1]]
        if hits:
            want[doc_id] = (len(hits), hits[0])
    assert out == want
    assert want  # phrase occurs in the corpus at this SF


def test_maxsim_matches_numpy(spark):
    import numpy as np
    from iot_simulator_datalake_spark.queries_retrieval import _MAXSIM
    out = [(r["vec_id"], r["maxsim_micro"]) for r in
           REGISTRY["maxsim_late_interaction"].fn(spark, SF).collect()]
    emb = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
           for r in load(spark, SF, "embeddings").collect()}
    subs, dim = _MAXSIM["subs"], _MAXSIM["dim"]

    def toks(v):
        return [v[i * dim:(i + 1) * dim] for i in range(subs)]
    q = toks(emb[0])
    scores = {}
    for vid, v in emb.items():
        if vid == 0:
            continue
        dv = toks(v)
        s = sum(max(round(float(qt @ dt) * 1e6) for dt in dv) for qt in q)
        scores[vid] = s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    assert out == want[:_MAXSIM["topk"]]


def test_mmr_diversifies_vs_plain_topk(spark):
    import numpy as np
    from iot_simulator_datalake_spark.queries_retrieval import _MMR
    mmr = REGISTRY["mmr_diverse_rerank"].fn(spark, SF).collect()
    assert len(mmr) == _MMR["out"]
    assert sorted(r["rank"] for r in mmr) == list(range(1, _MMR["out"] + 1))
    emb = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
           for r in load(spark, SF, "embeddings").collect()}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    # plain dense top-out for the same probe
    rels = sorted(((cos(emb[0], v), -k) for k, v in emb.items() if k != 0),
                  reverse=True)
    top = [-k for _, k in rels[:_MMR["out"]]]

    def avg_pair_sim(ids):
        sims = [cos(emb[a], emb[b]) for i, a in enumerate(ids)
                for b in ids[i + 1:]]
        return sum(sims) / len(sims)
    mmr_ids = [r["vec_id"] for r in mmr]
    # rank-1 pick is the relevance argmax, same as plain top-1
    assert mmr_ids[0] == top[0]
    # the diversified set is strictly less self-similar
    assert avg_pair_sim(mmr_ids) < avg_pair_sim(top)
