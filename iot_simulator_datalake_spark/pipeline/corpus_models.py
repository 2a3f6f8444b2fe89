"""The LLM corpus-prep pipeline as a second Engine DAG: the medallion
pattern (bronze → silver → gold) applied to a pre-training corpus
instead of IoT telemetry — demonstrating the engine is a framework,
not a single hard-wired pipeline.

- bronze.documents      raw parquet landing (view)
- silver.documents      contract: tokenized, length-gated, language
                        known, exact-deduped (min doc_id per content
                        hash wins)
- gold.corpus_splits    deterministic 80/10/10 train/validation/test
- gold.packed_sequences fixed-block packed training sequences
                        (operators/packing.py), partitioned by shard

The entire DAG is certified end-to-end by the declared query
``engine_corpus_pipeline`` (queries_corpus.py), whose DuckDB oracle
replays silver + packing + splits in SQL.

Scale notes: silver is map-only except the dedup's one md5(content)
shuffle (documents never ride the wire — 32-byte hashes do); packing
is one per-shard window shuffle; splits are map-only.  All thresholds
are engine-portable md5 buckets, never ``rand()``.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..engine import checks as C
from ..engine.model import ModelContext, Registry, model
from ..functions.text import tokens
from ..operators.packing import pack_sequences

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame
    from ..engine.runner import Engine

#: silver length gate (tokens) and packing geometry — shared with the
#: oracle in queries_corpus.py
from ..operators.packing import (SPLIT_THRESHOLDS as _SPLIT,  # noqa: E402
                                 plain_bucket)

CORPUS = dict(min_toks=5, max_toks=400, block=64, shards=4, seed="corp1",
              train_hi=_SPLIT["train"], val_hi=_SPLIT["validation"])


def build_corpus_registry() -> Registry:
    r = Registry()

    @model(r, name="documents", layer="bronze",
           description="Raw document landing (parquet)")
    def bronze_documents(ctx: ModelContext) -> "DataFrame":
        return ctx.spark.read.parquet(ctx.var("documents_path"))

    @model(r, name="documents", layer="silver", materialization="table",
           depends_on=("bronze.documents",),
           description="Tokenized, length-gated, language-known, "
                       "exact-deduped document contract")
    def silver_documents(ctx: ModelContext) -> "DataFrame":
        d = ctx.ref("bronze.documents")
        t = (d.where(F.col("lang").isNotNull())
             .select("doc_id", "text", "lang", "source",
                     tokens(F.col("text")).alias("toks"))
             .withColumn("n_toks", F.size("toks"))
             .where(F.col("n_toks").between(CORPUS["min_toks"],
                                            CORPUS["max_toks"])))
        # exact dedup: lowest doc_id per content hash wins; the shuffle
        # key is the 32-byte md5, never the document text
        w = W.partitionBy(F.md5("text")).orderBy("doc_id")
        return (t.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1).drop("_rn"))

    @model(r, name="corpus_splits", layer="gold", materialization="table",
           depends_on=("silver.documents",),
           description="Deterministic 80/10/10 split by md5 bucket")
    def corpus_splits(ctx: ModelContext) -> "DataFrame":
        d = ctx.ref("silver.documents")
        # plain_bucket + SPLIT_THRESHOLDS: the SAME definition the
        # standalone dataset_split query reads, so the two split
        # surfaces cannot desynchronize
        b = plain_bucket(F.col("doc_id"))
        split = (F.when(b < CORPUS["train_hi"], "train")
                 .when(b < CORPUS["val_hi"], "validation")
                 .otherwise("test"))
        return d.select("doc_id", split.alias("split"))

    @model(r, name="packed_sequences", layer="gold",
           materialization="table", partition_by=("shard",),
           depends_on=("silver.documents",),
           description="Concat-and-chunk packed training sequences")
    def packed_sequences(ctx: ModelContext) -> "DataFrame":
        d = ctx.ref("silver.documents")
        return pack_sequences(d.select("doc_id", "toks"),
                              block=CORPUS["block"],
                              shards=CORPUS["shards"],
                              seed=CORPUS["seed"])

    return r


def attach_corpus_checks(engine: "Engine") -> None:
    """Data-quality contract for the corpus DAG (same Check framework
    as the reference's tests — SURVEY §5.1 semantics)."""
    engine.add_check(C.not_null("silver.documents", "doc_id"))
    engine.add_check(C.not_null("silver.documents", "text"))
    engine.add_check(C.unique("silver.documents", "doc_id"))
    engine.add_check(C.accepted_values(
        "gold.corpus_splits", "split", ["train", "validation", "test"]))
    engine.add_check(C.relationship(
        "gold.corpus_splits", "doc_id", "silver.documents", "doc_id"))
    # singular: no packed sequence may exceed the block budget
    engine.add_check(C.singular(
        "packed_block_budget", "gold.packed_sequences",
        lambda df: (df.withColumn("k", F.size(F.filter(
                        F.split("piece", r"\s+"), lambda x: x != "")))
                    .groupBy("shard", "seq_id")
                    .agg(F.sum("k").alias("k"))
                    .filter(F.col("k") > CORPUS["block"]))))
