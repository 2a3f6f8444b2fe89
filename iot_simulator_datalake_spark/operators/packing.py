"""Sequence packing: concatenate a tokenized corpus and cut fixed-size
training blocks (the GPT-style "concat-and-chunk" pretraining step).

Used by the declared query ``seq_packing`` and the corpus pipeline's
gold ``packed_sequences`` model — one implementation, certified by the
DuckDB oracle gate in both places.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Window as W
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame


#: THE dataset-split thresholds: bucket < 80 → train, < 90 →
#: validation, else test.  One definition — dataset_split
#: (queries_training), the corpus-prep pipeline (corpus_models), and
#: their oracles all read it; literal copies silently desynchronized
#: split membership across surfaces (test-set leakage with no gate).
SPLIT_THRESHOLDS = dict(train=80, validation=90)


def plain_bucket(col, mod: int = 100):
    """Un-seeded md5 bucket over a key column — the split/contamination
    bucket expression, single-sourced for the same reason as
    SPLIT_THRESHOLDS (and mirrored literally in the DuckDB oracles)."""
    h = F.md5(col.cast("string"))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % mod


def hash_bucket(col, seed: str, mod: int):
    """Deterministic engine-portable bucket: md5(seed:key) % mod —
    stable across runs, engines, partitionings, and retries (the
    repo-wide substitute for ``rand()`` in training-data ops)."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), col.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % mod


def pack_sequences(docs: "DataFrame", *, block: int, shards: int,
                   seed: str, doc_col: str = "doc_id",
                   toks_col: str = "toks") -> "DataFrame":
    """(shard, seq_id, doc_id, tok_off, piece): concatenate every
    document's tokens (within a deterministic hash shard, in
    ``doc_col`` order) and cut the stream into fixed ``block``-token
    sequences; docs spanning a boundary split across sequences.

    Scale design: a single global concatenation would serialize on one
    cumulative sum, so the corpus is hash-sharded first (thousands of
    shards at 100 TB) and packed per shard — shards are embarrassingly
    parallel and the window sum is one shuffle.  The explode emits
    block *indices*, never replicated token arrays; each token is
    sliced exactly once (conservation asserted in tests).
    """
    t = (docs.select(doc_col, toks_col)
         .withColumn("n", F.size(toks_col).cast("long"))
         .where(F.col("n") > 0)
         .withColumn("shard", hash_bucket(
             F.col(doc_col), seed, shards).cast("int")))
    w = (W.partitionBy("shard").orderBy(doc_col)
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    t = (t.withColumn("e", F.sum("n").over(w))
         .withColumn("s", F.col("e") - F.col("n"))
         .withColumn("blk", F.explode(F.sequence(
             F.expr(f"s div {block}"), F.expr(f"(e - 1) div {block}")))))
    g = F.greatest(F.col("blk") * block, F.col("s"))
    e_in = F.least((F.col("blk") + 1) * block, F.col("e"))
    off = (g - F.col("s")).cast("int")
    return t.select(
        "shard", F.col("blk").alias("seq_id"), doc_col,
        off.alias("tok_off"),
        F.array_join(F.slice(toks_col, off + 1, (e_in - g).cast("int")),
                     " ").alias("piece"))
