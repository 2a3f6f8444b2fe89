"""The corpus-curation filter stack as a third Engine DAG: the
medallion pattern applied to quality filtering — raw documents in,
per-stage retention report out, with the trained LM model as a
first-class MATERIALIZED table between silver models.

- bronze.documents        raw parquet landing (view)
- silver.bigram_model     the trained add-one bigram LM: (prev, cur,
                          n2) distinct-bigram counts — materialized so
                          scoring reads a table, not a re-aggregation
                          (and so incremental count-merges can refresh
                          it without touching scorers)
- silver.doc_flags        per-document Gopher + classifier verdicts
- silver.lm_scores        per-document avg NLL, scored AGAINST the
                          materialized model table (model-as-table
                          dependency, the lakehouse ML-feature shape)
- gold.curation_funnel    the 5-stage retention report

Certified end-to-end by ``engine_curation_pipeline``
(queries_curation.py), whose DuckDB oracle — the funnel oracle, which
embeds each filter's own oracle verbatim — replays the whole DAG in
SQL.

Scale notes: the model table is vocab²-bounded; doc_flags is map-only
plus the repetition gate's one doc_id-keyed count shuffle; lm_scores
joins corpus bigrams to the model on (prev, cur) with AQE free to
broadcast the model; the funnel reduces to a 5-row report through one
(source, survivor)-keyed window.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

from ..engine import checks as C
from ..engine.model import ModelContext, Registry, model

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame
    from ..engine.runner import Engine


def build_curation_registry() -> Registry:
    from ..queries_curation import (_LM_TAU, _bigram_lm, _classifier,
                                    _doc_bigrams, _funnel_report,
                                    _gopher_rules)
    r = Registry()

    @model(r, name="documents", layer="bronze",
           description="Raw document landing (parquet)")
    def bronze_documents(ctx: ModelContext) -> "DataFrame":
        return ctx.spark.read.parquet(ctx.var("documents_path"))

    @model(r, name="bigram_model", layer="silver",
           materialization="table", depends_on=("bronze.documents",),
           description="Add-one bigram LM count table (prev, cur, n2)")
    def bigram_model(ctx: ModelContext) -> "DataFrame":
        bi = _doc_bigrams(ctx.ref("bronze.documents"))
        return bi.groupBy("prev", "cur").agg(
            F.count(F.lit(1)).alias("n2"))

    @model(r, name="doc_flags", layer="silver", materialization="table",
           depends_on=("bronze.documents",),
           description="Gopher rule + hashed-classifier verdicts per doc")
    def doc_flags(ctx: ModelContext) -> "DataFrame":
        d = ctx.ref("bronze.documents")
        g = _gopher_rules(d).select(
            "doc_id", F.col("keep").alias("g_ok"))
        c = _classifier(d).select(
            "doc_id", F.col("keep").alias("c_ok"))
        return (d.select("doc_id", "source")
                .join(g, "doc_id").join(c, "doc_id"))

    @model(r, name="lm_scores", layer="silver", materialization="table",
           depends_on=("bronze.documents", "silver.bigram_model"),
           description="Per-doc avg NLL scored against the model table")
    def lm_scores(ctx: ModelContext) -> "DataFrame":
        return _bigram_lm(ctx.ref("bronze.documents"),
                          c2=ctx.ref("silver.bigram_model"))

    @model(r, name="curation_funnel", layer="gold",
           materialization="table",
           depends_on=("bronze.documents", "silver.doc_flags",
                       "silver.lm_scores"),
           description="Per-stage retention: total → gopher → LM → "
                       "classifier → per-source cap")
    def curation_funnel(ctx: ModelContext) -> "DataFrame":
        d = ctx.ref("bronze.documents")
        flags = ctx.ref("silver.doc_flags")
        lm = ctx.ref("silver.lm_scores").select(
            "doc_id", (F.col("avg_nll_bits") <= _LM_TAU).alias("l_ok"))
        return _funnel_report(
            d, flags.select("doc_id", "g_ok"), lm,
            flags.select("doc_id", "c_ok"))

    return r


def attach_curation_checks(engine: "Engine") -> None:
    """Quality contract for the curation DAG."""
    engine.add_check(C.not_null("silver.doc_flags", "doc_id"))
    engine.add_check(C.unique("silver.doc_flags", "doc_id"))
    engine.add_check(C.unique("silver.lm_scores", "doc_id"))
    engine.add_check(C.relationship(
        "silver.lm_scores", "doc_id", "silver.doc_flags", "doc_id"))
    # singular: funnel stage counts must be monotonically non-increasing
    # (a violated funnel means a filter ADDED documents — impossible)
    def _non_monotone(df: "DataFrame") -> "DataFrame":
        from pyspark.sql import Window as W
        prev = F.lag("n_docs").over(W.orderBy("ord"))
        return (df.withColumn("prev", prev)
                .filter(F.col("prev").isNotNull() &
                        (F.col("n_docs") > F.col("prev"))))
    engine.add_check(C.singular(
        "funnel_monotone", "gold.curation_funnel", _non_monotone))
