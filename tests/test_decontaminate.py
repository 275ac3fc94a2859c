"""Benchmark decontamination (operators/decontaminate.py): hand-case
semantics, the short-text fallback, complement consistency, and the
scale contract (corpus never shuffles; the benchmark set broadcasts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from promptner_spark.operators.decontaminate import (
    contamination_report, decontaminate,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_hand_case_hits(spark):
    docs = _docs(spark, [
        (1, "the quick brown fox jumps"),
        (2, "lorem ipsum dolor sit"),
        (3, "quick brown fox quick brown fox"),
    ])
    bench = spark.createDataFrame(
        [(100, "quick brown fox")], ["bench_id", "text"])
    rep = {r["doc_id"]: r["n_hits"]
           for r in contamination_report(docs, bench, n=3).collect()}
    # doc 1 shares exactly one distinct 3-gram; doc 3's repeats count
    # once (distinct grams per doc); doc 2 is clean.
    assert rep == {1: 1, 3: 1}
    clean = {r["doc_id"] for r in decontaminate(docs, bench, n=3).collect()}
    assert clean == {2}


def test_short_text_screens_verbatim_copies(spark):
    """A benchmark snippet shorter than n tokens contributes its whole
    text as the gram — verbatim copies are caught, supersets are not
    (no 13-gram exists to collide on)."""
    docs = _docs(spark, [(1, "foo bar"), (2, "foo bar baz")])
    bench = spark.createDataFrame([(9, "foo bar")], ["bench_id", "text"])
    rep = {r["doc_id"] for r in
           contamination_report(docs, bench, n=13).collect()}
    assert rep == {1}


def test_complement_partition(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    width = F.greatest(F.floor(F.size(toks) * 0.6).cast("int"), F.lit(1))
    bench = docs.where(F.col("doc_id") % 17 == 3).select(
        F.col("doc_id").alias("bench_id"),
        F.concat_ws(" ", F.slice(toks, 3, width)).alias("text"))
    total = docs.count()
    contaminated = contamination_report(docs, bench, n=13)
    hit_ids = {r["doc_id"] for r in contaminated.collect()}
    clean = decontaminate(docs, bench, n=13)
    assert clean.count() + len(hit_ids) == total
    # a bench slice of >= 13 tokens is verbatim-contiguous in its
    # source doc, so that source is GUARANTEED flagged. (Other docs
    # may legitimately collide too — the synthetic corpus draws from
    # a tiny vocabulary, so verbatim 13-gram reuse across docs is
    # real, exactly what decontamination exists to catch.)
    must_hit = {
        r["doc_id"] for r in docs
        .where((F.col("doc_id") % 17 == 3)
               & (F.floor(F.size(F.split(F.col("text"), " ")) * 0.6) >= 13))
        .collect()
    }
    assert must_hit and must_hit <= hit_ids
    assert clean.columns == docs.columns


def test_corpus_side_never_shuffles(spark):
    """Scale contract: the benchmark probe is a BroadcastHashJoin (the
    corpus stays put); no sort-merge join anywhere in the plan."""
    docs = _docs(spark, [(1, "a b c"), (2, "d e f")])
    bench = spark.createDataFrame([(9, "a b c")], ["bench_id", "text"])
    plan = contamination_report(docs, bench, n=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
