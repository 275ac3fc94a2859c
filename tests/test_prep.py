"""End-to-end prep funnel (operators/prep.py): composition
properties over the real sf0.001 corpus — token conservation from the
curate survivors into the shard manifest, decontamination actually
removing a planted benchmark hit, mixture toggling, and cache
release. Stage-level semantics live in the stages' own test files."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from promptner_spark.functions.textstats import token_count
from promptner_spark.operators.curate import curate_kept
from promptner_spark.operators.prep import prepare_training_data


def _corpus(spark, sf_dir):
    return (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "lang", "text"))


def test_tokens_conserved_and_each_doc_packed_once(spark, sf_dir):
    docs = _corpus(spark, sf_dir)
    res = prepare_training_data(docs, shard_budget=200, bucket_bits=2)
    packed = res.packed.collect()
    manifest = res.manifest.collect()
    kept = curate_kept(docs)
    expect = {r["doc_id"]: r["n_tok"] for r in kept.select(
        "doc_id", token_count(F.col("text")).alias("n_tok")).collect()}
    got = {r["doc_id"]: r["n_tok"] for r in packed}
    assert got == expect                       # once each, exact counts
    assert sum(m["n_tokens"] for m in manifest) == sum(expect.values())
    assert sum(m["n_docs"] for m in manifest) == len(expect)
    # lang survives the funnel for the write job's partitioning
    assert {r["lang"] for r in packed} <= {"en", "de", "fr", "es", "zh"}
    res.unpersist()


def test_bench_hit_is_removed(spark, sf_dir):
    docs = _corpus(spark, sf_dir)
    base = prepare_training_data(docs, shard_budget=200, bucket_bits=2)
    survivors = {r["doc_id"] for r in base.packed.collect()}
    base.unpersist()
    victim = sorted(survivors)[0]
    victim_text = docs.where(F.col("doc_id") == victim) \
        .collect()[0]["text"]
    bench = docs.sparkSession.createDataFrame(
        [(0, victim_text)], ["bench_id", "text"])
    res = prepare_training_data(docs, bench=bench, decon_n=13,
                                shard_budget=200, bucket_bits=2)
    after = {r["doc_id"] for r in res.packed.collect()}
    assert victim not in after
    assert after < survivors                   # strictly fewer, same pool
    res.unpersist()


def test_mixture_zero_rate_empties_the_shards(spark, sf_dir):
    docs = _corpus(spark, sf_dir)
    res = prepare_training_data(
        docs, mixture={lang: 0.0 for lang in
                       ("en", "de", "fr", "es", "zh")},
        shard_budget=200, bucket_bits=2)
    assert res.manifest.count() == 0
    res.unpersist()
