"""Incremental KG maintenance (streaming/incremental.py): the
foreachBatch merge over N drops must equal the one-shot batch pipeline
over the union — streaming/batch parity for the whole KG tail."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(autouse=True)
def few_state_partitions(spark):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", old)


def _pages(spark, sf_dir, lo, hi):
    from promptner_spark.sources.pages import pages_with_extracted_text
    p = pages_with_extracted_text(spark, sf_dir)
    return p.withColumn(
        "__id", F.split(F.col("url"), "/").getItem(3).cast("long")
    ).where(F.col("__id").between(lo, hi)).drop("__id")


def _counts_dict(df):
    return {(r["subj"], r["pred"], r["obj"]): (r["n_sents"], r["n_docs"])
            for r in df.collect()}


def test_incremental_merge_matches_one_shot_batch(spark, sf_dir, tmp_path):
    from promptner_spark.streaming.incremental import (
        batch_triple_counts, incremental_triple_counts, merge_counts,
    )

    full = _pages(spark, sf_dir, 0, 39)
    expected = _counts_dict(batch_triple_counts(full))
    assert expected, "corpus slice must produce triples"

    # two drops, merged through the store
    store = str(tmp_path / "triple_store")
    merge_counts(store, batch_triple_counts(_pages(spark, sf_dir, 0, 19)))
    merge_counts(store, batch_triple_counts(_pages(spark, sf_dir, 20, 39)))
    got = _counts_dict(spark.read.parquet(store))
    assert got == expected

    # the same merge driven by a real availableNow streaming query
    in_dir = str(tmp_path / "drops_in")
    _pages(spark, sf_dir, 0, 19).write.mode("append").parquet(in_dir)
    _pages(spark, sf_dir, 20, 39).write.mode("append").parquet(in_dir)
    stream = spark.readStream.schema(
        "url string, warc_ts timestamp, lang string, text string, "
        "extract_ok boolean").option("maxFilesPerTrigger", 1).parquet(in_dir)
    store2 = str(tmp_path / "triple_store_stream")
    q = incremental_triple_counts(
        stream, store2, str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    got_stream = _counts_dict(spark.read.parquet(store2))
    assert got_stream == expected
