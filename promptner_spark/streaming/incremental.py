"""Incremental KG maintenance: keep the aggregated triple table
current as crawl drops arrive, without re-aggregating history.

Pattern: ``foreachBatch`` — each micro-batch runs the UNCHANGED batch
pipeline tail (fused extraction → linking → canonicalization → triple
emission → counts) on just the new pages, then MERGEs the batch counts
into the cumulative store by key-wise addition. This is the standard
production shape for "streaming into a warehouse table": the stateful
part is the store itself, not executor state, so nothing here grows
executor memory and a crashed query resumes from the sink + source
checkpoint.

Counts merge additively because both metrics are per-(url, sent_id)
facts: ``n_sents`` sums, and ``n_docs`` sums AS LONG AS a url never
spans micro-batches — pages stream whole, so every sentence (and
therefore every (triple, url) contribution) of a url lands in one
batch. That invariant is asserted in the test by replaying the same
corpus in 1 drop vs 2 drops and comparing byte-for-byte.

The store is an atomically-swapped parquet directory (write new →
rename), the same stand-in discipline as plans/checkpoint.py; with an
Iceberg catalog the merge becomes a MERGE INTO on the triples table
(plans/checkpoint.py::write_stage_iceberg gate).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

COUNT_COLS = ("n_sents", "n_docs")
KEY_COLS = ("subj", "pred", "obj")


def batch_triple_counts(pages_batch: DataFrame) -> DataFrame:
    """The batch pipeline tail on one micro-batch of pages."""
    from ..operators import linking, triples as triples_op
    from ..sources.sentences import split_sentences
    from ..operators.infer import extract_mentions

    spark = pages_batch.sparkSession
    sentences = split_sentences(pages_batch)
    # eager fill, same reason as build_pipeline: several concurrent
    # consumers (vocab distinct + the stream join) must not race the
    # cache fill and duplicate the UDF chain
    mentions = extract_mentions(sentences).persist()
    mentions.count()
    linked = linking.link_mentions(mentions, linking.alias_df(spark))
    canonical = triples_op.canonicalize(linked)
    counts = triples_op.triple_counts(triples_op.emit_triples(canonical))
    counts = counts.localCheckpoint(eager=True)   # consume before release
    linking.release_caches(linked)
    mentions.unpersist()
    return counts


def merge_counts(store_dir: str, batch_counts: DataFrame) -> None:
    """Key-wise additive merge of one batch into the parquet store,
    atomically (write to a sibling temp dir, then swap)."""
    spark = batch_counts.sparkSession
    new = batch_counts
    if os.path.exists(os.path.join(store_dir, "_SUCCESS")):
        old = spark.read.parquet(store_dir)
        new = old.unionByName(new).groupBy(*KEY_COLS).agg(
            *[F.sum(c).cast("long").alias(c) for c in COUNT_COLS])
    else:
        new = new.select(*KEY_COLS,
                         *[F.col(c).cast("long").alias(c)
                           for c in COUNT_COLS])
    tmp = store_dir.rstrip("/") + ".__staging__"
    new.write.mode("overwrite").parquet(tmp)
    if os.path.exists(store_dir):
        shutil.rmtree(store_dir)
    os.replace(tmp, store_dir)


def incremental_triple_counts(
    pages_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start the maintenance query: pages stream → per-batch pipeline
    tail → additive merge into ``store_dir``. Returns the streaming
    query handle (caller awaits/stops)."""

    def step(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_counts(store_dir, batch_triple_counts(batch_df))

    writer = pages_stream.writeStream.foreachBatch(step) \
        .option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
