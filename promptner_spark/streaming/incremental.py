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

Store layout (r4 — versioned buckets + pointer file; replaces the r3
whole-table rmtree/rename swap, which had a crash window with NO
store present and rewrote every row every micro-batch):

    <store>/CURRENT              atomic pointer (JSON): bucket→dir map,
                                 n_buckets, last applied batch_id
    <store>/data/b<k>_v<n>/      one bucket's rows at one version
                                 (plain parquet, immutable once named)

- **Crash-safe**: a merge writes NEW bucket dirs, then promotes them
  with ONE ``os.replace`` of the pointer file. A crash anywhere
  before that leaves the previous pointer + its dirs fully intact
  (orphaned staging/new dirs are swept on the next merge); there is
  never a moment without a readable store.
- **Idempotent** (at-least-once foreachBatch): the pointer records
  the last applied ``batch_id``; a replayed batch (restart between
  merge and the streaming checkpoint commit) is skipped instead of
  double-counted. Single-writer discipline, same as the streaming
  checkpoint itself.
- **Bucket-wise**: rows are bucketed on ``pmod(xxhash64(subj), B)``
  — the same subject-hash bucketing plans/pipeline.py uses for the
  triples stage — and a merge rewrites ONLY the buckets the batch
  touches: untouched buckets keep their exact files (byte-identical,
  asserted in tests). At 10⁴+ buckets a small crawl drop rewrites a
  few files, not the corpus-wide edge table.

With an Iceberg catalog the merge becomes a MERGE INTO on the triples
table (plans/checkpoint.py::write_stage_iceberg gate) and Iceberg's
snapshot commit subsumes the pointer file.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

COUNT_COLS = ("n_sents", "n_docs")
KEY_COLS = ("subj", "pred", "obj")
N_BUCKETS = 16
_POINTER = "CURRENT"


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


def _bucket_col(n_buckets: int):
    return F.pmod(F.xxhash64("subj"), F.lit(n_buckets)).cast("int")


def _pointer_path(store_dir: str) -> str:
    return os.path.join(store_dir, _POINTER)


def _load_pointer(store_dir: str) -> dict | None:
    try:
        with open(_pointer_path(store_dir)) as fh:
            return json.load(fh)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def _write_pointer(store_dir: str, ptr: dict) -> None:
    """Atomic publish: the os.replace of this one file IS the commit."""
    tmp = _pointer_path(store_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(ptr, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, _pointer_path(store_dir))


def _sweep_orphans(store_dir: str, ptr: dict | None) -> None:
    """Remove staging leftovers + data dirs no pointer references —
    debris from a crash between dir-promotion and pointer publish.
    Best-effort; referenced dirs are never touched."""
    live = set((ptr or {}).get("buckets", {}).values())
    data = os.path.join(store_dir, "data")
    if os.path.isdir(data):
        for name in os.listdir(data):
            rel = f"data/{name}"
            if rel not in live:
                shutil.rmtree(os.path.join(data, name), ignore_errors=True)
    for name in os.listdir(store_dir):
        if name.startswith(".staging_"):
            shutil.rmtree(os.path.join(store_dir, name), ignore_errors=True)


def read_store(spark: SparkSession, store_dir: str) -> DataFrame | None:
    """Current cumulative counts (subj, pred, obj, n_sents, n_docs),
    or None when no version has been published yet."""
    ptr = _load_pointer(store_dir)
    if not ptr or not ptr["buckets"]:
        return None
    paths = [os.path.join(store_dir, rel) for rel in ptr["buckets"].values()]
    return spark.read.parquet(*paths)


def merge_counts(store_dir: str, batch_counts: DataFrame,
                 batch_id: int | None = None,
                 n_buckets: int = N_BUCKETS) -> bool:
    """Key-wise additive merge of one batch into the versioned bucket
    store. Returns False (no-op) when ``batch_id`` was already
    applied — the at-least-once replay guard. Only buckets the batch
    touches are rewritten; the commit is one pointer-file replace."""
    spark = batch_counts.sparkSession
    os.makedirs(store_dir, exist_ok=True)
    ptr = _load_pointer(store_dir)
    if (batch_id is not None and ptr is not None
            and ptr.get("last_batch_id") is not None
            and batch_id <= ptr["last_batch_id"]):
        return False
    _sweep_orphans(store_dir, ptr)
    if ptr is not None:
        n_buckets = ptr["n_buckets"]   # layout is fixed at creation
    version = (ptr["version"] + 1) if ptr else 1

    batch = batch_counts.select(
        *KEY_COLS,
        *[F.col(c).cast("long").alias(c) for c in COUNT_COLS],
    ).withColumn("bucket", _bucket_col(n_buckets))
    touched = sorted(r["bucket"]
                     for r in batch.select("bucket").distinct().collect())
    if not touched:
        if ptr is not None and batch_id is not None:
            ptr["last_batch_id"] = batch_id
            _write_pointer(store_dir, ptr)
        elif ptr is None:
            _write_pointer(store_dir, {
                "version": version, "n_buckets": n_buckets,
                "buckets": {}, "last_batch_id": batch_id})
        return True

    buckets = dict((ptr or {}).get("buckets", {}))
    old_paths = [os.path.join(store_dir, buckets[str(k)])
                 for k in touched if str(k) in buckets]
    merged = batch
    if old_paths:
        old = spark.read.parquet(*old_paths).withColumn(
            "bucket", _bucket_col(n_buckets))
        merged = old.unionByName(batch)
    merged = merged.groupBy("bucket", *KEY_COLS).agg(
        *[F.sum(c).cast("long").alias(c) for c in COUNT_COLS])

    # one write job for ALL touched buckets, hive-partitioned by
    # bucket, then each partition dir is promoted to its immutable
    # versioned name; the bucket value is recomputed from subj on read
    staging = os.path.join(store_dir, f".staging_v{version}")
    merged.write.mode("overwrite").partitionBy("bucket").parquet(staging)
    os.makedirs(os.path.join(store_dir, "data"), exist_ok=True)
    for k in touched:
        src = os.path.join(staging, f"bucket={k}")
        rel = f"data/b{k}_v{version}"
        if os.path.isdir(src):   # all-zero bucket could vanish; keep map
            os.replace(src, os.path.join(store_dir, rel))
            buckets[str(k)] = rel
    shutil.rmtree(staging, ignore_errors=True)

    new_ptr = {
        "version": version,
        "n_buckets": n_buckets,
        "buckets": buckets,
        "last_batch_id": batch_id if batch_id is not None
        else (ptr or {}).get("last_batch_id"),
    }
    _write_pointer(store_dir, new_ptr)          # ← the atomic commit
    # old versions of the touched buckets are now unreferenced
    _sweep_orphans(store_dir, new_ptr)
    return True


def incremental_triple_counts(
    pages_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start the maintenance query: pages stream → per-batch pipeline
    tail → additive merge into ``store_dir``. Returns the streaming
    query handle (caller awaits/stops). The merge records each
    batch_id in the store pointer, so a batch replayed after a crash
    between merge and checkpoint commit is skipped, not re-added."""

    def step(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_counts(store_dir, batch_triple_counts(batch_df),
                     batch_id=batch_id)

    writer = pages_stream.writeStream.foreachBatch(step) \
        .option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
