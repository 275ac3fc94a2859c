"""Token-budget shard packing — the last stage of a training-data
pipeline: assign every document to a shard so that each shard holds
~``budget`` tokens of contiguous (deterministically shuffled) corpus,
ready to be written as one training file per shard.

Semantics: order documents by a deterministic pseudo-random key (the
portable sample hash — so shards are topic-mixed, not crawl-ordered),
take the EXCLUSIVE running token sum in that order, and put each doc
in shard ``prefix_tokens div budget`` — the standard greedy packing: a
doc straddling a boundary joins the shard where it starts, every shard
except the last crosses the budget by at most one document.

Reference scope: no counterpart in the reference (a pandas NER
harness); part of the LLM-data operator family (SURVEY.md §2.10),
exercised as `q_shard_pack` with a full DuckDB value-exact oracle.

Scale shape (the 100 TB lens) — a global prefix sum WITHOUT a global
sort-to-one-partition:

1. The order key is a uniform 60-bit hash, so its TOP BITS are a
   range partitioner by construction: bucket = h >> (60 - B). No
   sampled RangePartitioner (whose boundaries are
   nondeterministic), no skew (hash-uniform), deterministic
   bucket→key-range mapping.
2. Per-bucket token totals: one map-side-combinable groupBy over
   (bucket, n_tok) longs → 2^B rows to the driver (a bounded scalar
   probe, default 256) → exclusive bucket offsets broadcast back.
3. Within-bucket exclusive cumsum: one window per bucket ordered by
   (h, id) — the only wide exchange, and it moves a 3-long-column
   projection, never text. global_prefix = bucket_offset + local_sum.

Total: two narrow-row shuffles; the corpus text is scanned once for
token counts and never moves. The oracle replays the ONE-PHASE global
window (a single ORDER BY cumsum) — the hash gate proves the
bucketed two-phase decomposition exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.hashing import HASH_HEX_DIGITS
from ..functions.textstats import token_count
from .sample import sample_hash

#: sample_hash yields 4 * HASH_HEX_DIGITS = 60 uniform bits.
HASH_BITS = 4 * HASH_HEX_DIGITS


def shard_pack(docs: DataFrame, budget: int = 1_000_000,
               text_col: str = "text", id_col: str = "doc_id",
               seed: int = 0, bucket_bits: int = 8) -> DataFrame:
    """(id, n_tok, shard_id): greedy token-budget packing in
    deterministic hash order. ``bucket_bits`` sizes the two-phase
    decomposition (2^bits driver-side offset rows; each window group
    handles ~corpus/2^bits rows — raise it for larger clusters)."""
    h = sample_hash(F.col(id_col), seed)
    base = docs.select(
        F.col(id_col).alias("id"),
        token_count(F.col(text_col)).cast("long").alias("n_tok"),
        h.alias("_h"),
        F.shiftright(h, HASH_BITS - bucket_bits).alias("_bkt"),
    )
    totals = base.groupBy("_bkt").agg(F.sum("n_tok").alias("_tot"))
    rows = sorted((r["_bkt"], r["_tot"]) for r in totals.collect())
    offsets, acc = [], 0
    for bkt, tot in rows:
        offsets.append((bkt, acc))
        acc += tot
    from ..smalldf import small_df
    off_df = small_df(base.sparkSession, offsets, "_bkt long, _off long")
    w = (Window.partitionBy("_bkt").orderBy("_h", "id")
         .rowsBetween(Window.unboundedPreceding, -1))
    local = base.withColumn(
        "_cum", F.coalesce(F.sum("n_tok").over(w), F.lit(0).cast("long")))
    return (
        local.join(F.broadcast(off_df), "_bkt")
        .select(
            "id", "n_tok",
            F.expr(f"(_off + _cum) div {int(budget)}").alias("shard_id"))
    )


def shard_manifest(docs: DataFrame, budget: int = 1_000_000,
                   text_col: str = "text", id_col: str = "doc_id",
                   seed: int = 0, bucket_bits: int = 8) -> DataFrame:
    """Per-shard summary (shard_id, n_docs, n_tokens) — what a write
    job uses to size output files and what operators downstream audit."""
    packed = shard_pack(docs, budget, text_col, id_col, seed, bucket_bits)
    return packed.groupBy("shard_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"))


def shard_pack_naive(docs: DataFrame, budget: int = 1_000_000,
                     text_col: str = "text", id_col: str = "doc_id",
                     seed: int = 0) -> DataFrame:
    """The single-phase reference plan (one global-order window — all
    rows through one partition) — kept for the decomposition parity
    test; do not use at scale."""
    base = docs.select(
        F.col(id_col).alias("id"),
        token_count(F.col(text_col)).cast("long").alias("n_tok"),
        sample_hash(F.col(id_col), seed).alias("_h"))
    return base.select(
        "id", "n_tok",
        F.expr(f"(coalesce(sum(n_tok) OVER (ORDER BY _h, id "
               f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)) "
               f"div {int(budget)}").alias("shard_id"))


__all__ = ["shard_pack", "shard_manifest", "shard_pack_naive",
           "HASH_BITS"]
