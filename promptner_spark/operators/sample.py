"""Deterministic sampling for training-mixture construction — the
stage between curation and sharding in an LLM data pipeline: draw a
reproducible pseudo-random subset (a global rate, per-source mixture
rates, or an exact per-group quota) that is IDENTICAL across runs,
partitionings, and cluster sizes.

Reference scope: the reference (a pandas NER harness) samples with
`random.sample` (`data.py`) — seed-dependent and single-process. This
module is the distributed, rerun-stable counterpart, part of the
LLM-data operator family (SURVEY.md §2.10), exercised as
`q_quota_sample` / `q_mixture_sample` with full DuckDB value-exact
oracles.

Determinism contract: membership depends ONLY on the row's id (60-bit
portable md5 of the id string, seed-namespaced) — never on partition
layout, task order, or Spark's RNG. `rand(seed)` is explicitly NOT
used: its draw depends on the partition index and row position, so a
repartition or an AQE re-plan changes the sample.

Scale shape (the 100 TB lens):

- `rate_sample` / `mixture_sample` are pure map-side predicates on
  the scan — zero shuffle, zero Python. Mixture rates ride along as a
  literal CASE over the (tiny) group domain.
- `quota_sample` ("exactly K docs per group") is where naive plans
  die at scale: a global per-group row_number() sorts EVERY row of
  every group through one window exchange. This implementation
  two-phases it: (1) exact per-group counts — an agg the optimizer
  partial-aggregates map-side, output = |groups| rows, broadcast
  back; (2) a map-side hash-threshold prefilter keeps ~quota + 6σ
  candidates per group (Binomial tail: the probability the true
  quota-th smallest hash exceeds the threshold is < 1e-9 even at
  quota=10); (3) the exact row_number() window runs on the SURVIVORS
  only — O(quota) rows per group through the exchange instead of
  O(group). The prefilter is output-invariant (it keeps every row
  the final rank keeps), which `q_quota_sample`'s oracle proves: the
  DuckDB side is the naive single-phase rank, and the value hashes
  must agree.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.hashing import HASH_HEX_DIGITS, portable_hash

#: portable_hash range is [0, 16**HASH_HEX_DIGITS) — 60 bits.
HASH_SPACE = 16 ** HASH_HEX_DIGITS

#: Seed namespacing sampling hashes away from dedup/decontamination.
SAMPLE_SEED_BASE = "smp"


def sample_hash(id_col: Column, seed: int = 0) -> Column:
    """The membership hash: 60-bit portable md5 of ``smp<seed>:<id>``.
    Uniform on [0, HASH_SPACE); replayed literally by the oracles."""
    return portable_hash(id_col.cast("string"),
                         seed=F.lit(f"{SAMPLE_SEED_BASE}{seed}:"))


def duckdb_sample_hash(id_expr: str, seed: int = 0) -> str:
    """DuckDB rendering of :func:`sample_hash` (mirrors
    functions/hashing.py::duckdb_portable_hash with the composite
    seed string)."""
    return (f"CAST(concat('0x', substr(md5(concat("
            f"'{SAMPLE_SEED_BASE}{seed}:', CAST({id_expr} AS VARCHAR))), "
            f"1, {HASH_HEX_DIGITS})) AS BIGINT)")


def rate_sample(docs: DataFrame, rate: float, id_col: str = "doc_id",
                seed: int = 0) -> DataFrame:
    """Keep each row with probability ``rate``, deterministically:
    membership = hash(id) < rate * HASH_SPACE. Map-only."""
    thr = F.lit(int(rate * HASH_SPACE)).cast("long")
    return docs.where(sample_hash(F.col(id_col), seed) < thr)


def mixture_sample(docs: DataFrame, rates: dict[str, float],
                   group_col: str = "lang", id_col: str = "doc_id",
                   seed: int = 0) -> DataFrame:
    """Per-group Bernoulli rates (a training-mixture spec: up/down-
    weight sources by keeping different fractions). Groups absent
    from ``rates`` are dropped (rate 0). Map-only: the rate table is
    a literal CASE expression, not a join."""
    thr = F.lit(-1).cast("long")
    for g in sorted(rates):
        thr = F.when(F.col(group_col) == g,
                     F.lit(int(rates[g] * HASH_SPACE)).cast("long")) \
            .otherwise(thr)
    return docs.where(sample_hash(F.col(id_col), seed) < thr)


def quota_threshold(quota: int, n: int) -> float:
    """Prefilter keep-probability for a group of ``n`` rows: quota
    plus a 6-sigma-and-change Binomial margin, capped at 1."""
    if n <= quota:
        return 1.0
    return min(1.0, (quota + 6.0 * math.sqrt(quota) + 16.0) / n)


def quota_sample(docs: DataFrame, group_col: str = "lang",
                 quota: int = 1000, id_col: str = "doc_id",
                 seed: int = 0) -> DataFrame:
    """Exactly min(quota, |group|) rows per group: the ``quota`` rows
    with the smallest (hash, id) per group. Two-phase — see module
    docstring; output provably equals the naive per-group
    row_number() ≤ quota."""
    h = sample_hash(F.col(id_col), seed)
    hashed = docs.withColumn("_smp_h", h)
    # phase 1: exact group sizes (|groups| rows) -> per-group threshold
    counts = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("_smp_n"))
    thr = (
        F.when(F.col("_smp_n") <= quota, F.lit(HASH_SPACE).cast("double"))
        .otherwise(F.least(
            F.lit(1.0),
            (F.lit(float(quota)) + 6.0 * math.sqrt(quota) + 16.0)
            / F.col("_smp_n")) * F.lit(float(HASH_SPACE)))
    )
    counts = counts.withColumn("_smp_thr", thr)
    # phase 2: map-side prefilter via broadcast of the group table
    pre = hashed.join(F.broadcast(counts), group_col) \
        .where(F.col("_smp_h") < F.col("_smp_thr"))
    # phase 3: exact rank over the O(quota)-per-group survivors
    w = Window.partitionBy(group_col).orderBy("_smp_h", id_col)
    return (
        pre.withColumn("_smp_rk", F.row_number().over(w))
        .where(F.col("_smp_rk") <= quota)
        .drop("_smp_h", "_smp_n", "_smp_thr", "_smp_rk")
    )


def quota_sample_naive(docs: DataFrame, group_col: str = "lang",
                       quota: int = 1000, id_col: str = "doc_id",
                       seed: int = 0) -> DataFrame:
    """The single-phase reference plan (full per-group window) — kept
    for the output-invariance parity test; do not use at scale."""
    w = Window.partitionBy(group_col).orderBy(
        sample_hash(F.col(id_col), seed), id_col)
    return (
        docs.withColumn("_smp_rk", F.row_number().over(w))
        .where(F.col("_smp_rk") <= quota)
        .drop("_smp_rk")
    )


__all__ = ["sample_hash", "duckdb_sample_hash", "rate_sample",
           "mixture_sample", "quota_sample", "quota_sample_naive",
           "quota_threshold", "HASH_SPACE"]
