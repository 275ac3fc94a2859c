"""Memoized parquet scan construction.

``spark.read.parquet(path)`` costs ~100 ms of driver work PER CALL
(file listing + footer schema inference + analysis round trips — r6
measurement), and the registry queries rebuild their scans on every
invocation, so a bench run pays it hundreds of times for the same
immutable files. The memo returns the SAME analyzed DataFrame object
for the same (application, path): a DataFrame is an immutable lazy
plan, so this reuses plan METADATA only — every action still reads
and computes from the parquet files (no results, rows or blocks are
cached anywhere).

Keyed by applicationId so a stopped/restarted session never sees a
stale plan. Intended for the driver/bench surfaces over the immutable
testdata tables; code paths that rewrite files in place should keep
calling ``spark.read.parquet`` directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_SCAN_CACHE: dict[tuple[str, str], DataFrame] = {}


def cached_parquet(spark: SparkSession, path: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, path)
    df = _SCAN_CACHE.get(key)
    if df is None:
        df = spark.read.parquet(path)
        _SCAN_CACHE[key] = df
    return df


__all__ = ["cached_parquet"]
