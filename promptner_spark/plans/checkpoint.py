"""Stage checkpointing + per-partition lineage manifests **[NORTH]**.

north_rule: "resumable from checkpoint with per-partition lineage +
metrics". Iceberg isn't available in this sandbox (no catalog jars), so
stages materialize as parquet directories under a run root with the
same layout discipline an Iceberg writer would have:

    <root>/<stage>/data/            parquet, partitioned by bucket
    <root>/<stage>/_manifest/       parquet rows (schema.MANIFEST)
    <root>/<stage>/_SUCCESS_STAGE   atomic completion marker

Resume contract: ``run_stage`` short-circuits to a plain read when the
marker exists; a partial run (data written, no marker) is re-executed.
Per-partition metrics are collected DISTRIBUTED (mapPartitions-style
count via ``spark_partition_id``) — no driver-side loops.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def _marker(root: str, stage: str) -> str:
    return os.path.join(root, stage, "_SUCCESS_STAGE")


def stage_is_complete(root: str, stage: str) -> bool:
    return os.path.exists(_marker(root, stage))


def write_stage(df: DataFrame, root: str, stage: str,
                partition_cols: list[str] | None = None) -> DataFrame:
    """Materialize a stage + its manifest; returns the re-read frame
    (so downstream plans read columnar parquet, not the live DAG)."""
    spark = df.sparkSession
    data_dir = os.path.join(root, stage, "data")
    t0 = time.time()
    writer = df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(data_dir)

    out = spark.read.parquet(data_dir)
    wall_ms = int((time.time() - t0) * 1000)
    manifest = (
        out.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("output_rows"))
        .select(
            F.lit(stage).alias("stage"),
            "partition_id",
            F.lit(-1).cast("long").alias("input_rows"),
            F.col("output_rows").cast("long"),
            F.lit("ok").alias("status"),
            F.lit(wall_ms).cast("long").alias("wall_ms"),
        )
    )
    manifest.write.mode("overwrite").parquet(os.path.join(root, stage, "_manifest"))
    with open(_marker(root, stage), "w") as fh:
        json.dump({"stage": stage, "wall_ms": wall_ms}, fh)
    return out


def run_stage(spark: SparkSession, root: str, stage: str,
              build: Callable[[], DataFrame],
              partition_cols: list[str] | None = None) -> DataFrame:
    """Resume-aware stage execution: completed → read back; else build,
    materialize, mark."""
    if stage_is_complete(root, stage):
        return spark.read.parquet(os.path.join(root, stage, "data"))
    return write_stage(build(), root, stage, partition_cols)


def read_manifest(spark: SparkSession, root: str, stage: str) -> DataFrame:
    return spark.read.parquet(os.path.join(root, stage, "_manifest"))
