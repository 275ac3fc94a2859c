"""Arrow-backed construction of small driver-side DataFrames.

``SparkSession.createDataFrame(list)`` ships the rows as a PICKLED
Python RDD split into ``defaultParallelism`` slices: every scan of the
result runs one Python-worker round trip PER TASK to unpickle its
(usually empty) slice — measured r6: a 13-row alias table cost
~150 ms/task x 32 tasks on every broadcast build, and a 10-row local
PageRank result cost ~5 s of task time per noop save. The pandas+Arrow
path converts driver-side and is scanned by pure-JVM tasks — no
Python worker ever runs on the executors (guide §6 "Arrow for driver
transfers"): the same 13-row table measured 62 ms vs 331 ms per scan.
(The Arrow path still slices into defaultParallelism record batches;
the cost was never the task count but the per-task Python round trip.)

Values are identical — only the physical construction changes. At any
real scale these tables are still driver-small (alias dictionaries,
per-bucket offsets, local graph results).
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession, types as T


def small_df(spark: SparkSession, rows: Iterable[Sequence],
             schema: T.StructType | str) -> DataFrame:
    """Arrow-converted DataFrame from a small driver-side row list —
    no Python-worker cost on any executor scan. Falls back to the
    plain list path for inputs pandas/Arrow cannot represent."""
    rows = list(rows)
    try:
        import pandas as pd

        if isinstance(schema, str):
            schema = T._parse_datatype_string(schema)
        pdf = pd.DataFrame(
            rows, columns=[f.name for f in schema.fields])
        return spark.createDataFrame(pdf, schema=schema)
    except Exception:
        return spark.createDataFrame(rows, schema=schema)


__all__ = ["small_df"]
