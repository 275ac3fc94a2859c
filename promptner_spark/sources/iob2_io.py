"""Distributed IOB2 file I/O (operators S1 + S7, SURVEY.md §2.1).

Reader: the reference parses token-per-line files with blank-line
sentence boundaries (`data.py:18-88`). Sentence boundaries cross line
splits, so the unit of parallelism is the FILE, not the line:
``spark.read.text(..., wholetext=True)`` gives one row per file and a
``mapInPandas`` runs the vendored state machine
(oracle/iob2.py::parse_iob2_lines) per file. Gold corpora are small
(10³-10⁵ sentences) but sharded corpora parallelize per shard.

Writer: sentence table → token-per-line text (`data.py:91-105`),
expressed as posexplode + concat_ws — pure JVM; one output part per
partition.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

SENTENCES_SCHEMA = T.StructType([
    T.StructField("source_file", T.StringType(), False),
    T.StructField("sent_id", T.IntegerType(), False),
    T.StructField("text", T.StringType(), False),
    T.StructField("entities", T.ArrayType(T.StringType()), False),
    T.StructField("types", T.MapType(T.StringType(), T.StringType()), False),
    T.StructField("exact_types", T.ArrayType(T.StringType()), False),
])


def read_iob2(spark: SparkSession, path: str) -> DataFrame:
    """S1: IOB2 file(s) → sentence table, one task per file."""
    from ..oracle.iob2 import parse_iob2_lines

    files = spark.read.text(path, wholetext=True) \
        .select(F.input_file_name().alias("source_file"), "value")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fname, blob in zip(pdf["source_file"], pdf["value"]):
                for i, rec in enumerate(parse_iob2_lines(blob.splitlines())):
                    rows.append((fname, i, rec["text"], rec["entities"],
                                 rec["types"], rec["exact_types"]))
            yield pd.DataFrame(rows, columns=[f.name for f in SENTENCES_SCHEMA])

    return files.mapInPandas(parse, schema=SENTENCES_SCHEMA)


def write_iob2(df: DataFrame, out_dir: str,
               tokens_col: str | None = None) -> None:
    """S7: sentence table → token-per-line IOB2 text files. Each
    sentence renders to ``tok\\ttag`` lines + a blank separator; the
    whole rendering is zip_with + explode, no Python."""
    toks = F.col(tokens_col) if tokens_col else F.split(F.col("text"), " ")
    block = F.concat_ws(
        "\n",
        F.zip_with(toks, F.col("exact_types"),
                   lambda t, g: F.concat_ws("\t", t, g)))
    df.select(F.concat(block, F.lit("\n")).alias("value")) \
        .write.mode("overwrite").text(out_dir)
