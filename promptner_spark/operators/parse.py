"""Answer parsing + span alignment + mention materialization
(operators A1-A4, P1, SP1-SP2, E4 — SURVEY.md §2.5-2.6).

One scalar pandas UDF runs the vendored oracle chain per row:
``parse_exemplar_answers`` (`utils.py:107-153` semantics) →
``clean_answers`` typed mode (`algorithms.py:37-63`) → ``align_spans``
(`algorithms.py:72-131`). Per-row PURE — output cannot depend on
partitioning or batch composition, which is what makes the pipeline
deterministic across cluster sizes (north_rule) and lets the golden
replay tests assert byte-identical tags.

Mentions are then exploded from the tag sequence into the keyed
mention table (fixing the reference's surface-keyed dict collision,
`data.py:38`).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

from ..oracle.align import align_spans
from ..oracle.clean import clean_answers
from ..oracle.parsing import parse_exemplar_answers
from ..oracle.spans import tags_to_mentions
from .model import RetryingBackend

_FAIL = RetryingBackend.FAIL_PREFIX


def predict_tags(text: str, raw_output: str) -> list[str]:
    """The full parse→clean→align chain for one row (driver-callable
    for tests; UDF body below). Failure sentinels → all-O tags."""
    tokens = text.split(" ")
    if raw_output.startswith(_FAIL):
        return ["O"] * len(tokens)
    surfaces, typestrings = parse_exemplar_answers(
        raw_output, true_only=True, identify_types=True)
    surfaces, typestrings = clean_answers(list(surfaces), list(typestrings))
    try:
        return align_spans(text, surfaces, typestrings)
    except (IndexError, ValueError):
        # reference swallows per-row failures (`run.py:43-44`); we map
        # them to all-O so the row is visible downstream, not dropped
        return ["O"] * len(tokens)


@F.pandas_udf(T.ArrayType(T.StringType()))
def _predict_tags_udf(text: pd.Series, raw: pd.Series) -> pd.Series:
    return pd.Series([predict_tags(t, r) for t, r in zip(text, raw)])


_MENTION_ARR = T.ArrayType(T.StructType([
    T.StructField("begin", T.IntegerType()),
    T.StructField("end", T.IntegerType()),
    T.StructField("surface", T.StringType()),
    T.StructField("type", T.StringType()),
]))


@F.pandas_udf(_MENTION_ARR)
def _mentions_udf(text: pd.Series, tags: pd.Series) -> pd.Series:
    return pd.Series([
        tags_to_mentions(t.lower().split(" "), list(tg))
        for t, tg in zip(text, tags)
    ])


def parse_and_align(inferred: DataFrame) -> DataFrame:
    """schema.INFERRED → schema.ALIGNED (adds ``pred`` tag array)."""
    return inferred.select(
        "url", "sent_id", "text",
        _predict_tags_udf(F.col("text"), F.col("raw_output")).alias("pred"),
        "raw_output",
    )


def explode_mentions(aligned: DataFrame, keep_raw: bool = False) -> DataFrame:
    """schema.ALIGNED → mention table (schema.MENTIONS).

    ``mention_id`` is the ordinal by begin offset within the sentence —
    deterministic, reproduces the reference's answer-order semantics
    for downstream first-wins dedup (E4).
    """
    m = aligned.select(
        "url", "sent_id",
        F.posexplode(
            _mentions_udf(F.col("text"), F.col("pred"))
        ).alias("mention_id", "m"),
        *(["raw_output"] if keep_raw else []),
    )
    return m.select(
        "url", "sent_id", "mention_id",
        F.col("m.surface").alias("surface"),
        F.col("m.begin").alias("begin"),
        F.col("m.end").alias("end"),
        F.col("m.type").alias("type"),
        (F.col("raw_output") if keep_raw else F.lit(None).cast("string")
         ).alias("raw_output"),
    )


def split_phrases(mentions: DataFrame) -> DataFrame:
    """P3 (`algorithms.py:158-175`): explode multi-word mention
    surfaces into single-word mentions (off in every reference eval,
    `run.py:76,94,112,130,154,177`). begin/end recompute per word;
    mention_id renumbers by (begin, word ordinal) to stay
    deterministic."""
    words = F.posexplode(F.split(F.col("surface"), " "))
    exploded = mentions.select(
        "url", "sent_id", "begin", "type", "raw_output",
        words.alias("w_idx", "word"),
    ).where(F.length("word") > 0)
    out = exploded.select(
        "url", "sent_id",
        (F.col("begin") + F.col("w_idx")).alias("begin"),
        F.col("word").alias("surface"),
        "type", "raw_output",
    ).withColumn("end", F.col("begin") + 1)
    w = Window.partitionBy("url", "sent_id").orderBy("begin")
    return out.withColumn(
        "mention_id", (F.row_number().over(w) - 1).cast("int")
    ).select("url", "sent_id", "mention_id", "surface",
             "begin", "end", "type", "raw_output")
