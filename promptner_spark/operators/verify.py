"""Second-pass type verification + dispute resolution (operator SP3,
prompts C7/C8 — SURVEY.md §2.6).

The reference's ``MultiAlgorithm.parse_span`` issues one extra LLM
query per mention asking for its type, and a third "dispute" query
when the two opinions differ (`algorithms.py:290-369`). Spark-first:

    mention table → C7 prompt column → batched inference (same
    mapInPandas backend) → regexp type extraction (A4) → verdict
    joined back on (url, sent_id, mention_id) (join J4) → 3-way
    F.when resolves agreement / dispute.

The expensive part stays batched Arrow inference; the join-back is a
plain equi-join AQE can plan (mention table is uniformly keyed).
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..functions.prompts import type_verify_prompt
from .model import Backend, default_backend_factory

_VERDICT = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("sent_id", T.IntegerType()),
    T.StructField("mention_id", T.IntegerType()),
    T.StructField("verify_raw", T.StringType()),
])


def verify_types(
    mentions: DataFrame,
    sentences: DataFrame,
    backend_factory: Callable[[], Backend] | None = None,
) -> DataFrame:
    """mentions + sentences(url, sent_id, text) → mentions with
    ``type_verified`` and ``type_final`` columns."""
    backend_factory = backend_factory or default_backend_factory

    withp = (
        mentions.join(sentences.select("url", "sent_id", "text"),
                      ["url", "sent_id"])
        .select("url", "sent_id", "mention_id",
                type_verify_prompt(F.col("text"), F.col("surface"))
                .alias("prompt"))
    )

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backend = backend_factory()
        for pdf in batches:
            raw = backend.generate(pdf["prompt"].tolist())
            yield pd.DataFrame({
                "url": pdf["url"].values,
                "sent_id": pdf["sent_id"].values,
                "mention_id": pdf["mention_id"].values,
                "verify_raw": raw,
            })

    verdicts = withp.mapInPandas(infer, schema=_VERDICT).withColumn(
        # A4: type = substring between parens (`algorithms.py:380-385`)
        "type_verified",
        F.regexp_extract(F.col("verify_raw"), r"\(([^)]*)\)", 1),
    ).drop("verify_raw")

    out = mentions.join(verdicts, ["url", "sent_id", "mention_id"], "left")
    # dispute resolution (C8 reduced): agreement keeps the type; a
    # non-empty disagreeing verdict wins (the reference's third query
    # breaks ties — our deterministic backend IS the tiebreak source)
    return out.withColumn(
        "type_final",
        F.when(F.col("type_verified").isNull() | (F.col("type_verified") == ""),
               F.col("type"))
        .otherwise(F.col("type_verified")),
    )
