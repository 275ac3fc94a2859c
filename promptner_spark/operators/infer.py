"""The inference stage (M1-M4): "join the corpus with a model".

Spark mapping of the reference's sequential per-sentence loop
(`run.py:16-44`): an Arrow-batched ``mapInPandas`` where

- the backend is constructed ONCE per task (iterator UDF — same reason
  the reference builds one OpenAIGPT per run, `run.py:216-228`);
- one Arrow batch (session.ARROW_BATCH_ROWS rows) is one model call —
  the reference's 1-sentence-per-request becomes hundreds per request;
- rows are repartitioned by url-hash first so work is uniform and
  output is independent of input file layout (north_rule: explicit
  repartitioning on url-hash);
- within each partition rows are sorted by (url, sent_id) before
  batching so batch composition — and therefore any batch-sensitive
  real model — is stable across cluster sizes (SURVEY.md §4.2
  "deterministic batching").

At 100 TB this stage is embarrassingly parallel: no shuffle after the
initial repartition, and the Arrow batch size bounds executor memory.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import schema
from ..functions.prompts import PromptSpec, completion_prompt
from .model import Backend, default_backend_factory


def run_inference(
    sentences: DataFrame,
    spec: PromptSpec | None = None,
    backend_factory: Callable[[], Backend] | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """sentences(url, sent_id, text) → + raw_output (schema.INFERRED).

    The prompt is assembled JVM-side (C2, constant-folded prefix); only
    the model call crosses into Python, via Arrow.
    """
    spec = spec or PromptSpec()
    backend_factory = backend_factory or default_backend_factory

    df = sentences.select(
        "url", "sent_id", "text",
        completion_prompt(spec, F.col("text")).alias("prompt"),
    )
    if partitions:
        df = df.repartition(partitions, F.hash(F.col("url")))

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backend = backend_factory()  # once per task
        for pdf in batches:
            pdf = pdf.sort_values(["url", "sent_id"], kind="mergesort")
            raw = backend.generate(pdf["prompt"].tolist())
            yield pd.DataFrame({
                "url": pdf["url"].values,
                "sent_id": pdf["sent_id"].values,
                "text": pdf["text"].values,
                "raw_output": raw,
            })

    return df.mapInPandas(infer, schema=schema.INFERRED)
