"""Gold-corpus evaluation harness (reference `run.py:11-70`
``eval_dataset``/``complete_eval`` parity, SURVEY.md §3.2).

The reference loops sentences sequentially: per row prompt → LLM →
parse → align → seqeval F1, accumulating running micro/macro F1. Here
the whole evaluation is one job DAG:

    gold sentence table
      → (optional seeded sample/limit — `run.py:62`)
      → fused extraction (prompt → backend → parse → align → mentions)
      → pred spans  ⋈  gold spans (J5)
      → per-sentence F1 column (E2 keeps it, `run.py:36-37`)
      → per-type + micro P/R/F1 aggregates

``n_runs`` repeats with shifted seeds (`complete_eval`, `run.py:57-70`)
— with the deterministic backend repeats are identical; with a real
LLM they measure variance, exactly like the reference.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.prompts import PromptSpec
from ..operators.evaluate import span_prf
from ..operators.infer import extract_mentions
from ..operators.model import Backend
from ..operators.parse import _mentions_udf

SPAN_KEY = ["doc_id", "sent_id", "begin", "end", "type"]


@dataclass
class GoldEvalResult:
    pred_spans: DataFrame
    gold_spans: DataFrame
    sentence_f1: DataFrame     # (doc_id, sent_id, tp, n_pred, n_gold, f1)
    per_type: DataFrame        # span_prf by type
    micro: DataFrame           # single-row global P/R/F1


def _gold_spans(gold: DataFrame) -> DataFrame:
    """(doc_id, sent_id, text, exact_types) → gold span table, using
    the same strict IOB2 run-merge as the mention path."""
    return gold.select(
        "doc_id", "sent_id",
        F.posexplode(_mentions_udf(F.col("text"), F.col("exact_types")))
        .alias("_i", "m"),
    ).select("doc_id", "sent_id",
             F.col("m.begin").alias("begin"), F.col("m.end").alias("end"),
             F.col("m.type").alias("type"))


def sentence_f1(pred_spans: DataFrame, gold_spans: DataFrame,
                sentences: DataFrame | None = None) -> DataFrame:
    """Per-sentence span F1 (the reference's seqeval-per-row f1 column,
    `run.py:36-37`) as three aggregations + one join.

    ``sentences`` is the (doc_id, sent_id) universe: the reference
    keeps EVERY evaluated sentence in its per-row table (`run.py:36`),
    so a sentence with zero gold AND zero predicted spans must still
    appear (tp = n_pred = n_gold = 0, f1 = 1.0) — otherwise macro
    averages skew. Without it, only sentences seen in at least one
    span table are emitted (pre-round-2 behavior)."""
    key = ["doc_id", "sent_id"]
    p = pred_spans.groupBy(*key).agg(F.count(F.lit(1)).alias("n_pred"))
    g = gold_spans.groupBy(*key).agg(F.count(F.lit(1)).alias("n_gold"))
    tp = pred_spans.join(gold_spans, SPAN_KEY, "left_semi") \
        .groupBy(*key).agg(F.count(F.lit(1)).alias("tp"))
    out = g.join(p, key, "full").join(tp, key, "full")
    if sentences is not None:
        universe = sentences.select(*key).distinct()
        out = universe.join(out, key, "left")
    out = out.na.fill(0, ["tp", "n_pred", "n_gold"])
    denom = F.col("n_pred") + F.col("n_gold")
    return out.withColumn(
        "f1",
        F.when(denom > 0, 2.0 * F.col("tp") / denom).otherwise(F.lit(1.0)))


def evaluate_gold(
    gold: DataFrame,
    spec: PromptSpec | None = None,
    backend_factory: Callable[[], Backend] | None = None,
    limit: int | None = None,
    seed: int = 0,
) -> GoldEvalResult:
    """gold(doc_id, sent_id, text, exact_types) → metrics. ``limit``
    applies a seeded sample like `dataset.sample(limit)` (`run.py:62`)."""
    if limit is not None:
        n = gold.count()
        frac = min(1.0, limit / max(n, 1))
        gold = gold.sample(fraction=frac, seed=seed).limit(limit)
    sentences = gold.select(F.col("doc_id").alias("url"), "sent_id", "text")
    pred = extract_mentions(sentences, spec=spec,
                            backend_factory=backend_factory) \
        .select(F.col("url").alias("doc_id"), "sent_id",
                "begin", "end", "type")
    gold_sp = _gold_spans(gold)
    per_type = span_prf(pred, gold_sp, by_type=True)
    micro = span_prf(pred, gold_sp, by_type=False)
    return GoldEvalResult(pred, gold_sp,
                          sentence_f1(pred, gold_sp, sentences=gold),
                          per_type, micro)


def evaluate_gold_iob2(
    spark: SparkSession,
    path: str,
    **kwargs,
) -> GoldEvalResult:
    """Convenience: IOB2 gold file(s) → metrics (S1 + E2)."""
    from ..sources.iob2_io import read_iob2

    gold = read_iob2(spark, path).select(
        F.col("source_file").alias("doc_id"), "sent_id", "text",
        "exact_types")
    return evaluate_gold(gold, **kwargs)
