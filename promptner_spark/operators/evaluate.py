"""Span-F1 evaluation (operators E2/E5/E6, join J5 — SURVEY.md §2.7).

The reference computes seqeval F1 in a sequential per-sentence loop
(`run.py:36-52`). Spark-first this is a join + aggregation:

    pred spans ⋈ gold spans on (doc, begin, end, type)
      inner        → TP
      left_anti    → FP (pred side) / FN (gold side)
    groupBy(type)  → per-type P/R/F1;  global micro/macro by sum.

Exactly-matching span semantics == seqeval default (strict IOB2 span
equality). One shuffle on the span key; gold is tiny → broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SPAN_KEY = ["doc_id", "sent_id", "begin", "end", "type"]


def span_prf(pred_spans: DataFrame, gold_spans: DataFrame,
             by_type: bool = True) -> DataFrame:
    """pred/gold span tables (doc_id, sent_id, begin, end, type) →
    per-type (or global) precision/recall/f1 + counts."""
    p = pred_spans.select(*SPAN_KEY)
    g = gold_spans.select(*SPAN_KEY)
    tp = p.join(F.broadcast(g), SPAN_KEY, "left_semi") \
        .groupBy("type").agg(F.count(F.lit(1)).alias("tp"))
    fp = p.join(F.broadcast(g), SPAN_KEY, "left_anti") \
        .groupBy("type").agg(F.count(F.lit(1)).alias("fp"))
    fn = g.join(F.broadcast(p), SPAN_KEY, "left_anti") \
        .groupBy("type").agg(F.count(F.lit(1)).alias("fn"))
    m = tp.join(fp, "type", "full").join(fn, "type", "full").select(
        "type",
        F.coalesce("tp", F.lit(0)).alias("tp"),
        F.coalesce("fp", F.lit(0)).alias("fp"),
        F.coalesce("fn", F.lit(0)).alias("fn"),
    )
    prec = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    rec = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
    f1 = F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(F.lit(0.0))
    m = m.select("type", "tp", "fp", "fn", prec.alias("precision"),
                 rec.alias("recall"), f1.alias("f1"))
    if by_type:
        return m
    return m.agg(
        F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn"),
    ).select(
        F.lit("ALL").alias("type"), "tp", "fp", "fn",
        prec.alias("precision"), rec.alias("recall"), f1.alias("f1"),
    )


def triple_prf(pred: DataFrame, gold: DataFrame) -> dict:
    """Set precision/recall of (subj, pred, obj, url, sent_id) triples
    vs a reference emission — the north_rule's P/R ≥ 0.95 gate.
    Driver-side scalars (small aggregate)."""
    key = ["subj", "pred", "obj", "url", "sent_id"]
    p = pred.select(*key).distinct()
    g = gold.select(*key).distinct()
    n_p, n_g = p.count(), g.count()
    n_tp = p.join(g, key, "left_semi").count()
    precision = n_tp / n_p if n_p else 1.0
    recall = n_tp / n_g if n_g else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"tp": n_tp, "n_pred": n_p, "n_gold": n_g,
            "precision": precision, "recall": recall, "f1": f1}
