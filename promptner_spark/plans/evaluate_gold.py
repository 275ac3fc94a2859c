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


ABLATE_BEST_CELLS: list[tuple[bool, bool, bool, bool]] = [
    # (defn, exemplar, coT, tf) — reference `run.py:297-299`:
    # best config and its four single-axis knockouts
    (True, True, True, True), (False, True, True, True),
    (True, False, True, True), (True, True, False, True),
    (True, True, True, False),
]


def ablation_cells(vary_defn: bool = True, vary_exemplar: bool = True,
                   vary_cot: bool = True, vary_tf: bool = True,
                   ) -> list[tuple[bool, bool, bool, bool]]:
    """The (defn, exemplar, coT, tf) grid in the reference's loop
    order (`run.py:266-281` ``ablate_all``)."""
    return [
        (d, e, c, t)
        for d in ([True, False] if vary_defn else [True])
        for e in ([True, False] if vary_exemplar else [True])
        for c in ([True, False] if vary_cot else [True])
        for t in ([True, False] if vary_tf else [True])
    ]


def ablate(
    gold: DataFrame,
    defn_text: str | None = None,
    families=None,
    backend_factory: Callable[[], Backend] | None = None,
    cells: list[tuple[bool, bool, bool, bool]] | None = None,
    n_runs: int = 1,
    limit: int | None = None,
    seed: int = 0,
):
    """Prompt-ablation study (reference ``ablate_all``/``ablate_best``,
    `run.py:266-313`): evaluate every (defn, exemplar, coT, tf) cell
    of the set_config matrix on the same gold table and tabulate
    micro/macro F1 mean±std over ``n_runs`` seeded repeats.

    Driver-side loop over 16 (or ``cells``) independent Spark jobs —
    each cell is one evaluate_gold DAG; at scale cells are trivially
    schedulable side by side. Returns a pandas DataFrame with columns
    (defn, exemplar, cot, tf, micro_f1_mean, micro_f1_std,
    macro_f1_mean, macro_f1_std, n_runs)."""
    import numpy as np
    import pandas as pd

    from ..functions.prompts import DEFAULT_DEFN, set_config

    defn_text = defn_text if defn_text is not None else DEFAULT_DEFN
    cells = cells if cells is not None else ablation_cells()
    rows = []
    for d, e, c, t in cells:
        spec = set_config(defn_text, families=families,
                          exemplar=e, coT=c, tf=t, defn=d)
        micros, macros = [], []
        for run in range(n_runs):
            res = evaluate_gold(gold, spec=spec,
                                backend_factory=backend_factory,
                                limit=limit, seed=seed + run)
            micros.append(res.micro.collect()[0]["f1"])
            per_type = res.per_type.collect()
            macros.append(
                sum(r["f1"] for r in per_type) / max(len(per_type), 1))
        mi, ma = np.array(micros), np.array(macros)
        rows.append((d, e, c, t, float(mi.mean()), float(mi.std()),
                     float(ma.mean()), float(ma.std()), n_runs))
    return pd.DataFrame(rows, columns=[
        "defn", "exemplar", "cot", "tf", "micro_f1_mean", "micro_f1_std",
        "macro_f1_mean", "macro_f1_std", "n_runs"])


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
