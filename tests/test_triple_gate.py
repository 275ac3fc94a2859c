"""The BASELINE.json headline gate: pipeline triple emission P/R ≥ 0.95
vs an INDEPENDENT reference emission.

The gold emitter here is a driver-side pure-pandas implementation that
shares only the per-row oracle functions (prompt→parse→align chain —
byte-identical by construction, proven by the golden replay tests) but
none of the Spark dataflow: linking uses exhaustive true-Jaccard
search (no LSH, no banding), so the comparison genuinely measures what
the pipeline's MinHash-LSH approximation and join topology lose.
"""

from __future__ import annotations

import re

import pandas as pd
import pytest

SENT_TOKENS = 25
MIN_PR = 0.95


def _norm(s: str) -> str:
    return re.sub(r"^[!-/:-@\[-`{-~\s]+|[!-/:-@\[-`{-~\s]+$", "", s.lower().strip())


def _shingles(s: str, k: int = 3) -> set:
    return {s[i:i + k] for i in range(max(len(s) - k + 1, 1))} if s else {s}


def _gold_triples(sf_dir: str) -> set:
    from promptner_spark.functions.prompts import PromptSpec
    from promptner_spark.operators.gazetteer import ALIAS_ROWS
    from promptner_spark.operators.model import GazetteerBackend
    from promptner_spark.operators.parse import predict_tags
    from promptner_spark.oracle.spans import tags_to_mentions

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    backend = GazetteerBackend()
    spec = PromptSpec()
    prefix, suffix = spec.prefix(), PromptSpec.SUFFIX
    aliases = [(a, cn) for a, _eid, cn, _p in ALIAS_ROWS]

    def link(surface: str) -> str:
        n = _norm(surface)
        for a, cn in aliases:          # exact
            if n == a:
                return cn
        best, best_j = None, 0.0       # exhaustive fuzzy (no LSH)
        sn = _shingles(n)
        for a, cn in aliases:
            sa = _shingles(a)
            inter = len(sn & sa)
            union = len(sn) + len(sa) - inter
            j = 1.0 if union == 0 else inter / union
            if j >= 0.5 and j > best_j:
                best, best_j = cn, j
        return best if best is not None else n   # NIL → normalized surface

    triples = set()
    for _, row in docs.iterrows():
        url = f"https://ex.com/{row.doc_id}"
        toks = row.text.split(" ")
        for sent_id in range(0, (len(toks) + SENT_TOKENS - 1) // SENT_TOKENS):
            chunk = " ".join(toks[sent_id * SENT_TOKENS:(sent_id + 1) * SENT_TOKENS])
            if not chunk:
                continue
            raw = backend.generate([prefix + chunk + suffix])[0]
            tags = predict_tags(chunk, raw)
            names = {link(m["surface"])
                     for m in tags_to_mentions(chunk.lower().split(" "), tags)}
            for a in names:
                for b in names:
                    if a < b:
                        triples.add((a, "cooccurs_with", b, url, sent_id))
    return triples


def test_triple_pr_gate(spark, sf_dir):
    from promptner_spark.plans.pipeline import build_pipeline

    res = build_pipeline(spark, sf_dir)
    got = {(r["subj"], r["pred"], r["obj"], r["url"], r["sent_id"])
           for r in res.triples.collect()}
    res.unpersist()
    gold = _gold_triples(sf_dir)
    assert gold, "gold emission is empty — slice too small"

    tp = len(got & gold)
    precision = tp / len(got) if got else 1.0
    recall = tp / len(gold) if gold else 1.0
    print(f"\ntriples: pred={len(got)} gold={len(gold)} tp={tp} "
          f"P={precision:.4f} R={recall:.4f}")
    assert precision >= MIN_PR, f"precision {precision:.4f} < {MIN_PR}"
    assert recall >= MIN_PR, f"recall {recall:.4f} < {MIN_PR}"
