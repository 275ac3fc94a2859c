"""Tagged-dataset decoders (operators S2-S5, SURVEY.md §2.1).

The reference loads four HuggingFace NER datasets and decodes their
integer tag ids into the sentence table via per-dataset tag maps with
a B/I run-merge loop (`data.py:108-159` tweetner, `data.py:162-222`
fabner, `data.py:225-262` conll2003, `data.py:265-309` ontonotes).
Spark-first split:

- ``exact_types`` (id → IOB2 string) is a pure JVM expression —
  ``transform(ner_tags, i -> element_at(tag_array, i+1))`` — no Python;
- the entity run-merge (stateful scan over the tag sequence) is a
  scalar pandas UDF whose body mirrors the reference loop EXACTLY,
  including its quirk that an ``I-`` token extends the current entity
  regardless of type agreement (`data.py:256-259` appends without
  checking the type) — unlike oracle/spans.py::tags_to_mentions, which
  closes on type change. Both behaviors exist because both are needed:
  gold-compat I/O replays the reference, the mention table uses the
  stricter merge.

HF ``datasets`` is not installed in this container; the ``load_*``
wrappers are import-gated and the decoder itself is fully testable on
synthetic (tokens, ner_tags) rows.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

# Tag id → IOB2 label, per dataset (public label inventories; the int
# order matches the HF dataset feature definitions cited above).
TAG_MAPS: dict[str, list[str]] = {
    # data.py:230 (conll_fulltagmap)
    "conll2003": ["O", "B-PER", "I-PER", "B-ORG", "I-ORG",
                  "B-LOC", "I-LOC", "B-MISC", "I-MISC"],
    # data.py:110-126 — ids 0-6 are B-*, 7-13 I-*, 14 O
    "tweetner7": ["B-corporation", "B-creative_work", "B-event", "B-group",
                  "B-location", "B-person", "B-product",
                  "I-corporation", "I-creative_work", "I-event", "I-group",
                  "I-location", "I-person", "I-product", "O"],
    # data.py:162-189 — odd ids B, even ids I
    "fabner": ["O",
               "B-MATE", "I-MATE", "B-MANP", "I-MANP", "B-MACEQ", "I-MACEQ",
               "B-APPL", "I-APPL", "B-FEAT", "I-FEAT", "B-PRO", "I-PRO",
               "B-CHAR", "I-CHAR", "B-PARA", "I-PARA", "B-ENAT", "I-ENAT",
               "B-CONPRI", "I-CONPRI", "B-MANS", "I-MANS",
               "B-BIOP", "I-BIOP"],
    # data.py:268 (onto_tags)
    "ontonotes5": ["O", "B-PERSON", "I-PERSON", "B-NORP", "I-NORP",
                   "B-FAC", "I-FAC", "B-ORG", "I-ORG", "B-GPE", "I-GPE",
                   "B-LOC", "I-LOC", "B-PRODUCT", "I-PRODUCT",
                   "B-DATE", "I-DATE", "B-TIME", "I-TIME",
                   "B-PERCENT", "I-PERCENT", "B-MONEY", "I-MONEY",
                   "B-QUANTITY", "I-QUANTITY", "B-ORDINAL", "I-ORDINAL",
                   "B-CARDINAL", "I-CARDINAL", "B-EVENT", "I-EVENT",
                   "B-WORK_OF_ART", "I-WORK_OF_ART", "B-LAW", "I-LAW",
                   "B-LANGUAGE", "I-LANGUAGE"],
}

# Reference quirk: the types-dict VALUE is the raw B-label for
# tweetner/fabner/ontonotes (`curr_type = <dataset>_tag_map[tag]`,
# e.g. "B-corporation" at data.py:152, "B-MATE" at data.py:214,
# "B-PERSON" at data.py:296) but the lowercased short name for conll
# (`conll_tag_map`, data.py:229: per/org/loc/misc). Keyed on the full
# B-label so the default path passes it through verbatim.
_ENTITY_TYPE_OVERRIDE = {
    "conll2003": {"B-PER": "per", "B-ORG": "org",
                  "B-LOC": "loc", "B-MISC": "misc"},
}

_MERGE_SCHEMA = T.StructType([
    T.StructField("entities", T.ArrayType(T.StringType()), False),
    T.StructField("types", T.MapType(T.StringType(), T.StringType()), False),
])


def _merge_runs(tokens: list[str], labels: list[str],
                type_override: dict[str, str]) -> tuple[list, dict]:
    """Reference run-merge (`data.py:240-259` and clones): O closes,
    B-* closes + opens, I-* always extends the open entity (no type
    check), trailing open entity is DROPPED (reference never flushes
    after the loop — a quirk kept for parity)."""
    entities: list[str] = []
    types: dict[str, str] = {}
    cur: str | None = None
    cur_type: str | None = None
    for tok, lab in zip(tokens, labels):
        if lab == "O":
            if cur_type is not None:
                entities.append(cur)
                types[cur] = cur_type
            cur, cur_type = None, None
        elif lab.startswith("B-"):
            if cur_type is not None:
                entities.append(cur)
                types[cur] = cur_type
            cur_type = type_override.get(lab, lab)
            cur = tok
        else:  # I-*: extend unconditionally (reference data.py:256-259)
            if cur is None:
                # reference asserts here; we keep the row visible
                cur_type = type_override.get("B-" + lab[2:], lab)
                cur = tok
            else:
                cur = cur + " " + tok
    return entities, types


def decode_tagged(df: DataFrame, dataset: str,
                  tokens_col: str = "tokens",
                  tags_col: str = "ner_tags") -> DataFrame:
    """(tokens ARRAY<STRING>, ner_tags ARRAY<INT>) → sentence table
    ``(text, entities, types, exact_types, true_tokens)``
    (schema §1.3). One narrow pass: tag decode is JVM-side, run-merge
    is one Arrow-batched scalar UDF."""
    labels = TAG_MAPS[dataset]
    override = _ENTITY_TYPE_OVERRIDE.get(dataset, {})
    label_arr = F.array(*[F.lit(x) for x in labels])
    exact = F.transform(F.col(tags_col),
                        lambda i: F.element_at(label_arr, i + 1))

    @F.pandas_udf(_MERGE_SCHEMA)
    def merge_udf(tokens: pd.Series, labs: pd.Series) -> pd.DataFrame:
        ents, typs = [], []
        for tk, lb in zip(tokens, labs):
            e, t = _merge_runs(list(tk), list(lb), override)
            ents.append(e)
            typs.append(t)
        return pd.DataFrame({"entities": ents, "types": typs})

    out = df.select(
        F.concat_ws(" ", F.col(tokens_col)).alias("text"),
        merge_udf(F.col(tokens_col), exact).alias("_m"),
        exact.alias("exact_types"),
        F.col(tokens_col).alias("true_tokens"),
    )
    return out.select(
        "text",
        F.col("_m.entities").alias("entities"),
        F.col("_m.types").alias("types"),
        "exact_types", "true_tokens",
    )


def _load_hf(name: str, *args, **kwargs):
    try:
        from datasets import load_dataset  # noqa: F401
    except ImportError as exc:  # pragma: no cover — no HF in sandbox
        raise ImportError(
            f"loading {name} needs the 'datasets' package; in this "
            "container use decode_tagged on pre-materialized "
            "(tokens, ner_tags) parquet instead") from exc
    return load_dataset(name, *args, **kwargs)


def load_conll2003(spark, split: str = "validation") -> DataFrame:
    """S2 (`data.py:225-262`)."""
    dset = _load_hf("conll2003")[split]
    pdf = pd.DataFrame({"tokens": dset["tokens"], "ner_tags": dset["ner_tags"]})
    return decode_tagged(spark.createDataFrame(pdf), "conll2003")


def load_tweetner(spark, split: str = "validation") -> DataFrame:
    """S3 (`data.py:108-159`); keeps true_tokens."""
    dset = _load_hf("tner/tweetner7")[split + "_2021"]
    pdf = pd.DataFrame({"tokens": dset["tokens"], "ner_tags": dset["tags"]})
    return decode_tagged(pdf_df(spark, pdf), "tweetner7")


def load_fabner(spark, split: str = "validation") -> DataFrame:
    """S4 (`data.py:162-222`)."""
    dset = _load_hf("DFKI-SLT/fabner")[split]
    pdf = pd.DataFrame({"tokens": dset["tokens"], "ner_tags": dset["ner_tags"]})
    return decode_tagged(spark.createDataFrame(pdf), "fabner")


def load_ontonotes(spark, split: str = "validation") -> DataFrame:
    """S5 (`data.py:265-309`); flattens the nested sentences array."""
    dset = _load_hf("conll2012_ontonotesv5", "english_v4")[split]
    rows = [(s["words"], s["named_entities"])
            for ex in dset for s in ex["sentences"]]
    pdf = pd.DataFrame(rows, columns=["tokens", "ner_tags"])
    return decode_tagged(spark.createDataFrame(pdf), "ontonotes5")


def pdf_df(spark, pdf: pd.DataFrame) -> DataFrame:
    return spark.createDataFrame(pdf)
