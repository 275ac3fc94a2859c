"""promptner_spark — a PySpark-native knowledge-graph construction engine.

Re-expresses the capabilities of the PromptNER reference pipeline
(definition + few-shot chain-of-thought NER) as an idiomatic Spark
DataFrame pipeline, extended per the north rule into full KG
construction: mention detection → type verification → entity linking →
canonicalization → (subj, pred, obj) triple emission, over a
Common-Crawl-style web-page table.

Layout
------
- ``oracle``    pure-Python, dependency-free reimplementations of the
                reference's deterministic semantics (answer parsing,
                span alignment, IOB2 I/O). Used both as pandas-UDF
                bodies and as pytest oracles.
- ``sources``   scan-side adapters: pages table synthesis, IOB2 reader,
                HF-style tag decoding.
- ``functions`` column-expression builders (pure `pyspark.sql.functions`).
- ``operators`` the operator inventory from SURVEY.md §2: inference,
                parsing, alignment, linking, components, triples, dedup,
                similarity, text stats, span-F1 evaluation.
- ``plans``     end-to-end job DAGs + session tuning + checkpoints.
- ``streaming`` Structured Streaming variants.
"""

__version__ = "0.1.0"

# Lazy convenience exports — resolved on first access so that UDF
# workers importing submodules never pay for the full dependency tree.
_EXPORTS = {
    "build_session": ("promptner_spark.session", "build_session"),
    "build_pipeline": ("promptner_spark.plans.pipeline", "build_pipeline"),
    "run_pipeline": ("promptner_spark.plans.pipeline", "run_pipeline"),
    "get_ner_system": ("promptner_spark.custom", "get_ner_system"),
    "get_tagging_system": ("promptner_spark.custom", "get_tagging_system"),
    "evaluate_gold": ("promptner_spark.plans.evaluate_gold", "evaluate_gold"),
    "evaluate_gold_iob2": ("promptner_spark.plans.evaluate_gold",
                           "evaluate_gold_iob2"),
    "ablate": ("promptner_spark.plans.evaluate_gold", "ablate"),
    "set_config": ("promptner_spark.functions.prompts", "set_config"),
    "PromptSpec": ("promptner_spark.functions.prompts", "PromptSpec"),
    "ExemplarFamilies": ("promptner_spark.functions.prompts",
                         "ExemplarFamilies"),
    "VerifySpec": ("promptner_spark.functions.prompts", "VerifySpec"),
    "OpenAIBackend": ("promptner_spark.operators.model", "OpenAIBackend"),
    "HFBackend": ("promptner_spark.operators.model", "HFBackend"),
    "RetryingBackend": ("promptner_spark.operators.model", "RetryingBackend"),
    "GazetteerBackend": ("promptner_spark.operators.model",
                         "GazetteerBackend"),
    "Quick": ("promptner_spark.quick", "Quick"),
    "pagerank": ("promptner_spark.operators.graph_analytics", "pagerank"),
    "pmi_edges": ("promptner_spark.operators.graph_analytics", "pmi_edges"),
    "predicate_triples": ("promptner_spark.operators.triples",
                          "predicate_triples"),
    "curate_kept": ("promptner_spark.operators.curate", "curate_kept"),
    "decontaminate": ("promptner_spark.operators.decontaminate",
                      "decontaminate"),
    "quota_sample": ("promptner_spark.operators.sample", "quota_sample"),
    "mixture_sample": ("promptner_spark.operators.sample",
                       "mixture_sample"),
    "shard_pack": ("promptner_spark.operators.shard", "shard_pack"),
    "scrub_pii": ("promptner_spark.operators.pii", "scrub_pii"),
    "prepare_training_data": ("promptner_spark.operators.prep",
                              "prepare_training_data"),
    "strip_common_lines": ("promptner_spark.operators.lines",
                           "strip_common_lines"),
    "stream_dedup_first_seen": ("promptner_spark.streaming.stateful",
                                "stream_dedup_first_seen"),
    "stream_entity_cards": ("promptner_spark.streaming.stateful",
                            "stream_entity_cards"),
}


def __getattr__(name: str):
    if name in _EXPORTS:
        import importlib
        module, attr = _EXPORTS[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'promptner_spark' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_EXPORTS))
