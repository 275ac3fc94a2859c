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
