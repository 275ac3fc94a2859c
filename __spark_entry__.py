"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship KG-construction pipeline (pages → text
  extraction → batched CoT inference → parse/align → mentions →
  linking → canonicalization → triples) at sf0.001, returning the
  aggregated triple table.
- ``queries()``: one entry per implemented operator family from
  SURVEY.md §2 (see promptner_spark/plans/queries.py for the paired
  DuckDB closed forms and the cross-engine determinism rules;
  COVERAGE.md maps every inventory row to query + test).
- ``oracle_sql()``: DuckDB-runnable ANSI SQL per query — ALL 52
  queries are value-exact (rows + schema + value hash). The last two
  holdouts closed in round 4: q_knn_ivf via an md5-seeded quantizer
  replayed as an unrolled Lloyd CTE, q_pipeline_triples via a closed
  form of the full chunk→align→link→canonicalize→count chain (the
  reference's -1 alignment quirk collapses to a last-multiword-writer
  rule; the fuzzy LSH runs the md5 band family the oracle replays —
  tests/test_pipeline_oracle.py pins the quirk semantics on a crafted
  corpus the sf data never exercises). Round 5 adds q_langid (char-
  trigram language ID, integer in-row scoring), q_curate (the
  end-to-end curation funnel: quality+language gate → exact-dedup
  keeper → MinHash near-dup drop → per-language retention stats,
  composed from the individually-oracled primitives), and hardens the
  cross-engine determinism of q_knn_ivf (fixed-point centroid means)
  and q_pagerank (integer-space final rounding) per the r4 ADVICE.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from promptner_spark.plans.queries import ORACLE_SQL, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from promptner_spark.plans.pipeline import build_pipeline
    res = build_pipeline(spark, "/root/testdata/sf0.001")
    return res.triple_counts


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
