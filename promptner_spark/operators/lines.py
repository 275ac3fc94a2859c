"""Cross-document line deduplication — strip lines that repeat across
many documents (cookie banners, nav bars, copyright footers): the
CCNet / RefinedWeb boilerplate-removal pass that runs between HTML
extraction and quality filtering in a web-scale training pipeline.

Reference scope: the reference (a pandas NER harness) has no
line-level surface — this belongs to the LLM-training-data operator
family this build adds on top of the ported surface (SURVEY.md
§2.10), exercised as `q_line_dedup` with a full DuckDB value-exact
oracle.

Semantics: a document's text splits on ``\\n``; each line's MATCH KEY
is ``portable_lower(trim(line))``; a line is dropped when its key is
non-empty and occurs in at least ``min_docs`` DISTINCT documents
(within-document repeats count once). Whitespace-only lines are
structure, not boilerplate — always kept, never counted. Surviving
raw lines are re-joined with ``\\n`` in their original order, so a
document that loses nothing round-trips byte-identically.

Scale shape (the 100 TB lens) — two narrow exchanges, text moves once:

1. The frequency dictionary aggregates (line_h) LONGS with map-side
   combine (per-doc distinctness happens IN-ROW via array_distinct
   before the explode, so a doc repeating its own footer 100 times
   sends one long). Output is only keys above ``min_docs`` — the
   true-boilerplate dictionary, tiny relative to the corpus.
2. That dictionary BROADCASTS (default) into a map-side left join
   against the posexploded lines — the corpus does not move for the
   membership test. ``broadcast_freq=False`` falls back to a shuffle
   equi-join on the 60-bit key for pathological dictionaries.
3. Reassembly is ONE groupBy(doc) over the surviving lines — the only
   exchange that carries text, and each byte crosses it once. Every
   doc keeps at least one exploded row (split yields >= 1 element),
   so no join-back against the corpus is needed to preserve rows.

The DuckDB oracle replays the semantics with a COMPLETELY DIFFERENT
plan — an un-exploded list_filter against a scalar-subquery list — so
the hash gate proves the explode/join/reassemble decomposition exact.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.hashing import portable_hash
from ..functions.textstats import portable_lower

#: Hash seed namespacing line keys away from dedup/decontamination.
LINE_SEED = 11


def _line_key(line: Column) -> Column:
    return portable_lower(F.trim(line))


# memoized expression builders — immutable Column trees whose py4j
# construction (~200 ms for this module's census + reassembly set)
# was otherwise paid per plan rebuild (functions/textstats memo note)
@lru_cache(maxsize=None)
def _census_keys(text_col: str) -> Column:
    # ONE whole-text portable_lower, then split+trim per line — not
    # lower-per-line: higher-order lambdas are interpreted, so the
    # 3-op case-fold ran per line (r6). Equivalent by construction:
    # no lowercase mapping produces or consumes '\n' or ' ' (İ/Σ are
    # pre-folded to single chars), so split positions and the
    # trimmed-space boundaries are unchanged, and
    # trim(lower(x)) == lower(trim(x)) per line.
    return F.array_distinct(F.filter(
        F.transform(F.split(portable_lower(F.col(text_col)), "\n"),
                    lambda ln: F.trim(ln)),
        lambda k: k != ""))


@lru_cache(maxsize=None)
def _reassembly_cols(text_col: str) -> tuple:
    ordered = F.array_sort(
        F.collect_list(F.struct("pos", "line", "drop")))
    return (
        F.concat_ws("\n", F.transform(
            F.filter(ordered, lambda x: ~x["drop"]),
            lambda x: x["line"])).alias(text_col),
        F.sum(F.when(~F.col("drop"), 1).otherwise(0))
        .cast("long").alias("n_kept"),
        F.sum(F.when(F.col("drop"), 1).otherwise(0))
        .cast("long").alias("n_dropped"),
    )


def line_counts(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(line_h, n_docs): distinct-document frequency of every
    non-blank normalized line — the boilerplate census."""
    return (
        docs.select(F.explode(_census_keys(text_col)).alias("k"))
        .select(portable_hash(F.col("k"), LINE_SEED).alias("line_h"))
        .groupBy("line_h")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


def strip_common_lines(docs: DataFrame, min_docs: int = 2,
                       text_col: str = "text", id_col: str = "doc_id",
                       broadcast_freq: bool = True,
                       carry_cols: tuple[str, ...] = ()) -> DataFrame:
    """(id_col, *carry_cols, text_col, n_kept, n_dropped): documents
    with boilerplate lines (appearing in >= ``min_docs`` distinct
    docs) removed — column names preserved so stages chain.
    ``carry_cols`` threads doc-constant columns (e.g. lang) through
    the reassembly groupBy at zero extra exchange cost."""
    freq = (line_counts(docs, text_col, id_col)
            .where(F.col("n_docs") >= min_docs)
            .select("line_h"))
    if broadcast_freq:
        freq = F.broadcast(freq)

    carry = list(carry_cols)
    lines = docs.select(
        F.col(id_col), *[F.col(c) for c in carry],
        F.posexplode(F.split(F.col(text_col), "\n"))
        .alias("pos", "line"))
    keyed = lines.withColumn("_k", _line_key(F.col("line"))).withColumn(
        "_h", portable_hash(F.col("_k"), LINE_SEED))
    flagged = (
        keyed.join(freq, keyed["_h"] == freq["line_h"], "left")
        .select(id_col, *carry, "pos", "line",
                ((F.col("_k") != "") &
                 F.col("line_h").isNotNull()).alias("drop"))
    )
    return (
        flagged.groupBy(id_col, *carry)
        .agg(*_reassembly_cols(text_col))
    )


__all__ = ["LINE_SEED", "line_counts", "strip_common_lines"]
