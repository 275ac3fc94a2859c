"""Custom stateful streaming operators via ``applyInPandasWithState``.

Structured Streaming's built-in stateful operators (windowed aggs,
``dropDuplicatesWithinWatermark``) cover fixed shapes; the KG pipeline
needs two custom ones, both implemented with the Arrow-batched
per-group state API (`applyInPandasWithState`) — the sanctioned
pattern for custom stateful logic (task brief; no RDD
``updateStateByKey``, no foreachBatch side-state):

- :func:`stream_dedup_first_seen` — streaming exact dedup: the FIRST
  document per content digest passes, later copies are dropped for as
  long as the digest's state lives. State is one small tuple per
  digest with a processing-time TTL, so the store is bounded by
  (unique digests seen within TTL), not by stream length — the same
  memory discipline as a watermarked window.

- :func:`stream_entity_cards` — incremental entity "cards" (the
  streaming complement of the batch nodes table): per canonical
  surface, a running (n_mentions, n_docs_approx, first_seen,
  last_seen) record, emitted once per trigger for every surface that
  changed. Update-mode analytics over the mention stream without
  re-scanning history.

Scale notes: state is hash-partitioned by key across executors (the
shuffle the groupBy implies is the operator's only exchange); each
group's state is O(1) bytes; Arrow moves rows in batches. At 10^12
docs the dedup state is bounded by TTL × ingest rate, and entity-card
state by the surface vocabulary — both the standard sizing stories
for production streaming dedup/rollup.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT = T.StructType([
    T.StructField("content_md5", T.StringType()),
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("text", T.StringType()),
])
# (n_seen, first_url) — enough to dedup and to explain what was kept
_DEDUP_STATE = T.StructType([
    T.StructField("n_seen", T.LongType()),
    T.StructField("first_url", T.StringType()),
])


def stream_dedup_first_seen(
    pages: DataFrame,
    ttl_minutes: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Streaming exact dedup: emit each content digest's FIRST page,
    swallow duplicates while the digest's state is alive.

    ``ttl_minutes`` bounds the state store for CONTINUOUS runs: a
    digest idle that long is evicted (ProcessingTimeTimeout), after
    which a re-crawled copy would re-emit — the deliberate trade every
    bounded-state streaming dedup makes (same contract as
    ``dropDuplicatesWithinWatermark``). Leave it ``None`` for
    drain-and-stop (``availableNow``) usage: with processing-time
    timeouts registered, the engine keeps scheduling empty
    micro-batches until the timeouts fire, so an availableNow query
    would spin for the full TTL instead of terminating (observed:
    50+ empty batches).
    Batch-mode parity primitive: ``operators/dedup.py::dedup_exact``.
    """
    keyed = pages.select(
        F.md5(F.col(text_col)).alias("content_md5"),
        "url", "warc_ts", F.col(text_col).alias("text"))

    ttl_ms = None if ttl_minutes is None else ttl_minutes * 60 * 1000

    def dedup(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # idle digest: drop the state, emit nothing
            state.remove()
            return
        n_seen, first_url = state.get if state.exists else (0, None)
        was_new = n_seen == 0
        # A key's rows can span SEVERAL Arrow chunks within one
        # micro-batch (> maxRecordsPerBatch rows), and chunk order is
        # not part of the contract — so the deterministic winner
        # (min url) is selected over a running min across ALL chunks,
        # and emitted only after the iterator is drained. Selecting
        # from the first non-empty chunk would tie the output to
        # chunk order and break batch-parity with dedup_exact.
        winner = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            n_seen += len(pdf)
            cand = pdf.sort_values(["url"], kind="mergesort").iloc[:1]
            if (winner is None
                    or str(cand["url"].iloc[0]) < str(winner["url"].iloc[0])):
                winner = cand
        if was_new and winner is not None:
            first_url = str(winner["url"].iloc[0])
        state.update((n_seen, first_url))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if was_new and winner is not None:
            yield winner

    return keyed.groupBy("content_md5").applyInPandasWithState(
        dedup,
        outputStructType=DEDUP_OUT,
        stateStructType=_DEDUP_STATE,
        outputMode="append",
        timeoutConf=(GroupStateTimeout.NoTimeout if ttl_ms is None
                     else GroupStateTimeout.ProcessingTimeTimeout),
    )


CARDS_OUT = T.StructType([
    T.StructField("surface", T.StringType()),
    T.StructField("n_mentions", T.LongType()),
    T.StructField("n_batches", T.LongType()),
    T.StructField("first_seen", T.TimestampType()),
    T.StructField("last_seen", T.TimestampType()),
])
_CARD_STATE = T.StructType([
    T.StructField("n_mentions", T.LongType()),
    T.StructField("n_batches", T.LongType()),
    T.StructField("first_seen", T.TimestampType()),
    T.StructField("last_seen", T.TimestampType()),
])


def stream_entity_cards(mentions_with_ts: DataFrame) -> DataFrame:
    """Incremental per-surface entity cards over the mention stream
    (input: ``stream_mentions`` output — carries ``warc_ts``).

    Emits one updated card per surface per trigger in which the
    surface appeared — the streaming complement of the batch
    ``triples_op.nodes_table`` rollup, without re-aggregating history.
    State: one fixed-width tuple per surface (vocabulary-bounded)."""

    keyed = mentions_with_ts.select("surface", "warc_ts")

    def roll(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - NoTimeout configured
            state.remove()
            return
        if state.exists:
            n, b, first, last = state.get
        else:
            n, b, first, last = 0, 0, None, None
        added = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            added += len(pdf)
            lo = pdf["warc_ts"].min()
            hi = pdf["warc_ts"].max()
            first = lo if first is None else min(first, lo)
            last = hi if last is None else max(last, hi)
        if not added:
            return
        n, b = n + added, b + 1
        state.update((n, b, first, last))
        yield pd.DataFrame({
            "surface": [key[0]], "n_mentions": [n], "n_batches": [b],
            "first_seen": [first], "last_seen": [last]})

    return keyed.groupBy("surface").applyInPandasWithState(
        roll,
        outputStructType=CARDS_OUT,
        stateStructType=_CARD_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
