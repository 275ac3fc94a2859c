"""Custom stateful streaming operators (applyInPandasWithState).

- first-seen dedup: a duplicate arriving in a LATER trigger is still
  suppressed (state survives across micro-batches), the winner is
  deterministic, and the state store reports bounded rows;
- entity cards: running counts accumulate across triggers in update
  mode (n_batches increments, n_mentions sums, first/last_seen span).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(autouse=True)
def few_state_partitions(spark):
    """Streaming state partition count is pinned at query start from
    spark.sql.shuffle.partitions (AQE never coalesces stateful
    exchanges); 32 one-row state tasks per micro-batch is pure
    overhead at test scale."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", old)


@pytest.fixture()
def doc_drops(spark, tmp_path):
    """Two parquet drops with duplicate texts within AND across drops."""
    rows_a = [
        ("https://ex.com/1", "2024-01-01 00:00:01", "alpha beta gamma"),
        ("https://ex.com/2", "2024-01-01 00:00:02", "alpha beta gamma"),
        ("https://ex.com/3", "2024-01-01 00:00:03", "unique one"),
    ]
    rows_b = [
        ("https://ex.com/4", "2024-01-01 00:00:04", "alpha beta gamma"),
        ("https://ex.com/5", "2024-01-01 00:00:05", "unique two"),
    ]

    def mk(rows):
        return spark.createDataFrame(
            [(u, t) for u, _, t in rows], "url string, text string"
        ).withColumn("warc_ts", F.to_timestamp(F.lit("2024-01-01 00:00:00")))

    in_dir = str(tmp_path / "docs_in")
    mk(rows_a).write.mode("append").parquet(in_dir)
    return in_dir, mk(rows_b)


def _read_stream(spark, in_dir):
    sch = "url string, text string, warc_ts timestamp"
    return spark.readStream.schema(sch).parquet(in_dir)


def _drain(df, name, mode="append"):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination(120)
    return q


def test_stream_dedup_suppresses_across_triggers(spark, doc_drops, tmp_path):
    from promptner_spark.streaming import stream_dedup_first_seen

    in_dir, drop_b = doc_drops
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run():
        deduped = stream_dedup_first_seen(_read_stream(spark, in_dir))
        q = (deduped.writeStream.format("parquet")
             .option("path", out_dir).option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        return q

    q1 = run()
    got1 = {r["url"]: r["content_md5"]
            for r in spark.read.parquet(out_dir).collect()}
    # within-batch dedup: urls 1 and 3 survive (1 beats 2 deterministically)
    assert set(got1) == {"https://ex.com/1", "https://ex.com/3"}

    # second drop: the 'alpha beta gamma' copy must STILL be suppressed
    # (state survived the restart via the checkpoint)
    drop_b.write.mode("append").parquet(in_dir)
    q2 = run()
    got2 = {r["url"] for r in spark.read.parquet(out_dir).collect()}
    assert got2 == {"https://ex.com/1", "https://ex.com/3",
                    "https://ex.com/5"}

    # bounded state: one state row per distinct digest, reported by the
    # state-store operator metrics
    ops = q2.lastProgress["stateOperators"]
    assert len(ops) == 1
    assert ops[0]["numRowsTotal"] == 3  # 3 distinct digests


def test_stream_dedup_emits_full_page_row(spark, doc_drops):
    from promptner_spark.streaming import stream_dedup_first_seen

    in_dir, _ = doc_drops
    q = _drain(stream_dedup_first_seen(_read_stream(spark, in_dir)),
               "dedup_rows")
    rows = spark.sql("select * from dedup_rows").collect()
    spark.catalog.dropTempView("dedup_rows")
    by_url = {r["url"]: r for r in rows}
    r = by_url["https://ex.com/1"]
    assert r["text"] == "alpha beta gamma"
    assert r["content_md5"] is not None and r["warc_ts"] is not None


def test_stream_entity_cards_accumulate(spark, tmp_path):
    from promptner_spark.streaming import stream_entity_cards

    in_dir = str(tmp_path / "mentions_in")
    sch = ("url string, sent_id int, mention_id int, surface string, "
           "begin int, end int, type string, raw_output string, "
           "warc_ts timestamp")

    def drop(rows):
        # one file per drop so maxFilesPerTrigger=1 == one drop per batch
        spark.createDataFrame(rows, sch).coalesce(1) \
            .write.mode("append").parquet(in_dir)

    def ts(s):
        import datetime
        return datetime.datetime.fromisoformat(s)

    # two single-file drops; maxFilesPerTrigger=1 makes ONE availableNow
    # query process them as two micro-batches, so state must accumulate
    # across triggers (the memory sink cannot restart from a checkpoint)
    drop([("u1", 0, 0, "apache spark", 0, 2, "SYSTEM", None,
           ts("2024-01-01T00:00:01")),
          ("u2", 0, 0, "apache spark", 0, 2, "SYSTEM", None,
           ts("2024-01-01T00:00:05")),
          ("u2", 1, 0, "kafka", 0, 1, "SYSTEM", None,
           ts("2024-01-01T00:00:05"))])
    drop([("u3", 0, 0, "apache spark", 0, 2, "SYSTEM", None,
           ts("2024-01-01T00:00:09"))])

    cards = stream_entity_cards(
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(in_dir))
    q = (cards.writeStream.format("memory").queryName("cards")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    updates = spark.sql("select * from cards").collect()
    spark.catalog.dropTempView("cards")

    # update mode emits one card per (batch, touched surface): the
    # spark surface appears in both batches, kafka in one → 3 updates
    assert len(updates) == 3
    latest = {}
    for r in updates:
        if (r["surface"] not in latest
                or r["n_batches"] > latest[r["surface"]]["n_batches"]):
            latest[r["surface"]] = r
    card = latest["apache spark"]
    assert card["n_mentions"] == 3 and card["n_batches"] == 2
    assert card["first_seen"] == ts("2024-01-01T00:00:01")
    assert card["last_seen"] == ts("2024-01-01T00:00:09")
    assert latest["kafka"]["n_mentions"] == 1


def test_stream_dedup_ttl_mode_runs_and_keeps_state(spark, doc_drops,
                                                    tmp_path):
    """TTL (ProcessingTimeTimeout) mode: a continuous-trigger query
    registers per-digest timeouts and keeps deduping; stopped manually
    (availableNow would spin on empty timeout batches — see operator
    docstring)."""
    import time

    from promptner_spark.streaming import stream_dedup_first_seen

    in_dir, _ = doc_drops
    out_dir = str(tmp_path / "ttl_out")
    ckpt = str(tmp_path / "ttl_ckpt")
    q = (stream_dedup_first_seen(_read_stream(spark, in_dir),
                                 ttl_minutes=60)
         .writeStream.format("parquet")
         .option("path", out_dir).option("checkpointLocation", ckpt)
         .outputMode("append").trigger(processingTime="1 second").start())
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            p = q.lastProgress
            if p and p["stateOperators"] \
                    and p["stateOperators"][0]["numRowsTotal"] >= 2:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    urls = {r["url"] for r in spark.read.parquet(out_dir).collect()}
    assert urls == {"https://ex.com/1", "https://ex.com/3"}


def test_stream_dedup_matches_batch_dedup(spark, sf_dir, tmp_path):
    """Parity: streaming first-seen dedup over one drain == batch
    dedup_exact (keeper = min url per digest == min doc_id order)."""
    from promptner_spark.operators.dedup import dedup_exact
    from promptner_spark.streaming import stream_dedup_first_seen

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
            .select(F.concat(F.lit("https://ex.com/"),
                             F.format_string("%09d", "doc_id")).alias("url"),
                    "text",
                    F.timestamp_seconds(F.col("doc_id")).alias("warc_ts")))
    in_dir = str(tmp_path / "parity_in")
    docs.write.parquet(in_dir)

    q = _drain(stream_dedup_first_seen(_read_stream(spark, in_dir)),
               "parity_dedup")
    streamed = {r["url"] for r in spark.sql(
        "select url from parity_dedup").collect()}
    spark.catalog.dropTempView("parity_dedup")

    kept = dedup_exact(docs.withColumn("doc_id", F.col("url")),
                       id_col="doc_id")
    expected = {r["url"] for r in kept.select("url").collect()}
    assert streamed == expected


def test_stream_dedup_winner_spans_arrow_chunks(spark, tmp_path):
    """The deterministic winner (min url) must be selected across ALL
    Arrow chunks of a key's micro-batch iterator, not the first
    non-empty chunk — with maxRecordsPerBatch=2 a 6-row digest spans
    3 chunks and the minimum url arrives in the LAST one."""
    from promptner_spark.streaming.stateful import stream_dedup_first_seen

    urls = [f"https://ex.com/{u}" for u in ("z", "y", "x", "w", "v", "a")]
    rows = [(u, "same text payload") for u in urls]
    df = spark.createDataFrame(rows, "url string, text string") \
        .withColumn("warc_ts", F.to_timestamp(F.lit("2024-01-01 00:00:00")))
    in_dir = str(tmp_path / "chunk_in")
    df.coalesce(1).write.mode("append").parquet(in_dir)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        sch = "url string, text string, warc_ts timestamp"
        stream = spark.readStream.schema(sch).parquet(in_dir)
        out = stream_dedup_first_seen(stream)
        q = (out.writeStream.format("memory").queryName("chunk_dedup")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = spark.sql("select url from chunk_dedup").collect()
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert [r["url"] for r in got] == ["https://ex.com/a"]
