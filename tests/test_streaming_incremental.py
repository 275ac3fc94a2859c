"""Incremental KG maintenance (streaming/incremental.py): the
foreachBatch merge over N drops must equal the one-shot batch pipeline
over the union — streaming/batch parity for the whole KG tail."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(autouse=True)
def few_state_partitions(spark):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", old)


def _pages(spark, sf_dir, lo, hi):
    from promptner_spark.sources.pages import pages_with_extracted_text
    p = pages_with_extracted_text(spark, sf_dir)
    return p.withColumn(
        "__id", F.split(F.col("url"), "/").getItem(3).cast("long")
    ).where(F.col("__id").between(lo, hi)).drop("__id")


def _counts_dict(df):
    return {(r["subj"], r["pred"], r["obj"]): (r["n_sents"], r["n_docs"])
            for r in df.collect()}


def test_incremental_merge_matches_one_shot_batch(spark, sf_dir, tmp_path):
    from promptner_spark.streaming.incremental import (
        batch_triple_counts, incremental_triple_counts, merge_counts,
        read_store,
    )

    full = _pages(spark, sf_dir, 0, 39)
    expected = _counts_dict(batch_triple_counts(full))
    assert expected, "corpus slice must produce triples"

    # two drops, merged through the store
    store = str(tmp_path / "triple_store")
    merge_counts(store, batch_triple_counts(_pages(spark, sf_dir, 0, 19)))
    merge_counts(store, batch_triple_counts(_pages(spark, sf_dir, 20, 39)))
    got = _counts_dict(read_store(spark, store))
    assert got == expected

    # the same merge driven by a real availableNow streaming query
    in_dir = str(tmp_path / "drops_in")
    _pages(spark, sf_dir, 0, 19).write.mode("append").parquet(in_dir)
    _pages(spark, sf_dir, 20, 39).write.mode("append").parquet(in_dir)
    stream = spark.readStream.schema(
        "url string, warc_ts timestamp, lang string, text string, "
        "extract_ok boolean").option("maxFilesPerTrigger", 1).parquet(in_dir)
    store2 = str(tmp_path / "triple_store_stream")
    q = incremental_triple_counts(
        stream, store2, str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    got_stream = _counts_dict(read_store(spark, store2))
    assert got_stream == expected


def _counts_df(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, "
              "n_sents long, n_docs long")


def test_merge_is_idempotent_per_batch_id(spark, tmp_path):
    """At-least-once foreachBatch: replaying an already-applied
    batch_id (restart between merge and checkpoint commit) must not
    double-count."""
    from promptner_spark.streaming.incremental import (
        merge_counts, read_store,
    )

    store = str(tmp_path / "store")
    b0 = _counts_df(spark, [("a", "p", "b", 3, 2), ("c", "p", "d", 1, 1)])
    assert merge_counts(store, b0, batch_id=0) is True
    once = _counts_dict(read_store(spark, store))

    assert merge_counts(store, b0, batch_id=0) is False   # replay → skip
    assert _counts_dict(read_store(spark, store)) == once

    b1 = _counts_df(spark, [("a", "p", "b", 2, 1)])
    assert merge_counts(store, b1, batch_id=1) is True
    assert _counts_dict(read_store(spark, store))[("a", "p", "b")] == (5, 3)
    # stale replay of an older id after newer ones applied: still a no-op
    assert merge_counts(store, b0, batch_id=0) is False


def test_merge_crash_before_pointer_publish_keeps_old_store(
        spark, tmp_path, monkeypatch):
    """Kill-between-swap: a crash after the new bucket dirs are
    promoted but BEFORE the pointer replace must leave the previous
    version fully readable; the retried merge then succeeds and the
    orphaned dirs are swept."""
    import promptner_spark.streaming.incremental as inc

    store = str(tmp_path / "store")
    inc.merge_counts(store, _counts_df(
        spark, [("a", "p", "b", 3, 2)]), batch_id=0)
    before = _counts_dict(inc.read_store(spark, store))

    real = inc._write_pointer

    def boom(store_dir, ptr):
        raise RuntimeError("simulated crash before pointer publish")

    monkeypatch.setattr(inc, "_write_pointer", boom)
    import pytest
    with pytest.raises(RuntimeError, match="simulated crash"):
        inc.merge_counts(store, _counts_df(
            spark, [("a", "p", "b", 1, 1)]), batch_id=1)
    # previous version is intact — never a moment without a store
    assert _counts_dict(inc.read_store(spark, store)) == before

    monkeypatch.setattr(inc, "_write_pointer", real)
    assert inc.merge_counts(store, _counts_df(
        spark, [("a", "p", "b", 1, 1)]), batch_id=1) is True
    assert _counts_dict(inc.read_store(spark, store)) == {
        ("a", "p", "b"): (4, 3)}
    # crash debris (staging, data dirs referenced by NO retained
    # snapshot) was swept; dirs still referenced by retained
    # snapshots are legitimately on disk until expire_snapshots
    import os
    ptr = inc._load_pointer(store)
    live = set(ptr["buckets"].values())
    for v in inc._retained_snapshots(store):
        live.update(inc._load_snapshot(store, v)["buckets"].values())
    on_disk = {f"data/{n}" for n in os.listdir(os.path.join(store, "data"))}
    assert on_disk == live
    assert not [n for n in os.listdir(store) if n.startswith(".staging_")]
    # after retention is dropped to just the current snapshot the
    # store shrinks to exactly the pointer's dirs
    inc.expire_snapshots(store, keep_last=1)
    on_disk = {f"data/{n}" for n in os.listdir(os.path.join(store, "data"))}
    assert on_disk == set(ptr["buckets"].values())


def test_merge_rewrites_only_touched_buckets(spark, tmp_path):
    """Bucket-wise merge: a batch whose subjects hash to one bucket
    must leave every other bucket's files byte-identical (same paths,
    same bytes) — at crawl scale a small drop rewrites a few files,
    not the corpus-wide edge table."""
    import os

    import promptner_spark.streaming.incremental as inc

    store = str(tmp_path / "store")
    # seed many subjects so several buckets are populated
    seed = _counts_df(spark, [(f"s{i}", "p", f"o{i}", i + 1, 1)
                              for i in range(40)])
    inc.merge_counts(store, seed, batch_id=0)
    ptr = inc._load_pointer(store)
    assert len(ptr["buckets"]) > 2

    def snapshot(bucket_rel):
        d = os.path.join(store, bucket_rel)
        return {f: open(os.path.join(d, f), "rb").read()
                for f in sorted(os.listdir(d)) if f.endswith(".parquet")}

    pre = {k: snapshot(rel) for k, rel in ptr["buckets"].items()}

    # one-subject batch → exactly one touched bucket
    one = _counts_df(spark, [("s0", "p", "o0", 5, 2)])
    from pyspark.sql import functions as F
    [tb] = [r["b"] for r in one.select(
        F.pmod(F.xxhash64("subj"), F.lit(ptr["n_buckets"]))
        .cast("int").alias("b")).distinct().collect()]
    inc.merge_counts(store, one, batch_id=1)

    post_ptr = inc._load_pointer(store)
    for k, rel in post_ptr["buckets"].items():
        if int(k) == tb:
            assert rel != ptr["buckets"][k], "touched bucket must version up"
        else:
            assert rel == ptr["buckets"][k], "untouched bucket re-pointed"
            assert snapshot(rel) == pre[k], "untouched bucket rewritten"
    got = _counts_dict(inc.read_store(spark, store))
    assert got[("s0", "p", "o0")] == (6, 3)
    assert got[("s1", "p", "o1")] == (2, 1)


def test_snapshot_time_travel_and_structural_sharing(spark, tmp_path):
    """Every merge is a retained snapshot: read_store(version=n)
    reproduces the store as of that commit (Iceberg time travel on
    the stand-in layout), and consecutive snapshots SHARE untouched
    buckets' dirs (retention costs O(touched), not O(store))."""
    import promptner_spark.streaming.incremental as inc

    store = str(tmp_path / "store")
    drop1 = _counts_df(spark, [(f"s{i}", "p", f"o{i}", i + 1, 1)
                               for i in range(20)])
    inc.merge_counts(store, drop1, batch_id=0)
    v1 = _counts_dict(inc.read_store(spark, store))

    inc.merge_counts(store, _counts_df(
        spark, [("s0", "p", "o0", 5, 2)]), batch_id=1)
    v2 = _counts_dict(inc.read_store(spark, store))
    assert v2 != v1

    # time travel: v1 is still byte-readable after the v2 commit
    assert _counts_dict(inc.read_store(spark, store, version=1)) == v1
    assert _counts_dict(inc.read_store(spark, store, version=2)) == v2
    # never-published version → None
    assert inc.read_store(spark, store, version=9) is None

    # structural sharing: the two snapshots point at the SAME dirs
    # for every bucket the second merge did not touch
    s1 = inc._load_snapshot(store, 1)["buckets"]
    s2 = inc._load_snapshot(store, 2)["buckets"]
    shared = [k for k in s1 if s2.get(k) == s1[k]]
    changed = [k for k in s2 if s1.get(k) != s2[k]]
    assert len(changed) == 1, "one-subject batch touches one bucket"
    assert shared, "untouched buckets must be shared, not copied"


def test_snapshot_diff_is_bucket_pruned_incremental_read(spark, tmp_path):
    """snapshot_diff returns exactly the per-triple deltas between two
    commits, reading ONLY buckets whose version changed — the
    incremental-consumer path (Iceberg incremental scan)."""
    import promptner_spark.streaming.incremental as inc

    store = str(tmp_path / "store")
    inc.merge_counts(store, _counts_df(
        spark, [(f"s{i}", "p", f"o{i}", i + 1, 1) for i in range(20)]),
        batch_id=0)
    drop2 = [("s0", "p", "o0", 5, 2), ("brand", "p", "new", 7, 4)]
    inc.merge_counts(store, _counts_df(spark, drop2), batch_id=1)

    diff = {(r["subj"], r["pred"], r["obj"]): (r["d_sents"], r["d_docs"])
            for r in inc.snapshot_diff(spark, store, 1, 2).collect()}
    # the diff IS the second drop's contribution, nothing else
    assert diff == {("s0", "p", "o0"): (5, 2), ("brand", "p", "new"): (7, 4)}

    # diffing against an unretained snapshot is an explicit error
    with pytest.raises(ValueError, match="not retained"):
        inc.snapshot_diff(spark, store, 0, 2)


def test_expire_snapshots_releases_dirs_but_keeps_current(spark, tmp_path):
    """expire_snapshots drops old snapshot files and sweeps the bucket
    dirs only they referenced; the current commit stays readable and
    an expired version raises (Iceberg expire contract)."""
    import os

    import promptner_spark.streaming.incremental as inc

    store = str(tmp_path / "store")
    for b, rows in enumerate((
            [(f"s{i}", "p", f"o{i}", i + 1, 1) for i in range(20)],
            [("s0", "p", "o0", 1, 1)],
            [("s1", "p", "o1", 2, 1)])):
        inc.merge_counts(store, _counts_df(spark, rows), batch_id=b)
    cur = _counts_dict(inc.read_store(spark, store))
    assert inc._retained_snapshots(store) == [1, 2, 3]

    expired = inc.expire_snapshots(store, keep_last=1)
    assert expired == [1, 2]
    assert inc._retained_snapshots(store) == [3]
    # current commit unaffected
    assert _counts_dict(inc.read_store(spark, store)) == cur
    # the store shrank to exactly the live dirs
    ptr = inc._load_pointer(store)
    on_disk = {f"data/{n}" for n in os.listdir(os.path.join(store, "data"))}
    assert on_disk == set(ptr["buckets"].values())
    # expired time travel is an explicit error, not silent remap
    with pytest.raises(ValueError, match="expired"):
        inc.read_store(spark, store, version=1)


def test_iceberg_merge_gate_and_statement_shape(spark):
    """No Iceberg catalog in the sandbox: the upgrade path must refuse
    loudly (never silently fall back), and the MERGE it would issue
    must be the key-wise additive upsert the parquet merge emulates."""
    import promptner_spark.streaming.incremental as inc

    with pytest.raises(RuntimeError, match="no Iceberg catalog"):
        inc.merge_counts_iceberg(
            _counts_df(spark, [("a", "p", "b", 1, 1)]), "cat.db.triples")

    sql = inc._iceberg_merge_sql("cat.db.triples", "src")
    assert "MERGE INTO cat.db.triples t USING src s" in sql
    assert "t.subj = s.subj AND t.pred = s.pred AND t.obj = s.obj" in sql
    assert "t.n_sents = t.n_sents + s.n_sents" in sql
    assert "t.n_docs = t.n_docs + s.n_docs" in sql
    assert ("INSERT (subj, pred, obj, n_sents, n_docs) "
            "VALUES (s.subj, s.pred, s.obj, s.n_sents, s.n_docs)") in sql


def test_iceberg_wap_single_commit_recipe(spark):
    """r5: the batch id rides in the MERGE's own snapshot summary
    (spark.wap.id → summary['wap.id']) so data and replay marker
    commit atomically — pin the id format, the summary query shape,
    and the high-water parse (max over all snapshots, foreign wap ids
    ignored, property fallback only when no summary id exists)."""
    import promptner_spark.streaming.incremental as inc

    assert inc._wap_id(7) == "promptner-batch-7"
    assert "summary['wap.id']" in inc._SNAPSHOT_WAP_SQL
    assert inc._SNAPSHOT_WAP_SQL.format(table="cat.db.t").endswith(
        "FROM cat.db.t.snapshots")
    assert inc._max_wap_batch_id(
        ["promptner-batch-3", None, "other-writer", "promptner-batch-11",
         "promptner-batch-x"]) == 11
    assert inc._max_wap_batch_id([None, "unrelated"]) is None
    # the caveat is gone: merge_counts_iceberg must set spark.wap.id
    # around the statement, not only write TBLPROPERTIES afterwards
    import inspect

    src = inspect.getsource(inc.merge_counts_iceberg)
    assert 'spark.conf.set(wap_conf' in src
    assert "_iceberg_last_batch_id" in src


def test_lineage_mismatch_raises(spark, tmp_path):
    """A stream restarted with a FRESH checkpoint restarts batch ids
    at 0; without the lineage bind its batches would be silently
    skipped by the high-water mark (r4 ADVICE). The store must reject
    the foreign lineage loudly."""
    import promptner_spark.streaming.incremental as inc

    store = str(tmp_path / "store")
    b = _counts_df(spark, [("a", "p", "b", 3, 2)])
    assert inc.merge_counts(store, b, batch_id=5, lineage="qid:A") is True
    # same lineage: replay guard works as before
    assert inc.merge_counts(store, b, batch_id=5, lineage="qid:A") is False
    # fresh checkpoint (ids restarted) = different lineage: loud error,
    # NOT a silent False
    with pytest.raises(RuntimeError, match="lineage"):
        inc.merge_counts(store, b, batch_id=0, lineage="qid:B")
    # legacy callers without lineage still merge (back-compat)
    assert inc.merge_counts(store, _counts_df(
        spark, [("c", "p", "d", 1, 1)]), batch_id=6) is True
    # a pre-r5 store (no lineage recorded) adopts the first one offered
    store2 = str(tmp_path / "store2")
    assert inc.merge_counts(store2, b, batch_id=0) is True
    assert inc._load_pointer(store2)["lineage"] is None
    assert inc.merge_counts(store2, _counts_df(
        spark, [("e", "p", "f", 1, 1)]), batch_id=1,
        lineage="qid:C") is True
    assert inc._load_pointer(store2)["lineage"] == "qid:C"
    with pytest.raises(RuntimeError, match="lineage"):
        inc.merge_counts(store2, b, batch_id=0, lineage="qid:D")


def test_concurrent_writer_fails_loudly(spark, tmp_path):
    """Two interleaved maintenance queries on one store: the second
    must abort, not last-writer-win (r4 verdict Next #8). Simulated by
    holding the writer flock while a merge attempts to run."""
    import promptner_spark.streaming.incremental as inc

    store = str(tmp_path / "store")
    inc.merge_counts(store, _counts_df(
        spark, [("a", "p", "b", 1, 1)]), batch_id=0)
    held = inc._acquire_writer_lock(store)
    assert held is not None
    try:
        with pytest.raises(RuntimeError, match="writer lock"):
            inc.merge_counts(store, _counts_df(
                spark, [("c", "p", "d", 1, 1)]), batch_id=1)
    finally:
        held.close()
    # lock released: the same merge now succeeds
    assert inc.merge_counts(store, _counts_df(
        spark, [("c", "p", "d", 1, 1)]), batch_id=1) is True


def test_publish_cas_detects_lockless_race(spark, tmp_path, monkeypatch):
    """Defense-in-depth for filesystems without advisory locks: if
    another writer advanced the pointer while this merge staged, the
    publish must abort instead of overwriting the other commit."""
    import promptner_spark.streaming.incremental as inc

    store = str(tmp_path / "store")
    inc.merge_counts(store, _counts_df(
        spark, [("a", "p", "b", 1, 1)]), batch_id=0)
    # disable the flock so the CAS is the only guard (lockless fs)
    monkeypatch.setattr(inc, "_acquire_writer_lock", lambda d: None)
    real_load = inc._load_pointer
    raced = {"done": False}

    def load_with_race(store_dir):
        ptr = real_load(store_dir)
        # simulate the interleaved writer committing AFTER this merge
        # read its base pointer but BEFORE it publishes: bump the
        # on-disk version once, at the CAS re-read
        if ptr is not None and raced["done"]:
            bumped = dict(ptr)
            bumped["version"] = ptr["version"] + 1
            return bumped
        raced["done"] = True
        return ptr

    monkeypatch.setattr(inc, "_load_pointer", load_with_race)
    with pytest.raises(RuntimeError, match="concurrent writer"):
        inc.merge_counts(store, _counts_df(
            spark, [("c", "p", "d", 1, 1)]), batch_id=1)
