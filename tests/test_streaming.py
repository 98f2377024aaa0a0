"""Structured Streaming operators vs their batch equivalents: windowed
watermark aggregation, keyed-state first-wins dedup, crawl metrics
tailing.  File-source streams over the driver's parquet tables; every
stream result is compared against the equivalent batch query."""

import dataclasses
import os
import shutil
import tempfile

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from cianparser_spark.streaming import (
    crawl_metrics_stream,
    event_window_counts,
    first_wins_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def _events_dir(tmpdir: str) -> str:
    d = os.path.join(tmpdir, "events")
    os.makedirs(d, exist_ok=True)
    shutil.copy(f"{SF_DIR}/events.parquet", os.path.join(d, "part-0.parquet"))
    return d


def _run_to_memory(df, name: str, spark, mode: str = "append"):
    q = (
        df.writeStream.format("memory").queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(name)


def test_windowed_counts_match_batch(spark, tmp_path):
    d = _events_dir(str(tmp_path))
    got = _run_to_memory(
        event_window_counts(spark, d, window="1 hour", watermark="2 hours"),
        "win_counts", spark,
    ).orderBy("win_start", "event_type").collect()

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    want = (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 6).alias("avg_value"))
        .select(F.col("win.start").alias("win_start"), F.col("win.end").alias("win_end"),
                "event_type", "n", "avg_value")
        .orderBy("win_start", "event_type")
        .collect()
    )
    # append mode only emits windows the watermark has passed; with a
    # finite file stream the final windows stay open, so the emitted
    # set must be a prefix-subset of the batch result — and nonempty
    assert len(got) > 0
    want_map = {(r["win_start"], r["event_type"]): (r["n"], r["avg_value"]) for r in want}
    for r in got:
        assert want_map[(r["win_start"], r["event_type"])] == (r["n"], r["avg_value"])


def test_first_wins_stream_matches_batch_a1(spark, tmp_path):
    d = _events_dir(str(tmp_path))
    got = _run_to_memory(first_wins_stream(spark, d), "fw", spark).collect()

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    want = (
        ev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id").collect()
    )
    assert {(r["user_id"], r["event_type"], r["event_id"]) for r in got} \
        == {(r["user_id"], r["event_type"], r["event_id"]) for r in want}


def test_first_wins_state_holds_across_batches(spark, tmp_path):
    """A key seen in batch 1 must NOT re-emit when it reappears in a
    later micro-batch — the keyed state is the seen-set."""
    d = os.path.join(str(tmp_path), "stream")
    os.makedirs(d)

    def write_flat(df, name):
        # the file stream source does not recurse: land one flat file
        tmp = tempfile.mkdtemp(prefix="flat_")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        shutil.copy(os.path.join(tmp, part), os.path.join(d, name))
        shutil.rmtree(tmp, ignore_errors=True)

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").limit(200).cache()
    write_flat(ev, "b1.parquet")

    sink = "fw2"
    q = (
        first_wins_stream(spark, d)
        .writeStream.format("memory").queryName(sink).outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .start()
    )
    q.processAllAvailable()
    n1 = spark.table(sink).count()
    # replay the same events as a second batch: zero new emissions
    write_flat(ev, "b2.parquet")
    q.processAllAvailable()
    q.stop()
    n2 = spark.table(sink).count()
    assert n1 > 0 and n2 == n1


def test_crawl_metrics_stream_totals(spark, tmp_run_dir):
    from cianparser_spark.corpus import webgen as W
    from cianparser_spark.engine.crawler import CrawlEngine
    from cianparser_spark.semantics.simulator import CrawlSeed

    cfg = dataclasses.replace(W.DEFAULT_CONFIG, faults_on_details=False)
    seed = CrawlSeed(1, "Москва", "flat", "sale", rooms=(1, 2),
                     additional_settings={"end_page": 3})
    eng = CrawlEngine(spark, tmp_run_dir, [seed], cfg, host_tokens=2)
    eng.run()
    batch_pages = eng.store.read("metrics").agg(F.sum("pages_fetched")).collect()[0][0]

    got = _run_to_memory(
        crawl_metrics_stream(spark, tmp_run_dir), "crawlmon", spark, mode="complete"
    ).collect()
    assert sum(r["pages_fetched"] for r in got) == batch_pages
    assert max(r["last_wave"] for r in got) >= 2


def test_admission_stream_batch_invariant(spark, tmp_run_dir):
    """Decisions depend only on the standing corpus — one big
    micro-batch and file-by-file micro-batches must agree row-for-row
    (and cover the same docs exactly once)."""
    import os

    from pyspark.sql import functions as F

    from cianparser_spark.ops.dedup import build_dedup_index
    from cianparser_spark.streaming import admission_stream

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cut = int(docs.agg(F.max("doc_id")).collect()[0][0] * 0.8)
    corpus = docs.filter(F.col("doc_id") < cut)
    bench = corpus.filter(F.col("doc_id") % 7 == 0)
    idx = build_dedup_index(corpus)

    inc = os.path.join(tmp_run_dir, "in")
    os.makedirs(inc)
    incoming = docs.filter(F.col("doc_id") >= cut)
    mid = int(incoming.agg(F.avg("doc_id")).collect()[0][0])
    for name, df in (("a", incoming.filter(F.col("doc_id") < mid)),
                     ("b", incoming.filter(F.col("doc_id") >= mid))):
        df.coalesce(1).write.mode("overwrite").parquet(f"{inc}/{name}")
        for f in os.listdir(f"{inc}/{name}"):
            if f.endswith(".parquet"):
                os.rename(f"{inc}/{name}/{f}", f"{inc}/{name}.parquet")

    outs = []
    for i, mfpt in enumerate((1, 10)):
        sink = os.path.join(tmp_run_dir, f"out{i}")
        q = admission_stream(spark, inc, corpus, idx, bench, sink,
                             threshold=0.2, min_quality=0.5,
                             max_files_per_trigger=mfpt)
        q.processAllAvailable()
        q.stop()
        rows = spark.read.parquet(sink).drop("batch_id") \
            .orderBy("doc_id").collect()
        outs.append(rows)
    assert outs[0] == outs[1]
    ids = [r["doc_id"] for r in outs[0]]
    assert ids == sorted(set(ids)) and len(ids) == incoming.count()
    n_batches = [len({r["batch_id"] for r in
                      spark.read.parquet(os.path.join(tmp_run_dir, f"out{i}"))
                      .select("batch_id").collect()}) for i in (0, 1)]
    assert n_batches[0] == 2 and n_batches[1] == 1
