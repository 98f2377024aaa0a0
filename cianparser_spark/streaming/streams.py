"""Structured Streaming operators — the streaming-shaped semantics of
SURVEY.md §2.9 expressed with Spark's native streaming engine.

The crawl engine itself deliberately runs as driver-orchestrated
micro-batch waves over snapshot tables (deterministic, resumable,
bit-matchable — see SURVEY.md §2.9); these operators cover the same
semantics in Structured Streaming form for continuous consumers:

* ``event_window_counts``  — watermarked event-time windowed
  aggregation (late-data handling the reference lacks entirely).
* ``first_wins_stream``    — the URL-seen set as KEYED STATE
  (``applyInPandasWithState``): first-occurrence-wins per key over an
  unbounded stream, the streaming analog of A1 dedup
  (reference: cianparser/base_list.py:24 in-memory ``result_set``).
* ``crawl_metrics_stream`` — tails the WaveStore's ``metrics`` table
  (each wave commit lands new parquet files → one micro-batch) for
  live pages/cards/host monitoring of a running crawl.

All are file-source streams: no sockets or external brokers exist in
this sandbox, and parquet-directory tailing is exactly how the wave
store exposes itself to downstream consumers on a real cluster.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cianparser_spark.engine import model

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def event_window_counts(spark: SparkSession, events_dir: str,
                        window: str = "1 hour", watermark: str = "2 hours",
                        slide: str | None = None) -> DataFrame:
    """Watermarked tumbling/sliding event-time window aggregation over a
    parquet event stream.  Append output mode: a window emits once its
    watermark passes — late events beyond ``watermark`` are dropped."""
    s = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .parquet(events_dir)
    )
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        s.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.avg("value"), 6).alias("avg_value"))
        .select(F.col("win.start").alias("win_start"),
                F.col("win.end").alias("win_end"),
                "event_type", "n", "avg_value")
    )


_FW_OUT = "user_id long, event_type string, event_id long, ts timestamp"
_FW_STATE = "seen boolean"


def first_wins_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """First-occurrence-wins per (user_id, event_type) over an
    unbounded stream — the URL-seen set as a keyed state store.

    State per key is one boolean; a key emits exactly one row, on its
    first appearance in stream order (ties inside a batch broken by
    (ts, event_id), matching the engine's crawl-order dedup A1).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def dedup(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            # key already emitted in an earlier batch — nothing to yield
            for _ in pdfs:
                pass
            return
        best = None
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            head = pdf.iloc[0]
            if best is None or (head["ts"], head["event_id"]) < (best["ts"], best["event_id"]):
                best = head
        state.update((True,))
        yield pd.DataFrame([{
            "user_id": key[0], "event_type": key[1],
            "event_id": best["event_id"], "ts": best["ts"],
        }])

    s = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .parquet(events_dir)
    )
    return s.groupBy("user_id", "event_type").applyInPandasWithState(
        dedup, _FW_OUT, _FW_STATE, "append", GroupStateTimeout.NoTimeout
    )


def crawl_metrics_stream(spark: SparkSession, run_dir: str) -> DataFrame:
    """Tail a crawl run's metrics table: every wave commit adds parquet
    files under ``data/metrics/w*``; each shows up as a micro-batch.
    Complete-mode per-host totals for live monitoring."""
    s = (
        spark.readStream.schema(model.METRICS_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(f"{run_dir}/data/metrics")
    )
    return s.groupBy("host").agg(
        F.sum("pages_fetched").alias("pages_fetched"),
        F.sum("cards_parsed").alias("cards_parsed"),
        F.sum("n_429").alias("n_429"),
        F.max("wave").alias("last_wave"),
    )


def admission_stream(spark: SparkSession, incoming_dir: str,
                     corpus: DataFrame, corpus_index: DataFrame,
                     benchmark: DataFrame, sink_dir: str,
                     threshold: float = 0.2, min_quality: float = 0.6,
                     ngram_n: int = 4, max_files_per_trigger: int = 1):
    """Streaming ingest admission for a training corpus: each arriving
    micro-batch of documents is gated against the STANDING corpus —
    (1) near-dup: the batch probes the prebuilt LSH index
    (``ops.dedup.incremental_lsh_pairs`` — work ∝ batch + collisions,
    corpus never rescanned), (2) quality floor
    (``ops.text.quality_score``), (3) benchmark decontamination
    (``ops.text.decontaminate``).  Decisions (near_dup, quality,
    contaminated, admitted, batch_id) append to ``sink_dir`` parquet —
    the Iceberg-append analog of a moderated ingest table.

    Runs as ``foreachBatch`` (the gates are joins/aggregates, which
    plain streaming operators can't express); each doc's decision
    depends only on the FIXED corpus/index/benchmark, never on other
    incoming docs, so results are micro-batch-partitioning-invariant —
    which is what makes the whole stream DuckDB-oracle-checkable.
    Returns the started StreamingQuery (caller drains/stops)."""
    import tempfile

    from cianparser_spark.ops.dedup import incremental_lsh_pairs
    from cianparser_spark.ops.text import decontaminate, quality_score

    s = (
        spark.readStream.schema(corpus.schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(incoming_dir)
    )

    def gate(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        near = (
            incremental_lsh_pairs(batch, corpus, corpus_index,
                                  threshold=threshold)
            .select(F.col("left_id").alias("doc_id")).distinct()
            .withColumn("near_dup", F.lit(1))
        )
        q = quality_score(batch).select("doc_id", "quality")
        c = decontaminate(batch, benchmark, n=ngram_n) \
            .select("doc_id", "contaminated")
        out = (
            batch.select("doc_id")
            .join(near, "doc_id", "left")
            .join(q, "doc_id").join(c, "doc_id")
            .select(
                "doc_id",
                F.coalesce("near_dup", F.lit(0)).cast("int").alias("near_dup"),
                "quality", "contaminated")
            .withColumn(
                "admitted",
                ((F.col("near_dup") == 0)
                 & (F.col("quality") >= min_quality)
                 & (F.col("contaminated") == 0)).cast("int"))
            .withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
        )
        out.write.mode("append").parquet(sink_dir)

    return (
        s.writeStream.foreachBatch(gate)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="adm_ckpt_"))
        .start()
    )
