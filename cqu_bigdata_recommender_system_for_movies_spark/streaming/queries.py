"""Structured Streaming queries (SURVEY.md §2.9 ST1-ST6, §2.1 S4-S6).

Each registry entry drives a real streaming query to completion over the
parquet file source (the deterministic stand-in for the reference's socket
source — same line-parsing semantics, reference streaming_rec.py:170-188)
and returns the materialized memory-sink table. Where the computation is
SQL-expressible the DuckDB oracle checks the *streaming* result against the
batch semantics — micro-batch incrementalization must converge to the same
answer.

Sinks: memory (tests/driver), foreachBatch (interest fold history), console
(reference parity, exercised in tests only).
"""

from __future__ import annotations

import hashlib
import itertools
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cqu_bigdata_recommender_system_for_movies_spark.plans.registry import register
from cqu_bigdata_recommender_system_for_movies_spark.streaming.interest import (
    interest_fold_stream,
)
from cqu_bigdata_recommender_system_for_movies_spark.tables import load

_counter = itertools.count()


def _as_stream_dir(file_path: str) -> str:
    """Spark's file streaming source lists a *directory*; stage a symlink to
    the single parquet file in a stable temp dir (read-only testdata stays
    untouched)."""
    digest = hashlib.md5(file_path.encode()).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), "spark_graft_streams", digest)
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, os.path.basename(file_path))
    if not os.path.exists(link):
        os.symlink(file_path, link)
    return d


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table (S4 socket stand-in)."""
    from cqu_bigdata_recommender_system_for_movies_spark.tables import (
        EVENTS_RAW_SCHEMA,
        _nanos_to_ts,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.readStream.schema(EVENTS_RAW_SCHEMA).parquet(
        _as_stream_dir(f"{sf_dir}/events.parquet")
    )
    return _nanos_to_ts(raw)


def _run_to_memory(stream_df: DataFrame, mode: str) -> DataFrame:
    """Execute the streaming query to completion; return the sink table."""
    name = f"sink_{next(_counter)}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    return stream_df.sparkSession.table(name)


@register(
    "streaming_parse_records",
    oracle="SELECT event_id, user_id, value FROM events",
    doc="ST1/S4/P1/P2/F1/F2: the reference's record-parse pipeline "
    "(streaming_rec.py:181-188): lines -> split -> positional get -> typed "
    "cast, run as an actual micro-batch streaming query (append mode). "
    "Oracle is the batch identity — parsing must be lossless.",
)
def streaming_parse_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = _events_stream(spark, sf_dir)
    lines = stream.select(
        F.concat_ws(
            " ",
            F.col("event_id").cast("string"),
            F.col("user_id").cast("string"),
            F.col("value").cast("string"),
        ).alias("record")
    )
    parts = lines.select(F.split("record", " ").alias("p"))
    parsed = parts.select(
        F.element_at("p", 1).cast("long").alias("event_id"),
        F.element_at("p", 2).cast("long").alias("user_id"),
        F.element_at("p", 3).cast("double").alias("value"),
    )
    return _run_to_memory(parsed, "append")


@register(
    "streaming_wordcount",
    oracle="""
    SELECT word, COUNT(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
    doc="A1/ST2/T1: the reference's streaming word count golden test "
    "(test/streaming_test.py:32-67) — split/explode/groupBy/count in "
    "complete output mode; must equal the batch word count.",
)
def streaming_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    schema = load(spark, sf_dir, "documents").schema
    stream = spark.readStream.schema(schema).parquet(
        _as_stream_dir(f"{sf_dir}/documents.parquet")
    )
    counts = (
        stream.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    return _run_to_memory(counts, "complete")


@register(
    "streaming_window_counts",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, COUNT(*) AS cnt
    FROM events
    GROUP BY 1, 2
    """,
    doc="ST4 (beyond reference parity): event-time tumbling windows — 1-day "
    "window counts per event type, complete mode. Watermarked variants are "
    "exercised in tests; availableNow + complete keeps the result "
    "deterministic for the oracle.",
)
def streaming_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = _events_stream(spark, sf_dir)
    counts = (
        stream.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "cnt",
        )
    )
    return _run_to_memory(counts, "complete")


@register(
    "streaming_static_join",
    oracle="""
    SELECT event_id, e.user_id AS user_id, event_type, value,
           c_mktsegment AS segment
    FROM events e LEFT JOIN customer ON e.user_id = c_custkey
    """,
    doc="J1/ST5: true stream-static left join (streaming_rec.py:189) — "
    "streaming events enriched with the broadcast customer dimension, "
    "append mode.",
)
def streaming_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = _events_stream(spark, sf_dir)
    customer = load(spark, sf_dir, "customer")
    joined = stream.join(
        F.broadcast(customer), stream.user_id == customer.c_custkey, "left"
    ).select(
        "event_id",
        stream.user_id.alias("user_id"),
        "event_type",
        "value",
        F.col("c_mktsegment").alias("segment"),
    )
    return _run_to_memory(joined, "append")


@register(
    "streaming_interest_fold",
    oracle=None,  # custom stateful operator — rows-only; verified in pytest
    doc="ST3/F7/M8: per-user interest-vector EWMA fold "
    "U := U*(1-λr) + T*(λr), λ=0.05 (streaming_rec.py:99) as distributed "
    "per-key streaming state via applyInPandasWithState — all events per "
    "user folded in event-time order (the reference processed only "
    "first() per batch; documented deviation, SURVEY.md §7). Interest "
    "emitted as (user_id, n_events, pos, weight) rows.",
)
def streaming_interest_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = _events_stream(spark, sf_dir)
    folded = interest_fold_stream(stream, output_mode="update")
    result = _run_to_memory(folded, "update")
    # memory sink in update mode may hold one row per key per batch; keep the
    # final state per user (max n_events), exploded to scalar rows for hashing
    latest = (
        result.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "interest")).alias("s"))
        .select("user_id", F.col("s.n_events").alias("n_events"), F.col("s.interest").alias("interest"))
    )
    return latest.select(
        "user_id", "n_events", F.posexplode("interest").alias("pos", "weight")
    )
