"""Custom Python Data Source (Spark 4 DataSource API) — the engine-native
form of the reference's crawler ingestion (SURVEY.md S10).

The reference scraped RottenTomatoes into ``::``-separated text files
(reference src/crawler/crawler.py:38-53, format ``people::movie::score``)
that were then bulk-loaded. Here the crawl IS a pluggable Spark source:
``spark.read.format("crawl_ratings")`` plans one input partition per
requested split, each worker generates its slice of the deterministic
line stream, and the standard multi-char-delimiter parse (sources/
delimited.py) turns lines into typed columns. Swapping the deterministic
generator for real HTTP fetches changes only ``_line`` — the partition
planning, option handling, and schema contract stay identical, and the
fetch work is distributed across executors instead of a driver-side loop.

Determinism: line i is a pure function of i, so the DuckDB oracle
reproduces the whole source with ``generate_series`` — the scan itself is
oracle-checked, not just the transforms on top of it.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from cqu_bigdata_recommender_system_for_movies_spark.plans.registry import register

N_ROWS = 5000
_SINK_IDS = itertools.count()
N_PARTS = 8
N_PEOPLE = 97
N_MOVIES = 203


def _line(i: int) -> str:
    person = i % N_PEOPLE + 1
    movie = (i * 31) % N_MOVIES + 1
    score = ((i * 7) % 50 + 1) / 10.0
    return f"person_{person}::movie_{movie}::{score:.1f}"


class CrawlRatingsDataSource(DataSource):
    """format("crawl_ratings") — options: rows, partitions."""

    @classmethod
    def name(cls) -> str:
        return "crawl_ratings"

    def schema(self) -> str:
        return "line STRING"

    def reader(self, schema) -> "CrawlRatingsReader":
        return CrawlRatingsReader(self.options)


class CrawlRatingsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_rows = int(options.get("rows", N_ROWS))
        self.n_parts = int(options.get("partitions", N_PARTS))

    def partitions(self):
        step = -(-self.n_rows // self.n_parts)  # ceil
        return [
            InputPartition((lo, min(lo + step, self.n_rows)))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: InputPartition):
        lo, hi = partition.value
        for i in range(lo, hi):
            yield (_line(i),)


def register_crawl_source(spark: SparkSession) -> None:
    """Idempotent registration of the custom source."""
    try:
        spark.dataSource.register(CrawlRatingsDataSource)
    except Exception:
        pass  # already registered in this session


@register(
    "python_datasource_scan",
    oracle=f"""
    WITH g AS (SELECT unnest(generate_series(0, {N_ROWS - 1})) AS i),
    r AS (
        SELECT 'movie_' || CAST((i * 31) % {N_MOVIES} + 1 AS VARCHAR) AS movie,
               ((i * 7) % 50 + 1) / 10.0 AS score
        FROM g
    )
    SELECT movie, COUNT(*) AS cnt, ROUND(AVG(score), 4) AS avg_score
    FROM r GROUP BY movie
    """,
    doc="S10 as a first-class pluggable source: custom Python DataSource "
    "(Spark 4 API) emits the crawler's ::-delimited lines from N planned "
    "partitions on executors; multi-char-delimiter parse -> per-movie "
    "rating stats. The oracle regenerates the identical line stream with "
    "generate_series, so the custom scan itself is value-checked.",
)
def python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cqu_bigdata_recommender_system_for_movies_spark.shipping import (
        ensure_shipped,
    )

    ensure_shipped(spark)
    register_crawl_source(spark)
    raw = spark.read.format("crawl_ratings").load()
    parts = raw.select(F.split("line", "::").alias("p"))
    parsed = parts.select(
        F.element_at("p", 2).alias("movie"),
        F.element_at("p", 3).cast("double").alias("score"),
    )
    return parsed.groupBy("movie").agg(
        F.count("*").alias("cnt"),
        F.round(F.avg("score"), 4).alias("avg_score"),
    )


# --- streaming variant of the custom source --------------------------------

STREAM_BATCH = 1200  # lines fetched per micro-batch


@register(
    "python_datasource_stream",
    oracle=f"""
    WITH g AS (SELECT unnest(generate_series(0, {N_ROWS - 1})) AS i),
    r AS (
        SELECT 'movie_' || CAST((i * 31) % {N_MOVIES} + 1 AS VARCHAR) AS movie,
               ((i * 7) % 50 + 1) / 10.0 AS score
        FROM g
    )
    SELECT movie, COUNT(*) AS cnt, ROUND(AVG(score), 4) AS avg_score
    FROM r GROUP BY movie
    """,
    doc="Custom Python STREAMING source (Spark 4 SimpleDataSourceStreamReader): "
    "the crawl feed consumed incrementally — multiple real micro-batches, "
    "each advancing a checkpointed {pos} offset by batchSize lines, appended "
    "to a sink and aggregated. Exactly-once comes from the offset log + "
    "deterministic readBetweenOffsets replay. Same oracle as the batch "
    "scan: streaming incrementalization must converge to the batch answer. "
    "Classes are defined in-function so cloudpickle ships them BY VALUE: "
    "the streaming planner runs in a fresh python process that cannot "
    "import this package (same constraint as transformWithState)."
)
def python_datasource_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_people, n_movies, n_rows, per_batch = N_PEOPLE, N_MOVIES, N_ROWS, STREAM_BATCH

    class CrawlStreamReader(SimpleDataSourceStreamReader):
        """Offset = {"pos": next line index}; stops advancing at n_rows so
        processAllAvailable() terminates deterministically."""

        def initialOffset(self):
            return {"pos": 0}

        def _line(self, i: int) -> str:
            person = i % n_people + 1
            movie = (i * 31) % n_movies + 1
            score = ((i * 7) % 50 + 1) / 10.0
            return f"person_{person}::movie_{movie}::{score:.1f}"

        def read(self, start):
            pos = start["pos"]
            end = min(pos + per_batch, n_rows)
            return iter([(self._line(i),) for i in range(pos, end)]), {"pos": end}

        def readBetweenOffsets(self, start, end):
            return iter([(self._line(i),) for i in range(start["pos"], end["pos"])])

    class CrawlStreamSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "crawl_ratings_stream"

        def schema(self) -> str:
            return "line STRING"

        def simpleStreamReader(self, schema):
            return CrawlStreamReader()

    try:
        spark.dataSource.register(CrawlStreamSource)
    except Exception:
        pass  # already registered in this session

    name = f"crawl_stream_sink_{next(_SINK_IDS)}"
    raw = spark.readStream.format("crawl_ratings_stream").load()
    parts = raw.select(F.split("line", "::").alias("p"))
    parsed = parts.select(
        F.element_at("p", 2).alias("movie"),
        F.element_at("p", 3).cast("double").alias("score"),
    )
    q = (
        parsed.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .groupBy("movie")
        .agg(F.count("*").alias("cnt"), F.round(F.avg("score"), 4).alias("avg_score"))
    )
