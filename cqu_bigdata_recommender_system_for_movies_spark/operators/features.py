"""Feature-engineering operators (north-star extension): the tabular
feature-prep steps a training pipeline runs between raw tables and a model —
quantile binning, feature hashing, min-max normalization, and CDC-style
keep-latest state compaction.

Scale notes:
- Binning is windowed PER GROUP (brand), never a global total order — a
  global NTILE is a single-partition sort; the per-group form shuffles on
  the group key like any agg.
- Feature hashing uses the engine-portable md5-prefix hash (same trick as
  dedup.py) so the DuckDB oracle reproduces bucket ids exactly; at 100 TB
  the hash is computed scan-side with no shuffle.
- Min-max bounds come from a 1-row broadcast aggregate, not a window over
  an empty frame (which would also be a single partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cqu_bigdata_recommender_system_for_movies_spark.plans.registry import register
from cqu_bigdata_recommender_system_for_movies_spark.tables import load

N_BINS = 4
N_HASH_BUCKETS = 64


@register(
    "feature_engineering_suite",
    oracle=f"""
    WITH stats AS (
        SELECT MIN(p_retailprice) AS lo, MAX(p_retailprice) AS hi FROM part
    )
    SELECT p_partkey,
           NTILE({N_BINS}) OVER (
               PARTITION BY p_brand ORDER BY p_retailprice, p_partkey
           ) AS brand_price_bin,
           CAST(('0x' || substr(md5(p_brand), 1, 8)) AS BIGINT)
               % {N_HASH_BUCKETS} AS brand_bucket,
           ROUND((p_retailprice - lo) / (hi - lo), 6) AS price_norm,
           ROUND(ln(1 + p_retailprice), 6) AS log_price
    FROM part CROSS JOIN stats
    """,
    doc="Feature engineering (north star): per-brand price quartile via a "
    "partitioned NTILE window (tie-broken, never a global sort), portable "
    "hashed brand bucket (md5-prefix % 64 — identical in DuckDB), min-max "
    "price normalization against a broadcast 1-row bounds aggregate, and "
    "a log1p transform — the standard tabular feature-prep block.",
)
def feature_engineering_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    stats = part.agg(
        F.min("p_retailprice").alias("lo"), F.max("p_retailprice").alias("hi")
    )
    w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    bucket = (
        F.conv(F.substring(F.md5("p_brand"), 1, 8), 16, 10).cast("long")
        % N_HASH_BUCKETS
    )
    return part.crossJoin(F.broadcast(stats)).select(
        "p_partkey",
        F.ntile(N_BINS).over(w).alias("brand_price_bin"),
        bucket.alias("brand_bucket"),
        F.round(
            (F.col("p_retailprice") - F.col("lo")) / (F.col("hi") - F.col("lo")), 6
        ).alias("price_norm"),
        F.round(F.log1p("p_retailprice"), 6).alias("log_price"),
    )


@register(
    "cdc_latest_state",
    oracle="""
    SELECT user_id, event_type, event_id AS last_event_id,
           ROUND(value, 4) AS last_value
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC
        ) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
    doc="CDC keep-latest compaction (north star): treat events as an upsert "
    "change stream keyed by (user_id, event_type) and keep only the latest "
    "row per key — the batch form of MERGE-style last-writer-wins state, "
    "as one partitioned window rank (single shuffle on the key; AQE "
    "handles key skew).",
)
def cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("last_event_id"),
            F.round("value", 4).alias("last_value"),
        )
    )
