"""OLAP grouping extensions: rollup, pivot (beyond the reference — SURVEY.md
§2.4 notes the reference has no grouping sets — but required for a complete
analytics engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cqu_bigdata_recommender_system_for_movies_spark.plans.registry import register
from cqu_bigdata_recommender_system_for_movies_spark.tables import RATINGS_SQL, load, ratings

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "rollup_nation_brand",
    oracle=f"""
    WITH ratings AS ({RATINGS_SQL})
    SELECT COALESCE(n_name, 'ALL') AS nation,
           COALESCE(p_brand, 'ALL') AS brand,
           COUNT(*) AS cnt,
           SUM(rating) AS sum_rating
    FROM ratings
    JOIN customer ON user_id = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN part ON item_id = p_partkey
    GROUP BY ROLLUP (n_name, p_brand)
    """,
    doc="ROLLUP over the star join: (nation, brand), (nation), () subtotal "
    "levels in one pass — partial aggregation keeps the shuffle small.",
)
def rollup_nation_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = ratings(spark, sf_dir)
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    part = load(spark, sf_dir, "part")
    return (
        r.join(F.broadcast(customer), r.user_id == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(part), r.item_id == part.p_partkey)
        .rollup("n_name", "p_brand")
        .agg(F.count("*").alias("cnt"), F.sum("rating").alias("sum_rating"))
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            F.coalesce("p_brand", F.lit("ALL")).alias("brand"),
            "cnt",
            "sum_rating",
        )
    )


@register(
    "pivot_event_type",
    oracle=f"""
    SELECT user_id,
           {", ".join(f"COUNT(*) FILTER (WHERE event_type = '{t}') AS {t}" for t in EVENT_TYPES)}
    FROM events
    GROUP BY user_id
    """,
    doc="Pivot: per-user event counts spread across one column per event "
    "type (explicit value list so the plan is a single-pass conditional "
    "aggregation, no distinct-values pre-scan).",
)
def pivot_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .count()
        .na.fill(0, subset=list(EVENT_TYPES))
    )
