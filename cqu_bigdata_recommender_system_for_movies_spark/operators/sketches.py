"""Mergeable-sketch aggregates: DataSketches HLL distinct rollups and
frequent-items (approx_top_k) heavy hitters.

These are the 100 TB substitutes for exact COUNT(DISTINCT) / exact top-k:
a sketch is built once per group with map-side partial aggregation, is
tiny (KBs) regardless of input size, and — critically — RE-AGGREGATES:
``hll_union_agg`` merges already-built group sketches into coarser
rollup levels without touching the raw data again. That is the property
an exact distinct count does not have (distinct counts don't add), and
it is why production pipelines persist sketch columns in their rollup
tables. The reference has no sketch surface; SURVEY.md §2 lists this
under the beyond-reference pipeline extensions.

Correctness note (why these can still be oracle-checked exactly): a
DataSketches HLL sketch stores raw coupon hashes until the set outgrows
its exact mode, so at the verified scale factors (≤ sf0.1, ≤ 15k distinct
users; checked empirically at lgK=14 across sf0.001/0.01/0.1) the
estimate equals the exact count. The frequent-items sketch is exact while
no eviction occurs, i.e. while maxItemsTracked exceeds the number of
distinct keys. Both caps are asserted in tests/test_sketches.py so a
testdata change that breaks the exact-mode assumption fails loudly
instead of silently flipping a driver row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cqu_bigdata_recommender_system_for_movies_spark.plans.registry import register
from cqu_bigdata_recommender_system_for_movies_spark.tables import load

# lgConfigK=14 → 16 KiB dense sketch, ±0.41% relative error at scale; in
# exact (coupon) mode well past the distinct-user cardinality of every
# test scale factor.
HLL_LG_K = 14

# Frequent-items capacity: must exceed distinct l_partkey at the largest
# verified sf (20k at sf0.1) for the sketch to stay in exact mode.
TOPK_MAX_ITEMS_TRACKED = 65536
TOPK_K = 20


@register(
    "hll_distinct_rollup",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS approx_users,
           COUNT(*) AS n_events
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'ALL' AS event_type,
           COUNT(DISTINCT user_id) AS approx_users,
           COUNT(*) AS n_events
    FROM events
    """,
    doc="Mergeable distinct-count rollup: per-event_type distinct users "
    "via hll_sketch_agg, then the GRAND-TOTAL distinct derived by "
    "hll_union_agg over the five per-type sketches — the raw events "
    "are scanned exactly once, and the 'ALL' row re-aggregates KB-sized "
    "sketches, not data. This is the rollup-table pattern at 100 TB: "
    "persist the sketch column at the finest grain, merge upward for "
    "free. The oracle checks exact distinct counts — valid because the "
    "sketch is in exact coupon mode at test cardinalities (see module "
    "docstring); at production cardinality the same query returns "
    "±0.4% estimates.",
)
def hll_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    # Materialize the per-type sketch table (5 rows x 16 KiB): BOTH output
    # branches read it, and without the checkpoint each branch would
    # re-scan events and re-build the sketches — the exact re-aggregation
    # cost this operator exists to avoid. This is the in-session stand-in
    # for the persisted sketch column of a production rollup table.
    per_type = (
        events.groupBy("event_type")
        .agg(
            F.expr(f"hll_sketch_agg(user_id, {HLL_LG_K})").alias("sk"),
            F.count("*").alias("n_events"),
        )
        .localCheckpoint(eager=False)
    )
    # One grand-total row from MERGED sketches (no second scan of events).
    total = per_type.agg(
        F.lit("ALL").alias("event_type"),
        F.expr("hll_sketch_estimate(hll_union_agg(sk, false))").alias(
            "approx_users"
        ),
        F.sum("n_events").alias("n_events"),
    )
    per_type_est = per_type.select(
        "event_type",
        F.expr("hll_sketch_estimate(sk)").alias("approx_users"),
        "n_events",
    )
    return per_type_est.unionByName(total.select("event_type", "approx_users", "n_events"))


@register(
    "approx_topk_parts",
    oracle=f"""
    WITH counts AS (
        SELECT l_partkey AS item, COUNT(*) AS cnt
        FROM lineitem GROUP BY l_partkey
    ),
    boundary AS (
        SELECT cnt FROM counts ORDER BY cnt DESC LIMIT {TOPK_K}
    )
    SELECT item, cnt
    FROM counts
    WHERE cnt > (SELECT MIN(cnt) FROM boundary)
    """,
    doc="Sketch-based heavy hitters: approx_top_k over l_partkey builds a "
    "frequent-items sketch in one pass (map-side mergeable, no exact "
    "groupBy of the full key space on the reduce side). Determinism at "
    "the k-th boundary: the sketch breaks count-ties arbitrarily, so "
    "both sides drop items tied AT the boundary count (keep cnt > "
    "min(top-k cnt)) — the surviving set is engine-independent because "
    "the top-k COUNT MULTISET is unique even when the member set is "
    "not. Counts are exact while maxItemsTracked exceeds the distinct "
    "key count (asserted in tests); beyond that the same query "
    "degrades gracefully to sketch estimates.",
)
def approx_topk_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem")
    sketch = lineitem.agg(
        F.expr(
            f"approx_top_k(l_partkey, {TOPK_K}, {TOPK_MAX_ITEMS_TRACKED})"
        ).alias("tk")
    )
    # 20-row result of the one-pass sketch build; checkpointed because the
    # boundary subquery AND the final filter both read it (otherwise the
    # full lineitem sketch pass runs twice).
    exploded = (
        sketch.select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("item"), F.col("e.count").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    boundary = exploded.agg(F.min("cnt").alias("b"))
    return exploded.join(F.broadcast(boundary)).filter(F.col("cnt") > F.col("b")).select(
        "item", "cnt"
    )


SLIDE_WINDOW_HOURS = 3  # trailing window: hours (b-2, b-1, b)


@register(
    "hll_sliding_distinct",
    oracle="""
    WITH e AS (
        SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS h,
               user_id
        FROM events
    ),
    hrs AS (SELECT DISTINCT h FROM e)
    SELECT make_timestamp(CAST(b.h AS BIGINT) * 3600 * 1000000) AS bucket,
           COUNT(DISTINCT e.user_id) AS trailing_users,
           COUNT(DISTINCT e.h) AS window_hours
    FROM hrs b JOIN e ON e.h BETWEEN b.h - 2 AND b.h
    GROUP BY b.h
    """,
    doc="Sliding-window distinct count — the query exact COUNT(DISTINCT) "
    "cannot do incrementally: distinct users over each trailing 3-hour "
    "window, computed by building ONE HLL sketch per hour and merging "
    "each hour's sketch into the 3 windows it belongs to (map-side "
    "replicate by window offset, then hll_union_agg per target bucket) "
    "— the raw events are scanned once, and window width changes only "
    "the replication factor, never a rescan. The oracle's range "
    "self-join re-reads every event once per window it falls in — "
    "exactly the cost curve the sketch algebra flattens at 100 TB. "
    "window_hours counts the hours merged (boundary buckets < 3). "
    "Exact at test cardinalities (coupon mode, module docstring).",
)
def hll_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    # integer hour ids keep the window arithmetic engine-portable
    hourly = (
        events.select(
            (F.unix_micros(F.date_trunc("hour", "ts")) / F.lit(3_600_000_000))
            .cast("long")
            .alias("h"),
            "user_id",
        )
        .groupBy("h")
        .agg(F.expr(f"hll_sketch_agg(user_id, {HLL_LG_K})").alias("sk"))
        .localCheckpoint(eager=False)  # read by the replicate AND the bucket list
    )
    replicated = hourly.select(
        F.explode(F.sequence(F.col("h"), F.col("h") + (SLIDE_WINDOW_HOURS - 1))).alias(
            "tb"
        ),
        "sk",
    )
    merged = replicated.groupBy("tb").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk, false))").alias("trailing_users"),
        F.count("*").alias("window_hours"),
    )
    # trailing windows exist only for buckets that have their own data
    buckets = hourly.select(F.col("h").alias("tb"))
    return merged.join(F.broadcast(buckets), "tb").select(
        F.timestamp_micros(F.col("tb") * F.lit(3_600_000_000)).alias("bucket"),
        "trailing_users",
        "window_hours",
    )
