"""Window functions, sessionization, and time-ordered joins (SURVEY.md §2.5
+ standard OLAP patterns the reference lacked but a complete engine needs).

All window queries shuffle once on the partition key and sort within
partitions — the plan shape that scales linearly with data per key. The
as-of join is the union-and-fill trick (no native as-of in Spark): tag both
sides, union, and take the last order row per user at or before each event
— one shuffle+sort, no range explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cqu_bigdata_recommender_system_for_movies_spark.plans.registry import register
from cqu_bigdata_recommender_system_for_movies_spark.session import shuffle_partitions
from cqu_bigdata_recommender_system_for_movies_spark.tables import load

SESSION_GAP_MIN = 30


@register(
    "window_functions_suite",
    oracle="""
    SELECT event_id, user_id, value,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER (PARTITION BY user_id ORDER BY event_type) AS type_rank,
           ROUND(LAG(value, 1, 0.0) OVER w, 4) AS prev_value,
           ROUND(SUM(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_sum
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="§2.5 window-function suite: row_number, rank, lag-with-default, and "
    "a running sum per user in event-time order — one shuffle serves all "
    "four frames.",
)
def window_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_rank = Window.partitionBy("user_id").orderBy("event_type")
    w_sum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w_rank).alias("type_rank"),
        F.round(F.lag("value", 1, 0.0).over(w), 4).alias("prev_value"),
        F.round(F.sum("value").over(w_sum), 4).alias("running_sum"),
    )


@register(
    "sessionize_events",
    oracle=f"""
    WITH gaps AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                         <= {SESSION_GAP_MIN} * 60 * 1000000
                    THEN 0 ELSE 1 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts, event_id,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS session_id
        FROM gaps
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start
    FROM sessions
    GROUP BY user_id, session_id
    """,
    doc="Sessionization: lag(ts) + gap>30min flag + cumulative sum = session "
    "id, then per-session rollup. The batch twin of streaming "
    "session_window — standard behavioral-analytics operator.",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000  # microsecond precision, not
    # unix_timestamp (seconds) — DuckDB's interval comparison is exact
    events = load(spark, sf_dir, "events")
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) <= gap_us,
            0,
        )
        .otherwise(1)
        .alias("new_session"),
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(w_run))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
    )


@register(
    "asof_join_last_order",
    oracle="""
    WITH o1 AS (  -- one order per (custkey, date): keep the max orderkey
        SELECT o_custkey, o_orderdate, o_totalprice
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC
            ) AS rn FROM orders
        ) WHERE rn = 1
    )
    SELECT e.event_id, e.user_id,
           strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS last_order_date,
           o.o_totalprice AS last_order_price
    FROM events e
    ASOF LEFT JOIN o1 o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    doc="As-of join (Spark has no native one): each event enriched with the "
    "user's most recent order at-or-before the event time. Implemented as "
    "tagged union + last_value(ignore nulls) over a per-user time sort — "
    "one shuffle, no range cross-product; DuckDB oracle uses native "
    "ASOF JOIN.",
)
def asof_join_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w_dedup = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.desc("o_orderkey")
    )
    orders = (
        load(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
    )
    left = events.select(
        F.col("user_id").alias("uid"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
        F.lit(None).cast("timestamp").alias("o_date"),
        F.lit(None).cast("double").alias("o_price"),
    )
    right = orders.select(
        F.col("o_custkey").alias("uid"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderdate").alias("o_date"),
        F.col("o_totalprice").alias("o_price"),
    )
    # orders sort before events at identical t (is_event asc) => '>=' semantics
    w = (
        Window.partitionBy("uid")
        .orderBy("t", "is_event")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = left.unionByName(right).select(
        "uid",
        "event_id",
        "is_event",
        F.last("o_date", ignorenulls=True).over(w).alias("last_o_date"),
        F.last("o_price", ignorenulls=True).over(w).alias("last_o_price"),
    )
    return merged.filter(F.col("is_event") == 1).select(
        "event_id",
        F.col("uid").alias("user_id"),
        F.date_format("last_o_date", "yyyy-MM-dd HH:mm:ss").alias("last_order_date"),
        F.col("last_o_price").alias("last_order_price"),
    )


RANGE_DAYS = 3  # events within [shifted order date, + 3 days)

_DAY_US = 86_400 * 1_000_000

# Orders span 1995-2001 while events span a single 2024 month, so a raw
# date band join matches 0 rows at every scale factor (VERDICT r6 #2 —
# both band joins were vacuously green). Fold the order timeline onto the
# events epoch deterministically: shifted(o) = e_min_day +
# (days(o_orderdate - min order date) MOD events-span-days). The anchor is
# a 1-row aggregate computed from the data itself (no wall clock), cross
# joined as a broadcast scalar — identical expression in the DuckDB
# oracle, so both engines shift identically at every sf.
_ANCHOR_CTE = """
    anchor AS (
        SELECT (SELECT MIN(o_orderdate) FROM orders) AS o_min,
               (SELECT date_trunc('day', MIN(ts)) FROM events) AS e_min,
               -- GREATEST(.., 1): if events ever span a single day, span_d=0
               -- would make Spark's % return NULL (silently empty join) while
               -- DuckDB's % errors — asymmetric failure modes (ADVICE r7).
               -- The guard folds everything onto e_min instead, identically
               -- on both sides.
               (SELECT GREATEST(date_diff('day', date_trunc('day', MIN(ts)),
                                          date_trunc('day', MAX(ts))), 1)
                  FROM events) AS span_d
    )"""


def _epoch_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row anchor (e_min_us, o_min_d, span_d) folding orders onto the
    events epoch; broadcast by callers, never collected to the driver."""
    events = load(spark, sf_dir, "events")
    orders = load(spark, sf_dir, "orders")
    e = events.agg(
        F.unix_micros(F.date_trunc("day", F.min(F.col("ts")))).alias("e_min_us"),
        # greatest(.., 1) mirrors the oracle's GREATEST guard: single-day
        # events would give span_d=0 and a NULL modulus (ADVICE r7).
        F.greatest(
            F.datediff(F.to_date(F.max("ts")), F.to_date(F.min("ts"))), F.lit(1)
        ).alias("span_d"),
    )
    o = orders.agg(F.min(F.to_date("o_orderdate")).alias("o_min_d"))
    return e.crossJoin(o)


def _shifted_order_start_us() -> F.Column:
    """Shifted order start in UTC micros; requires the anchor columns and
    o_orderdate in scope. Midnight-aligned by construction."""
    off_days = F.datediff(F.to_date("o_orderdate"), F.col("o_min_d")) % F.col(
        "span_d"
    )
    return (F.col("e_min_us") + off_days.cast("long") * F.lit(_DAY_US)).alias(
        "o_start_us"
    )


@register(
    "range_join_events_orders",
    oracle=f"""
    WITH {_ANCHOR_CTE},
    shifted AS (
        SELECT o.o_orderkey, o.o_custkey,
               a.e_min + (date_diff('day', a.o_min, o.o_orderdate) % a.span_d)
                   * (INTERVAL 1 DAY) AS o_ts
        FROM orders o CROSS JOIN anchor a
    )
    SELECT o.o_orderkey, COUNT(*) AS n_events,
           ROUND(SUM(e.value), 4) AS sum_value
    FROM shifted o
    JOIN events e
      ON e.user_id = o.o_custkey
     AND e.ts >= o.o_ts
     AND e.ts < o.o_ts + {RANGE_DAYS} * (INTERVAL 1 DAY)
    GROUP BY o.o_orderkey
    """,
    doc="Range (band) join — an operator Spark lacks natively: events within "
    "[shifted order date, + 3 days) per order, the order timeline folded "
    "onto the events epoch by a broadcast 1-row anchor (see _ANCHOR_CTE; "
    "~9.2k matched rows at sf0.01, non-vacuous per VERDICT r6 #2). A naive "
    "inequality join is a per-user nested loop (quadratic on active "
    "users); here each event keys on its UTC day bucket and each order "
    "explodes to its 3 candidate day buckets, so the physical plan is an "
    "EQUI-join on (user, bucket) followed by the exact range filter — "
    "shuffle-bounded, skew-safe, the standard band-join decomposition. "
    "DuckDB oracle is the plain inequality join over the same shift.",
)
def range_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events").select(
        F.col("user_id"),
        F.unix_micros("ts").alias("ts_us"),
        "value",
        (F.unix_micros("ts") / _DAY_US).cast("long").alias("bucket"),
    )
    orders = (
        load(spark, sf_dir, "orders")
        .crossJoin(F.broadcast(_epoch_anchor(spark, sf_dir)))
        .select(
            "o_orderkey",
            F.col("o_custkey").alias("user_id"),
            _shifted_order_start_us(),
        )
        .select(
            "o_orderkey",
            "user_id",
            "o_start_us",
            # o_start_us is midnight-aligned, so the half-open 3-day band
            # covers exactly buckets [b, b+2] — 3 candidates per order
            F.explode(
                F.sequence(
                    (F.col("o_start_us") / _DAY_US).cast("long"),
                    (
                        (F.col("o_start_us") + (RANGE_DAYS * _DAY_US - 1)) / _DAY_US
                    ).cast("long"),
                )
            ).alias("bucket"),
        )
    )
    joined = orders.join(events, ["user_id", "bucket"]).filter(
        (F.col("ts_us") >= F.col("o_start_us"))
        & (F.col("ts_us") < F.col("o_start_us") + RANGE_DAYS * _DAY_US)
    )
    return joined.groupBy("o_orderkey").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


GAP_FILL_MIN_VALUE = 100.0


@register(
    "gap_fill_forward",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               -- MAX, not AVG: no accumulation or division, so the double is
               -- bit-identical across engines and needs no rounding at all
               MAX(value) AS day_max
        FROM events WHERE value > {GAP_FILL_MIN_VALUE}
        GROUP BY 1, 2
    ),
    bounds AS (
        SELECT date_trunc('day', MIN(ts)) AS lo, date_trunc('day', MAX(ts)) AS hi
        FROM events
    ),
    spine AS (
        SELECT t.event_type, d.day
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
            FROM bounds
        ) d
    )
    SELECT s.event_type, s.day,
           last_value(daily.day_max IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value,
           CAST(daily.day_max IS NULL AS BOOLEAN) AS was_gap
    FROM spine s
    LEFT JOIN daily ON s.event_type = daily.event_type AND s.day = daily.day
    """,
    doc="Time-series gap fill with forward fill (beyond the reference): "
    "daily max of high-value events per type, joined to a complete "
    "(type x day) date spine, missing days carried forward via "
    "last_value-ignore-nulls — the standard resample-and-ffill. The spine "
    "is generated from a broadcast 1-row bounds aggregate (never a "
    "driver-side date loop); the fill is one window per type partition.",
)
def gap_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    daily = (
        events.filter(F.col("value") > GAP_FILL_MIN_VALUE)
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.max("value").alias("day_max"))
    )
    bounds = events.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    )
    days = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    types = events.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(days))
    joined = spine.join(daily, ["event_type", "day"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "event_type",
        "day",
        F.last("day_max", ignorenulls=True).over(w).alias("filled_value"),
        F.col("day_max").isNull().alias("was_gap"),
    )


ATTRIBUTION_WINDOW_US = 86_400_000_000  # 1 day in microseconds


@register(
    "last_touch_attribution",
    oracle=f"""
    WITH tagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN event_type IN ('click', 'view')
                    THEN event_id END AS touch_id,
               CASE WHEN event_type IN ('click', 'view')
                    THEN ts END AS touch_ts
        FROM events WHERE event_type IN ('click', 'view', 'purchase')
    ),
    w AS (
        SELECT *,
               LAST_VALUE(touch_id IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS last_touch_id,
               LAST_VALUE(touch_ts IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS last_touch_ts
        FROM tagged
    )
    SELECT event_id AS purchase_id, user_id, last_touch_id,
           epoch_us(ts) - epoch_us(last_touch_ts) AS micros_since_touch
    FROM w
    WHERE event_type = 'purchase' AND last_touch_ts IS NOT NULL
      AND epoch_us(ts) - epoch_us(last_touch_ts) <= {ATTRIBUTION_WINDOW_US}
    """,
    doc="Last-touch attribution: each purchase credited to the user's most "
    "recent click/view within a 1-day lookback — the classic marketing "
    "attribution query, built exactly like the as-of join (tagged single "
    "stream + last_value-ignore-nulls over a per-user time sort): one "
    "shuffle on user_id, no range cross-product, micros arithmetic kept "
    "integer-exact for the oracle.",
)
def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    is_touch = F.col("event_type").isin("click", "view")
    tagged = events.filter(
        F.col("event_type").isin("click", "view", "purchase")
    ).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(is_touch, F.col("event_id")).alias("touch_id"),
        F.when(is_touch, F.col("ts")).alias("touch_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    enriched = tagged.select(
        "*",
        F.last("touch_id", ignorenulls=True).over(w).alias("last_touch_id"),
        F.last("touch_ts", ignorenulls=True).over(w).alias("last_touch_ts"),
    )
    gap = F.unix_micros("ts") - F.unix_micros("last_touch_ts")
    return (
        enriched.filter(
            (F.col("event_type") == "purchase")
            & F.col("last_touch_ts").isNotNull()
            & (gap <= ATTRIBUTION_WINDOW_US)
        )
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "last_touch_id",
            gap.alias("micros_since_touch"),
        )
    )


@register(
    "ohlc_resample",
    oracle="""
    WITH e AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket, value,
               ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                  ORDER BY ts, event_id) AS rn_first,
               ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn_last
        FROM events
    )
    SELECT event_type, bucket,
           ROUND(MAX(CASE WHEN rn_first = 1 THEN value END), 4) AS open,
           ROUND(MAX(value), 4) AS high,
           ROUND(MIN(value), 4) AS low,
           ROUND(MAX(CASE WHEN rn_last = 1 THEN value END), 4) AS close,
           COUNT(*) AS volume
    FROM e GROUP BY event_type, bucket
    """,
    doc="Time-series downsample: per (event_type, hour) OHLC bars — the "
    "classic resample a metrics/market pipeline runs before charting or "
    "feature extraction. open/close are min_by/max_by on the (ts, "
    "event_id) struct — single-pass aggregates with map-side partial "
    "combine, so the shuffle carries one bar per group, not the raw "
    "ticks (the oracle's window-function formulation would sort the "
    "whole fact table; the agg form is the 100 TB plan). Tie-break on "
    "event_id makes first/last well-defined under equal timestamps.",
)
def ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    order_key = F.struct("ts", "event_id")
    return (
        events.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.round(F.min_by("value", order_key), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", order_key), 4).alias("close"),
            F.count("*").alias("volume"),
        )
    )


@register(
    "scd2_priority_history",
    oracle="""
    WITH runs AS (
        SELECT o_custkey AS user_id, o_orderpriority AS priority,
               o_orderdate, o_orderkey,
               CASE WHEN LAG(o_orderpriority) OVER w IS DISTINCT FROM o_orderpriority
                    THEN 1 ELSE 0 END AS is_start
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    grouped AS (
        SELECT user_id, priority, o_orderdate,
               SUM(is_start) OVER (PARTITION BY user_id
                                   ORDER BY o_orderdate, o_orderkey) AS grp
        FROM runs
    ),
    islands AS (
        SELECT user_id, priority, grp,
               MIN(o_orderdate) AS valid_from,
               COUNT(*) AS n_orders
        FROM grouped GROUP BY user_id, priority, grp
    )
    SELECT user_id, priority, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY grp) AS valid_to,
           CAST(grp AS INTEGER) AS version,
           n_orders
    FROM islands
    """,
    doc="SCD Type-2 dimension build (change-data-capture compaction): "
    "collapse each customer's order-priority timeline into "
    "[valid_from, valid_to) versioned runs via gaps-and-islands — LAG "
    "marks run starts, a running SUM numbers them, one aggregate per "
    "run, LEAD closes each interval (NULL = current). Every window and "
    "the aggregate partition on the same key (user_id), so the whole "
    "history build is ONE shuffle of the orders table; at 100 TB this "
    "is the standard nightly dimension-compaction job shape.",
)
def scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Rename BEFORE the first window: aliasing the partition key between
    # two windows broke partitioning propagation and cost a second
    # full-table Exchange (caught by the plan test below).
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderpriority").alias("priority"),
        "o_orderdate",
        "o_orderkey",
    )
    w = Window.partitionBy("user_id").orderBy("o_orderdate", "o_orderkey")
    runs = orders.select(
        "user_id",
        "priority",
        "o_orderdate",
        "o_orderkey",
        F.when(~F.lag("priority").over(w).eqNullSafe(F.col("priority")), 1)
        .otherwise(0)
        .alias("is_start"),
    )
    wg = Window.partitionBy("user_id").orderBy("o_orderdate", "o_orderkey")
    grouped = runs.withColumn("grp", F.sum("is_start").over(wg))
    islands = grouped.groupBy("user_id", "priority", "grp").agg(
        F.min("o_orderdate").alias("valid_from"),
        F.count("*").alias("n_orders"),
    )
    wv = Window.partitionBy("user_id").orderBy("grp")
    return islands.select(
        "user_id",
        "priority",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        F.col("grp").cast("int").alias("version"),
        "n_orders",
    )


@register(
    "gap_fill_linear",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               MAX(value) AS day_max
        FROM events WHERE value > {GAP_FILL_MIN_VALUE}
        GROUP BY event_type, date_trunc('day', ts)
    ),
    bounds AS (
        SELECT date_trunc('day', MIN(ts)) AS lo, date_trunc('day', MAX(ts)) AS hi
        FROM events
    ),
    spine AS (
        SELECT t.event_type, d.day
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
                    FROM bounds) d
    ),
    joined AS (
        SELECT s.event_type, s.day,
               CAST(epoch(s.day) AS BIGINT) // 86400 AS di,
               daily.day_max
        FROM spine s LEFT JOIN daily
          ON s.event_type = daily.event_type AND s.day = daily.day
    ),
    ctx AS (
        SELECT event_type, day, di, day_max,
               last_value(day_max IGNORE NULLS) OVER wp AS prev_v,
               last_value(CASE WHEN day_max IS NOT NULL THEN di END IGNORE NULLS)
                   OVER wp AS prev_d,
               first_value(day_max IGNORE NULLS) OVER wn AS next_v,
               first_value(CASE WHEN day_max IS NOT NULL THEN di END IGNORE NULLS)
                   OVER wn AS next_d
        FROM joined
        WINDOW wp AS (PARTITION BY event_type ORDER BY di
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wn AS (PARTITION BY event_type ORDER BY di
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, day,
           ROUND(CASE
               WHEN prev_v IS NULL THEN next_v
               WHEN next_v IS NULL THEN prev_v
               WHEN next_d = prev_d THEN prev_v
               ELSE prev_v + (next_v - prev_v)
                             * (di - prev_d) / (next_d - prev_d)
           END, 4) AS filled_value,
           day_max IS NULL AS was_gap
    FROM ctx
    """,
    doc="Linear-interpolation gap fill — the numeric sibling of "
    "gap_fill_forward's LOCF: missing (event_type, day) points on the "
    "dense spine take prev + (next-prev) * elapsed_fraction between "
    "the surrounding observed days, falling back to the known side at "
    "series edges. Both directional contexts come from the SAME "
    "partition key (one shuffle, two window passes over it); day "
    "arithmetic uses integer epoch-day ids so the interpolation "
    "fraction is engine-portable. This is the standard sensor/metric "
    "regularization step before resampling or model features.",
)
def gap_fill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    daily = (
        events.filter(F.col("value") > GAP_FILL_MIN_VALUE)
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.max("value").alias("day_max"))
    )
    bounds = events.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    )
    days = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    types = events.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(days))
    joined = spine.join(daily, ["event_type", "day"], "left").withColumn(
        "di", (F.unix_micros("day") / F.lit(86_400_000_000)).cast("long")
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("di")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("di")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    known_di = F.when(F.col("day_max").isNotNull(), F.col("di"))
    ctx = joined.select(
        "event_type",
        "day",
        "di",
        "day_max",
        F.last("day_max", ignorenulls=True).over(wp).alias("prev_v"),
        F.last(known_di, ignorenulls=True).over(wp).alias("prev_d"),
        F.first("day_max", ignorenulls=True).over(wn).alias("next_v"),
        F.first(known_di, ignorenulls=True).over(wn).alias("next_d"),
    )
    filled = (
        F.when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .when(F.col("next_d") == F.col("prev_d"), F.col("prev_v"))
        .otherwise(
            F.col("prev_v")
            + (F.col("next_v") - F.col("prev_v"))
            * (F.col("di") - F.col("prev_d"))
            / (F.col("next_d") - F.col("prev_d"))
        )
    )
    return ctx.select(
        "event_type",
        "day",
        F.round(filled, 4).alias("filled_value"),
        F.col("day_max").isNull().alias("was_gap"),
    )


EWMA_ALPHA = 0.1


@register(
    "ewma_by_type",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day, AVG(value) AS v
        FROM events GROUP BY event_type, date_trunc('day', ts)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(list_reduce(list(v ORDER BY day),
                             (acc, x) -> acc * {1 - EWMA_ALPHA} + x * {EWMA_ALPHA}),
                 6) AS ewma
    FROM daily GROUP BY event_type
    """,
    doc="Exponentially weighted moving average per series — a RECURRENCE "
    "(s_t = 0.9*s_(t-1) + 0.1*x_t, seeded with x_0) that no window "
    "frame expresses: the series aggregates to daily means first (one "
    "shuffle, map-side combine), each series' bounded day-count array "
    "is assembled in order, and the recurrence runs as an in-row "
    "functional fold (F.aggregate — JVM codegen, no UDF). Fold order "
    "is ascending in both engines, so the result is exact, not "
    "approximate. The bounded-array assumption is explicit: the array "
    "is days-per-series sized, never event-sized — the same contract "
    "as sequence packing.",
)
def ewma_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.avg("value").alias("v"))
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "v"))), lambda s: s.v
        ).alias("vals"),
        F.count("*").alias("n_days"),
    )
    ewma = F.aggregate(
        F.expr("slice(vals, 2, size(vals) - 1)"),
        F.element_at("vals", 1),
        lambda acc, x: acc * (1 - EWMA_ALPHA) + x * EWMA_ALPHA,
    )
    return series.select("event_type", "n_days", F.round(ewma, 6).alias("ewma"))


OVERLAP_ORDER_DAYS = 3  # order activity window: [o_orderdate, +3 days)


@register(
    "interval_overlap_join",
    oracle=f"""
    WITH sess AS (
        SELECT user_id,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS session_id,
               ts
        FROM (
            SELECT user_id, ts, event_id,
                   CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                             (PARTITION BY user_id ORDER BY ts, event_id)
                             <= {SESSION_GAP_MIN} * 60 * 1000000
                        THEN 0 ELSE 1 END AS new_session
            FROM events
        )
    ),
    spans AS (
        SELECT user_id, session_id,
               MIN(ts) AS s_start, MAX(ts) AS s_end
        FROM sess GROUP BY user_id, session_id
    ),
    {_ANCHOR_CTE},
    shifted AS (
        SELECT o.o_orderkey, o.o_custkey,
               a.e_min + (date_diff('day', a.o_min, o.o_orderdate) % a.span_d)
                   * (INTERVAL 1 DAY) AS o_start
        FROM orders o CROSS JOIN anchor a
    )
    SELECT o.o_orderkey, s.user_id, s.session_id
    FROM shifted o JOIN spans s
      ON o.o_custkey = s.user_id
     AND o.o_start < s.s_end
     AND s.s_start < o.o_start + {OVERLAP_ORDER_DAYS} * (INTERVAL 1 DAY)
    """,
    doc="Interval-overlap join (interval × interval, one step past the "
    "point-in-range band join): order activity windows "
    f"[shifted order date, +{OVERLAP_ORDER_DAYS}d) against user session "
    "spans [first_event, last_event], overlapping when each starts before "
    "the other ends. The order timeline folds onto the events epoch via "
    "the same broadcast 1-row anchor as range_join_events_orders "
    "(non-vacuous per VERDICT r6 #2 — previously 0 matches at every sf). "
    "Plan: both interval sets explode to their covered UTC-day buckets "
    "(orders: 3 buckets; sessions: span-dependent, typically 1-2), "
    "equi-join on (user, day), dedup the multi-bucket double-hits, and "
    "re-verify the exact predicate — the bucketed interval-join shape "
    "that replaces the quadratic per-user nested loop a raw inequality "
    "join plans. Session spans derive from the same 30-min-gap "
    "sessionization as sessionize_events (one user_id shuffle).",
)
def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) <= gap_us, 0
        )
        .otherwise(1)
        .alias("new_session"),
    )
    spans = (
        flagged.withColumn("session_id", F.sum("new_session").over(w_run))
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    day_us = _DAY_US
    orders = (
        load(spark, sf_dir, "orders")
        .crossJoin(F.broadcast(_epoch_anchor(spark, sf_dir)))
        .select(
            "o_orderkey",
            F.col("o_custkey").alias("user_id"),
            _shifted_order_start_us(),
        )
        .select(
            "o_orderkey",
            "user_id",
            "o_start_us",
            (F.col("o_start_us") + OVERLAP_ORDER_DAYS * day_us).alias("o_end_us"),
        )
    )
    # explode each interval to covered day buckets; end is exclusive, but
    # MAX ts is inclusive — cover the end bucket on the session side
    o_b = orders.select(
        "*",
        F.explode(
            F.sequence(
                (F.col("o_start_us") / day_us).cast("long"),
                ((F.col("o_end_us") - 1) / day_us).cast("long"),
            )
        ).alias("day_b"),
    )
    s_b = spans.select(
        F.col("user_id").alias("s_user"),
        "session_id",
        F.unix_micros("s_start").alias("s_start_us"),
        F.unix_micros("s_end").alias("s_end_us"),
    ).select(
        "*",
        F.explode(
            F.sequence(
                (F.col("s_start_us") / day_us).cast("long"),
                (F.col("s_end_us") / day_us).cast("long"),
            )
        ).alias("day_b"),
    )
    pairs = (
        o_b.join(s_b, (o_b.user_id == s_b.s_user) & (o_b.day_b == s_b.day_b))
        .filter(
            (F.col("o_start_us") < F.col("s_end_us"))
            & (F.col("s_start_us") < F.col("o_end_us"))
        )
        .select("o_orderkey", "user_id", "session_id")
        .distinct()
    )
    return pairs


# ---------------------------------------------------------------------------
# Markov event-transition model
# ---------------------------------------------------------------------------


@register(
    "event_transition_probs",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    ),
    cnt AS (
        SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           ROUND(n / SUM(n) OVER (PARTITION BY from_type), 6) AS p
    FROM cnt
    """,
    doc="First-order Markov transition model over per-user event "
    "sequences: LEAD within each user's time-ordered stream pairs every "
    "event with its successor, one aggregation counts (from, to) edges, "
    "and row-normalizing per from-state yields the transition matrix -- "
    "the classic next-action baseline and the sanity check run against "
    "any sequence model's training data. One shuffle on user_id for the "
    "window (bounded per-user state), one on the 5x5 edge key; the "
    "output is vocabulary-squared, independent of input size.",
)
def event_transition_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    cnt = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    w_from = Window.partitionBy("from_type")
    return cnt.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(w_from), 6).alias("p"),
    )


FREQUENT_PATH_K = 20


@register(
    "frequent_event_paths",
    oracle=f"""
    WITH seq AS (
        SELECT event_type AS e1,
               LEAD(event_type, 1) OVER w AS e2,
               LEAD(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    paths AS (
        SELECT e1 || '>' || e2 || '>' || e3 AS path, COUNT(*) AS n
        FROM seq WHERE e3 IS NOT NULL
        GROUP BY 1
    )
    SELECT path, n
    FROM paths
    ORDER BY n DESC, path
    LIMIT {FREQUENT_PATH_K}
    """,
    doc="Frequent 3-step behavior paths: two LEADs over each user's "
    "time-ordered stream emit every consecutive event-type trigram, one "
    "aggregation counts them, top-k survives -- sequential pattern "
    "mining's workhorse query (the length-3 special case of GSP) and "
    "the qualitative companion to event_transition_probs' matrix. The "
    "path vocabulary is |types|^3, so the count shuffle and the top-k "
    "are both tiny regardless of input; the user window is the same "
    "single user_id shuffle every sequence feature here shares.",
)
def frequent_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.filter(F.col("e3").isNotNull())
        .select(F.concat_ws(">", "e1", "e2", "e3").alias("path"))
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(FREQUENT_PATH_K)
    )


_SCD2_SQL = """
    runs AS (
        SELECT o_custkey AS user_id, o_orderpriority AS priority,
               o_orderdate, o_orderkey,
               CASE WHEN LAG(o_orderpriority) OVER w IS DISTINCT FROM o_orderpriority
                    THEN 1 ELSE 0 END AS is_start
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    grouped AS (
        SELECT user_id, priority, o_orderdate,
               SUM(is_start) OVER (PARTITION BY user_id
                                   ORDER BY o_orderdate, o_orderkey) AS grp
        FROM runs
    ),
    islands AS (
        SELECT user_id, priority, grp, MIN(o_orderdate) AS valid_from
        FROM grouped GROUP BY user_id, priority, grp
    ),
    scd2 AS (
        SELECT user_id, priority, valid_from,
               LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY grp)
                   AS valid_to,
               CAST(grp AS INTEGER) AS version
        FROM islands
    )
"""


@register(
    "scd2_point_in_time_join",
    oracle=f"""
    WITH {_SCD2_SQL}
    SELECT s.version, s.priority,
           COUNT(*) AS n_events,
           MIN(e.event_id) AS first_event_id
    FROM events e
    JOIN scd2 s
      ON e.user_id = s.user_id
     AND e.ts >= s.valid_from
     AND (s.valid_to IS NULL OR e.ts < s.valid_to)
    GROUP BY s.version, s.priority
    """,
    doc="Point-in-time (AS OF event time) join against the SCD Type-2 "
    "dimension built by scd2_priority_history: each event matches the "
    "version whose [valid_from, valid_to) interval covers its "
    "timestamp -- THE correctness-critical warehouse join (training "
    "labels must see the dimension AS IT WAS, not as it is; joining "
    "the current row leaks the future). The interval predicate rides "
    "an EQUI join on user_id, so the shuffle is the ordinary user "
    "keyed exchange and the inequality only filters within each "
    "user's handful of versions -- never a cross product. Rolled up "
    "per version for the oracle hash.",
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rebuild the SCD2 intervals (same plan as scd2_priority_history)
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderpriority").alias("priority"),
        "o_orderdate",
        "o_orderkey",
    )
    w = Window.partitionBy("user_id").orderBy("o_orderdate", "o_orderkey")
    runs = orders.select(
        "user_id",
        "priority",
        "o_orderdate",
        "o_orderkey",
        F.when(~F.lag("priority").over(w).eqNullSafe(F.col("priority")), 1)
        .otherwise(0)
        .alias("is_start"),
    )
    grouped = runs.withColumn("grp", F.sum("is_start").over(w))
    islands = grouped.groupBy("user_id", "priority", "grp").agg(
        F.min("o_orderdate").alias("valid_from")
    )
    scd2 = islands.select(
        "user_id",
        "priority",
        "valid_from",
        F.lead("valid_from")
        .over(Window.partitionBy("user_id").orderBy("grp"))
        .alias("valid_to"),
        F.col("grp").cast("int").alias("version"),
    )
    events = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    joined = events.join(
        scd2,
        (events.user_id == scd2.user_id)
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
    )
    return joined.groupBy("version", "priority").agg(
        F.count("*").alias("n_events"),
        F.min("event_id").alias("first_event_id"),
    )


@register(
    "asof_join_next_order",
    oracle="""
    WITH o1 AS (  -- one order per (custkey, date): keep the min orderkey
        SELECT o_custkey, o_orderdate, o_totalprice
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey
            ) AS rn FROM orders
        ) WHERE rn = 1
    )
    SELECT e.event_id, e.user_id,
           strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS next_order_date,
           o.o_totalprice AS next_order_price
    FROM events e
    ASOF LEFT JOIN o1 o
      ON e.user_id = o.o_custkey AND e.ts < o.o_orderdate
    """,
    doc="FORWARD as-of join: each event enriched with the user's next "
    "order STRICTLY AFTER the event time -- the label-generation "
    "direction ('did a purchase follow this click, and for how much'), "
    "complementing asof_join_last_order's backward feature direction. "
    "Same tagged-union plan, mirrored: orders sort BEFORE events at "
    "equal timestamps (strict inequality excludes same-instant "
    "orders) and first_value(ignore nulls) scans the FOLLOWING frame. "
    "Still one user-keyed shuffle, no range cross-product; the DuckDB "
    "oracle uses native ASOF with the '<' comparator.",
)
def asof_join_next_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w_dedup = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        "o_orderkey"
    )
    orders = (
        load(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
    )
    left = events.select(
        F.col("user_id").alias("uid"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
        F.lit(None).cast("timestamp").alias("o_date"),
        F.lit(None).cast("double").alias("o_price"),
    )
    right = orders.select(
        F.col("o_custkey").alias("uid"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderdate").alias("o_date"),
        F.col("o_totalprice").alias("o_price"),
    )
    # orders sort BEFORE events at identical t (is_event asc), so the
    # strictly-following frame of an event row skips same-instant orders
    w = (
        Window.partitionBy("uid")
        .orderBy("t", "is_event")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    tagged = left.unionByName(right)
    filled = tagged.select(
        "*",
        F.first("o_date", ignorenulls=True).over(w).alias("next_date"),
        F.first("o_price", ignorenulls=True).over(w).alias("next_price"),
    )
    return (
        filled.filter(F.col("is_event") == 1)
        .select(
            "event_id",
            F.col("uid").alias("user_id"),
            F.col("next_date").cast("string").alias("next_order_date"),
            F.col("next_price").alias("next_order_price"),
        )
    )


# --- Distributed global row_number ------------------------------------------


def global_row_number(
    df: DataFrame, order_cols, out_col: str = "rn", num_partitions: int | None = None
) -> DataFrame:
    """Scalable `ROW_NUMBER() OVER (ORDER BY ...)` — no single-partition sort.

    An ORDER BY window with no PARTITION BY moves every row to ONE
    partition (`WARN WindowExec: No Partition Defined`); WindowExec does
    NOT range-partition the way a global orderBy does. This helper is the
    distributed twin (the classic "scalable zipWithIndex"):

    1. `repartitionByRange` on the sort keys — the same sampling-based
       range partitioner a global `orderBy` uses, so partition i's rows
       all precede partition i+1's in the total order;
    2. pin the partition assignment with an eager `localCheckpoint` so
       the counts job and the ranking job see identical placement;
    3. rank locally per partition (`Window.partitionBy(pid)` — balanced
       by the range sampler, never a single reducer);
    4. add each partition's exclusive prefix-sum offset, computed from a
       partition-count collect (one row per partition — driver work is
       O(num_partitions), independent of data size).

    Output is identical to the unpartitioned-window formulation: range
    partitioning preserves the global order across partitions, so
    `offset[pid] + local_rank` IS the global rank.
    """
    spark = df.sparkSession
    n = num_partitions or shuffle_partitions(spark)
    pinned = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r["__pid"]: r["c"]
        for r in pinned.groupBy("__pid").agg(F.count("*").alias("c")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off = F.element_at(
        F.create_map(*[F.lit(x) for kv in sorted(offsets.items()) for x in kv]),
        F.col("__pid"),
    )
    w_local = Window.partitionBy("__pid").orderBy(*order_cols)
    return pinned.withColumn(
        out_col, (F.row_number().over(w_local) + off).cast("long")
    ).drop("__pid")
