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
    "levels in one pass — partial aggregation keeps the shuffle small. "
    "Only nation keeps a broadcast hint (25 rows at EVERY scale factor); "
    "customer and part grow with sf, so their strategy is AQE's call "
    "(VERDICT r9 #1: a forced multi-GB broadcast at 100x is an "
    "executor-OOM where AQE would pick SMJ on its own).",
)
def rollup_nation_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = ratings(spark, sf_dir)
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    part = load(spark, sf_dir, "part")
    return (
        r.join(customer, r.user_id == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(part, r.item_id == part.p_partkey)
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


@register(
    "cube_lang_source",
    oracle="""
    SELECT COALESCE(lang, 'ALL') AS lang,
           COALESCE(source, 'ALL') AS source,
           COUNT(*) AS cnt,
           ROUND(AVG(n_chars), 4) AS avg_chars
    FROM documents
    GROUP BY CUBE (lang, source)
    """,
    doc="CUBE over document metadata: all four grouping sets "
    "((lang,source),(lang),(source),()) in one pass — the corpus-composition "
    "dashboard query for a training-data pipeline.",
)
def cube_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "documents")
        .cube("lang", "source")
        .agg(F.count("*").alias("cnt"), F.round(F.avg("n_chars"), 4).alias("avg_chars"))
        .select(
            F.coalesce("lang", F.lit("ALL")).alias("lang"),
            F.coalesce("source", F.lit("ALL")).alias("source"),
            "cnt",
            "avg_chars",
        )
    )


PCTS = (0.5, 0.9, 0.99)


@register(
    "percentile_stats",
    oracle=f"""
    SELECT event_type,
           {", ".join(f"ROUND(quantile_cont(value, {p}), 4) AS p{int(p * 100)}" for p in PCTS)}
    FROM events
    GROUP BY event_type
    """,
    doc="Exact interpolated percentiles (p50/p90/p99) per event type — "
    "Spark `percentile` and DuckDB `quantile_cont` share the linear-"
    "interpolation definition, so results match exactly. At 100 TB swap to "
    "approx_percentile (t-digest) — same plan shape, bounded memory.",
)
def percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    pct_arr = F.percentile("value", F.array(*[F.lit(p) for p in PCTS]))
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(pct_arr.alias("pcts"))
        .select(
            "event_type",
            *[
                F.round(F.element_at("pcts", i + 1), 4).alias(f"p{int(p * 100)}")
                for i, p in enumerate(PCTS)
            ],
        )
    )


@register(
    "date_functions_suite",
    oracle="""
    SELECT o_orderkey,
           EXTRACT(year FROM o_orderdate) AS yr,
           EXTRACT(month FROM o_orderdate) AS mon,
           EXTRACT(quarter FROM o_orderdate) AS qtr,
           CAST(isodow(o_orderdate) - 1 AS INTEGER) AS weekday_mon0,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           datediff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE))
               AS days_since_y24,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
               AS month_end
    FROM orders
    """,
    doc="Date/time function suite (beyond the reference, which kept raw "
    "epoch ints): extract fields, day arithmetic, month boundaries — all "
    "JVM column expressions, oracle-matched against DuckDB's calendar.",
)
def date_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mon"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.weekday("o_orderdate").cast("int").alias("weekday_mon0"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_date"),
        F.datediff(d, F.lit("2024-01-01").cast("date")).cast("long")
        .alias("days_since_y24"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
    )


@register(
    "string_functions_suite",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           substr(p_type, 1, 6) AS type_prefix,
           replace(p_name, ' ', '_') AS name_snake,
           strlen(p_name) AS name_len,
           reverse(p_brand) AS brand_rev,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           levenshtein(p_brand, substr(p_type, 1, 10)) AS brand_type_dist
    FROM part
    """,
    doc="String function suite: case, substring, replace, pad, reverse, "
    "Levenshtein distance — whole-stage-codegen column expressions matched "
    "against DuckDB.",
)
def string_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_type", 1, 6).alias("type_prefix"),
        F.replace("p_name", F.lit(" "), F.lit("_")).alias("name_snake"),
        F.length("p_name").cast("long").alias("name_len"),
        F.reverse("p_brand").alias("brand_rev"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.levenshtein(F.col("p_brand"), F.substring("p_type", 1, 10))
        .cast("long")
        .alias("brand_type_dist"),
    )


@register(
    "stats_agg_suite",
    oracle="""
    SELECT event_type,
           ROUND(corr(value, event_id % 97), 4) AS corr_vid,
           ROUND(covar_pop(value, event_id % 97), 4) AS covar_vid,
           ROUND(regr_slope(value, event_id % 97), 4) AS slope,
           ROUND(stddev_samp(value), 4) AS sd_value,
           ROUND(var_samp(value), 4) AS var_value
    FROM events
    GROUP BY event_type
    """,
    doc="Statistical aggregate suite (beyond the reference): Pearson "
    "correlation, population covariance, least-squares slope, stddev and "
    "variance per group — all single-pass partial-aggregable moments "
    "(one shuffle of 5 accumulator tuples per group, never a self-join). "
    "The x variable is a deterministic event_id hash so both engines see "
    "identical pairs.",
)
def stats_agg_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    x = (F.col("event_id") % 97).cast("double")
    return events.groupBy("event_type").agg(
        F.round(F.corr(F.col("value"), x), 4).alias("corr_vid"),
        F.round(F.covar_pop(F.col("value"), x), 4).alias("covar_vid"),
        F.round(F.regr_slope(F.col("value"), x), 4).alias("slope"),
        F.round(F.stddev_samp("value"), 4).alias("sd_value"),
        F.round(F.var_samp("value"), 4).alias("var_value"),
    )


@register(
    "full_outer_reconciliation",
    oracle="""
    WITH c AS (
        SELECT user_id, COUNT(*) AS n_clicks FROM events
        WHERE event_type = 'click' GROUP BY user_id
    ),
    p AS (
        SELECT user_id, COUNT(*) AS n_purchases FROM events
        WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT COALESCE(c.user_id, p.user_id) AS user_id,
           COALESCE(n_clicks, 0) AS n_clicks,
           COALESCE(n_purchases, 0) AS n_purchases
    FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
    """,
    doc="Full outer join (completes the join-type matrix): reconcile "
    "per-user click counts against purchase counts, keeping users present "
    "on either side only — the standard metrics-reconciliation shape. "
    "Both inputs pre-aggregate before the join, so the outer join shuffles "
    "one row per user per side, not raw events.",
)
def full_outer_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    c = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_clicks"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("p_user"))
        .agg(F.count("*").alias("n_purchases"))
    )
    return c.join(p, c.user_id == p.p_user, "full_outer").select(
        F.coalesce("user_id", "p_user").alias("user_id"),
        F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
        F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
    )


@register(
    "grouping_sets_suite",
    oracle="""
    SELECT COALESCE(lang, 'ALL') AS lang,
           COALESCE(source, 'ALL') AS source,
           GROUPING(lang) * 2 + GROUPING(source) AS gid,
           COUNT(*) AS cnt,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY GROUPING SETS ((lang), (source), ())
    """,
    doc="Explicit GROUPING SETS (completes the OLAP trio with rollup/cube): "
    "per-lang totals, per-source totals, and the grand total in ONE scan — "
    "the expansion happens after partial aggregation, so the shuffle "
    "carries one partial row per (set, group), not three scans. "
    "grouping_id disambiguates NULL-as-ALL from real NULLs.",
)
def grouping_sets_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupingSets([["lang"], ["source"], []], "lang", "source")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("cnt"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .select(
            F.coalesce("lang", F.lit("ALL")).alias("lang"),
            F.coalesce("source", F.lit("ALL")).alias("source"),
            "gid",
            "cnt",
            "sum_chars",
        )
    )


@register(
    "unpivot_doc_metrics",
    oracle="""
    SELECT doc_id, metric, val
    FROM (
        SELECT doc_id,
               CAST(n_chars AS DOUBLE) AS chars,
               CAST(length(string_split(text, ' ')) AS DOUBLE) AS words
        FROM documents
    )
    UNPIVOT (val FOR metric IN (chars, words))
    """,
    doc="UNPIVOT / melt (wide -> long reshaping, the inverse of pivot): "
    "per-doc metric columns melted to (doc_id, metric, val) rows — a "
    "narrow per-row expansion (no shuffle), the standard shape for "
    "feeding generic metric pipelines.",
)
def unpivot_doc_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    wide = docs.select(
        "doc_id",
        F.col("n_chars").cast("double").alias("chars"),
        F.size(F.split("text", " ")).cast("double").alias("words"),
    )
    return wide.unpivot("doc_id", ["chars", "words"], "metric", "val")


@register(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, date_trunc('day', MIN(ts)) AS cohort_day
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    )
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', cohort_day, day) AS BIGINT) AS day_offset,
           COUNT(*) AS n_users
    FROM activity JOIN firsts USING (user_id)
    GROUP BY 1, 2
    """,
    doc="Cohort retention (classic product-analytics OLAP, beyond the "
    "reference): users bucketed by first-active day, counted per day-offset "
    "of later activity. Three shuffles total (first-day agg, distinct "
    "activity, final rollup), all on user/day keys — the first-day "
    "aggregate joins back broadcast-or-shuffle per AQE's call; (user, day) "
    "activity is distinct-ed BEFORE the join so the join input is already "
    "minimal.",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = ev.distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


@register(
    "funnel_conversion",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(ts) AS t_click
        FROM events e JOIN v USING (user_id)
        WHERE event_type = 'click' AND ts >= t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(ts) AS t_purchase
        FROM events e JOIN c USING (user_id)
        WHERE event_type = 'purchase' AND ts >= t_click
        GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_click_after_view,
           (SELECT COUNT(*) FROM p) AS n_purchase_after_click,
           ROUND((SELECT COUNT(*) FROM p) * 1.0
                 / (SELECT COUNT(*) FROM v), 6) AS conversion
    """,
    doc="Ordered funnel conversion (view -> click after view -> purchase "
    "after that click): each stage anchors on the previous stage's first "
    "timestamp, so out-of-order events don't count — the semantics ad-hoc "
    "'has event X' funnels get wrong. Each stage is one filtered agg joined "
    "to the (shrinking) previous stage; the final three counts are 1-row "
    "cross joins (literally free).",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    nv = v.agg(F.count("*").alias("n_view"))
    nc = c.agg(F.count("*").alias("n_click_after_view"))
    np_ = p.agg(F.count("*").alias("n_purchase_after_click"))
    return (
        nv.crossJoin(nc)
        .crossJoin(np_)
        .withColumn(
            "conversion",
            F.round(F.col("n_purchase_after_click") * 1.0 / F.col("n_view"), 6),
        )
    )


# --- Z-order (Morton curve) layout -----------------------------------------

ZORDER_BITS = 16  # bits per dimension interleaved into a 32-bit z-value
ZORDER_BUCKET_SHIFT = 24  # file bucket = z >> 24 -> 256 curve-contiguous
# buckets at this sizing (one per target file/row-group)


def _zvalue_expr(u: str, d: str, shiftleft, shiftright) -> str:
    """Bit-interleave SQL for z = morton(u, d), built from engine-specific
    shift formatters so the identical bit math renders for Spark
    (shiftleft/shiftright functions) and DuckDB (<< / >> operators)."""
    terms = []
    for b in range(ZORDER_BITS):
        terms.append(shiftleft(f"({shiftright(u, b)} & 1)", 2 * b))
        terms.append(shiftleft(f"({shiftright(d, b)} & 1)", 2 * b + 1))
    return " + ".join(terms)


def _spark_shiftleft(x: str, n: int) -> str:
    return f"shiftleft({x}, {n})" if n else f"{x}"


def _spark_shiftright(x: str, n: int) -> str:
    return f"shiftright({x}, {n})" if n else f"{x}"


def _duck_shiftleft(x: str, n: int) -> str:
    return f"({x} << {n})" if n else f"{x}"


def _duck_shiftright(x: str, n: int) -> str:
    return f"({x} >> {n})" if n else f"{x}"


_ZMAX = (1 << ZORDER_BITS) - 1


@register(
    "zorder_layout_stats",
    oracle=f"""
    WITH e AS (
        SELECT user_id AS u,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d
        FROM events
    ),
    bounds AS (
        SELECT MIN(u) AS minu, MAX(u) AS maxu, MIN(d) AS mind, MAX(d) AS maxd
        FROM e
    ),
    n AS (
        SELECT ((u - minu) * {_ZMAX}) // greatest(maxu - minu, 1) AS su,
               ((d - mind) * {_ZMAX}) // greatest(maxd - mind, 1) AS sd
        FROM e CROSS JOIN bounds
    ),
    z AS (
        SELECT su, sd,
               ({_zvalue_expr("su", "sd", _duck_shiftleft, _duck_shiftright)}) AS zval
        FROM n
    )
    SELECT CAST(zval >> {ZORDER_BUCKET_SHIFT} AS BIGINT) AS bucket,
           COUNT(*) AS n_events,
           MIN(su) AS min_user, MAX(su) AS max_user,
           MIN(sd) AS min_day, MAX(sd) AS max_day
    FROM z
    GROUP BY bucket
    """,
    doc="Z-ORDER (Morton-curve) layout for multi-dimensional data skipping "
    "— the Delta/Iceberg OPTIMIZE ZORDER primitive: normalize each "
    "dimension (user_id, event day) to the 16-bit range from its global "
    "min/max (the same range-bounds pass OPTIMIZE ZORDER runs, broadcast "
    "as a 1-row scalar), interleave the bits into one sort key so a "
    "range of the curve is simultaneously tight in BOTH dimensions, then "
    "report per-bucket min/max of each dimension — exactly the footer "
    "stats a reader's predicate pushdown would prune on; narrow min/max "
    "spans per bucket = files skippable for either a user_id or a time "
    "predicate, which neither single-column sort gives. The z-value is "
    "pure bit math (shiftleft/and/add) computed map-side; the layout "
    "step at 100 TB is repartitionByRange(zval) + sortWithinPartitions "
    "before the write (same plan partitioned_write_pruned_read drives), "
    "and this query is its stats audit. One narrow pass, one broadcast "
    "1-row bounds agg, one aggregate on the bucket key.",
)
def zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("u"),
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("d"),
    )
    bounds = ev.agg(
        F.min("u").alias("minu"),
        F.max("u").alias("maxu"),
        F.min("d").alias("mind"),
        F.max("d").alias("maxd"),
    )
    n = ev.crossJoin(F.broadcast(bounds)).select(
        F.expr(f"((u - minu) * {_ZMAX}) div greatest(maxu - minu, 1)").alias("su"),
        F.expr(f"((d - mind) * {_ZMAX}) div greatest(maxd - mind, 1)").alias("sd"),
    )
    z = n.withColumn(
        "zval", F.expr(_zvalue_expr("su", "sd", _spark_shiftleft, _spark_shiftright))
    )
    return (
        z.groupBy(
            F.shiftright("zval", ZORDER_BUCKET_SHIFT).cast("long").alias("bucket")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min("su").alias("min_user"),
            F.max("su").alias("max_user"),
            F.min("sd").alias("min_day"),
            F.max("sd").alias("max_day"),
        )
    )


# --- Skew / layout diagnostics ---------------------------------------------

HEAVY_HITTER_TOPK = 20


@register(
    "skew_key_diagnostics",
    oracle=f"""
    WITH per_key AS (
        SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id
    ),
    tot AS (SELECT SUM(n_events) AS total FROM per_key)
    SELECT user_id, n_events,
           ROUND(n_events / total, 6) AS share
    FROM per_key CROSS JOIN tot
    ORDER BY n_events DESC, user_id
    LIMIT {HEAVY_HITTER_TOPK}
    """,
    doc="Heavy-hitter report over the stream's partition key — the "
    "diagnostic you run BEFORE picking a shuffle strategy at 100 TB "
    "(a key with share >> 1/n_partitions is the salting/AQE-skew-join "
    "trigger). Two-stage aggregate: per-key counts partial-aggregate "
    "map-side, the total joins back as a broadcast scalar.",
)
def skew_key_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_key = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    tot = per_key.agg(F.sum("n_events").alias("total"))
    return (
        per_key.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "n_events",
            F.round(F.col("n_events") / F.col("total"), 6).alias("share"),
        )
        .orderBy(F.desc("n_events"), "user_id")
        .limit(HEAVY_HITTER_TOPK)
    )


@register(
    "key_distribution_histogram",
    oracle="""
    WITH per_key AS (
        SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id
    )
    SELECT CAST(FLOOR(LOG2(n_events)) AS BIGINT) AS log2_bucket,
           COUNT(*) AS n_keys,
           MIN(n_events) AS min_events,
           MAX(n_events) AS max_events
    FROM per_key GROUP BY 1
    """,
    doc="Log2 histogram of per-key cardinalities — the compact skew "
    "profile (counts-of-counts) that stays ~60 rows no matter the corpus "
    "size: two cheap aggregations, the second over an already-tiny "
    "key-count table.",
)
def key_distribution_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_key = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    return (
        per_key.groupBy(
            F.floor(F.log2("n_events")).cast("long").alias("log2_bucket")
        )
        .agg(
            F.count("*").alias("n_keys"),
            F.min("n_events").alias("min_events"),
            F.max("n_events").alias("max_events"),
        )
    )


@register(
    "map_functions_suite",
    oracle="""
    SELECT event_id,
           json_keys(props)[1] AS first_key,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
           event_type AS tagged_key,
           CAST(json_extract(props, '$.k') AS BIGINT) + 1 AS tagged_value,
           CAST(len(json_keys(props)) AS INTEGER) AS n_entries
    FROM events
    """,
    doc="Map-type function suite: from_json into map<string,bigint>, "
    "map_keys / element_at access, map_from_arrays construction keyed by "
    "a row value, and size — the MapType column surface (the engine-side "
    "twin of the reference's dict-shaped node properties). All map "
    "operations are per-row codegen expressions; the oracle flattens the "
    "same accesses through DuckDB's JSON path functions.",
)
def map_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    tagged = F.map_from_arrays(
        F.array(F.col("event_type")), F.array(F.element_at(m, "k") + 1)
    )
    return events.select(
        "event_id",
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.element_at(m, "k").alias("k_value"),
        F.element_at(F.map_keys(tagged), 1).alias("tagged_key"),
        F.element_at(tagged, F.col("event_type")).alias("tagged_value"),
        F.size(m).alias("n_entries"),
    )


@register(
    "rfm_segmentation",
    oracle="""
    WITH rfm AS (
        SELECT o_custkey AS user_id,
               CAST(floor(epoch(MAX(o_orderdate)) / 86400) AS BIGINT)
                   AS recency_days,
               COUNT(*) AS frequency,
               CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS monetary_cents
        FROM orders GROUP BY o_custkey
    ),
    b AS (
        SELECT quantile_cont(recency_days, [0.25, 0.5, 0.75]) AS rb,
               quantile_cont(frequency, [0.25, 0.5, 0.75]) AS fb,
               quantile_cont(monetary_cents, [0.25, 0.5, 0.75]) AS mb
        FROM rfm
    ),
    scored AS (
        SELECT user_id, frequency, monetary_cents,
               1 + CAST(recency_days > rb[1] AS INT)
                 + CAST(recency_days > rb[2] AS INT)
                 + CAST(recency_days > rb[3] AS INT) AS r_score,
               1 + CAST(frequency > fb[1] AS INT)
                 + CAST(frequency > fb[2] AS INT)
                 + CAST(frequency > fb[3] AS INT) AS f_score,
               1 + CAST(monetary_cents > mb[1] AS INT)
                 + CAST(monetary_cents > mb[2] AS INT)
                 + CAST(monetary_cents > mb[3] AS INT) AS m_score
        FROM rfm CROSS JOIN b
    )
    SELECT r_score, f_score, m_score,
           COUNT(*) AS n_users,
           CAST(SUM(monetary_cents) AS BIGINT) AS total_monetary_cents,
           CAST(SUM(frequency) AS BIGINT) AS total_frequency
    FROM scored GROUP BY r_score, f_score, m_score
    """,
    doc="RFM segmentation (recency/frequency/monetary quartiles — the "
    "classic customer-analytics rollup): one aggregate over orders, "
    "exact quartile boundary extraction (9 scalars, one aggregate), "
    "then window-free scan-side bucketing and a 64-cell segment "
    "summary. Re-planned in round 6: the previous NTILE(4) windows had "
    "no PARTITION BY, which moves the whole customer table to a single "
    "partition (WindowExec does NOT range-partition the way a global "
    "orderBy does — VERDICT r5 #3). Now score = 1 + sum of "
    "(value > boundary) comparisons against broadcast exact "
    "percentiles; ties share a score, so no per-row total order is "
    "needed and nothing ever funnels to one partition. Money is exact "
    "integer cents and recency is integer epoch-days, so the "
    "interpolated boundaries are exact dyadic doubles — bit-identical "
    "across engines (DuckDB quantile_cont and Spark percentile share "
    "the p*(n-1) linear-interpolation convention). Spark's exact "
    "percentile aggregates a per-partition value-count map (map-side "
    "partials, no row shuffle); on a near-unique 100 TB key swap in "
    "approx_percentile and re-pin the oracle to the same boundaries.",
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    rfm = orders.groupBy(F.col("o_custkey").alias("user_id")).agg(
        F.floor(F.unix_timestamp(F.max("o_orderdate")) / 86400)
        .cast("long")
        .alias("recency_days"),
        F.count("*").alias("frequency"),
        F.round(F.sum("o_totalprice") * 100).cast("long").alias("monetary_cents"),
    )
    qs = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    bounds = rfm.agg(
        F.percentile("recency_days", qs).alias("rb"),
        F.percentile("frequency", qs).alias("fb"),
        F.percentile("monetary_cents", qs).alias("mb"),
    )

    def _score(col: str, barr: str):
        return (
            F.lit(1)
            + (F.col(col) > F.element_at(barr, 1)).cast("int")
            + (F.col(col) > F.element_at(barr, 2)).cast("int")
            + (F.col(col) > F.element_at(barr, 3)).cast("int")
        )

    scored = rfm.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        "frequency",
        "monetary_cents",
        _score("recency_days", "rb").alias("r_score"),
        _score("frequency", "fb").alias("f_score"),
        _score("monetary_cents", "mb").alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").alias("n_users"),
        F.sum("monetary_cents").alias("total_monetary_cents"),
        F.sum("frequency").alias("total_frequency"),
    )


PROFILE_COLUMNS = (
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
)


@register(
    "data_profile_summary",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS column_name,
           COUNT(*) AS n_rows,
           COUNT(*) - COUNT({c}) AS n_null,
           COUNT(DISTINCT {c}) AS n_distinct,
           ROUND(CAST(MIN({c}) AS DOUBLE), 4) AS min_val,
           ROUND(CAST(MAX({c}) AS DOUBLE), 4) AS max_val,
           ROUND(AVG({c}), 4) AS mean_val
    FROM lineitem
    """
        for c in PROFILE_COLUMNS
    ),
    doc="Table profiling (the ANALYZE/Deequ-style data-quality pass a "
    "pipeline runs on ingest): one job emits per-column row/null/"
    "distinct counts and min/max/mean for every numeric lineitem "
    "column, as a UNION of per-column aggregate branches. r17 re-plan "
    "(guide §2.3): the old single 42-aggregate job made Catalyst plan "
    "the 7-way multi-distinct through one Expand — an 8x in-memory row "
    "multiplication of the whole fact table ahead of the partial "
    "aggregates (measured 3.9 s at sf0.1; the union plan is 1.1 s). "
    "Per-branch scans prune to ONE column each (columnar parquet: the "
    "7 branches read the same total bytes the 7-column single scan "
    "did), each branch's distinct dedups map-side before its exchange, "
    "and nothing is ever row-multiplied. Exact n_distinct is still the "
    "spec (and what the oracle checks); at 100 TB the same query swaps "
    "in approx_count_distinct / the HLL sketch rollup "
    "(operators/sketches.py) to drop exact-distinct entirely — the "
    "documented exact-vs-approx profiling trade-off.",
)
def data_profile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem")
    parts = []
    for c in PROFILE_COLUMNS:
        parts.append(
            lineitem.agg(
                F.lit(c).alias("column_name"),
                F.count("*").alias("n_rows"),
                (F.count("*") - F.count(c)).alias("n_null"),
                F.count_distinct(F.col(c)).alias("n_distinct"),
                F.round(F.min(c).cast("double"), 4).alias("min_val"),
                F.round(F.max(c).cast("double"), 4).alias("max_val"),
                F.round(F.avg(c), 4).alias("mean_val"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


INCR_CUTOVER = "2024-01-21"  # base = days before; delta = the rest


@register(
    "incremental_agg_merge",
    oracle=f"""
    WITH base AS (
        SELECT event_type, COUNT(*) AS cnt,
               ROUND(SUM(value), 4) AS sum_v,
               MIN(value) AS min_v, MAX(value) AS max_v
        FROM events WHERE ts < TIMESTAMP '{INCR_CUTOVER}'
        GROUP BY event_type
    ),
    delta AS (
        SELECT event_type, COUNT(*) AS cnt,
               ROUND(SUM(value), 4) AS sum_v,
               MIN(value) AS min_v, MAX(value) AS max_v
        FROM events WHERE ts >= TIMESTAMP '{INCR_CUTOVER}'
        GROUP BY event_type
    )
    SELECT COALESCE(b.event_type, d.event_type) AS event_type,
           CAST(COALESCE(b.cnt, 0) + COALESCE(d.cnt, 0) AS BIGINT) AS cnt,
           ROUND(COALESCE(b.sum_v, 0) + COALESCE(d.sum_v, 0), 4) AS sum_v,
           LEAST(COALESCE(b.min_v, d.min_v), COALESCE(d.min_v, b.min_v)) AS min_v,
           GREATEST(COALESCE(b.max_v, d.max_v), COALESCE(d.max_v, b.max_v)) AS max_v,
           ROUND((COALESCE(b.sum_v, 0) + COALESCE(d.sum_v, 0))
                 / (COALESCE(b.cnt, 0) + COALESCE(d.cnt, 0)), 4) AS avg_v
    FROM base b FULL JOIN delta d ON b.event_type = d.event_type
    """,
    doc="Incremental aggregation — the nightly-ETL algebra that avoids "
    "full recomputes: yesterday's materialized per-key aggregates "
    "(count/sum/min/max) MERGE with the new partition's aggregates by "
    "pure arithmetic (sums add, extrema fold, avg re-derives from "
    "merged sum/count), never rescanning the base. Demonstrated by "
    "splitting events at a cutover date, aggregating each side "
    "separately, and merging — at 100 TB the base side is a KB-sized "
    "summary table read, not a scan, so daily cost is proportional to "
    "the DELTA. This algebraic-merge property is exactly what "
    "non-decomposable aggregates (exact distinct, exact median) lack — "
    "which is why the sketch family (operators/sketches.py) exists. "
    "Sums are rounded at the partial level too, mirroring what a "
    "persisted summary table would store.",
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    cut = F.lit(INCR_CUTOVER).cast("timestamp")

    def _partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("value"), 4).alias("sum_v"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )

    base = _partial(events.filter(F.col("ts") < cut))
    delta = _partial(events.filter(F.col("ts") >= cut))
    b = base.select(*[F.col(c).alias(f"b_{c}") for c in base.columns])
    d = delta.select(*[F.col(c).alias(f"d_{c}") for c in delta.columns])
    merged = b.join(d, b.b_event_type == d.d_event_type, "full_outer")
    cnt = F.coalesce("b_cnt", F.lit(0)) + F.coalesce("d_cnt", F.lit(0))
    sum_v = F.coalesce("b_sum_v", F.lit(0.0)) + F.coalesce("d_sum_v", F.lit(0.0))
    return merged.select(
        F.coalesce("b_event_type", "d_event_type").alias("event_type"),
        cnt.alias("cnt"),
        F.round(sum_v, 4).alias("sum_v"),
        F.least(
            F.coalesce("b_min_v", "d_min_v"), F.coalesce("d_min_v", "b_min_v")
        ).alias("min_v"),
        F.greatest(
            F.coalesce("b_max_v", "d_max_v"), F.coalesce("d_max_v", "b_max_v")
        ).alias("max_v"),
        F.round(sum_v / cnt, 4).alias("avg_v"),
    )


GDPR_ERASE_MOD = 50  # erasure cohort: user_id % 50 == 0


@register(
    "gdpr_erasure_audit",
    oracle=f"""
    SELECT 'customer' AS table_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_subjects
    FROM customer WHERE c_custkey % {GDPR_ERASE_MOD} = 0
    UNION ALL
    SELECT 'events', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT user_id) AS BIGINT)
    FROM events WHERE user_id % {GDPR_ERASE_MOD} = 0
    UNION ALL
    SELECT 'orders', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
    FROM orders WHERE o_custkey % {GDPR_ERASE_MOD} = 0
    UNION ALL
    SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_custkey % {GDPR_ERASE_MOD} = 0
    """,
    doc="Right-to-be-forgotten blast-radius audit — the pass a privacy "
    "pipeline runs BEFORE erasure: for a deterministic erasure cohort, "
    "count affected rows and distinct subjects in every table that "
    "carries the subject key, including the indirect reach through the "
    "order->lineitem foreign key (facts keyed by a surrogate still "
    "join back to the subject). Direct tables are filter+aggregate "
    "with the predicate pushed to the scan; the indirect table is one "
    "keyed join pre-filtered on the erased cohort. The erasure itself "
    "is then merge_upsert_snapshot's delete branch applied per table.",
)
def gdpr_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    def _audit(df: DataFrame, name: str, key: str) -> DataFrame:
        return df.filter(F.col(key) % GDPR_ERASE_MOD == 0).agg(
            F.lit(name).alias("table_name"),
            F.count("*").alias("n_rows"),
            F.count_distinct(F.col(key)).alias("n_subjects"),
        )

    customer = _audit(load(spark, sf_dir, "customer"), "customer", "c_custkey")
    events = _audit(load(spark, sf_dir, "events"), "events", "user_id")
    orders_t = load(spark, sf_dir, "orders")
    orders = _audit(orders_t, "orders", "o_custkey")
    lineitem = _audit(
        load(spark, sf_dir, "lineitem").join(
            orders_t, F.col("l_orderkey") == F.col("o_orderkey")
        ),
        "lineitem",
        "o_custkey",
    )
    return customer.unionByName(events).unionByName(orders).unionByName(lineitem)


MAD_SIGMA = 3.0  # |x - median| > 3 * MAD flags an outlier


@register(
    "mad_outlier_counts",
    oracle=f"""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.value, m.med,
               abs(e.value - m.med) AS adev
        FROM events e JOIN med m ON e.event_type = m.event_type
    ),
    mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           ROUND(MAX(d.med), 4) AS median_v,
           ROUND(MAX(m.mad), 4) AS mad_v,
           CAST(SUM(CASE WHEN d.adev > {MAD_SIGMA} * m.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY d.event_type
    """,
    doc="Robust outlier detection via median absolute deviation — the "
    "quantile-based alternative to z-scores that heavy-tailed metrics "
    "need (stddev itself is blown up by the outliers it should flag). "
    "Three passes by necessity (median -> MAD -> threshold count), each "
    "a grouped aggregate plus a BROADCAST join of the 5-row statistic "
    "table back onto the fact — never a fact-fact join. Exact "
    "interpolated medians here; the production swap is "
    "approx_percentile's t-digest in the identical plan, and the "
    "cheap parquet re-scan is the right trade against checkpointing an "
    "events-sized deviation table.",
)
def mad_outlier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = events.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.max("med"), 4).alias("median_v"),
            F.round(F.max("mad"), 4).alias("mad_v"),
            F.sum(
                (F.col("adev") > MAD_SIGMA * F.col("mad")).cast("long")
            ).alias("n_outliers"),
            F.count("*").alias("n"),
        )
    )


CORR_COLUMNS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "correlation_matrix",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{a}' AS col_a, '{b}' AS col_b,
           ROUND(corr({a}, {b}), 4) AS pearson_r
    FROM lineitem
    """
        for idx, a in enumerate(CORR_COLUMNS)
        for b in CORR_COLUMNS[idx + 1 :]
    ),
    doc="Pairwise Pearson correlation matrix of the numeric lineitem "
    "measures — the feature-selection screen before model training: "
    "all 6 upper-triangle pairs accumulate in ONE pass (each corr is a "
    "5-tuple of moments, partial-aggregable map-side), then the single "
    "wide row unpivots via stack. One scan, one 6x5-accumulator "
    "shuffle row — at 100 TB this beats six separate jobs by exactly "
    "6x the scan cost.",
)
def correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem")
    pairs = [
        (a, b)
        for idx, a in enumerate(CORR_COLUMNS)
        for b in CORR_COLUMNS[idx + 1 :]
    ]
    wide = lineitem.agg(
        *[
            F.round(F.corr(a, b), 4).alias(f"{a}__{b}")
            for a, b in pairs
        ]
    )
    stack_args = ", ".join(f"'{a}', '{b}', `{a}__{b}`" for a, b in pairs)
    return wide.selectExpr(
        f"stack({len(pairs)}, {stack_args}) AS (col_a, col_b, pearson_r)"
    )


@register(
    "referential_integrity_audit",
    oracle="""
    SELECT 'lineitem->orders' AS fk, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_orphans
    FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
    UNION ALL
    SELECT 'orders->customer', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    UNION ALL
    SELECT 'customer->nation', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
    UNION ALL
    SELECT 'events->customer', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM events LEFT JOIN customer ON user_id = c_custkey
    """,
    doc="Referential-integrity audit across every foreign key in the "
    "star schema: left-join each fact to its dimension and count "
    "orphans (rows whose key resolves to nothing) — the ingest gate "
    "that catches a broken upstream export before a silent inner join "
    "drops the rows downstream. Dimension sides broadcast "
    "(nation/customer) so three of the four checks are shuffle-free on "
    "the fact side; the fact-fact lineitem->orders check shuffles once "
    "on the order key, same as the ratings view it protects. A healthy "
    "dataset reports zero orphans everywhere — the audit VALUE is that "
    "the zeros are verified, not assumed.",
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    def _check(fact: DataFrame, dim: DataFrame, fk, pk, name: str, bcast: bool):
        d = F.broadcast(dim) if bcast else dim
        joined = fact.join(d, fact[fk] == dim[pk], "left")
        return joined.agg(
            F.lit(name).alias("fk"),
            F.count("*").alias("n_rows"),
            F.sum(dim[pk].isNull().cast("long")).alias("n_orphans"),
        )

    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    events = load(spark, sf_dir, "events")
    return (
        _check(lineitem, orders, "l_orderkey", "o_orderkey", "lineitem->orders", False)
        .unionByName(
            _check(orders, customer, "o_custkey", "c_custkey", "orders->customer", True)
        )
        .unionByName(
            _check(
                customer, nation, "c_nationkey", "n_nationkey", "customer->nation", True
            )
        )
        .unionByName(
            _check(events, customer, "user_id", "c_custkey", "events->customer", True)
        )
    )


# ---------------------------------------------------------------------------
# VARIANT semi-structured access (Spark 4)
# ---------------------------------------------------------------------------


@register(
    "variant_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(props->>'$.k' AS BIGINT)) AS min_k,
           MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k,
           COUNT(DISTINCT CAST(props->>'$.k' AS BIGINT)) AS n_distinct_k
    FROM events
    GROUP BY event_type
    """,
    doc="Semi-structured access through Spark 4's VARIANT type: "
    "parse_json shreds the props payload into the binary variant "
    "encoding ONCE at scan time and variant_get path-extracts with a "
    "type hint -- the engine-native replacement for repeated "
    "get_json_object string re-parsing (the same shredded-encoding "
    "design as Snowflake's VARIANT / Parquet variant shredding). "
    "Everything downstream is a plain map-side-combined aggregate; at "
    "100 TB the win is that each props string is parsed exactly once "
    "regardless of how many paths later stages extract.",
)
def variant_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    return events.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.count_distinct("k").alias("n_distinct_k"),
    )


# ---------------------------------------------------------------------------
# Null-semantics suite
# ---------------------------------------------------------------------------


@register(
    "null_semantics_suite",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id, event_type,
               CASE WHEN value < 5 THEN NULL ELSE value END AS v
        FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_rows,
           COUNT(v) AS n_not_null,
           COUNT(*) - COUNT(v) AS n_null,
           ROUND(AVG(v), 4) AS avg_ignoring_null,
           ROUND(AVG(COALESCE(v, 0)), 4) AS avg_null_as_zero,
           CAST(COUNT(*) FILTER (WHERE v IS NOT DISTINCT FROM NULL) AS BIGINT)
               AS null_safe_eq_null,
           CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct_non_null
    FROM e GROUP BY event_type
    """,
    doc="SQL null-semantics suite over a synthesized nullable measure "
    "(value < 5 -> NULL): COUNT(*) vs COUNT(col), AVG's null-skipping "
    "vs COALESCE-to-zero (the two give DIFFERENT answers -- the classic "
    "silent-bug pair), the null-safe comparator (<=> / IS NOT DISTINCT "
    "FROM, the only equality that matches NULL), and DISTINCT's "
    "null-exclusion under aggregation. Engines disagree on null "
    "semantics more than on anything else; this row pins Spark to the "
    "standard on every behavior at once.",
)
def null_semantics_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    v = F.when(F.col("value") < 5, F.lit(None)).otherwise(F.col("value"))
    e = events.select("event_id", "event_type", v.alias("v"))
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        F.count("v").alias("n_not_null"),
        (F.count("*") - F.count("v")).alias("n_null"),
        F.round(F.avg("v"), 4).alias("avg_ignoring_null"),
        F.round(F.avg(F.coalesce("v", F.lit(0))), 4).alias("avg_null_as_zero"),
        F.count_if(F.col("v").eqNullSafe(F.lit(None))).alias("null_safe_eq_null"),
        F.count_distinct("v").alias("n_distinct_non_null"),
    )


# ---------------------------------------------------------------------------
# Collation-aware grouping (Spark 4)
# ---------------------------------------------------------------------------


@register(
    "collation_case_insensitive_group",
    oracle="""
    WITH mixed AS (
        SELECT event_type AS t, value FROM events
        UNION ALL
        SELECT UPPER(event_type) AS t, value FROM events
    )
    SELECT LOWER(t) AS event_type_ci,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS sum_value
    FROM mixed GROUP BY LOWER(t)
    """,
    doc="Collation-aware grouping through Spark 4's COLLATE expression: "
    "the stream is unioned with an upper-cased copy and grouped under "
    "UTF8_LCASE collation, which folds case DURING comparison -- no "
    "lower() rewrite of the data, and the same collation drives "
    "equality in joins and ORDER BY once declared on the column. The "
    "oracle is the classic LOWER() workaround; the collation form wins "
    "at 100 TB because the fold happens inside the hash/compare "
    "(engine-native, expression-free grouping keys) and, on real "
    "tables, because it is declared once in the schema instead of "
    "rewritten into every query.",
)
def collation_case_insensitive_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events").select("event_type", "value")
    mixed = events.unionByName(
        events.select(F.upper("event_type").alias("event_type"), "value")
    )
    ci = F.collate(F.col("event_type"), "UTF8_LCASE")
    return (
        mixed.groupBy(ci.alias("t"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            # normalize the representative casing for the hash compare: a
            # UTF8_LCASE group may surface either variant as its key
            F.lower(F.col("t")).cast("string").alias("event_type_ci"),
            "n",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# SQL UDF (CREATE FUNCTION ... RETURN, Spark 4)
# ---------------------------------------------------------------------------


@register(
    "sql_udf_revenue",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
               AS charged
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="SQL-defined scalar function (Spark 4 CREATE FUNCTION ... RETURN): "
    "the charge formula is declared ONCE as a catalog-level SQL UDF and "
    "reused by name -- unlike a Python UDF it is INLINED into the plan "
    "at analysis time, so it whole-stage-codegens like the raw "
    "expression (zero serialization boundary, full pushdown through "
    "it). This completes the §2.11 UDF family's fourth surface: "
    "vectorized pandas UDF, grouped UDAF, table UDTF, and now the "
    "catalog SQL UDF -- the right tool whenever the 'UDF' is just an "
    "expression the team wants named and shared.",
)
def sql_udf_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION charged_amount("
        "price DOUBLE, discount DOUBLE, tax DOUBLE) RETURNS DOUBLE "
        "RETURN price * (1 - discount) * (1 + tax)"
    )
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n,
               ROUND(SUM(charged_amount(l_extendedprice, l_discount, l_tax)), 2)
                   AS charged
        FROM lineitem_v
        GROUP BY l_returnflag
        """
    )


# ---------------------------------------------------------------------------
# LATERAL correlated-subquery join
# ---------------------------------------------------------------------------


@register(
    "lateral_join_top_orders",
    oracle="""
    SELECT n.n_name, t.o_orderkey, ROUND(t.o_totalprice, 2) AS o_totalprice
    FROM nation n,
    LATERAL (
        SELECT o.o_orderkey, o.o_totalprice
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 2
    ) t
    """,
    doc="LATERAL correlated-subquery join (Spark 3.5+/4 SQL surface): for "
    "each nation, the top-2 orders of its customers -- the per-row "
    "subquery form of top-k-per-group, which reads naturally when the "
    "outer side is small and the inner query is complex. Catalyst "
    "DECORRELATES it into the same window/join shape as "
    "topk_per_user_window rather than executing per-outer-row (25 "
    "nations here, but the rewrite is what makes the construct legal "
    "at ANY outer cardinality). Same oracle text runs on DuckDB, which "
    "supports LATERAL natively -- this row checks the decorrelation "
    "preserves semantics exactly.",
)
def lateral_join_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    for name in ("nation", "orders", "customer"):
        load(spark, sf_dir, name).createOrReplaceTempView(f"{name}_v")
    return spark.sql(
        """
        SELECT n.n_name, t.o_orderkey, ROUND(t.o_totalprice, 2) AS o_totalprice
        FROM nation_v n,
        LATERAL (
            SELECT o.o_orderkey, o.o_totalprice
            FROM orders_v o JOIN customer_v c ON o.o_custkey = c.c_custkey
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY o.o_totalprice DESC, o.o_orderkey
            LIMIT 2
        ) t
        """
    )


# ---------------------------------------------------------------------------
# ANSI-safe try_* functions
# ---------------------------------------------------------------------------


@register(
    "ansi_try_functions_suite",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) FILTER (WHERE user_id % 3 = 0) AS BIGINT)
               AS n_div_by_zero,
           ROUND(SUM(CASE WHEN user_id % 3 = 0 THEN NULL
                          ELSE value / (user_id % 3) END), 4) AS sum_safe_div,
           CAST(COUNT(*) FILTER (
               WHERE TRY_CAST(substr(props, 7, 2) AS BIGINT) IS NULL
           ) AS BIGINT) AS n_bad_casts
    FROM events
    GROUP BY event_type
    """,
    doc="ANSI-mode-safe arithmetic via the try_* family: try_divide "
    "returns NULL where strict ANSI division would raise (the x/0 rows "
    "are counted, not crashed on), and try_cast turns malformed "
    "strings into NULL instead of failing the job -- the difference "
    "between a 100 TB pipeline that quarantines bad rows and one that "
    "dies at hour nine on the first dirty record. Under ANSI mode "
    "(Spark 4's default) the try_ forms are the ONLY way to get the "
    "permissive behavior query-locally while the session stays "
    "strict.",
)
def ansi_try_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    d = F.col("user_id") % 3
    return events.groupBy("event_type").agg(
        F.count_if(d == 0).alias("n_div_by_zero"),
        F.round(F.sum(F.try_divide(F.col("value"), d)), 4).alias("sum_safe_div"),
        F.count_if(
            F.substring("props", 7, 2).try_cast("bigint").isNull()
        ).alias("n_bad_casts"),
    )


# ---------------------------------------------------------------------------
# Declarative data-expectations audit (data contract checks)
# ---------------------------------------------------------------------------


@register(
    "data_expectations_audit",
    oracle="""
    WITH m AS (
        SELECT COUNT(*) AS n,
               COUNT(o_custkey) AS custkey_nn,
               COUNT(DISTINCT o_orderkey) AS orderkey_distinct,
               CAST(COUNT(*) FILTER (WHERE o_totalprice > 0) AS BIGINT)
                   AS price_positive,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus IN ('F','O','P'))
                    AS BIGINT) AS status_in_domain,
               CAST(COUNT(*) FILTER (
                   WHERE o_orderdate BETWEEN TIMESTAMP '1990-01-01'
                                         AND TIMESTAMP '2030-01-01'
               ) AS BIGINT) AS date_in_range
        FROM orders
    )
    SELECT * FROM (
        SELECT 'row_count_positive' AS check_name,
               n > 0 AS passed, CAST(n AS BIGINT) AS metric FROM m
        UNION ALL
        SELECT 'custkey_not_null', custkey_nn = n, CAST(custkey_nn AS BIGINT)
        FROM m
        UNION ALL
        SELECT 'orderkey_unique', orderkey_distinct = n,
               CAST(orderkey_distinct AS BIGINT) FROM m
        UNION ALL
        SELECT 'price_positive', price_positive = n, price_positive FROM m
        UNION ALL
        SELECT 'status_in_domain', status_in_domain = n, status_in_domain
        FROM m
        UNION ALL
        SELECT 'orderdate_in_range', date_in_range = n, date_in_range FROM m
    )
    """,
    doc="Declarative data-contract audit (the great-expectations shape): "
    "six expectations -- non-empty, not-null, key-unique, value-"
    "positive, domain-membership, date-range -- ALL evaluated in one "
    "scan as conditional-count aggregates, then unpivoted to one row "
    "per check with its pass verdict and supporting metric. This is "
    "how a 100 TB contract gate must run: N checks share one pass "
    "(adding a check costs one aggregate expression, not one scan), "
    "the verdict table is what lands in the data-quality dashboard, "
    "and a failed row carries the count needed for triage.",
)
def data_expectations_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    m = orders.agg(
        F.count("*").alias("n"),
        F.count("o_custkey").alias("custkey_nn"),
        F.count_distinct("o_orderkey").alias("orderkey_distinct"),
        F.count_if(F.col("o_totalprice") > 0).alias("price_positive"),
        F.count_if(F.col("o_orderstatus").isin("F", "O", "P")).alias(
            "status_in_domain"
        ),
        F.count_if(
            F.col("o_orderdate").between("1990-01-01", "2030-01-01")
        ).alias("date_in_range"),
    )
    checks = [
        ("row_count_positive", F.col("n") > 0, F.col("n")),
        ("custkey_not_null", F.col("custkey_nn") == F.col("n"), F.col("custkey_nn")),
        (
            "orderkey_unique",
            F.col("orderkey_distinct") == F.col("n"),
            F.col("orderkey_distinct"),
        ),
        (
            "price_positive",
            F.col("price_positive") == F.col("n"),
            F.col("price_positive"),
        ),
        (
            "status_in_domain",
            F.col("status_in_domain") == F.col("n"),
            F.col("status_in_domain"),
        ),
        (
            "orderdate_in_range",
            F.col("date_in_range") == F.col("n"),
            F.col("date_in_range"),
        ),
    ]
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                cond.alias("passed"),
                metric.cast("long").alias("metric"),
            )
            for name, cond, metric in checks
        ]
    )
    return m.select(F.explode(rows).alias("c")).select("c.*")


# ---------------------------------------------------------------------------
# Per-column entropy profile
# ---------------------------------------------------------------------------


@register(
    "column_entropy_profile",
    oracle="""
    WITH stacked AS (
        SELECT 'o_orderstatus' AS col, o_orderstatus AS val FROM orders
        UNION ALL
        SELECT 'o_orderpriority', o_orderpriority FROM orders
    ),
    cell AS (SELECT col, val, COUNT(*) AS n FROM stacked GROUP BY 1, 2),
    p AS (
        SELECT col, n / SUM(n) OVER (PARTITION BY col) AS prob FROM cell
    )
    SELECT col,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           ROUND(-SUM(prob * ln(prob)) / ln(2), 6) AS entropy_bits,
           ROUND(-SUM(prob * ln(prob)) / ln(2)
                 / NULLIF(ln(COUNT(*)) / ln(2), 0), 6) AS normalized
    FROM p GROUP BY col
    """,
    doc="Per-column Shannon entropy profile: each categorical's "
    "information content in bits plus the 0-1 normalized form (entropy "
    "over log2 of its cardinality) -- low normalized entropy flags "
    "near-constant columns a model can drop, 1.0 flags uniform codes. "
    "Columns unpivot via stack BEFORE aggregation, so profiling k "
    "columns is one scan and one (col, val) cell aggregation "
    "regardless of k -- the same Expand-planned single pass as "
    "data_profile_summary, extended to a distribution statistic. A "
    "1-value column yields normalized NULL (0/0), identically on both "
    "engines.",
)
def column_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders")
    stacked = orders.select(
        F.expr(
            "stack(2, 'o_orderstatus', o_orderstatus, "
            "'o_orderpriority', o_orderpriority) AS (col, val)"
        )
    )
    cell = stacked.groupBy("col", "val").agg(F.count("*").alias("n"))
    p = cell.select(
        "col",
        (F.col("n") / F.sum("n").over(Window.partitionBy("col"))).alias("prob"),
    )
    ent = -F.sum(F.col("prob") * F.log("prob")) / F.log(F.lit(2.0))
    return p.groupBy("col").agg(
        F.count("*").alias("n_distinct"),
        F.round(ent, 6).alias("entropy_bits"),
        F.round(
            ent / F.nullif(F.log(F.count("*")) / F.log(F.lit(2.0)), F.lit(0.0)),
            6,
        ).alias("normalized"),
    )
