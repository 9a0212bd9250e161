"""Core relational operators (SURVEY.md §2.1-2.4, §2.7-2.8).

Each query is declarative DataFrame API — Catalyst handles predicate
pushdown, column pruning, broadcast-join selection, and AQE coalescing.
Where the reference used RDD lambdas or driver-side python sets
(reference src/als/spark_als.py:52-70, src/csv/recommend.py:113-135), we
use column expressions and anti-joins so plans stay inside whole-stage
codegen and scale out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cqu_bigdata_recommender_system_for_movies_spark.plans.registry import register
from cqu_bigdata_recommender_system_for_movies_spark.session import shuffle_partitions
from cqu_bigdata_recommender_system_for_movies_spark.tables import RATINGS_SQL, load, ratings

# ---------------------------------------------------------------------------
# Aggregations + cold-start analytics (A2, A3, A4, M9, M10, T4)
# ---------------------------------------------------------------------------


@register(
    "cold_start_popular_items",
    oracle=f"""
    WITH ratings AS ({RATINGS_SQL})
    SELECT item_id, COUNT(*) AS cnt, AVG(rating) AS avg_rating
    FROM ratings
    GROUP BY item_id
    HAVING COUNT(*) >= 35
    ORDER BY avg_rating DESC, item_id
    LIMIT 20
    """,
    doc="M9 cold-start 'popular items' (reference src/cold_strategy/cold_rec.py:53-65): "
    "group-count -> HAVING -> avg -> order desc -> limit. Flagship query.",
)
def cold_start_popular_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: single shuffle on item_id (partial aggregation map-side), then
    # TakeOrderedAndProject for the limit — no full sort at 100 TB.
    return (
        ratings(spark, sf_dir)
        .groupBy("item_id")
        .agg(F.count("*").alias("cnt"), F.avg("rating").alias("avg_rating"))
        .filter(F.col("cnt") >= 35)
        .orderBy(F.desc("avg_rating"), F.asc("item_id"))
        .limit(20)
    )


@register(
    "cold_start_new_items",
    oracle=f"""
    WITH ratings AS ({RATINGS_SQL})
    SELECT p_partkey AS item_id, COUNT(rating) AS cnt
    FROM part LEFT JOIN ratings ON p_partkey = item_id
    GROUP BY p_partkey
    HAVING COUNT(rating) < 20
    """,
    doc="M10 new-movie detection (cold_rec.py:68-76): items with < k ratings, "
    "including never-rated ones via left outer join.",
)
def cold_start_new_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    r = ratings(spark, sf_dir)
    return (
        part.join(r, part.p_partkey == r.item_id, "left")
        .groupBy(part.p_partkey.alias("item_id"))
        .agg(F.count("rating").alias("cnt"))
        .filter(F.col("cnt") < 20)
    )


@register(
    "global_stats",
    oracle=f"""
    WITH ratings AS ({RATINGS_SQL})
    SELECT COUNT(DISTINCT user_id) AS n_users,
           COUNT(DISTINCT item_id) AS n_items,
           COUNT(*) AS n_ratings,
           AVG(rating) AS avg_rating
    FROM ratings
    """,
    doc="A4 dataset stats (reference doc/课程报告.md:600-644): global counts + mean rating.",
)
def global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ratings(spark, sf_dir).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("item_id").alias("n_items"),
        F.count("*").alias("n_ratings"),
        F.avg("rating").alias("avg_rating"),
    )


@register(
    "group_count_having_events",
    oracle="""
    SELECT event_type, COUNT(*) AS cnt, ROUND(AVG(value), 4) AS avg_value
    FROM events
    GROUP BY event_type
    HAVING COUNT(*) >= 10
    """,
    doc="A2/A3 grouped count+avg with HAVING on the event stream table.",
)
def group_count_having_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.avg("value"), 4).alias("avg_value"))
        .filter(F.col("cnt") >= 10)
    )


# ---------------------------------------------------------------------------
# Projection / filter / distinct (P1-P10)
# ---------------------------------------------------------------------------


@register(
    "project_cast_rename",
    oracle="""
    SELECT event_id AS record_id,
           CAST(user_id AS INTEGER) AS uid,
           event_type AS kind,
           ROUND(value, 2) AS val
    FROM events
    """,
    doc="P1-P3 projection, rename, typed cast (reference streaming_rec.py:181-188).",
)
def project_cast_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").select(
        F.col("event_id").alias("record_id"),
        F.col("user_id").cast("int").alias("uid"),
        F.col("event_type").alias("kind"),
        F.round(F.col("value"), 2).alias("val"),
    )


@register(
    "filter_point_lookup",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE user_id = 7 AND event_type = 'purchase'
    """,
    doc="P9 point-lookup predicate (Cypher {UserID:%d} match, recommend.py:115) "
    "as a pushed-down parquet filter.",
)
def filter_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .filter((F.col("user_id") == 7) & (F.col("event_type") == "purchase"))
        .select("event_id", "user_id", "event_type", "value")
    )


@register(
    "filter_notnull_range",
    oracle="""
    SELECT event_id, user_id, value
    FROM events
    WHERE value IS NOT NULL AND value BETWEEN 50 AND 100
    """,
    doc="P4/P10 not-null + range predicate on an edge property.",
)
def filter_notnull_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("value").between(50, 100))
        .select("event_id", "user_id", "value")
    )


@register(
    "distinct_user_event_pairs",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    doc="P7 distinct (reference recommend.py:119 dropDuplicates).",
)
def distinct_user_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").select("user_id", "event_type").distinct()


# ---------------------------------------------------------------------------
# Joins (J1-J5)
# ---------------------------------------------------------------------------


@register(
    "stream_static_enrich",
    oracle="""
    SELECT event_id, e.user_id AS user_id, event_type, value, c_mktsegment AS segment
    FROM events e LEFT JOIN customer ON e.user_id = c_custkey
    """,
    doc="J1 stream-static left equi join (streaming_rec.py:189), batch twin: "
    "fact left-joined to the customer dimension. No forced broadcast hint "
    "(VERDICT r8 #3): customer grows with scale factor, so the strategy is "
    "AQE's call — broadcast at bench sf, SMJ once the dim outgrows the "
    "threshold on a real cluster.",
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    customer = load(spark, sf_dir, "customer")
    return events.join(
        customer, events.user_id == customer.c_custkey, "left"
    ).select(
        "event_id",
        events.user_id.alias("user_id"),
        "event_type",
        "value",
        F.col("c_mktsegment").alias("segment"),
    )


@register(
    "join_star_2hop",
    oracle=f"""
    WITH ratings AS ({RATINGS_SQL})
    SELECT n_name AS nation, p_brand AS brand,
           COUNT(*) AS cnt, SUM(rating) AS sum_rating
    FROM ratings
    JOIN customer ON user_id = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN part ON item_id = p_partkey
    GROUP BY n_name, p_brand
    """,
    doc="J2 graph-pattern join (MATCH (u)-[r]->(m), spark_als.py:145-150) as a "
    "star join: fact ⋈ dims, grouped rollup. Only nation keeps a broadcast "
    "hint (25 rows at EVERY scale factor); customer and part grow with sf, "
    "so their strategy is AQE's call (VERDICT r8 #3).",
)
def join_star_2hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = ratings(spark, sf_dir)
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    part = load(spark, sf_dir, "part")
    return (
        r.join(customer, r.user_id == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(part, r.item_id == part.p_partkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("p_brand").alias("brand"))
        .agg(F.count("*").alias("cnt"), F.sum("rating").alias("sum_rating"))
    )


@register(
    "anti_join_unseen_items",
    oracle=f"""
    WITH ratings AS ({RATINGS_SQL})
    SELECT p_partkey AS item_id FROM part
    WHERE NOT EXISTS (
        SELECT 1 FROM ratings WHERE user_id = 1 AND item_id = p_partkey
    )
    """,
    doc="J3 anti-join: candidate items minus user 1's already-rated set. The "
    "reference collected the rated set to a driver-side python set "
    "(recommend.py:113-135); left_anti keeps it distributed.",
)
def anti_join_unseen_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    seen = ratings(spark, sf_dir).filter(F.col("user_id") == 1).select("item_id")
    return part.join(seen, part.p_partkey == seen.item_id, "left_anti").select(
        part.p_partkey.alias("item_id")
    )


@register(
    "cross_join_scoring",
    oracle="""
    SELECT c_custkey AS user_id, p_partkey AS item_id,
           ROUND(p_retailprice * 0.01, 4) AS score
    FROM (SELECT c_custkey FROM customer WHERE c_custkey = 1) CROSS JOIN part
    """,
    doc="J5 cartesian score expansion (recommend.py:127-130): one user x all "
    "items -> scoring input. Single-row side is broadcast, so the 'cross' "
    "join is a free map-side expansion at scale.",
)
def cross_join_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    user = (
        load(spark, sf_dir, "customer").filter(F.col("c_custkey") == 1).select("c_custkey")
    )
    part = load(spark, sf_dir, "part")
    return F.broadcast(user).crossJoin(part).select(
        F.col("c_custkey").alias("user_id"),
        F.col("p_partkey").alias("item_id"),
        F.round(F.col("p_retailprice") * 0.01, 4).alias("score"),
    )


# ---------------------------------------------------------------------------
# Set operations (§2.7 — beyond-reference coverage)
# ---------------------------------------------------------------------------


@register(
    "set_ops_union_distinct",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    UNION
    SELECT user_id FROM events WHERE event_type = 'signup'
    """,
    doc="Set op: UNION (distinct) of two filtered scans.",
)
def set_ops_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    a = events.filter(F.col("event_type") == "purchase").select("user_id")
    b = events.filter(F.col("event_type") == "signup").select("user_id")
    return a.union(b).distinct()


@register(
    "set_ops_except",
    oracle="""
    SELECT DISTINCT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
    FROM events WHERE event_type = 'purchase'
    EXCEPT
    SELECT DISTINCT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
    FROM events WHERE event_type = 'error'
    """,
    doc="Set op: EXCEPT — (user, day) pairs with a purchase but no error "
    "that day. Keyed at day granularity so the difference is non-empty at "
    "every SF (a user-level EXCEPT was vacuously empty on the test data).",
)
def set_ops_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd").alias("day")
    a = events.filter(F.col("event_type") == "purchase").select("user_id", day).distinct()
    b = events.filter(F.col("event_type") == "error").select("user_id", day).distinct()
    return a.exceptAll(b).distinct()


# ---------------------------------------------------------------------------
# Delimited-text round trip (S1 scan semantics + F1/F2/F8 parse functions)
# ---------------------------------------------------------------------------


@register(
    "roundtrip_delimited_parse",
    oracle="SELECT event_id, user_id, value FROM events",
    doc="S1 delimited scan semantics (spark_als.py:43-70): serialize rows to "
    "tab-separated lines, then split/get/cast back to typed columns — all as "
    "column expressions (the reference used an RDD map). Oracle is identity: "
    "a correct round-trip reproduces the input exactly.",
)
def roundtrip_delimited_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    lines = events.select(
        F.concat_ws(
            "\t",
            F.col("event_id").cast("string"),
            F.col("user_id").cast("string"),
            F.col("value").cast("string"),
        ).alias("line")
    )
    parts = lines.select(F.split(F.col("line"), "\t").alias("p"))
    return parts.select(
        F.element_at("p", 1).cast("long").alias("event_id"),
        F.element_at("p", 2).cast("long").alias("user_id"),
        F.element_at("p", 3).cast("double").alias("value"),
    )


@register(
    "json_extract_props",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS item_ref
    FROM events
    """,
    doc="F12 JSON extraction: pull key 'k' out of the props payload (used as "
    "the stream's item reference). Both engines parse JSON — Spark "
    "get_json_object, DuckDB json_extract_string — so the check is robust "
    "to key order / extra keys, not a first-number regex coincidence.",
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("item_ref"),
    )


N_SALT = 8


@register(
    "salted_join_segment_counts",
    oracle="""
    SELECT c_mktsegment AS segment, COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="Skew-safe salted join (scale technique, same result as the plain "
    "join the oracle runs): the probe side carries a deterministic salt "
    "(event_id mod 8) and the build side is replicated once per salt "
    "value, so a hot user key's rows spread across 8 reducer partitions "
    "instead of stalling one. This is the manual form of what AQE skew-join "
    "does adaptively; kept explicit so the engine exercises the pattern.",
)
def salted_join_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events").select(
        "user_id",
        "value",
        F.pmod("event_id", F.lit(N_SALT)).cast("int").alias("salt"),
    )
    customer = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        "c_mktsegment",
        F.explode(F.sequence(F.lit(0), F.lit(N_SALT - 1))).alias("salt"),
    )
    return (
        events.join(customer, ["user_id", "salt"])
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


@register(
    "nested_struct_history",
    oracle="""
    SELECT user_id,
           array_to_string(
               (list(event_id || ':' || event_type ORDER BY ts, event_id))[1:3],
               ',') AS first3
    FROM events
    GROUP BY user_id
    """,
    doc="Nested array<struct> handling (the type shape of ALS's "
    "recommendations column, spark_als.py:127-130): per user, collect the "
    "event history as an array of structs, array_sort by (ts, event_id), "
    "slice the first 3 — then serialize for engine-portable hashing. "
    "collect_list + array_sort is the distributed form of per-key ordered "
    "history assembly (one shuffle, no window).",
)
def nested_struct_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    hist = events.groupBy("user_id").agg(
        F.slice(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            1,
            3,
        ).alias("h")
    )
    return hist.select(
        "user_id",
        F.concat_ws(
            ",",
            F.transform(
                "h",
                lambda s: F.concat_ws(
                    ":", s.event_id.cast("string"), s.event_type
                ),
            ),
        ).alias("first3"),
    )


@register(
    "semi_join_active_customers",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE EXISTS (
        SELECT 1 FROM events
        WHERE user_id = c_custkey AND event_type = 'purchase'
    )
    """,
    doc="Left-semi join (completes the join-type matrix with J3's anti): "
    "customers with at least one purchase event — EXISTS as a semi join "
    "keeps only the key column of the probe side in the shuffle and "
    "short-circuits on first match (no row multiplication, unlike an "
    "inner join + distinct).",
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    purchasers = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id")
    )
    return customer.join(
        purchasers, customer.c_custkey == purchasers.user_id, "left_semi"
    ).select("c_custkey", "c_mktsegment")


@register(
    "set_ops_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    doc="INTERSECT (completes the set-op family with union/except): users "
    "who both clicked and purchased — plans as a left-semi join on the "
    "deduplicated sides, one shuffle each.",
)
def set_ops_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    clickers = events.filter(F.col("event_type") == "click").select("user_id")
    buyers = events.filter(F.col("event_type") == "purchase").select("user_id")
    return clickers.intersect(buyers)


# ---------------------------------------------------------------------------
# Blocked record linkage (entity resolution)
# ---------------------------------------------------------------------------


# Tight-pass blocking granularity: suppliers per (nation, hash-class)
# block stays ~constant because the modulus GROWS with the supplier count —
# blk_m = 10^len(str(n_supplier // 250)), i.e. the next power of ten above
# n_supplier/250 (floor 10). Pure integer/string arithmetic ('1' || zeros)
# so the DuckDB twin is bit-exact by construction — the _n_planes_sql
# lesson: any corpus-sized parameter baked as a constant silently diverges
# from the engine at bigger sf. The r8 100x probe proved the fixed %10 key
# quadratic in replicas (one decade after the r7 cascade fix bought the
# first): block count must scale with data, not just block layering.
#
# The class itself is md5-bucket(key) % blk_m, NOT key % blk_m: the same
# probe showed raw-modulus classes collapse when keys are structured
# (the replica offsets left 96% of customers in empty blocks, dumping
# 1.44M entities into the quadratic nation-only fallback — and production
# IDs are range/shard-structured the same way). Hashing declusters any
# key structure, so block occupancy is ~Poisson(n_s / (25·blk_m)) at
# every scale. Same engine-portable md5 pattern as operators/sampling.
RECORD_LINKAGE_BLK_TARGET = 250

_BLK_M_SQL = (
    "SELECT CAST('1' || REPEAT('0', LENGTH(CAST(COUNT(*)"
    f" // {RECORD_LINKAGE_BLK_TARGET} AS VARCHAR))) AS BIGINT) AS blk_m"
    " FROM supplier"
)


def _blk_class_sql(key_expr: str) -> str:
    """md5-bucket(key) % blk_m — DuckDB twin of _blk_class_spark."""
    return (
        f"CAST(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 8)) "
        "AS BIGINT) % (SELECT blk_m FROM m)"
    )


def _blk_class_spark(key_col, blk_m_col):
    return (
        F.conv(F.substring(F.md5(key_col.cast("string")), 1, 8), 16, 10).cast(
            "long"
        )
        % blk_m_col
    )


@register(
    "record_linkage_blocked",
    oracle=f"""
    WITH m AS ({_BLK_M_SQL}),
    tight AS (
        SELECT c.c_custkey, s.s_suppkey,
               levenshtein(substr(c.c_name, 10), substr(s.s_name, 10)) AS dist
        FROM customer c JOIN supplier s
          ON c.c_nationkey = s.s_nationkey
         AND {_blk_class_sql("c.c_custkey")} = {_blk_class_sql("s.s_suppkey")}
    ),
    fallback AS (
        SELECT c.c_custkey, s.s_suppkey,
               levenshtein(substr(c.c_name, 10), substr(s.s_name, 10)) AS dist
        FROM customer c JOIN supplier s ON c.c_nationkey = s.s_nationkey
        WHERE NOT EXISTS (
            SELECT 1 FROM tight t WHERE t.c_custkey = c.c_custkey
        )
    ),
    ranked AS (
        SELECT c_custkey, s_suppkey AS best_suppkey, dist AS best_dist,
               ROW_NUMBER() OVER (
                   PARTITION BY c_custkey ORDER BY dist, s_suppkey
               ) AS rk
        FROM (SELECT * FROM tight UNION ALL SELECT * FROM fallback)
    )
    SELECT c_custkey, best_suppkey, best_dist
    FROM ranked WHERE rk = 1
    """,
    doc="Blocked record linkage with multi-pass (cascade) blocking -- the "
    "entity-resolution shape at scale: pass 1 generates candidate pairs "
    "from a TIGHT composite blocking key (nation, md5-bucket(entity id) "
    "mod blk_m), where blk_m is DATA-DERIVED (next power of ten above "
    "n_supplier/250, floor 10, integer-exact SQL twin) so suppliers per "
    "block stay ~constant and the pair count grows LINEARLY with data — "
    "the r8 100x probe showed any fixed-cardinality key (the r7 %10) "
    "makes pairs quadratic in scale, and that RAW-modulus classes "
    "collapse on structured keys (hash first; see _blk_class_spark); "
    "the r7 10x sweep showed the same quadratic for single-level "
    "nation blocking (~60x for 10x). Only entities the "
    "tight block could not match at all fall back to the coarse "
    "nation-only block, so coverage equals single-pass nation blocking. "
    "The customer (CPU-dense probe) side repartitions on the block key "
    "before the tight join (ADVICE r8 doc fix — the supplier side is "
    "NOT repartitioned: under a shuffle join it gets its own "
    "ENSURE_REQUIREMENTS exchange, and under an AQE broadcast it needs "
    "none): at scale that exchange IS the shuffle the equi-join needs "
    "(reused, not extra), and when AQE broadcasts the small supplier "
    "side instead, it unbinds the CPU-dense levenshtein pass from the "
    "input split count (the 100x probe saw 4-way scan parallelism "
    "starve 32 cores). "
    "Each candidate is scored with an edit distance on the normalized "
    "name (levenshtein, JVM built-in, scan-side); the best match per "
    "left entity survives via a map-side-combining MIN over "
    "(dist, suppkey) structs. Deterministic integer distances keep the "
    "oracle exact.",
)
def record_linkage_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    # 1-row broadcast scalar: blk_m = '1' || '0'*len(str(n//250)) as BIGINT
    # (identical expression in the oracle CTE; no floats anywhere)
    blk_m = supplier.agg(F.count("*").alias("n_s")).select(
        F.concat(
            F.lit("1"),
            F.expr(
                "repeat('0', length(cast((n_s div "
                f"{RECORD_LINKAGE_BLK_TARGET}) as string)))"
            ),
        )
        .cast("long")
        .alias("blk_m")
    )

    def _pairs(cust: DataFrame, tight: bool) -> DataFrame:
        # No broadcast hint on supplier: it grows linearly with scale
        # factor, so a forced broadcast would be a 100 TB lie (ADVICE r7).
        # AQE picks broadcast at small scale from observed sizes; at scale
        # both passes are plain shuffle equi-joins whose distribution the
        # explicit block-key repartition below already satisfies.
        if tight:
            c = cust.crossJoin(F.broadcast(blk_m)).withColumn(
                "blk", _blk_class_spark(F.col("c_custkey"), F.col("blk_m"))
            )
            s = supplier.crossJoin(F.broadcast(blk_m)).withColumn(
                "blk", _blk_class_spark(F.col("s_suppkey"), F.col("blk_m"))
            )
            keys = ["c_nationkey", "blk"]
            cond = (c.c_nationkey == s.s_nationkey) & (c.blk == s.blk)
        else:
            c, s = cust, supplier
            keys = ["c_nationkey"]
            cond = c.c_nationkey == s.s_nationkey
        # TIGHT pass only: repartition the CPU-dense side on the block key
        # — reused by the shuffle join at scale, and under an AQE broadcast
        # it lifts levenshtein parallelism from #input-splits to
        # #shuffle-partitions. The count is EXPLICIT (REPARTITION_BY_NUM):
        # AQE coalesces column-only repartitions by shuffle BYTES, blind to
        # downstream CPU — the 100x probe watched it squeeze 6M levenshtein
        # pairs into one task (~3 min on one core while 31 idled). The
        # fallback pass skips it: its input is the unmatched residue
        # (~2% of customers by the Poisson(4) block design), so scan-split
        # parallelism suffices and the extra shuffle would be pure small-sf
        # overhead.
        if tight:
            n_parts = shuffle_partitions(cust.sparkSession)
            c = c.repartition(n_parts, *keys)
        return c.join(s, cond).select(
            "c_custkey",
            "s_suppkey",
            F.levenshtein(
                F.substring("c_name", 10, 100), F.substring("s_name", 10, 100)
            ).alias("dist"),
        )

    # best match per entity as a MIN over (dist, suppkey) structs — the
    # aggregate partial-combines map-side inside each block, so the shuffle
    # carries one candidate per (partition, custkey) instead of sorting the
    # full blocked pair set like a row_number formulation would; the
    # struct's lexicographic order is the deterministic (dist, s_suppkey)
    # tie-break.
    def _best(pairs: DataFrame) -> DataFrame:
        return pairs.groupBy("c_custkey").agg(
            F.min(F.struct("dist", "s_suppkey")).alias("m")
        )

    # tight_best is read by BOTH the fallback's anti-join and the final
    # union; the 100x probe measured the lazy checkpoint as a wash there
    # (the tight pass is cheap once blocking is right), so the plan stays
    # checkpoint-free and lets the two consumers share the shuffle output.
    tight_best = _best(_pairs(customer, tight=True))
    unmatched = customer.join(tight_best, "c_custkey", "left_anti")
    fallback_best = _best(_pairs(unmatched, tight=False))
    return tight_best.unionByName(fallback_best).select(
        "c_custkey",
        F.col("m.s_suppkey").alias("best_suppkey"),
        F.col("m.dist").alias("best_dist"),
    )


# ---------------------------------------------------------------------------
# Pre-aggregation below a join (partial-aggregation pushdown)
# ---------------------------------------------------------------------------


@register(
    "preagg_join_rollup",
    oracle="""
    -- revenue in exact integer ten-thousandths: price and discount are
    -- exact cents, so round(price*100) * (100 - round(discount*100)) is
    -- an exact BIGINT per row and the SUM is order-independent -- the
    -- double SUM(price * (1 - discount)) diverged between engines by
    -- ~0.01 on 1e10-scale nation totals at 10x data (accumulation order)
    WITH per_supp AS (
        SELECT l_suppkey,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                   AS revenue_e4,
               COUNT(*) AS n_items
        FROM lineitem GROUP BY l_suppkey
    )
    SELECT n.n_name,
           CAST(SUM(ps.n_items) AS BIGINT) AS n_items,
           CAST(SUM(ps.revenue_e4) AS BIGINT) / 10000.0 AS revenue
    FROM per_supp ps
    JOIN supplier s ON ps.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="Aggregation pushed BELOW the join: revenue per nation computed by "
    "first collapsing lineitem to per-supplier partials (the fact "
    "table's one shuffle, map-side combined), then joining the "
    "supplier-count-sized aggregate to the dimensions and re-"
    "aggregating -- the eager-aggregation rewrite (Yan & Larson) that "
    "Catalyst does NOT apply automatically. The naive join-then-agg "
    "plan shuffles every fact ROW into the join; this one shuffles "
    "per-key PARTIALS, cutting exchange volume by the fact:supplier "
    "ratio (~60x here, unbounded at 100 TB). Correct because revenue "
    "is algebraic and the join is N:1 along the supplier FK -- the "
    "re-aggregation over nations merges disjoint supplier partials. "
    "Revenue accumulates in exact integer ten-thousandths (prices and "
    "discounts are exact cents), so the partial/merge result is "
    "order-independent -- the double-SUM form diverged ~0.01 on "
    "1e10-scale totals at 10x data from accumulation order alone.",
)
def preagg_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(price_c * (F.lit(100) - disc_pct)).alias("revenue_e4"),
        F.count("*").alias("n_items"),
    )
    # supplier grows with scale factor — no forced broadcast (VERDICT r8
    # #3); the per-supplier partials are supplier-cardinality anyway, so
    # AQE broadcasts at small sf and falls back to SMJ when the dim
    # outgrows the threshold. nation is 25 rows at every sf.
    return (
        per_supp.join(supplier, per_supp.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum("n_items").alias("n_items"),
            (F.sum("revenue_e4").cast("long") / F.lit(10000.0)).alias(
                "revenue"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Join-cardinality estimation audit
# ---------------------------------------------------------------------------


@register(
    "join_size_estimation_audit",
    oracle="""
    WITH ce AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
    co AS (SELECT o_custkey AS user_id, COUNT(*) AS n
           FROM orders GROUP BY o_custkey),
    est AS (
        SELECT CAST(SUM(ce.n * co.n) AS BIGINT) AS estimated
        FROM ce JOIN co USING (user_id)
    ),
    act AS (
        SELECT COUNT(*) AS actual
        FROM events e JOIN orders o ON e.user_id = o.o_custkey
    )
    SELECT estimated, actual, estimated = actual AS exact_match
    FROM est CROSS JOIN act
    """,
    doc="Join-cardinality estimation from per-key frequency statistics: "
    "|A join B| on an equi key is EXACTLY sum over keys of "
    "cnt_A(k) * cnt_B(k) -- the identity every cost-based optimizer "
    "approximates with histograms/sketches, computed here both ways "
    "(the key-count product from two tiny aggregates, and the real "
    "join count) with equality asserted in the output. At 100 TB the "
    "left form costs two map-side-combined aggregates over key-count "
    "tables instead of materializing the join -- which is why ANALYZE "
    "collects exactly these statistics, and what AQE's runtime "
    "estimates converge to. A planner eats the estimate; this row "
    "proves it honest.",
)
def join_size_estimation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    orders = load(spark, sf_dir, "orders")
    ce = events.groupBy("user_id").agg(F.count("*").alias("ne"))
    co = orders.groupBy(F.col("o_custkey").alias("user_id")).agg(
        F.count("*").alias("no")
    )
    est = ce.join(co, "user_id").agg(
        F.sum(F.col("ne") * F.col("no")).alias("estimated")
    )
    act = events.join(orders, events.user_id == orders.o_custkey).agg(
        F.count("*").alias("actual")
    )
    return est.crossJoin(act).select(
        "estimated",
        "actual",
        (F.col("estimated") == F.col("actual")).alias("exact_match"),
    )
