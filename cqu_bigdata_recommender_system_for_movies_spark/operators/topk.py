"""Sorts, limits, top-k, window ranking (SURVEY.md §2.5, §2.6).

The reference computed top-k five different ways (rdd.top, orderBy.limit,
driver-side sorted()[:k], Cypher LIMIT, torch.topk — SURVEY §2.6); all of
them land on two Spark shapes here:

- global top-k  -> orderBy(...).limit(k): Catalyst plans TakeOrderedAndProject
  (per-partition heap + driver merge of k rows — no global sort, scales to
  any input size);
- per-key top-k -> Window.partitionBy(key).orderBy(desc) + row_number() <= k:
  one shuffle on the key, sort within partitions only.

Every LIMIT query orders by a tie-broken unique key set so the selected
rows are deterministic for the oracle hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cqu_bigdata_recommender_system_for_movies_spark.plans.registry import register
from cqu_bigdata_recommender_system_for_movies_spark.tables import RATINGS_SQL, load, ratings, sql_in_list


@register(
    "orderby_limit_topk",
    oracle="""
    SELECT event_id, user_id, value
    FROM events
    ORDER BY value DESC, event_id
    LIMIT 25
    """,
    doc="T2/T4 order-by + limit (distributed.py:277): global top-25 events by "
    "value. Plans as TakeOrderedAndProject, not a full sort.",
)
def orderby_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .select("event_id", "user_id", "value")
        .orderBy(F.desc("value"), F.asc("event_id"))
        .limit(25)
    )


@register(
    "topk_per_user_window",
    oracle=f"""
    WITH ratings AS ({RATINGS_SQL}),
    ranked AS (
        SELECT user_id, item_id, rating,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id
                   ORDER BY rating DESC, item_id, ts
               ) AS rnk
        FROM ratings
    )
    SELECT user_id, item_id, rating, rnk FROM ranked WHERE rnk <= 5
    """,
    doc="§2.5 per-user top-k via window rank — the distributed form of the "
    "reference's per-user recommendation ranking (recommend.py:134, "
    "recommendForAllUsers' TopByKey). One shuffle on user_id.",
)
def topk_per_user_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(
        F.desc("rating"), F.asc("item_id"), F.asc("ts")
    )
    return (
        ratings(spark, sf_dir)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("user_id", "item_id", "rating", "rnk")
    )


@register(
    "topk_avg_rating_items",
    oracle=f"""
    WITH ratings AS ({RATINGS_SQL})
    SELECT item_id, AVG(rating) AS avg_rating, COUNT(*) AS cnt
    FROM ratings
    GROUP BY item_id
    ORDER BY avg_rating DESC, item_id
    LIMIT 10
    """,
    doc="T4 aggregate-then-top-k (cold_rec.py:57-65 ORDER BY avg DESC head(k)).",
)
def topk_avg_rating_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        ratings(spark, sf_dir)
        .groupBy("item_id")
        .agg(F.avg("rating").alias("avg_rating"), F.count("*").alias("cnt"))
        .orderBy(F.desc("avg_rating"), F.asc("item_id"))
        .limit(10)
    )


@register(
    "top1_per_user_maxby",
    oracle=f"""
    WITH ratings AS ({RATINGS_SQL})
    SELECT user_id,
           arg_max(item_id, rating * 1000000 + item_id) AS best_item,
           MAX(rating) AS best_rating
    FROM ratings
    GROUP BY user_id
    """,
    doc="Per-group top-1 as an AGGREGATE (max_by), not a window: unlike "
    "row_number() — which shuffles every row to its key's reducer before "
    "discarding all but one — max_by partial-aggregates map-side, so the "
    "shuffle carries ONE candidate row per (partition, user) instead of "
    "the whole fact table. At 100 TB this is the difference between "
    "shuffling the corpus and shuffling a user-count-sized set. Ties "
    "broken deterministically via a composite (rating, item_id) ordinal, "
    "reproduced exactly by the DuckDB arg_max oracle.",
)
def top1_per_user_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = ratings(spark, sf_dir)
    ordinal = F.col("rating") * 1000000 + F.col("item_id")
    return r.groupBy("user_id").agg(
        F.max_by("item_id", ordinal).alias("best_item"),
        F.max("rating").alias("best_rating"),
    )


# --- NDCG@k ranking evaluation ---------------------------------------------

NDCG_K = 10
NDCG_REL_THRESHOLD = 40.0  # rating >= threshold counts as relevant


@register(
    "ndcg_at_k_popularity",
    oracle=f"""
    WITH ratings AS ({RATINGS_SQL}),
    pop AS (
        SELECT item_id,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, item_id) AS pos
        FROM ratings GROUP BY item_id
        QUALIFY pos <= {NDCG_K}
    ),
    rel AS (
        SELECT DISTINCT user_id, item_id FROM ratings
        WHERE rating >= {NDCG_REL_THRESHOLD}
    ),
    nrel AS (SELECT user_id, COUNT(*) AS n_relevant FROM rel GROUP BY user_id),
    dcg AS (
        SELECT rel.user_id, SUM(1.0 / log2(pop.pos + 1)) AS dcg
        FROM rel JOIN pop USING (item_id)
        GROUP BY rel.user_id
    )
    SELECT nrel.user_id,
           CAST(nrel.n_relevant AS BIGINT) AS n_relevant,
           ROUND(COALESCE(dcg.dcg, 0) /
                 list_sum([1.0 / log2(j + 1)
                           for j in range(1, least(nrel.n_relevant, {NDCG_K}) + 1)]),
                 4) AS ndcg_at_k
    FROM nrel LEFT JOIN dcg ON nrel.user_id = dcg.user_id
    """,
    doc="NDCG@k for the popularity recommender (M6's P@k/R@k completed "
    "with the position-discounted metric every ranking eval reports): "
    f"the global top-{NDCG_K} popular items (count desc, id tie-break) "
    "are the one-ranking-for-all-users recommendation (M9's cold-start "
    "strategy); per user, DCG sums 1/log2(pos+1) over relevant hits "
    f"(rating >= {NDCG_REL_THRESHOLD}) and IDCG is the ideal prefix sum "
    "truncated at min(|relevant|, k) — computed as a per-row constant-"
    "size array fold, no join against a rank spine. Scale shape: the "
    f"popularity ranking is a {NDCG_K}-row broadcast; everything else "
    "is one distinct + two user-keyed aggregates. No per-user model "
    "state — this evaluates ANY global ranking at 100 TB in two "
    "shuffles.",
)
def ndcg_at_k_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    r = ratings(spark, sf_dir)
    # top-K first via orderBy+limit — a distributed TakeOrderedAndProject
    # (map-side partial top-k) — so the position window only ever sees K
    # rows; ranking the FULL item table in one unpartitioned window was
    # the round-5 shape, correct but single-reducer at catalog scale
    pop = (
        r.groupBy("item_id")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("item_id"))
        .limit(NDCG_K)
        .withColumn(
            "pos",
            F.row_number().over(
                Window.orderBy(F.desc("cnt"), F.asc("item_id"))
            ),
        )
        .select("item_id", "pos")
    )
    rel = (
        r.filter(F.col("rating") >= NDCG_REL_THRESHOLD)
        .select("user_id", "item_id")
        .distinct()
    )
    nrel = rel.groupBy("user_id").agg(F.count("*").alias("n_relevant"))
    dcg = (
        rel.join(F.broadcast(pop), "item_id")
        .groupBy("user_id")
        .agg(F.sum(1.0 / F.log2(F.col("pos") + 1)).alias("dcg"))
    )
    ideal = F.aggregate(
        F.sequence(F.lit(1), F.least(F.col("n_relevant"), F.lit(NDCG_K))),
        F.lit(0.0),
        lambda acc, j: acc + 1.0 / F.log2(j + 1),
    )
    return (
        nrel.join(dcg, "user_id", "left")
        .select(
            "user_id",
            "n_relevant",
            F.round(F.coalesce("dcg", F.lit(0.0)) / ideal, 4).alias("ndcg_at_k"),
        )
    )


AUC_POSITIVE_TYPES = ("purchase", "signup")


@register(
    "auc_rank_sum",
    oracle=f"""
    WITH l AS (
        SELECT date_trunc('day', ts) AS day,
               CASE WHEN event_type IN {sql_in_list(AUC_POSITIVE_TYPES)}
                    THEN 1 ELSE 0 END AS y,
               value AS s
        FROM events
    ),
    r AS (
        SELECT day, y,
               RANK() OVER (PARTITION BY day ORDER BY s)
                 + (COUNT(*) OVER (PARTITION BY day, s) - 1) / 2.0 AS midrank
        FROM l
    ),
    agg AS (
        SELECT day,
               SUM(y) AS n_pos,
               COUNT(*) - SUM(y) AS n_neg,
               SUM(CASE WHEN y = 1 THEN midrank ELSE 0 END) AS pos_ranks
        FROM r GROUP BY day
    )
    SELECT day, CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
           ROUND((pos_ranks - n_pos * (n_pos + 1) / 2.0)
                 / NULLIF(n_pos * n_neg, 0), 6) AS auc
    FROM agg
    """,
    doc="Distributed AUC (Mann-Whitney rank-sum) per day: ranks positives "
    "vs negatives on the score column with midrank tie handling. The "
    "plan compacts rows to per-(day, score) positive/negative counts "
    "FIRST — one partial-aggregated shuffle — and runs the cumulative "
    "window over that compacted table, so the sort touches distinct "
    "scores, not raw events (the oracle windows over raw rows — the "
    "formulation a single node can afford). Equality is exact, not "
    "approximate: every intermediate is a dyadic rational (integers and "
    "halves), so both formulations agree bit-for-bit under the rank-sum "
    "identity U = sum_s pos_s * (cum_neg_before + neg_s / 2).",
)
def auc_rank_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    labeled = events.select(
        F.date_trunc("day", "ts").cast("date").alias("day"),
        F.col("event_type").isin(*AUC_POSITIVE_TYPES).cast("int").alias("y"),
        F.col("value").alias("s"),
    )
    per_score = labeled.groupBy("day", "s").agg(
        F.sum("y").alias("np_s"),
        (F.count("*") - F.sum("y")).alias("nn_s"),
    )
    w = (
        Window.partitionBy("day")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = per_score.select(
        "day",
        "np_s",
        "nn_s",
        (
            F.col("np_s")
            * (
                F.coalesce(F.sum("nn_s").over(w), F.lit(0)).cast("double")
                + F.col("nn_s") / 2.0
            )
        ).alias("u_s"),
    )
    agg = contrib.groupBy("day").agg(
        F.sum("np_s").alias("n_pos"),
        F.sum("nn_s").alias("n_neg"),
        F.sum("u_s").alias("u"),
    )
    return agg.select(
        "day",
        "n_pos",
        "n_neg",
        F.round(
            F.col("u") / F.nullif((F.col("n_pos") * F.col("n_neg")).cast("double"), F.lit(0.0)),
            6,
        ).alias("auc"),
    )


CALIBRATION_N_BINS = 10


@register(
    "calibration_bins",
    oracle=f"""
    WITH stats AS (SELECT MIN(value) AS mn, MAX(value) AS mx FROM events),
    binned AS (
        SELECT LEAST(CAST(floor((value - mn) / (mx - mn) * {CALIBRATION_N_BINS})
                          AS INTEGER), {CALIBRATION_N_BINS - 1}) AS bin,
               CASE WHEN event_type IN {sql_in_list(AUC_POSITIVE_TYPES)}
                    THEN 1 ELSE 0 END AS y,
               value
        FROM events CROSS JOIN stats
    )
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           ROUND(AVG(value), 4) AS mean_value,
           ROUND(SUM(y) / CAST(COUNT(*) AS DOUBLE), 6) AS pos_rate
    FROM binned GROUP BY bin
    """,
    doc="Calibration / reliability bins for the same labels as "
    "auc_rank_sum: equal-WIDTH score bins from a broadcast (min, max) — "
    "deliberately not NTILE deciles, because a global quantile sort of "
    "the fact table is the one plan that cannot scale; equal-width "
    "binning is one aggregate + broadcast + one grouped aggregate, and "
    "the production decile variant substitutes approx-quantile "
    "boundaries for (min, max) with the identical plan. Bin assignment "
    "is the same arithmetic expression in both engines (IEEE ops on "
    "identical doubles), so bin edges cannot disagree.",
)
def calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    stats = events.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    binned = events.crossJoin(F.broadcast(stats)).select(
        F.least(
            F.floor(
                (F.col("value") - F.col("mn"))
                / (F.col("mx") - F.col("mn"))
                * CALIBRATION_N_BINS
            ).cast("int"),
            F.lit(CALIBRATION_N_BINS - 1),
        ).alias("bin"),
        F.col("event_type").isin(*AUC_POSITIVE_TYPES).cast("int").alias("y"),
        "value",
    )
    return binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.sum("y").alias("n_pos"),
        F.round(F.avg("value"), 4).alias("mean_value"),
        F.round(F.sum("y") / F.count("*").cast("double"), 6).alias("pos_rate"),
    )


TWO_PHASE_K = 5
TWO_PHASE_SALTS = 8


def salted_topk(
    df: DataFrame, partition_cols, order, k: int, salt_expr, n_salts: int = 8
) -> DataFrame:
    """Skew-proof per-group top-k in TWO phases.

    Phase 1 ranks within (group, salt = salt_expr % n_salts) and keeps
    each salt's local top-k — any global top-k row is necessarily in its
    own salt's local top-k, so the prune is lossless and bounds the
    survivors at n_salts*k per group; phase 2 re-ranks only the
    survivors. A hot group's sort spreads across n_salts partitions
    instead of one reducer — the two-level shape MLlib's TopByKey and
    every skewed leaderboard job use. Output (column ``rnk``) is
    identical to the single-window formulation.
    """
    # withColumn silently REPLACES an existing column of the same name,
    # which would corrupt results with no error (ADVICE r6) — refuse
    # inputs that already carry the temp/output names.
    clash = {"__salt", "__lrnk", "rnk"} & set(df.columns)
    if clash:
        raise ValueError(
            f"salted_topk reserves columns {sorted(clash)}; rename them "
            "on the input DataFrame first"
        )
    salted = df.withColumn("__salt", F.pmod(salt_expr, F.lit(n_salts)))
    w_local = Window.partitionBy(*partition_cols, "__salt").orderBy(*order)
    survivors = (
        salted.withColumn("__lrnk", F.row_number().over(w_local))
        .filter(F.col("__lrnk") <= k)
        .drop("__salt", "__lrnk")
    )
    w_global = Window.partitionBy(*partition_cols).orderBy(*order)
    return (
        survivors.withColumn("rnk", F.row_number().over(w_global))
        .filter(F.col("rnk") <= k)
    )


@register(
    "two_phase_topk",
    oracle=f"""
    WITH ratings AS ({RATINGS_SQL}),
    ranked AS (
        SELECT item_id, user_id, rating,
               ROW_NUMBER() OVER (
                   PARTITION BY item_id
                   ORDER BY rating DESC, user_id, ts
               ) AS rnk
        FROM ratings
    )
    SELECT item_id, user_id, rating, rnk
    FROM ranked WHERE rnk <= {TWO_PHASE_K}
    """,
    doc=f"Per-key top-{TWO_PHASE_K} in TWO phases — the skew-proof shape "
    "for hot keys that melt a single window sort: phase 1 ranks within "
    f"(item, salt = user_id % {TWO_PHASE_SALTS}) partitions and keeps "
    f"each salt's local top-{TWO_PHASE_K} (any global top-k row is "
    "necessarily in its own salt's local top-k, so this prunes "
    f"losslessly to at most {TWO_PHASE_SALTS}x{TWO_PHASE_K} rows per "
    "item); phase 2 re-ranks only the survivors. A hot item's sort "
    "spreads across 8 salted partitions instead of one reducer — the "
    "same two-level shape MLlib's TopByKey and every skewed "
    "leaderboard job use. Output is identical to the single-window "
    "formulation, which is exactly what the oracle checks.",
)
def two_phase_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = ratings(spark, sf_dir)
    order = [F.desc("rating"), F.asc("user_id"), F.asc("ts")]
    return salted_topk(
        r, ["item_id"], order, TWO_PHASE_K, F.col("user_id"), TWO_PHASE_SALTS
    ).select("item_id", "user_id", "rating", "rnk")


@register(
    "next_item_training_pairs",
    oracle=f"""
    WITH r AS ({RATINGS_SQL}),
    seq AS (
        SELECT user_id, item_id, ts,
               LEAD(item_id) OVER w AS next_item,
               LEAD(ts) OVER w AS next_ts
        FROM r
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, item_id, rating)
    )
    SELECT user_id, item_id AS prev_item, next_item,
           CAST(date_diff('day', ts, next_ts) AS BIGINT) AS gap_days
    FROM seq WHERE next_item IS NOT NULL
    """,
    doc="Sequential-recommender training pairs (SASRec/GRU4Rec-style "
    "next-item prediction data): each user's interaction sequence in "
    "event-time order yields (prev_item, next_item, gap_days) examples "
    "via one LEAD window — one user_id shuffle, output rows = "
    "interactions minus users. Ties on (ts, item, rating) order "
    "identically in both engines, keeping the emitted pairs "
    "deterministic — the property that makes the corpus cacheable and "
    "the training run reproducible.",
)
def next_item_training_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = ratings(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "item_id", "rating")
    seq = r.select(
        "user_id",
        "item_id",
        "ts",
        F.lead("item_id").over(w).alias("next_item"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    return seq.filter(F.col("next_item").isNotNull()).select(
        "user_id",
        F.col("item_id").alias("prev_item"),
        "next_item",
        F.datediff("next_ts", "ts").cast("long").alias("gap_days"),
    )


# ---------------------------------------------------------------------------
# Recommendation-list diversity metrics
# ---------------------------------------------------------------------------

DIVERSITY_CAND_N = 30  # global popularity candidate pool
DIVERSITY_REC_K = 10  # recommendations per user


@register(
    "rec_diversity_metrics",
    oracle=f"""
    WITH ratings AS ({RATINGS_SQL}),
    pop AS (
        SELECT item_id, COUNT(*) AS pop
        FROM ratings GROUP BY item_id
        ORDER BY pop DESC, item_id
        LIMIT {DIVERSITY_CAND_N}
    ),
    users AS (SELECT DISTINCT user_id FROM ratings),
    cand AS (
        SELECT u.user_id, p.item_id, p.pop
        FROM users u CROSS JOIN pop p
        WHERE NOT EXISTS (
            SELECT 1 FROM ratings r
            WHERE r.user_id = u.user_id AND r.item_id = p.item_id
        )
    ),
    recs AS (
        SELECT user_id, item_id FROM (
            SELECT user_id, item_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY pop DESC, item_id
                   ) AS rk
            FROM cand
        ) WHERE rk <= {DIVERSITY_REC_K}
    ),
    exposure AS (
        SELECT item_id, COUNT(*) AS x FROM recs GROUP BY item_id
    ),
    ranked AS (
        SELECT x, ROW_NUMBER() OVER (ORDER BY x, item_id) AS r,
               COUNT(*) OVER () AS n, SUM(x) OVER () AS total
        FROM exposure
    )
    SELECT CAST(any_value(n) AS BIGINT) AS n_rec_items,
           (SELECT COUNT(*) FROM part) AS catalog_n,
           ROUND(any_value(n) / CAST((SELECT COUNT(*) FROM part) AS DOUBLE),
                 6) AS coverage,
           ROUND(2.0 * SUM(CAST(r AS DOUBLE) * x) / (any_value(n) * any_value(total))
                 - (any_value(n) + 1.0) / any_value(n), 6) AS exposure_gini
    FROM ranked
    """,
    doc="Recommendation-list health metrics -- catalog coverage and "
    "exposure Gini -- over the deterministic popularity recommender "
    "(top-{k} unseen items from a {c}-item global candidate pool per "
    "user, the cold-start policy's list form). Exposure counts how many "
    "users each item is shown to; the Gini over those counts is the "
    "standard popularity-bias alarm (1.0 = all exposure on one item), "
    "coverage the share of catalog ever recommended. The candidate "
    "pool is a top-k aggregate broadcast against users, seen-item "
    "removal is one anti-join shuffle, and both metrics reduce over an "
    "item-count-sized table -- list materialization never leaves the "
    "cluster.".format(k=DIVERSITY_REC_K, c=DIVERSITY_CAND_N),
)
def rec_diversity_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = ratings(spark, sf_dir).localCheckpoint(eager=False)  # 3 consumers
    pop = (
        r.groupBy("item_id")
        .agg(F.count("*").alias("pop"))
        .orderBy(F.col("pop").desc(), "item_id")
        .limit(DIVERSITY_CAND_N)
    )
    users = r.select("user_id").distinct()
    cand = users.crossJoin(F.broadcast(pop))
    # r17 (guide §2.3 — shuffle fewer bytes): only pairs involving the
    # DIVERSITY_CAND_N candidate items can ever match the anti-join, so
    # semi-join the seen pairs against the broadcast candidate pool
    # BEFORE the distinct — the dedup + anti-join shuffle carries the
    # candidates' pairs instead of the whole fact table's (measured
    # 2.28 -> 1.59 s warm at sf0.1; at 100 TB the cut is the catalog
    # fan-in: candidate-item pairs vs ALL pairs). Results identical.
    seen = r.select("user_id", "item_id").join(
        F.broadcast(pop.select("item_id")), "item_id", "semi"
    )
    unseen = cand.join(seen.distinct(), ["user_id", "item_id"], "left_anti")
    w = Window.partitionBy("user_id").orderBy(F.col("pop").desc(), "item_id")
    recs = unseen.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= DIVERSITY_REC_K
    )
    exposure = recs.groupBy("item_id").agg(F.count("*").alias("x"))
    ranked = exposure.select(
        "x",
        F.row_number().over(Window.orderBy("x", "item_id")).alias("r"),
        F.count("*").over(Window.partitionBy()).alias("n"),
        F.sum("x").over(Window.partitionBy()).alias("total"),
    )
    catalog_n = load(spark, sf_dir, "part").count()
    return ranked.agg(
        F.any_value("n").alias("n_rec_items"),
        F.lit(catalog_n).alias("catalog_n"),
        F.round(F.any_value("n") / F.lit(float(catalog_n)), 6).alias("coverage"),
        F.round(
            2.0
            * F.sum(F.col("r").cast("double") * F.col("x"))
            / (F.any_value("n") * F.any_value("total"))
            - (F.any_value("n") + 1.0) / F.any_value("n"),
            6,
        ).alias("exposure_gini"),
    )


# ---------------------------------------------------------------------------
# Time-decayed popularity
# ---------------------------------------------------------------------------

DECAY_LAMBDA_PER_DAY = 0.05
DECAY_TOP_N = 50


@register(
    "decayed_popularity_topk",
    oracle=f"""
    WITH r AS ({RATINGS_SQL}),
    mx AS (SELECT MAX(ts) AS max_ts FROM r),
    scored AS (
        SELECT item_id,
               SUM(exp(-{DECAY_LAMBDA_PER_DAY} *
                       (epoch(max_ts) - epoch(ts)) / 86400.0)) AS decayed,
               COUNT(*) AS n_ratings
        FROM r CROSS JOIN mx
        GROUP BY item_id
    )
    SELECT item_id, ROUND(decayed, 4) AS decayed_score, n_ratings
    FROM scored
    ORDER BY decayed DESC, item_id
    LIMIT {DECAY_TOP_N}
    """,
    doc="Exponentially time-decayed popularity (half-life ~14 days at "
    "lambda=0.05/day): each interaction contributes exp(-lambda*age), "
    "so trending items outrank stale blockbusters — the recency-aware "
    "upgrade of the cold-start popularity ranker, and the scoring rule "
    "behind 'trending now' shelves. The anchor timestamp is a 1-row "
    "broadcast MAX, the decay evaluates scan-side inside the map-side-"
    "combined SUM, and the top-k is over the item-count-sized "
    "aggregate. (The same decayed sums maintain INCREMENTALLY: "
    "yesterday's score x exp(-lambda) + today's partial — the "
    "incremental_agg_merge algebra.)",
)
def decayed_popularity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = ratings(spark, sf_dir)
    mx = r.agg(F.max("ts").alias("max_ts"))
    age_days = (
        F.unix_timestamp("max_ts") - F.unix_timestamp("ts")
    ) / F.lit(86400.0)
    return (
        r.crossJoin(F.broadcast(mx))
        .groupBy("item_id")
        .agg(
            F.sum(F.exp(-DECAY_LAMBDA_PER_DAY * age_days)).alias("decayed"),
            F.count("*").alias("n_ratings"),
        )
        .orderBy(F.col("decayed").desc(), "item_id")
        .limit(DECAY_TOP_N)
        .select(
            "item_id",
            F.round("decayed", 4).alias("decayed_score"),
            "n_ratings",
        )
    )
