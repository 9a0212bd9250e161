"""Incremental ALS user fold-in (M-family extension, beyond-reference).

The reference retrains ALS from scratch to pick up new users
(spark_als.py's whole-pipeline rerun). At 100 TB that is the wrong
shape: new users arrive continuously and a full refactorization per
batch is infeasible. The production answer is FOLD-IN — hold the
trained item factors Y fixed and solve each new user's factor in
closed form, exactly the ridge system MLlib's ALS user half-step
solves per sweep:

    x_u = (Y_u^T Y_u + reg * n_u * I)^-1  Y_u^T r_u

(Y_u = factors of the items u rated, n_u = u's rating count — the
ALS-WR regularization scaling the reference's hyperparameters imply;
the fold-in factor is unconstrained where the fit uses nonnegative
NNLS, documented and harmless for scoring).

The plan is built to be 100-TB shaped end to end:

- the per-user normal equations are PRE-AGGREGATED in pure column
  expressions: each (rating, item-factor) row contributes the 55
  upper-triangle Gramian products, the 10 right-hand-side products
  and a count, and one groupBy(user).agg(66 sums) with map-side
  combine reduces them — no per-user Python, no factor lists shipped
  around, shuffle payload is exactly 66 doubles per user;
- the 10x10 solves run as ONE numpy `np.linalg.solve` over the whole
  Arrow batch of users in `mapInPandas` (thousands of stacked systems
  per vectorized call — the legitimate Pandas-UDF case: built-ins
  cannot express a linear solve);
- scoring joins the solved factors back to the user's rated items and
  folds the dot product JVM-side.

Registered as `als_user_fold_in` (new users vs fixed item factors) and
`als_item_fold_in` (new items vs fixed user factors — the reference's
new-movie cold start, cold_rec.py M10, answered at the factor level),
both through the shared `fold_in_factors` plan, with the ALS family's
invariant-anchor oracle contract (VERDICT r6 #6 pattern): exact
SQL-checkable anchors (distinct fold-in keys and scored-rating counts —
factors exist for exactly the counterpart keys the training partition
contains) plus an RMSE band boolean; the authoritative numeric
recomputation (residual identity A x = b per key) lives in
tests/test_recommender.py.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cqu_bigdata_recommender_system_for_movies_spark.ml.als import _MODEL_CACHE, fit_als
from cqu_bigdata_recommender_system_for_movies_spark.plans.registry import register
from cqu_bigdata_recommender_system_for_movies_spark.tables import RATINGS_SQL, ratings

# key % 20 == 0 -> a "new" key (5%): users 8/75/749, items 10/100/1000
# at the three sfs (both non-vacuous everywhere)
HOLDOUT_MOD = 20
RANK = 10  # fit_als default — the reference's spark_als.py rank
REG = 0.1  # fit_als default regParam


def _train_model(spark: SparkSession, sf_dir: str):
    """ALS fitted on the NON-holdout users only (so fold-in users are
    genuinely unseen by the factorization), cached per sf_dir."""
    key = (sf_dir, "foldin_train")
    if key not in _MODEL_CACHE:
        r = ratings(spark, sf_dir).select("user_id", "item_id", "rating")
        _MODEL_CACHE[key] = fit_als(
            r.filter(F.col("user_id") % HOLDOUT_MOD != 0)
        )
    return _MODEL_CACHE[key]


def fold_in_factors(
    joined: DataFrame,
    key_col: str = "user_id",
    rank: int = RANK,
    reg: float = REG,
) -> DataFrame:
    """(key_col, x): closed-form ridge factors for every key in `joined`
    (columns key_col, rating, f = the counterpart side's factor
    array<double>). Symmetric by construction — fold users against item
    factors or items against user factors.

    Stage 1 — one aggregation: 55 Gramian sums (upper triangle of
    sum f f^T), 10 rhs sums (sum f*r), and n, all JVM-side column
    products with map-side partial aggregation.
    Stage 2 — one vectorized mapInPandas: stack each Arrow batch's
    keys into an (m, rank, rank) tensor and solve all m systems in a
    single np.linalg.solve call."""
    from cqu_bigdata_recommender_system_for_movies_spark.shipping import ensure_shipped

    ensure_shipped(joined.sparkSession)
    aggs = []
    for i in range(rank):
        for j in range(i, rank):
            aggs.append(
                F.sum(F.col("f")[i] * F.col("f")[j]).alias(f"a_{i}_{j}")
            )
    for i in range(rank):
        aggs.append(F.sum(F.col("f")[i] * F.col("rating")).alias(f"b_{i}"))
    aggs.append(F.count("*").cast("double").alias("n_u"))
    normal = joined.groupBy(key_col).agg(*aggs)

    tri = [(i, j) for i in range(rank) for j in range(i, rank)]

    def solve(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            m = len(pdf)
            if m == 0:
                continue
            A = np.zeros((m, rank, rank))
            for k, (i, j) in enumerate(tri):
                col = pdf[f"a_{i}_{j}"].to_numpy()
                A[:, i, j] = col
                A[:, j, i] = col
            A[:, range(rank), range(rank)] += (
                reg * pdf["n_u"].to_numpy()[:, None]
            )
            b = np.stack([pdf[f"b_{i}"].to_numpy() for i in range(rank)], axis=1)
            x = np.linalg.solve(A, b)
            yield pd.DataFrame(
                {key_col: pdf[key_col], "x": list(map(list, x))}
            )

    return normal.mapInPandas(
        solve, schema=f"{key_col} long, x array<double>"
    )


def fold_in_user_factors(joined: DataFrame, rank: int = RANK, reg: float = REG) -> DataFrame:
    """(user_id, x): the user-side specialization of fold_in_factors."""
    return fold_in_factors(joined, "user_id", rank, reg)


@register(
    "als_user_fold_in",
    # Invariant-anchor oracle (the ALS family's VERDICT r6 #6 contract):
    # MLlib trains a factor for exactly the distinct items of the
    # training partition, so the engine's "scorable" holdout set — the
    # fold-in users and their ratings on factored items — equals the
    # SQL join of the holdout against the training partition's distinct
    # items, an exact count anchor on both axes. The ridge solve itself
    # is anchored by rmse_in_band (same (0, 25) band as als_rmse:
    # ratings 1..50, std ~14.4 — a broken solve lands near the std, a
    # degenerate one at 0 exactly) and recomputed independently in
    # tests/test_recommender.py (residual identity A x = b).
    oracle=f"""
    WITH r AS ({RATINGS_SQL}),
    hold AS (SELECT user_id, item_id, rating FROM r
             WHERE user_id % {HOLDOUT_MOD} = 0),
    train AS (SELECT user_id, item_id FROM r
              WHERE user_id % {HOLDOUT_MOD} <> 0),
    known AS (SELECT DISTINCT item_id FROM train)
    SELECT CAST(COUNT(DISTINCT h.user_id) AS BIGINT) AS n_new_users,
           CAST(COUNT(*) AS BIGINT) AS n_scored_ratings,
           TRUE AS rmse_in_band
    FROM hold h JOIN known USING (item_id)
    """,
    doc="Incremental ALS user fold-in (beyond-reference M-family — the "
    "100 TB alternative to the reference's full retrain): fit on "
    f"non-holdout users (user_id % {HOLDOUT_MOD} != 0), then solve every "
    "held-out user's factor in closed form against the FIXED item "
    "factors — per-user normal equations pre-aggregated as 66 JVM-side "
    "sums, all 10x10 ridge systems solved in one vectorized numpy call "
    "per Arrow batch (mapInPandas), scores folded JVM-side. Emits exact "
    "count anchors + the RMSE band boolean.",
)
def als_user_fold_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    model = _train_model(spark, sf_dir)
    factors = model.itemFactors.select(
        F.col("id").alias("item_id"),
        F.transform("features", lambda v: v.cast("double")).alias("f"),
    )
    holdout = (
        ratings(spark, sf_dir)
        .select("user_id", "item_id", F.col("rating").cast("double").alias("rating"))
        .filter(F.col("user_id") % HOLDOUT_MOD == 0)
    )
    # inner join = "scorable" holdout ratings: exactly those on items the
    # training partition factored. No explicit broadcast: the item dim
    # grows with the catalog (the growing-table broadcast ban) — AQE
    # picks broadcast while it fits, hash join on item_id beyond.
    joined = holdout.join(factors, "item_id").localCheckpoint(eager=True)
    solved = fold_in_user_factors(joined)

    dot = F.aggregate(
        F.zip_with("x", "f", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = joined.join(solved, "user_id").select(
        "user_id", "rating", dot.alias("pred")
    )
    return scored.agg(
        F.count_distinct("user_id").cast("long").alias("n_new_users"),
        F.count("*").cast("long").alias("n_scored_ratings"),
        (
            (F.sqrt(F.avg((F.col("pred") - F.col("rating")) ** 2)) > 0)
            & (F.sqrt(F.avg((F.col("pred") - F.col("rating")) ** 2)) < 25)
        ).alias("rmse_in_band"),
    )


def _train_model_item_holdout(spark: SparkSession, sf_dir: str):
    """ALS fitted with the holdout ITEMS' ratings removed (so fold-in
    items are genuinely unseen), cached per sf_dir."""
    key = (sf_dir, "foldin_train_items")
    if key not in _MODEL_CACHE:
        r = ratings(spark, sf_dir).select("user_id", "item_id", "rating")
        _MODEL_CACHE[key] = fit_als(
            r.filter(F.col("item_id") % HOLDOUT_MOD != 0)
        )
    return _MODEL_CACHE[key]


@register(
    "als_item_fold_in",
    # The exact mirror of als_user_fold_in's anchor argument, with the
    # roles swapped: MLlib trains a user factor for exactly the distinct
    # users of the training partition, so the scorable holdout — new
    # items and their ratings BY factored users — equals the SQL join of
    # the held-out items against the training partition's distinct
    # users. Same (0, 25) RMSE band; residual identity in pytest.
    oracle=f"""
    WITH r AS ({RATINGS_SQL}),
    hold AS (SELECT user_id, item_id, rating FROM r
             WHERE item_id % {HOLDOUT_MOD} = 0),
    train AS (SELECT user_id, item_id FROM r
              WHERE item_id % {HOLDOUT_MOD} <> 0),
    known AS (SELECT DISTINCT user_id FROM train)
    SELECT CAST(COUNT(DISTINCT h.item_id) AS BIGINT) AS n_new_items,
           CAST(COUNT(*) AS BIGINT) AS n_scored_ratings,
           TRUE AS rmse_in_band
    FROM hold h JOIN known USING (user_id)
    """,
    doc="Incremental ALS ITEM fold-in (beyond-reference — the reference's "
    "new-movie cold start, M10/cold_rec.py, done at the factor level "
    "instead of falling back to popularity): fit with the holdout items' "
    f"ratings removed (item_id % {HOLDOUT_MOD} == 0), then solve every "
    "new item's factor in closed form against the FIXED user factors — "
    "the symmetric twin of als_user_fold_in through the same "
    "fold_in_factors plan (66 JVM-side sums per item, stacked numpy "
    "solves). A new movie becomes rankable for every user after one "
    "aggregation pass over its first ratings, no retrain.",
)
def als_item_fold_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    model = _train_model_item_holdout(spark, sf_dir)
    factors = model.userFactors.select(
        F.col("id").alias("user_id"),
        F.transform("features", lambda v: v.cast("double")).alias("f"),
    )
    holdout = (
        ratings(spark, sf_dir)
        .select("user_id", "item_id", F.col("rating").cast("double").alias("rating"))
        .filter(F.col("item_id") % HOLDOUT_MOD == 0)
    )
    joined = holdout.join(factors, "user_id").localCheckpoint(eager=True)
    solved = fold_in_factors(joined, "item_id")

    dot = F.aggregate(
        F.zip_with("x", "f", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = joined.join(solved, "item_id").select(
        "item_id", "rating", dot.alias("pred")
    )
    return scored.agg(
        F.count_distinct("item_id").cast("long").alias("n_new_items"),
        F.count("*").cast("long").alias("n_scored_ratings"),
        (
            (F.sqrt(F.avg((F.col("pred") - F.col("rating")) ** 2)) > 0)
            & (F.sqrt(F.avg((F.col("pred") - F.col("rating")) ** 2)) < 25)
        ).alias("rmse_in_band"),
    )
