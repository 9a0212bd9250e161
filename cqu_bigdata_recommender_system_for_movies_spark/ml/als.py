"""Recommender domain operators (SURVEY.md §2.10 M1-M4, M6, M9 analogue).

The reference's Spark-native model is MLlib ALS with rank=10, maxIter=10,
regParam=0.1, nonnegative=True (reference src/als/spark_als.py:94-113); its
NaN-prediction `na.drop` (spark_als.py:162) becomes the built-in
``coldStartStrategy="drop"``. Everything is seeded so repeated runs are
reproducible. The iterative fits have no ANSI-SQL oracle, so every query
emits invariant rows — exact anchors the oracle recomputes plus contract
booleans it pins TRUE — while pytest asserts the quality bounds on the
*_detail twins (RMSE sanity, P/R@k in [0,1], fold RMSEs, grid selection,
implicit top-k rows).

Scale notes: ALS itself is the distributed MLlib implementation (blocked
factor shuffles); top-k for all users uses ``recommendForUserSubset`` whose
physical plan is a blocked cross-score + TopByKey aggregate, never a full
materialized user×item matrix.
"""

from __future__ import annotations

from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.recommendation import ALS, ALSModel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cqu_bigdata_recommender_system_for_movies_spark.plans.registry import register
from cqu_bigdata_recommender_system_for_movies_spark.tables import RATINGS_SQL, ratings

SEED = 42

# One ALS fit is the dominant cost of the whole registry at sf0.01; several
# registry entries legitimately share the same (data, hyperparam) fit — e.g.
# als_rmse and als_precision_recall_at_k both train on the seeded 80/20
# split. Caching by (sf_dir, variant) makes the registry idempotent-cheap
# without changing any result (fits are seeded and deterministic).
_MODEL_CACHE: dict[tuple[str, str], ALSModel] = {}


def fit_als(train: DataFrame, rank: int = 10, max_iter: int = 10, reg: float = 0.1) -> ALSModel:
    """M1: ALS fit with the reference's hyperparameters (spark_als.py:100-105)."""
    als = ALS(
        rank=rank,
        maxIter=max_iter,
        regParam=reg,
        nonnegative=True,
        userCol="user_id",
        itemCol="item_id",
        ratingCol="rating",
        coldStartStrategy="drop",  # replaces reference's na.drop (spark_als.py:162)
        seed=SEED,
    )
    return als.fit(train)


# The materialized 80/20 split, keyed by (applicationId, sf_dir) like
# the dedup family's checkpoint caches (a stopped context invalidates
# its entries by key).
_SPLIT_CACHE: dict[tuple[str, str], tuple[DataFrame, DataFrame]] = {}


def _split_model(spark: SparkSession, sf_dir: str) -> tuple[ALSModel, DataFrame, DataFrame]:
    """Seeded 80/20 split + fitted model, cached per sf_dir.

    r17 (VERDICT r16 #5, guide §5): the split is MATERIALIZED once
    (serialized localCheckpoint — the r11 rule for corpus-sized
    checkpoints) instead of re-running the ratings join + per-partition
    sample on every action: the fit, the two conservation counts and
    the RMSE evaluation each re-evaluated randomSplit's lineage
    (measured ~5 s of the 11.4 s query at sf0.1; one materialization
    costs ~2 s and every consumer reads blocks). randomSplit is seeded
    and partition-deterministic, so the materialized rows are the SAME
    rows each action saw — results bit-identical — and the conservation
    anchor stays a real check: train and test are still independently
    produced by randomSplit (neither derives from the other), the
    checkpoint only pins WHERE they are read from."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SPLIT_CACHE:
        from pyspark import StorageLevel

        r = ratings(spark, sf_dir).select("user_id", "item_id", "rating")
        train, test = r.randomSplit([0.8, 0.2], seed=SEED)
        _SPLIT_CACHE[key] = (
            train.localCheckpoint(
                eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
            ),
            test.localCheckpoint(
                eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
            ),
        )
    train, test = _SPLIT_CACHE[key]
    mkey = (sf_dir, "split80")
    if mkey not in _MODEL_CACHE:
        _MODEL_CACHE[mkey] = fit_als(train)
    return _MODEL_CACHE[mkey], train, test


def als_rmse_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1+M2+M4 metric values (RNG-split counts + fit RMSE; pytest bands
    these — test_recommender.py::test_als_rmse_sane/_deterministic)."""
    model, train, test = _split_model(spark, sf_dir)
    pred = model.transform(test).withColumnRenamed("prediction", "score")
    rmse = RegressionEvaluator(
        metricName="rmse", labelCol="rating", predictionCol="score"
    ).evaluate(pred)
    return spark.createDataFrame(
        [(train.count(), test.count(), round(rmse, 4))],
        "n_train long, n_test long, rmse double",
    )


@register(
    "als_rmse",
    # The fit is iterative ML, but the evaluation CONTRACT is checkable
    # (VERDICT r6 #6 pattern): exact ratings-total anchor + booleans.
    # engine-side bands (pinned for review visibility, ADVICE r6):
    #   conserved    := n_train + n_test == n_total
    #   rmse_in_band := 0 < rmse < 25  (ratings 1..50 ~uniform, std ~14.4;
    #                   a broken fit sits near the std, a degenerate one
    #                   at 0 — same band as the pytest gate)
    # authoritative independent recomputation: tests/test_recommender.py
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
           TRUE AS conserved,
           TRUE AS rmse_in_band
    FROM ({RATINGS_SQL})
    """,
    doc="M1+M2+M4: ALS fit on a seeded 80/20 split, RMSE of transform(test) "
    "(spark_als.py:151-169), emitted as driver-hashable invariants (exact "
    "ratings-total anchor + split-conservation and RMSE-band booleans). "
    "The (n_train, n_test, rmse) row lives in als_rmse_detail (pytest); "
    "the reference-quality band stays als_fixture_rmse_band.",
)
def als_rmse(spark: SparkSession, sf_dir: str) -> DataFrame:
    row = als_rmse_detail(spark, sf_dir)
    n_total = ratings(spark, sf_dir).agg(F.count("*").cast("long").alias("n_total"))
    summary = row.agg(
        F.sum(F.col("n_train") + F.col("n_test")).alias("n_split"),
        F.bool_and((F.col("rmse") > 0) & (F.col("rmse") < 25)).alias("rmse_in_band"),
    )
    return F.broadcast(n_total).crossJoin(summary).select(
        "n_total",
        (F.col("n_split") == F.col("n_total")).alias("conserved"),
        "rmse_in_band",
    )


def als_recommend_topk_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 detail rows: recommendForUserSubset for the first 5 users, nested
    recs flattened to (user_id, pos, item_id, score) via posexplode
    (spark_als.py:116-132 — the reference used rdd.flatMap). Consumed by
    the registered invariant query below and by pytest's shape checks."""
    r = ratings(spark, sf_dir).select("user_id", "item_id", "rating")
    key = (sf_dir, "full")
    if key not in _MODEL_CACHE:
        _MODEL_CACHE[key] = fit_als(r)
    model = _MODEL_CACHE[key]
    users = r.select("user_id").distinct().orderBy("user_id").limit(5)
    recs = model.recommendForUserSubset(users, 10)
    return recs.select(
        "user_id", F.posexplode("recommendations").alias("pos", "rec")
    ).select(
        "user_id",
        "pos",
        F.col("rec.item_id").alias("item_id"),
        F.round(F.col("rec.rating").cast("double"), 4).alias("score"),
    )


@register(
    "als_recommend_topk",
    # Model scores are engine-specific, but the reference's top-k CONTRACT
    # is not (VERDICT r6 #6, same pattern as random_split_counts): the
    # oracle independently computes the exact anchors — 5 requested users,
    # 5 x min(10, catalog) result rows — and pins the contract booleans
    # TRUE (k rows per user, scores non-increasing in rank order, every
    # item from the catalog). A broken top-k (short lists, unsorted
    # scores, hallucinated items) now hash-FAILS on the driver. The raw
    # (user, item, score) rows stay pytest-gated via *_detail.
    oracle=f"""
    SELECT CAST(LEAST(5, COUNT(DISTINCT user_id)) AS BIGINT) AS n_users,
           CAST(LEAST(5, COUNT(DISTINCT user_id))
                * LEAST(10, COUNT(DISTINCT item_id)) AS BIGINT) AS n_rows,
           TRUE AS k_per_user,
           TRUE AS scores_nonincreasing,
           TRUE AS items_in_catalog
    FROM ({RATINGS_SQL})
    """,
    doc="M3: recommendForUserSubset top-10 for the first 5 users "
    "(spark_als.py:116-132), emitted as driver-hashable invariants: exact "
    "(n_users, n_rows) anchors the oracle recomputes from the ratings "
    "catalog, plus the top-k contract booleans. Detail rows in "
    "als_recommend_topk_detail (pytest).",
)
def als_recommend_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    detail = als_recommend_topk_detail(spark, sf_dir)
    catalog = ratings(spark, sf_dir).select("item_id").distinct()
    return _topk_contract_invariants(detail, catalog, k=10)


def _topk_contract_invariants(detail: DataFrame, catalog: DataFrame, k: int) -> DataFrame:
    """Shared top-k contract check for the recommendForUserSubset family:
    given detail rows (user_id, pos, item_id, score) and the item catalog,
    emit the exact (n_users, n_rows) anchors plus the contract booleans
    (k rows per user, scores non-increasing in rank order, every
    recommended item from the catalog)."""
    from pyspark.sql import Window

    n_items = catalog.agg(F.count("*").alias("n_items"))
    w = Window.partitionBy("user_id").orderBy("pos")
    flagged = detail.withColumn(
        "mono",
        F.lag("score").over(w).isNull() | (F.lag("score").over(w) >= F.col("score")),
    )
    per_user = flagged.groupBy("user_id").agg(
        F.count("*").alias("cnt"), F.bool_and("mono").alias("mono_ok")
    )
    missing = detail.join(catalog, "item_id", "left_anti").agg(
        F.count("*").alias("n_missing")
    )
    return (
        per_user.crossJoin(F.broadcast(n_items))
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("cnt").cast("long").alias("n_rows"),
            F.bool_and(
                F.col("cnt") == F.least(F.lit(k), F.col("n_items"))
            ).alias("k_per_user"),
            F.bool_and("mono_ok").alias("scores_nonincreasing"),
        )
        .crossJoin(F.broadcast(missing))
        .select(
            "n_users",
            "n_rows",
            "k_per_user",
            "scores_nonincreasing",
            (F.col("n_missing") == 0).alias("items_in_catalog"),
        )
    )


# CV/tuning harnesses surface their metrics as driver-side scalar lists
# (RegressionEvaluator.evaluate returns a float), so the detail twin and
# the registered invariant query share one cached fit set per sf_dir —
# the fits are seeded and deterministic, caching changes no result.
_CV_CACHE: dict[str, tuple[list[tuple[str, float, int]], int, int]] = {}


def _cv_rows(spark: SparkSession, sf_dir: str) -> tuple[list[tuple[str, float, int]], int, int]:
    """Seeded 3-fold CV: ((fold, rmse, max_iter) rows, sum of fold counts,
    total ratings count) — reference doc/课程报告.md:890-892,
    train_topn.py:209-215 ran 5 folds; k=3 bounds this entry's share of
    the per-round budget, the reference's k=5 is one constant away."""
    if sf_dir in _CV_CACHE:
        return _CV_CACHE[sf_dir]
    r = ratings(spark, sf_dir).select("user_id", "item_id", "rating").cache()
    n_total = r.count()
    folds = r.randomSplit([1.0 / 3] * 3, seed=SEED)
    evaluator = RegressionEvaluator(
        metricName="rmse", labelCol="rating", predictionCol="prediction"
    )
    rows = []
    fold_total = 0
    for i, held_out in enumerate(folds):
        fold_total += held_out.count()
        train = None
        for j, f in enumerate(folds):
            if j != i:
                train = f if train is None else train.union(f)
        # max_iter=3 keeps the k-fold harness honest (k independent seeded
        # fits) while bounding its share of the driver's per-round budget
        model = fit_als(train, max_iter=3)
        rmse = evaluator.evaluate(model.transform(held_out))
        rows.append((f"fold_{i + 1}", round(rmse, 4), 3))
        if i == 0:
            # one full-fidelity fold: the reference's maxIter=10, so this
            # row's RMSE is comparable to BASELINE.md:11 (the maxIter=3
            # rows are harness checks, not quality claims)
            full = fit_als(train, max_iter=10)
            rows.append(
                ("fold_1_full", round(evaluator.evaluate(full.transform(held_out)), 4), 10)
            )
    r.unpersist()
    short = [v for name, v, it in rows if it == 3]
    rows.append(("mean", round(sum(short) / len(short), 4), 3))
    _CV_CACHE[sf_dir] = (rows, fold_total, n_total)
    return _CV_CACHE[sf_dir]


def als_cross_validation_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M11 detail rows (fold, rmse, max_iter) — metric values are
    pytest-gated (test_recommender.py::test_als_cross_validation_shape)."""
    rows, _, _ = _cv_rows(spark, sf_dir)
    return spark.createDataFrame(rows, "fold string, rmse double, max_iter int")


@register(
    "als_cross_validation",
    # The fold RMSEs are engine-specific (iterative fits on RNG folds), but
    # the CV harness CONTRACT is checkable (VERDICT r6 #6 pattern).
    # engine-side formulas (pinned for review visibility, ADVICE r6):
    #   folds_conserved   := sum(count(fold_i)) == n_total  (randomSplit
    #                        partitions its input exactly)
    #   rmse_in_band      := every fold RMSE in (0, 25)  (als_rmse's band)
    #   mean_consistent   := mean row == round(avg(maxIter=3 fold RMSEs), 4)
    #   has_full_fidelity := a fold_1_full row ran at the reference's
    #                        maxIter=10
    # authoritative independent recomputation: tests/test_recommender.py
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
           TRUE AS folds_conserved,
           TRUE AS rmse_in_band,
           TRUE AS mean_consistent,
           TRUE AS has_full_fidelity
    FROM ({RATINGS_SQL})
    """,
    doc="M11: k-fold cross-validation (reference doc/课程报告.md:890-892, "
    "train_topn.py:209-215): seeded 3-way split, each fold held out once, "
    "RMSE per fold + mean, fold_1 also at the reference's full maxIter=10. "
    "Emitted as driver-hashable invariants (exact ratings-total anchor the "
    "oracle recomputes + fold-conservation/band/mean-consistency booleans); "
    "the (fold, rmse, max_iter) rows live in als_cross_validation_detail "
    "(pytest).",
)
def als_cross_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows, fold_total, n_total = _cv_rows(spark, sf_dir)
    by_fold = {name: (rmse, it) for name, rmse, it in rows}
    short = [rmse for name, rmse, it in rows if it == 3 and name != "mean"]
    return spark.createDataFrame(
        [(
            n_total,
            fold_total == n_total,
            all(0 < rmse < 25 for _, rmse, _ in rows),
            by_fold["mean"][0] == round(sum(short) / len(short), 4),
            by_fold.get("fold_1_full", (0.0, 0))[1] == 10,
        )],
        "n_total long, folds_conserved boolean, rmse_in_band boolean, "
        "mean_consistent boolean, has_full_fidelity boolean",
    )


FIXTURE_BAND = (0.4, 0.93)  # BASELINE.md:11 — reference RMSE 0.9246 on
# ml-100k; a broken fit sits near the raw rating std (~1.0) and leaves the
# band, a degenerate/leaky one undershoots the noise floor (~0.58)


def als_fixture_rmse_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture-quality detail row (rmse, band_lo, band_hi, in_band) — the
    RMSE value itself is pytest-gated
    (test_recommender.py::test_als_fixture_rmse_band_gates)."""
    from cqu_bigdata_recommender_system_for_movies_spark.ml.fixtures import (
        movielens_shaped_ratings,
    )

    r = movielens_shaped_ratings(spark)
    train, test = r.randomSplit([0.8, 0.2], seed=SEED)
    key = ("fixture", "band")
    if key not in _MODEL_CACHE:
        _MODEL_CACHE[key] = fit_als(train)
    rmse = RegressionEvaluator(
        metricName="rmse", labelCol="rating", predictionCol="prediction"
    ).evaluate(_MODEL_CACHE[key].transform(test))
    lo, hi = FIXTURE_BAND
    return spark.createDataFrame(
        [(round(rmse, 4), lo, hi, bool(lo < rmse <= hi))],
        "rmse double, band_lo double, band_hi double, in_band boolean",
    )


@register(
    "als_fixture_rmse_band",
    # The fixture is engine-generated, but its cardinality is a documented
    # constant (FIXTURES.md §1 / ml/fixtures.py: N_USERS=400 users with
    # exactly PER_USER=40 ratings each) the oracle pins independently, as
    # are the band bounds (BASELINE.md:11's quality contract, FIXTURE_BAND).
    # engine-side formula (pinned): in_band := band_lo < rmse <= band_hi;
    # the RMSE value itself stays pytest-gated via als_fixture_rmse_detail.
    oracle="""
    SELECT CAST(400 * 40 AS BIGINT) AS n_fixture,
           CAST(0.4 AS DOUBLE) AS band_lo,
           CAST(0.93 AS DOUBLE) AS band_hi,
           TRUE AS in_band
    """,
    doc="Model-quality parity as a driver-hashable row (BASELINE.md:11, "
    "reference doc/课程报告.md:907: RMSE 0.9246 on ml-100k): reference-"
    "hyperparam ALS on the MovieLens-shaped seeded fixture (FIXTURES.md "
    "§1) must land inside the reference's quality band. The oracle "
    "independently pins the fixture cardinality (400 x 40) and the band "
    "bounds; a fit outside the band hash-FAILS on the driver. RMSE value "
    "in als_fixture_rmse_detail (pytest).",
)
def als_fixture_rmse_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cqu_bigdata_recommender_system_for_movies_spark.ml.fixtures import (
        movielens_shaped_ratings,
    )

    detail = als_fixture_rmse_detail(spark, sf_dir)
    n_fixture = movielens_shaped_ratings(spark).agg(
        F.count("*").cast("long").alias("n_fixture")
    )
    return F.broadcast(n_fixture).crossJoin(detail).select(
        "n_fixture",
        "band_lo",
        "band_hi",
        "in_band",
    )


SWEEP_RANKS = (4, 10)
SWEEP_REGS = (0.05, 0.1)


# The grid itself is the independently-recomputable part of the sweep's
# oracle: SWEEP_RANKS x SWEEP_REGS enumerated as a VALUES list so the
# constants can never drift apart from the Spark side.
_GRID_VALUES_SQL = ", ".join(
    f"({rank}, {reg})" for rank in SWEEP_RANKS for reg in SWEEP_REGS
)

_SWEEP_CACHE: dict[str, list[tuple[int, float, float, bool]]] = {}


def _sweep_rows(spark: SparkSession, sf_dir: str) -> list[tuple[int, float, float, bool]]:
    """(rank, reg_param, avg_rmse, is_best) per grid cell from MLlib
    CrossValidator, cached per sf_dir (seeded end-to-end)."""
    if sf_dir in _SWEEP_CACHE:
        return _SWEEP_CACHE[sf_dir]
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    from cqu_bigdata_recommender_system_for_movies_spark.ml.fixtures import (
        movielens_shaped_ratings,
    )

    als = ALS(
        maxIter=5,
        nonnegative=True,
        userCol="user_id",
        itemCol="item_id",
        ratingCol="rating",
        coldStartStrategy="drop",
        seed=SEED,
    )
    grid = (
        ParamGridBuilder()
        .addGrid(als.rank, list(SWEEP_RANKS))
        .addGrid(als.regParam, list(SWEEP_REGS))
        .build()
    )
    cv = CrossValidator(
        estimator=als,
        estimatorParamMaps=grid,
        evaluator=RegressionEvaluator(
            metricName="rmse", labelCol="rating", predictionCol="prediction"
        ),
        numFolds=2,
        parallelism=4,
        seed=SEED,
    )
    model = cv.fit(movielens_shaped_ratings(spark))
    best = min(range(len(grid)), key=lambda i: model.avgMetrics[i])
    _SWEEP_CACHE[sf_dir] = [
        (
            pm[als.rank],
            pm[als.regParam],
            round(float(model.avgMetrics[i]), 4),
            i == best,
        )
        for i, pm in enumerate(grid)
    ]
    return _SWEEP_CACHE[sf_dir]


def als_hyperparam_search_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-sweep detail rows (rank, reg_param, avg_rmse, is_best) — the
    RMSE values and winner are pytest-gated
    (test_recommender.py::test_als_hyperparam_search_selects_best)."""
    rows = _sweep_rows(spark, sf_dir)
    return spark.createDataFrame(
        rows, "rank int, reg_param double, avg_rmse double, is_best boolean"
    )


@register(
    "als_hyperparam_search",
    # The per-cell RMSEs are engine-specific, but the sweep CONTRACT is
    # checkable, and the grid enumeration (SWEEP_RANKS x SWEEP_REGS) is a
    # genuinely independent oracle anchor — a sweep that drops, duplicates
    # or invents a grid cell hash-FAILS. engine-side formulas (pinned):
    #   rmse_in_band := 0 < avg_rmse < 25 for that cell
    #   one_best     := exactly one is_best across the grid
    #   best_is_min  := the selected cell's avg_rmse == min(avg_rmse)
    # authoritative independent recomputation: tests/test_recommender.py
    oracle=f"""
    SELECT CAST(rank AS BIGINT) AS rank,
           CAST(reg_param AS DOUBLE) AS reg_param,
           TRUE AS rmse_in_band,
           TRUE AS one_best,
           TRUE AS best_is_min
    FROM (VALUES {_GRID_VALUES_SQL}) AS g(rank, reg_param)
    """,
    doc="M7/M11 completion — the fit/transform/TUNE triangle (reference "
    "doc/课程报告.md:890-892 hand-tuned rank/regParam across runs): MLlib "
    "CrossValidator over a rank x regParam grid on the seeded MovieLens-"
    "shaped fixture, 2 folds, parallelism 4 (grid cells train "
    "concurrently — on a cluster each fit is itself distributed, so the "
    "sweep scales in both directions). Emitted as driver-hashable "
    "invariants: one row per grid cell with the exact (rank, reg_param) "
    "enumeration the oracle recomputes from the same constants, plus the "
    "selection-contract booleans. (rank, reg_param, avg_rmse, is_best) "
    "rows live in als_hyperparam_search_detail (pytest).",
)
def als_hyperparam_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = _sweep_rows(spark, sf_dir)
    n_best = sum(1 for _, _, _, best in rows if best)
    min_rmse = min(rmse for _, _, rmse, _ in rows)
    best_is_min = n_best == 1 and all(
        rmse == min_rmse for _, _, rmse, best in rows if best
    )
    return spark.createDataFrame(
        [
            (int(rank), float(reg), bool(0 < rmse < 25), n_best == 1, best_is_min)
            for rank, reg, rmse, _ in rows
        ],
        "rank long, reg_param double, rmse_in_band boolean, "
        "one_best boolean, best_is_min boolean",
    )


def _precision_recall_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 per-user (n_rel, n_hit) table shared by the detail metrics and
    the registered invariant query."""
    k = 10
    model, train, test = _split_model(spark, sf_dir)
    # held-out "relevant" items: high ratings in the test fold
    relevant = test.filter(F.col("rating") >= 30).select("user_id", "item_id").distinct()
    users = relevant.select("user_id").distinct()
    recs = (
        model.recommendForUserSubset(users, k)
        .select("user_id", F.explode("recommendations").alias("rec"))
        .select("user_id", F.col("rec.item_id").alias("item_id"))
    )
    hits = recs.join(relevant, ["user_id", "item_id"]).groupBy("user_id").agg(
        F.count("*").alias("n_hit")
    )
    truth = relevant.groupBy("user_id").agg(F.count("*").alias("n_rel"))
    return truth.join(hits, "user_id", "left").fillna(0, subset=["n_hit"])


def als_precision_recall_at_k_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 metric values (engine-specific under the RNG split; pytest bands
    these — test_recommender.py::test_precision_recall_bounds)."""
    per_user = _precision_recall_per_user(spark, sf_dir)
    return per_user.agg(
        F.round(F.avg(F.col("n_hit") / F.lit(10)), 4).alias("precision_at_k"),
        F.round(F.avg(F.col("n_hit") / F.col("n_rel")), 4).alias("recall_at_k"),
        F.count("*").alias("n_users"),
    )


@register(
    "als_precision_recall_at_k",
    # The RNG split makes the metric VALUES engine-specific, but the metric
    # CONTRACT is checkable (VERDICT r6 #6, random_split_counts pattern):
    # the oracle recomputes the exact n_total anchor from the ratings view
    # and pins the contract booleans TRUE — per-user hits bounded by both
    # k=10 and that user's relevant count (the join logic's invariant) and
    # both averaged metrics inside [0, 1]. Metric values stay pytest-gated
    # via *_detail.
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
           TRUE AS hits_bounded,
           TRUE AS precision_in_unit,
           TRUE AS recall_in_unit,
           TRUE AS has_eval_users
    FROM ({RATINGS_SQL})
    """,
    doc="M6: Precision@10 / Recall@10 — train on 80%, recommend top-10 per "
    "user, compare against held-out positives (rating >= 30) via an inner "
    "join + per-user counts (train_topn.py:112-145 done as joins+aggs, no "
    "driver-side sets). Emitted as driver-hashable invariants (exact "
    "ratings-count anchor + contract booleans); metric values in "
    "als_precision_recall_at_k_detail (pytest).",
)
def als_precision_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_user = _precision_recall_per_user(spark, sf_dir)
    n_total = ratings(spark, sf_dir).agg(F.count("*").cast("long").alias("n_total"))
    prec = F.avg(F.col("n_hit") / F.lit(10))
    rec = F.avg(F.col("n_hit") / F.col("n_rel"))
    summary = per_user.agg(
        F.bool_and(
            (F.col("n_hit") <= 10) & (F.col("n_hit") <= F.col("n_rel"))
        ).alias("hits_bounded"),
        ((prec >= 0) & (prec <= 1)).alias("precision_in_unit"),
        ((rec >= 0) & (rec <= 1)).alias("recall_in_unit"),
        (F.count("*") > 0).alias("has_eval_users"),
    )
    return F.broadcast(n_total).crossJoin(summary).select(
        "n_total",
        "hits_bounded",
        "precision_in_unit",
        "recall_in_unit",
        "has_eval_users",
    )


def als_implicit_topk_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Implicit-ALS detail rows (user_id, pos, item_id, score): top-5 for
    the first 5 users — score values are pytest-gated
    (test_recommender.py::test_als_implicit_topk_shape)."""
    r = (
        ratings(spark, sf_dir)
        .groupBy("user_id", "item_id")
        .agg(F.count("*").cast("float").alias("rating"))
    )
    key = (sf_dir, "implicit")
    if key not in _MODEL_CACHE:
        als = ALS(
            rank=10,
            maxIter=10,
            regParam=0.1,
            implicitPrefs=True,
            alpha=40.0,
            userCol="user_id",
            itemCol="item_id",
            ratingCol="rating",
            coldStartStrategy="drop",
            seed=SEED,
        )
        _MODEL_CACHE[key] = als.fit(r)
    model = _MODEL_CACHE[key]
    users = r.select("user_id").distinct().orderBy("user_id").limit(5)
    recs = model.recommendForUserSubset(users, 5)
    return recs.select(
        "user_id", F.posexplode("recommendations").alias("pos", "rec")
    ).select(
        "user_id",
        "pos",
        F.col("rec.item_id").alias("item_id"),
        F.round(F.col("rec.rating").cast("double"), 4).alias("score"),
    )


@register(
    "als_implicit_topk",
    # Same contract oracle as als_recommend_topk (VERDICT r6 #6 pattern):
    # exact (n_users, n_rows) anchors recomputed from the interaction
    # catalog, top-k contract booleans pinned TRUE. The implicit fit
    # trains on every distinct (user, item) interaction, so the
    # recommendable catalog is exactly the ratings catalog.
    oracle=f"""
    SELECT CAST(LEAST(5, COUNT(DISTINCT user_id)) AS BIGINT) AS n_users,
           CAST(LEAST(5, COUNT(DISTINCT user_id))
                * LEAST(5, COUNT(DISTINCT item_id)) AS BIGINT) AS n_rows,
           TRUE AS k_per_user,
           TRUE AS scores_nonincreasing,
           TRUE AS items_in_catalog
    FROM ({RATINGS_SQL})
    """,
    doc="M1 implicit-feedback variant (Hu/Koren/Volinsky, ICDM'08 — the "
    "standard extension of the reference's explicit ALS when only "
    "interaction events exist): implicitPrefs=True over per-(user, item) "
    "interaction counts as confidence, then top-5 recommendations for "
    "the first 5 users. Same blocked MLlib fit; preference is binary, "
    "confidence 1 + alpha*count. Emitted as driver-hashable invariants "
    "(exact anchors + top-k contract booleans); (user, item, score) rows "
    "in als_implicit_topk_detail (pytest).",
)
def als_implicit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    detail = als_implicit_topk_detail(spark, sf_dir)
    catalog = ratings(spark, sf_dir).select("item_id").distinct()
    return _topk_contract_invariants(detail, catalog, k=5)
