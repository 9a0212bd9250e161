"""Sampling, randomized, and approximate operators (P8 randomSplit, F4
shuffle, approx_count_distinct / percentile_approx).

These are inherently non-SQL-reproducible (engine-specific RNG / sketches),
so they register as rows-only checks; pytest asserts the invariants instead
(split fractions, determinism under a fixed seed, permutation preserves the
multiset, sketch error bounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cqu_bigdata_recommender_system_for_movies_spark.plans.registry import register
from cqu_bigdata_recommender_system_for_movies_spark.tables import load, ratings

SEED = 42


@register(
    "random_split_counts",
    oracle=None,  # engine RNG — invariants asserted in tests
    doc="P8 randomSplit (spark_als.py:151): seeded 80/20 split; returns the "
    "per-side row counts plus the total for invariant checking.",
)
def random_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = ratings(spark, sf_dir)
    train, test = r.randomSplit([0.8, 0.2], seed=SEED)
    return spark.createDataFrame(
        [(train.count(), test.count(), r.count())],
        "n_train long, n_test long, n_total long",
    )


@register(
    "shuffle_tokens_multiset",
    oracle="""
    SELECT word, COUNT(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
    doc="F4 shuffle(array) (streaming_test.py:98): random permutation of each "
    "document's tokens, then re-exploded and counted — the permutation is "
    "random but the token *multiset* is invariant, so the word count still "
    "hash-matches the oracle.",
)
def shuffle_tokens_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.shuffle(F.split("text", " ")).alias("toks"))
        .select(F.explode("toks").alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "approx_aggregates",
    oracle=None,  # sketch-based — error bounds asserted in tests
    doc="Approximate aggregates: approx_count_distinct (HLL++) and "
    "percentile_approx over the events stream — the sketches a 100 TB "
    "profile pass uses instead of exact distinct/sort.",
)
def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
        F.round(F.percentile_approx("value", 0.5), 2).alias("approx_median_value"),
        F.count("*").alias("n"),
    )


STRATA_FRACTIONS = {
    "click": 0.5,
    "view": 0.5,
    "purchase": 1.0,
    "signup": 1.0,
    "error": 0.1,
}


@register(
    "stratified_sample_counts",
    oracle=None,  # engine RNG — invariants asserted in tests
    doc="Stratified sampling (training-data rebalancing): sampleBy over "
    "event_type with per-stratum fractions (keep all rare "
    "purchase/signup, downsample clicks/views, near-drop errors) — the "
    "standard class-rebalance step before model training, executed as a "
    "per-row Bernoulli filter with NO shuffle. Returns per-stratum "
    "population and sample counts.",
)
def stratified_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    sample = events.sampleBy("event_type", STRATA_FRACTIONS, seed=SEED)
    pop = events.groupBy("event_type").agg(F.count("*").alias("n_total"))
    got = sample.groupBy("event_type").agg(F.count("*").alias("n_sample"))
    return pop.join(got, "event_type", "left").na.fill(0, ["n_sample"])
