"""Driver contract for the spark-graft builder (PySpark target).

Thin view over the engine's query registry
(cqu_bigdata_recommender_system_for_movies_spark.plans.registry) — every
implemented operator from SURVEY.md §2 is a (queries, oracle_sql) pair
there; tests/test_oracle_parity.py replays the driver's comparison locally.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cqu_bigdata_recommender_system_for_movies_spark.plans.registry import (  # noqa: E402
    all_oracles,
    all_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (M9 cold-start popular items) on sf0.001."""
    from cqu_bigdata_recommender_system_for_movies_spark.operators.relational import (
        cold_start_popular_items,
    )

    return cold_start_popular_items(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for every SQL-expressible query; ML/stateful ops omitted."""
    return all_oracles()
