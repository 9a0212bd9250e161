from cqu_bigdata_recommender_system_for_movies_spark.plans.registry import (
    QUERIES,
    ORACLES,
    QuerySpec,
    register,
    all_queries,
    all_oracles,
)

__all__ = ["QUERIES", "ORACLES", "QuerySpec", "register", "all_queries", "all_oracles"]
