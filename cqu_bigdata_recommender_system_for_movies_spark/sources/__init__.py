from cqu_bigdata_recommender_system_for_movies_spark.sources.delimited import (
    read_delimited,
    write_delimited,
)

__all__ = ["read_delimited", "write_delimited"]
