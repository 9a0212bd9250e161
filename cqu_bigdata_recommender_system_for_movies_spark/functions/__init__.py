"""Scalar/array function library (SURVEY.md §2.8) — re-exported helpers.

Everything here is a *column expression builder* (JVM-side, codegen'd), not
a UDF: the reference's per-row numpy lambdas map to these.
"""

from cqu_bigdata_recommender_system_for_movies_spark.functions.vector_ops import (
    cosine_similarity,
    dot_product,
    parse_vector,
    serialize_vector,
)

__all__ = ["cosine_similarity", "dot_product", "parse_vector", "serialize_vector"]
