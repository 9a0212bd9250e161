"""Vector column functions (F6, F7, F8, F10).

The reference serialized vectors as comma-joined strings in graph
properties and re-parsed them per row (reference src/csv/train_topn.py:161,
src/streaming/streaming_rec.py:74,97,164). Native ``array<float>`` columns
are the engine's representation; serialize/parse exist only for
compatibility with string-typed inputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from cqu_bigdata_recommender_system_for_movies_spark.operators.vectors import (  # noqa: F401
    EPS,
    cosine as cosine_similarity,
    dot as dot_product,
)


def serialize_vector(col: Column | str) -> Column:
    """F8: array<float> -> 'v1,v2,...' (reference train_topn.py:161)."""
    return F.concat_ws(",", F.transform(col, lambda x: x.cast("string")))


def parse_vector(col: Column | str) -> Column:
    """F8: 'v1,v2,...' -> array<double> (reference streaming_rec.py:164)."""
    return F.transform(F.split(col, ","), lambda s: s.cast("double"))


def interest_update(u: Column | str, t: Column | str, r: Column, lam: float = 0.05) -> Column:
    """F7: U := U*(1-λr) + T*(λr) as zip_with (reference streaming_rec.py:99)."""
    return F.zip_with(
        u, t, lambda ui, ti: ui * (1.0 - F.lit(lam) * r) + ti * (F.lit(lam) * r)
    )
