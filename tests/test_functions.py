"""Column-expression function library (F6-F8, F10) against numpy."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cqu_bigdata_recommender_system_for_movies_spark.functions import (
    cosine_similarity,
    dot_product,
    parse_vector,
    serialize_vector,
)
from cqu_bigdata_recommender_system_for_movies_spark.functions.vector_ops import (
    interest_update,
)


@pytest.fixture(scope="module")
def vec_df(spark):
    return spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<double>, b array<double>"
    )


def test_dot_product(vec_df):
    got = vec_df.select(dot_product("a", "b").alias("d")).collect()[0].d
    assert got == pytest.approx(32.0)


def test_cosine_epsilon_matches_reference(vec_df):
    # np.dot(a,b)/(||a||*||b|| + 1e-8) — reference streaming_rec.py:111
    a, b = np.array([1.0, 2.0, 3.0]), np.array([4.0, 5.0, 6.0])
    exp = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-8))
    got = vec_df.select(cosine_similarity("a", "b").alias("c")).collect()[0].c
    assert got == pytest.approx(exp, rel=1e-12)


def test_serialize_parse_roundtrip(vec_df):
    out = vec_df.select(
        parse_vector(serialize_vector("a")).alias("back")
    ).collect()[0].back
    assert out == [1.0, 2.0, 3.0]


def test_interest_update_rule(spark):
    # U := U*(1-λr) + T*(λr) with λ=0.05, r=4 (reference streaming_rec.py:99)
    df = spark.createDataFrame(
        [([0.5, 0.5], [1.0, 0.0], 4.0)], "u array<double>, t array<double>, r double"
    )
    got = df.select(interest_update("u", "t", F.col("r")).alias("o")).collect()[0].o
    lam_r = 0.05 * 4.0
    exp = [0.5 * (1 - lam_r) + 1.0 * lam_r, 0.5 * (1 - lam_r)]
    assert got == pytest.approx(exp)


def test_near_dup_pairs_nontrivial(spark, sf_dir):
    """The injected perturbed twins must actually surface: a green oracle
    match on 0-1 rows verifies nothing (round-1 verdict)."""
    from cqu_bigdata_recommender_system_for_movies_spark.operators.vectors import (
        embedding_near_dup_pairs,
    )

    rows = embedding_near_dup_pairs(spark, sf_dir).collect()
    assert len(rows) >= 5
    for r in rows:
        assert r.cosine >= 0.99
        assert r.vec_b == r.vec_a + 1000000  # only twin pairs clear 0.99


def test_set_ops_except_nontrivial(spark, sf_dir):
    from cqu_bigdata_recommender_system_for_movies_spark.operators.relational import (
        set_ops_except,
    )

    assert set_ops_except(spark, sf_dir).count() > 0


def test_embedding_pca_top_component(spark, sf_dir):
    from cqu_bigdata_recommender_system_for_movies_spark.operators.vectors import (
        embedding_pca_top_component,
        embedding_pca_top_component_detail,
    )

    rows = embedding_pca_top_component_detail(spark, sf_dir).collect()
    assert len(rows) == 64  # one weight per embedding dimension
    assert rows[0].position == 0 and rows[-1].position == 63
    norm = sum(r.weight**2 for r in rows) ** 0.5
    assert abs(norm - 1.0) < 1e-4  # unit eigenvector
    assert rows[0].weight >= 0  # sign convention
    assert rows[0].eigenvalue > 0  # top covariance eigenvalue is positive
    # the registered invariant row must agree with this independent check
    inv = embedding_pca_top_component(spark, sf_dir).collect()[0]
    assert inv.n_components == 64
    assert inv.unit_norm and inv.sign_fixed and inv.eigenvalue_positive


def test_salted_topk_rejects_reserved_columns(spark, sf_dir):
    """ADVICE r6: withColumn silently overwrites same-named input columns,
    so salted_topk must refuse inputs carrying its temp/output names."""
    import pytest

    from cqu_bigdata_recommender_system_for_movies_spark.operators.topk import (
        salted_topk,
    )
    from cqu_bigdata_recommender_system_for_movies_spark.tables import ratings

    r = ratings(spark, sf_dir).withColumn("rnk", F.lit(1))
    with pytest.raises(ValueError, match="rnk"):
        salted_topk(r, ["item_id"], [F.desc("rating")], 5, F.col("user_id"))


def test_shuffle_partitions_helper_handles_non_numeric_conf(spark):
    """ADVICE r9: managed runtimes set spark.sql.shuffle.partitions to
    "auto" under AQE auto-tuning; the shared helper must fall back to
    defaultParallelism instead of raising ValueError."""
    from cqu_bigdata_recommender_system_for_movies_spark.session import shuffle_partitions

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    assert shuffle_partitions(spark) == int(prev)

    # OSS Spark type-checks this conf as int, so "auto" can only appear on
    # managed runtimes — simulate one with a stub that mirrors the API.
    class _Conf:
        def get(self, key, default=None):
            return "auto"

    class _Ctx:
        defaultParallelism = 7

    class _FakeSpark:
        conf = _Conf()
        sparkContext = _Ctx()

    assert shuffle_partitions(_FakeSpark()) == 7

    class _NoCtx:
        conf = _Conf()

        @property
        def sparkContext(self):
            raise RuntimeError("no context")

    assert shuffle_partitions(_NoCtx(), default=13) == 13
