"""MovieLens-shaped seeded fixture (FIXTURES.md §1) for recommender quality
parity.

BASELINE.md's quality target is ALS RMSE ≈ 0.92 on ml-100k (reference
doc/课程报告.md:907, hyperparams src/als/spark_als.py:100-105). The real
MovieLens data can't ship here, so this builds the same *shape*: integer
user/item ids, ratings in {1..5} generated from a nonnegative low-rank
latent model plus noise — so a correctly-working ALS must recover the
latent structure and land near the noise floor (≈0.58 for σ=0.5 + rounding),
well inside the reference's ≤0.93 band, while a broken fit (e.g. ignored
features, wrong cols) lands near the rating std (≈1.0) and fails the test.

Deterministic: single numpy generator, fixed seed, sorted row order.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

N_USERS = 400
N_ITEMS = 600
PER_USER = 40
LATENT_K = 5
NOISE_STD = 0.5
FIXTURE_SEED = 7


def movielens_shaped_ratings(spark: SparkSession) -> DataFrame:
    """(user_id, item_id, rating) — ml-100k-shaped: every user has exactly
    PER_USER ratings of distinct items, ratings in {1..5} from a
    nonnegative rank-5 latent model + N(0, 0.5) noise, rounded."""
    rng = np.random.default_rng(FIXTURE_SEED)
    u_lat = rng.uniform(0, 0.9, (N_USERS, LATENT_K))
    v_lat = rng.uniform(0, 0.9, (N_ITEMS, LATENT_K))
    rows = []
    for u in range(N_USERS):
        items = rng.choice(N_ITEMS, PER_USER, replace=False)
        mu = 1.0 + u_lat[u] @ v_lat[items].T
        r = np.clip(np.rint(mu + rng.normal(0, NOISE_STD, PER_USER)), 1, 5)
        rows += [(u + 1, int(i) + 1, float(x)) for i, x in zip(items, r)]
    rows.sort()
    return spark.createDataFrame(rows, "user_id int, item_id int, rating float")
