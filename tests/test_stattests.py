"""Invariant guards for the statistical-analysis operators (stattests.py,
plus the round-5 sampling/rec additions). Parity with the DuckDB oracles is
covered by test_oracle_parity; these pin the STATISTICAL properties the
oracles can't express — bounds, conservation, and distributional sanity —
so a future edit that stays self-consistent on both engines but breaks the
math fails loudly."""

from __future__ import annotations

import math

from cqu_bigdata_recommender_system_for_movies_spark.operators.sampling import (
    WEIGHTED_SAMPLE_K,
    weighted_reservoir_sample,
)
from cqu_bigdata_recommender_system_for_movies_spark.operators.stattests import (
    BOOT_REPLICAS,
    _POIS_CDF,
    bootstrap_mean_ci,
    ks_test_source_drift,
    source_lang_kl_divergence,
)
from cqu_bigdata_recommender_system_for_movies_spark.operators.topk import (
    rec_diversity_metrics,
)


def test_poisson_cdf_thresholds_are_poisson_one():
    # P(N<=k) for Poisson(1): e^-1 * sum_{j<=k} 1/j!
    acc = 0.0
    for k, t in enumerate(_POIS_CDF):
        acc += 1.0 / math.factorial(k)
        assert abs(t - math.exp(-1) * acc) < 1e-6, (k, t)


def test_bootstrap_ci_brackets_mean_and_se_positive(spark, sf_dir):
    rows = bootstrap_mean_ci(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.boot_se > 0, r
        assert r.ci_lo < r.mean < r.ci_hi, r
        # SE of a mean of n iid values ~ sigma/sqrt(n): must shrink well
        # below the data scale for the fixture's group sizes
        assert r.boot_se < r.mean, r
    assert BOOT_REPLICAS >= 10


def test_ks_stat_bounds_and_self_consistency(spark, sf_dir):
    rows = ks_test_source_drift(spark, sf_dir).collect()
    assert rows
    total = sum(r.n_docs for r in rows)
    for r in rows:
        assert 0.0 <= r.ks_stat <= 1.0, r
        # a source that IS most of the corpus cannot drift far from it
        if r.n_docs > 0.9 * total:
            assert r.ks_stat < 0.1, r


def test_kl_divergence_nonnegative(spark, sf_dir):
    rows = source_lang_kl_divergence(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # KL >= 0 up to the 6dp output rounding
        assert r.kl_vs_global >= -1e-6, r


def test_weighted_sample_is_k_per_group_without_replacement(spark, sf_dir):
    rows = weighted_reservoir_sample(spark, sf_dir).collect()
    by_group = {}
    for r in rows:
        by_group.setdefault(r.o_orderpriority, []).append(r)
    for g, rs in by_group.items():
        assert len(rs) == WEIGHTED_SAMPLE_K, g
        # without replacement: no duplicate keys inside a group
        assert len({r.o_orderkey for r in rs}) == len(rs), g
        assert sorted(r.rk for r in rs) == list(range(1, len(rs) + 1)), g


def test_rec_diversity_gini_and_coverage_bounds(spark, sf_dir):
    r = rec_diversity_metrics(spark, sf_dir).first()
    assert 0.0 < r.coverage <= 1.0
    assert -1e-6 <= r.exposure_gini <= 1.0
    assert r.n_rec_items <= r.catalog_n
