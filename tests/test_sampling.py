"""Invariants for RNG/sketch operators (no SQL oracle possible)."""

from __future__ import annotations

from cqu_bigdata_recommender_system_for_movies_spark.operators.sampling import (
    approx_aggregates,
    random_split_counts,
)


def test_random_split_fractions_and_determinism(spark, sf_dir):
    a = random_split_counts(spark, sf_dir).collect()[0]
    b = random_split_counts(spark, sf_dir).collect()[0]
    assert (a.n_train, a.n_test) == (b.n_train, b.n_test)  # seeded
    assert a.n_train + a.n_test == a.n_total  # partition, no loss
    frac = a.n_train / a.n_total
    assert 0.75 < frac < 0.85  # ~80/20


def test_approx_distinct_within_bounds(spark, sf_dir):
    row = approx_aggregates(spark, sf_dir).collect()[0]
    assert abs(row.approx_users - row.exact_users) <= max(2, 0.05 * row.exact_users)
    assert row.approx_median_value > 0


def test_stratified_sample_invariants(spark, sf_dir):
    from cqu_bigdata_recommender_system_for_movies_spark.operators.sampling import (
        STRATA_FRACTIONS,
        stratified_sample_counts,
    )

    rows = {r.event_type: (r.n_total, r.n_sample)
            for r in stratified_sample_counts(spark, sf_dir).collect()}
    assert set(rows) == set(STRATA_FRACTIONS)
    for t, (total, sampled) in rows.items():
        frac = STRATA_FRACTIONS[t]
        assert 0 <= sampled <= total
        if frac == 1.0:
            assert sampled == total  # keep-all strata are exact
        else:  # Bernoulli: within a loose binomial band
            assert abs(sampled - frac * total) <= 4 * (total ** 0.5) + 1

    # seeded determinism
    again = {r.event_type: (r.n_total, r.n_sample)
             for r in stratified_sample_counts(spark, sf_dir).collect()}
    assert again == rows
