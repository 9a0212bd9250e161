"""Independent semantic checks for the round-6 boundary-bucketing re-plans.

The DuckDB oracles for rfm_segmentation and quality_quartile_stats share
the same boundary-bucketing CONSTRUCTION as the Spark side, so oracle
parity cannot catch a design-level error in the construction itself.
These tests pin the semantics against an independently computed reference
(exact NTILE / simple invariants) on synthetic staged tables — made
possible by the (spark, sf_dir) query interface: stage a temp dir with a
crafted parquet table and point the registered query at it.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from cqu_bigdata_recommender_system_for_movies_spark.operators.olap import (
    rfm_segmentation,
)
from cqu_bigdata_recommender_system_for_movies_spark.operators.text import (
    STOPWORDS,
    quality_quartile_stats,
)

STOP = sorted(STOPWORDS)[0]  # one stopword token
N_TOK = 40


def _stage_documents(spark, rows):
    """rows: list of (doc_id, text). Returns a sf_dir-like temp dir."""
    d = tempfile.mkdtemp(prefix="spark_graft_synth_")
    spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    return d


def test_quality_quartiles_equal_ntile_on_distinct_ratios(spark):
    """With all stopword ratios DISTINCT, histogram-boundary bucketing is
    exactly NTILE(4): boundary b_k is the value at NTILE position p_k and
    values increase strictly with rank, so 1 + sum(v > b_k) == ntile."""
    rows = [
        (i, " ".join([STOP] * i + ["zword"] * (N_TOK - i)))
        for i in range(N_TOK)  # ratios i/40: 40 distinct values
    ]
    d = _stage_documents(spark, rows)
    try:
        got = {
            r.quartile: (r.n_docs, r.min_ratio, r.max_ratio, r.avg_tokens)
            for r in quality_quartile_stats(spark, d).collect()
        }
        # exact NTILE(4) over 40 distinct ratios: 4 buckets of 10,
        # bucket q covers ratios (10(q-1))/40 .. (10q-1)/40
        assert set(got) == {1, 2, 3, 4}
        for q in range(1, 5):
            n_docs, mn, mx, avg = got[q]
            assert n_docs == 10
            assert mn == pytest.approx((10 * (q - 1)) / N_TOK, abs=1e-4)
            assert mx == pytest.approx((10 * q - 1) / N_TOK, abs=1e-4)
            assert avg == pytest.approx(N_TOK, abs=1e-9)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_quality_quartiles_collapse_ties_to_one_bucket(spark):
    """All-equal ratios: every boundary equals the single value, v > b is
    false everywhere, so ALL rows land in quartile 1 — the deterministic
    tie semantics that replace NTILE's arbitrary doc_id split (and the
    reason no per-row total order is needed at any scale)."""
    rows = [(i, " ".join([STOP] * 4 + ["zword"] * 4)) for i in range(37)]
    d = _stage_documents(spark, rows)
    try:
        out = quality_quartile_stats(spark, d).collect()
        assert len(out) == 1
        r = out[0]
        assert r.quartile == 1 and r.n_docs == 37
        assert r.min_ratio == r.max_ratio == pytest.approx(0.5, abs=1e-9)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _stage_orders(spark, rows):
    """rows: (o_orderkey, o_custkey, o_totalprice, o_orderdate_str)."""
    import datetime

    d = tempfile.mkdtemp(prefix="spark_graft_synth_")
    spark.createDataFrame(
        [
            (k, c, "O", p, datetime.datetime.fromisoformat(dt), "1-URGENT")
            for k, c, p, dt in rows
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.parquet(f"{d}/orders.parquet")
    return d


def test_rfm_scores_balance_and_order_on_distinct_values(spark):
    """One order per customer, all three dimensions strictly increasing
    with customer id: every score dimension must (a) produce all four
    buckets with near-equal sizes (interpolated-percentile boundaries
    split distinct values within +-2 of N/4), and (b) be monotone — the
    segment summary must therefore be 4 diagonal cells r=f=m."""
    import datetime

    n = 40
    # recency strictly increasing with custkey (day offsets)
    base = datetime.date(2024, 1, 1)
    rows = [
        (i, i, 100.0 + i, (base + datetime.timedelta(days=i)).isoformat() + "T00:00:00")
        for i in range(n)
    ]
    d = _stage_orders(spark, rows)
    try:
        out = rfm_segmentation(spark, d).collect()
        # frequency is constant (1 order each) -> f_score identical for all;
        # recency and monetary increase together -> r and m move together
        cells = {(r.r_score, r.m_score): r.n_users for r in out}
        assert sorted({r for r, _ in cells}) == [1, 2, 3, 4]
        assert sorted({m for _, m in cells}) == [1, 2, 3, 4]
        # monotone: r and m scores agree cell-by-cell (same underlying order)
        assert all(r == m for r, m in cells)
        sizes = [cells[(q, q)] for q in range(1, 5)]
        assert sum(sizes) == n
        assert all(abs(s - n / 4) <= 2 for s in sizes)
        # constant frequency -> a single f_score (everyone ties)
        assert len({r.f_score for r in out}) == 1
    finally:
        shutil.rmtree(d, ignore_errors=True)
