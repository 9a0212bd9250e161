"""Guards for the sketch operators' exact-mode assumptions.

The oracle checks in test_oracle_parity compare sketch ESTIMATES against
exact counts — valid only while the sketches operate in their exact
regimes (HLL coupon mode; frequent-items without eviction). These tests
assert the regime preconditions directly so a testdata regeneration that
violates them fails here with a clear message instead of as an opaque
driver hash mismatch.
"""

from __future__ import annotations

from cqu_bigdata_recommender_system_for_movies_spark.operators.sketches import (
    TOPK_MAX_ITEMS_TRACKED,
    approx_topk_parts,
    hll_distinct_rollup,
)
from cqu_bigdata_recommender_system_for_movies_spark.tables import load


def test_hll_rollup_total_matches_merged_sketches(spark, sf_dir):
    rows = {r.event_type: r for r in hll_distinct_rollup(spark, sf_dir).collect()}
    assert "ALL" in rows
    per_type = [r for t, r in rows.items() if t != "ALL"]
    # Merged-sketch total must equal the true overall distinct (exact mode)
    exact_total = (
        load(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert rows["ALL"].approx_users == exact_total
    # ... and be <= the sum of per-type distincts (users overlap types)
    assert rows["ALL"].approx_users <= sum(r.approx_users for r in per_type)
    assert rows["ALL"].n_events == sum(r.n_events for r in per_type)


def test_topk_sketch_stays_exact(spark, sf_dir):
    n_distinct_parts = (
        load(spark, sf_dir, "lineitem").select("l_partkey").distinct().count()
    )
    assert n_distinct_parts < TOPK_MAX_ITEMS_TRACKED, (
        "frequent-items sketch would evict: counts no longer exact and the "
        "oracle comparison in test_oracle_parity is invalid at this sf"
    )
    out = approx_topk_parts(spark, sf_dir).collect()
    # boundary-tie drop keeps at most k-1 items and counts strictly above
    # the boundary count
    assert len(out) < 20
    assert len({r.item for r in out}) == len(out)
