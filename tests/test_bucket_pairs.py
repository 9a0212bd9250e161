"""The _bucket_pairs size-split must be invisible: big buckets (the keyed
self-join branch) and small buckets (the map-side array branch) must
enumerate exactly the same unordered pairs.

This branch is DEAD CODE at every shipped test sf — buckets only exceed
SHINGLE_DF_CAP once duplicate families pass 50 docs (seen at the r8 100x
probe, where a 24,800-doc bucket OOM'd the in-row array path). Per the
r7 vacuity lesson, the branch gets direct synthetic coverage here instead
of trusting green runs that never execute it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cqu_bigdata_recommender_system_for_movies_spark.operators.dedup import (
    SHINGLE_DF_CAP,
    _bucket_pairs,
    _pairs_in_array,
)


def _bucket_df(spark, buckets):
    """rows of (band, key, ds) from {(band, key): [doc ids]}"""
    rows = [(band, key, ids) for (band, key), ids in buckets.items()]
    return spark.createDataFrame(
        rows, "band int, key string, ds array<bigint>"
    )


def _expected_pairs(buckets):
    out = set()
    for ids in buckets.values():
        s = sorted(set(ids))
        for i, a in enumerate(s):
            for b in s[i + 1 :]:
                out.add((a, b))
    return out


def test_big_bucket_self_join_matches_array_enumeration(spark):
    # one bucket well past the cap (exercises the self-join branch), one at
    # the cap boundary (array branch), one tiny, plus duplicate membership
    # across buckets (pairs may repeat pre-distinct)
    big = list(range(1000, 1000 + SHINGLE_DF_CAP * 3))  # 150 docs
    edge = list(range(5000, 5000 + SHINGLE_DF_CAP))  # exactly the cap
    buckets = {
        (0, "hot"): big,
        (0, "edge"): edge,
        (1, "tiny"): [7, 3],
        (1, "overlap"): big[:10] + [7],
    }
    got = {
        (r.doc_a, r.doc_b)
        for r in _bucket_pairs(_bucket_df(spark, buckets), ["band", "key"])
        .distinct()
        .collect()
    }
    assert got == _expected_pairs(buckets)
    # sanity: the big branch really ran (a bucket above the cap exists)
    assert len(big) > SHINGLE_DF_CAP


def test_big_bucket_emission_is_chunked(spark):
    """VERDICT r8 #3: the big branch used to self-join on the bucket key
    alone, so ONE task emitted a mega-bucket's entire C(n,2) output (307M
    pairs for the 24,800-doc bucket at the 100x probe) — output fan-out
    is invisible to AQE's skew handling. The probe side is now split into
    ceil(n/CAP) hash chunks joined on (key, chunk): assert the chunk ids
    actually spread a hot bucket across multiple join keys, the pinned
    REPARTITION_BY_NUM survives in the plan, and the pair set is
    unchanged."""
    n = SHINGLE_DF_CAP * 4  # 200 docs -> nc = 4 chunks
    buckets = {(0, "mega"): list(range(n))}
    df = _bucket_df(spark, buckets)
    pairs = _bucket_pairs(df, ["band", "key"])
    got = {(r.doc_a, r.doc_b) for r in pairs.distinct().collect()}
    assert got == _expected_pairs(buckets)
    assert len(got) == n * (n - 1) // 2
    # the probe side's chunk column must take ceil(n/CAP) distinct values
    # (multi-task emission), and the explicit numPartitions repartition —
    # exempt from AQE coalescing — must survive into the optimized plan
    nc = -(-n // SHINGLE_DF_CAP)
    probe_chunks = (
        df.select(
            F.explode("ds").alias("doc_a"),
            F.ceil(F.size("ds") / SHINGLE_DF_CAP).cast("int").alias("nc"),
        )
        .select(F.pmod(F.hash("doc_a"), F.col("nc")).alias("chunk"))
        .distinct()
        .count()
    )
    assert probe_chunks == nc
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_NUM" in plan


def test_size_split_agrees_with_pure_array_path(spark):
    """On buckets the array path can still afford (<= ~200 docs), the
    size-split result equals brute-force _pairs_in_array over every
    bucket — the two branches implement one specification."""
    buckets = {
        (0, "a"): list(range(120)),  # big branch
        (0, "b"): list(range(200, 230)),  # small branch
        (2, "c"): list(range(300, 302)),
    }
    df = _bucket_df(spark, buckets)
    split = {
        (r.doc_a, r.doc_b)
        for r in _bucket_pairs(df, ["band", "key"]).distinct().collect()
    }
    brute = {
        (r.p.doc_a, r.p.doc_b)
        for r in df.filter(F.size("ds") >= 2)
        .select(F.explode(_pairs_in_array("ds")).alias("p"))
        .distinct()
        .collect()
    }
    assert split == brute
