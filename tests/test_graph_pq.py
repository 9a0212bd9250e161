"""Invariants for the graph operators and IVF-PQ beyond the SQL-oracle
parity check: PageRank's fixed-point bounds, walk validity (every hop is
a real edge), and PQ's recall floor vs the exact cell-local ranking."""

from __future__ import annotations

from pyspark.sql import functions as F

from cqu_bigdata_recommender_system_for_movies_spark.operators.graph import (
    TELEPORT,
    _edges,
    pagerank_bipartite,
    random_walk_training_paths,
)
from cqu_bigdata_recommender_system_for_movies_spark.operators.vectors import (
    PQ_N_CODES,
    ivf_pq_topk,
)


def test_pagerank_bounds_and_coverage(spark, sf_dir):
    pr = pagerank_bipartite(spark, sf_dir)
    stats = pr.agg(
        F.min("pagerank").alias("lo"),
        F.count("*").alias("n"),
    ).collect()[0]
    # teleport mass is the hard floor of the damped recurrence
    assert stats.lo >= TELEPORT
    n_items = _edges(spark, sf_dir).select("i").distinct().count()
    assert stats.n == n_items  # every item scored exactly once


def test_random_walk_hops_are_real_edges(spark, sf_dir):
    edges = _edges(spark, sf_dir)
    walks = random_walk_training_paths(spark, sf_dir)
    n_walks = walks.count()
    assert n_walks == edges.select("u").distinct().count()  # one per user
    for a, b, ucol, icol in [
        ("start_user", "item_step1", "u", "i"),
        ("user_step2", "item_step1", "u", "i"),
        ("user_step2", "item_step3", "u", "i"),
    ]:
        hop = walks.select(F.col(a).alias(ucol), F.col(b).alias(icol))
        missing = hop.join(edges, [ucol, icol], "left_anti").count()
        assert missing == 0, f"walk hop ({a},{b}) not in edge list"


def test_ivf_pq_recall_floor(spark, sf_dir):
    """ADC top-3 must beat the random-candidate baseline by a wide margin.
    Random embeddings are PQ's worst case (no cluster structure for the
    codebooks to exploit); measured recall@3 vs the exact cell-local L2
    ranking is ~0.28 at sf0.001 against a ~0.10 chance floor."""
    import duckdb

    got = [
        (r.vec_id, r.neighbor_id) for r in ivf_pq_topk(spark, sf_dir).collect()
    ]
    assert got, "no PQ results"
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    exact = con.execute(
        """
        WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        cent AS (SELECT vec_id AS cid, e AS ce FROM base WHERE vec_id < 16),
        cs AS (SELECT b.vec_id, b.e, c.cid,
                      ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY
                          list_dot_product(b.e, c.ce) /
                          (sqrt(list_dot_product(b.e, b.e)) *
                           sqrt(list_dot_product(c.ce, c.ce)) + 1e-8) DESC,
                          c.cid) rn
               FROM base b CROSS JOIN cent c),
        a AS (SELECT vec_id, e, cid AS cell FROM cs WHERE rn = 1),
        p AS (SELECT q.vec_id, x.vec_id AS nb,
                     list_sum(list_transform(list_zip(q.e, x.e),
                                             y -> (y[1]-y[2])**2)) AS d
              FROM a q JOIN a x ON q.cell = x.cell AND q.vec_id <> x.vec_id
              WHERE q.vec_id < 50),
        r AS (SELECT vec_id, nb,
                     ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, nb) rk
              FROM p)
        SELECT vec_id, nb FROM r WHERE rk <= 3
        """
    ).fetchall()
    con.close()
    exact_set = set(map(tuple, exact))
    recall = sum(1 for t in got if t in exact_set) / len(got)
    assert recall > 0.15, f"PQ recall@3 collapsed: {recall:.3f}"


def test_ivf_pq_codes_bounded(spark, sf_dir):
    out = ivf_pq_topk(spark, sf_dir)
    assert out.filter(F.col("approx_dist") < 0).count() == 0
    assert PQ_N_CODES == 16  # oracle SQL hardcodes the first-16 codebook


def test_multiprobe_dominates_single_probe(spark, sf_dir):
    """Multi-probe candidates are a superset of single-probe's, so recall
    vs the exact global top-3 can only improve (any displaced selection
    loses to a higher-cosine item). At sf0.001 the measured gain is
    0.433 -> 0.513."""
    import duckdb

    from cqu_bigdata_recommender_system_for_movies_spark.operators.vectors import (
        ann_ivf_multiprobe_topk,
        ann_ivf_topk,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    exact = con.execute(
        """
        WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        p AS (SELECT q.vec_id, x.vec_id AS nb,
                     list_dot_product(q.e, x.e) /
                     (sqrt(list_dot_product(q.e, q.e)) *
                      sqrt(list_dot_product(x.e, x.e)) + 1e-8) AS c
              FROM base q JOIN base x ON q.vec_id <> x.vec_id
              WHERE q.vec_id < 50),
        r AS (SELECT vec_id, nb,
                     ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c DESC, nb) rk
              FROM p)
        SELECT vec_id, nb FROM r WHERE rk <= 3
        """
    ).fetchall()
    con.close()
    exact_set = set(map(tuple, exact))

    def hits(fn):
        got = [(r.vec_id, r.neighbor_id) for r in fn(spark, sf_dir).collect()]
        return sum(1 for t in got if t in exact_set)

    single, multi = hits(ann_ivf_topk), hits(ann_ivf_multiprobe_topk)
    assert multi >= single, f"multi-probe recall regressed: {multi} < {single}"
    if sf_dir.rstrip("/").endswith("0.001"):
        assert multi > single  # measured: 77 vs 65 of 150
