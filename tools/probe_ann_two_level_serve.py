"""End-to-end WIDE-width ANN story at replica scale: ingest through the
two-level quantizer, serve through it — the configuration the flat fold
cannot reach (2048 cells at 2M vectors costs ~4 h/pass flat, ~6 min
two-level).

Builds the vector-bearing cell-bucketed index with the hierarchical
assignment, then answers a query batch hierarchically as well (each
query probes its ANN_GROUP_PROBE best groups, then its SEARCH_NPROBE
best cells inside them; exact cosine top-k over the fetched cells'
candidates). Reports ingest rate, per-query serve latency, and the
candidate volume per query — the numbers that close the width trade the
r14 serving probe opened (600 -> 272 ms/query going 64 -> 256 cells;
this probe extends the curve to widths only the hierarchical ingest
can afford).

Usage:
    python tools/probe_ann_two_level_serve.py /tmp/sf100x_emb [n_cells] [n_queries]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from cqu_bigdata_recommender_system_for_movies_spark.operators.vectors import cosine
from cqu_bigdata_recommender_system_for_movies_spark.session import get_spark
from cqu_bigdata_recommender_system_for_movies_spark.streaming.ann_index import (
    ANN_MAX_BUCKETS,
    _two_level_cell,
    _two_level_cells,
    _two_level_relations,
    derive_group_width,
)
from cqu_bigdata_recommender_system_for_movies_spark.streaming.ann_search import (
    SEARCH_NPROBE,
    SEARCH_TOPK,
)
from cqu_bigdata_recommender_system_for_movies_spark.tables import load

TABLE = "spark_graft_ann_two_level_serve_probe"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_cells = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    spark = get_spark("ann-two-level-serve-probe")

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    n_corpus = emb.count()
    n_reps = derive_group_width(n_cells)
    reps, gcents = _two_level_relations(emb, n_cells, n_reps)
    n_buckets = min(ANN_MAX_BUCKETS, n_cells)

    loc = os.path.join("/tmp", "spark_graft_tables", TABLE)
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
    shutil.rmtree(loc, ignore_errors=True)
    t0 = time.perf_counter()
    (
        emb.repartition(32)
        .crossJoin(F.broadcast(gcents))
        .crossJoin(F.broadcast(reps))
        .select("vec_id", _two_level_cell("e").alias("cell"), "e")
        .repartition(n_buckets, "cell")
        .write.mode("overwrite")
        .option("path", loc)
        .bucketBy(n_buckets, "cell")
        .sortBy("cell")
        .format("parquet")
        .saveAsTable(TABLE)
    )
    build_sec = round(time.perf_counter() - t0, 1)

    # a replica-scale vector-bearing index must NEVER be broadcast (the
    # deserialized build OOMs the driver — observed at 2M x 256 cells
    # when AQE stat-broadcast the freshly-written bucketed table); zero
    # both thresholds so the serve join is the production past-ceiling
    # shape: SMJ reading the bucketed index side with no exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    index_df = spark.table(TABLE).select(
        F.col("vec_id").alias("neighbor_id"), "cell", F.col("e").alias("ne")
    )
    qmod = max(1, n_corpus // n_queries)
    queries = emb.filter(F.pmod("vec_id", F.lit(qmod)) == 7)
    nq = queries.count()
    probes = (
        queries.crossJoin(F.broadcast(gcents))
        .crossJoin(F.broadcast(reps))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("qe"),
            F.explode(_two_level_cells("e", SEARCH_NPROBE)).alias("cell"),
        )
    )
    cands = probes.join(index_df, "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(cosine("qe", "ne")), F.asc("neighbor_id")
    )
    served = (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= SEARCH_TOPK)
        .select("query_id", "rank", "neighbor_id")
    )
    reps_sec = []
    n_served = 0
    for _ in range(3):
        t1 = time.perf_counter()
        n_served = served.count()
        reps_sec.append(round(time.perf_counter() - t1, 2))
    n_cands = cands.count()
    physical = served._jdf.queryExecution().executedPlan().toString()

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_corpus": n_corpus,
                "n_cells": n_cells,
                "n_reps": n_reps,
                "build_sec": build_sec,
                "build_rows_per_sec": int(n_corpus / build_sec),
                "n_queries": nq,
                "serve_reps_sec": reps_sec,
                "ms_per_query_warm": round(min(reps_sec) * 1000.0 / nq, 1),
                "candidates_per_query": int(n_cands / nq) if nq else None,
                "served_rows": n_served,
                "serve_cartesian": "CartesianProduct" in physical,
                "serve_smj": "SortMergeJoin" in physical,
            }
        ),
        flush=True,
    )
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
    shutil.rmtree(loc, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
