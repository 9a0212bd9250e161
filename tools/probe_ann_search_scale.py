"""Streaming-vector-search scale probe (the r14 serving path at the
2M-vector replica).

The registered `streaming_ann_search` derives its quantizer width from
the corpus count (derive_ann_cells — r15, after this probe's r14 curve
showed width is the dominant serving-cost dial); this probe keeps the
width a CLI argument so the cost curve around the derived point stays
measurable (cells ~ sqrt(corpus) balances assignment cost against
per-query candidate volume). It builds the
vector-bearing index at a configurable width via the maintenance write
path, then serves a query batch and reports:

- index build seconds (one-pass corpus assignment + bucketed write);
- per-query candidate volume (corpus x nprobe / cells);
- serve seconds for the batch and the amortized per-query latency;
- the candidate-fetch join strategy in the executed plan.

Usage:
    python tools/scale_testdata.py /root/testdata/sf0.1 /tmp/sf100x_emb 1000 embeddings
    python tools/probe_ann_search_scale.py /tmp/sf100x_emb [n_cells] [n_queries]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cqu_bigdata_recommender_system_for_movies_spark.session import get_spark
from cqu_bigdata_recommender_system_for_movies_spark.streaming.ann_index import (
    _ann_cents_relation,
    apply_index_batch,
)
from cqu_bigdata_recommender_system_for_movies_spark.streaming.ann_search import (
    score_query_batch,
)
from cqu_bigdata_recommender_system_for_movies_spark.tables import load

TABLE = "spark_graft_ann_search_probe"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_cells = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    spark = get_spark("ann-search-scale-probe")

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    n_corpus = emb.count()
    cents = _ann_cents_relation(emb, n_cells=n_cells)
    loc = os.path.join("/tmp", "spark_graft_tables", TABLE)
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
    shutil.rmtree(loc, ignore_errors=True)
    n_buckets = min(64, n_cells)

    t0 = time.perf_counter()
    apply_index_batch(spark, TABLE, loc, emb, cents, 0, n_buckets, carry=("e",))
    build_sec = round(time.perf_counter() - t0, 1)

    index_df = spark.table(TABLE).select(
        F.col("vec_id").alias("neighbor_id"), "cell", F.col("e").alias("ne")
    )
    mod = max(1, n_corpus // n_queries)
    queries = emb.filter(F.pmod("vec_id", F.lit(mod)) == 7)
    n_q = queries.count()
    scored = score_query_batch(queries, cents, index_df)
    physical = scored._jdf.queryExecution().executedPlan().toString()

    t0 = time.perf_counter()
    n_rows = scored.count()
    serve_sec = round(time.perf_counter() - t0, 1)

    print(
        json.dumps(
            {
                "n_corpus": n_corpus,
                "n_cells": n_cells,
                "n_queries": n_q,
                "build_sec": build_sec,
                "serve_sec": serve_sec,
                "per_query_ms": round(1000.0 * serve_sec / max(n_q, 1), 1),
                "result_rows": n_rows,
                "approx_candidates_per_query": round(2 * n_corpus / n_cells),
                "join": (
                    "broadcast"
                    if "BroadcastHashJoin" in physical
                    else "smj"
                    if "SortMergeJoin" in physical
                    else "other"
                ),
                "cartesian": "CartesianProduct" in physical,
            }
        ),
        flush=True,
    )
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
    shutil.rmtree(loc, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
