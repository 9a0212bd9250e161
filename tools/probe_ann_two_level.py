"""Two-level quantizer scale probe — ingest throughput vs the flat fold
at replica widths, plus flat-agreement on a deterministic sample.

The flat per-row assignment fold is linear in quantizer width (measured
at the 2M replica: ~33k rows/s across 32 threads at 16 cells, 1.5k at
256, 147 at 2048), while production widths grow as sqrt(corpus). The
hierarchical selection (streaming/ann_index.py ivf_two_level_assign)
costs (1 + ANN_GROUP_PROBE) * sqrt(cells) dots per row. This probe
measures both shapes on the same sample at a given width and reports
the speedup and the agreement the approximation pays for it.

Usage:
    python tools/scale_testdata.py /root/testdata/sf0.1 /tmp/sf100x_emb 1000 embeddings
    python tools/probe_ann_two_level.py /tmp/sf100x_emb [n_cells] [sample_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cqu_bigdata_recommender_system_for_movies_spark.session import get_spark
from cqu_bigdata_recommender_system_for_movies_spark.streaming.ann_index import (
    ANN_GROUP_PROBE,
    _ann_cents_relation,
    _two_level_cell,
    _two_level_relations,
    assign_batch,
    derive_ann_cells,
    derive_group_width,
)
from cqu_bigdata_recommender_system_for_movies_spark.tables import load


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_cells = int(sys.argv[2]) if len(sys.argv) > 2 else derive_ann_cells(sf_dir)
    sample_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 40_000
    spark = get_spark("ann-two-level-probe")

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    sample = emb.filter(F.col("vec_id") < sample_rows).repartition(32).cache()
    n = sample.count()

    n_reps = derive_group_width(n_cells)
    reps, gcents = _two_level_relations(emb, n_cells, n_reps)
    t0 = time.perf_counter()
    two_rows = (
        sample.crossJoin(F.broadcast(gcents))
        .crossJoin(F.broadcast(reps))
        .select("vec_id", _two_level_cell("e").alias("cell"))
        .collect()
    )
    two_sec = round(time.perf_counter() - t0, 1)

    cents = _ann_cents_relation(emb, n_cells)
    t1 = time.perf_counter()
    flat_rows = assign_batch(sample, cents).collect()
    flat_sec = round(time.perf_counter() - t1, 1)

    two = {r.vec_id: r.cell for r in two_rows}
    flat = {r.vec_id: r.cell for r in flat_rows}
    agreement = round(sum(1 for k in flat if two.get(k) == flat[k]) / len(flat), 4)

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_cells": n_cells,
                "n_reps": n_reps,
                "group_probe": ANN_GROUP_PROBE,
                "sample_rows": n,
                "flat_sec": flat_sec,
                "flat_rows_per_sec": int(n / flat_sec) if flat_sec else None,
                "two_level_sec": two_sec,
                "two_level_rows_per_sec": int(n / two_sec) if two_sec else None,
                "speedup": round(flat_sec / two_sec, 2) if two_sec else None,
                "flat_agreement": agreement,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
