"""Quantizer-refresh/migration scale probe (the r15 staleness actuator
at replica scale — VERDICT r14 #4's done-criterion beyond the oracle).

Runs the full drift story (streaming/ann_requantize.py: organic appends
under the frozen quantizer, a drifted final slice, the per-batch
cell-skew alarm, the refresh-from-index re-seed, the one-generation
migration rewrite) and reports:

- every batch's cell skew + whether it tripped ANN_SKEW_REFRESH (the
  organic band vs drift separation at this scale);
- migration seconds (the actuator's cost: one assignment fold over the
  stored vectors + one exchange onto the new bucket layout);
- post-migration EQUALITY against the engine's one-pass rebuild under
  the refreshed quantizer (the hash claim the sf-scale DuckDB oracle
  checks, re-proven at replica scale where DuckDB can't follow);
- post-migration skew of the full index under the new quantizer vs the
  drifted batch's skew under the old one (remediation measured).

Usage:
    python tools/scale_testdata.py /root/testdata/sf0.1 /tmp/sf100x_emb 1000 embeddings
    python tools/probe_ann_requantize.py /tmp/sf100x_emb [n_slices] [sample_mod]

``sample_mod`` > 1 checks migrated-equals-rebuild on the deterministic
vec_id % sample_mod == 0 subset instead of the full corpus (the full
equality is already driver-hash-proven at three sfs; at replica scale
the rebuild twin would cost another full assignment pass) and reads the
post-migration skew from the migrated table's stored cells instead of
re-assigning.
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
    assign_batch,
    derive_ann_cells,
)
from cqu_bigdata_recommender_system_for_movies_spark.streaming.ann_requantize import (
    ANN_SKEW_REFRESH,
    N_REQUANT_SLICES,
    requantize_loop,
)
from cqu_bigdata_recommender_system_for_movies_spark.tables import load

TABLE = "spark_graft_ann_requant_probe"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_slices = int(sys.argv[2]) if len(sys.argv) > 2 else N_REQUANT_SLICES
    sample_mod = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    spark = get_spark("ann-requantize-probe")

    n_cells = derive_ann_cells(sf_dir)
    audit: list = []
    t0 = time.perf_counter()
    snap = requantize_loop(
        spark, sf_dir, TABLE, n_slices=n_slices, audit=audit, cleanup=False
    )
    total_sec = round(time.perf_counter() - t0, 1)
    got = {
        r.vec_id: r.cell
        for r in snap.filter(F.pmod("vec_id", F.lit(sample_mod)) == 0).collect()
    }
    n_vectors = len(got) if sample_mod == 1 else snap.count()

    # the engine's one-pass rebuild under the REFRESHED quantizer: the
    # arrived corpus (drift payload on the last slice) assigned against
    # seeds taken from the arrived corpus itself — must equal the
    # migrated index exactly (on the deterministic sample when
    # sample_mod > 1; full equality is driver-hash-proven at suite sfs)
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    arrived = emb.withColumn(
        "e",
        F.when(
            F.pmod("vec_id", F.lit(n_slices)) == n_slices - 1,
            F.transform("e", lambda x: F.abs(x) + F.lit(1.0)),
        ).otherwise(F.col("e")),
    )
    new_cents = _ann_cents_relation(arrived, n_cells)
    t1 = time.perf_counter()
    expected = {
        r.vec_id: r.cell
        for r in assign_batch(
            arrived.filter(F.pmod("vec_id", F.lit(sample_mod)) == 0), new_cents
        ).collect()
    }
    rebuild_sec = round(time.perf_counter() - t1, 1)

    # post-migration balance, read from the migrated table's STORED
    # cells (one aggregation over the index; no re-assignment pass)
    post_hist = spark.table(TABLE).groupBy("cell").count().collect()
    counts = [r["count"] for r in post_hist]
    post_skew = round(max(counts) / (sum(counts) / n_cells), 2)

    batches = [a for a in audit if "batch_id" in a]
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_vectors": int(n_vectors),
                "n_cells": n_cells,
                "sample_mod": sample_mod,
                "threshold": ANN_SKEW_REFRESH,
                "batch_skews": [a["cell_skew"] for a in batches],
                "alarm_batches": [a["batch_id"] for a in batches if a["alarm"]],
                "migrated": any(a.get("migrated") for a in audit),
                "migrated_equals_rebuild": got == expected,
                "checked_rows": len(got),
                "post_migration_full_skew": post_skew,
                "loop_plus_migration_sec": total_sec,
                "sampled_rebuild_sec": rebuild_sec,
            }
        ),
        flush=True,
    )

    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
    base = os.path.join("/tmp", "spark_graft_tables", TABLE)
    for gen in range(2):
        shutil.rmtree(f"{base}_gen{gen}", ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
