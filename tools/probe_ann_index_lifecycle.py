"""ANN index maintenance lifecycle probe (VERDICT r13 #3/#5/#8).

Runs the incremental IVF maintenance loop (streaming/ann_index.py) at a
replica scale with the audit on and reports, as JSON lines:

1. WRITE path: per-batch append seconds + live file count — the
   file-growth bound under compaction (files never exceed
   n_buckets x (ANN_COMPACT_EVERY + 1); each compaction drops the count
   back to <= n_buckets).
2. READ path: the cell-probe join against the MAINTAINED table (built
   by N incremental appends + swaps, multiple files per bucket — the
   state a long-lived index is actually in), timed with broadcast
   thresholds zeroed and its physical plan checked for the
   SMJ-with-no-dim-exchange shape (the bucketed layout must survive
   maintenance).
3. STALENESS signal: the audit's per-batch largest-cell/mean-cell
   ratio, plus one INJECTED drifted batch (vectors clustered at a
   single centroid) — the probe reports the drifted batch's skew beside
   the organic band, showing the metric flags quantizer staleness.

With --upsert, runs the RE-EMBEDDING loop instead (versioned slices,
last-writer-wins, purging compaction) and reports the merge-on-write
cost: rows before/after each purge and the total maintenance time.

Usage:
    python tools/scale_testdata.py /root/testdata/sf0.1 /tmp/sf100x_emb 1000 embeddings
    python tools/probe_ann_index_lifecycle.py /tmp/sf100x_emb [n_slices] [compact_every] [--upsert]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cqu_bigdata_recommender_system_for_movies_spark.session import get_spark
from cqu_bigdata_recommender_system_for_movies_spark.streaming.ann_index import (
    ANN_COMPACT_EVERY,
    _ann_cents_relation,
    _index_file_count,
    derive_ann_cells,
    _table_location,
    apply_index_batch,
    maintain_index,
)
from cqu_bigdata_recommender_system_for_movies_spark.tables import load

TABLE = "spark_graft_ann_index_probe"
N_BUCKETS = 16


def main() -> None:
    args = [a for a in sys.argv[1:] if a not in ("--upsert", "--deletes")]
    deletes = "--deletes" in sys.argv
    upsert = "--upsert" in sys.argv or deletes  # deletes implies versioning
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    n_slices = int(args[1]) if len(args) > 1 else (5 if deletes else 4 if upsert else 12)
    compact_every = (
        int(args[2]) if len(args) > 2 else (2 if upsert else ANN_COMPACT_EVERY)
    )
    # optional pinned quantizer width (decade replicas: the flat fold is
    # linear in width, so multi-pass runs pin a narrow quantizer — the
    # r14 decade convention; None derives the capped sqrt width)
    pin_cells = int(args[3]) if len(args) > 3 else None
    spark = get_spark("ann-index-lifecycle-probe")

    audit: list = []
    t0 = time.perf_counter()
    snap = maintain_index(
        spark,
        sf_dir,
        TABLE,
        n_slices,
        compact_every=compact_every,
        audit=audit,
        cleanup=False,
        upsert=upsert,
        deletes=deletes,
        n_cells=pin_cells,
    )
    maintain_sec = round(time.perf_counter() - t0, 1)
    n_vecs = snap.count()
    print(
        json.dumps(
            {
                "mode": (
                    "delete" if deletes else "upsert" if upsert else "append"
                ),
                "maintain_sec": maintain_sec,
                "n_vectors": n_vecs,
                "rows_at_compactions": [
                    a["rows"] for a in audit if "compacted_after" in a
                ],
                "n_slices": n_slices,
                "compact_every": compact_every,
                "file_bound": N_BUCKETS * (compact_every + 1),
                "max_files_seen": max(
                    a["files"] for a in audit if "files" in a
                ),
                "files_after_compactions": [
                    a["files"] for a in audit if "compacted_after" in a
                ],
                "final_files": _index_file_count(_table_location(spark, TABLE)),
                "organic_cell_skew": [
                    a["cell_skew"]
                    for a in audit
                    if a.get("cell_skew") is not None
                ],
            }
        ),
        flush=True,
    )

    # READ path against the maintained (multi-append, multi-generation)
    # table: 1000 probe users fanned across the cells, thresholds zeroed
    # so the plan is the past-broadcast SMJ — the bucketed dim side must
    # contribute NO exchange even after N appends + swaps.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    probes = spark.range(1000).select(
        F.col("id").alias("query_id"),
        (F.col("id") % N_BUCKETS).cast("int").alias("cell"),
    )
    fetched = probes.join(spark.table(TABLE).select("vec_id", "cell"), "cell")
    physical = fetched._jdf.queryExecution().executedPlan().toString()
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        n_candidates = fetched.count()
        reps.append(round(time.perf_counter() - t0, 2))
    print(
        json.dumps(
            {
                "read_smj": "SortMergeJoin" in physical,
                "read_cartesian": "CartesianProduct" in physical,
                "read_cell_exchanges": len(
                    re.findall(r"Exchange hashpartitioning\(cell", physical)
                ),
                "read_reps_sec": reps,
                "candidates_fetched": n_candidates,
            }
        ),
        flush=True,
    )

    # STALENESS injection: a drifted batch — every vector sits exactly at
    # quantizer seed 3, so the whole batch lands in one cell. The
    # per-batch skew must spike to ~n_occupied_cells while the organic
    # band stays near 1. (Append-mode only: the upsert table carries a
    # version column this synthetic batch doesn't.)
    if upsert:
        import shutil

        final_loc = _table_location(spark, TABLE)
        spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
        shutil.rmtree(final_loc, ignore_errors=True)
        base = os.path.join("/tmp", "spark_graft_tables", TABLE)
        for gen in range(n_slices + 2):
            shutil.rmtree(f"{base}_gen{gen}", ignore_errors=True)
        spark.stop()
        return
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    n_cells = pin_cells if pin_cells is not None else derive_ann_cells(sf_dir)
    cents = _ann_cents_relation(emb, n_cells)
    seed3 = emb.filter(F.col("vec_id") == 3).select("e").collect()[0].e
    drifted = spark.range(n_vecs, n_vecs + 10_000).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(float(x)) for x in seed3]).alias("e"),
    )
    loc = _table_location(spark, TABLE)
    apply_index_batch(spark, TABLE, loc, drifted, cents, 10_000_000, N_BUCKETS)
    cells = (
        spark.table(TABLE)
        .where(F.col("batch_id") == 10_000_000)
        .groupBy("cell")
        .count()
        .collect()
    )
    counts = [r["count"] for r in cells]
    # same definition as the audit's cell_skew: largest cell vs the mean
    # over ALL quantizer cells
    drift_skew = round(max(counts) / (sum(counts) / n_cells), 3)
    organic = [
        a["cell_skew"] for a in audit if a.get("cell_skew") is not None
    ]
    print(
        json.dumps(
            {
                "drifted_batch_skew": drift_skew,
                "organic_skew_max": max(organic),
                "drift_flagged": drift_skew > 3 * max(organic),
            }
        ),
        flush=True,
    )

    import shutil

    final_loc = _table_location(spark, TABLE)
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
    shutil.rmtree(final_loc, ignore_errors=True)
    base = os.path.join("/tmp", "spark_graft_tables", TABLE)
    for gen in range(n_slices + 2):
        shutil.rmtree(f"{base}_gen{gen}", ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
