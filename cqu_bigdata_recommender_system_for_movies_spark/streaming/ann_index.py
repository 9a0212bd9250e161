"""Streaming ANN index maintenance (beyond-reference — the write path of
the similarity-search story at 100 TB).

The offline ANN family (operators/vectors.py) builds its IVF index in
one pass: `_ivf_assign_cells` assigns every vector to its nearest
coarse-quantizer cell map-side. At production scale the catalog is not
static — new items (documents, movies, users' uploads) arrive
continuously, and re-running the full assignment over a 100 TB corpus
per arrival batch is the same wrong shape as the ALS full retrain the
fold-in family replaces (ml/foldin.py). The production answer is
INCREMENTAL index maintenance: the quantizer (a bounded, driver-resident
seed set — production: sampled k-means centroids, refreshed rarely) is
FROZEN; each arriving micro-batch of vectors is assigned map-side
against the broadcast centroid row and APPENDED to the persistent
cell-bucketed index table that the read path (candidate pruning,
cell-local probe joins) consumes — the same bucketed-dim artifact
streaming/candidates.py builds for catalogs past the broadcast ceiling,
now maintained without rebuild.

`streaming_ann_index_update` runs that loop end to end on the
embeddings table staged as a 3-slice file stream:

- quantizer seeds = the N_IVF_CELLS smallest vec_ids of the EXISTING
  corpus (identical to ann_ivf_topk's deterministic quantizer,
  vectors.py:456), shipped once as the single-row broadcast `__cents`
  relation (plan size independent of the cell count);
- per micro-batch: one map-side fold per vector (the shared
  `_nearest_cells` expression from streaming/candidates.py — let-bound
  row norm, one pass over the cell structs, cos DESC / cid ASC ties),
  then an APPEND into the bucketBy(cell) index table — each batch adds
  its own bucketed files, the table's bucket spec is constant, and the
  read side keeps its no-dim-exchange join layout;
- the returned DataFrame is the final index contents (vec_id, cell).

Assignment is per-row deterministic given the frozen quantizer, so the
incremental build MUST equal the one-pass rebuild — the DuckDB oracle
computes the full-corpus assignment in one query, making "maintenance
converges to rebuild" an exact, hash-checked property rather than a
claim (the same argument the streaming dedup family uses for its batch
twins).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cqu_bigdata_recommender_system_for_movies_spark.operators.vectors import (
    N_IVF_CELLS,
    shuffle_partitions,
)
from cqu_bigdata_recommender_system_for_movies_spark.plans.registry import register
from cqu_bigdata_recommender_system_for_movies_spark.streaming.candidates import (
    _nearest_cells,
)
from cqu_bigdata_recommender_system_for_movies_spark.tables import load

ANN_INDEX_TABLE = "spark_graft_ann_index"
N_INDEX_SLICES = 3  # staged arrival batches for the availableNow replay


def _ann_cents_relation(emb: DataFrame, n_cells: int = N_IVF_CELLS) -> DataFrame:
    """The frozen quantizer as the single-row broadcast `__cents`
    relation (cid, ce, nc) — seeds = the n_cells smallest vec_ids of the
    existing corpus, norms precomputed with the same left fold +
    correctly-rounded sqrt as the oracle's sqrt(list_dot_product)
    (the `_ivf_assign_cells` / candidates `_centroid_relation` shape)."""
    spark = emb.sparkSession
    seeds = (
        emb.filter(F.col("vec_id") < n_cells)
        .select(F.col("vec_id").alias("cid"), F.col("e").alias("ce"))
        .collect()
    )

    def _norm(ce: list[float]) -> float:
        acc = 0.0
        for x in ce:
            acc += x * x
        return math.sqrt(acc)

    return spark.createDataFrame(
        [
            (
                [
                    (int(r.cid), [float(x) for x in r.ce], _norm(list(r.ce)))
                    for r in sorted(seeds, key=lambda r: r.cid)
                ],
            )
        ],
        schema="__cents array<struct<cid:int,ce:array<double>,nc:double>>",
    )


def assign_batch(batch_df: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, cell): map-side nearest-cell assignment of one arrival
    batch against the frozen quantizer — the shared `_nearest_cells`
    fold over the broadcast centroid row; no corpus-sized exchange."""
    return batch_df.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        F.element_at(_nearest_cells("e", 1), 1).alias("cell"),
    )


@register(
    "streaming_ann_index_update",
    # The full-corpus one-pass assignment IS the oracle: assignment is
    # per-row deterministic under the frozen quantizer, so the
    # incremental append-per-batch build must converge to it exactly
    # (same quantizer + fold + tie order as ann_ivf_topk's oracle,
    # vectors.py — cos DESC, cid ASC).
    oracle=f"""
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    cent AS (SELECT vec_id AS cid, e AS ce FROM base WHERE vec_id < {N_IVF_CELLS}),
    scored AS (
        SELECT b.vec_id, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY b.vec_id
                   ORDER BY list_dot_product(b.e, c.ce) /
                            (sqrt(list_dot_product(b.e, b.e)) *
                             sqrt(list_dot_product(c.ce, c.ce)) + 1e-8) DESC,
                            c.cid
               ) AS rn
        FROM base b CROSS JOIN cent c
    )
    SELECT vec_id, CAST(cid AS INTEGER) AS cell FROM scored WHERE rn = 1
    """,
    doc="Streaming ANN index MAINTENANCE (beyond-reference — the write "
    "path of the similarity-search story): new vectors arrive as "
    f"micro-batches ({N_INDEX_SLICES} staged slices, availableNow); "
    "each batch is assigned map-side against the FROZEN broadcast "
    f"quantizer (the first {N_IVF_CELLS} corpus vectors, ann_ivf_topk's "
    "seeds) and APPENDED to the persistent bucketBy(cell) index table "
    "the cell-local read path consumes — no corpus rebuild, each batch "
    "adds its own bucketed files under the constant bucket spec. "
    "Returns the final index (vec_id, cell); the oracle computes the "
    "one-pass full-corpus assignment, so incremental-equals-rebuild is "
    "hash-checked exactly.",
)
def streaming_ann_index_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from cqu_bigdata_recommender_system_for_movies_spark.streaming.queries import (
        _snapshot_and_clean,
    )

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    cents = _ann_cents_relation(emb)

    # stage the corpus as N_INDEX_SLICES arrival batches (pmod keeps the
    # slicing deterministic; one file per trigger = one batch per slice)
    stage_dir = tempfile.mkdtemp(prefix="spark_graft_ann_stage_")
    shutil.rmtree(stage_dir, ignore_errors=True)
    (
        emb.withColumn("slice", F.pmod("vec_id", F.lit(N_INDEX_SLICES)).cast("int"))
        .repartition(N_INDEX_SLICES, "slice")
        .write.mode("overwrite")
        .partitionBy("slice")
        .parquet(stage_dir)
    )
    read_schema = "vec_id long, e array<double>, slice integer"
    stream = (
        spark.readStream.schema(read_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
        .drop("slice")
    )

    loc = os.path.join(
        tempfile.gettempdir(), "spark_graft_tables", ANN_INDEX_TABLE
    )
    spark.sql(f"DROP TABLE IF EXISTS {ANN_INDEX_TABLE}")
    shutil.rmtree(loc, ignore_errors=True)
    n_buckets = min(16, N_IVF_CELLS)

    def emit(batch_df: DataFrame, batch_id: int) -> None:
        (
            assign_batch(
                batch_df.repartition(shuffle_partitions(spark)), cents
            )
            .write.mode("append")
            .option("path", loc)
            .bucketBy(n_buckets, "cell")
            .sortBy("cell")
            .format("parquet")
            .saveAsTable(ANN_INDEX_TABLE)
        )

    q = (
        stream.writeStream.foreachBatch(emit)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()

    snap = _snapshot_and_clean(spark.table(ANN_INDEX_TABLE), stage_dir)
    spark.sql(f"DROP TABLE IF EXISTS {ANN_INDEX_TABLE}")
    shutil.rmtree(loc, ignore_errors=True)
    return snap
