"""Capture .explain("formatted") for the per-batch INTERNAL plans of the
streaming queries (their registered fn() executes eagerly, so the
returned snapshot has no interesting plan — the evidence lives in the
foreachBatch closures, reconstructed here on static inputs).

Usage: python tools/capture_internal_plans.py OUTDIR SUFFIX
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cqu_bigdata_recommender_system_for_movies_spark.session import get_spark  # noqa: E402
from cqu_bigdata_recommender_system_for_movies_spark.tables import load  # noqa: E402


def _write(outdir: str, name: str, suffix: str, df) -> None:
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(outdir, f"{name}_{suffix}.txt")
    with open(path, "w") as f:
        f.write(plan)
    print(f"wrote {path} ({len(plan)} bytes)")


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture-internal-plans")

    import cqu_bigdata_recommender_system_for_movies_spark.streaming.ann_index as ai

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    n_cells = ai.derive_ann_cells(sf_dir)
    cents = ai._ann_cents_relation(emb, n_cells)

    # the maintenance append's assignment plan (shared by the whole
    # ANN CRUD family's per-batch path)
    _write(
        outdir,
        "ann_assign_batch_internal",
        suffix,
        ai.assign_batch(emb.limit(700), cents),
    )

    # the serving path's per-batch scoring plan
    from cqu_bigdata_recommender_system_for_movies_spark.streaming.ann_search import (
        score_query_batch,
    )

    index_df = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.lit(0).alias("cell"),
        F.col("e").alias("ne"),
    )
    _write(
        outdir,
        "ann_score_query_batch_internal",
        suffix,
        score_query_batch(emb.limit(50), cents, index_df),
    )

    # the candidate-pruned recommender's per-batch scoring plan
    from cqu_bigdata_recommender_system_for_movies_spark.streaming.candidates import (
        build_candidate_index,
        score_candidates_batch,
    )
    from cqu_bigdata_recommender_system_for_movies_spark.streaming.queries import (
        item_profiles,
    )

    profiles = item_profiles(spark, sf_dir).localCheckpoint(eager=True)
    cents_c, item_dim, _ = build_candidate_index(profiles)
    users = profiles.select(
        F.col("item_ref").alias("user_id"), F.col("profile").alias("interest")
    ).limit(100)
    _write(
        outdir,
        "recommend_score_candidates_batch_internal",
        suffix,
        score_candidates_batch(users, cents_c, item_dim),
    )
    spark.stop()


if __name__ == "__main__":
    main()
