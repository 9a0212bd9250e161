"""Generic fit/transform estimator capability (SURVEY.md M7, A6).

The reference wrapped a Torch model in Horovod's ``TorchEstimator`` to get
a DataFrame-native fit/transform pair plus an evaluator
(reference src/distributed/distributed.py:178-218, test/horovod_test.py:128-157).
The engine's equivalent is the MLlib Pipeline API: any estimator consumes a
features Vector column and emits predictions as a column — here logistic
regression over the embedding vectors predicting the label column, with
the reference's argmax-accuracy evaluation (horovod_test.py:153-157) done
by ``MulticlassClassificationEvaluator``.
"""

from __future__ import annotations

from pyspark.ml.classification import LogisticRegression
from pyspark.ml.evaluation import MulticlassClassificationEvaluator
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cqu_bigdata_recommender_system_for_movies_spark.plans.registry import register
from cqu_bigdata_recommender_system_for_movies_spark.tables import load

SEED = 42


@register(
    "pipeline_classifier_eval",
    oracle=None,  # iterative ML — rows-only; bounds asserted in tests
    doc="M7+A6: DataFrame-native estimator fit/transform — logistic "
    "regression on embedding vectors -> label, seeded 80/20 split, "
    "multiclass accuracy via evaluator. One row: "
    "(n_train, n_test, accuracy).",
)
def pipeline_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select(
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
        F.col("label").cast("double").alias("label"),
    )
    train, test = emb.randomSplit([0.8, 0.2], seed=SEED)
    model = LogisticRegression(maxIter=25, regParam=0.01).fit(train)
    pred = model.transform(test)
    acc = MulticlassClassificationEvaluator(
        metricName="accuracy", labelCol="label", predictionCol="prediction"
    ).evaluate(pred)
    return spark.createDataFrame(
        [(train.count(), test.count(), round(acc, 4))],
        "n_train long, n_test long, accuracy double",
    )


@register(
    "kmeans_embedding_clusters",
    oracle=None,  # iterative ML — rows-only; invariants asserted in tests
    doc="Clustering capability (the learned coarse quantizer behind IVF "
    "ANN, and the corpus-partitioning step of a dedup/curation pipeline): "
    "seeded MLlib KMeans (k=8) over the embedding vectors; output is one "
    "row per cluster with its size and the rounded norm of its center — "
    "deterministic under the fixed seed.",
)
def kmeans_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.clustering import KMeans

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )
    model = KMeans(k=8, seed=SEED, maxIter=20).fit(emb)
    assigned = model.transform(emb)
    sizes = (
        assigned.groupBy(F.col("prediction").alias("cluster"))
        .agg(F.count("*").alias("n_vectors"))
    )
    centers = spark.createDataFrame(
        [
            (i, round(float((c ** 2).sum() ** 0.5), 4))
            for i, c in enumerate(model.clusterCenters())
        ],
        "cluster int, center_norm double",
    )
    return sizes.join(centers, "cluster").select(
        "cluster", "n_vectors", "center_norm"
    )
