"""Delimited-text source/sink (SURVEY.md S1, S10-output).

The reference parsed tab-separated MovieLens files by dropping to
``RDD[Row]`` with a Python lambda per line (reference src/als/spark_als.py:43-70,
duplicated at src/distributed/distributed.py:88-115). Here it is a single
declarative ``spark.read.csv`` with an explicit schema — the JVM csv reader
parses and type-casts, partition-parallel, with column pruning.

``sep='::'`` (multi-char, crawler output format, src/crawler/crawler.py:38-53)
is handled too: Spark's csv reader requires a 1-char sep, so multi-char
separators parse via split() column expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

RATINGS_SCHEMA = "user_id INT, item_id INT, rating FLOAT, ts LONG"


def read_delimited(
    spark: SparkSession,
    path: str,
    schema: StructType | str = RATINGS_SCHEMA,
    sep: str = "\t",
) -> DataFrame:
    """Typed delimited-text scan (S1). Multi-char sep falls back to split()."""
    if len(sep) == 1:
        return spark.read.csv(path, sep=sep, schema=schema)
    # multi-char separator (e.g. '::'): read lines, split as column expr
    raw = spark.read.text(path)
    struct = (
        spark.createDataFrame([], schema).schema
        if isinstance(schema, str)
        else schema
    )
    parts = raw.select(F.split("value", sep).alias("p"))
    cols = [
        F.element_at("p", i + 1).cast(f.dataType).alias(f.name)
        for i, f in enumerate(struct.fields)
    ]
    return parts.select(*cols)


def write_delimited(df: DataFrame, path: str, sep: str = "\t") -> None:
    """Delimited sink; set-oriented, partition-parallel (vs the reference's
    per-row Bolt writes, S3)."""
    df.write.mode("overwrite").csv(path, sep=sep)
