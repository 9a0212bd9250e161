"""Binary-file source (SURVEY.md S8).

The reference reads image directories with
``spark.read.format("image").option("dropInvalid", True)`` (reference
test/horovod_test.py:76-79). The engine's equivalent is Spark's built-in
``binaryFile`` source — format-agnostic (image/audio/video alike), returning
``(path, modificationTime, length, content: binary)`` with partition-parallel
reads and a pushed-down path-glob filter; decode then rides the multimodal
``mapInPandas`` pipeline (operators/multimodal.py), which is exactly where
an imaging library would plug in.

``stage_media_dir`` materializes a deterministic on-disk media directory
from the documents table (one ``.bin`` file per doc, content = text bytes)
so the source is exercised end-to-end against an oracle-checkable corpus
without shipping real media.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cqu_bigdata_recommender_system_for_movies_spark.plans.registry import register
from cqu_bigdata_recommender_system_for_movies_spark.tables import load

N_STAGED = 100  # files staged for the registry query (doc_id < 100)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """S8: directory of opaque binary files -> DataFrame. The pathGlobFilter
    is evaluated at listing time (no data read for filtered-out files)."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def _stage_fixture_dir(
    spark: SparkSession, sf_dir: str, subdir: str, columns, row_to_file
) -> str:
    """Shared fixture-staging skeleton: write one file per document
    (doc_id < N_STAGED) under a content-addressed temp dir, idempotent per
    sf_dir via a _STAGED marker; read-only testdata stays untouched.
    ``row_to_file(row) -> (filename, bytes)``. The collect is driver-side
    by design — test staging of N_STAGED rows, not a query."""
    digest = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), subdir, digest)
    done = os.path.join(d, "_STAGED")
    if os.path.exists(done):
        return d
    os.makedirs(d, exist_ok=True)
    rows = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < N_STAGED)
        .select(*columns)
        .collect()
    )
    for row in rows:
        fname, payload = row_to_file(row)
        with open(os.path.join(d, fname), "wb") as f:
            f.write(payload)
    with open(done, "w") as f:
        f.write("ok")
    return d


def stage_media_dir(spark: SparkSession, sf_dir: str) -> str:
    """Write doc texts as .bin files (opaque binary payload fixtures)."""
    return _stage_fixture_dir(
        spark,
        sf_dir,
        "spark_graft_media",
        ("doc_id", "text"),
        lambda row: (f"media_{row.doc_id:06d}.bin", row.text.encode("utf-8")),
    )


IMG_H, IMG_W, IMG_CH = 8, 8, 3  # staged fixture images: 8x8 RGB
IMG_PIXELS = IMG_H * IMG_W * IMG_CH


def fixture_pixels(doc_id: int):
    """Deterministic pixel matrix for the staged PNG of ``doc_id``:
    value(idx) = (doc_id*31 + idx*7) % 256 — closed-form, so the DuckDB
    oracle can recompute any pixel statistic arithmetically while the
    Spark side must recover the SAME values through a real PNG decode."""
    import numpy as np

    idx = np.arange(IMG_PIXELS, dtype=np.int64)
    return ((doc_id * 31 + idx * 7) % 256).astype(np.uint8).reshape(
        IMG_H, IMG_W, IMG_CH
    )


def stage_png_dir(spark: SparkSession, sf_dir: str) -> str:
    """Encode one real PNG per document (doc_id < N_STAGED). The encoder
    rotates scanline filters 0-4 row by row, so decoding the staged corpus
    exercises the full PNG unfilter path, not just the trivial filter."""
    from cqu_bigdata_recommender_system_for_movies_spark.functions.png_codec import (
        encode_png,
    )

    return _stage_fixture_dir(
        spark,
        sf_dir,
        "spark_graft_png",
        ("doc_id",),
        lambda row: (
            f"img_{row.doc_id:06d}.png",
            encode_png(fixture_pixels(row.doc_id)),
        ),
    )


@register(
    "binary_file_source_scan",
    oracle=f"""
    SELECT doc_id AS media_id, strlen(text) AS size_bytes,
           md5(text) AS content_md5
    FROM documents WHERE doc_id < {N_STAGED}
    """,
    doc="S8 binary-file source (reference test/horovod_test.py:76-79 used "
    "format('image')): stage one .bin per document, scan the directory with "
    "the built-in binaryFile source (pathGlobFilter pushed to listing), "
    "recover media_id from the file name and verify length + md5 of the "
    "binary content against the originating text — proves the payload "
    "survives the source byte-exact.",
)
def binary_file_source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = stage_media_dir(spark, sf_dir)
    files = read_binary_files(spark, d, glob="*.bin")
    return files.select(
        F.regexp_extract(F.col("path"), r"media_(\d+)\.bin$", 1)
        .cast("long")
        .alias("media_id"),
        F.col("length").alias("size_bytes"),
        F.md5("content").alias("content_md5"),
    )


@register(
    "image_source_metadata_scan",
    oracle=f"""
    SELECT 'media_' || lpad(CAST(doc_id AS VARCHAR), 6, '0') || '.bin'
               AS origin,
           strlen(text) AS length,
           md5(substr(text, 1, 16)) AS prefix_md5
    FROM documents WHERE doc_id < {N_STAGED}
    """,
    doc="S8 image-source schema contract (reference test/horovod_test.py:"
    "76-79 reads format('image'), whose row is (origin, height, width, "
    "nChannels, mode, data)): the metadata-only slice of that contract — "
    "origin (file name), byte length, and an md5 of the first 16 payload "
    "bytes (the magic-number region a real image reader sniffs) — served "
    "from the binaryFile source over the staged media dir. These payloads "
    "are opaque non-image bytes, so height/width/nChannels are exactly "
    "what this scan CANNOT fabricate; the decoded half of the contract "
    "lives in image_decode_pixel_stats, which runs the real PNG decoder "
    "over the staged image corpus.",
)
def image_source_metadata_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = stage_media_dir(spark, sf_dir)
    files = read_binary_files(spark, d, glob="*.bin")
    return files.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("origin"),
        F.col("length"),
        F.md5(F.substring("content", 1, 16)).alias("prefix_md5"),
    )
