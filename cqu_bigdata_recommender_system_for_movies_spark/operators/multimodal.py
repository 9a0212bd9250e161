"""Multimodal columns (north star): image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The Spark-side plumbing is real and tested — binary payload column, typed
metadata struct, per-partition Arrow batches into pandas, stable output
schema. The actual media decode is STUBBED (this container has no
PIL/librosa/av): ``decode_payload`` falls back to a deterministic
byte-level featurizer, and ``decode_image_real`` raises
``NotImplementedError`` behind an import-try, exactly where a real decoder
plugs in. Payloads are synthesized from document text bytes so the fake
decode is oracle-checkable end-to-end.

Scale notes: mapInPandas streams Arrow record batches — payload bytes never
land in Python row objects; partition count (not file count) bounds
parallelism, and the featurizer is O(batch) numpy. At 100 TB with real
media this is the same plan with a different ``decode_payload`` body.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cqu_bigdata_recommender_system_for_movies_spark.plans.registry import register
from cqu_bigdata_recommender_system_for_movies_spark.shipping import ensure_shipped
from cqu_bigdata_recommender_system_for_movies_spark.tables import load

MEDIA_TYPES = ("image", "audio", "video")

DECODED_SCHEMA = (
    "media_id LONG, media_type STRING, size_bytes LONG, checksum8 LONG"
)


def decode_image_real(payload: bytes) -> object:
    """Real image decode — requires an imaging library absent from this
    container. STUB: plug PIL/pyav here in a full deployment."""
    try:
        from PIL import Image  # type: ignore  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "media decode stubbed: no imaging library in this environment"
        ) from exc
    raise NotImplementedError("real decode path not wired in this build")


def decode_payload(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake decode: byte-length + checksum of the first 8
    bytes. Same signature/batching a real decoder would use. The checksum
    is computed over a zero-padded (n, 8) uint8 matrix via np.frombuffer —
    batch-level numpy, not per-element Python sums."""
    import numpy as np

    for pdf in batch_iter:
        payloads = pdf["payload"]
        heads = b"".join(b[:8].ljust(8, b"\0") for b in payloads)
        checksum = (
            np.frombuffer(heads, dtype=np.uint8)
            .reshape(-1, 8)
            .sum(axis=1, dtype=np.int64)
            if len(pdf)
            else np.array([], dtype=np.int64)
        )
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "size_bytes": payloads.map(len).astype("int64"),
                "checksum8": checksum,
            }
        )


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the media fact table: binary payload + typed metadata."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.col("n_chars").alias("declared_size"),
            F.col("source").alias("origin"),
        ).alias("metadata"),
    )


@register(
    "multimodal_decode_features",
    oracle="""
    SELECT doc_id AS media_id,
           CASE CAST(doc_id % 3 AS INTEGER)
                WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
           END AS media_type,
           strlen(text) AS size_bytes,
           CAST(list_sum([ascii(substr(text, i, 1))
                     for i in range(1, 1 + least(strlen(text), 8))])
                AS BIGINT) AS checksum8
    FROM documents
    """,
    doc="Multimodal decode/feature-extract: binary payload column -> "
    "mapInPandas (Arrow batches) -> per-media features. Decode itself is a "
    "deterministic stub (no media libs in container); plumbing is real and "
    "the oracle checks it end-to-end via the text-bytes payload.",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_shipped(spark)
    media = media_table(spark, sf_dir)
    return media.mapInPandas(decode_payload, DECODED_SCHEMA)


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(floor(strlen(text) / 64) AS BIGINT) AS n_frames,
           strlen(text) % 64 AS tail_bytes
    FROM documents
    WHERE CAST(doc_id % 3 AS INTEGER) = 2
    """,
    doc="Frame sampling for 'video' payloads: fixed-stride chunking of the "
    "binary column (stride 64) — filter on typed media_type, then pure "
    "column math; the chunk decode itself would ride decode_payload.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir)
    return media.filter(F.col("media_type") == "video").select(
        "media_id",
        F.floor(F.length("payload") / 64).alias("n_frames"),
        (F.length("payload") % 64).alias("tail_bytes"),
    )
