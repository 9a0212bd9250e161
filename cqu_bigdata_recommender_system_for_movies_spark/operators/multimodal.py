"""Multimodal columns (north star): image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The Spark-side plumbing is real and tested — binary payload column, typed
metadata struct, per-partition Arrow batches into pandas, stable output
schema. Image decode is REAL for PNG via the engine's pure-Python codec
(functions/png_codec.py; driven end-to-end by ``image_decode_pixel_stats``
over engine-staged PNG files); formats that require an imaging library the
container doesn't ship (JPEG/audio/video) raise a clear
``NotImplementedError`` where PIL/librosa/av would plug in.
``decode_payload`` remains the format-agnostic byte-level featurizer for
opaque payloads, synthesized from document text bytes so it is
oracle-checkable end-to-end.

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
from cqu_bigdata_recommender_system_for_movies_spark.sources.binary_files import (
    IMG_CH,
    IMG_H,
    IMG_PIXELS,
    IMG_W,
    N_STAGED,
)
from cqu_bigdata_recommender_system_for_movies_spark.tables import load

MEDIA_TYPES = ("image", "audio", "video")

DECODED_SCHEMA = (
    "media_id LONG, media_type STRING, size_bytes LONG, checksum8 LONG"
)


def decode_image_real(payload: bytes):
    """Real image decode to an (h, w, channels) uint8 pixel array.

    PNG decodes with the engine's own pure-Python codec
    (functions/png_codec.py — signature, chunk CRCs, inflate, all five
    scanline filters); other formats (JPEG etc.) genuinely need an
    imaging library this container doesn't ship, and raise cleanly where
    PIL would plug in. The reference's capability twin is
    test/horovod_test.py:76-91, which trains on decoded MNIST pixels."""
    from cqu_bigdata_recommender_system_for_movies_spark.functions.png_codec import (
        PNG_SIG,
        decode_png,
    )

    if bytes(payload[:8]) == PNG_SIG:
        return decode_png(payload)
    try:
        from PIL import Image  # type: ignore  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "non-PNG media decode needs an imaging library this "
            "environment doesn't ship; PNG decodes natively"
        ) from exc
    raise NotImplementedError("PIL decode path not wired in this build")


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


DECODED_PIXEL_SCHEMA = (
    "media_id LONG, height INT, width INT, n_channels INT, "
    "pixel_sum LONG, pixel_mean DOUBLE"
)


def decode_pixel_stats(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL image decode per Arrow batch: every payload runs the full PNG
    pipeline (signature/CRC checks, inflate, unfilter) and the stats come
    from the decoded pixel matrix — nothing is read off the originating
    fixture arithmetic."""
    from cqu_bigdata_recommender_system_for_movies_spark.operators.multimodal import (
        decode_image_real,
    )

    for pdf in batch_iter:
        out = {k: [] for k in ("media_id", "height", "width", "n_channels",
                               "pixel_sum", "pixel_mean")}
        for mid, payload in zip(pdf["media_id"], pdf["content"]):
            arr = decode_image_real(bytes(payload))
            h, w, ch = arr.shape
            total = int(arr.astype("int64").sum())
            out["media_id"].append(mid)
            out["height"].append(h)
            out["width"].append(w)
            out["n_channels"].append(ch)
            out["pixel_sum"].append(total)
            out["pixel_mean"].append(round(total / arr.size, 6))
        yield pd.DataFrame(out)


@register(
    "image_decode_pixel_stats",
    oracle=f"""
    WITH px AS (
        SELECT doc_id,
               list_sum([(doc_id * 31 + i * 7) % 256
                         for i in range(0, {IMG_PIXELS})]) AS s
        FROM documents WHERE doc_id < {N_STAGED}
    )
    SELECT doc_id AS media_id,
           {IMG_H} AS height, {IMG_W} AS width, {IMG_CH} AS n_channels,
           CAST(s AS BIGINT) AS pixel_sum,
           ROUND(CAST(s AS BIGINT) / {IMG_PIXELS}.0, 6) AS pixel_mean
    FROM px
    """,
    doc="S8 completed end-to-end: stage real PNG files (engine-encoded, "
    "scanline filters 0-4 all present), scan them with the binaryFile "
    "source, decode every payload with the pure-Python PNG decoder "
    "(functions/png_codec.py) inside Arrow-batched mapInPandas, and "
    "report per-image dimensions + pixel statistics. The fixture pixels "
    "are a closed-form function of doc_id, so the DuckDB oracle "
    "recomputes the same statistics arithmetically — the hash match "
    "proves the decode recovered every pixel byte-exactly. The reference "
    "capability is test/horovod_test.py:76-91 (decodes MNIST images to "
    "pixel vectors for training).",
)
def image_decode_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cqu_bigdata_recommender_system_for_movies_spark.sources.binary_files import (
        read_binary_files,
        stage_png_dir,
    )

    ensure_shipped(spark)
    d = stage_png_dir(spark, sf_dir)
    files = read_binary_files(spark, d, glob="*.png")
    media = files.select(
        F.regexp_extract(F.col("path"), r"img_(\d+)\.png$", 1)
        .cast("long")
        .alias("media_id"),
        "content",
    )
    return media.mapInPandas(decode_pixel_stats, DECODED_PIXEL_SCHEMA)


RESIZE_STRIDE = 2  # nearest-neighbor 2x downsample: keep every 2nd pixel


def resize_nearest(arr, stride: int = RESIZE_STRIDE):
    """Nearest-neighbor downsample by integer stride — pure numpy striding
    over the decoded (h, w, ch) pixel array, the canonical cheap resize
    for thumbnail/feature pipelines."""
    return arr[::stride, ::stride, :]


def resize_pixel_stats(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Decode (real PNG pipeline) then resize each image per Arrow batch;
    stats come from the RESIZED pixel matrix."""
    from cqu_bigdata_recommender_system_for_movies_spark.operators.multimodal import (
        decode_image_real,
        resize_nearest,
    )

    for pdf in batch_iter:
        out = {k: [] for k in ("media_id", "height", "width", "n_channels",
                               "pixel_sum", "pixel_mean")}
        for mid, payload in zip(pdf["media_id"], pdf["content"]):
            arr = resize_nearest(decode_image_real(bytes(payload)))
            h, w, ch = arr.shape
            total = int(arr.astype("int64").sum())
            out["media_id"].append(mid)
            out["height"].append(h)
            out["width"].append(w)
            out["n_channels"].append(ch)
            out["pixel_sum"].append(total)
            out["pixel_mean"].append(round(total / arr.size, 6))
        yield pd.DataFrame(out)


# the resized image keeps pixels at stride-multiple (row, col); map the
# kept-pixel enumeration i back to the ORIGINAL flat index the fixture
# law is defined over: idx = (stride*W*ch)*r' + (stride*ch)*c' + ch'
_RESIZED_W_CH = (IMG_W // RESIZE_STRIDE) * IMG_CH  # kept values per row
_RESIZED_IDX_SQL = (
    f"({RESIZE_STRIDE * IMG_W * IMG_CH} * (i // {_RESIZED_W_CH}) "
    f"+ {RESIZE_STRIDE * IMG_CH} * ((i % {_RESIZED_W_CH}) // {IMG_CH}) "
    f"+ (i % {IMG_CH}))"
)
_RESIZED_PIXELS = (IMG_H // RESIZE_STRIDE) * (IMG_W // RESIZE_STRIDE) * IMG_CH


@register(
    "image_resize_stats",
    oracle=f"""
    WITH px AS (
        SELECT doc_id,
               list_sum([(doc_id * 31 + {_RESIZED_IDX_SQL} * 7) % 256
                         for i in range(0, {_RESIZED_PIXELS})]) AS s
        FROM documents WHERE doc_id < {N_STAGED}
    )
    SELECT doc_id AS media_id,
           {IMG_H // RESIZE_STRIDE} AS height,
           {IMG_W // RESIZE_STRIDE} AS width,
           {IMG_CH} AS n_channels,
           CAST(s AS BIGINT) AS pixel_sum,
           ROUND(CAST(s AS BIGINT) / {_RESIZED_PIXELS}.0, 6) AS pixel_mean
    FROM px
    """,
    doc="Image resize (north-star multimodal verb set: decode / "
    "feature-extract / RESIZE / frame-sample): real PNG decode then a "
    "nearest-neighbor 2x downsample per Arrow batch, stats over the "
    "resized pixels. The oracle recomputes the kept-pixel lattice "
    "arithmetically from the fixture law, so the hash match proves the "
    "resize selected exactly the right pixels. Same shuffle-free "
    "binaryFile-scan -> mapInPandas shape as the decode query.",
)
def image_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cqu_bigdata_recommender_system_for_movies_spark.sources.binary_files import (
        read_binary_files,
        stage_png_dir,
    )

    ensure_shipped(spark)
    d = stage_png_dir(spark, sf_dir)
    files = read_binary_files(spark, d, glob="*.png")
    media = files.select(
        F.regexp_extract(F.col("path"), r"img_(\d+)\.png$", 1)
        .cast("long")
        .alias("media_id"),
        "content",
    )
    return media.mapInPandas(resize_pixel_stats, DECODED_PIXEL_SCHEMA)


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
