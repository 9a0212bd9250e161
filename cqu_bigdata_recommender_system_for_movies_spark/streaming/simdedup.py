"""Streaming SimHash near-duplicate detection — per-bucket fingerprint
state over a document stream.

The batch near-dup surface (operators/dedup.py: simhash_near_dup_pairs)
answers "which pairs in a static corpus are near-dups". A crawl
pipeline needs the ONLINE form: documents arrive continuously, and each
must be checked against everything already ingested — the streaming
twin of the reference's "process new arrivals against accumulated
state" loop (reference streaming_rec.py keeps per-user state the same
way; here the state is the fingerprint index itself).

Design (Spark-first):
- The 64-bit SimHash fingerprint is computed PER ROW with pure column
  expressions (``fingerprint_col``): distinct md5 token-hash pairs via
  ``array_distinct``/``transform``, per-bit popcounts via one
  ``aggregate`` + ``zip_with`` fold, majority rule ``2*p_b >= n`` —
  bit-for-bit the same rule as the batch groupBy majority
  (``sum(±1) >= 0``), verified by
  tests/test_streaming_extras.py::test_rowwise_fingerprint_matches_batch.
  No aggregation state is needed to fingerprint a stream.
- Manku's 4 disjoint 16-bit blocks (operators/dedup.py:SIMHASH_BANDS)
  key the state: a doc lands in 4 (band, block-value) buckets, and by
  pigeonhole every pair within hamming <= 3 shares at least one bucket,
  so per-bucket comparison is LOSSLESS for the <= 3 threshold.
- ``applyInPandasWithState`` keeps (doc_id, fingerprint) per bucket.
  Each incoming doc is compared against the bucket's accumulated
  members grouped by DISTINCT fingerprint (one hamming test per
  distinct fp, mirroring the batch side's rep collapse), then appended.
  Emissions are (dup_id, of_id) with dup_id > of_id, so the
  post-aggregation ``min(of_id) per dup_id`` converges to the batch
  answer REGARDLESS of how the stream is micro-batched: for any
  qualifying pair, whichever side arrives later finds the other in
  state (same-batch rows are processed in ascending doc_id order).

Scale notes (100 TB):
- State per bucket averages corpus / 2^16 per band; the state store
  shards buckets across executors. Unbounded-history dedup is
  inherently O(corpus) state — production would run the RocksDB state
  store provider and, under exact-dup skew, collapse identical
  fingerprints to (fp, min_id, count) exactly like the batch side's
  ``_simhash_groups``; kept per-member here because the emitted
  ``min(of_id)`` contract needs member ids and the test corpus is
  bounded.
- Per-bucket work per doc is O(distinct fingerprints in bucket), the
  same bound the batch banded join has.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from cqu_bigdata_recommender_system_for_movies_spark.operators.dedup import (
    HAMMING_MAX,
    SIMHASH_BANDS,
    SIMHASH_BITS,
)

BLOCK_BITS = SIMHASH_BITS // SIMHASH_BANDS  # 16: Manku's 4x16 layout

# State-sharding knob: logical (band, block-value) buckets are hashed
# into this many state GROUPS, each holding its members as parallel
# arrays tagged with their bucket id. Grouping state by the raw bucket
# key costs one Python invocation + one state (de)serialization PER
# BUCKET PER BATCH — ~20k near-singleton groups at sf0.1 made the query
# take 74 s, all overhead. Sharding bounds the invocation count while
# pair checks stay bucket-local inside each shard (the dict-by-bucket
# below), so candidate volume — and losslessness — are untouched. At
# 100 TB this is the state-store parallelism dial: raise it with the
# cluster's state partitions; per-shard state stays corpus/SHARDS.
STATE_SHARDS = 256

OUTPUT_SCHEMA = "dup_id BIGINT, of_id BIGINT"
# per-member parallel arrays: bucket id, doc id, fingerprint
STATE_SCHEMA = "bks ARRAY<STRING>, ids ARRAY<BIGINT>, fps ARRAY<STRING>"


def fingerprint_col() -> Column:
    """64-char bit-0-first SimHash fingerprint from the ``__hvs``
    distinct-token-hash array, computable per row (streaming-safe, no
    shuffle): identical output to operators/dedup.py:simhash_fingerprint
    for every doc with >= 1 token (docs with no tokens have NO
    fingerprint there; filter on token presence before using this).

    ONE ``aggregate`` expression carrying (n, per-bit counts) in a
    struct accumulator and rendering the majority-rule bit string in the
    FINISH lambda. The counts MUST NOT live in a separate projected
    column: Catalyst's project collapse inlines a referenced column's
    expression into every use site, and a ``__counts[b]`` reference
    inside the 64-element transform re-ran the whole popcount fold 64x
    per document (~10 ms/doc interpreted — higher-order functions don't
    codegen), which made the streaming query 50 s at sf0.1. Single
    expression = single fold."""
    return F.expr(
        """
        aggregate(
            __hvs,
            named_struct(
                'n', CAST(0 AS BIGINT),
                'c', array_repeat(CAST(0 AS BIGINT), 64)),
            (acc, x) -> named_struct(
                'n', acc.n + 1,
                'c', zip_with(
                    acc.c,
                    transform(sequence(0, 63), b ->
                        CASE WHEN b < 32
                             THEN shiftright(x.hv1, CAST(b AS INT)) & 1
                             ELSE shiftright(x.hv2, CAST(b - 32 AS INT)) & 1
                        END),
                    (a, c) -> a + c)),
            acc -> concat_ws('', transform(sequence(0, 63), b ->
                CASE WHEN 2 * acc.c[b] >= acc.n THEN '1' ELSE '0' END)))
        """
    )


def token_hash_structs() -> Column:
    """array<struct<hv1,hv2>> of DISTINCT md5 token-hash pairs — the
    row-local twin of operators/dedup.py:_token_hashes_df (hash first,
    distinct on the fixed-width pair)."""
    return F.expr(
        """
        array_distinct(transform(
            filter(split(text, ' '), w -> w != ''),
            w -> struct(
                CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT) AS hv1,
                CAST(conv(substring(md5(w), 9, 8), 16, 10) AS BIGINT) AS hv2)))
        """
    )


def with_fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fp): per-row fingerprints for docs with >= 1 token. The
    whole popcount fold + bit render is ONE ``aggregate`` expression
    (see fingerprint_col for why it must not be split across projected
    columns) — all JVM expression evaluation, usable under a streaming
    plan because nothing aggregates across rows. The token-presence
    filter tests the raw token array (no md5), so the hashed ``__hvs``
    array is referenced exactly once."""
    has_tokens = F.size(F.filter(F.split("text", " "), lambda w: w != "")) > 0
    return (
        docs.filter(has_tokens)
        .withColumn("__hvs", token_hash_structs())
        .select("doc_id", fingerprint_col().alias("fp"))
    )


def banded(fps: DataFrame) -> DataFrame:
    """Explode each (doc_id, fp) into its 4 (band, key) bucket rows."""
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.substring("fp", b * BLOCK_BITS + 1, BLOCK_BITS).alias("key"),
            )
            for b in range(SIMHASH_BANDS)
        ]
    )
    return fps.select("doc_id", "fp", F.explode(bands).alias("bk")).select(
        "doc_id", "fp", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )


def _fp_int(fp: str) -> int:
    return int(fp[::-1], 2)  # bit-0-first string -> unsigned 64-bit int


def detect_bucket_dups(key, pdfs, state: GroupState):
    """Per-shard stateful detector. Each shard accumulates the members of
    the logical (band, block-value) buckets hashed into it; pair checks
    are confined to members of the SAME bucket (the dict below). Emits
    (dup_id, of_id) rows with dup_id > of_id for every near pair
    (hamming <= HAMMING_MAX) witnessed; the caller's
    min(of_id)-per-dup_id aggregation is micro-batch-split-invariant
    (module docstring)."""
    if state.exists:
        bks, ids, fps = state.get
        bks, ids, fps = list(bks), list(ids), list(fps)
    else:
        bks, ids, fps = [], [], []
    # per-bucket distinct-fingerprint view of the accumulated members
    buckets: dict[str, dict[str, list[int]]] = {}
    for bk, i, f in zip(bks, ids, fps):
        buckets.setdefault(bk, {}).setdefault(f, []).append(i)
    fp_ints: dict[str, int] = {}
    out_dup, out_of = [], []
    for pdf in pdfs:
        pdf = pdf.sort_values("doc_id")
        for bk, doc_id, fp in zip(
            pdf["bk"].tolist(), pdf["doc_id"].tolist(), pdf["fp"].tolist()
        ):
            v = fp_ints.get(fp)
            if v is None:
                v = fp_ints[fp] = _fp_int(fp)
            by_fp = buckets.setdefault(bk, {})
            for f, members in by_fp.items():
                w = fp_ints.get(f)
                if w is None:
                    w = fp_ints[f] = _fp_int(f)
                if bin((w ^ v) & 0xFFFFFFFFFFFFFFFF).count("1") > HAMMING_MAX:
                    continue
                below = [m for m in members if m < doc_id]
                if below:
                    out_dup.append(doc_id)
                    out_of.append(min(below))
                for m in members:
                    if m > doc_id:
                        out_dup.append(m)
                        out_of.append(doc_id)
            by_fp.setdefault(fp, []).append(doc_id)
            bks.append(bk)
            ids.append(doc_id)
            fps.append(fp)
    state.update((bks, ids, fps))
    if out_dup:
        yield pd.DataFrame({"dup_id": out_dup, "of_id": out_of})


def dedup_stream(stream_docs: DataFrame) -> DataFrame:
    """Wire fingerprint -> banding -> sharded per-bucket state onto a
    streaming documents DataFrame; returns the (dup_id, of_id) emission
    stream."""
    from cqu_bigdata_recommender_system_for_movies_spark.shipping import ensure_shipped

    ensure_shipped(stream_docs.sparkSession)
    keyed = banded(with_fingerprint(stream_docs)).select(
        F.concat_ws(":", F.col("band").cast("string"), "key").alias("bk"),
        "doc_id",
        "fp",
        F.pmod(F.xxhash64(F.col("band"), F.col("key")), F.lit(STATE_SHARDS)).alias(
            "shard"
        ),
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        detect_bucket_dups,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
