"""Text analysis operators over the documents table (north-star extensions:
tokenization, word count, quality scoring, language stats, fingerprinting).

All of it is built-in column functions — split/explode/aggregations — so the
hot path is JVM-side and the word-count shuffle benefits from map-side
partial aggregation. The batch word count is also the semantic twin of the
reference's streaming word-count golden test (test/streaming_test.py:32-67);
the streaming form lives in streaming/queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cqu_bigdata_recommender_system_for_movies_spark.plans.registry import register
from cqu_bigdata_recommender_system_for_movies_spark.tables import load

STOPWORDS = ("the", "a", "of", "and", "to")


@register(
    "wordcount_documents",
    oracle="""
    SELECT word, COUNT(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
    doc="A1/F1/F3 word count (streaming_test.py:55-67, batch form): "
    "split -> explode -> group-count.",
)
def wordcount_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "token_stats",
    oracle="""
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens,
           length(text) AS text_len,
           ROUND(length(text) * 1.0 /
                 greatest(len(list_filter(string_split(text, ' '), w -> w <> '')), 1),
                 4) AS chars_per_token
    FROM documents
    """,
    doc="Token counting (north star): whitespace tokenization + per-doc "
    "length stats, entirely as array expressions.",
)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tokens = F.filter(F.split("text", " "), lambda w: w != "")
    n_tokens = F.size(tokens)
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.length("text").alias("text_len"),
        F.round(
            F.length("text") * F.lit(1.0) / F.greatest(n_tokens, F.lit(1)), 4
        ).alias("chars_per_token"),
    )


@register(
    "text_quality_score",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), w -> w <> '') AS toks
        FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_tokens,
           ROUND(len(list_filter(toks, w -> list_contains({list(STOPWORDS)}, w)))
                 * 1.0 / greatest(len(toks), 1), 4) AS stopword_ratio,
           ROUND(len(list_filter(toks, w -> length(w) >= 5))
                 * 1.0 / greatest(len(toks), 1), 4) AS long_token_ratio
    FROM t
    """,
    doc="Quality scoring (north star): stopword ratio + long-token ratio per "
    "document — the standard cheap quality filters for a training-data "
    "pipeline, as vectorized higher-order array functions.",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda w: w != "")
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w)))
    n_long = F.size(F.filter(toks, lambda w: F.length(w) >= 5))
    denom = F.greatest(n, F.lit(1))
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(n_stop * F.lit(1.0) / denom, 4).alias("stopword_ratio"),
        F.round(n_long * F.lit(1.0) / denom, 4).alias("long_token_ratio"),
    )


# BPE-pre-tokenizer-shaped split (letter runs | digit runs | punct runs),
# ASCII classes + explicit whitespace so Java and RE2 regex agree exactly
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]+"


@register(
    "regex_token_count",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS n_bpe_tokens,
           len(list_filter(string_split(text, ' '), w -> w <> ''))
               AS n_ws_tokens,
           ROUND(len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) * 1.0 /
                 greatest(len(list_filter(string_split(text, ' '), w -> w <> '')), 1),
                 4) AS tokens_per_word
    FROM documents
    """,
    doc="Token counting, BPE-ish (north star): a GPT-style pre-tokenizer "
    "regex (letter runs / digit runs / punctuation runs) counted next to "
    "whitespace tokens — the standard cost estimator for LLM training "
    "data, as one regexp_extract_all column expression per doc.",
)
def regex_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all("text", F.lit(BPE_TOKEN_RE), 0)
    ws = F.filter(F.split("text", " "), lambda w: w != "")
    return docs.select(
        "doc_id",
        F.size(bpe).alias("n_bpe_tokens"),
        F.size(ws).alias("n_ws_tokens"),
        F.round(
            F.size(bpe) * F.lit(1.0) / F.greatest(F.size(ws), F.lit(1)), 4
        ).alias("tokens_per_word"),
    )


LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist"),
    "en": ("the", "a", "and", "of", "to"),
    "es": ("el", "los", "una", "que", "por"),
    "fr": ("le", "la", "et", "les", "des"),
}


def _lang_id_oracle() -> str:
    score_rows = "\n        UNION ALL\n".join(
        f"SELECT doc_id, '{lang}' AS cand,"
        f" len(list_filter(toks, w -> list_contains({list(words)}, w))) AS score"
        f" FROM t"
        for lang, words in sorted(LANG_MARKERS.items())
    )
    return f"""
    WITH t AS (
        SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS toks
        FROM documents
    ),
    scores AS ({score_rows}),
    ranked AS (
        SELECT doc_id, cand, score,
               ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY score DESC, cand
               ) AS rn
        FROM scores
    )
    SELECT doc_id, cand AS predicted_lang, score AS marker_hits
    FROM ranked WHERE rn = 1
    """


@register(
    "lang_id_heuristic",
    oracle=_lang_id_oracle(),
    doc="Language identification (north star): stopword-marker scoring per "
    "candidate language, argmax with alphabetical tie-break — the cheap "
    "n-gram/marker heuristic a corpus triage pass runs before a real "
    "lang-ID model. Unpivot -> window-rank keeps it one shuffle.",
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda w: w != "")
    base = docs.select("doc_id", toks.alias("toks"))
    scored = None
    for lang, words in sorted(LANG_MARKERS.items()):
        marker = F.array(*[F.lit(w) for w in words])
        part = base.select(
            "doc_id",
            F.lit(lang).alias("cand"),
            F.size(
                F.filter(F.col("toks"), lambda w: F.array_contains(marker, w))
            ).cast("long").alias("score"),
        )
        scored = part if scored is None else scored.union(part)
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cand"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("cand").alias("predicted_lang"), F.col("score").alias("marker_hits"))
    )


@register(
    "lang_distribution",
    oracle="""
    SELECT lang, source, COUNT(*) AS cnt, ROUND(AVG(n_chars), 4) AS avg_chars
    FROM documents
    GROUP BY lang, source
    """,
    doc="Language/source distribution: grouped stats over document metadata.",
)
def lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count("*").alias("cnt"), F.round(F.avg("n_chars"), 4).alias("avg_chars"))
    )


@register(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(
               list_sort(list_distinct(
                   list_filter(string_split(text, ' '), w -> w <> ''))), ' ')) AS fp
    FROM documents
    """,
    doc="Document fingerprinting (north star): content fingerprint = md5 over "
    "the sorted distinct token set (order-invariant — catches shuffled "
    "near-identical docs that exact-hash dedup misses).",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda w: w != "")
    return docs.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))).alias("fp"),
    )
