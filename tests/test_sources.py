"""Delimited-text source round trips (S1, crawler '::' format)."""

from __future__ import annotations

from cqu_bigdata_recommender_system_for_movies_spark.sources import (
    read_delimited,
    write_delimited,
)


def test_tsv_roundtrip(spark, tmp_path):
    rows = [(1, 10, 4.0, 111), (2, 20, 3.5, 222), (3, 30, 5.0, 333)]
    df = spark.createDataFrame(rows, "user_id INT, item_id INT, rating FLOAT, ts LONG")
    path = str(tmp_path / "ratings_tsv")
    write_delimited(df, path, sep="\t")
    back = read_delimited(spark, path, sep="\t")
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_multichar_sep(spark, tmp_path):
    p = tmp_path / "crawler.txt"
    p.write_text("alice::Movie A::4.5\nbob::Movie B::3.0\n")
    df = read_delimited(
        spark, str(p), schema="people STRING, movie_name STRING, score DOUBLE", sep="::"
    )
    got = sorted(map(tuple, df.collect()))
    assert got == [("alice", "Movie A", 4.5), ("bob", "Movie B", 3.0)]
