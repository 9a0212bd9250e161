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


# --- PNG codec (S8 real decode path) ---------------------------------------


def test_png_roundtrip_all_filters_and_shapes():
    """Encoder rotates scanline filters 0-4; every shape with >= 5 rows
    exercises the whole unfilter path (None/Sub/Up/Average/Paeth)."""
    import numpy as np

    from cqu_bigdata_recommender_system_for_movies_spark.functions.png_codec import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(0)
    for shape in [(8, 8, 3), (5, 3, 3), (7, 1, 3), (6, 9), (1, 4), (16, 2, 3)]:
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = decode_png(encode_png(arr))
        want = arr if arr.ndim == 3 else arr[:, :, None]
        assert out.shape == want.shape
        assert (out == want).all()


def test_png_decode_rejects_corruption():
    import numpy as np
    import pytest

    from cqu_bigdata_recommender_system_for_movies_spark.functions.png_codec import (
        decode_png,
        encode_png,
    )

    good = bytearray(encode_png(np.zeros((4, 4, 3), dtype=np.uint8)))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF" + bytes(good[4:]))
    bad = bytearray(good)
    bad[20] ^= 0xFF  # flip a byte inside IHDR -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))


def test_decode_image_real_dispatch():
    """PNG payloads decode natively; other formats raise the honest
    NotImplementedError where an imaging library would plug in."""
    import numpy as np
    import pytest

    from cqu_bigdata_recommender_system_for_movies_spark.functions.png_codec import (
        encode_png,
    )
    from cqu_bigdata_recommender_system_for_movies_spark.operators.multimodal import (
        decode_image_real,
    )

    arr = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    assert (decode_image_real(encode_png(arr)) == arr).all()
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\xff\xd8\xff\xe0 not-a-png payload")


def test_fixture_pixels_match_oracle_arithmetic():
    """The staged pixel law must equal what the DuckDB oracle recomputes."""
    from cqu_bigdata_recommender_system_for_movies_spark.sources.binary_files import (
        IMG_PIXELS,
        fixture_pixels,
    )

    arr = fixture_pixels(7)
    flat = arr.reshape(-1)
    assert len(flat) == IMG_PIXELS
    assert all(int(flat[i]) == (7 * 31 + i * 7) % 256 for i in range(IMG_PIXELS))
