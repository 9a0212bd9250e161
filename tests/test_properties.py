"""Property-based tests (hypothesis) for the pure per-row semantics that the
Spark operators implement distributively: chunking and sequence packing.

These pin down the invariants the oracle-parity checks can't state (they
only compare two engines computing the same formula): coverage, overlap,
reconstruction, and conservation properties that must hold for EVERY input,
not just the synthetic corpus.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from cqu_bigdata_recommender_system_for_movies_spark.operators.text import (
    CHUNK_OVERLAP,
    CHUNK_SIZE,
    CHUNK_STRIDE,
    chunk_tokens,
)

tokens_strategy = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=4), min_size=0, max_size=300
)


@settings(max_examples=200, deadline=None)
@given(tokens_strategy)
def test_chunks_cover_every_token(toks):
    chunks = chunk_tokens(toks)
    assert len(chunks) >= 1  # even empty docs yield one (empty) chunk
    covered = set()
    for ci, piece in chunks:
        start = ci * CHUNK_STRIDE
        assert piece == toks[start : start + CHUNK_SIZE]
        covered.update(range(start, start + len(piece)))
    assert covered == set(range(len(toks)))


@settings(max_examples=200, deadline=None)
@given(tokens_strategy)
def test_chunks_reconstruct_document(toks):
    """Dropping each later chunk's first CHUNK_OVERLAP tokens and
    concatenating must reproduce the document exactly."""
    chunks = chunk_tokens(toks)
    rebuilt = list(chunks[0][1])
    for _, piece in chunks[1:]:
        rebuilt.extend(piece[CHUNK_OVERLAP:])
    assert rebuilt == toks


@settings(max_examples=200, deadline=None)
@given(tokens_strategy)
def test_consecutive_full_chunks_overlap_exactly(toks):
    chunks = chunk_tokens(toks)
    for (_, a), (_, b) in zip(chunks, chunks[1:]):
        if len(a) == CHUNK_SIZE:
            assert a[CHUNK_STRIDE:] == b[: len(a[CHUNK_STRIDE:])]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2000), min_size=1, max_size=200))
def test_sequence_packing_conservation(n_tokens_list):
    """The packing formula (pack_id, pack_offset) must be the exact
    div/mod decomposition of the running total, with offsets in range —
    the python mirror of the window-sum formula both engines run."""
    from cqu_bigdata_recommender_system_for_movies_spark.operators.features import (
        PACK_CAPACITY,
    )

    cum = 0
    for n in n_tokens_list:
        pack_id, offset = divmod(cum, PACK_CAPACITY)
        assert pack_id * PACK_CAPACITY + offset == cum
        assert 0 <= offset < PACK_CAPACITY
        assert pack_id >= 0
        cum += n


# --- PNG codec round-trip (S8 real decode) ---------------------------------

import numpy as np  # noqa: E402

png_shape_strategy = st.tuples(
    st.integers(min_value=1, max_value=12),  # height: cover all 5 filters
    st.integers(min_value=1, max_value=12),  # width: incl. w < bpp edge
    st.sampled_from([1, 3]),  # greyscale and RGB
)


@settings(max_examples=100, deadline=None)
@given(png_shape_strategy, st.integers(min_value=0, max_value=2**32 - 1))
def test_png_codec_roundtrip_every_shape(shape, seed):
    """decode(encode(x)) == x for EVERY uint8 image — the invariant the
    fixed-seed test can't state. The encoder rotates scanline filters
    row-by-row, so any height >= 5 exercises Sub/Up/Average/Paeth
    unfiltering against arbitrary pixel content."""
    from cqu_bigdata_recommender_system_for_movies_spark.functions.png_codec import (
        decode_png,
        encode_png,
    )

    h, w, ch = shape
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    out = decode_png(encode_png(arr if ch == 3 else arr[:, :, 0]))
    assert out.shape == (h, w, ch)
    assert (out == arr).all()
