"""Arrow-vectorized nearest-quantizer-cell assignment (r16 optimization).

The flat coarse-quantizer assignment used to run as an interpreted
higher-order fold per row (`_nearest_cells` — a `transform` over the
broadcast cell structs, each scoring a `zip_with`+`aggregate` dot):
higher-order functions never codegen, so the measured per-cosine cost is
~15-30 µs and assignment throughput is LINEAR in quantizer width (33k /
1.5k / 147 rows/s at 16 / 256 / 2048 cells on the 2M replica — the wall
that forced ANN_DERIVED_CELLS_CAP). Guide §4.2: hand whole Arrow batches
to vectorized native code instead. This module computes the SAME
assignment in numpy at ~10 ns per cosine — three orders of magnitude —
while staying BIT-IDENTICAL to the JVM fold, which the driver's
bit-sensitive result hash requires:

- The JVM fold is ``acc := acc + e[d]*c[d]`` left-to-right in binary64.
  numpy replays the identical op sequence elementwise-over-rows
  (``acc += E[:, d] * C[c, d]`` for d ascending), so every intermediate
  double is the same IEEE-754 value.
- ``sqrt`` is correctly rounded in both (Math.sqrt / hardware sqrtsd).
- The cosine expression ``dot / (ne * nc + EPS)`` is replayed with the
  same association: ``(ne * nc) + EPS`` then the divide.
- Cell selection replicates ``reverse(array_sort((cos, -cid)))[:k]`` —
  cos DESC, ties to the smaller cid — by comparing the IEEE
  total-order integer key of each cosine rather than the float itself.
  Spark orders doubles with SQLOrderingUtil.compareDoubles, which
  checks primitive ``==`` FIRST (so -0.0 and +0.0 compare EQUAL and
  the tie falls through to cid; NaN sorts greatest via the
  Double.compare fallback — unreachable here, the denominator is
  >= EPS > 0), so signed zeros are normalized to +0.0 BEFORE the key
  is built (ADVICE r16: the raw total-order key would rank
  -0.0 < +0.0 and could diverge from Spark when a +0.0 cosine sits on
  the larger cid — itself unreachable for these non-negative-seeded
  folds, but the key now matches Spark's comparator by construction
  instead of by reachability argument). Ascending-cid argmax keeps the
  first of equal keys, which IS the smaller-cid tie-break.

The closure captures the bounded seed arrays by value (cloudpickle), so
the physical plan stays independent of quantizer width — the same
property the single-row broadcast `__cents` relation pinned
(test_ivf_assign_plan_size_independent_of_cells), now without the
per-row interpreted fold.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def _ship() -> None:
    """Workers unpickle these UDFs by module reference — ship the
    package once per session (no-op when already shipped)."""
    from cqu_bigdata_recommender_system_for_movies_spark.shipping import (
        ensure_shipped,
    )

    spark = SparkSession.getActiveSession()
    if spark is not None:
        ensure_shipped(spark)

# Sentinel key for already-selected cells in the top-k loop: below every
# real cosine's total-order key (the minimum reachable key for a non-NaN
# double is the one for -inf, 0x800fffffffffffff > int64 min; cosines
# here are never NaN — the denominator is >= EPS > 0).
_KEY_SENTINEL = -(2**63)

# must equal operators.vectors.EPS (cosine denominator) — pinned by
# tests/test_functions.py::test_nearcell_eps_matches_vectors (ADVICE
# r16: a module-level import of operators.vectors here would drag the
# whole registry into every worker's UDF import and wire a new closure
# edge into 14 query manifests; the equality test is the cheaper pin)
EPS = 1e-8


def _spark_double_keys(cos):
    """int64 sort keys replicating Spark's double comparator
    (SQLOrderingUtil.compareDoubles: primitive ``==`` first, so
    -0.0 == +0.0; Double.compare otherwise): normalize signed zeros,
    then take the IEEE total-order key. ``cos`` is modified in place
    only via the returned array; NaN never occurs here (denominator
    >= EPS)."""
    import numpy as np

    cos = np.where(cos == 0.0, 0.0, cos)  # -0.0 -> +0.0 (ADVICE r16)
    bits = cos.view(np.int64)
    return np.where(bits < 0, bits ^ np.int64(0x7FFFFFFFFFFFFFFF), bits)


def _seed_arrays(seeds):
    import numpy as np

    srt = sorted(seeds, key=lambda s: s[0])
    cids = np.array([s[0] for s in srt], dtype=np.int64)
    cmat = np.array([s[1] for s in srt], dtype=np.float64)  # (m, dim)
    ncs = np.array([s[2] for s in srt], dtype=np.float64)
    return cids, cmat, ncs


def topk_cells_np(E, cids, cmat, ncs, k):
    """Top-k cells for a (n, dim) float64 matrix of row vectors — the
    numpy replay of `_nearest_cells` (see module docstring for the
    bit-exactness argument). Returns an (n, k) int64 array, columns in
    rank order (cos DESC, cid ASC)."""
    import numpy as np

    n, dim = E.shape
    m = cmat.shape[0]
    # row norm: the same left fold acc += e[d]*e[d], then sqrt
    ne = np.zeros(n)
    for d in range(dim):
        col = E[:, d]
        ne += col * col
    ne = np.sqrt(ne)
    # dots: acc += e[d] * c[d] per (row, cell), d ascending
    dots = np.zeros((n, m))
    for d in range(dim):
        dots += E[:, d, None] * cmat[None, :, d]
    cos = dots / (ne[:, None] * ncs[None, :] + EPS)
    # Spark's double comparator as an int64 key (signed zeros unified)
    key = _spark_double_keys(cos)
    keff = min(k, m)
    out = np.empty((n, keff), dtype=np.int64)
    rows = np.arange(n)
    for j in range(keff):
        sel = np.argmax(key, axis=1)  # first max = smaller cid on ties
        out[:, j] = cids[sel]
        key[rows, sel] = _KEY_SENTINEL
    return out


def nearest_cells_udf(seeds, k: int) -> Callable[..., Column]:
    """Vectorized twin of `_nearest_cells(vec_col, k)`: a pandas UDF
    mapping a vector column to its top-k quantizer cells
    (`array<int>`, cos DESC / cid ASC — the oracles' exact order).

    ``seeds``: bounded list of (cid, ce: list[float], nc) — the same
    rows the `__cents` broadcast relation carries, sorted by cid."""
    _ship()
    cids, cmat, ncs = _seed_arrays(seeds)
    kk = int(k)

    def _topk(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import numpy as np

        for s in it:
            if len(s) == 0:
                yield pd.Series([], dtype=object)
                continue
            valid = s.notna()
            E = (
                np.vstack(s[valid].to_numpy())
                if valid.any()
                else np.zeros((0, cmat.shape[1]))
            )
            top = topk_cells_np(E, cids, cmat, ncs, kk)
            vals = np.empty(len(s), dtype=object)
            vals[:] = None
            for i, row in zip(np.flatnonzero(np.asarray(valid)), top):
                vals[i] = row.tolist()
            yield pd.Series(vals)

    return F.pandas_udf(_topk, "array<int>")


def nearest_cell_udf(seeds) -> Callable[..., Column]:
    """Scalar (k=1) twin of ``element_at(_nearest_cells(vec_col, 1), 1)``:
    maps a vector column straight to its single nearest cell (`int`)."""
    _ship()
    cids, cmat, ncs = _seed_arrays(seeds)

    def _top1(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import numpy as np

        for s in it:
            if len(s) == 0:
                yield pd.Series([], dtype="Int32")
                continue
            valid = s.notna()
            E = (
                np.vstack(s[valid].to_numpy())
                if valid.any()
                else np.zeros((0, cmat.shape[1]))
            )
            top = topk_cells_np(E, cids, cmat, ncs, 1)
            out = pd.Series([None] * len(s), dtype="Int32")
            out[np.asarray(valid)] = top[:, 0].astype("int32")
            yield out

    return F.pandas_udf(_top1, "int")


def two_level_topk_np(E, rep_arrays, cell_arrays, probe, k):
    """Hierarchical top-k cells for a (n, dim) float64 matrix — the
    numpy replay of `_two_level_cells`: level 1 selects each row's top
    ``probe`` representatives (cos DESC, rid ASC), level 2 ranks the
    probed groups' member cells (cos DESC, cid ASC across their union).
    Work stays O((1 + probe) * sqrt(n_cells)) dots per row — the
    level-2 dot loop runs per GROUP over only the rows that probed it —
    so the hierarchical scaling argument survives vectorization.
    Returns (n, k) int64; unfilled slots (fewer candidate cells than k)
    hold -1, which callers must slice away before k > reachable cells
    (the registered paths never request that)."""
    import numpy as np

    rids, rmat, nrs = rep_arrays
    cids, cmat, ncs, gid_of_cell = cell_arrays
    n, dim = E.shape
    n_reps = rmat.shape[0]
    m = cmat.shape[0]
    ne = np.zeros(n)
    for d in range(dim):
        col = E[:, d]
        ne += col * col
    ne = np.sqrt(ne)
    # level 1: full (n, n_reps) scoring — the sqrt-width term
    rdots = np.zeros((n, n_reps))
    for d in range(dim):
        rdots += E[:, d, None] * rmat[None, :, d]
    rcos = rdots / (ne[:, None] * nrs[None, :] + EPS)
    rkey = _spark_double_keys(rcos)
    probed = np.zeros((n, n_reps), dtype=bool)
    rows = np.arange(n)
    for _ in range(min(probe, n_reps)):
        sel = np.argmax(rkey, axis=1)  # first max = smaller rid on ties
        probed[rows, sel] = True
        rkey[rows, sel] = _KEY_SENTINEL
    # level 2: per-group scoring over only the rows that probed the
    # group — scattered into a sentinel-initialized key matrix so the
    # final selection ranks the probed-union exactly like the
    # filter + sort expression (cos DESC, cid ASC).
    key = np.full((n, m), _KEY_SENTINEL, dtype=np.int64)
    for gi, rid in enumerate(rids):
        rows_g = probed[:, gi]
        if not rows_g.any():
            continue
        cells_g = gid_of_cell == rid
        if not cells_g.any():
            continue
        Eg = E[rows_g]
        Cg = cmat[cells_g]
        dg = np.zeros((Eg.shape[0], Cg.shape[0]))
        for d in range(dim):
            dg += Eg[:, d, None] * Cg[None, :, d]
        cg = dg / (ne[rows_g, None] * ncs[None, cells_g] + EPS)
        key[np.ix_(rows_g, cells_g)] = _spark_double_keys(cg)
    keff = min(k, m)
    out = np.full((n, keff), -1, dtype=np.int64)
    for j in range(keff):
        sel = np.argmax(key, axis=1)
        filled = key[rows, sel] != _KEY_SENTINEL
        out[filled, j] = cids[sel[filled]]
        key[rows, sel] = _KEY_SENTINEL
    return out


def _two_level_arrays(rep_rows, cell_rows):
    import numpy as np

    reps = sorted(rep_rows, key=lambda r: r[0])
    cells = sorted(cell_rows, key=lambda c: c[0])
    rep_arrays = (
        np.array([r[0] for r in reps], dtype=np.int64),
        np.array([r[1] for r in reps], dtype=np.float64),
        np.array([r[2] for r in reps], dtype=np.float64),
    )
    cell_arrays = (
        np.array([c[0] for c in cells], dtype=np.int64),
        np.array([c[1] for c in cells], dtype=np.float64),
        np.array([c[2] for c in cells], dtype=np.float64),
        np.array([c[3] for c in cells], dtype=np.int64),
    )
    return rep_arrays, cell_arrays


def two_level_cells_udf(rep_rows, cell_rows, probe: int, k: int):
    """Vectorized twin of `_two_level_cells(vec_col, k)` under
    ANN_GROUP_PROBE=``probe``: a pandas UDF mapping a vector column to
    its hierarchically-selected top-k cells (`array<int>`).

    ``rep_rows``: [(rid, re, nr)] — the `__reps` relation's structs;
    ``cell_rows``: [(cid, ce, nc, gid)] — the `__gcents` structs."""
    _ship()
    rep_arrays, cell_arrays = _two_level_arrays(rep_rows, cell_rows)
    pp, kk = int(probe), int(k)

    def _topk(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import numpy as np

        for s in it:
            if len(s) == 0:
                yield pd.Series([], dtype=object)
                continue
            valid = s.notna()
            E = (
                np.vstack(s[valid].to_numpy())
                if valid.any()
                else np.zeros((0, cell_arrays[1].shape[1]))
            )
            top = two_level_topk_np(E, rep_arrays, cell_arrays, pp, kk)
            vals = np.empty(len(s), dtype=object)
            vals[:] = None
            for i, row in zip(np.flatnonzero(np.asarray(valid)), top):
                vals[i] = [int(c) for c in row if c >= 0]
            yield pd.Series(vals)

    return F.pandas_udf(_topk, "array<int>")


def two_level_cell_udf(rep_rows, cell_rows, probe: int):
    """Scalar (k=1) twin of `_two_level_cell(vec_col)`: the single
    hierarchically-selected cell (`int`)."""
    _ship()
    rep_arrays, cell_arrays = _two_level_arrays(rep_rows, cell_rows)
    pp = int(probe)

    def _top1(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import numpy as np

        for s in it:
            if len(s) == 0:
                yield pd.Series([], dtype="Int32")
                continue
            valid = s.notna()
            E = (
                np.vstack(s[valid].to_numpy())
                if valid.any()
                else np.zeros((0, cell_arrays[1].shape[1]))
            )
            top = two_level_topk_np(E, rep_arrays, cell_arrays, pp, 1)
            out = pd.Series([None] * len(s), dtype="Int32")
            # ADVICE r16: the -1 unfilled sentinel (a vector whose probed
            # groups own zero cells) must surface as NULL — matching the
            # array variant's c >= 0 filter — not as a real cell id -1
            cells = pd.array(top[:, 0], dtype="Int32")
            cells[top[:, 0] == -1] = pd.NA
            out[np.asarray(valid)] = cells
            yield out

    return F.pandas_udf(_top1, "int")
