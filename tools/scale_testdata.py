"""Deterministic K-fold scale-up of the driver's synthetic testdata.

VERDICT r6 #8 (stretch): the oracle-parity suite is green at
sf0.001/0.01/0.1, but scale-dependent oracle drift (the
covisitation_matrix epoch-rounding class) and top-k tie fragility only
surface with MORE data. The sandbox ships no sf1.0, so this tool builds
one: each table is replicated K times with primary keys offset by
``replica * (max_key + 1)`` and foreign keys offset by the SAME base as
the table they reference, so referential integrity (ratings =
lineitem ⋈ orders, events.user_id → customer) holds exactly and every
query sees a K×-bigger but structurally identical world. Dimension
tables (region, nation) are shared, like TPC-H. No RNG anywhere — the
output is a pure function of the input, so both Spark and the DuckDB
oracles read identical files and the parity sweep stays meaningful.

Replicated non-key values are byte-identical across replicas ON
PURPOSE: value ties across replica groups stress exactly the
deterministic-tie-break discipline a 100 TB corpus would (any
order-dependent top-k or unstable sort shows up as a hash mismatch).

Usage: python tools/scale_testdata.py SRC_DIR DST_DIR K
e.g.   python tools/scale_testdata.py /root/testdata/sf0.1 /tmp/sf1.0x 10
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# table -> (primary-key column, {fk column -> referenced table})
LAYOUT: dict[str, tuple[str | None, dict[str, str]]] = {
    "region": (None, {}),  # shared dim — copied, not replicated
    "nation": (None, {}),  # shared dim — copied, not replicated
    "customer": ("c_custkey", {}),
    "supplier": ("s_suppkey", {}),
    "part": ("p_partkey", {}),
    "orders": ("o_orderkey", {"o_custkey": "customer"}),
    "lineitem": (
        None,  # lineitem's identity is (l_orderkey, l_linenumber)
        {"l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier"},
    ),
    "events": ("event_id", {"user_id": "customer"}),
    "documents": ("doc_id", {}),
    "embeddings": ("vec_id", {}),
}


def _offset(col: pa.ChunkedArray, delta: int) -> pa.ChunkedArray:
    return pc.add(col, pa.scalar(delta, type=col.type))


def scale(src: str, dst: str, k: int, only: list[str] | None = None) -> None:
    """Replicate every table K-fold into dst; ``only`` restricts the
    OUTPUT to a subset (e.g. just ``documents`` for a 1000x text-family
    probe that would be too large to build for all ten tables). Any
    table a selected table references by FK is still read for its key
    base, so offsets stay identical to a full build at the same K."""
    os.makedirs(dst, exist_ok=True)
    selected = dict(LAYOUT) if only is None else {n: LAYOUT[n] for n in only}
    need = set(selected)
    for _, fks in selected.values():
        need |= set(fks.values())
    tables = {name: pq.read_table(f"{src}/{name}.parquet") for name in sorted(need)}
    # One key base per REFERENCED table so pk and fk shift in lockstep.
    base = {
        name: pc.max(t[pk]).as_py() + 1
        for name, t in tables.items()
        if (pk := LAYOUT[name][0]) is not None
    }
    for name, t in ((n, tables[n]) for n in selected):
        pk, fks = LAYOUT[name]
        if pk is None and not fks:  # shared dim
            pq.write_table(t, f"{dst}/{name}.parquet")
            print(f"{name}: copied {t.num_rows} rows (shared dim)")
            continue
        replicas = []
        for i in range(k):
            r = t
            shifted = {pk: base[name]} if pk else {}
            for fk, ref in fks.items():
                shifted[fk] = base[ref]
            for col, b in shifted.items():
                idx = r.schema.get_field_index(col)
                r = r.set_column(idx, col, _offset(r[col], i * b))
            replicas.append(r)
        out = pa.concat_tables(replicas)
        pq.write_table(out, f"{dst}/{name}.parquet")
        print(f"{name}: {t.num_rows} -> {out.num_rows} rows (K={k})")


if __name__ == "__main__":
    # usage: scale_testdata.py SRC DST K [table ...]
    src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    scale(src, dst, k, only=sys.argv[4:] or None)
