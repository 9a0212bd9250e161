"""Per-key stateful interest-vector fold (SURVEY.md ST3 / F7 / M8).

The reference maintains a per-user "interest vector" updated per rating
event: ``U := U*(1 - λ·r) + T·(λ·r)`` with λ=0.05, where T is the item's
feature vector (reference src/streaming/streaming_rec.py:77-127, update rule
at line 99). Its implementation had two scale bugs we deliberately fix
(SURVEY.md §3.2): it processed only ``batch_df.first()`` (one event per
micro-batch) and kept state in an external DB with a per-event
read-modify-write.

Here the fold runs as proper distributed streaming state:
``groupBy(user_id).applyInPandasWithState`` — state is the interest vector,
partitioned by user across executors; each micro-batch folds *all* of a
user's events in event-time order. No external round-trips; state lives in
the engine's state store and scales with the number of keys.
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

LAMBDA = 0.05  # reference streaming_rec.py:99 (docstring says 0.8; code wins)
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")
DIM = len(EVENT_TYPES)
RATING_SCALE = 50.0  # maps value (~0..250) into a rating-like magnitude

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("interest", ArrayType(DoubleType())),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("interest", ArrayType(DoubleType())),
    ]
)


def one_hot(event_type: str) -> np.ndarray:
    t = np.zeros(DIM)
    if event_type in EVENT_TYPES:
        t[EVENT_TYPES.index(event_type)] = 1.0
    return t


def fold_events(interest: np.ndarray, events: pd.DataFrame) -> np.ndarray:
    """Apply the reference's update rule over events sorted by event time.

    The per-event recurrence ``U_k = a_k * U_{k-1} + b_k`` (a_k = 1-λr_k,
    b_k = t_k·λr_k) has the closed form

        U_n = (Π a_k) · U_0  +  Σ_k b_k · (Π_{j>k} a_j)

    so the whole batch folds with vectorized suffix-products instead of a
    per-row Python loop — O(n) numpy, no iterrows. t_k is one-hot, so the
    Σ term reduces to a scatter-add per event-type dimension.
    """
    ordered = events.sort_values(["ts", "event_id"])
    n = len(ordered)
    if n == 0:
        return interest
    r = ordered["value"].to_numpy(dtype=np.float64) / RATING_SCALE
    a = 1.0 - LAMBDA * r
    lr = LAMBDA * r
    suffix = np.ones(n)  # suffix[k] = Π a[k+1:]
    if n > 1:
        suffix[:-1] = np.cumprod(a[::-1])[::-1][1:]
    idx = {t: i for i, t in enumerate(EVENT_TYPES)}
    type_idx = np.fromiter(
        (idx.get(t, -1) for t in ordered["event_type"]), dtype=np.int64, count=n
    )
    contrib = np.zeros(DIM)
    mask = type_idx >= 0
    np.add.at(contrib, type_idx[mask], lr[mask] * suffix[mask])
    return interest * np.prod(a) + contrib


def update_interest(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState callback: fold the batch into per-user state."""
    if state.exists:
        n_events, interest_list = state.get
        interest = np.array(interest_list)
    else:
        n_events, interest = 0, np.zeros(DIM)
    for pdf in pdfs:
        interest = fold_events(interest, pdf)
        n_events += len(pdf)
    state.update((n_events, [float(x) for x in interest]))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n_events],
            "interest": [[float(x) for x in interest]],
        }
    )


def interest_fold_stream(stream_df, output_mode: str = "update"):
    """Wire the stateful fold onto a streaming events DataFrame."""
    from cqu_bigdata_recommender_system_for_movies_spark.shipping import ensure_shipped

    ensure_shipped(stream_df.sparkSession)
    return (
        stream_df.select("user_id", "ts", "event_id", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update_interest,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            output_mode,
            GroupStateTimeout.NoTimeout,
        )
    )


def interest_fold_stream_tws(stream_df):
    """The same per-key fold on Spark 4's transformWithStateInPandas —
    typed ValueState in the RocksDB state store instead of the legacy
    GroupState API. Everything the processor needs is defined INSIDE this
    function and captured by value (cloudpickle serializes nested classes
    whole), because the transformWithState Python runner is a separate
    long-lived process that cannot import this package when the driver
    starts outside the repo (unlike pandas-UDF workers, it ignores
    addPyFile).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    lam, scale, dim = LAMBDA, RATING_SCALE, DIM
    types = EVENT_TYPES
    out_schema, state_schema = OUTPUT_SCHEMA, STATE_SCHEMA

    class InterestProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.state = handle.getValueState("interest", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            import numpy as np
            import pandas as pd

            pdf = pd.concat(list(rows), ignore_index=True)
            if self.state.exists():
                n_events, vec = self.state.get()
                interest = np.array(vec)
            else:
                n_events, interest = 0, np.zeros(dim)
            # closed-form fold (same math as fold_events, inlined so the
            # class pickles without any reference to this package)
            ordered = pdf.sort_values(["ts", "event_id"])
            n = len(ordered)
            if n:
                r = ordered["value"].to_numpy(dtype=np.float64) / scale
                a = 1.0 - lam * r
                lr = lam * r
                suffix = np.ones(n)
                if n > 1:
                    suffix[:-1] = np.cumprod(a[::-1])[::-1][1:]
                idx = {t: i for i, t in enumerate(types)}
                type_idx = np.fromiter(
                    (idx.get(t, -1) for t in ordered["event_type"]),
                    dtype=np.int64,
                    count=n,
                )
                contrib = np.zeros(dim)
                mask = type_idx >= 0
                np.add.at(contrib, type_idx[mask], lr[mask] * suffix[mask])
                interest = interest * np.prod(a) + contrib
            n_events += n
            self.state.update((n_events, [float(x) for x in interest]))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n_events],
                    "interest": [[float(x) for x in interest]],
                }
            )

        def close(self) -> None:
            pass

    return (
        stream_df.select("user_id", "ts", "event_id", "event_type", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=InterestProcessor(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )
