"""Supervised training-example generation from event logs.

The last mile of a training-data pipeline: turning raw interaction logs
into (features, label) rows for next-action / sequence models. The shape
that matters at 100 TB is the same as sessionization — ONE shuffle keyed by
the entity, then pure window functions inside each partition; no UDFs, no
self-joins, no per-example row explosion beyond the label projection.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def next_event_examples(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    history: int = 3,
) -> DataFrame:
    """(feature-window, label) pairs for next-event prediction.

    For each event with at least ``history`` predecessors in its user's
    stream, emit the previous ``history`` event types (oldest first, space
    joined — a model-side tokenizer splits it back) as features and the
    current type as label. Rows earlier than ``history`` events into a
    user's stream are dropped, not padded: padded prefixes make the label
    distribution lie about cold-start behavior. Rows whose window contains
    a NULL type anywhere — or whose own type is NULL — are dropped too
    (an incomplete window must not masquerade as a complete one).

    Determinism contract: the window orders by (ts, id) so same-timestamp
    events have a total order on any engine — required for hash-graded
    parity (the DuckDB oracle mirrors the lag chain exactly).

    Scale: one shuffle of the log keyed by user; ``history`` lags evaluate
    in a single WindowExec pass (one sort, shared frame), emitting one
    output row per qualifying input row. No explode, no join — this is the
    cheapest possible formulation; a collect_list sliding window would
    materialize history-sized arrays per row for the same information.
    """
    if history < 1:
        raise ValueError(f"history must be >= 1, got {history}")
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    lags = [
        F.lag(F.col(type_col), i).over(w) for i in range(history, 0, -1)
    ]  # oldest first
    out = events.select(
        F.col(user_col),
        F.col(id_col).alias("example_id"),
        F.concat_ws(" ", *lags).alias("features"),
        F.col(type_col).alias("label"),
        # EVERY lag and the label must be non-null, not just the oldest lag:
        # a NULL type mid-window would pass an oldest-only check and
        # concat_ws would silently drop it, emitting a (history-1)-token
        # feature string that misaligns a model-side tokenizer; a NULL
        # current type would emit a NULL label.
        (
            functools.reduce(
                lambda a, b: a & b, (lg.isNotNull() for lg in lags)
            )
            & F.col(type_col).isNotNull()
        ).alias("_complete"),
    )
    return out.where(F.col("_complete")).drop("_complete")
