"""Slowly-changing-dimension (type 2) merge for dimension tables.

The warehouse-side counterpart of the reference's insert-only bronze merge
(src/orchestration/batch_handler.py:47): ingest pipelines land facts, but
dimension updates need history — SCD2 closes the current version of a
changed key and appends the new version, so every fact joins to the
dimension AS OF its event time.

Scale notes: ONE equi-join between the current slice and the update batch
(AQE picks broadcast vs sort-merge from the update batch's size — update
batches are typically tiny next to the dimension), plus unions that are
map-side only. History rows never join at all (closed versions pass
through untouched). No windows, no per-key loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Open-ended validity marker for the current version of a key.
OPEN_END = None


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_col: str,
    tracked_cols: list[str],
    effective_col: str = "effective_ts",
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Apply an update batch to an SCD2 dimension; returns the new dimension.

    ``dim`` rows carry ``valid_from`` and ``valid_to`` (NULL = current).
    ``updates`` carries the key, the tracked attribute columns, and the
    version's ``effective_col`` timestamp. Semantics per key:

    * changed tracked attrs -> current row closes (``valid_to`` :=
      effective ts) and the update inserts as the new current version;
    * unchanged attrs -> current row passes through (no spurious version);
    * key absent from ``dim`` -> update inserts as the first version;
    * key absent from ``updates`` -> untouched.

    ``updates`` must be unique per key (one version per batch; run batches
    in effective-time order for multi-step history).
    """
    out_cols = [key_col, *tracked_cols, valid_from_col, valid_to_col]
    history = dim.where(F.col(valid_to_col).isNotNull()).select(*out_cols)
    current = dim.where(F.col(valid_to_col).isNull())

    upd = updates.select(
        F.col(key_col),
        *[F.col(c).alias(f"_u_{c}") for c in tracked_cols],
        F.col(effective_col).alias("_u_eff"),
    )
    joined = current.join(upd, key_col, "full_outer")

    changed = F.lit(False)
    for c in tracked_cols:
        # null-safe inequality so NULL -> value and value -> NULL both count
        changed = changed | ~F.col(c).eqNullSafe(F.col(f"_u_{c}"))
    has_cur = F.col(valid_from_col).isNotNull()
    has_upd = F.col("_u_eff").isNotNull()

    closed = joined.where(has_cur & has_upd & changed).select(
        F.col(key_col),
        *[F.col(c) for c in tracked_cols],
        F.col(valid_from_col),
        F.col("_u_eff").alias(valid_to_col),
    )
    new_version = joined.where(has_upd & (~has_cur | changed)).select(
        F.col(key_col),
        *[F.col(f"_u_{c}").alias(c) for c in tracked_cols],
        F.col("_u_eff").alias(valid_from_col),
        # the open-end NULL takes the DIMENSION's own valid_to type — a
        # hardcoded timestamp_ntz would mis-union (or tz-shift) against a
        # dimension declared with plain TIMESTAMP validity columns
        F.lit(OPEN_END).cast(dim.schema[valid_to_col].dataType).alias(valid_to_col),
    )
    carried = joined.where(has_cur & (~has_upd | ~changed)).select(*out_cols)

    return history.unionByName(closed).unionByName(new_version).unionByName(carried)
