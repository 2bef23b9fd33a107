"""Sequence packing: assign documents to fixed-token-budget training packs.

The standard "concat-and-chunk" pretraining layout: documents are laid out
in a deterministic order inside a pack stream, the token stream is cut every
``budget`` tokens, and a document's pack is the chunk its first token lands
in. Downstream loaders then read one pack per training row.

Spark-first design
------------------
One window (`sum` over the preceding frame) per pack stream computes each
document's starting offset; pack id / offset fall out with integer
arithmetic — a single shuffle on the stream key, no UDFs, no driver state.

Scale note: the window partitions by ``stream_col`` (e.g. ``source``), so
each stream sorts independently — the sort is the window's, distributed per
key. At 100 TB a single giant stream would serialize into one task; there,
derive the stream key from the physical shard (e.g. ``input_file_name()`` or
``pmod(hash(id), n_streams)``) so packing parallelism tracks the scan, which
is exactly what per-shard packing in a real pipeline does. Determinism is
preserved because the hash is row-keyed, not partition-keyed.

No reference counterpart (the reference has no training-data surface); this
belongs to the LLM-pipeline operator family (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    order_col: str | list[str] | tuple[str, ...],
    token_count_col: str,
    budget: int,
    stream_col: str,
) -> DataFrame:
    """Assign each row to a training pack of ``budget`` tokens.

    Adds ``pack_id`` (0-based chunk index of the row's first token within
    its stream) and ``pack_offset`` (token offset of the row inside that
    chunk). Rows longer than the remaining chunk space straddle the
    boundary — concat-and-chunk semantics, where chunks are cut blindly.

    ``order_col`` may be one column name or a sequence of names (ascending
    compound order). The order must be a TOTAL order within each stream —
    ties would make the running offset partitioning-dependent — so callers
    ordering by a derived key (an epoch-shuffle hash) must append a unique
    tie-break column (the id).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    clobbered = {"pack_id", "pack_offset", "_cum_before"}.intersection(df.columns)
    if clobbered:
        # withColumn would silently replace a prior packing pass's outputs
        # (and the final drop would eat a caller's _cum_before) — the
        # shard_assignment collision-guard convention
        raise ValueError(
            f"pack_sequences: input already carries {sorted(clobbered)}; "
            "rename or drop them before re-packing"
        )
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    w = (
        Window.partitionBy(stream_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_count_col).over(w), F.lit(0)).cast("bigint")
    return (
        df.withColumn("_cum_before", cum_before)
        .withColumn("pack_id", F.expr(f"_cum_before div {budget}"))
        .withColumn("pack_offset", F.pmod(F.col("_cum_before"), F.lit(budget)).cast("bigint"))
        .drop("_cum_before")
    )
