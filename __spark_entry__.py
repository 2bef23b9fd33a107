"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All graded operators live in ``distributed_api_etl_spark.queries`` — each
module registers (spark builder, oracle SQL) pairs with identical output
column names/types on both sides.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _last_green_round() -> dict[str, int]:
    """Per-query round of the most recent driver-green CORRECTNESS row.

    Reads the CORRECTNESS_r*.json files the driver leaves in the repo root.
    A row is green when it has no err and every *_match flag present is
    true. Queries absent from every file map to nothing (never graded).
    """
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict) or row.get("err") is not None:
                continue
            flags = [
                row[k]
                for k in ("rows_match", "schema_match", "hash_match")
                if row.get(k) is not None
            ]
            if flags and all(flags):
                last[name] = max(last.get(name, 0), rnd)
    return last


# Queries whose BUILD AND ORACLE changed in lockstep this round: lifted to
# the front of their last-green tier so the changed pair re-grades inside
# THIS round's window instead of waiting out its rotation slot. Re-point
# (or empty) this set whenever a round changes a graded head's contract.
# (The r3/r4 never-green backlog frozensets that used to sit next to this
# were deleted in r14 — every member had been green since r9/r10, leaving
# them permanently inert tie-breakers.)
_CHANGED_CONTRACT_PRIORITY: frozenset[str] = frozenset()


def _grading_order(names: list[str]) -> list[str]:
    """Priority order for the driver's bounded grading window.

    The driver grades the first N entries of ``queries()`` per round, so
    ordering IS the rotation policy: never-driver-green queries first,
    then least-recently-green (changed-contract re-grades lifted to the
    front of their tier), alphabetical within a tier. Each round's new
    CORRECTNESS file automatically pushes freshly-graded queries to the
    back, so the window sweeps the whole registry across rounds with no
    manual bookkeeping.
    """
    last = _last_green_round()
    return sorted(
        names,
        key=lambda n: (
            last.get(n, -1),
            n not in _CHANGED_CONTRACT_PRIORITY,
            n,
        ),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from distributed_api_etl_spark.queries import load_all
    from distributed_api_etl_spark.session import apply_runtime_conf

    apply_runtime_conf(spark)
    registry = load_all()
    flagship = registry.get("api_pipeline_bronze") or registry["q1_pricing_summary"]
    return flagship.build(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Returned in grading-priority order (see :func:`_grading_order`) so the
    driver's bounded per-round window reaches queries without driver-green
    evidence before re-grading last round's greens.
    """
    from distributed_api_etl_spark.queries import load_all
    from distributed_api_etl_spark.session import apply_runtime_conf, release_caches

    registry = load_all()

    def wrap(build):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # previous graded query's results are consumed by now; drop its
            # operator-internal caches so 50 queries never accumulate plans
            release_caches()
            apply_runtime_conf(spark)
            return build(spark, sf_dir)

        return run

    graded = {n: s for n, s in registry.items() if s.graded}
    return {name: wrap(graded[name].build) for name in _grading_order(list(graded))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each SQL-expressible query."""
    from distributed_api_etl_spark.queries import load_all

    graded = {n: s for n, s in load_all().items() if s.graded}
    return {
        name: graded[name].oracle
        for name in _grading_order(list(graded))
        if graded[name].oracle is not None
    }
