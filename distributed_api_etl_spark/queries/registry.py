"""Query catalog: every graded operator registers a Spark builder + oracle SQL.

The driver harness runs each ``build(spark, sf_dir)`` and the matching
``oracle`` SQL (DuckDB, over the same parquet files registered as views named
``region nation customer supplier part orders lineitem events documents
embeddings``), then compares row count, schema, and an order-insensitive
value hash. Column names are aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

BuildFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: BuildFn
    oracle: str | None = None  # None => driver records a weaker rows-only check
    bench: bool = False  # include in bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)
    # graded=False keeps a query in the library/bench/pytest surface but out
    # of the driver's 50-slot grading window — used for near-duplicate grades
    # whose contract is already covered by a scale-safer sibling (e.g. the
    # label-prop CC vs the two-phase CC).
    graded: bool = True
    # Largest SF at which the LOCAL full-oracle sweep should run this
    # query's oracle (ADVICE r8 #3): deliberately-brute-force ground-truth
    # oracles (quadratic distance sweeps) get pinned so the sf0.1 sweep
    # doesn't spend minutes in DuckDB re-proving what sf0.01 already
    # proves. The driver itself always grades at sf0.01, below every pin;
    # sweep_sf_dir() applies the substitution for local harnesses.
    oracle_max_sf: float | None = None


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    bench: bool = False,
    tags: tuple[str, ...] = (),
    graded: bool = True,
    oracle_max_sf: float | None = None,
) -> Callable[[BuildFn], BuildFn]:
    def deco(fn: BuildFn) -> BuildFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name,
            build=fn,
            oracle=oracle,
            bench=bench,
            tags=tags,
            graded=graded,
            oracle_max_sf=oracle_max_sf,
        )
        return fn

    return deco


def sweep_sf_dir(spec: QuerySpec, sf_dir: str) -> str:
    """The sf_dir a LOCAL oracle sweep should use for ``spec``.

    Honors ``oracle_max_sf``: when sweeping above the pin (parsed from the
    trailing ``sf<float>`` path component), substitute the pinned scale's
    sibling directory — both engines still run and hash-compare, just at
    the largest scale the oracle's cost budget allows. Unparseable or
    custom directories pass through untouched.
    """
    if spec.oracle_max_sf is None:
        return sf_dir
    import os
    import re

    head, tail = os.path.split(sf_dir.rstrip("/"))
    m = re.fullmatch(r"sf([0-9.]+)", tail)
    if not m:
        return sf_dir
    try:
        sf = float(m.group(1))
    except ValueError:
        return sf_dir
    if sf <= spec.oracle_max_sf:
        return sf_dir
    pinned = os.path.join(head, f"sf{spec.oracle_max_sf:g}")
    if not os.path.isdir(pinned):
        # falling through silently would re-enable the minutes-long
        # quadratic oracle sweep the pin exists to avoid — make it loud
        import warnings

        warnings.warn(
            f"sweep_sf_dir({spec.name}): pinned dir {pinned!r} missing; "
            f"falling back to {sf_dir!r} — the brute-force oracle will run "
            "at full scale",
            stacklevel=2,
        )
        return sf_dir
    return pinned


def pin_events_confs(spark: SparkSession) -> None:
    """Session confs every events read depends on.

    UTC session tz makes LTZ<->NTZ casts the identity (so all three on-disk
    ts encodings normalize to the same naive instants the DuckDB oracle
    sees); ``nanosAsLong`` lets the vectorized reader accept TIMESTAMP(NANOS)
    files (it surfaces them as LongType) and is a no-op for micros files.
    Must be set BEFORE the parquet scan is planned.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def normalize_events_ts(df: DataFrame, target: str = "timestamp_ntz") -> DataFrame:
    """Normalize ``ts`` to ``target`` whatever the on-disk encoding was.

    The driver's testdata has shipped ``events.ts`` as TIMESTAMP(NANOS)
    (round 1) and TIMESTAMP(MICROS, isAdjustedToUTC=false) (round 2+), so
    branch on the LOADED dtype instead of assuming an encoding:

    - LongType   -> raw epoch-nanos via ``nanosAsLong``; rebuild with integer
      division (float ``/ 1000`` loses sub-ms precision above 2^53).
    - TimestampType / TimestampNTZType -> already a timestamp; with the
      session tz pinned UTC the cast to ``target`` is value-preserving.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    dt = df.schema["ts"].dataType
    if isinstance(dt, LongType):
        ts = F.timestamp_micros(F.expr("ts div 1000"))
    elif isinstance(dt, (TimestampType, TimestampNTZType)):
        ts = F.col("ts")
    else:
        raise TypeError(f"unsupported events.ts dtype: {dt}")
    return df.withColumn("ts", ts.cast(target))


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan for one of the star-schema tables.

    A plain ``spark.read.parquet`` so Catalyst gets filter pushdown, column
    pruning and partition pruning for free on every query built on top.
    ``events.ts`` is normalized to TIMESTAMP_NTZ from whichever encoding is
    on disk (see :func:`normalize_events_ts`).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        pin_events_confs(spark)
        return normalize_events_ts(spark.read.parquet(path))
    return spark.read.parquet(path)


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Give CPU-bound per-row work cluster-wide parallelism.

    A small parquet file scans as ONE partition, so everything downstream
    (shingling, hashing, vector math) runs on one core regardless of cluster
    size. Repartition up to ``defaultParallelism`` — but only when the scan
    is under-parallel: at 100 TB the scan already has thousands of splits
    and this is a no-op (no extra shuffle), which is why the guard matters.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    # inputFiles() is a cheap catalog call (~4ms); df.rdd would force full
    # plan analysis through Py4J (~1s of driver time). File count lower-
    # bounds scan parallelism: many files => already parallel => no-op.
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files < target:
        return df.repartition(target)
    return df


def load_all() -> dict[str, QuerySpec]:
    """Import all query modules (they self-register) and return the registry."""
    from distributed_api_etl_spark.queries import (  # noqa: F401
        curation,
        dedup,
        etl,
        events,
        graphs,
        pipeline,
        relational,
        similarity,
        sketches,
        streaming,
        text,
        tpch_adapted,
        tpch_more,
    )

    return REGISTRY
