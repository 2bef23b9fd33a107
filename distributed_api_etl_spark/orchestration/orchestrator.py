"""Pipeline orchestrator: config -> compiled plan -> batched execution.

Entry point parity with the reference (run_pipeline, orchestrator.py:246-261):
load/validate config, resolve source (catalog table XOR caller DataFrame),
normalize the id column to ``request_id``, prune to the columns the request
builder needs, then hand off to the batch engine.

Compile step: the validated pydantic tree is flattened to plain dicts —
the only thing that crosses the driver->executor pickle boundary. No
SparkSession, no sockets, no live tokens in the closure (SURVEY §7.4 #3).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_api_etl_spark.config.loader import load_config
from distributed_api_etl_spark.config.models import PipelineConfig, validate_dataframe
from distributed_api_etl_spark.orchestration.batch_handler import BronzeBatchHandler
from distributed_api_etl_spark.orchestration.batch_processor import (
    BatchProcessor,
    BatchRunStats,
)


@dataclass
class PipelineResult:
    stats: BatchRunStats
    bronze_df: DataFrame | None = None  # populated in dry-run mode


class PipelineOrchestrator:
    def __init__(self, spark: SparkSession, config: PipelineConfig) -> None:
        self.spark = spark
        self.config = config
        self._auth_runtime = None

    @classmethod
    def from_config(cls, spark: SparkSession, config: PipelineConfig | dict | str):
        if not isinstance(config, PipelineConfig):
            config = load_config(config)
        return cls(spark, config)

    # -- source resolution ---------------------------------------------------
    def _resolve_source(self, source_df: DataFrame | None, source_id: str | None) -> DataFrame:
        src_cfg = self.config.tables.source
        configured = src_cfg.full_name is not None or src_cfg.location is not None
        if (source_df is None) == (not configured):
            raise ValueError(
                "exactly one of tables.source.{name,location} or source_df required"
            )
        if source_df is not None:
            df = source_df
        elif src_cfg.location is not None:
            reader = self.spark.read.format(src_cfg.format)
            for k, v in src_cfg.options.items():
                reader = reader.option(k, v)
            df = reader.load(src_cfg.location)
        else:
            df = self.spark.table(src_cfg.full_name)
        id_col = source_id or src_cfg.id_column
        ok, errors = validate_dataframe(
            src_cfg.model_copy(update={"id_column": id_col}), df
        )
        if not ok:
            raise ValueError(f"source validation failed: {errors}")
        # column pruning: request_id + every column a mapping binds. At scale
        # this reaches the parquet scan as ReadSchema pruning.
        ep = self.config.endpoint
        needed = (
            {"request_id"}
            | {m.source_column for m in ep.param_mapping + ep.json_body_mapping}
            | ep.template_columns()
        )
        if id_col != "request_id":
            if id_col in needed:
                # A mapping/template binds the id column by its source name.
                # Keep it as a real column (request_id becomes a copy) so the
                # injector sees the value — renaming would silently send the
                # request without the parameter.
                df = df.withColumn("request_id", F.col(id_col))
            else:
                df = df.withColumnRenamed(id_col, "request_id")
        needed = [c for c in df.columns if c in needed | {"request_id"}]
        df = df.select(*needed).withColumn(
            "request_id", F.col("request_id").cast("string")
        )
        return df

    # -- compile -------------------------------------------------------------
    def compile(self, fixed_time: str | None = None) -> dict[str, Any]:
        cfg = self.config
        compiled: dict[str, Any] = {
            "endpoint": cfg.endpoint.model_dump(),
            "transport": cfg.transport.model_dump(),
            "retry": cfg.retry.model_dump(),
            "auth": cfg.auth.model_dump(),
            "middleware": [m.model_dump() for m in cfg.middleware],
            "execution": cfg.execution.model_dump(),
        }
        if fixed_time:
            compiled["fixed_time"] = fixed_time
        if self._auth_runtime is not None:
            compiled["auth"]["rpc_url"] = self._auth_runtime.rpc_url
            compiled["auth"]["rpc_secret"] = self._auth_runtime.rpc_secret
        return compiled

    # -- auth runtime (driver-side) -------------------------------------------
    def _start_auth_runtime(self) -> None:
        if self.config.auth.type in ("oauth2_client_credentials", "oauth2_password"):
            from distributed_api_etl_spark.auth.rpc import RpcBootstrapper

            auth = self.config.auth.model_dump()
            if not auth.get("rpc_bind_host"):
                # Bind where executors connect (reference parity: the token
                # service binds to spark.driver.host, never 0.0.0.0).
                try:
                    auth["rpc_bind_host"] = self.spark.conf.get("spark.driver.host")
                except Exception:  # noqa: BLE001 - conf key absent -> autodetect
                    pass
            self._auth_runtime = RpcBootstrapper(auth)
            self._auth_runtime.start()

    def _stop_auth_runtime(self) -> None:
        if self._auth_runtime is not None:
            self._auth_runtime.stop()
            self._auth_runtime = None

    # -- sink ----------------------------------------------------------------
    def _sink_dict(self) -> dict | None:
        sink = self.config.tables.sink
        if sink.name is None and sink.location is None:
            return None
        return sink.model_dump()

    def _sink_reader(self):
        sink = self._sink_dict()
        spark = self.spark

        def read() -> DataFrame | None:
            if sink is None:
                return None
            try:
                if sink.get("location"):
                    return spark.read.format(sink["format"]).load(sink["location"])
                return spark.table(sink["name"])
            except Exception:
                return None  # sink doesn't exist yet

        return read

    # -- run -----------------------------------------------------------------
    def run(
        self,
        source_df: DataFrame | None = None,
        source_id: str | None = None,
        dry_run: bool = False,
        fixed_time: str | None = None,
    ) -> PipelineResult:
        source = self._resolve_source(source_df, source_id)
        self._start_auth_runtime()
        try:
            compiled = self.compile(fixed_time=fixed_time)
            sink = None if dry_run else self._sink_dict()
            handler = BronzeBatchHandler(self.spark, compiled, sink)
            ex = self.config.execution
            processor = BatchProcessor(
                batch_size=ex.batch_size,
                num_partitions=ex.num_partitions,
                max_attempts=ex.max_attempts,
            )
            sink_reader = self._sink_reader() if not dry_run else (lambda: None)
            if dry_run:
                # single pass, no idempotency loop (nothing is persisted) —
                # but execution.num_partitions must still bind, exactly as in
                # BatchProcessor.process: without it a multi-partition source
                # would hand each partition its own process-scoped resources
                # (e.g. a fresh RateLimiter bucket), silently voiding
                # single-partition invariants (ADVICE r8 #1 / VERDICT r9 #2).
                total = source.count()
                todo, n = processor.assign_batches(source, total)
                parts = ex.num_partitions or n
                for b in range(n):
                    # batch_size caps the PARTITION count only as a
                    # proxy upper bound: one batch holds <= batch_size
                    # rows, so more partitions than rows is guaranteed
                    # dead weight; any configured num_partitions below
                    # that passes through unchanged
                    handler.process(
                        todo.where(F.col("batch_id") == b)
                        .drop("batch_id")
                        .repartition(min(parts, ex.batch_size))
                    )
                stats = BatchRunStats(
                    total_rows=total, processed_rows=total, attempts=1, batches_ok=n
                )
            else:
                stats = processor.process(source, handler.process, sink_reader)
            return PipelineResult(stats=stats, bronze_df=handler.result_df())
        finally:
            self._stop_auth_runtime()


def run_pipeline(
    spark: SparkSession,
    config: PipelineConfig | dict | str,
    source_df: DataFrame | None = None,
    source_id: str | None = None,
    dry_run: bool = False,
    fixed_time: str | None = None,
) -> PipelineResult:
    """Primary entry point (reference parity: orchestrator.run_pipeline)."""
    orch = PipelineOrchestrator.from_config(spark, config)
    return orch.run(
        source_df=source_df, source_id=source_id, dry_run=dry_run, fixed_time=fixed_time
    )


def generate_tracking_ids(
    spark: SparkSession, n: int, partitions: int | None = None
) -> DataFrame:
    """Synthesize a demo/test source of n unique tracking ids.

    Reference parity: ``spark.range(n).repartition(p).select(sha2(uuid(),
    256))`` (dags/scripts/run_demo_pipeline.py:62-70). Generation is
    distributed — ``range`` splits across the cluster and uuid() runs
    per-row on executors; no driver-side materialization.
    """
    df = spark.range(n)
    if partitions:
        df = df.repartition(partitions)
    return df.select(F.sha2(F.uuid(), 256).alias("tracking_id"))
