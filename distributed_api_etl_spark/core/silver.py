"""Silver-layer extraction: typed columns out of bronze ``body_text``.

The reference declares ``EndpointConfigModel.response_schema`` but never
consumes it (src/config/models/endpoint.py:15-16 — validate-only surface);
here it drives a real Spark-native parse stage: ``from_json(body_text,
declared_struct)`` on successful bronze rows, flattened to one typed column
per declared field.

100 TB notes: ``from_json`` is a Catalyst expression — the parse runs
JVM-side inside whole-stage codegen, no Python. Malformed bodies yield NULL
fields (PERMISSIVE), surfaced via the ``_parse_ok`` flag rather than failing
the job; route ``_parse_ok = false`` rows to a quarantine sink at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from distributed_api_etl_spark.config.models import TableSchema


def silver_extract(
    bronze_df: DataFrame,
    response_schema: TableSchema | dict,
    *,
    only_success: bool = True,
    keep_columns: tuple[str, ...] = ("request_id",),
) -> DataFrame:
    """bronze -> silver: parse ``body_text`` with the declared schema.

    Returns ``keep_columns`` + one typed column per declared response field
    + ``_parse_ok`` (body was valid JSON with at least one declared field).
    """
    if isinstance(response_schema, dict):
        response_schema = TableSchema.model_validate(response_schema)
    struct = response_schema.to_spark_schema()
    parsed: Column = F.from_json(F.col("body_text"), struct)
    df = bronze_df
    if only_success and "success" in df.columns:
        df = df.where(F.col("success") == F.lit(True))
    out = df.withColumn("_parsed", parsed)
    fields = [
        F.col(f"_parsed.{c.name}").alias(c.name) for c in response_schema.columns
    ]
    any_field = F.greatest(
        *[F.col(f"_parsed.{c.name}").isNotNull() for c in response_schema.columns]
    ) if len(response_schema.columns) > 1 else F.col(
        f"_parsed.{response_schema.columns[0].name}"
    ).isNotNull()
    return out.select(
        *[F.col(c) for c in keep_columns if c in bronze_df.columns],
        *fields,
        any_field.alias("_parse_ok"),
    )
