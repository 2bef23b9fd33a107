"""The bronze data contract, v2 — typed columns.

Same 15 logical columns as the reference's fixed bronze schema
(src/core/bronze.py:13-125) but with honest types instead of all-strings
(the fix SURVEY.md §1.3 calls for): int status_code/attempts, boolean
success, map<string,string> request headers/params. JSON-ish blobs
(metadata, response headers) stay JSON strings for schema stability; a
silver step can ``from_json`` them.

Column order here is the row-tuple order produced by
``RequestExchange.build_record`` — construction is by name into typed Rows,
not positional (the reference's positional alignment silently renamed
``json_body`` to ``body_text``; we don't reproduce that).
"""

from __future__ import annotations

from pyspark.sql import types as T

BRONZE_SCHEMA = T.StructType(
    [
        T.StructField("request_id", T.StringType(), False),
        T.StructField("row_hash", T.StringType(), True),
        T.StructField("url", T.StringType(), False),
        T.StructField("method", T.StringType(), False),
        T.StructField("request_headers", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("request_params", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("request_metadata", T.StringType(), True),
        T.StructField("status_code", T.IntegerType(), True),
        T.StructField("response_headers", T.StringType(), True),
        T.StructField("body_text", T.StringType(), True),
        T.StructField("success", T.BooleanType(), True),
        T.StructField("error_message", T.StringType(), True),
        T.StructField("attempts", T.IntegerType(), True),
        T.StructField("response_metadata", T.StringType(), True),
        T.StructField("_request_time", T.TimestampType(), False),
    ]
)

BRONZE_COLUMNS: tuple[str, ...] = tuple(f.name for f in BRONZE_SCHEMA.fields)
