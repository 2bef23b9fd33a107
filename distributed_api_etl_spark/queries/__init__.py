from distributed_api_etl_spark.queries.registry import (  # noqa: F401
    REGISTRY,
    QuerySpec,
    load_all,
    register,
    table,
)
