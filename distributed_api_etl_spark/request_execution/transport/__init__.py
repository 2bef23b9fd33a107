from distributed_api_etl_spark.request_execution.transport.base import (  # noqa: F401
    TransportEngine,
)
from distributed_api_etl_spark.request_execution.transport.registry import (  # noqa: F401
    build_engine,
)
