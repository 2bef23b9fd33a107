from distributed_api_etl_spark.request_execution.middleware.pipeline import (  # noqa: F401
    Middleware,
    MiddlewarePipeline,
    NextCall,
)
