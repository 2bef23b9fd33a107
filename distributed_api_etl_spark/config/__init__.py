from distributed_api_etl_spark.config.models import (  # noqa: F401
    AuthConfig,
    ColumnSchema,
    DataType,
    EndpointConfig,
    ExecutionConfig,
    PipelineConfig,
    RetryConfig,
    SinkConfig,
    SourceTableConfig,
    TableSchema,
    TablesConfig,
    TransportConfig,
)
from distributed_api_etl_spark.config.loader import load_config  # noqa: F401
