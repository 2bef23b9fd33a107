from distributed_api_etl_spark.orchestration.orchestrator import (  # noqa: F401
    PipelineOrchestrator,
    PipelineResult,
    generate_tracking_ids,
    run_pipeline,
)
