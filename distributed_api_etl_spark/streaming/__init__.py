from distributed_api_etl_spark.streaming.pipeline import (  # noqa: F401
    run_streaming_pipeline,
)
from distributed_api_etl_spark.streaming.windows import (  # noqa: F401
    interval_join_stream,
    sessionized_stream,
    tumbling_window_stream,
    watermark_dedup_stream,
)
from distributed_api_etl_spark.streaming.stateful import (  # noqa: F401
    stateful_user_totals,
    streaming_exact_dedup,
    streaming_hll_distinct,
)
from distributed_api_etl_spark.streaming.recipe import (  # noqa: F401
    RecipeConfig,
    RecipeStore,
    process_recipe_batch,
    run_streaming_training_recipe,
)
