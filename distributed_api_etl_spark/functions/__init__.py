from distributed_api_etl_spark.functions.portable import (  # noqa: F401
    PORTABLE_HASH_MOD,
    dec,
    portable_hash32,
    portable_hash32_sql,
)
from distributed_api_etl_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
)
from distributed_api_etl_spark.functions.textfns import (  # noqa: F401
    token_shingles,
    tokens,
)
