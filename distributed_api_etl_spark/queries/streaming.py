"""Graded queries for the Structured Streaming operators.

Each runs a real streaming query (availableNow drain over the sf_dir
parquet) into a memory sink and returns the materialized result. With a
single input batch the stateful semantics collapse to SQL-expressible
aggregates, so even custom ``applyInPandasWithState`` operators get full
hash-match oracles (cross-micro-batch state behavior is covered by
tests/test_streaming.py with maxFilesPerTrigger=1).
"""

from __future__ import annotations

import itertools
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_api_etl_spark.queries.registry import (
    fan_out,
    normalize_events_ts,
    pin_events_confs,
    register,
    table,
)

_SINK_IDS = itertools.count()

#: Executed micro-batch physical plan of the most recent drain — the
#: plan-guard hook (tests/test_plan_guard.py): running a graded streaming
#: query through its REAL code path leaves the plan the state-store /
#: anti-pattern assertions inspect here. None until a drain completes.
LAST_EXECUTED_PLAN: str | None = None


def _stream_source(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """File-stream over one table (FileStreamSource requires a directory, so
    the single parquet file is symlinked into a temp dir).

    The dir is DETERMINISTIC per (sf basename, table) and reused across
    invocations — a fresh mkdtemp per call stranded a symlink dir every
    harness sweep across ~10 streaming heads (VERDICT r12). The symlink is
    re-pointed if a different absolute sf path maps to the same basename.
    """
    src_file = os.path.abspath(f"{sf_dir}/{name}.parquet")
    d = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_stream_src_{os.path.basename(sf_dir.rstrip('/'))}_{name}",
    )
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, f"{name}.parquet")
    if os.path.islink(link) and os.readlink(link) != src_file:
        os.remove(link)
    if not os.path.lexists(link):
        os.symlink(src_file, link)
    schema = spark.read.parquet(src_file).schema
    return spark.readStream.schema(schema).parquet(d)


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events file-stream with ``ts`` normalized to TIMESTAMP (LTZ; session
    tz pinned UTC so it equals the batch NTZ values) — dtype-driven, so the
    same code handles nanos-long, micros-LTZ, and micros-NTZ testdata."""
    pin_events_confs(spark)
    stream = _stream_source(spark, sf_dir, "events")
    return normalize_events_ts(stream, target="timestamp")


def _drain_to_memory(out: DataFrame, mode: str = "update") -> str:
    name = f"stream_sink_{next(_SINK_IDS)}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            f"streaming drain into {name!r} still running after 300s; "
            "refusing to grade a partial memory sink"
        )
    global LAST_EXECUTED_PLAN
    # lastExecution survives termination; failure to render must not fail
    # the graded query itself (the guard test asserts on the content).
    try:
        LAST_EXECUTED_PLAN = q._jsq.explainInternal(False)
    except Exception:
        LAST_EXECUTED_PLAN = None
    return name


@register(
    "streaming_stateful_dedup",
    oracle="""
    SELECT md5(text) AS fingerprint, min(doc_id) AS keep_id
    FROM documents
    GROUP BY md5(text)
    """,
    tags=("streaming", "dedup"),
)
def streaming_stateful_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch stateful exact dedup (applyInPandasWithState) — single
    input batch, so keep_id == global min doc_id (the SQL oracle)."""
    from distributed_api_etl_spark.streaming import streaming_exact_dedup

    stream = _stream_source(spark, sf_dir, "documents")
    name = _drain_to_memory(streaming_exact_dedup(stream))
    return spark.table(name)


@register(
    "streaming_user_event_counts",
    oracle="""
    SELECT CAST(user_id AS VARCHAR) AS user_id,
           count(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
    tags=("streaming",),
)
def streaming_user_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user totals (applyInPandasWithState); counts only in the
    graded projection (double sums are fold-order-dependent across engines)."""
    from distributed_api_etl_spark.streaming import stateful_user_totals

    stream = _events_stream(spark, sf_dir)
    out = stateful_user_totals(stream)
    name = _drain_to_memory(out)
    return spark.table(name).select("user_id", "n_events")


@register(
    "streaming_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           count(*) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming",),
)
def streaming_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window aggregation executed as a real stream
    (complete mode over one drain == the batch window aggregation)."""
    from distributed_api_etl_spark.streaming import tumbling_window_stream

    stream = _events_stream(spark, sf_dir)
    out = tumbling_window_stream(stream, ts_col="ts")
    name = _drain_to_memory(out, mode="complete")
    return (
        spark.table(name)
        .select(
            F.col("window_start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


SESSION_GAP_MS = 30 * 60 * 1000


@register(
    "streaming_sessionize",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts,
             lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
      FROM events
    ),
    flagged AS (
      SELECT user_id, ts,
             CASE WHEN prev_ms IS NULL OR epoch_ms(ts) - prev_ms >= {SESSION_GAP_MS}
                  THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ),
    sessions AS (
      SELECT user_id, ts,
             CAST(sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      FROM flagged
    )
    SELECT user_id,
           CAST(epoch_ms(min(ts)) AS BIGINT) AS session_start_ms,
           CAST(epoch_ms(max(ts)) + {SESSION_GAP_MS} AS BIGINT) AS session_end_ms,
           count(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_seq
    HAVING CAST(epoch_ms(max(ts)) + {SESSION_GAP_MS} AS BIGINT)
           <= (SELECT max(epoch_ms(ts)) FROM events)
    """,
    tags=("streaming",),
)
def streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window sessions as a real watermarked APPEND-mode
    stream — the graded rows are exactly the sessions the zero-delay
    watermark finalized (end <= max event time), so the oracle's HAVING
    clause mirrors real watermark eviction, not a batch shortcut. Session
    semantics: delta < gap extends, delta >= gap opens a new session (the
    boundary differs from batch events_sessionize, whose test is
    delta > gap); end = last event + gap; bounds as exact epoch millis.
    Still-open tail sessions stay in state (they'd emit on the next
    micro-batch past the watermark) — cross-batch behavior is covered in
    tests/test_streaming.py."""
    from distributed_api_etl_spark.streaming import sessionized_stream

    stream = _events_stream(spark, sf_dir)
    out = sessionized_stream(stream, gap="30 minutes", watermark="0 seconds", ts_col="ts")
    name = _drain_to_memory(out, mode="append")
    return spark.table(name).select(
        "user_id",
        F.unix_millis(F.col("session_start")).alias("session_start_ms"),
        F.unix_millis(F.col("session_end")).alias("session_end_ms"),
        "n_events",
    )


@register(
    "streaming_click_purchase_join",
    oracle="""
    SELECT a.user_id,
           a.event_id AS left_id,
           b.event_id AS right_id,
           CAST(epoch_ms(b.ts) - epoch_ms(a.ts) AS BIGINT) AS delay_ms
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'click' AND b.event_type = 'purchase'
     AND b.ts >= a.ts
     AND b.ts <= a.ts + INTERVAL '1 hour'
    """,
    tags=("streaming", "join"),
)
def streaming_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (click -> purchase attribution within
    1 h) as a real append-mode streaming query. Inner interval joins emit
    on match, so one availableNow drain equals the batch interval join —
    the SQL oracle; watermark-driven state eviction across micro-batches
    is covered in tests/test_streaming.py."""
    from distributed_api_etl_spark.streaming import interval_join_stream

    stream = _events_stream(spark, sf_dir)
    out = interval_join_stream(
        stream.where(F.col("event_type") == "click"),
        stream.where(F.col("event_type") == "purchase"),
        key_col="user_id",
        ts_col="ts",
        max_delay="1 hour",
    )
    name = _drain_to_memory(out, mode="append")
    return spark.table(name)


@register(
    "streaming_dedup_within_watermark",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
    tags=("streaming", "dedup"),
)
def streaming_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``dropDuplicatesWithinWatermark`` on (user_id, event_type):
    bounded-state streaming dedup (state evicted once the watermark passes a
    key's last event). Only the key columns are projected, so the emitted
    set equals SELECT DISTINCT regardless of which physical row arrived
    first; cross-batch eviction behavior is exercised in
    tests/test_streaming.py. The graded projection distincts the drained
    sink: dropDuplicatesWithinWatermark re-emits a key seen again after its
    state was watermark-evicted (by design — bounded state), so the raw sink
    equals SELECT DISTINCT only per state-retention window. Distinct on
    read-back keeps the oracle batch-layout-independent."""
    from distributed_api_etl_spark.streaming import watermark_dedup_stream

    stream = _events_stream(spark, sf_dir)
    out = watermark_dedup_stream(stream, ["user_id", "event_type"], ts_col="ts")
    name = _drain_to_memory(out, mode="append")
    return spark.table(name).distinct()


@register(
    "streaming_static_enrich",
    oracle="""
    WITH dim AS (
      SELECT event_type, count(*) AS type_count FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.user_id, e.event_type, d.type_count
    FROM events e JOIN dim d USING (event_type)
    """,
    tags=("streaming", "join"),
)
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the streaming events enrich against a STATIC
    batch dimension (per-type totals precomputed from the batch table).
    Stream-static inner joins are stateless — each micro-batch joins
    against the static side as-of that batch, no watermark or join state
    needed; with a small dim Spark broadcasts it into every micro-batch
    (the canonical streaming-enrichment plan at any scale)."""
    from distributed_api_etl_spark.queries.registry import table

    static_dim = (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("type_count"))
    )
    stream = _events_stream(spark, sf_dir)
    out = stream.select("event_id", "user_id", "event_type").join(
        F.broadcast(static_dim), "event_type"
    ).select("event_id", "user_id", "event_type", "type_count")
    name = _drain_to_memory(out, mode="append")
    return spark.table(name)


@register(
    "streaming_click_purchase_left_outer",
    oracle="""
    WITH wm AS (SELECT least(
          (SELECT max(ts) FROM events WHERE event_type = 'click'),
          (SELECT max(ts) FROM events WHERE event_type = 'purchase')) AS w),
    matched AS (
      SELECT a.user_id, a.event_id AS left_id, b.event_id AS right_id,
             CAST(epoch_ms(b.ts) - epoch_ms(a.ts) AS BIGINT) AS delay_ms
      FROM events a JOIN events b
        ON a.user_id = b.user_id
       AND a.event_type = 'click' AND b.event_type = 'purchase'
       AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL '1 hour'),
    unmatched AS (
      SELECT a.user_id, a.event_id AS left_id,
             CAST(NULL AS BIGINT) AS right_id,
             CAST(NULL AS BIGINT) AS delay_ms
      FROM events a
      WHERE a.event_type = 'click'
        AND a.ts + INTERVAL '1 hour' < (SELECT w FROM wm)
        AND NOT EXISTS (
          SELECT 1 FROM events b
          WHERE b.user_id = a.user_id AND b.event_type = 'purchase'
            AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL '1 hour'))
    SELECT * FROM matched UNION ALL SELECT * FROM unmatched
    """,
    tags=("streaming", "join"),
)
def streaming_click_purchase_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join: clicks with no purchase
    within 1 h emit null-matched once the watermark passes their window.

    The oracle mirrors Spark's eviction semantics exactly (determined
    empirically, tests/test_streaming.py): the final watermark of an
    availableNow drain is min(max click ts, max purchase ts) (each side's
    withWatermark sees only its filtered rows), a trailing no-data batch
    runs the eviction, and a click emits null-matched iff
    ``click.ts + 1h < watermark`` STRICTLY. Clicks whose window is still
    open stay in state — bounded-state semantics, not a batch left join.
    """
    from distributed_api_etl_spark.streaming import interval_join_stream

    stream = _events_stream(spark, sf_dir)
    out = interval_join_stream(
        stream.where(F.col("event_type") == "click"),
        stream.where(F.col("event_type") == "purchase"),
        key_col="user_id",
        ts_col="ts",
        max_delay="1 hour",
        watermark="0 seconds",
        how="leftOuter",
    )
    name = _drain_to_memory(out, mode="append")
    return spark.table(name)


@register(
    "streaming_hll_user_cardinality",
    oracle=None,  # patched below: reuse the batch HLL oracle (same registers)
    tags=("streaming", "sketch"),
)
def streaming_hll_user_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state streaming distinct-count: per-type HLL registers held
    as applyInPandasWithState state (a FIXED 256 ints per group forever —
    the only formulation that survives an unbounded stream; plain
    streaming count(DISTINCT) state grows with the keys). The cross-batch
    update is the sketch merge algebra (element-wise register max), so the
    drained state equals the batch sketch EXACTLY and the batch HLL oracle
    grades it; multi-batch behavior is pinned in tests/test_streaming.py."""
    from distributed_api_etl_spark.operators.sketch import hll_estimate
    from distributed_api_etl_spark.streaming import streaming_hll_distinct

    stream = _events_stream(spark, sf_dir)
    out = streaming_hll_distinct(stream, group_col="event_type", key_col="user_id")
    name = _drain_to_memory(out, mode="update")
    regs = (
        spark.table(name)
        .groupBy(F.col("g").alias("event_type"), "bucket")
        .agg(F.max("max_rho").alias("max_rho"))
        .where(F.col("max_rho") > 0)
    )
    return hll_estimate(regs, ["event_type"])


from dataclasses import replace as _dc_replace  # noqa: E402

from distributed_api_etl_spark.operators.sketch import hll_oracle_sql as _hll_sql  # noqa: E402
from distributed_api_etl_spark.queries.registry import REGISTRY as _REG  # noqa: E402

_REG["streaming_hll_user_cardinality"] = _dc_replace(
    _REG["streaming_hll_user_cardinality"],
    oracle=_hll_sql("user_id", "events", "event_type"),
)


def _streaming_ann_oracle_sql() -> str:
    from distributed_api_etl_spark.queries.similarity import (
        _QUANT_CTES,
        _int8_serving_tail_sql,
        IVF_CENTROIDS,
        IVF_K,
        IVF_NPROBE_SERVE,
        K_CAND_IVF,
        STREAM_ANN_QUERY_HI,
        STREAM_ANN_QUERY_LO,
    )

    return f"""
    WITH {_QUANT_CTES},
    qcent AS (SELECT vec_id AS centroid_id, qvec AS cq FROM quant
              WHERE vec_id < {IVF_CENTROIDS}),
    {_int8_serving_tail_sql(STREAM_ANN_QUERY_LO, STREAM_ANN_QUERY_HI,
                            IVF_NPROBE_SERVE, K_CAND_IVF, IVF_K)}
    """


@register(
    "streaming_ann_index_append",
    oracle=_streaming_ann_oracle_sql(),
    tags=("streaming", "similarity", "quantization", "sink", "partitioning"),
)
def streaming_ann_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING index maintenance for the IVF+int8 serving path: the base
    index is built in batch over vec_id < INGEST_SPLIT and stored
    partitionBy(centroid_id); the remainder of the corpus ARRIVES AS A
    STREAM (file source) and a foreachBatch sink quantizes + assigns each
    micro-batch against the FROZEN centroid table
    (operators/similarity.py:assign_to_ivf_int8_index) and appends it to
    the partitioned layout — the standing index is never re-read, and
    per-row assignment makes the final layout independent of how the
    stream was batched. Serving then runs over the union. The oracle is
    the from-scratch batch REBUILD over the full corpus, so a green row
    certifies stream-append == rebuild end-to-end: the production shape
    where an embedding pipeline continuously feeds a vector index while
    the router keeps serving. Composes the graded streaming family
    (availableNow drain, tests/test_streaming.py patterns) with the
    graded ANN serving stack."""
    import shutil

    from distributed_api_etl_spark.operators import similarity as S
    from distributed_api_etl_spark.queries.similarity import (
        INGEST_SPLIT,
        IVF_CENTROIDS,
        IVF_K,
        IVF_NPROBE_SERVE,
        K_CAND_IVF,
        STREAM_ANN_QUERY_HI,
        STREAM_ANN_QUERY_LO,
    )

    emb = fan_out(table(spark, sf_dir, "embeddings"))
    queries = emb.where(
        (F.col("vec_id") >= STREAM_ANN_QUERY_LO)
        & (F.col("vec_id") < STREAM_ANN_QUERY_HI)
    ).select("vec_id")
    index0, cents = S.build_ivf_int8_index(
        emb.where(F.col("vec_id") < INGEST_SPLIT),
        "vec_id",
        "embedding",
        IVF_CENTROIDS,
    )
    out = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_ivf_stream_index_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    # batch half: overwrite resets the deterministic dir on re-entry
    index0.write.mode("overwrite").partitionBy("centroid_id").parquet(out)

    # streaming half: every arriving batch is assigned against the frozen
    # centroids and appended; a FRESH checkpoint each run so the drain
    # re-processes the (re-symlinked) source after the overwrite reset
    stream = _stream_source(spark, sf_dir, "embeddings").where(
        F.col("vec_id") >= INGEST_SPLIT
    )

    def _append_batch(batch_df: DataFrame, _batch_id: int) -> None:
        S.assign_to_ivf_int8_index(
            batch_df, cents, "vec_id", "embedding"
        ).write.mode("append").partitionBy("centroid_id").parquet(out)

    ckpt = tempfile.mkdtemp(prefix="ann_stream_ckpt_")
    try:
        q = (
            stream.writeStream.foreachBatch(_append_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "streaming index append still running after 300s; refusing "
                "to serve from a partially-appended layout"
            )
        global LAST_EXECUTED_PLAN
        try:
            LAST_EXECUTED_PLAN = q._jsq.explainInternal(False)
        except Exception:
            LAST_EXECUTED_PLAN = None
    finally:
        # the checkpoint exists only to let THIS drain complete; serving
        # reads the index dir, so the checkpoint is droppable immediately
        # (and must not survive to suppress the next run's re-append)
        shutil.rmtree(ckpt, ignore_errors=True)

    stored = spark.read.parquet(out)
    return S.ivf_int8_topk_from_index(
        stored,
        cents,
        emb,
        queries,
        "vec_id",
        "embedding",
        IVF_K,
        K_CAND_IVF,
        nprobe=IVF_NPROBE_SERVE,
        prune_partitions=True,
    )


def _token_budget_oracle_shared() -> str:
    from distributed_api_etl_spark.queries.text import _token_budget_oracle

    return _token_budget_oracle()


@register(
    "streaming_token_budget_admission",
    oracle=_token_budget_oracle_shared(),
    tags=("streaming", "sampling"),
)
def streaming_token_budget_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifetime token-budget admission as a STATEFUL STREAM
    (streaming/stateful.py:streaming_token_budget_admission): per-language
    admitted-token totals live in applyInPandasWithState state, so the
    budget is a hard cap over every micro-batch the stream will ever see
    — the continuous-ingest form of documents_token_budget_mix (license /
    contamination caps that must hold across days of ingest, not per
    job). A single availableNow batch collapses to the batch operator
    exactly — same budgets, same priority order, same strict-prefix
    semantics — so this head shares the batch head's oracle verbatim;
    cross-batch behavior (arrival order governs between batches, first
    rejection closes the group) is pinned by
    tests/test_streaming.py:test_streaming_token_budget_across_batches.
    State is two scalars per group — O(languages), not O(docs)."""
    from distributed_api_etl_spark.queries.text import (
        TOKEN_BUDGET_DEFAULT,
        TOKEN_BUDGET_SEED,
        TOKEN_BUDGETS,
    )
    from distributed_api_etl_spark.streaming.stateful import (
        streaming_token_budget_admission as op,
    )

    stream = _stream_source(spark, sf_dir, "documents")
    with_tok = stream.select(
        "doc_id",
        "lang",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    out = op(
        with_tok,
        "doc_id",
        "lang",
        "n_tokens",
        TOKEN_BUDGETS,
        TOKEN_BUDGET_DEFAULT,
        seed=TOKEN_BUDGET_SEED,
    )
    name = _drain_to_memory(out)
    return spark.table(name).select(
        "doc_id", F.col("grp").alias("lang"), "n_tokens", "cum_tokens"
    )


def _streaming_recipe_oracle() -> str:
    from distributed_api_etl_spark.queries.curation import (
        _training_recipe_oracle_sql,
    )

    return _training_recipe_oracle_sql()


@register(
    "streaming_training_recipe",
    oracle=_streaming_recipe_oracle(),
    # bench-tracked (VERDICT r15 #2): the suite's costliest plan (~43 s
    # sf0.1 drain, SCALE.md r15) — the one most in need of a trend line
    bench=True,
    tags=("streaming", "dedup", "text", "ml", "pipeline", "sampling", "packing"),
)
def streaming_training_recipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training recipe under CONTINUOUS INGEST
    (streaming/recipe.py): documents arrive as a file stream; foreachBatch
    runs gates -> incremental near-dup vs the standing keeper store ->
    infinite-prior passage dedup -> cluster-keyed split -> mixture rates ->
    lifetime token-budget admission -> epoch shards -> cross-batch pack
    offsets, appending each batch's admitted documents to a manifest. The
    oracle is the BATCH recipe replay (documents_training_recipe's SQL
    verbatim), so a green row certifies stream==batch for the whole chain —
    the append==rebuild argument streaming_ann_index_append makes for the
    vector index, made for the data recipe (the last composition seam
    VERDICT r14 #2 named). Multi-batch arrival (maxFilesPerTrigger=1:
    standing-wins dedup, budget closure across batches, contiguous pack
    offsets) is pinned by tests/test_streaming.py — as is the production
    contract the graded drain alone cannot show (round 16): the store is
    exactly-once per batch_id (batch-keyed idempotent overwrites,
    committed-only reads, one atomic commit marker), proven under
    same-batch redelivery, crash-before-commit redo, a REAL
    checkpoint restart with engine-level re-delivery, and mid-stream
    compaction (compaction == no-op).

    Same constants as the batch head: MIX_RATES mixture, RECIPE_BUDGETS
    exact budgets, RECIPE_SHARDS epoch shards, 256-token packs."""
    from distributed_api_etl_spark.queries.curation import (
        RECIPE_BUDGET_DEFAULT,
        RECIPE_BUDGET_SEED,
        RECIPE_BUDGETS,
        RECIPE_PACK_BUDGET,
        RECIPE_SHARD_SEED,
        RECIPE_SHARDS,
    )
    from distributed_api_etl_spark.queries.dedup import (
        PASSAGE_MIN_DF,
        PASSAGE_TOKENS,
    )
    from distributed_api_etl_spark.queries.text import MIX_DEFAULT, MIX_RATES
    from distributed_api_etl_spark.streaming.recipe import (
        RecipeConfig,
        run_streaming_training_recipe,
    )

    stream = _stream_source(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    cfg = RecipeConfig(
        mix_rates=MIX_RATES,
        mix_default=MIX_DEFAULT,
        budgets=RECIPE_BUDGETS,
        budget_default=RECIPE_BUDGET_DEFAULT,
        budget_seed=RECIPE_BUDGET_SEED,
        n_shards=RECIPE_SHARDS,
        shard_seed=RECIPE_SHARD_SEED,
        pack_budget=RECIPE_PACK_BUDGET,
        passage_tokens=PASSAGE_TOKENS,
        passage_min_df=PASSAGE_MIN_DF,
    )
    store_dir = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_recipe_stream_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    manifest, plan = run_streaming_training_recipe(spark, stream, store_dir, cfg)
    global LAST_EXECUTED_PLAN
    # unconditional (None on failure), matching every other streaming head:
    # keeping a stale plan here would let the plan-guard tests assert
    # against a DIFFERENT query's executed plan (ADVICE r15)
    LAST_EXECUTED_PLAN = plan
    return manifest.select(
        "doc_id",
        "lang",
        "n_tokens",
        "cum_tokens",
        "shard",
        "sort_key",
        "pack_id",
        "pack_offset",
    )


@register(
    "streaming_recipe_crash_recovery",
    oracle=_streaming_recipe_oracle(),
    tags=("streaming", "dedup", "text", "ml", "pipeline", "sampling", "packing"),
)
def streaming_recipe_crash_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming recipe's EXACTLY-ONCE recovery contract under the
    driver's hash gate (round 16): the foreachBatch sink crashes AFTER
    batch 0's store commit but BEFORE the checkpoint records it — the
    widest at-least-once window — the stream is restarted on the same
    checkpoint + store, Structured Streaming re-delivers batch 0, and
    the RecipeStore's high-water mark makes the replay a no-op
    (streaming/recipe.py module doc: batch-keyed idempotent overwrites,
    committed-only reads, one atomic commit marker written last). The
    oracle is the SAME batch-recipe replay SQL as
    streaming_training_recipe, so a green row proves crash +
    engine-level redelivery + restart converge to the crash-free batch
    result row-for-row — the resume==oneshot argument
    (backfill_resume_equals_oneshot) at the micro-batch grain. The
    runner asserts the crash actually fired post-commit, so a
    silently-not-exercised recovery path cannot grade green."""
    from distributed_api_etl_spark.queries.curation import (
        RECIPE_BUDGET_DEFAULT,
        RECIPE_BUDGET_SEED,
        RECIPE_BUDGETS,
        RECIPE_PACK_BUDGET,
        RECIPE_SHARD_SEED,
        RECIPE_SHARDS,
    )
    from distributed_api_etl_spark.queries.dedup import (
        PASSAGE_MIN_DF,
        PASSAGE_TOKENS,
    )
    from distributed_api_etl_spark.queries.text import MIX_DEFAULT, MIX_RATES
    from distributed_api_etl_spark.streaming.recipe import (
        RecipeConfig,
        run_streaming_training_recipe,
    )

    stream = _stream_source(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    cfg = RecipeConfig(
        mix_rates=MIX_RATES,
        mix_default=MIX_DEFAULT,
        budgets=RECIPE_BUDGETS,
        budget_default=RECIPE_BUDGET_DEFAULT,
        budget_seed=RECIPE_BUDGET_SEED,
        n_shards=RECIPE_SHARDS,
        shard_seed=RECIPE_SHARD_SEED,
        pack_budget=RECIPE_PACK_BUDGET,
        passage_tokens=PASSAGE_TOKENS,
        passage_min_df=PASSAGE_MIN_DF,
    )
    store_dir = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_recipe_crashrec_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    manifest, plan = run_streaming_training_recipe(
        spark, stream, store_dir, cfg, crash_after_batch=0
    )
    global LAST_EXECUTED_PLAN
    LAST_EXECUTED_PLAN = plan
    return manifest.select(
        "doc_id",
        "lang",
        "n_tokens",
        "cum_tokens",
        "shard",
        "sort_key",
        "pack_id",
        "pack_offset",
    )
