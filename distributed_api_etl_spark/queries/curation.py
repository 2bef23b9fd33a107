"""The composed corpus-curation pipeline as ONE graded query.

Round 6 shipped the stages (Gopher gate, MinHash near-dup keep-set,
passage-level exact dedup, leakage-safe split) as individually graded
queries plus a demo script — and the ONE bug the round produced was in
their COMPOSITION (passage cleaning ran before near-dup removal, so exact
duplicates were stripped to empty husks that no longer near-dup-matched
anything, and the husks shipped). That bug was caught only by code
review. This module pins the composition order under the driver's oracle
gate the same way test_plan_guard pins plans: the end-to-end result —
which documents survive, with what cleaned text, in which split — is
hash-compared against a DuckDB oracle built from the SAME per-stage CTE
fragments the individually graded queries already verify.

Stage order (the contract): near-dup detection reads RAW gated text;
destructive passage cleaning applies to KEEPERS only; the split keys on
the near-dup cluster id so near-duplicates can never straddle splits; a
keeper whose every passage is boilerplate (kept_passages = 0) is dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_api_etl_spark.functions.portable import portable_hash32_sql
from distributed_api_etl_spark.operators import dedup as D
from distributed_api_etl_spark.queries.dedup import (
    PAIRS_CTE,
    PASSAGE_MIN_DF,
    PASSAGE_TOKENS,
    _lsh_cand_sql,
    _minhash_sig_sql,
    passage_ctes,
    shingle_ctes,
)
from distributed_api_etl_spark.queries.registry import fan_out, register, table
from distributed_api_etl_spark.queries.text import (
    _gopher_oracle_sql,
    _gopher_repetition_oracle_sql,
)


def _curation_oracle_sql() -> str:
    """One WITH RECURSIVE composing the per-stage oracle fragments:
    gopher gate (nested subquery over the graded gopher oracle) ->
    shingle/MinHash/LSH/verified pairs over the GATED set -> recursive-CTE
    connected components -> keepers -> passage dedup of keepers ->
    husk drop -> cluster-keyed split hash."""
    return f"""
    WITH RECURSIVE gated AS (
      SELECT d.doc_id, d.text
      FROM documents d
      JOIN (SELECT doc_id FROM ({_gopher_oracle_sql()}) WHERE keep) g
        USING (doc_id)
      JOIN (SELECT doc_id
            FROM ({_gopher_repetition_oracle_sql(constructed=False)})
            WHERE keep) r
        USING (doc_id)
    ),
    {shingle_ctes('gated')},
    {_minhash_sig_sql()},
    {_lsh_cand_sql()},
    {PAIRS_CTE},
    dup_pairs AS (
      SELECT p.d1, p.d2
      FROM pairs p
      JOIN cands c ON c.d1 = p.d1 AND c.d2 = p.d2
      JOIN sizes s1 ON s1.doc_id = p.d1
      JOIN sizes s2 ON s2.doc_id = p.d2
      WHERE 100 * p.inter >= 70 * (s1.sz + s2.sz - p.inter)
    ),
    sym AS (SELECT d1 AS a, d2 AS b FROM dup_pairs
            UNION SELECT d2, d1 FROM dup_pairs),
    reach(v, w) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM sym)
      UNION
      SELECT r.v, s.b FROM reach r JOIN sym s ON r.w = s.a
    ),
    comp AS (SELECT v AS doc_id, min(w) AS cluster_id FROM reach GROUP BY v),
    keepers AS (
      SELECT g.doc_id, g.text,
             COALESCE(c.cluster_id, g.doc_id) AS cluster_id
      FROM gated g LEFT JOIN comp c ON c.doc_id = g.doc_id
      WHERE COALESCE(c.cluster_id, g.doc_id) = g.doc_id
    ),
    {passage_ctes('keepers', 'p')},
    final AS (
      SELECT k.doc_id, k.cluster_id,
             a.n_passages, a.kept_passages, a.cleaned_text
      FROM keepers k JOIN pagg a USING (doc_id)
      WHERE a.kept_passages > 0
    )
    SELECT doc_id, cluster_id,
           CASE WHEN h < 80 THEN 'train'
                WHEN h < 90 THEN 'val'
                ELSE 'test' END AS split,
           n_passages, kept_passages, cleaned_text
    FROM (
      SELECT *,
             {portable_hash32_sql("'split:' || CAST(cluster_id AS VARCHAR)")}
               % 100 AS h
      FROM final
    )
    """


@register(
    "documents_curation_pipeline",
    oracle=_curation_oracle_sql(),
    bench=True,
    tags=("dedup", "text", "ml", "pipeline"),
)
def documents_curation_pipeline(
    spark: SparkSession, sf_dir: str, repetition_gate: bool = True
) -> DataFrame:
    """End-to-end curation: gopher gate -> MinHash/LSH near-dup keep-set
    (on RAW gated text) -> passage-level exact dedup of the keepers ->
    husk drop -> leakage-safe split keyed on the near-dup cluster id.
    Mirrors scripts/curation_demo.py's composition and pins its
    stage-order contract (VERDICT r6 #1) under the driver's hash gate.

    100 TB shape: every stage is the already-benchmarked operator — the
    gate is a zero-shuffle scan, near-dup candidates are band-bucketed
    (never all-pairs), the passage pass shuffles only 16-byte
    fingerprints, and the split is a map-side hash. The composition adds
    only the keeper semi-join between stages; its shuffle counter
    decomposes into the per-stage counters already in BENCH history.

    ``repetition_gate=True`` (the default — GRADED in composition since
    r13, closing VERDICT r12 #5) also applies the Gopher REPETITION rules
    (graded standalone as documents_gopher_repetition_flags) over the RAW
    text, FUSED with the quality rules into one corpus scan
    (operators/text.py:gopher_combined_gate — the quality base folds ride
    the repetition chain's cached arrays projection, so the combined gate
    costs one text read, no keep-set join); the oracle composes the
    raw-text variant of the repetition fragment
    (_gopher_repetition_oracle_sql(constructed=False)).
    """
    from distributed_api_etl_spark.operators.graph import dedup_cluster_assignment
    from distributed_api_etl_spark.operators.sampling import leakage_safe_split
    from distributed_api_etl_spark.operators.text import (
        gopher_combined_gate,
        gopher_quality_flags,
    )
    from distributed_api_etl_spark.session import scoped_persist

    docs = fan_out(table(spark, sf_dir, "documents"))
    # cheapest gate first; gated feeds BOTH the shingle pass and the
    # keeper join, so one small cache saves a second parquet scan + gate.
    # With the repetition gate on, BOTH rule families run fused in ONE
    # text scan (gopher_combined_gate) that CARRIES the text through —
    # no second scan AND no join back onto the corpus for the gated rows
    if repetition_gate:
        gated = scoped_persist(
            gopher_combined_gate(docs, "doc_id", "text", carry=("text",))
            .where("keep")
            .select("doc_id", "text")
        )
    else:
        gate_ids = (
            gopher_quality_flags(docs, "doc_id", "text")
            .where("keep")
            .select("doc_id")
        )
        gated = scoped_persist(
            docs.join(gate_ids, "doc_id").select("doc_id", "text")
        )
    pairs = D.minhash_lsh_pairs(gated, "doc_id", "text", 3, 70).select("d1", "d2")
    # label propagation, not star contraction: verified >=70%-Jaccard dup
    # graphs are near-cliques (diameter 2-4), where min-label propagation
    # converges in diameter rounds at ~2 shuffles each vs two_phase's two
    # star passes + distinct per round (measured r16: 1.4s vs 4.0s on the
    # graded corpus, identical labels — the algorithms are property-tested
    # equal; two_phase remains the long-chain escape hatch and keeps its
    # own graded head).
    clusters = dedup_cluster_assignment(
        pairs, gated.select("doc_id"), "doc_id", algorithm="label_propagation"
    )
    keepers = gated.join(
        clusters.where("is_keep").select("doc_id", "cluster_id"), "doc_id"
    )
    cleaned = D.passage_exact_dedup(
        keepers.select("doc_id", "text"),
        "doc_id",
        "text",
        passage_tokens=PASSAGE_TOKENS,
        min_df=PASSAGE_MIN_DF,
    )
    survivors = keepers.select("doc_id", "cluster_id").join(
        cleaned.where("kept_passages > 0"), "doc_id"
    )
    return leakage_safe_split(survivors, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "split",
        "n_passages",
        "kept_passages",
        "cleaned_text",
    )


CURATION_BUDGETS = {"en": 500, "zh": 300, "es": 200}
CURATION_BUDGET_DEFAULT = 150
CURATION_BUDGET_SEED = "curation"


def _train_with_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curated TRAIN split as ``(doc_id, lang, n_tokens)`` — the shared
    entry frame of every downstream budgeting/mixing stage. One definition
    so the graded token-count semantics (whitespace tokens of the CLEANED
    text, language from the source table) cannot drift between the
    budgeted head and the recipe head."""
    from distributed_api_etl_spark.functions.textfns import tokens

    docs = fan_out(table(spark, sf_dir, "documents"))
    pipe = documents_curation_pipeline(spark, sf_dir)
    return (
        pipe.where(F.col("split") == "train")
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id",
            "lang",
            F.size(tokens(F.col("cleaned_text"))).cast("bigint").alias("n_tokens"),
        )
    )


def _curation_budget_oracle_sql() -> str:
    """The curation oracle nested as a derived table, then the token-budget
    fragment (the documents_token_budget_mix oracle shape) over the TRAIN
    split's CLEANED text."""
    case = " ".join(f"WHEN '{k}' THEN {v}" for k, v in CURATION_BUDGETS.items())
    pri = portable_hash32_sql(
        f"'{CURATION_BUDGET_SEED}:' || lang || ':' || CAST(doc_id AS VARCHAR)"
    )
    return f"""
    WITH t AS (
      SELECT b.doc_id, d.lang,
             CAST(len(string_split(b.cleaned_text, ' ')) AS BIGINT) AS n_tokens,
             {pri} AS pri
      FROM ({_curation_oracle_sql()}) b
      JOIN documents d USING (doc_id)
      WHERE b.split = 'train'
    ),
    c AS (
      SELECT doc_id, lang, n_tokens,
             CAST(sum(n_tokens) OVER (
               PARTITION BY lang ORDER BY pri, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_tokens
      FROM t
    )
    SELECT doc_id, lang, n_tokens, cum_tokens
    FROM c
    WHERE cum_tokens <= CASE lang {case} ELSE {CURATION_BUDGET_DEFAULT} END
    """


@register(
    "documents_curation_budgeted",
    oracle=_curation_budget_oracle_sql(),
    tags=("dedup", "text", "ml", "pipeline", "sampling"),
)
def documents_curation_budgeted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The token budget GRADED IN COMPOSITION (the r12 repetition-gate
    lesson applied pre-emptively: a stage graded only standalone leaves
    its composition-order bugs structurally invisible): the full curation
    pipeline (gate -> near-dup keep-set -> passage dedup -> leakage-safe
    split), then operators/sampling.py:token_budget_sample over the TRAIN
    split's CLEANED text per language — budgeting what actually ships to
    training, counted on the post-dedup text (budgeting raw text would
    overcount passages the pipeline strips). The budget stage adds one
    lang-keyed window over the already-tiny survivor set; every upstream
    stage is the graded operator unchanged. Deterministic end-to-end:
    which docs survive, their cleaned token counts, and which fit the
    per-language cap are all pure functions of the corpus."""
    from distributed_api_etl_spark.operators.sampling import token_budget_sample

    return token_budget_sample(
        _train_with_tokens(spark, sf_dir),
        "doc_id",
        "lang",
        "n_tokens",
        CURATION_BUDGETS,
        CURATION_BUDGET_DEFAULT,
        seed=CURATION_BUDGET_SEED,
    )


# ---------------------------------------------------------------------------
# The END-TO-END training-data recipe (VERDICT r13 #1): every stage of the
# "corpus -> packed training shards" path composed under ONE oracle. The
# stages are each graded standalone — curation pipeline, mixture-rate
# sampling (training_mix_selection's tier), exact token budgets
# (documents_token_budget_mix's operator), epoch-shuffle shard assignment
# (documents_shard_assign's operator), concat-and-chunk packing
# (documents_pack_sequences' operator) — but composition-order bugs between
# them were structurally invisible to the driver (the exact class the r12
# repetition-gate finding proved real: composing it forced the fused gate).
# This head pins the full recipe: which documents ship, in which epoch
# order, into which pack of which shard, at which token offset.

RECIPE_BUDGETS = {"en": 2000, "zh": 600, "es": 500}
RECIPE_BUDGET_DEFAULT = 300
RECIPE_BUDGET_SEED = "recipe"
RECIPE_SHARDS = 4
RECIPE_SHARD_SEED = "recipe-epoch0"
RECIPE_PACK_BUDGET = 256


def _recipe_tail_sql(base_sql: str) -> str:
    """Mixture-filtered ``(doc_id, lang, n_tokens)`` base -> per-language
    budget window -> shard hash -> per-shard pack window — the recipe's
    shared SQL tail, each fragment the same shape its standalone oracle
    verifies. ``base_sql`` supplies the base selection (the plain recipe's
    curated train split, or the decontaminated variant's)."""
    bud_case = " ".join(f"WHEN '{k}' THEN {v}" for k, v in RECIPE_BUDGETS.items())
    pri = portable_hash32_sql(
        f"'{RECIPE_BUDGET_SEED}:' || lang || ':' || CAST(doc_id AS VARCHAR)"
    )
    shard_h = portable_hash32_sql(
        f"'{RECIPE_SHARD_SEED}:' || CAST(doc_id AS VARCHAR)"
    )
    return f"""
    WITH base AS ({base_sql}),
    bud AS (
      SELECT doc_id, lang, n_tokens,
             CAST(sum(n_tokens) OVER (
               PARTITION BY lang ORDER BY pri, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_tokens
      FROM (SELECT *, {pri} AS pri FROM base)
    ),
    kept AS (
      SELECT doc_id, lang, n_tokens, cum_tokens
      FROM bud
      WHERE cum_tokens <= CASE lang {bud_case} ELSE {RECIPE_BUDGET_DEFAULT} END
    ),
    sharded AS (
      SELECT *,
             CAST({shard_h} % {RECIPE_SHARDS} AS INTEGER) AS shard,
             {shard_h} AS sort_key
      FROM kept
    ),
    packed AS (
      SELECT *,
             CAST(COALESCE(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY sort_key, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS cb
      FROM sharded
    )
    SELECT doc_id, lang, n_tokens, cum_tokens, shard, sort_key,
           CAST(cb // {RECIPE_PACK_BUDGET} AS BIGINT) AS pack_id,
           CAST(cb % {RECIPE_PACK_BUDGET} AS BIGINT) AS pack_offset
    FROM packed
    """


def _recipe_base_sql() -> str:
    """The plain recipe base: curated TRAIN split + mixture-rate filter."""
    from distributed_api_etl_spark.queries.text import MIX_DEFAULT, MIX_RATES

    mix_case = " ".join(f"WHEN '{k}' THEN {v}" for k, v in MIX_RATES.items())
    mix_h = portable_hash32_sql("d.lang || ':' || CAST(b.doc_id AS VARCHAR)")
    return f"""
      SELECT b.doc_id, d.lang,
             CAST(len(string_split(b.cleaned_text, ' ')) AS BIGINT) AS n_tokens
      FROM ({_curation_oracle_sql()}) b
      JOIN documents d USING (doc_id)
      WHERE b.split = 'train'
        AND {mix_h} % 1000 < CASE d.lang {mix_case} ELSE {MIX_DEFAULT} END
    """


def _training_recipe_oracle_sql() -> str:
    """The curation oracle nested as a derived table, then the shared
    mixture/budget/shard/pack tail."""
    return _recipe_tail_sql(_recipe_base_sql())


@register(
    "documents_training_recipe",
    oracle=_training_recipe_oracle_sql(),
    bench=True,
    tags=("dedup", "text", "ml", "pipeline", "sampling", "packing"),
)
def documents_training_recipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus -> packed training shards, end to end:

    1. full curation pipeline (gopher quality+repetition gate -> MinHash
       near-dup keep-set on raw gated text -> passage exact dedup ->
       husk drop -> leakage-safe split keyed on the near-dup cluster);
    2. TRAIN split only — budgets and packing apply to what actually
       ships to training, and the split runs FIRST so budget/mix churn
       can never move a document across splits between recipe revisions;
    3. per-language mixture rates (hash_stratified_sample at the graded
       MIX_RATES — the temperature-mixing tier);
    4. exact per-language token budgets over the post-dedup CLEANED
       token counts (token_budget_sample, strict prefix-of-priority);
    5. deterministic epoch shuffle (shard_assignment: shard + in-shard
       sort key, both row-keyed hashes);
    6. concat-and-chunk packing per shard stream (pack_sequences over
       the epoch order, doc-id tie-break) into 256-token packs.

    Output: one row per shipped document with its language, token count,
    budget running total, shard, epoch sort key, pack id and in-pack
    token offset — the loader-facing manifest of the whole recipe.

    100 TB shape: stages 2-6 add ONE lang-keyed window (budget), ONE
    map-side mixture filter, ONE map-side hash projection (shards), and
    ONE shard-keyed window (packing) on top of the already-benchmarked
    curation pipeline — no new corpus-sized shuffles (the budget/pack
    windows key on lang/shard over the post-budget survivor set, and
    shard count would scale with the cluster; the giant-group caveat and
    map-side fallback are documented on token_budget_sample).
    """
    from distributed_api_etl_spark.operators.sampling import hash_stratified_sample
    from distributed_api_etl_spark.queries.text import MIX_DEFAULT, MIX_RATES

    mixed = hash_stratified_sample(
        _train_with_tokens(spark, sf_dir), "doc_id", "lang", MIX_RATES, MIX_DEFAULT
    )
    return _recipe_tail(mixed)


def _recipe_tail(mixed: DataFrame) -> DataFrame:
    """Budget -> shard -> pack over a mixture-filtered ``(doc_id, lang,
    n_tokens)`` frame — the recipe's shared Spark tail (the SQL twin is
    :func:`_recipe_tail_sql`)."""
    from distributed_api_etl_spark.operators.packing import pack_sequences
    from distributed_api_etl_spark.operators.sampling import (
        shard_assignment,
        token_budget_sample,
    )

    budgeted = token_budget_sample(
        mixed,
        "doc_id",
        "lang",
        "n_tokens",
        RECIPE_BUDGETS,
        RECIPE_BUDGET_DEFAULT,
        seed=RECIPE_BUDGET_SEED,
    )
    sharded = shard_assignment(
        budgeted,
        "doc_id",
        RECIPE_SHARDS,
        seed=RECIPE_SHARD_SEED,
        carry_cols=("lang", "n_tokens", "cum_tokens"),
    )
    packed = pack_sequences(
        sharded,
        order_col=("sort_key", "doc_id"),
        token_count_col="n_tokens",
        budget=RECIPE_PACK_BUDGET,
        stream_col="shard",
    )
    return packed.select(
        "doc_id",
        "lang",
        "n_tokens",
        "cum_tokens",
        "shard",
        "sort_key",
        F.col("pack_id").cast("bigint").alias("pack_id"),
        "pack_offset",
    )


def _training_packs_oracle_sql() -> str:
    """The recipe oracle nested, re-aggregated to the pack grain."""
    return f"""
    WITH recipe AS ({_training_recipe_oracle_sql()})
    SELECT shard, pack_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS span_tokens,
           CAST(min(pack_offset) AS BIGINT) AS first_offset,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM recipe
    GROUP BY shard, pack_id
    """


@register(
    "documents_training_packs",
    oracle=_training_packs_oracle_sql(),
    tags=("text", "ml", "pipeline", "packing"),
)
def documents_training_packs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pack-grain view of the training recipe — the contract a data
    LOADER reads: one row per (shard, pack_id) with its document count,
    the token span STARTING in the pack (straddle-aware: a doc counts in
    the pack its first token lands in, the concat-and-chunk convention),
    the first in-pack offset (0 unless the pack opens mid-straddle), and
    the language diversity the mixing stage bought. Re-aggregating the
    recipe to the grain the consumer reads is what catches
    boundary-arithmetic bugs (off-by-one at the pack cut, a straddling
    doc double-counted) that the row-grain head can't surface as a
    count/grouping error. One extra keyed aggregation over the
    budget-bounded survivor frame — nothing corpus-sized."""
    recipe = documents_training_recipe(spark, sf_dir)
    return recipe.groupBy("shard", "pack_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("span_tokens"),
        F.min("pack_offset").cast("bigint").alias("first_offset"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
    )


# The decontamination shingle length: the standalone head's 3-gram match
# contaminates ~85% of this synthetic corpus (generic trigrams collide),
# which would grade an empty recipe; 4-grams flag ~10% of the curated
# train split — a non-degenerate removal that still exercises the real
# contract (production uses 8-13-gram verbatim matches; n is the
# operator's parameter either way).
DECON_N = 4
_DECON_SHINGLES = (
    f"list_transform(generate_series(1, greatest(len(t) - {DECON_N - 1}, 0)), "
    "i -> " + " || ' ' || ".join(
        "t[i]" if j == 0 else f"t[i+{j}]" for j in range(DECON_N)
    ) + ")"
)


def _decon_recipe_base_sql() -> str:
    """The decontaminated recipe base: curated TRAIN split, benchmark-
    overlap documents removed (3-shingle match of CLEANED text vs the
    eval set's raw text), then the mixture-rate filter."""
    from distributed_api_etl_spark.queries.text import (
        EVAL_SET_MAX_ID,
        MIX_DEFAULT,
        MIX_RATES,
    )

    mix_case = " ".join(f"WHEN '{k}' THEN {v}" for k, v in MIX_RATES.items())
    mix_h = portable_hash32_sql("tr.lang || ':' || CAST(tr.doc_id AS VARCHAR)")
    return f"""
      WITH tr AS (
        SELECT b.doc_id, b.cleaned_text, d.lang
        FROM ({_curation_oracle_sql()}) b
        JOIN documents d USING (doc_id)
        WHERE b.split = 'train'
      ),
      trsh AS (
        SELECT DISTINCT doc_id, s
        FROM (SELECT doc_id, string_split(cleaned_text, ' ') AS t FROM tr),
             UNNEST({_DECON_SHINGLES}) u(s)
      ),
      evsh AS (
        SELECT DISTINCT s
        FROM (SELECT string_split(text, ' ') AS t FROM documents
              WHERE doc_id < {EVAL_SET_MAX_ID}),
             UNNEST({_DECON_SHINGLES}) u(s)
      ),
      cont AS (SELECT DISTINCT doc_id FROM trsh JOIN evsh USING (s))
      SELECT tr.doc_id, tr.lang,
             CAST(len(string_split(tr.cleaned_text, ' ')) AS BIGINT) AS n_tokens
      FROM tr LEFT JOIN cont c USING (doc_id)
      WHERE c.doc_id IS NULL
        AND {mix_h} % 1000 < CASE tr.lang {mix_case} ELSE {MIX_DEFAULT} END
    """


@register(
    "documents_recipe_decontaminated",
    oracle=_recipe_tail_sql(_decon_recipe_base_sql()),
    bench=True,
    tags=("dedup", "text", "ml", "pipeline", "sampling", "packing"),
)
def documents_recipe_decontaminated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training recipe with benchmark DECONTAMINATION composed in —
    the hygiene stage every real pre-training pipeline runs, graded in
    composition because its PLACEMENT is the contract: decontamination
    applies to the curated train split's CLEANED text (what actually
    ships — raw-text matching would both miss passages dedup changed and
    flag passages dedup removed) and runs BEFORE the token budgets (a
    contaminated document must never consume budget that an honest one
    then loses; mixture rates commute with the filter, budgets do not).
    The eval set is the standalone text_decontaminate head's benchmark
    proxy (doc_id < EVAL_SET_MAX_ID, RAW text — the benchmark is external
    and never curated), matched on DECON_N-gram shingles.

    100 TB shape: adds ONE broadcast of the distinct eval shingle set and
    one corpus-side explode/semi-join/anti-join over the already-bounded
    curated train split (operators/text.py:decontaminate — no pair
    materialization); the tail is the recipe's shared budget/shard/pack
    plan unchanged.
    """
    from distributed_api_etl_spark.operators.sampling import hash_stratified_sample
    from distributed_api_etl_spark.operators.text import decontaminate
    from distributed_api_etl_spark.functions.textfns import tokens
    from distributed_api_etl_spark.queries.text import (
        EVAL_SET_MAX_ID,
        MIX_DEFAULT,
        MIX_RATES,
    )

    docs = fan_out(table(spark, sf_dir, "documents"))
    pipe = documents_curation_pipeline(spark, sf_dir)
    train = pipe.where(F.col("split") == "train").select("doc_id", "cleaned_text")
    ev = docs.where(F.col("doc_id") < EVAL_SET_MAX_ID).select(
        "doc_id", F.col("text").alias("cleaned_text")
    )
    survivors = decontaminate(train, ev, "doc_id", "cleaned_text", n=DECON_N)
    base = survivors.join(docs.select("doc_id", "lang"), "doc_id").select(
        "doc_id",
        "lang",
        F.size(tokens(F.col("cleaned_text"))).cast("bigint").alias("n_tokens"),
    )
    mixed = hash_stratified_sample(base, "doc_id", "lang", MIX_RATES, MIX_DEFAULT)
    return _recipe_tail(mixed)


def _rate_recipe_oracle_sql() -> str:
    """The recipe with the GIANT-GROUP budget fallback in the budget seam:
    mixture base -> per-language totals -> integer ppm threshold -> hash
    keep -> the same shard/pack tail (cum_tokens replaced by the
    threshold audit column, since rate sampling has no running total)."""
    bud_case = " ".join(f"WHEN '{k}' THEN {v}" for k, v in RECIPE_BUDGETS.items())
    h = portable_hash32_sql(
        f"'{RECIPE_BUDGET_SEED}:' || lang || ':' || CAST(doc_id AS VARCHAR)"
    )
    shard_h = portable_hash32_sql(
        f"'{RECIPE_SHARD_SEED}:' || CAST(doc_id AS VARCHAR)"
    )
    # the per-language total is a WINDOW over base, not a groupBy +
    # self-join: base holds the whole recursive curation subquery, and a
    # second reference makes DuckDB (which inlines CTEs by default)
    # re-plan the recursive CC per reference — measured minutes even at
    # sf0.001, and AS MATERIALIZED still left it at ~2 min. The window
    # form reads base once and computes the identical per-group value.
    return f"""
    WITH base AS ({_recipe_base_sql()}),
    thr AS (
      SELECT doc_id, lang, n_tokens,
             CAST(CASE WHEN grp_total_tokens <= bud THEN 1000000
                  ELSE (CAST(1000000 AS BIGINT) * bud) // grp_total_tokens
             END AS BIGINT) AS threshold_ppm
      FROM (
        SELECT *,
               CAST(sum(n_tokens) OVER (PARTITION BY lang) AS BIGINT)
                 AS grp_total_tokens,
               CAST(CASE lang {bud_case}
                    ELSE {RECIPE_BUDGET_DEFAULT} END AS BIGINT) AS bud
        FROM base
      )
    ),
    kept AS (
      SELECT doc_id, lang, n_tokens, threshold_ppm
      FROM thr
      WHERE {h} % 1000000 < threshold_ppm
    ),
    sharded AS (
      SELECT *,
             CAST({shard_h} % {RECIPE_SHARDS} AS INTEGER) AS shard,
             {shard_h} AS sort_key
      FROM kept
    ),
    packed AS (
      SELECT *,
             CAST(COALESCE(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY sort_key, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS cb
      FROM sharded
    )
    SELECT doc_id, lang, n_tokens, threshold_ppm, shard, sort_key,
           CAST(cb // {RECIPE_PACK_BUDGET} AS BIGINT) AS pack_id,
           CAST(cb % {RECIPE_PACK_BUDGET} AS BIGINT) AS pack_offset
    FROM packed
    """


@register(
    "documents_recipe_rate_budgeted",
    oracle=_rate_recipe_oracle_sql(),
    # bench-tracked (VERDICT r15 #2): expensive multi-stage composition —
    # without a wall/counter trend line it is invisible until it times out
    bench=True,
    tags=("dedup", "text", "ml", "pipeline", "sampling", "packing", "skew"),
)
def documents_recipe_rate_budgeted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training recipe with the giant-group budget FALLBACK graded in
    composition (the r12 repetition-gate lesson, applied to this round's
    new operator before a composition bug can hide): same curated train
    split, same mixture rates, same epoch shards and 256-token packs as
    documents_training_recipe — but the budget seam runs
    operators/sampling.py:rate_budget_sample (map-side totals + integer
    ppm hash-threshold) instead of the per-language prefix window. This
    is the EXACT swap SCALE.md's crossover note prescribes when one
    language dominates a 100 TB corpus: every stage around the seam is
    untouched, the manifest keeps the threshold as its audit column
    (rate sampling has no running total), and the recipe stays a pure
    function of the corpus — so the full chain still carries a
    row+schema+hash oracle."""
    from distributed_api_etl_spark.operators.packing import pack_sequences
    from distributed_api_etl_spark.operators.sampling import (
        hash_stratified_sample,
        rate_budget_sample,
        shard_assignment,
    )
    from distributed_api_etl_spark.queries.text import MIX_DEFAULT, MIX_RATES
    from distributed_api_etl_spark.session import scoped_persist

    # rate_budget_sample reads its input TWICE (the per-group totals
    # aggregate and the probe side of the broadcast join). The window form
    # is single-branch so the recipe head never needed this, but here an
    # unpersisted mixture frame would re-execute the entire curation DAG
    # on both branches — persist the (doc_id, lang, n_tokens) survivor
    # frame at the seam (tiny: one slim row per shipped-candidate doc)
    mixed = scoped_persist(
        hash_stratified_sample(
            _train_with_tokens(spark, sf_dir), "doc_id", "lang",
            MIX_RATES, MIX_DEFAULT,
        )
    )
    budgeted = rate_budget_sample(
        mixed,
        "doc_id",
        "lang",
        "n_tokens",
        RECIPE_BUDGETS,
        RECIPE_BUDGET_DEFAULT,
        seed=RECIPE_BUDGET_SEED,
    )
    sharded = shard_assignment(
        budgeted,
        "doc_id",
        RECIPE_SHARDS,
        seed=RECIPE_SHARD_SEED,
        carry_cols=("lang", "n_tokens", "threshold_ppm"),
    )
    packed = pack_sequences(
        sharded,
        order_col=("sort_key", "doc_id"),
        token_count_col="n_tokens",
        budget=RECIPE_PACK_BUDGET,
        stream_col="shard",
    )
    return packed.select(
        "doc_id",
        "lang",
        "n_tokens",
        "threshold_ppm",
        "shard",
        "sort_key",
        F.col("pack_id").cast("bigint").alias("pack_id"),
        "pack_offset",
    )
