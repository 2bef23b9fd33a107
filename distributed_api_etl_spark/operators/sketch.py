"""Distributed sketch operators: HyperLogLog cardinality and Bloom pruning.

Both sketches are built from :func:`portable_hash32` (md5-based) and pure
integer arithmetic, so Spark and the DuckDB oracle compute BIT-IDENTICAL
sketches — unlike ``approx_count_distinct`` / ``bloom_filter_agg``, whose
internal hashing is engine-specific and could only be graded rows-only.

Why sketches at 100 TB:

* ``COUNT(DISTINCT user_id)`` over 100 TB shuffles every distinct key; the
  HLL register table is ``m`` rows (here 256) per group — the aggregation
  map-side-combines down to max-per-register, one tiny shuffle, and
  register tables from disjoint inputs merge with ``max`` (per-day
  sketches roll up to per-month for free — the sketch algebra that makes
  pre-aggregated cubes possible).
* A Bloom bitmap of a selective join's build side is 1 KiB — broadcast it
  and drop non-matching probe rows BEFORE the shuffle the real join would
  pay. Spark's runtime bloom filter
  (``spark.sql.optimizer.runtime.bloomFilter.enabled``) does this inside
  Catalyst; this operator is the explicit, cross-engine-checkable form.

The reference engine has no sketch surface (SURVEY.md §2.4) — this is
beyond-reference capability for the training-data pipeline tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from distributed_api_etl_spark.functions.portable import (
    portable_hash32,
    portable_hash32_sql,
)
from distributed_api_etl_spark.session import scoped_persist

# --- HyperLogLog ------------------------------------------------------------
# b index bits -> m = 2^b registers; remaining w = 32 - b hash bits feed the
# leading-zero rank. m = 256 gives ~1.04/sqrt(256) = 6.5% standard error —
# the classic space/accuracy point (Flajolet et al., "HyperLogLog", 2007).
HLL_B = 8
HLL_M = 1 << HLL_B
HLL_W = 32 - HLL_B
#: alpha_256 bias correction. Every numeric literal is cast to DOUBLE
#: explicitly: DuckDB parses bare decimal literals (0.7213, 1.0) as
#: DECIMAL and its decimal division rounds differently from IEEE — at
#: sf0.1 the drift crossed the final floor boundary. With DOUBLE forced,
#: both engines run the identical correctly-rounded IEEE sequence.
HLL_ALPHA_EXPR = (
    f"CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / {HLL_M})"
)


def _rho(rem: Column) -> Column:
    """Rank of the first set bit (from the MSB of the w-bit remainder) + 1.

    ``bin()`` renders integers without leading zeros on BOTH engines, so
    ``length(bin(r))`` is ``floor(log2(r)) + 1`` with no float log anywhere:
    rho = w + 1 - length(bin(r)); an all-zero remainder (bin -> '0') maps
    to w + 1.
    """
    return F.when(rem == 0, F.lit(HLL_W + 1)).otherwise(
        F.lit(HLL_W + 1) - F.length(F.bin(rem))
    )


def hll_registers(df: DataFrame, key_col: str, group_cols: list[str]) -> DataFrame:
    """Per-group HLL register table: (group..., bucket, max_rho).

    One map-side-combinable aggregation; the output is at most ``m`` rows
    per group regardless of input size, and register tables from disjoint
    inputs merge with ``groupBy(bucket).max(max_rho)`` — union-then-merge
    IS the distributed sketch algebra.
    """
    return (
        df.select(*group_cols, portable_hash32(F.col(key_col)).alias("h32"))
        .select(
            *group_cols,
            F.expr(f"div(h32, {1 << HLL_W})").alias("bucket"),
            _rho(F.expr(f"pmod(h32, {1 << HLL_W})")).alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def _hll_correction_sql(est_raw: str) -> str:
    """Standard small-range (linear counting) correction, shared verbatim by
    the Spark expression and the DuckDB oracle."""
    return (
        f"CASE WHEN ({est_raw}) <= CAST(2.5 AS DOUBLE) * {HLL_M} AND zero_registers > 0 "
        f"THEN {HLL_M} * ln(CAST({HLL_M} AS DOUBLE) / zero_registers) "
        f"ELSE ({est_raw}) END"
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Collapse a register table to (group..., zero_registers, est_distinct).

    The harmonic sum uses ``1 / (1 << max_rho)`` — every term and every
    partial sum is an exact dyadic double (terms >= 2^-25, total < m, well
    inside the 53-bit mantissa), so the sum is order-independent and
    bit-identical across engines with no libm anywhere. Only the
    linear-counting branch touches ``ln``, rounded to 4 decimals on both
    sides (portable_round pattern, operators/text.py:portable_round6).
    """
    est_raw = f"({HLL_ALPHA_EXPR}) * {HLL_M} * {HLL_M} / denom"
    corrected = _hll_correction_sql(est_raw)
    return (
        registers.groupBy(*group_cols)
        .agg(
            F.count("*").alias("present"),
            # coalesce: the global (no-group) aggregate of an EMPTY input is
            # one row with a null sum; 0.0 routes it to linear counting,
            # which correctly estimates 0 with every register empty
            F.coalesce(
                F.sum(
                    F.expr(
                        "CAST(1.0 AS DOUBLE) / shiftleft(CAST(1 AS BIGINT), max_rho)"
                    )
                ),
                F.lit(0.0),
            ).alias("inv_sum"),
        )
        .select(
            *group_cols,
            (F.lit(HLL_M) - F.col("present")).cast("bigint").alias("zero_registers"),
            "inv_sum",
        )
        .withColumn("denom", F.col("zero_registers") + F.col("inv_sum"))
        .withColumn("est_distinct", F.expr(f"floor(({corrected}) * 1e4 + 0.5) / 1e4"))
        .select(*group_cols, "zero_registers", "est_distinct")
    )


def hll_oracle_sql(key_expr: str, source_table: str, group_col: str) -> str:
    """DuckDB mirror of registers + estimate, grouped by one column.

    Returns a complete SELECT (no leading WITH) producing
    (group_col, zero_registers, est_distinct).
    """
    est_raw = f"({HLL_ALPHA_EXPR}) * {HLL_M} * {HLL_M} / denom"
    corrected = _hll_correction_sql(est_raw)
    return f"""
    WITH hashed AS (
      SELECT {group_col}, {portable_hash32_sql(key_expr)} AS h32
      FROM {source_table}),
    bucketed AS (
      SELECT {group_col}, h32 // {1 << HLL_W} AS bucket,
             CASE WHEN h32 % {1 << HLL_W} = 0 THEN {HLL_W + 1}
                  ELSE {HLL_W + 1} - length(bin(h32 % {1 << HLL_W})) END AS rho
      FROM hashed),
    regs AS (SELECT {group_col}, bucket, max(rho) AS max_rho
             FROM bucketed GROUP BY {group_col}, bucket),
    est AS (
      SELECT {group_col},
             CAST({HLL_M} - count(*) AS BIGINT) AS zero_registers,
             sum(CAST(1.0 AS DOUBLE) / (1::BIGINT << max_rho)) AS inv_sum
      FROM regs GROUP BY {group_col}),
    final AS (
      SELECT {group_col}, zero_registers,
             zero_registers + inv_sum AS denom
      FROM est)
    SELECT {group_col}, zero_registers,
           floor(({corrected}) * 1e4 + 0.5) / 1e4 AS est_distinct
    FROM final
    """


# --- Bloom filter -----------------------------------------------------------
#: 2^13 bits = 1 KiB bitmap (128 x 64-bit words); k = 3 salted hashes.
#: False-positive rate for n build keys ~ (1 - e^{-kn/m})^k — ~0.4% at
#: n = 500. At real scale, size m from the build-side cardinality (an HLL
#: estimate upstream is the canonical way to pick it).
BLOOM_BITS_LOG2 = 13
BLOOM_BITS = 1 << BLOOM_BITS_LOG2
BLOOM_K = 3


def _salted_pos(key: Column, salt: int, m_bits: int) -> Column:
    """Bit position for hash ``salt``: portable_hash32('salt:' || key) mod m."""
    h = portable_hash32(F.concat(F.lit(f"{salt}:"), key.cast("string")))
    return F.pmod(h, F.lit(m_bits))


def build_bloom(df: DataFrame, key_col: str, m_bits: int = BLOOM_BITS) -> DataFrame:
    """(word, bits) bitmap (<=128 rows) of the build side's distinct keys.

    One map-side-combinable ``bit_or`` aggregation — associative and
    commutative, so partial bitmaps OR together exactly like HLL registers
    max together. Broadcast-sized by construction (1 KiB) no matter how
    large the build side is.
    """
    positions = (
        df.select(F.col(key_col).alias("k"))
        .distinct()
        .select(
            F.explode(
                F.array(*[_salted_pos(F.col("k"), i, m_bits) for i in range(BLOOM_K)])
            ).alias("pos")
        )
    )
    # 32-bit words: the maximum shift is 31, safely inside BIGINT range on
    # both engines (DuckDB raises on a signed 1 << 63)
    return (
        positions.select(
            F.expr("div(pos, 32)").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), pmod(pos, 32))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_might_contain(
    df: DataFrame, key_col: str, bitmap: DataFrame, m_bits: int = BLOOM_BITS
) -> DataFrame:
    """Add boolean ``bloom_pass``: true iff all k salted bits are set.

    k broadcast joins against the <=128-row bitmap — no shuffle of ``df``,
    no explode, no Python: the probe stays inside whole-stage codegen and
    rows are droppable BEFORE any downstream shuffle. Bitmap words absent
    from the aggregation read as 0 (no build key hashed there).

    The bitmap frame is persisted here: it feeds k separate broadcasts,
    and without a cache each broadcast would re-run the whole build-side
    pipeline (distinct + hash + bit_or — k redundant scans of the build
    table at 100 TB; caught by plan audit, SCALE.md).
    """
    bitmap = scoped_persist(bitmap)
    out = df
    cond = F.lit(True)
    scratch: list[str] = []
    for i in range(BLOOM_K):
        pos_c, word_c, w_c, bits_c = f"_bp{i}", f"_bw{i}", f"_bmw{i}", f"_bmb{i}"
        scratch += [pos_c, word_c, w_c, bits_c]
        bm = bitmap.select(F.col("word").alias(w_c), F.col("bits").alias(bits_c))
        out = (
            out.withColumn(pos_c, _salted_pos(F.col(key_col), i, m_bits))
            .withColumn(word_c, F.expr(f"div({pos_c}, 32)"))
            .join(F.broadcast(bm), F.col(word_c) == F.col(w_c), "left")
        )
        mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), pmod({pos_c}, 32))")
        cond = cond & (
            F.coalesce(F.col(bits_c), F.lit(0).cast("bigint")).bitwiseAND(mask) == mask
        )
    return out.withColumn("bloom_pass", cond).drop(*scratch)


def bloom_oracle_ctes(build_sql: str, m_bits: int = BLOOM_BITS) -> str:
    """DuckDB CTE chain ending in ``bloom AS (word, bits)``.

    ``build_sql`` must yield a single column ``k`` (the build keys).
    Embed after WITH; test membership with :func:`bloom_oracle_pass_expr`.
    """
    hashes = " UNION ALL ".join(
        f"SELECT {portable_hash32_sql(chr(39) + str(i) + ':' + chr(39) + ' || CAST(k AS VARCHAR)')} "
        f"% {m_bits} AS pos FROM bkeys"
        for i in range(BLOOM_K)
    )
    return f"""
    bkeys AS ({build_sql}),
    bpos AS ({hashes}),
    bloom AS (SELECT pos // 32 AS word,
                     bit_or(1::BIGINT << (pos % 32)) AS bits
              FROM bpos GROUP BY pos // 32)
    """


# --- Equi-width histogram (quantile sketch) ---------------------------------
#: Fixed-bin histogram: the deterministic, mergeable quantile structure.
#: Randomized sketches (KLL, t-digest) can never hash-grade cross-engine;
#: an equi-width histogram over [lo, hi] is pure integer counting once the
#: bounds are fixed, per-partition histograms merge by vector SUM (same
#: algebra as CMS), and a B-bin table answers any quantile to within one
#: bin width. B = 64 keeps the per-group state 64 rows whatever the input.
HIST_BINS = 64


def _hist_bin(value: Column, lo: Column, hi: Column, n_bins: int) -> Column:
    """Bin index in [0, n_bins-1]; a degenerate [lo, lo] range maps to 0.

    The float expression is the same IEEE op sequence on both engines:
    (value - lo) * B / (hi - lo), floored, clamped.
    """
    raw = F.floor(
        (value - lo) * F.lit(float(n_bins)) / (hi - lo)
    ).cast("bigint")
    clamped = F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), raw))
    return F.when(hi == lo, F.lit(0)).otherwise(clamped)


def _hist_bin_sql(value: str, lo: str, hi: str, n_bins: int) -> str:
    return (
        f"CASE WHEN {hi} = {lo} THEN 0 ELSE "
        f"least({n_bins - 1}, greatest(0, CAST(floor(({value} - {lo}) * "
        f"CAST({n_bins} AS DOUBLE) / ({hi} - {lo})) AS BIGINT))) END"
    )


def histogram_sketch(
    df: DataFrame, value_col: str, group_cols: list[str], n_bins: int = HIST_BINS
) -> tuple[DataFrame, DataFrame]:
    """(bounds, hist): per-group (lo, hi, n) and the (group, bin, cnt) table.

    Two map-side-combinable aggregations; the histogram is <= n_bins rows
    per group regardless of input size and histograms from disjoint inputs
    merge by ``sum(cnt)`` (bounds merge by min/max) — per-day histograms
    roll up to any range. In production the bounds come from a first pass
    or are fixed a priori; both passes are cheap scans with no wide state.
    """
    v = F.col(value_col)
    bounds = df.groupBy(*group_cols).agg(
        F.min(v).alias("lo"), F.max(v).alias("hi"), F.count("*").alias("n")
    )
    # group_cols == [] => global histogram: bounds is ONE row, bounded cross join
    joined = df.join(bounds, group_cols) if group_cols else df.crossJoin(bounds)
    binned = joined.select(
        *group_cols, _hist_bin(v, F.col("lo"), F.col("hi"), n_bins).alias("bin")
    )
    hist = binned.groupBy(*group_cols, "bin").agg(F.count("*").alias("cnt"))
    return bounds, hist


def histogram_quantile(
    bounds: DataFrame,
    hist: DataFrame,
    group_cols: list[str],
    q_num: int,
    q_den: int,
    out_col: str,
    n_bins: int = HIST_BINS,
) -> DataFrame:
    """Per-group quantile estimate from the histogram: (group..., out_col).

    target rank = ceil(q*n) in INTEGER arithmetic ((q_num*n + q_den - 1)
    div q_den — no float rank); the answering bin is the first whose
    cumulative count reaches it (a <=n_bins-row window per group, selected
    with one ``min_by`` — no second shuffle of the data). Within-bin linear
    interpolation is a fixed IEEE op sequence, rounded via floor(x*1e4+.5)
    so the graded value is engine-exact.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    def _with_bounds(df: DataFrame) -> DataFrame:
        # group_cols == [] is the global-histogram case: bounds is ONE row,
        # so the join degenerates to a (bounded) cross join
        return df.join(bounds, group_cols) if group_cols else df.crossJoin(bounds)

    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    j = _with_bounds(cum).withColumn(
        "target", F.expr(f"div({q_num} * n + {q_den} - 1, {q_den})")
    )
    hit = _with_bounds(
        j.where(F.col("cum") >= F.col("target"))
        .groupBy(*group_cols)
        .agg(F.min_by(F.struct("bin", "cnt", "cum"), F.col("bin")).alias("h"))
        .select(*group_cols, "h.bin", "h.cnt", "h.cum")
    ).withColumn("target", F.expr(f"div({q_num} * n + {q_den} - 1, {q_den})"))
    est = (
        F.col("lo")
        + (
            F.col("bin")
            + (F.col("target") - (F.col("cum") - F.col("cnt"))) / F.col("cnt")
        )
        * (F.col("hi") - F.col("lo"))
        / F.lit(float(n_bins))
    )
    return hit.select(
        *group_cols,
        (F.floor(est * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4)).alias(out_col),
    )


def histogram_quantile_oracle_ctes(
    value: str,
    source_table: str,
    group_col: str,
    quantiles: list[tuple[str, int, int]],
    n_bins: int = HIST_BINS,
) -> str:
    """DuckDB CTE chain ending in ``hq AS (group_col, <name> ...)`` — one
    column per (name, q_num, q_den)."""
    bin_expr = _hist_bin_sql(value, "b.lo", "b.hi", n_bins)
    per_q = []
    for name, q_num, q_den in quantiles:
        per_q.append(
            f"""hq_{name} AS (
      SELECT {group_col},
             floor((lo + (bin + CAST(target - (cum - cnt) AS DOUBLE) / cnt)
                    * (hi - lo) / CAST({n_bins} AS DOUBLE)) * 1e4 + 0.5) / 1e4
               AS {name}
      FROM (
        SELECT c.{group_col}, c.bin, c.cnt, c.cum, b.lo, b.hi,
               ({q_num} * b.n + {q_den} - 1) // {q_den} AS target,
               row_number() OVER (PARTITION BY c.{group_col} ORDER BY c.bin)
                 AS rn
        FROM hcum c JOIN hbounds b USING ({group_col})
        WHERE c.cum >= ({q_num} * b.n + {q_den} - 1) // {q_den})
      WHERE rn = 1)"""
        )
    joins = " ".join(f"JOIN hq_{name} USING ({group_col})" for name, _, _ in quantiles)
    cols = ", ".join(name for name, _, _ in quantiles)
    return f"""
    hbounds AS (
      SELECT {group_col}, min({value}) AS lo, max({value}) AS hi,
             CAST(count(*) AS BIGINT) AS n
      FROM {source_table} GROUP BY {group_col}),
    hbins AS (
      SELECT t.{group_col}, {bin_expr} AS bin
      FROM {source_table} t JOIN hbounds b USING ({group_col})),
    hhist AS (SELECT {group_col}, bin, CAST(count(*) AS BIGINT) AS cnt
              FROM hbins GROUP BY {group_col}, bin),
    hcum AS (
      SELECT {group_col}, bin, cnt,
             CAST(sum(cnt) OVER (PARTITION BY {group_col} ORDER BY bin) AS BIGINT)
               AS cum
      FROM hhist),
    {", ".join(per_q)},
    hq AS (SELECT {group_col}, {cols}
           FROM (SELECT DISTINCT {group_col} FROM hbounds) g {joins})
    """


# --- Count-min sketch -------------------------------------------------------
#: depth d salted hash rows x width w counters. Estimate = min over rows of
#: the key's counter — always an OVERestimate (collisions only add), error
#: <= e*N/w with probability 1 - e^-d (Cormode & Muthukrishnan 2005). w = 64
#: is deliberately small so the graded row exhibits REAL collisions at test
#: SF; at scale size w ~ e/eps from the tolerated absolute error, still a
#: few KiB. The counter table is d*w rows whatever the input size: frequency
#: estimation with fixed aggregation state where an exact per-key groupBy
#: carries unbounded key cardinality through the shuffle.
CMS_DEPTH = 4
CMS_WIDTH = 64


def _cms_pos(key: Column, row: int, width: int) -> Column:
    """Counter column for hash row ``row``: portable_hash32('cms<r>:'||key) % w.

    The ``cms`` salt namespace keeps CMS rows independent of the Bloom
    salts (same md5 core, disjoint preimages)."""
    h = portable_hash32(F.concat(F.lit(f"cms{row}:"), key.cast("string")))
    return F.pmod(h, F.lit(width))


def _cms_pos_sql(key_expr: str, row: int, width: int) -> str:
    salted = chr(39) + f"cms{row}:" + chr(39) + f" || CAST({key_expr} AS VARCHAR)"
    return f"({portable_hash32_sql(salted)} % {width})"


def cms_counters(
    df: DataFrame, key_col: str, width: int = CMS_WIDTH, depth: int = CMS_DEPTH
) -> DataFrame:
    """(r, bucket, cnt) counter table of the stream — at most d*w rows.

    One map-side-combinable ``count`` per (row, bucket); counter tables from
    disjoint inputs (per-day, per-source) merge with ``sum`` — the same
    union-then-merge algebra as HLL's ``max`` and Bloom's ``bit_or``, so
    per-day CMS tables roll up to any range without re-scanning history.
    """
    positions = df.select(
        F.posexplode(
            F.array(*[_cms_pos(F.col(key_col), r, width) for r in range(depth)])
        ).alias("r", "bucket")
    )
    return positions.groupBy("r", "bucket").agg(F.count("*").alias("cnt"))


def cms_estimate(
    keys: DataFrame,
    key_col: str,
    counters: DataFrame,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Add ``est_count``: min over the d rows of the key's counters.

    d broadcast joins against the <= d*w-row counter table — the probe side
    never shuffles and stays in whole-stage codegen, mirroring the Bloom
    probe. A (r, bucket) pair absent from the counter table reads as 0
    (nothing hashed there).
    """
    counters = scoped_persist(counters)
    out = keys
    scratch: list[str] = []
    mins: list[Column] = []
    for r in range(depth):
        pos_c, cr_c, cb_c, cnt_c = f"_cp{r}", f"_cr{r}", f"_cb{r}", f"_cc{r}"
        scratch += [pos_c, cnt_c]
        cm = counters.where(F.col("r") == r).select(
            F.col("r").alias(cr_c), F.col("bucket").alias(cb_c), F.col("cnt").alias(cnt_c)
        )
        out = out.withColumn(pos_c, _cms_pos(F.col(key_col), r, width)).join(
            F.broadcast(cm), F.col(pos_c) == F.col(cb_c), "left"
        )
        scratch += [cr_c, cb_c]
        mins.append(F.coalesce(F.col(cnt_c), F.lit(0).cast("bigint")))
    return out.withColumn("est_count", F.least(*mins)).drop(*scratch)


def cms_oracle_sql(
    key_expr: str, source_table: str, width: int = CMS_WIDTH, depth: int = CMS_DEPTH
) -> str:
    """DuckDB CTE chain ending in ``cms_est AS (k, est_count)`` over the
    distinct keys of ``source_table`` — embed after WITH."""
    hashed = " UNION ALL ".join(
        f"SELECT {r} AS r, {_cms_pos_sql(key_expr, r, width)} AS bucket "
        f"FROM {source_table}"
        for r in range(depth)
    )
    lookups = ", ".join(
        "COALESCE((SELECT cnt FROM cms_counters c "
        f"WHERE c.r = {r} AND c.bucket = {_cms_pos_sql('k.k', r, width)}), 0)"
        for r in range(depth)
    )
    return f"""
    cms_pos AS ({hashed}),
    cms_counters AS (SELECT r, bucket, CAST(count(*) AS BIGINT) AS cnt
                     FROM cms_pos GROUP BY r, bucket),
    cms_keys AS (SELECT DISTINCT {key_expr} AS k FROM {source_table}),
    cms_est AS (SELECT k.k, LEAST({lookups}) AS est_count FROM cms_keys k)
    """


def bloom_oracle_pass_expr(key_expr: str, m_bits: int = BLOOM_BITS) -> str:
    """Boolean SQL: all k salted bits of ``key_expr`` set in ``bloom``."""
    conds = []
    for i in range(BLOOM_K):
        salted = chr(39) + str(i) + ":" + chr(39) + f" || CAST({key_expr} AS VARCHAR)"
        pos = f"({portable_hash32_sql(salted)} % {m_bits})"
        conds.append(
            f"(COALESCE((SELECT bits FROM bloom WHERE word = {pos} // 32), 0) "
            f"& (1::BIGINT << ({pos} % 32))) = (1::BIGINT << ({pos} % 32))"
        )
    return " AND ".join(conds)
