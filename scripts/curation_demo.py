#!/usr/bin/env python
"""End-to-end training-corpus curation demo — one command, one JSON line.

Runs the composed pipeline the operator library exists for, against the
testdata documents table:

    Gopher heuristic gate -> quality-model gate -> benchmark
    decontamination -> MinHash near-dup keep-set -> passage-level exact
    dedup of the keepers (cleaned text) -> leakage-safe train/val/test
    split -> token-budget stats -> deterministic sharding

Usage:
    python scripts/curation_demo.py [sf_dir] [n_shards]

Prints one JSON line with per-stage survivor counts and the final shard
histogram. Every stage is the same operator the graded queries exercise;
this script is the "run it on your corpus" entry point (swap sf_dir for
any parquet with doc_id/text columns).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from distributed_api_etl_spark.operators.dedup import (
        minhash_lsh_pairs,
        passage_exact_dedup,
    )
    from distributed_api_etl_spark.operators.graph import dedup_cluster_assignment
    from distributed_api_etl_spark.operators.sampling import (
        leakage_safe_split,
        shard_assignment,
    )
    from distributed_api_etl_spark.operators.text import (
        decontaminate,
        gopher_quality_flags,
        quality_model_score,
    )
    from distributed_api_etl_spark.queries.registry import table
    from distributed_api_etl_spark.session import get_spark, release_caches

    spark = get_spark(app_name="curation-demo")
    spark.sparkContext.setLogLevel("ERROR")

    docs = table(spark, sf_dir, "documents")
    n_total = docs.count()

    # cheapest gate first: the zero-shuffle Gopher battery runs at scan
    # speed, so everything downstream sees fewer rows
    docs = docs.join(
        gopher_quality_flags(docs, "doc_id", "text")
        .where("keep")
        .select("doc_id"),
        "doc_id",
    )
    n_gopher = docs.count()

    gated = docs.join(
        quality_model_score(docs, "doc_id", "text").where("keep").select("doc_id"),
        "doc_id",
    )
    n_gated = gated.count()

    # stand-in eval set: at deploy time, the real held-out benchmarks
    eval_set = docs.orderBy("doc_id").limit(5)
    clean = decontaminate(gated, eval_set, "doc_id", "text", n=3)
    n_clean = clean.count()

    # doc-level near-dup removal runs on the RAW text FIRST: passage
    # cleaning strips an exact duplicate down to an empty husk whose
    # shingle set can no longer near-dup-match anything (review finding,
    # round 6) — dedup the originals, then clean the keepers
    pairs = minhash_lsh_pairs(clean, "doc_id", "text", 3, 70)
    clusters = dedup_cluster_assignment(
        pairs.select("d1", "d2"), clean.select("doc_id"), "doc_id"
    )
    final = clean.join(clusters, "doc_id").where("is_keep")
    # funnel attribution (ADVICE r6): this stage's survivor count is taken
    # BEFORE passage cleaning, so span-clean husk drops are not silently
    # attributed to the near-dup stage
    n_dedup = final.count()

    # strip repeated spans (boilerplate paragraphs) from the kept corpus;
    # docs reduced to nothing but boilerplate are dropped entirely
    cleaned = passage_exact_dedup(final, "doc_id", "text")
    n_span_dropped = (
        cleaned.select(
            F.sum(F.col("n_passages") - F.col("kept_passages")).alias("d")
        ).first()["d"]
        or 0
    )
    final = final.drop("text").join(
        cleaned.where("kept_passages > 0").select(
            "doc_id", F.col("cleaned_text").alias("text")
        ),
        "doc_id",
    )
    n_final = final.count()

    # leakage-safe split: keyed on the near-dup CLUSTER id, so near-dups
    # can never straddle train/val/test
    split_hist = {
        r["split"]: r["n"]
        for r in leakage_safe_split(final)
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }

    tokens = final.select(
        F.sum(F.size(F.split(F.col("text"), " "))).alias("t")
    ).first()["t"]

    sharded = shard_assignment(final, "doc_id", n_shards=n_shards, seed="demo")
    hist = {
        int(r["shard"]): r["n"]
        for r in sharded.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
    release_caches()

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "docs_total": n_total,
                "after_gopher_gate": n_gopher,
                "after_quality_gate": n_gated,
                "after_decontamination": n_clean,
                "after_near_dup_dedup": n_dedup,
                "after_span_clean": n_final,
                "passages_stripped": int(n_span_dropped),
                "split": {k: split_hist[k] for k in sorted(split_hist)},
                "surviving_tokens": int(tokens),
                "shards": {str(k): hist[k] for k in sorted(hist)},
            }
        )
    )


if __name__ == "__main__":
    main()
