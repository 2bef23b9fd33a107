"""Every registered query with an oracle must hash-match DuckDB at sf0.001.

This is the local mirror of the driver's CORRECTNESS gate (it runs the same
comparison at sf0.01).
"""

from __future__ import annotations

import pytest

from distributed_api_etl_spark.queries import load_all
from tests.oracle import assert_matches_oracle

REGISTRY = load_all()
NAMES = sorted(REGISTRY)

# Default-run core (VERDICT r16 #1 — the driver's pytest window must fit):
# every bench-tracked head plus the two alphabetically-first queries of
# every name-prefix family the bench set misses, so each operator family
# keeps oracle coverage in the default run. The rest of the registry is
# `slow` — same test, same oracle, selected with -m "slow or not slow"
# (run once per round; the driver's own CORRECTNESS gate replays the full
# registry against DuckDB independently of pytest anyway).
_FAST = {n for n in NAMES if REGISTRY[n].bench}
# These replays cost 2-10 MINUTES each (measured r17 full-tier run:
# decontaminated 620s, training_packs 166s, streaming recipe 159s, ...) —
# the single-threaded DuckDB side of the composed recipe/pack oracles, not
# Spark. Together they were half the r16 suite wall, which is what
# truncated the driver's window. All eight are replayed by the driver's own
# CORRECTNESS gate, and their Spark chains are exercised in the default run
# by test_pipeline_e2e and test_streaming.
_HEAVY_REPLAYS = {
    "documents_recipe_decontaminated",
    "documents_training_packs",
    "streaming_training_recipe",
    "documents_curation_budgeted",
    "streaming_recipe_crash_recovery",
    "documents_curation_pipeline",
    "documents_recipe_rate_budgeted",
    "documents_training_recipe",
}
_FAST -= _HEAVY_REPLAYS
_by_family: dict[str, list[str]] = {}
for _n in NAMES:
    _by_family.setdefault(_n.split("_")[0], []).append(_n)
for _fam, _members in _by_family.items():
    if not _FAST.intersection(_members):
        _FAST.update([m for m in _members if m not in _HEAVY_REPLAYS][:2])
PARAMS = [
    n if n in _FAST else pytest.param(n, marks=pytest.mark.slow) for n in NAMES
]


@pytest.mark.parametrize("name", PARAMS)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.build(spark, sf_dir)
    assert df is not None
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only smoke for non-SQL-expressible ops
        return
    assert_matches_oracle(df, spec.oracle, sf_dir)


def test_sweep_sf_dir_honors_oracle_max_sf():
    """Brute-force ground-truth oracles pin the LOCAL sweep scale
    (ADVICE r8 #3): above the pin the sweep substitutes the pinned
    sibling dir; at or below, and for unpinned specs or unparseable
    dirs, the input passes through."""
    from distributed_api_etl_spark.queries.registry import sweep_sf_dir

    pinned = REGISTRY["customer_name_damerau1_pairs"]
    assert pinned.oracle_max_sf == 0.01
    assert sweep_sf_dir(pinned, "/root/testdata/sf0.1") == "/root/testdata/sf0.01"
    assert sweep_sf_dir(pinned, "/root/testdata/sf0.01") == "/root/testdata/sf0.01"
    assert sweep_sf_dir(pinned, "/root/testdata/sf0.001") == "/root/testdata/sf0.001"
    assert sweep_sf_dir(pinned, "/not/a/sf/dir") == "/not/a/sf/dir"
    unpinned = REGISTRY["dedup_exact"]
    assert sweep_sf_dir(unpinned, "/root/testdata/sf0.1") == "/root/testdata/sf0.1"
