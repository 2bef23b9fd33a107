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


@pytest.mark.parametrize("name", NAMES)
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
