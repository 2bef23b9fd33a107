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
