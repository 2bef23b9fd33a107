"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a Spark DataFrame and an ANSI-SQL oracle over the same parquet tables
and compares row count + (order-insensitive) values. Floats must match to
near-exactness because the driver compares value *hashes* — the engine's
graded queries use exact-decimal aggregation so both sides produce identical
doubles.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from distributed_api_etl_spark.queries.registry import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.sql(sql).df()
    finally:
        con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    if len(df):
        df = df.sort_values(by=list(df.columns), key=lambda s: s.map(str)).reset_index(
            drop=True
        )
    return df


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str, float_tol: float = 0.0):
    actual = _normalize(spark_df.toPandas())
    expected = _normalize(run_oracle(oracle_sql, sf_dir))
    assert list(actual.columns) == list(expected.columns), (
        f"column mismatch: spark={list(actual.columns)} oracle={list(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"row count mismatch: spark={len(actual)} oracle={len(expected)}"
    )
    for c in actual.columns:
        a, e = actual[c], expected[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(e):
            for i, (x, y) in enumerate(zip(a.astype(float), e.astype(float))):
                if pd.isna(x) and pd.isna(y):
                    continue
                ok = (x == y) if float_tol == 0.0 else math.isclose(
                    x, y, rel_tol=float_tol, abs_tol=float_tol
                )
                assert ok, f"col {c} row {i}: spark={x!r} oracle={y!r} (diff={x - y!r})"
        else:
            mism = a.astype(str).fillna("") != e.astype(str).fillna("")
            if mism.any():
                i = int(mism.idxmax())
                raise AssertionError(
                    f"col {c} row {i}: spark={a[i]!r} oracle={e[i]!r}"
                )
