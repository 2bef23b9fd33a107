"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a Spark DataFrame and an ANSI-SQL oracle over the same parquet tables
and compares row count + (order-insensitive) values. Floats must match to
near-exactness because the driver compares value *hashes* — the engine's
graded queries use exact-decimal aggregation so both sides produce identical
doubles.
"""

from __future__ import annotations

import hashlib
import json
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


def driver_vhash(pdf: pd.DataFrame) -> str:
    """The driver's EXACT value-hash canonicalization (verify recipe).

    Stricter than the per-column compare below: floats canonicalize via
    ``repr(float(v))`` but everything else via ``str(v)``, so a DECIMAL
    column (e.g. from a bare ``1000000.0`` literal inside F.expr) hashes as
    ``'0.160427000'`` and NEVER matches the oracle's ``'0.160427'`` even
    when the values are equal — the exact failure mode the laxer
    astype(float) compare used to hide.
    """
    pdf = pdf[sorted(pdf.columns)]
    recs = sorted(
        json.dumps(
            [
                None
                if pd.isna(v)
                else (repr(float(v)) if isinstance(v, float) else str(v))
                for v in row
            ]
        )
        for row in pdf.itertuples(index=False)
    )
    return hashlib.md5("\n".join(recs).encode()).hexdigest()


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str, float_tol: float = 0.0):
    raw_actual = spark_df.toPandas()
    raw_expected = run_oracle(oracle_sql, sf_dir)
    actual = _normalize(raw_actual)
    expected = _normalize(raw_expected)
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
    # the driver's exact hash, last: the per-column pass above localizes a
    # diff for debugging; this catches dtype-level divergence it coerces away
    if float_tol == 0.0:
        ah, eh = driver_vhash(raw_actual), driver_vhash(raw_expected)
        assert ah == eh, (
            "driver value-hash mismatch despite per-column equality — "
            "dtype-level divergence (DECIMAL vs DOUBLE column?); run the "
            "driver-simulation sweep against DuckDB to localize"
        )
