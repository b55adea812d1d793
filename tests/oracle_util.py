"""Driver-style DuckDB oracle comparison: row count + schema + values."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _dtype_kind(s: pd.Series) -> str:
    """Coarse dtype class used for driver-parity strictness.

    The driver's value hash is dtype-strict: a BIGINT Spark column vs a
    DOUBLE oracle column hash-mismatches even when every value is equal
    (r12's `ks_drift_grouped` red row — DuckDB sum() -> HUGEINT ->
    float64 vs Spark BIGINT).  The old int<->float coercion below let
    exactly that class pass CI, so we additionally require matching
    dtype *kind* (integral / floating / boolean / datetime / other),
    modulo width.
    """
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "other"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    import datetime

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif df[c].dtype == object:
            # Spark DATE columns arrive as object-of-datetime.date while
            # DuckDB DATE arrives as datetime64 — the same engine type,
            # different pandas conversions; normalize before the strict
            # dtype-kind check so only REAL engine dtype diffs flag.
            first = df[c].dropna()
            if len(first) and isinstance(
                    first.iloc[0], (datetime.date, datetime.datetime)):
                df[c] = pd.to_datetime(df[c])
            else:
                df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(spark_df, con, sql: str, name: str = "") -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    got = spark_df.toPandas()
    want = con.execute(sql).df()
    if len(got) != len(want):
        problems.append(f"{name}: row count spark={len(got)} oracle={len(want)}")
    if sorted(got.columns) != sorted(want.columns):
        problems.append(f"{name}: columns spark={sorted(got.columns)} oracle={sorted(want.columns)}")
        return problems
    g, w = _canon(got), _canon(want)
    if len(g) != len(w):
        return problems
    for c in g.columns:
        gk, wk = _dtype_kind(g[c]), _dtype_kind(w[c])
        if gk != wk:
            problems.append(
                f"{name}: column '{c}' dtype kind differs "
                f"(spark={g[c].dtype}/{gk} oracle={w[c].dtype}/{wk}) — "
                f"the driver hash is dtype-strict; CAST the oracle side"
            )
    for c in g.columns:
        gc, wc = g[c], w[c]
        if pd.api.types.is_float_dtype(gc) or pd.api.types.is_float_dtype(wc):
            ok = np.allclose(gc.astype(float), wc.astype(float), rtol=0, atol=1e-9, equal_nan=True)
        else:
            ok = gc.equals(wc) or (gc.astype(str) == wc.astype(str)).all()
        if not ok:
            diff_idx = None
            try:
                mism = (gc.astype(str) != wc.astype(str))
                diff_idx = mism.idxmax()
            except Exception:
                pass
            problems.append(
                f"{name}: column '{c}' differs (e.g. row {diff_idx}: "
                f"spark={gc.iloc[diff_idx] if diff_idx is not None else '?'} "
                f"oracle={wc.iloc[diff_idx] if diff_idx is not None else '?'})"
            )
    return problems
