"""Local DuckDB-oracle differential harness (SURVEY.md §5.2).

Mirrors the driver's t2 check so parity failures surface in `pytest`
before the driver runs: for each declared query, run the Spark plan and
the oracle SQL over the same parquet fixtures and compare row count,
column names, and order-insensitive values.
"""

from __future__ import annotations

import datetime
import math
from typing import Any

import duckdb
import pandas as pd

from bigquery_etl_spark.sources.tables import TABLES


def run_duckdb(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).df()
    finally:
        con.close()


def _canon_cell(v: Any) -> Any:
    """Canonicalize one value for order-insensitive comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        v = round(v, 9)
        return 0.0 if v == 0 else v
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return _canon_cell(v.item())
    if isinstance(v, pd.Timestamp):
        return str(v.tz_localize(None) if v.tzinfo else v)
    if isinstance(v, datetime.datetime):
        return str(pd.Timestamp(v))
    if isinstance(v, datetime.date):
        # Spark DATE -> datetime.date, DuckDB DATE -> midnight Timestamp
        return str(pd.Timestamp(v))
    return v


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    out = []
    for t in df.itertuples(index=False):
        row = []
        for v in t:
            if v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
                row.append(None if v is pd.NaT else "NaN")
            elif hasattr(v, "tolist") and not hasattr(v, "item"):  # ndarray
                row.append(tuple(_canon_cell(x) for x in v.tolist()))
            else:
                row.append(_canon_cell(v))
        out.append(tuple(row))
    return sorted(out, key=repr)


# pandas dtype.kind -> comparison kind. The driver's value hash is
# dtype-strict (round-1 q_dq_report: Spark bigint 0 vs DuckDB HUGEINT->
# float64 0.0 hashed differently despite equal values), so the local
# harness must reject int-vs-float/bool-vs-int column pairs too.
_DTYPE_KIND = {"i": "int", "u": "int", "b": "bool", "f": "float"}


def _dtype_errs(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    errs: list[str] = []
    for c in spark_pdf.columns:
        sk = _DTYPE_KIND.get(spark_pdf[c].dtype.kind)
        ok = _DTYPE_KIND.get(oracle_pdf[c].dtype.kind)
        if sk == ok or sk is None or ok is None:
            continue  # object/datetime columns are canonicalized per-cell
        if {sk, ok} == {"int", "float"} and (
            spark_pdf[c].isna().any() or oracle_pdf[c].isna().any()
        ):
            # pandas forces nullable int columns to float64; both engines
            # hit the same coercion at the driver, so NULLs excuse it
            continue
        errs.append(
            f"column {c!r}: dtype kind differs spark={spark_pdf[c].dtype} "
            f"oracle={oracle_pdf[c].dtype} (driver hash is dtype-strict — "
            f"CAST the twin or the Spark column)"
        )
    return errs


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    errs: list[str] = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        errs.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return errs
    errs.extend(_dtype_errs(spark_pdf, oracle_pdf))
    if len(spark_pdf) != len(oracle_pdf):
        errs.append(f"row count differs: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_rows, o_rows = canon_rows(spark_pdf), canon_rows(oracle_pdf)
    if s_rows != o_rows:
        diffs = [
            (a, b)
            for a, b in zip(s_rows, o_rows)
            if a != b and not _rows_close(a, b)
        ]
        extra_s = s_rows[len(o_rows):]
        extra_o = o_rows[len(s_rows):]
        if diffs or extra_s or extra_o:
            sample = (diffs[:3] or list(zip(extra_s[:3], extra_o[:3])))
            errs.append(f"values differ ({len(diffs)} rows): sample={sample!r}")
    return errs


def _rows_close(a: tuple, b: tuple, rel: float = 1e-8) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if x == y:
            continue
        if isinstance(x, float) and isinstance(y, float):
            if math.isclose(x, y, rel_tol=rel, abs_tol=1e-9):
                continue
        return False
    return True
