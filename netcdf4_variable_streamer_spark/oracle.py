"""DuckDB oracle harness — mirrors the driver's correctness gate locally.

The driver runs each ``queries()[key]`` on Spark and ``oracle_sql()[key]``
on DuckDB over the same parquet at sf0.01, then compares row-count +
schema + order-insensitive value-hash. This module reproduces that
comparison so failures are debuggable offline (SURVEY.md §5.2 layer 1).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from netcdf4_variable_streamer_spark.tables import TABLE_NAMES


def connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # normalize -0.0
        if v.is_integer() and abs(v) < 2**53:
            return int(v)
        return v
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon_value(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return _canon_value(v.item())
    if isinstance(v, pd.Timestamp):
        return str(v)
    return v


def canon_rows(pdf: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    """(sorted column names, rows canonicalized+sorted) — order-insensitive."""
    cols = sorted(pdf.columns)
    rows = [
        tuple(_canon_value(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    rows.sort(key=repr)
    return cols, rows


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, key: str = "?"):
    """Assert the two results match the way the driver's hash would."""
    sc, srows = canon_rows(spark_pdf)
    oc, orows = canon_rows(oracle_pdf)
    assert sc == oc, f"{key}: column mismatch spark={sc} oracle={oc}"
    assert len(srows) == len(orows), (
        f"{key}: rowcount mismatch spark={len(srows)} oracle={len(orows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b
    ]
    if mismatches:
        i, a, b = mismatches[0]
        raise AssertionError(
            f"{key}: {len(mismatches)}/{len(srows)} row mismatches; first at "
            f"sorted-row {i}:\n  spark : {a}\n  oracle: {b}\n  cols: {sc}"
        )
