"""DuckDB oracle harness — mirrors the driver's correctness gate locally.

The driver runs each ``queries()[key]`` on Spark and ``oracle_sql()[key]``
on DuckDB over the same parquet at sf0.01, then compares row-count +
schema + order-insensitive value-hash. This module reproduces that
comparison so failures are debuggable offline (SURVEY.md §5.2 layer 1).

Strictness (round-4 fix, VERDICT r3 "What's wrong" #1/#2): the driver's
hash distinguishes ``20123.0`` from ``20123`` — DuckDB returns HUGEINT
for ``SUM(BIGINT)``, ``fetchdf()`` converts HUGEINT to float64, and a
Spark int64 column then hash-mismatches even though the values are
numerically equal. The round-1..3 mirror normalized integral floats to
int before comparing, which hid exactly that class (19 of round 3's 20
driver failures). This mirror is now dtype-strict:

- column dtype KINDS must agree (int vs float vs bool) — caught even on
  empty results;
- row tuples are compared by ``repr`` (so ``5 != 5.0`` and ``True != 1``
  even though Python ``==`` says otherwise);
- array/list-valued cells raise immediately — the driver's pandas
  canonicalizer (``sort_values`` → factorize) dies on ndarray cells, so
  an array output column is a guaranteed driver error (r3's
  ``q_text_inverted_index``).
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


def _canon_value(v, col: str = "?"):
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        raise AssertionError(
            f"array-typed cell in column {col!r}: the driver's pandas "
            "canonicalizer cannot hash arrays (unhashable ndarray) — "
            "flatten with array_join / array_to_string in BOTH the "
            "builder and the oracle SQL"
        )
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # normalize -0.0
        return v
    if hasattr(v, "item"):  # numpy scalar → python scalar (bool_→bool etc.)
        return _canon_value(v.item(), col)
    if isinstance(v, pd.Timestamp):
        return str(v)
    return v


def dtype_kind(dtype) -> str:
    """Collapse a pandas dtype to the kind the driver's hash distinguishes."""
    kind = getattr(dtype, "kind", "O")
    if kind in ("i", "u"):
        return "int"
    if kind == "f":
        return "float"
    if kind == "b":
        return "bool"
    if kind == "M":
        return "datetime"
    return "object"


_STRICT_KINDS = {"int", "float", "bool"}


def check_dtype_parity(
    spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, key: str = "?"
) -> None:
    """Fail on int-vs-float / bool-vs-numeric column kind divergence.

    This is the class the driver's value-hash trips on even when the
    values are numerically identical (DuckDB HUGEINT → pandas float64 vs
    Spark int64). Checked per-column BEFORE the value compare so empty
    results are covered too.
    """
    for c in sorted(set(spark_pdf.columns) & set(oracle_pdf.columns)):
        sk = dtype_kind(spark_pdf[c].dtype)
        ok = dtype_kind(oracle_pdf[c].dtype)
        if sk != ok and (sk in _STRICT_KINDS or ok in _STRICT_KINDS):
            raise AssertionError(
                f"{key}: dtype-kind mismatch on column {c!r}: "
                f"spark={spark_pdf[c].dtype} ({sk}) vs "
                f"oracle={oracle_pdf[c].dtype} ({ok}) — the driver hashes "
                "e.g. 20123.0 != 20123; CAST the oracle expression to "
                "BIGINT (HUGEINT sums) or align the Spark cast"
            )


def canon_rows(pdf: pd.DataFrame) -> tuple[list[str], list[str]]:
    """(sorted column names, canonicalized rows as sorted reprs).

    Repr-level rows mirror the driver's string-hash: ``5.0`` and ``5``
    (and ``True`` vs ``1``) differ even though Python ``==`` equates
    them.
    """
    cols = sorted(pdf.columns)
    rows = [
        repr(tuple(_canon_value(v, c) for c, v in zip(cols, row)))
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return cols, rows


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, key: str = "?"):
    """Assert the two results match the way the driver's hash would."""
    sc = sorted(spark_pdf.columns)
    oc = sorted(oracle_pdf.columns)
    assert sc == oc, f"{key}: column mismatch spark={sc} oracle={oc}"
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{key}: rowcount mismatch spark={len(spark_pdf)} "
        f"oracle={len(oracle_pdf)}"
    )
    check_dtype_parity(spark_pdf, oracle_pdf, key)
    _, srows = canon_rows(spark_pdf)
    _, orows = canon_rows(oracle_pdf)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b
    ]
    if mismatches:
        i, a, b = mismatches[0]
        raise AssertionError(
            f"{key}: {len(mismatches)}/{len(srows)} row mismatches; first at "
            f"sorted-row {i}:\n  spark : {a}\n  oracle: {b}\n  cols: {sc}"
        )
