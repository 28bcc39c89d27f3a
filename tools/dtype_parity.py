"""Dtype-parity sweep: Spark DECLARED schema vs DuckDB oracle dtypes.

For every oracle-backed registry key, compare the Spark builder's declared
column types (plan-only — ``builder(spark, sf).schema`` costs no job
beyond what the builder itself runs) against the dtypes DuckDB's
``fetchdf()`` hands the driver at sf0.001. This catches the whole
HUGEINT→float64-vs-int64 class (19/20 of round 3's driver failures) in
seconds per key, listing EVERY divergent column, not just the first.

Rules (mirrors the driver's hash sensitivity):
- Spark integral type (byte/short/int/long) ⇒ oracle column must be an
  integer dtype — UNLESS the oracle column actually contains NULLs, in
  which case pandas widens int→float64 on BOTH sides identically and the
  driver can't tell (checked via isna()).
- Spark fractional type (float/double) ⇒ oracle must be float.
- Spark boolean ⇒ oracle must be bool.
- Spark array/map/struct output ⇒ hard error for oracle-backed keys (the
  driver's canonicalizer cannot hash ndarray cells).

Usage: python tools/dtype_parity.py [sf_dir] [key ...]
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import netcdf4_variable_streamer_spark.operators  # noqa: F401
import netcdf4_variable_streamer_spark.sources  # noqa: F401
import netcdf4_variable_streamer_spark.streaming  # noqa: F401
from netcdf4_variable_streamer_spark import oracle as oracle_mod
from netcdf4_variable_streamer_spark.registry import ordered_registry
from netcdf4_variable_streamer_spark.session import get_spark

_SPARK_INT = {"byte", "tinyint", "short", "smallint", "int", "integer",
              "bigint", "long"}
_SPARK_FLOAT = {"float", "double"}


def spark_kind(spark_type: str) -> str:
    t = spark_type.lower()
    if t in _SPARK_INT:
        return "int"
    if t in _SPARK_FLOAT:
        return "float"
    if t == "boolean":
        return "bool"
    if t.startswith(("array", "map", "struct")):
        return "nested"
    if t.startswith("decimal"):
        return "float"
    return "other"


def key_mismatches(spec, spark, con, sf_dir: str) -> list[str]:
    """All dtype-parity violations for one oracle-backed key."""
    sdf = spec.builder(spark, sf_dir)
    sdtypes = dict(sdf.dtypes)
    opdf = con.execute(spec.oracle).fetchdf()
    problems: list[str] = []
    for col, styp in sdtypes.items():
        sk = spark_kind(styp)
        if sk == "nested":
            problems.append(
                f"{col}: Spark {styp} is array/struct-typed — the driver "
                "cannot hash it; flatten both sides"
            )
            continue
        if col not in opdf.columns:
            problems.append(f"{col}: missing from oracle result")
            continue
        ok = oracle_mod.dtype_kind(opdf[col].dtype)
        if sk == "int" and ok == "float":
            if opdf[col].isna().any():
                continue  # genuine NULL widening — both engines widen
            problems.append(
                f"{col}: Spark {styp} but oracle float64 with no NULLs "
                "(HUGEINT leak — CAST the oracle expression AS BIGINT)"
            )
        elif sk == "float" and ok == "int":
            problems.append(
                f"{col}: Spark {styp} but oracle int — cast one side"
            )
        elif sk == "bool" and ok in ("int", "float"):
            problems.append(f"{col}: Spark boolean but oracle {ok}")
        elif sk in ("int", "bool") and ok == "object":
            problems.append(f"{col}: Spark {styp} but oracle object dtype")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("dtype-parity")
    con = oracle_mod.connect(sf_dir)
    bad = {}
    for key, spec in ordered_registry().items():
        if only and key not in only:
            continue
        if spec.oracle is None:
            continue
        try:
            problems = key_mismatches(spec, spark, con, sf_dir)
        except Exception as e:
            problems = ["ERROR: " + "".join(
                traceback.format_exception_only(type(e), e)).strip()[:300]]
        if problems:
            bad[key] = problems
            print(json.dumps({"key": key, "problems": problems}), flush=True)
    print(f"\n== {len(bad)} keys with dtype-parity problems", file=sys.stderr)
    for k in bad:
        print(k, file=sys.stderr)
    return len(bad)


if __name__ == "__main__":
    sys.exit(main())
