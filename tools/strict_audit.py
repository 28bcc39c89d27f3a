"""Run every registry key through the strict oracle mirror — the full-board
local proxy for the driver's 50-key CORRECTNESS window (VERDICT r3 #6).

Usage:
    python tools/strict_audit.py [sf_dir] [key ...]

Writes one JSON line per key to stdout and a summary to stderr; exit code
is the number of failing keys. Keys without an oracle get a rows-only
check (presence + no array cells), mirroring the driver's weaker path.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import netcdf4_variable_streamer_spark.operators  # noqa: F401
import netcdf4_variable_streamer_spark.sources  # noqa: F401
import netcdf4_variable_streamer_spark.streaming  # noqa: F401
from netcdf4_variable_streamer_spark import oracle as oracle_mod
from netcdf4_variable_streamer_spark.registry import ordered_registry
from netcdf4_variable_streamer_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("strict-audit")
    con = oracle_mod.connect(sf_dir)
    reg = ordered_registry()
    fails: list[str] = []
    for key, spec in reg.items():
        if only and key not in only:
            continue
        t0 = time.time()
        rec: dict = {"key": key}
        try:
            spdf = spec.builder(spark, sf_dir).toPandas()
            rec["spark_rows"] = len(spdf)
            if spec.oracle is None:
                # rows-only contract — but still reject array cells, the
                # driver's canonicalizer dies on them
                oracle_mod.canon_rows(spdf.head(50))
                rec["status"] = "rows-only-ok"
            else:
                opdf = con.execute(spec.oracle).fetchdf()
                rec["oracle_rows"] = len(opdf)
                oracle_mod.compare_frames(spdf, opdf, key)
                rec["status"] = "ok"
        except Exception as e:
            rec["status"] = "FAIL"
            rec["err"] = "".join(
                traceback.format_exception_only(type(e), e)
            ).strip()[:500]
            fails.append(key)
        rec["sec"] = round(time.time() - t0, 2)
        print(json.dumps(rec), flush=True)
    print(
        f"\n== {len(fails)} failing / {len(reg) if not only else len(only)}: "
        f"{fails}",
        file=sys.stderr,
    )
    return len(fails)


if __name__ == "__main__":
    sys.exit(main())
