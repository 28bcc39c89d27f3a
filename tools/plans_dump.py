"""Dump ``.explain("formatted")`` for named registry keys (or the bench
keys by default) into plans/$SPARK_GRAFT_PLANS_DIR (default r20)/<key>_<tag>.txt.

    SPARK_GRAFT_SF_DIR=... python tools/plans_dump.py before [key1,key2,...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e  # noqa: E402
from netcdf4_variable_streamer_spark.session import get_spark  # noqa: E402

BENCH_DEFAULT = [
    "q_agg_groupby_sum", "q_topk_global", "q_join_broadcast_star",
    "q_win_rank_topk_group", "q_stream_session", "q_stream_tumbling",
    "q_dedup_exact", "q_sim_knn_cosine", "q_sim_knn_blocked", "q_fn_json",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    keys = sys.argv[2].split(",") if len(sys.argv) > 2 else BENCH_DEFAULT
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLANS_DIR", "r20"))
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("nvss-plans-dump")
    spark.sparkContext.setLogLevel("ERROR")
    q = e.queries()
    for key in keys:
        df = q[key](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{key}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
