"""Oracle-differential tests for B-1 projection, B-4 windows, B-7 scalar
functions and B-9 UDF surface."""

from __future__ import annotations

import pytest

PROJ_KEYS = ["src_parquet_scan", "q_project_rename_cast", "q_filter_predicates"]
WIN_KEYS = [
    "q_win_rank_topk_group", "q_win_running_sum", "q_win_sliding_frame",
    "q_win_range_frame", "q_win_lead_lag", "q_win_ntile_pct",
    "q_win_first_last",
]
FN_KEYS = [
    "q_fn_string", "q_fn_date", "q_fn_math", "q_fn_cond", "q_fn_array",
    "q_fn_map", "q_fn_json", "q_fn_variant", "q_fn_url",
]
UDF_KEYS = [
    "q_udf_row", "q_udf_pandas", "q_udaf_pandas", "q_udtf_split",
    "q_map_in_arrow",
]


@pytest.mark.parametrize("key", PROJ_KEYS + WIN_KEYS + FN_KEYS + UDF_KEYS)
def test_oracle_match(check, key):
    check(key)
