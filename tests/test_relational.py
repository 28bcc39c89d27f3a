"""Oracle-differential tests for the relational operator catalog
(B-1..B-6) — mirrors the driver's gate (SURVEY.md §5.2 layer 1)."""

from __future__ import annotations

import pytest

from netcdf4_variable_streamer_spark.registry import REGISTRY

AGG_KEYS = [
    "q_agg_groupby_sum", "q_agg_having", "q_agg_distinct",
    "q_agg_approx_distinct", "q_agg_rollup", "q_agg_cube",
    "q_agg_grouping_sets", "q_agg_stats", "q_agg_collect",
    "q_agg_percentiles", "q_agg_median_mode", "q_agg_sketches",
]
SUBQUERY_KEYS = [
    "q_subquery_scalar", "q_subquery_scalar_corr",
    "q_subquery_exists", "q_subquery_in",
]
JOIN_KEYS = [
    "q_join_inner_hash", "q_join_left_outer", "q_join_full_outer",
    "q_join_semi", "q_join_anti", "q_join_broadcast_star",
    "q_join_theta_range", "q_join_range_bucketed", "q_join_asof", "q_join_cross",
    "q_join_skew_salted", "q_merge_scd1", "q_merge_scd2",
]
SET_KEYS = [
    "q_sort_multikey_nulls", "q_topk_global", "q_union_all",
    "q_union_distinct", "q_intersect", "q_except",
]


@pytest.mark.parametrize("key", AGG_KEYS + JOIN_KEYS + SET_KEYS + SUBQUERY_KEYS)
def test_oracle_match(check, key):
    assert key in REGISTRY
    check(key)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"n_name", "revenue"}


def test_contract_shape():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert set(o) == set(q), "every key must carry a DuckDB oracle"


def test_contract_canonical_order():
    """The driver verifies a bounded prefix of queries() per round; the
    first 50 must be exactly the committed SURVEY §2 Table B coverage
    set (registry.py CANONICAL_ORDER policy)."""
    import __spark_entry__ as e
    from netcdf4_variable_streamer_spark.registry import (
        CANONICAL_ORDER,
        REGISTRY,
    )

    keys = list(e.queries())
    assert keys[: len(CANONICAL_ORDER)] == [
        k for k in CANONICAL_ORDER if k in REGISTRY
    ]
    # no stale entries: every listed key exists
    missing = [k for k in CANONICAL_ORDER if k not in REGISTRY]
    assert not missing, f"CANONICAL_ORDER lists unknown keys: {missing}"
    # the window includes every round-1-unverified committed family
    window = set(keys[:50])
    committed_b8 = {
        "q_stream_tumbling", "q_stream_sliding", "q_stream_session",
        "q_stream_dedup", "q_stream_watermark_late",
        "q_stream_stateful_custom",
    }  # q_stream_join is addendum (round-1 green), outside the window
    assert committed_b8 <= window
    committed_b4 = {
        "q_win_rank_topk_group", "q_win_running_sum", "q_win_sliding_frame",
        "q_win_range_frame", "q_win_lead_lag", "q_win_ntile_pct",
        "q_win_first_last",
    }  # q_win_pattern_burst is addendum (round 2), outside the window
    assert committed_b4 <= window
    assert all(k in window for k in REGISTRY if k.startswith("q_udf"))
    for k in ("src_netcdf_chunked_scan", "src_netcdf_stream_tail",
              "snk_chunked_write", "q_filter_hyperslab",
              "q_text_stats", "q_text_tfidf_top",
              "q_agg_approx_distinct", "q_dedup_near_minhash",
              "q_dedup_simhash", "q_sim_lsh_ann"):
        assert k in window, k
