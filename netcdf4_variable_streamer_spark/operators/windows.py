"""B-4 window-function operators (SURVEY.md §2 Table B).

Absent from the reference. Every window order carries a total
deterministic key (SURVEY §7.5) — ties on the payload column would make
rank/frame results engine-dependent otherwise. At 100 TB the partition
key (user_id / custkey / suppkey) is the shuffle key; no global windows
without partitionBy anywhere (a global window is a single-task sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from netcdf4_variable_streamer_spark.registry import register
from netcdf4_variable_streamer_spark.tables import load_table


@register(
    "q_win_rank_topk_group",
    oracle="""
SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice,
       CAST(rn AS BIGINT) AS rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) t
WHERE rn <= 3
""",
    doc="Top-3 orders per customer via row_number (per-group top-k: "
        "window + filter, never a global sort).",
)
def q_win_rank_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


@register(
    "q_win_running_sum",
    oracle="""
SELECT event_id, user_id,
       ROUND(SUM(value) OVER (PARTITION BY user_id
                              ORDER BY ts::TIMESTAMP, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             4) AS running_value
FROM events
""",
    doc="Running total per user (cumulative frame).",
)
def q_win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 4).alias("running_value"),
    )


@register(
    "q_win_sliding_frame",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(AVG(l_extendedprice) OVER (
         PARTITION BY l_suppkey
         ORDER BY l_shipdate, l_orderkey, l_linenumber
         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS mov_avg_price
FROM lineitem
""",
    doc="Moving average over a 4-row sliding frame per supplier.",
)
def q_win_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-3, 0)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.avg("l_extendedprice").over(w), 4).alias("mov_avg_price"),
    )


@register(
    "q_win_range_frame",
    oracle="""
SELECT o_orderkey,
       CAST(COUNT(*) OVER (
         PARTITION BY o_orderstatus ORDER BY o_totalprice
         RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_in_price_band
FROM orders
""",
    doc="RANGE frame on a numeric key: peers within a 10k price band.",
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, 0)
    )
    return o.select(
        "o_orderkey",
        F.count(F.lit(1)).over(w).cast("long").alias("n_in_price_band"),
    )


@register(
    "q_win_lead_lag",
    oracle="""
SELECT event_id, user_id,
       EPOCH_US(ts::TIMESTAMP)
         - LAG(EPOCH_US(ts::TIMESTAMP)) OVER w AS gap_us,
       LEAD(event_type) OVER w AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id)
""",
    doc="lag/lead: inter-event gap (µs, exact integer) + next event type.",
)
def q_win_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet ts arrives as TIMESTAMP_NTZ; unix_micros wants LTZ — identity
    # conversion under the engine's UTC session tz (same shim as q_fn_date).
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    return e.select(
        "event_id",
        "user_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "q_win_ntile_pct",
    oracle="""
SELECT c_custkey,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume
FROM customer
WINDOW w AS (ORDER BY c_acctbal, c_custkey)
""",
    doc="ntile/percent_rank/cume_dist over account balance.",
)
def q_win_ntile_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "q_win_first_last",
    oracle="""
SELECT o_orderkey, o_custkey,
       FIRST_VALUE(o_orderkey) OVER w AS first_order,
       LAST_VALUE(o_orderkey) OVER w AS last_order,
       NTH_VALUE(o_orderkey, 2) OVER w AS second_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    doc="first/last/nth value with an explicit full-partition frame "
        "(default frame would make last_value = current row).",
)
def q_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


@register(
    "q_win_drawdown",
    oracle="""
WITH b AS (
  SELECT user_id, ts::TIMESTAMP AS ts, event_id,
         SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS bal
  FROM events
),
p AS (
  SELECT user_id, event_id, bal,
         MAX(bal) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS peak
  FROM b
)
SELECT user_id,
       CAST(MAX(peak - bal) AS BIGINT) AS max_drawdown_cents,
       CAST(MAX(peak) AS BIGINT) AS peak_cents,
       CAST(MAX(CASE WHEN peak = bal THEN 0 ELSE 1 END) AS BIGINT)
         AS ever_below_peak
FROM p GROUP BY user_id
""",
    doc="Maximum DRAWDOWN per user (round 12 — the nested-cumulative "
        "pattern risk/finance dashboards run constantly: running "
        "balance, running PEAK of that balance, max gap between the "
        "two): two stacked cumulative windows over ONE (user_id) "
        "partitioning with a total (ts, event_id) order, all in "
        "integer cents — no float accumulation anywhere. The plan "
        "shape is the point: both window passes and the final "
        "per-user agg reuse a single hash partitioning, so the whole "
        "operator costs one shuffle at any scale.",
)
def q_win_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    b = e.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(F.floor(F.col("value") * 100).cast("long"))
        .over(cum)
        .alias("bal"),
    )
    p = b.select(
        "user_id",
        "bal",
        F.max("bal").over(cum).alias("peak"),
    )
    return p.groupBy("user_id").agg(
        F.max(F.col("peak") - F.col("bal")).alias("max_drawdown_cents"),
        F.max("peak").alias("peak_cents"),
        F.max(
            F.when(F.col("peak") == F.col("bal"), 0).otherwise(1)
        ).cast("long").alias("ever_below_peak"),
    )
