"""Composed reporting queries — full-pipeline compositions of the
relational spine (filter → multi-join → aggregate → join → window →
top-k), in the shape of the classic warehouse reports (TPC-H Q10/Q8
forms). These exist to prove the operators compose into real analyst
queries under one declarative plan, with the same hash-match hygiene as
the atomic keys (cent fixed point, ppm shares, total-order top-k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from netcdf4_variable_streamer_spark.registry import register
from netcdf4_variable_streamer_spark.tables import load_table

# revenue at cent fixed point: per-row FLOOR of an identical double
# expression is engine-exact; the BIGINT sum is order-independent
_REV = "FLOOR(l_extendedprice * (1 - l_discount) * 100)"


@register(
    "q_report_top_returns",
    oracle=f"""
WITH r AS (
  SELECT o.o_custkey,
         SUM(CAST({_REV} AS BIGINT)) AS revenue_cents,
         COUNT(*) AS n_items
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate <  TIMESTAMP '1996-07-01'
  GROUP BY o.o_custkey
)
SELECT c.c_custkey, c.c_name, n.n_name, r.revenue_cents, r.n_items
FROM r
JOIN customer c ON c.c_custkey = r.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
ORDER BY r.revenue_cents DESC, c.c_custkey
LIMIT 20
""",
    doc="TPC-H Q10 shape — 'customers who returned the most revenue in a "
        "quarter': filtered lineitem joins orders (predicate pushed to "
        "both scans), aggregates PER CUSTOMER KEY FIRST, and only the "
        "|custkeys|-sized aggregate joins the customer dimension (nation "
        "broadcasts). The aggregate-before-join order is the load-"
        "bearing choice at 100 TB: the fact-side shuffle carries "
        "(custkey, partial sum), never enriched fact rows. Top-20 is "
        "TakeOrderedAndProject with the (revenue DESC, custkey) total "
        "order.",
)
def q_report_top_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    )
    r = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.sum(F.expr(_REV).cast("long")).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        r.join(c, r.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", "c_name", "n_name", "revenue_cents", "n_items")
        .orderBy(F.desc("revenue_cents"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q_report_market_share",
    oracle=f"""
WITH v AS (
  SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
         n.n_name,
         SUM(CAST({_REV} AS BIGINT)) AS revenue_cents
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY o_year, n.n_name
)
SELECT CAST(o_year AS BIGINT) AS o_year, n_name, revenue_cents,
       revenue_cents * 1000000 // SUM(revenue_cents) OVER (PARTITION BY o_year)
         AS share_ppm
FROM v
""",
    doc="TPC-H Q8 shape — each nation's share of yearly revenue: the "
        "fact stream joins orders (co-partitioned on orderkey), the "
        "customer join carries only (custkey, nationkey), nation "
        "broadcasts, and the two-level aggregate (nation-year cells, "
        "then a window over the |nations| rows per year for the share) "
        "never rescans. ppm shares are integer-exact. At 100 TB the "
        "only large shuffles are the two fact-side equi-joins; the "
        "share window runs over |years × nations| rows — trivial.",
)
def q_report_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation")
    v = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.year("o_orderdate").cast("long").alias("o_year"), "n_name"
        )
        .agg(F.sum(F.expr(_REV).cast("long")).alias("revenue_cents"))
    )
    w = Window.partitionBy("o_year")
    return v.select(
        "o_year",
        "n_name",
        "revenue_cents",
        F.floor(
            F.col("revenue_cents") * 1000000 / F.sum("revenue_cents").over(w)
        )
        .cast("long")
        .alias("share_ppm"),
    )
