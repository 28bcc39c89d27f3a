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
         CAST(SUM(CAST({_REV} AS BIGINT)) AS BIGINT) AS revenue_cents,
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
         CAST(SUM(CAST({_REV} AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY o_year, n.n_name
)
SELECT CAST(o_year AS BIGINT) AS o_year, n_name, revenue_cents,
       CAST(revenue_cents * 1000000
            // SUM(revenue_cents) OVER (PARTITION BY o_year) AS BIGINT)
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


@register(
    "q_basket_pairs",
    oracle="""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         COUNT(*) AS support
  FROM items a
  JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT part_a, part_b, support FROM pairs
WHERE support >= 2
ORDER BY support DESC, part_a, part_b
LIMIT 100
""",
    doc="Market-basket pair mining (a-priori candidate generation): "
        "distinct items per order, intra-order pair expansion via a "
        "self-equi-join on the order key with `part_a < part_b` "
        "dedup/orientation, pair-support count, min-support filter, "
        "deterministic top-k. Shape at 100 TB: both join sides share "
        "one hash partitioning on l_orderkey, so the pair expansion is "
        "co-located (one shuffle) and its output is bounded by "
        "sum(basket_size^2) — basket sizes are small constants in real "
        "carts, so the blow-up factor is ~k^2/2 per order, not "
        "quadratic in the table; the support agg map-side-combines and "
        "the min-support filter kills the long tail before the global "
        "top-k (TakeOrdered, no full sort).",
)
def q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    sup = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
    )
    return (
        sup.filter(F.col("support") >= 2)
        .orderBy(F.desc("support"), "part_a", "part_b")
        .limit(100)
    )


_Q3 = "array(CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE), CAST(0.75 AS DOUBLE))"


@register(
    "q_rfm_segments",
    oracle="""
WITH cust AS (
  SELECT o_custkey,
         MAX(CAST(o_orderdate AS DATE)) AS last_dt,
         COUNT(*) AS f,
         SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS m_cents
  FROM orders GROUP BY o_custkey
),
ref AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS ref_dt FROM orders),
c2 AS (
  SELECT o_custkey,
         CAST(DATE_DIFF('day', last_dt, ref_dt) AS BIGINT) AS r_days,
         f, m_cents
  FROM cust, ref
),
th AS (
  SELECT quantile_cont(r_days, [0.25, 0.5, 0.75]) AS tr,
         quantile_cont(f, [0.25, 0.5, 0.75]) AS tf,
         quantile_cont(m_cents, [0.25, 0.5, 0.75]) AS tm
  FROM c2
),
s AS (
  SELECT CAST(1 + CAST(r_days > tr[1] AS INT) + CAST(r_days > tr[2] AS INT)
              + CAST(r_days > tr[3] AS INT) AS BIGINT) AS r_score,
         CAST(1 + CAST(f > tf[1] AS INT) + CAST(f > tf[2] AS INT)
              + CAST(f > tf[3] AS INT) AS BIGINT) AS f_score,
         CAST(1 + CAST(m_cents > tm[1] AS INT) + CAST(m_cents > tm[2] AS INT)
              + CAST(m_cents > tm[3] AS INT) AS BIGINT) AS m_score,
         m_cents
  FROM c2, th
)
SELECT r_score, f_score, m_score,
       COUNT(*) AS n_customers,
       CAST(SUM(m_cents) AS BIGINT) AS sum_m_cents
FROM s GROUP BY 1, 2, 3
""",
    doc="RFM customer segmentation: per-customer recency (days since "
        "last order vs corpus max date), frequency, monetary rollup, "
        "then quartile scoring of each axis against EXACT interpolated "
        "quartile thresholds (Spark `percentile` and DuckDB "
        "quantile_cont share the (n-1)*p linear-interpolation "
        "definition; inputs are integers so the interpolated doubles "
        "are bit-identical), and a |4^3|-bounded segment readout. "
        "Shape at 100 TB: one shuffle for the per-customer rollup "
        "(map-side combine), the thresholds are ONE 9-number row "
        "broadcast back (never a global sort — this is why scores are "
        "threshold-comparisons, not ntile over a single partition), "
        "and the final agg is 64 rows. The scalar max-date row is also "
        "a broadcast cross join, not a driver collect.",
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_dt"),
        F.count(F.lit(1)).alias("f"),
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias(
            "m_cents"
        ),
    )
    ref = o.agg(F.max(F.to_date("o_orderdate")).alias("ref_dt"))
    c2 = cust.crossJoin(F.broadcast(ref)).select(
        "o_custkey",
        F.datediff("ref_dt", "last_dt").cast("long").alias("r_days"),
        "f",
        "m_cents",
    )
    th = c2.agg(
        F.expr(f"percentile(r_days, {_Q3})").alias("tr"),
        F.expr(f"percentile(f, {_Q3})").alias("tf"),
        F.expr(f"percentile(m_cents, {_Q3})").alias("tm"),
    )

    def score(col: str, t: str) -> F.Column:
        return (
            F.lit(1)
            + (F.col(col) > F.col(t)[0]).cast("int")
            + (F.col(col) > F.col(t)[1]).cast("int")
            + (F.col(col) > F.col(t)[2]).cast("int")
        ).cast("long")

    s = c2.crossJoin(F.broadcast(th)).select(
        score("r_days", "tr").alias("r_score"),
        score("f", "tf").alias("f_score"),
        score("m_cents", "tm").alias("m_score"),
        "m_cents",
    )
    return s.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("m_cents").alias("sum_m_cents"),
    )


@register(
    "q_report_volume_shipping",
    oracle=f"""
SELECT ns.n_name AS supp_nation,
       nc.n_name AS cust_nation,
       CAST(YEAR(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST({_REV} AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_items
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
WHERE ((ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_7')
    OR (ns.n_name = 'NATION_7' AND nc.n_name = 'NATION_3'))
GROUP BY supp_nation, cust_nation, l_year
""",
    doc="Volume-shipping report (TPC-H Q7 form): bilateral trade revenue "
        "between a nation pair by ship year — lineitem joined to the "
        "supplier-side nation AND (through orders/customer) the "
        "customer-side nation, pair-filtered both directions, grouped "
        "by (supp_nation, cust_nation, year) in integer cents. Plan "
        "shape at 100 TB: supplier/nation/customer are broadcast dims "
        "(customer's nationkey is what's needed — column pruning keeps "
        "the broadcast thin), orders⋈lineitem is the one big keyed "
        "shuffle, and BOTH nation filters cut the fact rows before the "
        "aggregation; six tables, one declarative plan, zero windows.",
)
def q_report_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    ns = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    nc = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(F.broadcast(s.select("s_suppkey", "s_nationkey")),
                li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
        .join(o.select("o_orderkey", "o_custkey"),
              li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_3")
                & (F.col("cust_nation") == "NATION_7")
            )
            | (
                (F.col("supp_nation") == "NATION_7")
                & (F.col("cust_nation") == "NATION_3")
            )
        )
    )
    return j.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("long").alias("l_year"),
    ).agg(
        F.sum(F.expr(_REV).cast("long")).alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q_report_promo_share",
    oracle=f"""
WITH j AS (
  SELECT p.p_type, CAST({_REV} AS BIGINT) AS rev
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
    AND l.l_shipdate <  TIMESTAMP '1996-04-01'
)
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS BIGINT)
         AS promo_cents,
       CAST(SUM(rev) AS BIGINT) AS total_cents,
       CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) * 1000000
            // SUM(rev) AS BIGINT) AS promo_ppm
FROM j
""",
    doc="Promotion-revenue share (TPC-H Q14 form): one month of "
        "lineitem joined to part, promo-typed revenue as an integer-ppm "
        "share of total — the conditional-aggregate-over-join report. "
        "Plan at 100 TB: the date filter pushes to the fact scan "
        "(partition/row-group pruning does the real work), part "
        "broadcasts (only p_partkey/p_type after pruning), one "
        "conditional hash agg to a single row; ppm division happens "
        "once on the aggregated BIGINTs so the share is engine-exact.",
)
def q_report_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "p_type", F.expr(_REV).cast("long").alias("rev")
    )
    promo = F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev")).otherwise(0))
    total = F.sum("rev")
    return j.agg(
        promo.alias("promo_cents"),
        total.alias("total_cents"),
        F.expr(
            "sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) * 1000000"
            " div sum(rev)"
        ).alias("promo_ppm"),
    )


@register(
    "q_report_nation_profit",
    oracle=f"""
SELECT n.n_name AS nation,
       CAST(YEAR(l.l_shipdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST({_REV} AS BIGINT)
                - CAST(FLOOR(p.p_retailprice * 10) AS BIGINT)
                  * CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS profit_cents
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_type = 'ECONOMY'
GROUP BY nation, o_year
""",
    doc="Product-line profit by supplier nation and year (TPC-H Q9 "
        "form, cost modeled as 10% of part retail price per unit — the "
        "fixture has no partsupp table, documented proxy): revenue "
        "minus cost in integer cents/deci-cents, part-type filtered, "
        "grouped by (nation, year). Plan at 100 TB: the p_type filter "
        "prunes part BEFORE the broadcast (a semi-join pushdown by "
        "construction), supplier/nation broadcast, lineitem never "
        "shuffles until the final keyed agg — the canonical "
        "star-with-selective-dim shape.",
)
def q_report_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey", "p_retailprice")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey"), F.col("n_name").alias("nation")
    )
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    profit = F.expr(_REV).cast("long") - (
        F.floor(F.col("p_retailprice") * 10).cast("long")
        * F.col("l_quantity").cast("long")
    )
    return j.groupBy(
        "nation", F.year("l_shipdate").cast("long").alias("o_year")
    ).agg(F.sum(profit).alias("profit_cents"))


@register(
    "q_report_waiting_orders",
    oracle="""
WITH lo AS (
  SELECT l.l_orderkey AS ok, l.l_suppkey AS sk,
         (l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) AS late
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
st AS (
  SELECT ok,
         COUNT(DISTINCT sk) AS n_supp,
         COUNT(DISTINCT CASE WHEN late THEN sk END) AS n_late
  FROM lo GROUP BY ok
),
blamed AS (
  SELECT lo.sk
  FROM lo JOIN st USING (ok)
  WHERE lo.late AND st.n_supp >= 2 AND st.n_late = 1
)
SELECT s.s_name, COUNT(*) AS numwait
FROM blamed b
JOIN supplier s ON s.s_suppkey = b.sk
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_nationkey < 5
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 50
""",
    doc="WAITING-ORDERS report (round 12 — the TPC-H Q21 shape "
        "rewritten scalably; the dataset carries no "
        "receipt/commit dates, so 'late' = shipped more than 90 days "
        "after the order date): suppliers who were the SOLE late "
        "supplier on a multi-supplier order, counted per late line. "
        "The classic EXISTS / NOT-EXISTS pair over lineitem is "
        "rewritten as ONE per-order aggregation (distinct suppliers, "
        "distinct late suppliers) joined back to the late lines — the "
        "decorrelated form that needs one orderkey shuffle instead of "
        "two correlated re-scans of the fact. Supplier and nation "
        "broadcast thin; top-50 by (numwait DESC, name) is a total "
        "order via TakeOrderedAndProject, never a global sort.",
)
def q_report_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    lo = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            od.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("l_orderkey").alias("ok"),
            F.col("l_suppkey").alias("sk"),
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
            ).alias("late"),
        )
    )
    st = lo.groupBy("ok").agg(
        F.countDistinct("sk").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("sk"))).alias(
            "n_late"
        ),
    )
    blamed = (
        lo.filter(F.col("late"))
        .join(st, "ok")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    )
    dim = F.broadcast(
        su.join(na, su.s_nationkey == na.n_nationkey).filter(
            F.col("n_nationkey") < 5
        ).select("s_suppkey", "s_name")
    )
    return (
        blamed.join(dim, blamed.sk == dim.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(50)
    )


@register(
    "q_report_idle_rich_customers",
    oracle="""
WITH c AS (
  SELECT c_custkey, c_nationkey,
         CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
),
thr AS (
  SELECT CAST(SUM(cents) AS BIGINT) AS sum_pos,
         COUNT(*) AS n_pos
  FROM c WHERE cents > 0
),
idle AS (
  SELECT c.c_nationkey, c.cents
  FROM c CROSS JOIN thr
  WHERE c.cents * thr.n_pos > thr.sum_pos
    AND NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
)
SELECT c_nationkey,
       COUNT(*) AS n_custs,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM idle GROUP BY c_nationkey ORDER BY c_nationkey
""",
    doc="IDLE-RICH-CUSTOMERS report (round 12 — the TPC-H Q22 shape): "
        "customers whose balance beats the positive-balance average "
        "but who never placed an order, grouped by nation. The global "
        "threshold is a 1-row aggregate BROADCAST back and the "
        "comparison is integer cross-multiplication over cents "
        "(cents * n_pos > sum_pos — no float division, no averaging "
        "drift); the never-ordered check is a LEFT ANTI join against "
        "the orders custkey table. Shape: one |customers| scan + a "
        "1-row broadcast + one anti join whose right side collapses "
        "to distinct custkeys — the Q22 correlated NOT EXISTS "
        "decorrelated by construction.",
)
def q_report_idle_rich_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    c = cu.select(
        "c_custkey",
        "c_nationkey",
        F.floor(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    thr = c.filter(F.col("cents") > 0).agg(
        F.sum("cents").alias("sum_pos"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    rich = c.crossJoin(F.broadcast(thr)).filter(
        F.col("cents") * F.col("n_pos") > F.col("sum_pos")
    )
    idle = rich.join(
        od.select(F.col("o_custkey").alias("c_custkey")).distinct(),
        "c_custkey",
        "left_anti",
    )
    return (
        idle.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum("cents").alias("sum_cents"),
        )
        .orderBy("c_nationkey")
    )
