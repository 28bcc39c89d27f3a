"""B-3 aggregation operators (SURVEY.md §2 Table B).

The reference implements no aggregation at all (SURVEY.md §2 Table A,
"explicitly absent" — users apply NumPy after streaming reads); the
engine supplies it with Spark's hash aggregate, which does map-side
partial aggregation automatically — the 100 TB posture is: one shuffle
on the group keys, no collect, decimal-exact float accumulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import Column

from netcdf4_variable_streamer_spark.registry import (
    _FP,
    SQL_DAVG,
    SQL_DSUM,
    davg,
    dsum,
    register,
)
from netcdf4_variable_streamer_spark.tables import load_table


def dsum_wide(col: Column | str, scale: int | None = None) -> Column:
    """Order-independent SUM for magnitudes beyond :func:`dsum`'s int64
    envelope (documented in SCALE.md known-limits #3: the per-GROUP
    int64 accumulator overflows past ~2e7 rows/group at 6-decimal
    scale × |value| < 4e5 — Spark's ANSI mode then throws
    ARITHMETIC_OVERFLOW, loud but fatal): the same 6-decimal
    fixed-point integers accumulate in DECIMAL(38,0) — overflow-safe
    to ~1e31 row·values — and convert to double ONCE at the end (one
    correctly-rounded conversion both engines perform identically).
    Same call shape as ``dsum``; swap per call site when a group's
    fixed-point sum can exceed ~9.2e18.

    PER-ROW bound (ADVICE r8 #4): each row's fixed-point value still
    floors through a BIGINT (Spark ``floor(double)`` returns
    LongType), so a SINGLE row with |value| > ~9.2e12 (fixed-point
    |value·1e6| > ~9.2e18) overflows at the row level before the wide
    accumulator ever sees it — and that overflow is **SILENT**:
    measured round 10 (``tests/test_analytics.py::
    test_floor_double_saturates_silently``), ``floor(double)``
    SATURATES to ±(2^63−1) even under ANSI mode (unlike an explicit
    ``cast(double as long)``, which throws CAST_OVERFLOW). Only the
    per-group SUM is widened AND loud. No engine call site carries
    per-row magnitudes near that bound (they are prices/quantities/
    scaled products ≤ ~4e15); if one ever does, compute the
    fixed-point product in decimal before flooring —
    ``F.floor((c * _FP).cast("decimal(38,6)"))`` — at ~6× the
    aggregation cost, which also restores loudness (decimal overflow
    throws)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(F.floor(c * _FP).cast("decimal(38,0)"))
        .cast("double") / _FP
    )


def SQL_DSUM_WIDE(expr: str, scale: int | None = None) -> str:
    """DuckDB mirror of :func:`dsum_wide` — HUGEINT accumulation of the
    same fixed-point integers, one final double conversion."""
    return (
        f"CAST(SUM(CAST(FLOOR(({expr}) * 1000000) AS HUGEINT)) "
        "AS DOUBLE) / 1000000"
    )


def davg_wide(col: Column | str, scale: int | None = None) -> Column:
    """Order-independent AVG with the DECIMAL(38,0) accumulator —
    :func:`davg` shares :func:`dsum`'s int64 group-total envelope (the
    divide-by-count happens AFTER the overflowing sum), so the same
    100 TB call sites need the same swap."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(F.floor(c * _FP).cast("decimal(38,0)"))
        .cast("double") / _FP / F.count(c)
    )


def SQL_DAVG_WIDE(expr: str, scale: int | None = None) -> str:
    return f"{SQL_DSUM_WIDE(expr)} / COUNT({expr})"


def sharded_fixed_agg(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, Column | str],
    avgs: dict[str, Column | str] | None = None,
    count_alias: str | None = None,
) -> DataFrame:
    """Two-level overflow-safe fixed-point aggregation — the 100 TB
    accumulator WITHOUT per-row decimal work: level 1 groups by
    ``(keys..., spark_partition_id)`` and sums the 6-decimal fixed-point
    integers in plain int64 (map-side combined, whole-stage codegen —
    identical per-row cost to :func:`dsum`); level 2 re-groups by
    ``keys`` and merges the partials in DECIMAL(38,0), converting to
    double once. The decimal arithmetic touches only
    O(groups × input partitions) partial rows, so the extra exchange is
    KB-sized at any scale.

    Safety envelope: each PARTIAL must stay under int64 — guaranteed
    when per-input-partition per-group fixed-point totals are below
    ~9.2e18, which `maxPartitionBytes`-bounded scan partitions satisfy
    by orders of magnitude (~1e6 rows/partition × per-row ≤ 4e11 ≈
    5e17); ANSI mode throws loudly if a pathological partition ever
    violates it. The merged GROUP total is decimal-wide (~1e31).
    Measured at sf0.1 (fresh-plan median-of-5): dsum 0.49 s / all-wide
    ``dsum_wide`` 0.82 s / this shape 0.48 s for the 7-aggregate Q1 —
    the all-wide penalty is per-plan decimal codegen plus per-row
    128-bit accumulation; this shape pays neither.

    Output columns: ``keys..., sums..., avgs..., count_alias`` in the
    given order, matching the oracle convention (``SQL_DSUM_WIDE`` /
    ``SQL_DAVG_WIDE`` totals are bit-identical: integer partial sums
    are associative, so the partial split cannot change the total).
    """
    avgs = avgs or {}

    def _c(c: Column | str) -> Column:
        return F.col(c) if isinstance(c, str) else c

    def _flo(c: Column | str) -> Column:
        return F.floor(_c(c) * _FP).cast("long")

    partials = [
        F.sum(_flo(c)).alias(f"__s_{a}") for a, c in sums.items()
    ]
    partials += [
        x
        for a, c in avgs.items()
        for x in (
            F.sum(_flo(c)).alias(f"__s_{a}"),
            F.count(_c(c)).alias(f"__n_{a}"),
        )
    ]
    if count_alias:
        partials.append(F.count(F.lit(1)).alias("__n"))
    base = df.groupBy(
        *keys, F.spark_partition_id().alias("__pid")
    ).agg(*partials)

    def _wide(a: str) -> Column:
        return (
            F.sum(F.col(f"__s_{a}").cast("decimal(38,0)"))
            .cast("double") / _FP
        )

    finals = [_wide(a).alias(a) for a in sums]
    finals += [
        (_wide(a) / F.sum(F.col(f"__n_{a}"))).alias(a) for a in avgs
    ]
    if count_alias:
        finals.append(F.sum(F.col("__n")).alias(count_alias))
    return base.groupBy(*keys).agg(*finals)


_Q1_CUTOFF = "2000-12-01"


@register(
    "q_agg_groupby_sum",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {SQL_DSUM('l_quantity')} AS sum_qty,
       {SQL_DSUM('l_extendedprice')} AS sum_base_price,
       {SQL_DSUM('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {SQL_DSUM('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {SQL_DAVG('l_quantity')} AS avg_qty,
       {SQL_DAVG('l_extendedprice')} AS avg_price,
       {SQL_DAVG('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1 shape: filtered hash agg with partial aggregation.",
)
def q_agg_groupby_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # Single-level dsum hash agg — one shuffle, map-side combine, the
    # whole per-row path int64 in whole-stage codegen. Round-10 A/B
    # (BASELINE.md BENCH_NOTES: alternating fresh-plan runs, same
    # session) measured the two-level :func:`sharded_fixed_agg` shape
    # at +40% over this (0.525 s vs 0.370 s median-of-9 at sf0.1) —
    # the second aggregation STAGE costs real wall-clock at sub-second
    # query times, so dsum stays the headline shape. Its int64 group
    # accumulator is the documented envelope (SCALE.md known-limits
    # #3, ~2e7 rows/group x |value|<4e5 at 6-decimal scale, ANSI-loud
    # on overflow); past it, swap `sharded_fixed_agg` in — same keys /
    # sums / avgs call shape, wide-merge safety, and its extra cost is
    # a fixed per-QUERY stage, not per-row, so it amortizes to noise
    # exactly at the scales that need it.
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc).alias("sum_disc_price"),
            dsum(disc * (1 + F.col("l_tax"))).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q_agg_sum_wide",
    oracle=f"""
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       {SQL_DSUM_WIDE('(l_extendedprice * 100000)')} AS sum_scaled
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    doc="Overflow-safe exact SUM (closes SCALE.md known-limits #3 on "
        "demand): dsum's int64 fixed-point accumulator overflows past "
        "~9.2e18 per group (~2e7 rows at |value| < 4e5 and 6 decimals) "
        "— this key sums l_extendedprice x 100000 (per-row fixed-point "
        "~4e15, per-group totals ~1e20 even at sf0.01, PAST the int64 "
        "envelope) through dsum_wide's DECIMAL(38,0) accumulation, "
        "mirrored by HUGEINT in the oracle. Both engines compute the "
        "identical float64 products (DOUBLE columns, same IEEE ops), "
        "so they floor identical doubles, and the final "
        "decimal->double conversion is the single correctly-rounded "
        "step. At 100 TB "
        "group cardinalities this is the accumulator to swap in — "
        "same call shape, one partial->final hash agg, map-side "
        "combine intact.",
)
def q_agg_sum_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum_wide(F.col("l_extendedprice") * 100000).alias(
                "sum_scaled"
            ),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_agg_having",
    oracle="""
SELECT o_custkey,
       COUNT(*) AS n_orders,
       {sum_sql} AS total_spent
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 15
""".format(sum_sql=SQL_DSUM("o_totalprice")),
    doc="Post-aggregation filter (HAVING).",
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_spent"),
        )
        .filter(F.col("n_orders") >= 15)
    )


@register(
    "q_agg_distinct",
    oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_custs,
       COUNT(DISTINCT o_orderpriority) AS n_prios
FROM orders
GROUP BY o_orderstatus
""",
    doc="COUNT DISTINCT + multi-distinct in one aggregate (expand strategy).",
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_custs"),
        F.countDistinct("o_orderpriority").alias("n_prios"),
    )


@register(
    "q_agg_approx_distinct",
    oracle="""
SELECT event_type, CAST(1 AS BOOLEAN) AS within_bound
FROM events GROUP BY event_type
""",
    doc="HyperLogLog approx distinct users per event_type, emitted as the "
        "error-bound assertion itself: |approx - exact| <= 0.05*exact per "
        "group (HLL at rsd=0.02 sits well inside that). Sketch values "
        "differ across engines by design, the bound check does not — so "
        "the oracle is the same boolean row per group and the key is "
        "fully hash-checked. Exact twin is q_agg_distinct.",
)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        (
            F.abs(
                F.approx_count_distinct("user_id", rsd=0.02)
                - F.countDistinct("user_id")
            )
            <= 0.05 * F.countDistinct("user_id")
        ).alias("within_bound")
    )


@register(
    "q_agg_rollup",
    oracle="""
SELECT n_name, c_mktsegment,
       COUNT(*) AS n_custs,
       {s} AS sum_acctbal,
       CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
       CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_segment
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, c_mktsegment)
""".format(s=SQL_DSUM_WIDE("c_acctbal")),
    doc="Hierarchical rollup over nation × market segment.",
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    return j.rollup("n_name", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_custs"),
        # rollup grand total sums EVERY customer (VERDICT r8 #6)
        dsum_wide("c_acctbal").alias("sum_acctbal"),
        F.grouping("n_name").cast("long").alias("g_nation"),
        F.grouping("c_mktsegment").cast("long").alias("g_segment"),
    )


@register(
    "q_agg_cube",
    oracle="""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_items,
       {s} AS sum_qty,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""".format(s=SQL_DSUM_WIDE("l_quantity")),
    doc="Cube over returnflag × linestatus.",
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        # the cube's grand-total cell sums the whole table (r8 #6)
        dsum_wide("l_quantity").alias("sum_qty"),
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
    )


@register(
    "q_agg_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       {s} AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""".format(s=SQL_DSUM("o_totalprice")),
    doc="Explicit grouping sets via spark.sql (SQL entry path, SURVEY §3.4).",
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice * 1000000) AS BIGINT)) AS DOUBLE)
                 / 1000000 AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# Statistical aggregates from exact fixed-point power sums: both engines
# produce bit-identical doubles with no round() anywhere (SURVEY §7.5;
# stddev_samp()'s internal float order is engine-dependent, these are not).
_FPS = "CAST(SUM(CAST(FLOOR(({e}) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000"
_STATS_SQL = f"""
SELECT l_returnflag,
       COUNT(*) AS n,
       {_FPS.format(e='l_quantity')} AS s1,
       {_FPS.format(e='l_quantity * l_quantity')} AS s2,
       ({_FPS.format(e='l_quantity * l_quantity')}
        - ({_FPS.format(e='l_quantity')}) * ({_FPS.format(e='l_quantity')})
          / COUNT(*)) / (COUNT(*) - 1) AS var_qty,
       ({_FPS.format(e='l_quantity * l_discount')}
        - ({_FPS.format(e='l_quantity')}) * ({_FPS.format(e='l_discount')})
          / COUNT(*)) / (COUNT(*) - 1) AS covar_qty_disc
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "q_agg_stats",
    oracle=_STATS_SQL,
    doc="Variance/covariance via exact fixed-point power sums "
        "(cross-engine deterministic where stddev_samp()'s float order "
        "is not).",
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    d = F.col("l_discount")

    def fps(e):
        return F.sum(F.floor(e * 1000000).cast("long")).cast("double") / 1000000

    sum_q, sum_qq, sum_qd, sum_d = fps(q), fps(q * q), fps(q * d), fps(d)
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag").agg(
        n.alias("n"),
        sum_q.alias("s1"),
        sum_qq.alias("s2"),
        ((sum_qq - sum_q * sum_q / n) / (n - F.lit(1))).alias("var_qty"),
        ((sum_qd - sum_q * sum_d / n) / (n - F.lit(1))).alias("covar_qty_disc"),
    )


@register(
    "q_agg_collect",
    oracle="""
SELECT r_name,
       ARRAY_TO_STRING(LIST_SORT(LIST(n_name)), ',') AS nations,
       COUNT(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
    doc="array_agg with deterministic order, projected to a string for "
        "stable cross-engine hashing.",
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    j = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return j.groupBy("r_name").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("nations"),
        F.count(F.lit(1)).alias("n_nations"),
    )


@register(
    "q_agg_percentiles",
    oracle="""
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
       ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
       ROUND(MAX(l_extendedprice), 4) AS pmax
FROM lineitem
GROUP BY l_returnflag
""",
    doc="Exact percentiles per group (Spark `percentile` == DuckDB "
        "`quantile_cont`: both linear-interpolate). Exact percentile "
        "requires a per-group sort; the sketch alternative at extreme "
        "group cardinality is approx_percentile (t-digest, fixed state), "
        "same call-site shape.",
)
def q_agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("l_extendedprice", F.lit(0.50)), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.75)), 4).alias("p75"),
        F.round(F.max("l_extendedprice"), 4).alias("pmax"),
    )


@register(
    "q_agg_median_mode",
    oracle="""
WITH med AS (
  SELECT l_returnflag,
         ROUND(MEDIAN(l_quantity), 4) AS median_qty,
         ROUND(MEDIAN(l_extendedprice), 4) AS median_price
  FROM lineitem GROUP BY l_returnflag
),
cnt AS (
  SELECT l_returnflag, l_linestatus, COUNT(*) AS c
  FROM lineitem GROUP BY l_returnflag, l_linestatus
),
md AS (
  SELECT l_returnflag, l_linestatus AS mode_status, c AS mode_cnt
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                     ORDER BY c DESC, l_linestatus) AS rn
        FROM cnt) t
  WHERE rn = 1
)
SELECT med.l_returnflag, med.median_qty, med.median_price,
       md.mode_status, md.mode_cnt
FROM med JOIN md USING (l_returnflag)
""",
    doc="Median and mode per group. Median via the native interpolating "
        "aggregate (Spark `median` == DuckDB `MEDIAN`, both linear-"
        "interpolate at even counts). Mode is computed EXPLICITLY as "
        "count + row_number rather than the engines' `mode()` because "
        "tie-breaking is engine-defined there — the explicit form pins "
        "'most frequent, smallest value on ties' identically everywhere. "
        "Shape at scale: median needs the per-group sort (or "
        "approx_percentile's t-digest at extreme cardinality); mode is "
        "two hash aggregations + a window over group-cardinality rows.",
)
def q_agg_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 4).alias("median_qty"),
        F.round(F.median("l_extendedprice"), 4).alias("median_price"),
    )
    cnt = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("c"), F.asc("l_linestatus")
    )
    md = (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_linestatus").alias("mode_status"),
            F.col("c").alias("mode_cnt"),
        )
    )
    return med.join(md, "l_returnflag")


@register(
    "q_agg_sketches",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users_exact,
       CAST(1 AS BOOLEAN) AS hll_merge_ok,
       CAST(1 AS BOOLEAN) AS kll_median_ok,
       CAST(1 AS BOOLEAN) AS theta_ok
FROM events
GROUP BY event_type
""",
    doc="Mergeable DataSketches — the pattern that makes distinct counts "
        "and quantiles cheap at 100 TB because sketches COMPOSE: distinct "
        "users are first sketched per (event_type, day) sub-group with "
        "`hll_sketch_agg`, then the daily sketches are `hll_union_agg`ed "
        "up to event_type — the two-level rollup never re-touches the "
        "raw data, which is exactly how a 1000-executor cluster "
        "maintains daily sketch partitions and unions them at query "
        "time. A KLL sketch estimates the per-group median of `value` "
        "and a theta sketch re-estimates distinct users. Sketch "
        "internals are engine-specific, so each estimate is emitted as "
        "its |approx − exact| <= 5% bound assertion alongside the exact "
        "count (same convention as q_agg_approx_distinct) — all three "
        "booleans are hash-checked against literal TRUE.",
)
def q_agg_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        "value",
        F.to_date("ts").alias("day"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id").alias("day_sketch")
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("day_sketch")).alias("hll_est")
    )
    direct = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact"),
        F.kll_sketch_get_quantile_double(
            F.kll_sketch_agg_double("value"), F.lit(0.5)
        ).alias("kll_median"),
        F.theta_sketch_estimate(F.theta_sketch_agg("user_id")).alias(
            "theta_est"
        ),
        F.median("value").alias("median_exact"),
    )
    j = direct.join(merged, "event_type")
    exact = F.col("n_users_exact")
    tol = lambda est: F.abs(est - exact) <= 0.05 * exact  # noqa: E731
    return j.select(
        "event_type",
        "n_users_exact",
        tol(F.col("hll_est")).alias("hll_merge_ok"),
        (
            F.abs(F.col("kll_median") - F.col("median_exact"))
            <= 0.05 * F.abs(F.col("median_exact"))
        ).alias("kll_median_ok"),
        tol(F.col("theta_est")).alias("theta_ok"),
    )


@register(
    "q_agg_string_agg",
    oracle="""
SELECT r_name,
       COUNT(*) AS n_nations,
       STRING_AGG(n_name, ',' ORDER BY n_name) AS nations_csv
FROM nation JOIN region ON r_regionkey = n_regionkey
GROUP BY r_name
""",
    doc="Deterministic string aggregation (LISTAGG / STRING_AGG): nation "
        "names per region concatenated in sorted order — Spark has no "
        "ordered string_agg, so the portable form is array_join(sort_"
        "array(collect_list(...))), which pins the concatenation order "
        "that engines otherwise leave to partial-agg arrival (the same "
        "determinism rule as q_agg_collect, surfaced as the string type "
        "reports actually consume). Per-group payload must be bounded "
        "(here <= 25 names); for unbounded groups the rank-limited "
        "posting-head pattern of q_text_inverted_index applies.",
)
def q_agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(
            F.broadcast(r),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.array_join(
                F.sort_array(F.collect_list("n_name")), ","
            ).alias("nations_csv"),
        )
    )


@register(
    "q_agg_filtered",
    oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n,
       COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
       CAST(COALESCE(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                     FILTER (WHERE o_orderpriority = '1-URGENT'), 0)
            AS BIGINT) AS urgent_cents,
       COUNT(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 200000)
         AS n_big_custs,
       bool_or(o_totalprice > 400000) AS any_huge,
       bool_and(o_totalprice > 0) AS all_positive
FROM orders
GROUP BY o_orderstatus
""",
    doc="Filtered and boolean aggregates — the FILTER (WHERE ...) clause "
        "that replaces N self-joins or sum(CASE...) towers with one "
        "scan: per order status, conditional counts/sums/distincts plus "
        "bool_or/bool_and quantifiers, all computed in a single hash "
        "aggregation (each FILTER is a predicate on the input row, so "
        "map-side partials still combine). Money stays in integer "
        "cents; the empty-filter-group case is pinned with COALESCE in "
        "both engines.",
)
def q_agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("COUNT(*) FILTER (WHERE o_totalprice > 200000)").alias(
            "n_big"
        ),
        F.expr(
            "COALESCE(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) "
            "FILTER (WHERE o_orderpriority = '1-URGENT'), 0)"
        ).alias("urgent_cents"),
        F.expr(
            "COUNT(DISTINCT o_custkey) "
            "FILTER (WHERE o_totalprice > 200000)"
        ).alias("n_big_custs"),
        F.expr("bool_or(o_totalprice > 400000)").alias("any_huge"),
        F.expr("bool_and(o_totalprice > 0)").alias("all_positive"),
    )


@register(
    "q_agg_weighted_percentile",
    oracle="""
WITH g AS (
  SELECT l_returnflag, l_extendedprice AS v,
         SUM(CAST(l_quantity AS BIGINT)) AS w
  FROM lineitem GROUP BY l_returnflag, l_extendedprice
),
c AS (
  SELECT l_returnflag, v, w,
         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cumw,
         SUM(w) OVER (PARTITION BY l_returnflag) AS total
  FROM g
)
SELECT l_returnflag,
       MIN(CASE WHEN 2 * cumw >= total THEN v END) AS wmedian,
       MIN(CASE WHEN 4 * cumw >= total THEN v END) AS wp25,
       MIN(CASE WHEN 10 * cumw >= 9 * total THEN v END) AS wp90,
       CAST(MAX(total) AS BIGINT) AS total_w
FROM c GROUP BY l_returnflag ORDER BY l_returnflag
""",
    doc="EXACT weighted percentiles (round 12 — the quantity-weighted "
        "price distribution question percentile_approx cannot answer "
        "exactly and plain percentiles answer WRONGLY when rows carry "
        "weights): the weighted p-quantile is the smallest value "
        "whose cumulative weight reaches p of the total, decided by "
        "integer cross-multiplication (2*cumw >= total etc. — no "
        "float division, bit-exact, tie-deterministic because "
        "cumulative weight is per DISTINCT value). Shape: ONE "
        "(key, value) pre-aggregation collapses rows to distinct "
        "values BEFORE the window — the window input is "
        "|distinct values| per key, never |rows| — then one window "
        "pass and a |keys|-row final agg. At 100 TB the "
        "pre-aggregation is the only row-proportional stage and it "
        "is map-side combinable.",
)
def q_agg_weighted_percentile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy(
        "l_returnflag", F.col("l_extendedprice").alias("v")
    ).agg(F.sum(F.col("l_quantity").cast("long")).alias("w"))
    cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    full = Window.partitionBy("l_returnflag")
    c = g.select(
        "l_returnflag",
        "v",
        F.sum("w").over(cum).alias("cumw"),
        F.sum("w").over(full).alias("total"),
    )
    return (
        c.groupBy("l_returnflag")
        .agg(
            F.min(
                F.when(2 * F.col("cumw") >= F.col("total"), F.col("v"))
            ).alias("wmedian"),
            F.min(
                F.when(4 * F.col("cumw") >= F.col("total"), F.col("v"))
            ).alias("wp25"),
            F.min(
                F.when(
                    10 * F.col("cumw") >= 9 * F.col("total"), F.col("v")
                )
            ).alias("wp90"),
            F.max("total").alias("total_w"),
        )
        .orderBy("l_returnflag")
    )
