"""Event-flow analytics over the `events` table (B-4/B-6 adjacent):
ordered funnel conversion, cohort retention, and calendar resampling
with forward fill.

These are the classic event-analytics operators a warehouse engine is
asked for beyond plain windows: each is expressed as keyed aggregations
and equi-joins on `user_id` so one hash partitioning serves every stage
(Spark reuses the exchange), and every stage aggregates BEFORE joining,
so the shuffled payload is per-user, never per-event, after the first
aggregation.

Determinism: timestamps compare raw (exact in both engines); elapsed-time
windows use floored epoch seconds (Spark `unix_timestamp` floors, DuckDB
mirrors with FLOOR(EPOCH(..))); value sums use 1e-6 fixed point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from netcdf4_variable_streamer_spark.registry import register
from netcdf4_variable_streamer_spark.tables import load_table

_7D = 7 * 86400


@register(
    "q_funnel_conversion",
    oracle=f"""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT COUNT(s1.t1) AS n_view,
       COUNT(s2.t2) AS n_click_after_view,
       COUNT(s3.t3) AS n_purchase_after_click,
       CAST(SUM(CASE WHEN s3.t3 IS NOT NULL
                      AND CAST(FLOOR(EPOCH(s3.t3)) AS BIGINT)
                          - CAST(FLOOR(EPOCH(s1.t1)) AS BIGINT) <= {_7D}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_converted_7d
FROM s1
LEFT JOIN s2 ON s2.user_id = s1.user_id
LEFT JOIN s3 ON s3.user_id = s1.user_id
""",
    doc="Ordered funnel (view -> click -> purchase): a user advances a "
        "stage only with an event strictly AFTER their previous stage's "
        "timestamp — the semantics product analytics means by 'funnel', "
        "not the unordered count-by-type. Three keyed MIN-aggregations "
        "chained by equi-joins on user_id: every stage aggregates to one "
        "row per user BEFORE joining, so the join inputs are |users|-"
        "sized, and all four stages share the user_id hash partitioning "
        "(one exchange, reused). Conversion window = 7 floored-epoch "
        "days. At 100 TB this is 3 passes over events with map-side "
        "partial MIN — no event-by-event state, no window over the raw "
        "stream.",
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    j = s1.join(s2, "user_id", "left").join(s3, "user_id", "left")
    ep = lambda c: F.unix_timestamp(F.col(c))  # noqa: E731  (floored epoch)
    return j.agg(
        F.count("t1").alias("n_view"),
        F.count("t2").alias("n_click_after_view"),
        F.count("t3").alias("n_purchase_after_click"),
        F.sum(
            F.when(
                F.col("t3").isNotNull() & ((ep("t3") - ep("t1")) <= _7D), 1
            ).otherwise(0)
        ).alias("n_converted_7d"),
    )


@register(
    "q_retention_cohort",
    oracle="""
WITH f AS (
  SELECT user_id, DATE_TRUNC('week', MIN(ts)) AS cohort_w
  FROM events GROUP BY user_id
),
a AS (
  SELECT DISTINCT user_id, DATE_TRUNC('week', ts) AS active_w FROM events
),
cs AS (SELECT cohort_w, COUNT(*) AS cohort_n FROM f GROUP BY cohort_w),
r AS (
  SELECT f.cohort_w,
         DATE_DIFF('day', f.cohort_w, a.active_w) // 7 AS week_offset,
         COUNT(*) AS n_active
  FROM f JOIN a ON a.user_id = f.user_id
  GROUP BY f.cohort_w, week_offset
)
SELECT STRFTIME(r.cohort_w, '%Y-%m-%d') AS cohort_week,
       CAST(r.week_offset AS BIGINT) AS week_offset,
       r.n_active,
       (r.n_active * 10000 // cs.cohort_n) / 10000.0 AS retained_frac
FROM r JOIN cs ON cs.cohort_w = r.cohort_w
""",
    doc="Cohort retention matrix: users are cohorted by the ISO week of "
        "their first event; each (cohort, week-offset) cell counts users "
        "from that cohort active in that later week, with the retained "
        "fraction against the cohort size. Both engines truncate weeks "
        "to ISO Monday, so cells align exactly. Shape at 100 TB: "
        "first-event and distinct-activity are both single aggregations "
        "keyed by user_id (sharing one partitioning with the join that "
        "follows); the matrix roll-up is keyed by (cohort, offset) — "
        "cardinality |weeks|², tiny — and the cohort-size join "
        "broadcasts. No step ever shuffles raw events twice.",
)
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_w")
    )
    a = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("active_w")
    ).distinct()
    cs = f.groupBy("cohort_w").agg(F.count(F.lit(1)).alias("cohort_n"))
    r = (
        f.join(a, "user_id")
        .select(
            "cohort_w",
            F.expr("datediff(active_w, cohort_w) div 7").alias("week_offset"),
        )
        .groupBy("cohort_w", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return r.join(F.broadcast(cs), "cohort_w").select(
        F.date_format("cohort_w", "yyyy-MM-dd").alias("cohort_week"),
        F.col("week_offset").cast("long"),
        "n_active",
        (F.floor(F.col("n_active") * 10000 / F.col("cohort_n")) / 10000.0)
        .alias("retained_frac"),
    )


@register(
    "q_time_resample_ffill",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS BIGINT)
           AS day_sum_fp
  FROM events GROUP BY user_id, day
),
bounds AS (
  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
  FROM daily GROUP BY user_id
),
spine AS (
  SELECT user_id, CAST(g AS DATE) AS day
  FROM bounds, UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS u(g)
)
SELECT s.user_id,
       STRFTIME(s.day, '%Y-%m-%d') AS day,
       d.day_sum_fp IS NOT NULL AS has_events,
       LAST_VALUE(d.day_sum_fp IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_fp
FROM spine s LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
""",
    doc="Calendar resampling with forward fill — the gap-filling operator "
        "time-series stores call `time_bucket_gapfill` + `locf`: per user, "
        "a daily spine spanning their active range is generated, daily "
        "fixed-point sums are joined on, and missing days carry the last "
        "observed value forward (LAST_VALUE IGNORE NULLS). Shape at "
        "100 TB: the daily roll-up collapses events to |user × day| rows "
        "BEFORE any join; spine generation is a map-side explode of the "
        "per-user bounds (never a global calendar cross join); the fill "
        "is one window partitioned by user_id — every stage keyed by "
        "user_id, one partitioning end-to-end.",
)
def q_time_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 1000000).cast("long")).alias(
            "day_sum_fp"
        )
    )
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(
            F.sequence("d0", "d1", F.expr("interval 1 day"))
        ).alias("day"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("day_sum_fp").isNotNull().alias("has_events"),
            F.last("day_sum_fp", ignorenulls=True).over(w).alias("filled_fp"),
        )
    )


@register(
    "q_win_gap_interpolate",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY user_id, day
),
bounds AS (
  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
  FROM daily GROUP BY user_id
),
spine AS (
  SELECT user_id, CAST(g AS DATE) AS day
  FROM bounds, UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS u(g)
),
nb AS (
  SELECT s.user_id, s.day, d.cents,
         LAST_VALUE(d.cents IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         LAST_VALUE(d.day IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
         FIRST_VALUE(d.cents IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         FIRST_VALUE(d.day IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
  FROM spine s LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
)
SELECT user_id, STRFTIME(day, '%Y-%m-%d') AS day,
       cents IS NOT NULL AS observed,
       CAST(CASE WHEN cents IS NOT NULL THEN cents
                 ELSE (pv * (nd - day) + nv * (day - pd)) // (nd - pd)
            END AS BIGINT) AS cents_interp
FROM nb
""",
    doc="Linear-interpolation gap fill — the sibling of "
        "q_time_resample_ffill for series where a carried-forward value "
        "is wrong (meter readings, balances): missing days get the "
        "distance-weighted average of the bracketing observed days, "
        "computed as (pv*(nd-d) + nv*(d-pd)) div (nd-pd) — all in "
        "integer cents. PRECONDITION (ADVICE r2): event `value` must be "
        ">= 0 — cents = floor(value*100) goes negative otherwise, and "
        "truncating (Spark div) vs flooring (DuckDB //) division then "
        "disagree by one; the events contract guarantees value >= 0 "
        "(amounts), and a signed-series variant would shift both "
        "operands by a domain bound to restore the identity. Same scale "
        "shape as ffill: per-user daily roll-up, map-side spine "
        "explode, TWO window passes (backward + forward neighbor) over "
        "one user_id partitioning.",
)
def q_win_gap_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents"))
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(
            F.sequence("d0", "d1", F.expr("interval 1 day"))
        ).alias("day"),
    )
    back = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    nb = spine.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        "cents",
        F.last("cents", ignorenulls=True).over(back).alias("pv"),
        F.last(
            F.when(F.col("cents").isNotNull(), F.col("day")),
            ignorenulls=True,
        ).over(back).alias("pd"),
        F.first("cents", ignorenulls=True).over(fwd).alias("nv"),
        F.first(
            F.when(F.col("cents").isNotNull(), F.col("day")),
            ignorenulls=True,
        ).over(fwd).alias("nd"),
    )
    interp = F.expr(
        "(pv * datediff(nd, day) + nv * datediff(day, pd))"
        " div datediff(nd, pd)"
    )
    return nb.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("cents").isNotNull().alias("observed"),
        F.when(F.col("cents").isNotNull(), F.col("cents"))
        .otherwise(interp)
        .alias("cents_interp"),
    )


_GAP_S = 1800  # session gap, matches q_sessionize_gap
_BUCKET_S = 3600  # interval-join bucket width (1 h)


@register(
    "q_join_interval_overlap",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, ts::TIMESTAMP AS ts,
         CAST(FLOOR(EPOCH(ts::TIMESTAMP)) AS BIGINT) AS es
  FROM events
),
m AS (
  SELECT *,
         CASE WHEN LAG(es) OVER w IS NULL
                OR es - LAG(es) OVER w > {_GAP_S}
              THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sid AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS s_id
  FROM m
),
sess AS (
  SELECT user_id, s_id, MIN(es) AS s_start, MAX(es) AS s_end
  FROM sid GROUP BY user_id, s_id
),
bk AS (
  SELECT s.*, g AS bucket
  FROM sess s, UNNEST(generate_series(s.s_start // {_BUCKET_S},
                                      s.s_end // {_BUCKET_S})) AS u(g)
),
cand AS (
  SELECT DISTINCT
         a.user_id AS user1, a.s_id AS sid1,
         a.s_start AS a_start, a.s_end AS a_end,
         b.user_id AS user2, b.s_id AS sid2,
         b.s_start AS b_start, b.s_end AS b_end
  FROM bk a JOIN bk b
    ON b.bucket = a.bucket AND a.user_id < b.user_id
  WHERE a.s_start <= b.s_end AND b.s_start <= a.s_end
)
SELECT user1, user2,
       COUNT(*) AS n_overlaps,
       CAST(SUM(LEAST(a_end, b_end) - GREATEST(a_start, b_start))
            AS BIGINT) AS total_overlap_s
FROM cand GROUP BY user1, user2
""",
    doc="Interval-overlap join via time-bucket expansion — the "
        "big-to-big range join a broadcast theta join cannot survive: "
        "per-user activity sessions (30-min gaps-and-islands) are "
        "exploded onto an hourly bucket grid, candidate session pairs "
        "form by EQUI-join on the bucket (volume = sessions-per-hour "
        "squared per bucket, never |sessions|^2 global), duplicates "
        "from multi-bucket spans collapse with DISTINCT, and the exact "
        "closed-interval overlap predicate + overlap seconds are "
        "evaluated only on candidates. Output is the |user-pair| "
        "co-presence matrix. At 100 TB the bucket width is the knob: "
        "pick it near the median interval length so each interval "
        "lands in O(1) buckets while buckets stay thin.",
)
def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    es = F.expr("unix_micros(cast(ts as timestamp_ltz)) div 1000000")
    e = ev.select("user_id", "event_id", "ts", es.cast("long").alias("es"))
    prev = F.lag("es").over(w)
    m = e.withColumn(
        "new_s",
        F.when(prev.isNull() | (F.col("es") - prev > _GAP_S), 1).otherwise(
            0
        ),
    )
    sid = m.withColumn("s_id", F.sum("new_s").over(cum))
    sess = sid.groupBy("user_id", "s_id").agg(
        F.min("es").alias("s_start"), F.max("es").alias("s_end")
    )
    bk = sess.select(
        "user_id",
        "s_id",
        "s_start",
        "s_end",
        F.explode(
            F.sequence(
                F.expr(f"s_start div {_BUCKET_S}"),
                F.expr(f"s_end div {_BUCKET_S}"),
            )
        ).alias("bucket"),
    )
    a = bk.alias("a")
    b = bk.alias("b")
    cand = (
        a.join(
            b,
            (F.col("b.bucket") == F.col("a.bucket"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .filter(
            (F.col("a.s_start") <= F.col("b.s_end"))
            & (F.col("b.s_start") <= F.col("a.s_end"))
        )
        .select(
            F.col("a.user_id").alias("user1"),
            F.col("a.s_id").alias("sid1"),
            F.col("a.s_start").alias("a_start"),
            F.col("a.s_end").alias("a_end"),
            F.col("b.user_id").alias("user2"),
            F.col("b.s_id").alias("sid2"),
            F.col("b.s_start").alias("b_start"),
            F.col("b.s_end").alias("b_end"),
        )
        .distinct()
    )
    return cand.groupBy("user1", "user2").agg(
        F.count(F.lit(1)).alias("n_overlaps"),
        F.sum(
            F.least("a_end", "b_end") - F.greatest("a_start", "b_start")
        ).alias("total_overlap_s"),
    )


_EWMA_K = 8  # window depth; weights 2^7 .. 2^0 (alpha = 1/2, truncated)


def _ewma_terms() -> tuple[str, str]:
    """(numerator, denominator) SQL — identical text for both engines."""
    num = " + ".join(
        f"COALESCE(LAG(cents, {k}) OVER w, 0) * {1 << (_EWMA_K - 1 - k)}"
        for k in range(_EWMA_K)
    )
    den = " + ".join(
        f"CASE WHEN LAG(cents, {k}) OVER w IS NULL THEN 0"
        f" ELSE {1 << (_EWMA_K - 1 - k)} END"
        for k in range(_EWMA_K)
    )
    return num, den


@register(
    "q_win_ewma_dyadic",
    oracle="""
WITH daily AS (
  SELECT user_id, event_id, ts::TIMESTAMP AS ts,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT user_id, event_id,
       cents,
       ({num}) // ({den}) AS ewma_cents
FROM daily
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""".format(num=_ewma_terms()[0], den=_ewma_terms()[1]),
    doc="Exponentially-weighted moving average with DYADIC decay: alpha "
        "= 1/2 truncated at depth 8, so the weights are exact powers of "
        "two and the whole computation stays in integer cents — "
        "numerator and denominator are BIGINT sums. PRECONDITION "
        "(ADVICE r2): event `value` must be >= 0 — the div/floor "
        "identity needs a non-negative numerator, and cents = "
        "floor(value*100) would go negative for negative values, making "
        "truncating (Spark div) and flooring (DuckDB //) division "
        "disagree by one; the events contract guarantees value >= 0 "
        "(amounts). With that, the division is identical in both "
        "engines and the full smoothed series hash-checkable (a "
        "float EWMA is order-stable but its per-row rounding is not "
        "portable). Early rows renormalize over the lags that exist "
        "(the CASE denominator), matching pandas ewm(adjust=True). One "
        "user_id window partitioning, 8 LAG taps resolved in a single "
        "window pass.",
)
def q_win_ewma_dyadic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    num, den = _ewma_terms()
    daily = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_num = sum(
        (
            F.coalesce(F.lag("cents", k).over(w), F.lit(0))
            * (1 << (_EWMA_K - 1 - k))
            for k in range(_EWMA_K)
        ),
        start=F.lit(0),
    )
    lag_den = sum(
        (
            F.when(F.lag("cents", k).over(w).isNull(), 0).otherwise(
                1 << (_EWMA_K - 1 - k)
            )
            for k in range(_EWMA_K)
        ),
        start=F.lit(0),
    )
    return daily.select(
        "user_id",
        "event_id",
        "cents",
        (lag_num.cast("long")).alias("_n"),
        (lag_den.cast("long")).alias("_d"),
    ).select(
        "user_id",
        "event_id",
        "cents",
        F.expr("_n div _d").alias("ewma_cents"),
    )


@register(
    "q_win_pattern_burst",
    oracle="""
WITH e AS (
  SELECT user_id, event_id, ts::TIMESTAMP AS ts, event_type,
         CAST(FLOOR(EPOCH(ts::TIMESTAMP)) AS BIGINT) AS es
  FROM events
),
r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn_all,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn_typ
  FROM e
),
bursts AS (
  SELECT user_id, rn_all - rn_typ AS grp,
         COUNT(*) AS n_errors,
         STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS burst_start,
         MAX(es) - MIN(es) AS duration_s
  FROM r WHERE event_type = 'error'
  GROUP BY user_id, grp
)
SELECT user_id, burst_start, n_errors, duration_s
FROM bursts WHERE n_errors >= 3
""",
    doc="Sequential pattern detection (the MATCH_RECOGNIZE shape): runs "
        "of >= 3 CONSECUTIVE error events per user — consecutive in the "
        "user's event sequence, not merely frequent — found with the "
        "gaps-and-islands double-row_number trick (rn_all - rn_per_type "
        "is constant exactly along an unbroken run). Both windows and "
        "the roll-up share the user_id partitioning: ONE shuffle "
        "(plan-asserted). This is the relational expression of a "
        "regex-over-events engine: any fixed 'k consecutive X' pattern "
        "compiles to this plan, and at 100 TB it scales exactly like "
        "sessionization (window partition = one user's events).",
)
def q_win_pattern_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.unix_timestamp("ts").alias("es"),
    )
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    r = ev.withColumn("rn_all", F.row_number().over(w_all)).withColumn(
        "rn_typ", F.row_number().over(w_typ)
    )
    return (
        r.filter(F.col("event_type") == "error")
        .groupBy("user_id", (F.col("rn_all") - F.col("rn_typ")).alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n_errors"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "burst_start"
            ),
            (F.max("es") - F.min("es")).alias("duration_s"),
        )
        .filter(F.col("n_errors") >= 3)
        .select("user_id", "burst_start", "n_errors", "duration_s")
    )


# incremental maintenance split point: orders before/after this date are
# the "already aggregated" base and the "newly arrived" delta
_INC_SPLIT = "2024-01-01"


@register(
    "q_agg_incremental_merge",
    oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents,
       MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key
FROM orders GROUP BY o_orderstatus
""",
    doc="Incremental aggregate maintenance: the base partition's partial "
        "aggregates (computed once, conceptually stored) and the delta "
        "partition's partial aggregates are MERGED — count+count, "
        "sum+sum, min(min), max(max) — without ever re-touching base "
        "rows; the oracle recomputes from scratch and must hash-match, "
        "proving merge(partial(base), partial(delta)) == full(all). "
        "This is the algebraic property (commutative-monoid aggregates) "
        "that makes streaming upserts (q_stream_upsert) and the HLL "
        "two-level rollup (q_agg_sketches) correct, demonstrated exactly "
        "with fixed-point sums. At 100 TB the base partials are a stored "
        "materialized view; each refresh aggregates ONLY the delta — "
        "shuffle volume |delta|, not |table|.",
)
def q_agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("cents"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )

    base = partial(o.filter(F.col("o_orderdate") < _INC_SPLIT))
    delta = partial(o.filter(F.col("o_orderdate") >= _INC_SPLIT))
    return (
        base.unionAll(delta)
        .groupBy("o_orderstatus")
        .agg(
            F.sum("n").alias("n"),
            F.sum("cents").alias("cents"),
            F.min("min_key").alias("min_key"),
            F.max("max_key").alias("max_key"),
        )
    )


@register(
    "q_rollup_time_hierarchy",
    oracle="""
WITH hourly AS (
  SELECT DATE_TRUNC('hour', ts) AS b, event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS BIGINT) AS s,
         MIN(CAST(FLOOR(value * 1000000) AS BIGINT)) AS lo,
         MAX(CAST(FLOOR(value * 1000000) AS BIGINT)) AS hi
  FROM events GROUP BY b, event_type
),
daily AS (
  SELECT DATE_TRUNC('day', b) AS b, event_type,
         CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(s) AS BIGINT) AS s,
         MIN(lo) AS lo, MAX(hi) AS hi
  FROM hourly GROUP BY 1, 2
),
weekly AS (
  SELECT DATE_TRUNC('week', b) AS b, event_type,
         CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(s) AS BIGINT) AS s,
         MIN(lo) AS lo, MAX(hi) AS hi
  FROM daily GROUP BY 1, 2
)
SELECT 'hour' AS grain, STRFTIME(b, '%Y-%m-%d %H:%M:%S') AS bucket,
       event_type, n AS n_events, s AS sum_fp, lo AS min_fp, hi AS max_fp
FROM hourly
UNION ALL
SELECT 'day', STRFTIME(b, '%Y-%m-%d %H:%M:%S'), event_type, n, s, lo, hi
FROM daily
UNION ALL
SELECT 'week', STRFTIME(b, '%Y-%m-%d %H:%M:%S'), event_type, n, s, lo, hi
FROM weekly
""",
    doc="Hypertable-style multi-granularity time rollup (continuous "
        "aggregate): events are aggregated ONCE to hourly cells, then the "
        "day and week grains are re-aggregations of those partials — "
        "count/sum/min/max are all mergeable, so the cascade is exact. "
        "Shape at 100 TB: the raw table is scanned exactly once and the "
        "single real shuffle is |hours × types|-sized with map-side "
        "partial aggregation; every coarser grain shuffles only the "
        "already-tiny cell table (day from hour = 24x reduction, week "
        "from day = 7x). This is the materialized-rollup pattern "
        "(TimescaleDB continuous aggregates, Druid rollup): never "
        "re-scan raw data to serve a coarser grain. Spark's week "
        "truncation is ISO Monday-based, matching DuckDB.",
)
def q_rollup_time_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    fp = F.floor(F.col("value") * 1000000).cast("long")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("b"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(fp).alias("s"),
        F.min(fp).alias("lo"),
        F.max(fp).alias("hi"),
    )

    def coarsen(df: DataFrame, grain: str) -> DataFrame:
        return df.groupBy(
            F.date_trunc(grain, "b").alias("b"), "event_type"
        ).agg(
            F.sum("n").alias("n"),
            F.sum("s").alias("s"),
            F.min("lo").alias("lo"),
            F.max("hi").alias("hi"),
        )

    daily = coarsen(hourly, "day")
    weekly = coarsen(daily, "week")

    def tag(df: DataFrame, grain: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            F.date_format("b", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "event_type",
            F.col("n").alias("n_events"),
            F.col("s").alias("sum_fp"),
            F.col("lo").alias("min_fp"),
            F.col("hi").alias("max_fp"),
        )

    return tag(hourly, "hour").unionAll(tag(daily, "day")).unionAll(
        tag(weekly, "week")
    )


@register(
    "q_ab_experiment",
    oracle="""
WITH u AS (
  SELECT user_id,
         CASE WHEN SUBSTR(MD5(CAST(user_id AS VARCHAR)), 1, 1)
                   < '8' THEN 'A' ELSE 'B' END AS arm,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted,
         SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(FLOOR(value * 1000000) AS BIGINT)
                  ELSE 0 END) AS purchase_fp,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT arm,
       COUNT(*) AS n_users,
       CAST(SUM(converted) AS BIGINT) AS n_converted,
       CAST((SUM(converted) * 1000000) // COUNT(*) AS BIGINT) AS conv_ppm,
       CAST(SUM(purchase_fp) AS BIGINT) AS purchase_value_fp,
       CAST(SUM(n_events) AS BIGINT) AS n_events
FROM u GROUP BY arm
""",
    doc="A/B experiment readout — deterministic hash-based arm "
        "assignment (md5(user_id) first hex digit < '8' => arm A, the "
        "~50/50 split every experimentation platform implements so a "
        "user's arm never changes across sessions, engines, or data "
        "volume) followed by per-arm conversion and value metrics. Two "
        "aggregations: user-level rollup (converted flag = MAX over the "
        "user's events — never a distinct count), then the |arms|-sized "
        "readout with integer-ppm conversion rate. At 100 TB the "
        "user-level agg is the only real shuffle and it map-side-"
        "combines; the arm readout is 2 rows. Downstream significance "
        "testing consumes exactly these sufficient statistics.",
)
def q_ab_experiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    arm = F.when(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8",
        "A",
    ).otherwise("B")
    is_p = (F.col("event_type") == "purchase").cast("int")
    u = ev.groupBy("user_id", arm.alias("arm")).agg(
        F.max(is_p).alias("converted"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 1000000).cast("long"),
            ).otherwise(F.lit(0))
        ).alias("purchase_fp"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return u.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
        F.expr("(sum(converted) * 1000000) div count(1)").alias(
            "conv_ppm"
        ),
        F.sum("purchase_fp").alias("purchase_value_fp"),
        F.sum("n_events").alias("n_events"),
    )


@register(
    "q_funnel_attribution",
    oracle="""
WITH fp AS (
  SELECT user_id, MIN(ROW(ts, event_id)) AS p
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
prior AS (
  SELECT e.user_id, e.event_type,
         ROW_NUMBER() OVER (PARTITION BY e.user_id
                            ORDER BY e.ts, e.event_id) AS rn
  FROM events e JOIN fp ON fp.user_id = e.user_id
  WHERE ROW(e.ts, e.event_id) < fp.p
),
attributed AS (
  SELECT fp.user_id, COALESCE(pr.event_type, 'direct') AS channel
  FROM fp LEFT JOIN (SELECT user_id, event_type FROM prior WHERE rn = 1) pr
    ON pr.user_id = fp.user_id
)
SELECT channel,
       COUNT(*) AS n_conversions,
       CAST((COUNT(*) * 1000000) // SUM(COUNT(*)) OVER () AS BIGINT)
         AS share_ppm
FROM attributed GROUP BY channel
""",
    doc="First-touch conversion attribution: for each converting user "
        "(has a 'purchase'), find the earliest event STRICTLY before "
        "their first purchase — (ts, event_id) tuple order makes both "
        "endpoints total and deterministic — and credit its event_type "
        "as the acquisition channel; users whose first event IS the "
        "purchase attribute to 'direct'. Output is per-channel "
        "conversion counts with integer-ppm share. Shape at 100 TB: "
        "the first-purchase rollup, the back-join, and the "
        "row_number window all hash on user_id — ONE partitioning "
        "serves all three stages (exchange reuse), the payload after "
        "the rollup is per-user not per-event, and the channel readout "
        "is |event_types| rows. The share window runs over that tiny "
        "readout. Swapping MIN for MAX on the prior-event pick turns "
        "this into last-touch attribution with the same plan.",
)
def q_funnel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id")).alias("p"))
    )
    prior = (
        ev.join(fp, "user_id")
        .filter(F.struct("ts", "event_id") < F.col("p"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type")
    )
    attributed = fp.join(prior, "user_id", "left").select(
        "user_id",
        F.coalesce(F.col("event_type"), F.lit("direct")).alias("channel"),
    )
    counts = attributed.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_conversions")
    )
    return counts.select(
        "channel",
        "n_conversions",
        F.expr(
            "(n_conversions * 1000000) div sum(n_conversions) over ()"
        ).alias("share_ppm"),
    )


@register(
    "q_interval_merge",
    oracle="""
WITH iv AS (
  SELECT user_id, event_id,
         CAST(FLOOR(EPOCH(ts::TIMESTAMP)) AS BIGINT) AS s,
         CAST(FLOOR(EPOCH(ts::TIMESTAMP)) AS BIGINT) + 300 AS e
  FROM events
),
flagged AS (
  SELECT user_id, event_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (
                PARTITION BY user_id ORDER BY s, e, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_span
  FROM iv
),
islands AS (
  SELECT user_id, s, e,
         SUM(new_span) OVER (
           PARTITION BY user_id ORDER BY s, e, event_id
           ROWS UNBOUNDED PRECEDING) AS span_id
  FROM flagged
),
spans AS (
  SELECT user_id, span_id, MAX(e) - MIN(s) AS covered
  FROM islands GROUP BY user_id, span_id
),
per_user AS (
  SELECT user_id, COUNT(*) AS n_spans, SUM(covered) AS covered_sec
  FROM spans GROUP BY user_id
)
SELECT n_spans, COUNT(*) AS n_users,
       CAST(SUM(covered_sec) AS BIGINT) AS total_covered_sec
FROM per_user GROUP BY n_spans
""",
    doc="Overlapping-interval consolidation (gaps-and-islands on "
        "ranges): each event opens a 300 s activity interval; per user, "
        "intervals that overlap a PRIOR interval's running max-end fuse "
        "into one span (new-span flag = start beyond max(end) over the "
        "preceding frame; span id = running sum of flags — the "
        "standard island trick generalized to ranges, which handles "
        "intervals NESTED inside earlier longer ones, where "
        "lag(end) alone fails). Output: span-count distribution with "
        "covered wall-seconds. Shape at 100 TB: both windows and both "
        "aggs hash on user_id — one partitioning, per-user sequential "
        "scan, no self-join (the naive interval-merge is an O(n^2) "
        "range self-join); the final distribution is tiny. All epoch "
        "arithmetic is integer-exact.",
)
def q_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("s"),
        (F.unix_timestamp("ts") + 300).alias("e"),
    )
    order = Window.partitionBy("user_id").orderBy("s", "e", "event_id")
    prior_max_e = F.max("e").over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "new_span",
        (F.col("s") > F.coalesce(prior_max_e, F.lit(-1))).cast("int"),
    )
    islands = flagged.withColumn(
        "span_id",
        F.sum("new_span").over(
            order.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    spans = islands.groupBy("user_id", "span_id").agg(
        (F.max("e") - F.min("s")).alias("covered")
    )
    per_user = spans.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("covered").alias("covered_sec"),
    )
    return per_user.groupBy("n_spans").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("covered_sec").alias("total_covered_sec"),
    )


@register(
    "q_event_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
),
pairs AS (
  SELECT event_type, next_type, COUNT(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
)
SELECT event_type, next_type, n,
       CAST((n * 1000000) // SUM(n) OVER (PARTITION BY event_type)
            AS BIGINT) AS prob_ppm
FROM pairs
""",
    doc="First-order Markov transition matrix over per-user event "
        "sequences: lead() within (user_id; ts, event_id total order) "
        "forms consecutive pairs, pair counts roll up, and the "
        "row-normalized transition probability is integer ppm over the "
        "per-source-type window. Output is |event_types|² rows. Shape "
        "at 100 TB: the lead window and the pair agg are one user_id "
        "shuffle + one |types²|-sized agg with map-side combine; the "
        "normalization window runs over the tiny matrix. This is the "
        "next-event-prediction / clickstream-flow primitive.",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "event_type",
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("next_type"),
    )
    pairs = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("event_type")
    return pairs.select(
        "event_type",
        "next_type",
        "n",
        F.expr("n * 1000000").cast("long")
        .alias("_num"),
    ).withColumn(
        "prob_ppm",
        (F.col("_num") / F.sum("n").over(w)).cast("long"),
    ).drop("_num")


@register(
    "q_funnel_attribution_decay",
    oracle="""
WITH fp AS (
  SELECT user_id, MIN(ROW(ts, event_id)) AS p,
         MIN(ts) AS p_ts
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
touches AS (
  SELECT e.user_id, e.event_type AS channel,
         1::BIGINT << CAST(20 - LEAST(
           (CAST(FLOOR(EPOCH(fp.p_ts::TIMESTAMP)) AS BIGINT)
            - CAST(FLOOR(EPOCH(e.ts::TIMESTAMP)) AS BIGINT)) // 86400,
           20) AS INTEGER) AS w
  FROM events e JOIN fp ON fp.user_id = e.user_id
  WHERE ROW(e.ts, e.event_id) < fp.p
),
per_user AS (
  SELECT user_id, channel, SUM(w) AS w
  FROM touches GROUP BY user_id, channel
)
SELECT channel,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(w) AS BIGINT) AS weight_total,
       CAST((SUM(w) * 1000000) // SUM(SUM(w)) OVER () AS BIGINT)
         AS share_ppm
FROM per_user GROUP BY channel
""",
    doc="Time-decay multi-touch attribution — the sibling of first-touch "
        "(q_funnel_attribution) that credits EVERY pre-purchase touch, "
        "halving per day of staleness: weight = 2^(20 - days_before), "
        "clamped at 20 days, so weights are exact powers of two and the "
        "whole credit assignment stays in BIGINT (the float decay "
        "exp(-lambda*t) loses cross-engine portability; the dyadic form "
        "is the same model with lambda = ln 2/day). Per-channel totals "
        "and integer-ppm shares. Same scale posture as first-touch: "
        "purchase rollup + back-join + per-user aggregation all on one "
        "user_id partitioning; readout is |channels| rows.",
)
def q_funnel_attribution_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.min(F.struct("ts", "event_id")).alias("p"),
            F.min("ts").alias("p_ts"),
        )
    )
    touches = (
        ev.join(fp, "user_id")
        .filter(F.struct("ts", "event_id") < F.col("p"))
        .select(
            "user_id",
            F.col("event_type").alias("channel"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(20 - least("
                "(unix_micros(cast(p_ts as timestamp_ltz)) div 1000000"
                " - unix_micros(cast(ts as timestamp_ltz)) div 1000000)"
                " div 86400, 20) AS INT))"
            ).alias("w"),
        )
    )
    per_user = touches.groupBy("user_id", "channel").agg(
        F.sum("w").alias("w")
    )
    out = per_user.groupBy("channel").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.sum("w").alias("weight_total"),
    )
    return out.select(
        "channel",
        "n_users",
        "weight_total",
        F.expr(
            "CAST((weight_total * 1000000) div "
            "(sum(weight_total) over ()) AS BIGINT)"
        ).alias("share_ppm"),
    )


_SPC_WIN = 14  # trailing baseline days (current day excluded)


@register(
    "q_time_anomaly_spc",
    oracle=f"""
WITH daily AS (
  SELECT event_type,
         DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_int,
         COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
),
win AS (
  SELECT *,
         COUNT(cnt) OVER w AS n,
         SUM(cnt) OVER w AS s,
         SUM(cnt * cnt) OVER w AS q
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day_int
               RANGE BETWEEN {_SPC_WIN} PRECEDING AND 1 PRECEDING)
)
SELECT event_type, day_int, cnt,
       CAST(n AS BIGINT) AS n_baseline,
       CAST(s AS BIGINT) AS baseline_sum,
       CASE WHEN n >= 7 THEN
         (n * cnt - s) * (n * cnt - s) > 9 * (n * q - s * s)
       ELSE FALSE END AS is_anomaly
FROM win
""",
    doc="Statistical-process-control anomaly flags on daily event "
        "volumes: each (event_type, day) count is tested against its "
        "own trailing-14-day baseline with the 3-sigma rule — and the "
        "test runs ENTIRELY in integers by cross-multiplying the "
        "variance inequality ((n*x - S)^2 > 9*(n*Q - S^2) is |x - mu| "
        "> 3*sigma with mu = S/n, sigma^2 = (Q - S^2/n)/n, scaled by "
        "n^2), so no sqrt/float ever appears and the flags hash-match "
        "cross-engine. Days with under 7 baseline points emit NULL "
        "(insufficient history). One keyed aggregation to daily cells, "
        "one range-frame window per event_type — the cells table is "
        "|types x days|, independent of event volume.",
)
def q_time_anomaly_spc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
        )
        .cast("long")
        .alias("day_int"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_int")
        .rangeBetween(-_SPC_WIN, -1)
    )
    win = daily.select(
        "event_type",
        "day_int",
        "cnt",
        F.count("cnt").over(w).alias("n"),
        F.sum("cnt").over(w).alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).alias("q"),
    )
    lhs = (F.col("n") * F.col("cnt") - F.col("s")) * (
        F.col("n") * F.col("cnt") - F.col("s")
    )
    rhs = 9 * (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
    return win.select(
        "event_type",
        "day_int",
        "cnt",
        F.col("n").cast("long").alias("n_baseline"),
        F.col("s").cast("long").alias("baseline_sum"),
        F.when(F.col("n") >= 7, lhs > rhs)
        .otherwise(F.lit(False))
        .alias("is_anomaly"),
    )


_RM_K = 5  # rolling median frame: current row + 4 preceding


@register(
    "q_win_rolling_median",
    oracle=f"""
WITH c AS (
  SELECT user_id, event_id, ts::TIMESTAMP AS ts,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events
),
arr AS (
  SELECT user_id, event_id, cents,
         LIST_SORT(LIST(cents) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN {_RM_K - 1} PRECEDING AND CURRENT ROW)) AS frame
  FROM c
)
SELECT user_id, event_id, cents,
       frame[(LEN(frame) + 1) // 2] AS rolling_median_cents
FROM arr
""",
    doc="Rolling median over the trailing 5 events per user — the "
        "robust-smoothing window no SQL engine offers natively "
        "(median is not a frame-mergeable aggregate): the frame's "
        "values are COLLECTED into an array per row (bounded at 5 — "
        "this is the contract that makes it scale; an unbounded frame "
        "would be a per-row sort), sorted, and the lower median "
        "picked by index, all in integer cents. Series heads use the "
        "shorter frame they have, matching pandas rolling(min_periods"
        "=1). One user_id window partitioning; per-row state is O(k).",
)
def q_win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_RM_K - 1), Window.currentRow)
    )
    frame = F.sort_array(F.collect_list("cents").over(w))
    return c.select(
        "user_id",
        "event_id",
        "cents",
        F.element_at(
            frame, ((F.size(frame) + 1) / 2).cast("int")
        ).alias("rolling_median_cents"),
    )


@register(
    "q_win_longest_streak",
    oracle="""
WITH d AS (
  SELECT DISTINCT user_id,
         DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_int
  FROM events
),
g AS (
  SELECT user_id, day_int,
         day_int - ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY day_int) AS grp
  FROM d
),
streaks AS (
  SELECT user_id, grp, COUNT(*) AS len,
         MIN(day_int) AS start_day
  FROM g GROUP BY user_id, grp
)
SELECT user_id,
       CAST(MAX(len) AS BIGINT) AS longest_streak,
       CAST(MIN(CASE WHEN len = ml THEN start_day END) AS BIGINT)
         AS streak_start_day
FROM (SELECT *, MAX(len) OVER (PARTITION BY user_id) AS ml FROM streaks) t
GROUP BY user_id
""",
    doc="Longest consecutive-day activity streak per user — gaps-and-"
        "islands on the DAY grain (day_int minus row_number is constant "
        "within a run of consecutive days): distinct activity days "
        "collapse first (payload |user x day|, not |events|), one "
        "user_id window assigns islands, one roll-up measures them; "
        "ties on length resolve to the earliest streak. The engagement "
        "metric every product dashboard wants, and the same plan shape "
        "as q_sessionize_gap — all stages share the user_id "
        "partitioning.",
)
def q_win_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
        )
        .cast("long")
        .alias("day_int"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day_int")
    g = d.withColumn(
        "grp", F.col("day_int") - F.row_number().over(w)
    )
    streaks = g.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len"), F.min("day_int").alias("start_day")
    )
    ml = Window.partitionBy("user_id")
    t = streaks.withColumn("ml", F.max("len").over(ml))
    return t.groupBy("user_id").agg(
        F.max("len").cast("long").alias("longest_streak"),
        F.min(F.when(F.col("len") == F.col("ml"), F.col("start_day")))
        .cast("long")
        .alias("streak_start_day"),
    )


@register(
    "q_time_downsample_m4",
    oracle="""
WITH e AS (
  SELECT user_id, ts::TIMESTAMP AS ts, value, event_id,
         TIME_BUCKET(INTERVAL '1 day', ts::TIMESTAMP) AS b
  FROM events WHERE user_id < 50
),
r AS (
  SELECT *,
    ROW_NUMBER() OVER (PARTITION BY user_id, b
                       ORDER BY ts ASC, event_id ASC)  AS rn_first,
    ROW_NUMBER() OVER (PARTITION BY user_id, b
                       ORDER BY ts DESC, event_id DESC) AS rn_last,
    ROW_NUMBER() OVER (PARTITION BY user_id, b
                       ORDER BY value ASC, ts ASC, event_id ASC)
                                                        AS rn_min,
    ROW_NUMBER() OVER (PARTITION BY user_id, b
                       ORDER BY value DESC, ts ASC, event_id ASC)
                                                        AS rn_max
  FROM e
)
SELECT user_id, STRFTIME(b, '%Y-%m-%d') AS bucket, role,
       STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS ts, value, event_id
FROM (
  SELECT *, 'first' AS role FROM r WHERE rn_first = 1
  UNION ALL SELECT *, 'last'  AS role FROM r WHERE rn_last = 1
  UNION ALL SELECT *, 'min'   AS role FROM r WHERE rn_min = 1
  UNION ALL SELECT *, 'max'   AS role FROM r WHERE rn_max = 1
) t
ORDER BY user_id, bucket, role, event_id
""",
    doc="M4 time-series downsampling (round 11) — the standard "
        "dashboard-rendering reduction (Jugel et al., VLDB 2014; what "
        "Grafana-class frontends push into the engine): per series "
        "(user_id) and per 1-day bucket keep exactly the FIRST, LAST, "
        "MIN and MAX points, the four points that make a width-w "
        "line rendering pixel-exact while shrinking N points to at "
        "most 4 per bucket. Unlike sequential LTTB, M4 is "
        "embarrassingly parallel: one (user_id, bucket) hash "
        "partitioning serves all four extrema (Spark reuses the "
        "exchange; the four orderings are per-partition sorts, not "
        "extra shuffles), which is why it is the 100 TB choice. All "
        "four selectors use total deterministic orderings (value/ts/"
        "event_id tie-breaks), so both engines pick identical points; "
        "values are emitted raw (no arithmetic), timestamps as "
        "canonical strings.",
)
def q_time_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    from netcdf4_variable_streamer_spark.registry import ts_str

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 50)
        .select(
            "user_id", "ts", "value", "event_id",
            F.date_trunc("day", F.col("ts")).alias("b"),
        )
    )
    pb = ["user_id", "b"]
    rn = {
        "first": Window.partitionBy(*pb).orderBy(
            F.asc("ts"), F.asc("event_id")),
        "last": Window.partitionBy(*pb).orderBy(
            F.desc("ts"), F.desc("event_id")),
        "min": Window.partitionBy(*pb).orderBy(
            F.asc("value"), F.asc("ts"), F.asc("event_id")),
        "max": Window.partitionBy(*pb).orderBy(
            F.desc("value"), F.asc("ts"), F.asc("event_id")),
    }
    for role, w in rn.items():
        e = e.withColumn(f"rn_{role}", F.row_number().over(w))
    # one computed frame, roles derived by exploding the matching
    # selectors — a 4-branch union of filters would plan 4 identical
    # Exchanges (ReuseExchange does not collapse them across the
    # union); this shape has exactly ONE by construction
    role_arr = F.array(*[
        F.struct(
            F.lit(role).alias("role"), F.col(f"rn_{role}").alias("rn")
        )
        for role in rn
    ])
    out = e.withColumn(
        "role",
        F.explode(
            F.transform(
                F.filter(role_arr, lambda x: x["rn"] == 1),
                lambda x: x["role"],
            )
        ),
    )
    return out.select(
        "user_id",
        ts_str(F.col("b"), "yyyy-MM-dd").alias("bucket"),
        "role",
        ts_str(F.col("ts")).alias("ts"),
        "value",
        "event_id",
    ).orderBy("user_id", "bucket", "role", "event_id")
