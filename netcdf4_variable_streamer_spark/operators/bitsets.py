"""Bitwise expression family + bitmap/HLL distinct-counting operators.

Three keys:

- ``q_fn_bitwise`` (B-7 extension): the scalar bit-op family — ``& | ^``,
  shifts, ``bit_count``, lowest-set-bit isolation — all JVM-codegen
  expressions with exact DuckDB twins (two's-complement BIGINT semantics
  match; shifts are kept under 2^62 so neither engine overflows).

- ``q_agg_bitmap_distinct``: EXACT count-distinct as a mergeable bitmap —
  user ids are packed into 62-bit words (``word = id div 62``,
  ``bit = id % 62``), ``bit_or`` builds each word's bitmap, and
  ``sum(bit_count(word))`` reads the cardinality. This is the
  roaring-bitmap pattern warehouses use to make COUNT(DISTINCT)
  re-aggregable across rollup levels: the per-(group, word) bitmaps are a
  commutative monoid under OR, so partial bitmaps from 1000 executors (or
  from yesterday's materialization) merge without touching raw rows.
  Self-verified in-row against the direct ``countDistinct``.

- ``q_agg_hll_portable``: a HyperLogLog built from first principles with
  md5-derived hashes, so the 256 per-bucket registers are BIT-IDENTICAL
  in Spark and DuckDB — unlike engine-native sketches (q_agg_sketches)
  whose internals are opaque and only bound-checkable, every register is
  hash-matched and only the final estimate (a single double division)
  collapses to a tolerance boolean. rho is the trailing-zero rank
  ``bit_count((v & -v) - 1) + 1`` — same geometric distribution as the
  classic leading-zero rank, pure integer ops in both engines.

Scale posture: all three are one keyed aggregation with map-side partial
combine (class A in SCALE.md's appendix); the bitmap shuffles |groups| ×
|id-space|/62 words, the HLL shuffles at most 256 registers per partial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from netcdf4_variable_streamer_spark.registry import register
from netcdf4_variable_streamer_spark.tables import load_table

# Contract (ADVICE r2): the 62-bit word packing is defined for
# NON-NEGATIVE ids only — Spark's signed % would feed shiftleft a
# negative count (undefined) and its truncating div diverges from
# DuckDB's flooring //, so a negative id would silently produce
# different bitmaps per engine. The guard makes the contract loud: a
# negative id raises USER_RAISED_EXCEPTION at scan time instead of
# diverging. Zero cost on valid data (the branch is codegen'd and never
# taken); the word expression stays the plain div because the guard in
# the SAME projection already killed the row.
_MASK_EXPR = (
    "CASE WHEN user_id < 0 THEN "
    "CAST(raise_error('bitmap ops require user_id >= 0') AS BIGINT) "
    "ELSE shiftleft(CAST(1 AS BIGINT), CAST(user_id % 62 AS INT)) END"
)


@register(
    "q_fn_bitwise",
    oracle="""
SELECT o_orderkey,
       o_orderkey & 255 AS low_byte,
       (o_orderkey & 1023) | 4096 AS with_flag,
       xor(o_orderkey & 1023, 341) AS toggled,
       (o_orderkey & 1023) << 3 AS shl3,
       o_orderkey >> 2 AS shr2,
       bit_count(o_orderkey) AS n_bits,
       o_orderkey & (-o_orderkey) AS low_bit,
       (o_orderkey >> 5) & 1 AS bit5
FROM orders
""",
    doc="Scalar bitwise family: AND/OR/XOR, shifts, popcount, lowest-set-"
        "bit isolation, single-bit probe — all whole-stage-codegen JVM "
        "expressions (map-only, zero shuffles). Shift operands are masked "
        "to 10 bits so no value approaches BIGINT overflow in either "
        "engine (DuckDB raises on shift overflow; Spark wraps — keeping "
        "the domain small makes the semantics identical).",
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.expr("o_orderkey & 255").alias("low_byte"),
        F.expr("(o_orderkey & 1023) | 4096").alias("with_flag"),
        F.expr("(o_orderkey & 1023) ^ 341").alias("toggled"),
        F.expr("shiftleft(o_orderkey & 1023, 3)").alias("shl3"),
        F.expr("shiftright(o_orderkey, 2)").alias("shr2"),
        F.expr("bit_count(o_orderkey)").cast("long").alias("n_bits"),
        F.expr("o_orderkey & (-o_orderkey)").alias("low_bit"),
        F.expr("(o_orderkey >> 5) & 1").alias("bit5"),
    )


@register(
    "q_agg_bitmap_distinct",
    oracle="""
WITH words AS (
  SELECT event_type, user_id // 62 AS word,
         bit_or(1::BIGINT << CAST(user_id % 62 AS INTEGER)) AS bitmap
  FROM events GROUP BY event_type, word
),
bm AS (
  SELECT event_type,
         CAST(SUM(bit_count(bitmap)) AS BIGINT) AS n_users_bitmap,
         COUNT(*) AS n_words
  FROM words GROUP BY event_type
),
direct AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS n_users_exact
  FROM events GROUP BY event_type
)
SELECT d.event_type, b.n_users_bitmap, b.n_words, d.n_users_exact,
       b.n_users_bitmap = d.n_users_exact AS bitmap_matches
FROM direct d JOIN bm b ON b.event_type = d.event_type
""",
    doc="Exact distinct via mergeable 62-bit bitmap words: id -> (word, "
        "bit), bit_or per (group, word), popcount-sum per group. The "
        "bitmap words form a monoid under OR, so distinct counts become "
        "re-aggregable partials — the production answer when COUNT("
        "DISTINCT) must roll up across days/partitions without a re-scan "
        "and HLL's error bars are not acceptable. Shuffle payload is "
        "|groups| x |id-space|/62 words, independent of row count; "
        "verified in-row against countDistinct.",
)
def q_agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    words = (
        ev.select(
            "event_type",
            F.expr("user_id div 62").alias("word"),
            F.expr(_MASK_EXPR).alias("mask"),
        )
        .groupBy("event_type", "word")
        .agg(F.bit_or("mask").alias("bitmap"))
    )
    bm = words.groupBy("event_type").agg(
        F.sum(F.expr("bit_count(bitmap)")).alias("n_users_bitmap"),
        F.count(F.lit(1)).alias("n_words"),
    )
    direct = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact")
    )
    return direct.join(bm, "event_type").select(
        "event_type",
        "n_users_bitmap",
        "n_words",
        "n_users_exact",
        (F.col("n_users_bitmap") == F.col("n_users_exact")).alias(
            "bitmap_matches"
        ),
    )


_HLL_M = 256  # buckets; 1.04/sqrt(256) ~ 6.5% standard error
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)
_HLL_TOL = 0.20  # ~3 sigma; registers themselves are exact-checked

# rho = trailing-zero rank of the 52-bit post-bucket hash (same geometric
# law as the classic leading-zero rank); v = 0 has probability 2^-52 and
# pins to the max rank.
_RHO_SQL = "CASE WHEN v = 0 THEN 53 ELSE bit_count((v & (-v)) - 1) + 1 END"


@register(
    "q_agg_hll_portable",
    oracle=f"""
WITH h AS (
  SELECT CAST(('0x' || SUBSTR(MD5(CAST(l_orderkey AS VARCHAR)), 1, 15))
              AS BIGINT) AS h60
  FROM lineitem
),
split AS (SELECT h60 % {_HLL_M} AS bucket, h60 // {_HLL_M} AS v FROM h),
regs AS (
  SELECT bucket, MAX({_RHO_SQL}) AS register
  FROM split GROUP BY bucket
),
spine AS (
  SELECT CAST(r.range AS BIGINT) AS bucket,
         CAST(COALESCE(g.register, 0) AS BIGINT) AS register
  FROM range(0, {_HLL_M}) r LEFT JOIN regs g ON g.bucket = r.range
),
est AS (
  SELECT SUM(CAST(1::BIGINT << CAST(60 - register AS INTEGER)
                  AS DECIMAL(38, 0))) AS s,
         SUM(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS n_zero
  FROM spine
),
exact AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM lineitem),
verdict AS (
  -- nested CASE so LN(m / n_zero) is never evaluated with n_zero = 0
  SELECT CASE WHEN e.n_zero > 0
              THEN (CASE WHEN {_HLL_M}.0 * LN({_HLL_M}.0 / e.n_zero)
                              < 2.5 * {_HLL_M}
                         THEN {_HLL_M}.0 * LN({_HLL_M}.0 / e.n_zero)
                         ELSE CAST({_HLL_ALPHA!r} AS DOUBLE) * {_HLL_M}.0 * {_HLL_M}.0
                              * 1152921504606846976.0
                              / CAST(e.s AS DOUBLE)
                    END)
              ELSE CAST({_HLL_ALPHA!r} AS DOUBLE) * {_HLL_M}.0 * {_HLL_M}.0
                   * 1152921504606846976.0 / CAST(e.s AS DOUBLE)
         END AS hll_est, x.n
  FROM est e, exact x
)
SELECT bucket, register FROM spine
UNION ALL
SELECT -1 AS bucket,
       CAST(ABS(hll_est - n) <= {_HLL_TOL!r} * n AS BIGINT) AS register
FROM verdict
""",
    doc="HyperLogLog from first principles, cross-engine portable: "
        "md5-derived 60-bit hash -> 256 buckets x 52-bit value; register "
        "= max trailing-zero rank per bucket. Because the hash and the "
        "rank are pure integer SQL, ALL 256 registers hash-match DuckDB "
        "exactly (the part engine-native sketches cannot offer); only the "
        "final estimate division is floating point and is emitted as its "
        "<=20% |est-exact| bound (linear-counting correction applied when "
        "empty buckets remain). One aggregation; partial registers merge "
        "with MAX, so 1000 executors ship 256 longs each — the sketch "
        "rollup algebra of q_agg_sketches, but fully auditable.",
)
def q_agg_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    h = li.select(
        F.conv(
            F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 15),
            16,
            10,
        )
        .cast("long")
        .alias("h60")
    )
    split = h.select(
        F.expr(f"h60 % {_HLL_M}").alias("bucket"),
        F.expr(f"h60 div {_HLL_M}").alias("v"),
    )
    regs = split.groupBy("bucket").agg(
        F.max(F.expr(_RHO_SQL)).alias("register")
    )
    spine = (
        spark.range(_HLL_M)
        .select(F.col("id").alias("bucket"))
        .join(regs, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("register", F.lit(0)).cast("long").alias("register"),
        )
    )
    est = spine.agg(
        F.sum(
            F.expr(
                "CAST(shiftleft(CAST(1 AS BIGINT), CAST(60 - register AS INT))"
                " AS DECIMAL(38, 0))"
            )
        ).alias("s"),
        F.sum(F.when(F.col("register") == 0, 1).otherwise(0)).alias("n_zero"),
    )
    exact = li.agg(F.countDistinct("l_orderkey").alias("n"))
    # NULL-out the n_zero = 0 case before dividing (ANSI mode errors on /0);
    # the surrounding when() then falls through to the raw estimate.
    nz_safe = F.when(F.col("n_zero") > 0, F.col("n_zero"))
    lc = _HLL_M * F.log(_HLL_M / nz_safe)
    raw = (
        F.lit(_HLL_ALPHA * _HLL_M * _HLL_M)
        * F.lit(float(1 << 60))
        / F.col("s").cast("double")
    )
    verdict = est.crossJoin(exact).select(
        F.when((F.col("n_zero") > 0) & (lc < 2.5 * _HLL_M), lc)
        .otherwise(raw)
        .alias("hll_est"),
        "n",
    )
    assertion = verdict.select(
        F.lit(-1).cast("long").alias("bucket"),
        (F.abs(F.col("hll_est") - F.col("n")) <= _HLL_TOL * F.col("n"))
        .cast("long")
        .alias("register"),
    )
    return spine.unionByName(assertion)


_CMS_D = 4  # hash rows
_CMS_W = 64  # counters per row


def _cms_col_sql(row: int, tok_expr: str) -> str:
    return (
        f"CAST(('0x' || SUBSTR(MD5('cms{row}:' || {tok_expr}), 1, 12)) "
        f"AS BIGINT) % {_CMS_W}"
    )


@register(
    "q_agg_cms_portable",
    oracle=f"""
WITH tok AS (
  SELECT t.tok FROM documents,
       UNNEST(STRING_SPLIT(text, ' ')) AS t(tok)
  WHERE t.tok <> ''
),
hashed AS (
  SELECT tok, r.range AS r,
         CASE r.range
           WHEN 0 THEN {_cms_col_sql(0, 'tok')}
           WHEN 1 THEN {_cms_col_sql(1, 'tok')}
           WHEN 2 THEN {_cms_col_sql(2, 'tok')}
           ELSE {_cms_col_sql(3, 'tok')}
         END AS col
  FROM tok, range(0, {_CMS_D}) r
),
cells AS (
  SELECT r, col, COUNT(*) AS cnt FROM hashed GROUP BY r, col
),
n AS (SELECT COUNT(*) AS n_tokens FROM tok),
exact AS (
  SELECT tok, COUNT(*) AS true_cnt FROM tok GROUP BY tok
  ORDER BY true_cnt DESC, tok LIMIT 5
),
probes AS (
  SELECT e.tok, e.true_cnt, MIN(c.cnt) AS est
  FROM exact e
  JOIN hashed h ON h.tok = e.tok
  JOIN cells c ON c.r = h.r AND c.col = h.col
  GROUP BY e.tok, e.true_cnt
)
SELECT 'cell' AS kind, r AS a, col AS b, cnt AS v FROM cells
UNION ALL
SELECT 'est ' || p.tok, p.true_cnt, p.est,
       CAST(p.est >= p.true_cnt
            AND p.est <= p.true_cnt + n.n_tokens // 8 AS BIGINT)
FROM probes p, n
""",
    doc="Count-Min sketch from first principles, cross-engine portable: "
        "corpus tokens hashed by 4 md5-derived rows into 64 counters "
        "each; ALL 256 cells are exact integer counts, so the entire "
        "sketch hash-matches DuckDB (counts, unlike HLL registers, are "
        "order-independent sums). The 5 true heaviest tokens are then "
        "probed: min-over-rows estimate must dominate the true count "
        "(CMS one-sided guarantee, checked exactly) and stay within the "
        "epsilon*N additive bound. Shuffle payload is 256 counters per "
        "partial regardless of corpus size — the mergeable-sketch "
        "algebra with every intermediate auditable.",
)
def q_agg_cms_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    rows = F.array(*[F.lit(i) for i in range(_CMS_D)])
    hashed = tok.select(
        "tok", F.explode(rows).alias("r")
    ).withColumn(
        "col",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("cms"),
                        F.col("r").cast("string"),
                        F.lit(":"),
                        F.col("tok"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        % _CMS_W,
    )
    cells = hashed.groupBy("r", "col").agg(F.count(F.lit(1)).alias("cnt"))
    n = tok.agg(F.count(F.lit(1)).alias("n_tokens"))
    exact = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), "tok")
        .limit(5)
    )
    # duplicate (tok, r, col) rows from multiple occurrences are harmless
    # under MIN, so no distinct — the 5-row exact side broadcasts
    probes = (
        exact.join(hashed, "tok")
        .join(cells, ["r", "col"])
        .groupBy("tok", "true_cnt")
        .agg(F.min("cnt").alias("est"))
    )
    cell_rows = cells.select(
        F.lit("cell").alias("kind"),
        F.col("r").cast("long").alias("a"),
        F.col("col").alias("b"),
        F.col("cnt").alias("v"),
    )
    est_rows = probes.crossJoin(n).select(
        F.concat(F.lit("est "), F.col("tok")).alias("kind"),
        F.col("true_cnt").alias("a"),
        F.col("est").alias("b"),
        (
            (F.col("est") >= F.col("true_cnt"))
            & (
                F.col("est")
                <= F.col("true_cnt") + F.expr("n_tokens div 8")
            )
        )
        .cast("long")
        .alias("v"),
    )
    return cell_rows.unionByName(est_rows)


@register(
    "q_win_sliding_distinct",
    oracle="""
WITH p AS (
  SELECT DISTINCT
         DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_int,
         user_id
  FROM events
),
bm AS (
  SELECT day_int, user_id // 62 AS word,
         bit_or(1::BIGINT << CAST(user_id % 62 AS INTEGER)) AS bitmap
  FROM p GROUP BY day_int, word
),
days AS (
  SELECT g AS day_int
  FROM (SELECT MIN(day_int) AS d0, MAX(day_int) AS d1 FROM p),
       UNNEST(generate_series(d0, d1)) AS u(g)
),
words AS (SELECT DISTINCT word FROM bm),
spine AS (
  SELECT d.day_int, w.word, COALESCE(b.bitmap, 0) AS bitmap
  FROM days d CROSS JOIN words w
  LEFT JOIN bm b ON b.day_int = d.day_int AND b.word = w.word
),
rolled AS (
  SELECT day_int, word, bitmap,
         bit_or(bitmap) OVER (PARTITION BY word ORDER BY day_int
                              RANGE BETWEEN 6 PRECEDING
                                AND CURRENT ROW) AS bm7
  FROM spine
),
agg AS (
  SELECT day_int,
         CAST(SUM(bit_count(bitmap)) AS BIGINT) AS n_1d,
         CAST(SUM(bit_count(bm7)) AS BIGINT) AS n_7d
  FROM rolled GROUP BY day_int
),
exact AS (
  SELECT d.day_int, COUNT(DISTINCT p.user_id) AS n_7d_exact
  FROM days d JOIN p ON p.day_int BETWEEN d.day_int - 6 AND d.day_int
  GROUP BY d.day_int
)
SELECT a.day_int, a.n_1d, a.n_7d,
       COALESCE(e.n_7d_exact, 0) AS n_7d_exact,
       a.n_7d = COALESCE(e.n_7d_exact, 0) AS bitmap_matches
FROM agg a LEFT JOIN exact e ON e.day_int = a.day_int
""",
    doc="Sliding-window distinct count (7-day active users per day) via "
        "mergeable bitmaps — the operator that makes windowed "
        "COUNT(DISTINCT) tractable: SQL engines cannot express "
        "distinct-over-window directly, and re-scanning 7 days of raw "
        "events per day multiplies read cost 7x. Here each day "
        "materializes per-word bitmap partials once; the 7-day roll-up "
        "is bit_or OVER a range frame per word (bitmaps are an OR-"
        "monoid, so window merging is exact), and popcount reads the "
        "answer. Self-verified in-row against the direct 7-day distinct "
        "join. At 100 TB the daily bitmap table is |days| x id-space/62 "
        "longs — independent of event volume — and yesterday's bitmaps "
        "never need recomputation (the incremental-maintenance property "
        "q_agg_incremental_merge proves in general).",
)
def q_win_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    p = ev.select(
        F.datediff(
            F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
        )
        .cast("long")
        .alias("day_int"),
        "user_id",
    ).distinct()
    bm = (
        p.select(
            "day_int",
            F.expr("user_id div 62").alias("word"),
            F.expr(_MASK_EXPR).alias("mask"),
        )
        .groupBy("day_int", "word")
        .agg(F.bit_or("mask").alias("bitmap"))
    )
    bounds = p.agg(
        F.min("day_int").alias("d0"), F.max("day_int").alias("d1")
    )
    days = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day_int")
    )
    words = bm.select("word").distinct()
    spine = (
        days.crossJoin(F.broadcast(words))
        .join(bm, ["day_int", "word"], "left")
        .select(
            "day_int",
            "word",
            F.coalesce("bitmap", F.lit(0).cast("long")).alias("bitmap"),
        )
    )
    w7 = (
        Window.partitionBy("word").orderBy("day_int").rangeBetween(-6, 0)
    )
    rolled = spine.withColumn("bm7", F.bit_or("bitmap").over(w7))
    agg = rolled.groupBy("day_int").agg(
        F.sum(F.expr("bit_count(bitmap)")).alias("n_1d"),
        F.sum(F.expr("bit_count(bm7)")).alias("n_7d"),
    )
    exact = (
        days.join(
            p.withColumnRenamed("day_int", "p_day"),
            F.col("p_day").between(F.col("day_int") - 6, F.col("day_int")),
        )
        .groupBy("day_int")
        .agg(F.countDistinct("user_id").alias("n_7d_exact"))
    )
    return agg.join(exact, "day_int", "left").select(
        "day_int",
        "n_1d",
        "n_7d",
        F.coalesce("n_7d_exact", F.lit(0).cast("long")).alias("n_7d_exact"),
        (F.col("n_7d") == F.coalesce("n_7d_exact", F.lit(0))).alias(
            "bitmap_matches"
        ),
    )


@register(
    "q_win_running_distinct",
    oracle="""
WITH tid AS (
  SELECT event_type, ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS bit
  FROM (SELECT DISTINCT event_type FROM events)
),
e AS (
  SELECT ev.user_id, ev.event_id, ev.ts::TIMESTAMP AS ts,
         1::BIGINT << CAST(t.bit AS INTEGER) AS mask
  FROM events ev JOIN tid t ON t.event_type = ev.event_type
),
r AS (
  SELECT user_id, event_id,
         bit_or(mask) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS seen
  FROM e
)
SELECT user_id, event_id,
       CAST(bit_count(seen) AS BIGINT) AS n_types_seen
FROM r
""",
    doc="Running COUNT(DISTINCT) per user over time — how many distinct "
        "event types each user has touched as of each event. Distinct-"
        "over-window is inexpressible in SQL aggregates, but a bounded "
        "domain becomes a BITMASK: event types map to bit positions "
        "(deterministic alphabetical assignment, joined as a broadcast "
        "dim), the running set is bit_or over an unbounded-preceding "
        "frame, popcount reads the cardinality. One user_id window "
        "partitioning, O(1) state per row — the same trick "
        "q_win_sliding_distinct plays with range frames, here as the "
        "cumulative form (funnel-breadth metrics).",
)
def q_win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    tid = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            (
                F.row_number().over(Window.orderBy("event_type")) - 1
            ).alias("bit"),
        )
    )
    e = ev.join(F.broadcast(tid), "event_type").select(
        "user_id",
        "event_id",
        "ts",
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))").alias(
            "mask"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.bit_or("mask").over(w).alias("seen"),
    ).select(
        "user_id",
        "event_id",
        F.expr("CAST(bit_count(seen) AS BIGINT)").alias("n_types_seen"),
    )


@register(
    "q_agg_bitmap_jaccard",
    oracle="""
WITH words AS (
  SELECT event_type, user_id // 62 AS word,
         bit_or(1::BIGINT << CAST(user_id % 62 AS INTEGER)) AS bitmap
  FROM events GROUP BY event_type, word
),
tot AS (
  SELECT event_type, CAST(SUM(bit_count(bitmap)) AS BIGINT) AS n
  FROM words GROUP BY event_type
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(SUM(bit_count(a.bitmap & b.bitmap)) AS BIGINT) AS n_inter
  FROM words a JOIN words b
    ON b.word = a.word AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT p.type_a, p.type_b, p.n_inter,
       ta.n + tb.n - p.n_inter AS n_union,
       (p.n_inter * 1000000) // (ta.n + tb.n - p.n_inter) AS jaccard_ppm
FROM pairs p
JOIN tot ta ON ta.event_type = p.type_a
JOIN tot tb ON tb.event_type = p.type_b
""",
    doc="Audience overlap between event types via bitmap set ALGEBRA: "
        "the per-(type, word) bitmaps of q_agg_bitmap_distinct are "
        "joined word-against-word and intersected/unioned with single "
        "AND/OR instructions — 62 membership tests per machine op — "
        "then popcount-summed into exact Jaccard ppm per type pair. "
        "This is why warehouses keep bitmap indexes: set intersection "
        "between precomputed audiences costs |id-space|/62 words, "
        "never a distinct-join over raw events. The inner word join "
        "computes the intersection exactly (absent words contribute "
        "0); the union comes from |A| + |B| - |A&B| against the "
        "|types|-sized per-type totals, so one-sided words are never "
        "dropped. Word-keyed equi-join, |types|^2-bounded output.",
)
def q_agg_bitmap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    words = (
        ev.select(
            "event_type",
            F.expr("user_id div 62").alias("word"),
            F.expr(_MASK_EXPR).alias("mask"),
        )
        .groupBy("event_type", "word")
        .agg(F.bit_or("mask").alias("bitmap"))
    )
    a = words.alias("a")
    b = words.alias("b")
    tot = words.groupBy("event_type").agg(
        F.sum(F.expr("bit_count(bitmap)")).cast("long").alias("n")
    )
    pairs = (
        a.join(
            b,
            (F.col("b.word") == F.col("a.word"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(
            F.sum(F.expr("bit_count(a.bitmap & b.bitmap)"))
            .cast("long")
            .alias("n_inter"),
        )
    )
    return (
        pairs.join(
            F.broadcast(tot).withColumnRenamed("event_type", "type_a")
            .withColumnRenamed("n", "na"),
            "type_a",
        )
        .join(
            F.broadcast(tot).withColumnRenamed("event_type", "type_b")
            .withColumnRenamed("n", "nb"),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            "n_inter",
            (F.col("na") + F.col("nb") - F.col("n_inter")).alias("n_union"),
            F.expr(
                "(n_inter * 1000000) div (na + nb - n_inter)"
            ).alias("jaccard_ppm"),
        )
    )


_HLL_IE_TOL = 0.30  # inclusion-exclusion error scales with the UNION size


def _hll_est_sql(s: str, n_zero: str) -> str:
    """Closed-form HLL readout (linear counting when zeros remain)."""
    raw = (
        f"CAST({_HLL_ALPHA!r} AS DOUBLE) * {_HLL_M}.0 * {_HLL_M}.0"
        f" * 1152921504606846976.0 / CAST({s} AS DOUBLE)"
    )
    lc = f"{_HLL_M}.0 * LN({_HLL_M}.0 / ({n_zero}))"
    return (
        f"CASE WHEN ({n_zero}) > 0 THEN "
        f"(CASE WHEN {lc} < 2.5 * {_HLL_M} THEN {lc} ELSE {raw} END) "
        f"ELSE {raw} END"
    )


@register(
    "q_agg_hll_setops",
    oracle=f"""
WITH h AS (
  SELECT l_returnflag AS grp,
         CAST(('0x' || SUBSTR(MD5(CAST(l_orderkey AS VARCHAR)), 1, 15))
              AS BIGINT) AS h60
  FROM lineitem WHERE l_returnflag IN ('A', 'N')
),
split AS (
  SELECT grp, h60 % {_HLL_M} AS bucket, h60 // {_HLL_M} AS v FROM h
),
regs AS (
  SELECT grp, bucket, MAX({_RHO_SQL}) AS register
  FROM split GROUP BY grp, bucket
),
uni AS (
  SELECT CAST(r.range AS BIGINT) AS bucket,
         CAST(COALESCE(MAX(g.register), 0) AS BIGINT) AS register
  FROM range(0, {_HLL_M}) r
  LEFT JOIN regs g ON g.bucket = r.range
  GROUP BY r.range
),
per_grp AS (
  SELECT grp,
         SUM(CAST(1::BIGINT << CAST(60 - register AS INTEGER)
                  AS DECIMAL(38, 0)))
           + ({_HLL_M} - COUNT(*)) * CAST(1::BIGINT << 60 AS DECIMAL(38, 0))
           AS s,
         {_HLL_M} - COUNT(CASE WHEN register > 0 THEN 1 END) AS n_zero
  FROM regs GROUP BY grp
),
uni_est AS (
  SELECT SUM(CAST(1::BIGINT << CAST(60 - register AS INTEGER)
                  AS DECIMAL(38, 0))) AS s,
         SUM(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS n_zero
  FROM uni
),
ex AS (
  SELECT COUNT(DISTINCT l_orderkey) FILTER (l_returnflag = 'A') AS na,
         COUNT(DISTINCT l_orderkey) FILTER (l_returnflag = 'N') AS nn,
         COUNT(DISTINCT CASE WHEN l_returnflag IN ('A', 'N')
                             THEN l_orderkey END) AS nu
  FROM lineitem
),
ints AS (
  SELECT COUNT(*) AS ni FROM (
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
    INTERSECT
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'N') t
),
est AS (
  SELECT ({_hll_est_sql('u.s', 'u.n_zero')}) AS e_uni,
         ({_hll_est_sql('a.s', 'a.n_zero')}) AS e_a,
         ({_hll_est_sql('b.s', 'b.n_zero')}) AS e_b
  FROM uni_est u,
       (SELECT * FROM per_grp WHERE grp = 'A') a,
       (SELECT * FROM per_grp WHERE grp = 'N') b
)
SELECT bucket, register FROM uni
UNION ALL
SELECT -1, CAST(ABS(e.e_uni - x.nu) <= {_HLL_TOL!r} * x.nu AS BIGINT)
FROM est e, ex x
UNION ALL
SELECT -2, CAST(ABS((e.e_a + e.e_b - e.e_uni) - i.ni)
                <= {_HLL_IE_TOL!r} * x.nu AS BIGINT)
FROM est e, ex x, ints i
""",
    doc="HLL SET ALGEBRA on the portable sketch — the reason sketches "
        "beat exact bitmaps across datasets: per-group (returnflag A/N) "
        "register sketches merge into the UNION sketch by per-bucket "
        "MAX — a lossless operation, so all 256 union registers are "
        "hash-checked bit-identical cross-engine — and the intersection "
        "is estimated by inclusion-exclusion est(A)+est(B)-est(A∪B). "
        "Two assertion rows pin the numerics: the union estimate within "
        "20% of the exact distinct union, the I-E intersection within "
        "30% of exact (its error scales with the union — the documented "
        "weakness that makes theta sketches exist). Per-group partials "
        "are 256 longs each, mergeable at any rollup level; the exact "
        "verification side never ships raw keys anywhere at scale — "
        "it exists only as the fixture-size oracle.",
)
def q_agg_hll_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    h = li.filter(F.col("l_returnflag").isin("A", "N")).select(
        F.col("l_returnflag").alias("grp"),
        F.conv(
            F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 15),
            16, 10,
        ).cast("long").alias("h60"),
    )
    split = h.select(
        "grp",
        F.expr(f"h60 % {_HLL_M}").alias("bucket"),
        F.expr(f"h60 div {_HLL_M}").alias("v"),
    )
    regs = split.groupBy("grp", "bucket").agg(
        F.max(F.expr(_RHO_SQL)).alias("register")
    )
    uni = (
        spark.range(_HLL_M)
        .select(F.col("id").alias("bucket"))
        .join(regs.groupBy("bucket").agg(F.max("register").alias("r")),
              "bucket", "left")
        .select(
            "bucket",
            F.coalesce("r", F.lit(0)).cast("long").alias("register"),
        )
    )
    two60 = "CAST(shiftleft(CAST(1 AS BIGINT), CAST(60 - register AS INT)) AS DECIMAL(38, 0))"
    per_grp = regs.groupBy("grp").agg(
        (
            F.sum(F.expr(two60))
            + (_HLL_M - F.count(F.lit(1)))
            * F.expr("CAST(shiftleft(CAST(1 AS BIGINT), 60) AS DECIMAL(38, 0))")
        ).alias("s"),
        (
            _HLL_M
            - F.count(F.when(F.col("register") > 0, 1))
        ).alias("n_zero"),
    )
    uni_est = uni.agg(
        F.sum(F.expr(two60)).alias("s"),
        F.sum(F.when(F.col("register") == 0, 1).otherwise(0)).alias("n_zero"),
    )
    ex = li.agg(
        F.countDistinct(
            F.when(F.col("l_returnflag") == "A", F.col("l_orderkey"))
        ).alias("na"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "N", F.col("l_orderkey"))
        ).alias("nn"),
        F.countDistinct(
            F.when(
                F.col("l_returnflag").isin("A", "N"), F.col("l_orderkey")
            )
        ).alias("nu"),
    )
    ints = (
        li.filter(F.col("l_returnflag") == "A")
        .select("l_orderkey")
        .intersect(
            li.filter(F.col("l_returnflag") == "N").select("l_orderkey")
        )
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    est_expr = _hll_est_sql("s", "n_zero")
    e_uni = uni_est.selectExpr(f"({est_expr}) AS e_uni")
    e_a = per_grp.filter(F.col("grp") == "A").selectExpr(
        f"({est_expr}) AS e_a"
    )
    e_b = per_grp.filter(F.col("grp") == "N").selectExpr(
        f"({est_expr}) AS e_b"
    )
    joined = (
        e_uni.crossJoin(e_a).crossJoin(e_b).crossJoin(ex).crossJoin(ints)
    )
    a_uni = joined.select(
        F.lit(-1).cast("long").alias("bucket"),
        (F.abs(F.col("e_uni") - F.col("nu")) <= _HLL_TOL * F.col("nu"))
        .cast("long")
        .alias("register"),
    )
    a_int = joined.select(
        F.lit(-2).cast("long").alias("bucket"),
        (
            F.abs((F.col("e_a") + F.col("e_b") - F.col("e_uni")) - F.col("ni"))
            <= _HLL_IE_TOL * F.col("nu")
        )
        .cast("long")
        .alias("register"),
    )
    return uni.unionByName(a_uni).unionByName(a_int)
