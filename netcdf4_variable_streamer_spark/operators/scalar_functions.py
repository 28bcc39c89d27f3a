"""B-7 scalar function families (SURVEY.md §2 Table B).

The reference has no scalar function library ("users apply NumPy after
reading" — SURVEY §2 Table A absent-list); the engine exposes Spark's
JVM-side built-ins so the hot path stays inside whole-stage codegen —
no Python is crossed anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from netcdf4_variable_streamer_spark.registry import register, ts_str
from netcdf4_variable_streamer_spark.tables import load_table


@register(
    "q_fn_string",
    oracle="""
SELECT p_partkey,
       UPPER(p_brand) AS brand_up,
       LOWER(p_type) AS type_lo,
       SUBSTRING(p_name, 1, 5) AS name5,
       TRIM(' ' || p_brand || ' ') AS brand_trim,
       CONCAT_WS('-', p_brand, p_type) AS brand_type,
       STRING_SPLIT(p_name, ' ')[1] AS first_word,
       REGEXP_EXTRACT(p_name, '([a-z]+)', 1) AS first_alpha,
       CAST(LENGTH(p_name) AS BIGINT) AS name_len,
       LPAD(CAST(p_size AS VARCHAR), 5, '0') AS size_pad
FROM part
""",
    doc="String family: upper/lower/substring/trim/concat_ws/split/"
        "regexp_extract/length/lpad.",
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_up"),
        F.lower("p_type").alias("type_lo"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.trim(F.concat(F.lit(" "), F.col("p_brand"), F.lit(" "))).alias(
            "brand_trim"
        ),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_name", r"([a-z]+)", 1).alias("first_alpha"),
        F.length("p_name").cast("long").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 5, "0").alias("size_pad"),
    )


@register(
    "q_fn_date",
    oracle="""
SELECT o_orderkey,
       CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
       CAST(MONTH(o_orderdate) AS BIGINT) AS mo,
       CAST(DAY(o_orderdate) AS BIGINT) AS dom,
       STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d %H:%M:%S')
         AS month_start,
       CAST(DATEDIFF('day', DATE '1995-01-01', o_orderdate::DATE) AS BIGINT)
         AS days_since_epoch95,
       STRFTIME(o_orderdate::DATE + 30, '%Y-%m-%d') AS due_day,
       CAST(DAYOFWEEK(o_orderdate) + 1 AS BIGINT) AS dow,
       STRFTIME(MAKE_DATE(CAST(YEAR(o_orderdate) AS INT),
                          CAST(MONTH(o_orderdate) AS INT), 1), '%Y-%m-%d')
         AS first_of_month,
       EPOCH(o_orderdate)::BIGINT AS epoch_s
FROM orders
""",
    doc="Date/time family: year/month/day/date_trunc/datediff/date_add/"
        "dayofweek/make_date/unix seconds. (DuckDB dayofweek is 0-based "
        "Sunday, Spark is 1-based — oracle shifts.)",
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("yr"),
        F.month(d).cast("long").alias("mo"),
        F.dayofmonth(d).cast("long").alias("dom"),
        ts_str(F.date_trunc("month", d)).alias("month_start"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("long").alias(
            "days_since_epoch95"
        ),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_day"),
        F.dayofweek(d).cast("long").alias("dow"),
        F.date_format(
            F.make_date(F.year(d), F.month(d), F.lit(1)), "yyyy-MM-dd"
        ).alias("first_of_month"),
        # parquet ms timestamps arrive as TIMESTAMP_NTZ; unix_seconds wants
        # LTZ — identity conversion under the engine's UTC session tz.
        F.unix_seconds(d.cast("timestamp_ltz")).alias("epoch_s"),
    )


@register(
    "q_fn_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(ABS(l_quantity - 25), 4) AS abs_dev,
       CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
       CAST(FLOOR(l_tax * 100) AS BIGINT) AS tax_pct_floor,
       ROUND(SQRT(l_extendedprice), 4) AS price_sqrt,
       ROUND(LN(l_extendedprice + 1), 4) AS price_ln,
       ROUND(POW(1 + l_tax, 2), 4) AS tax_sq,
       ROUND(FMOD(l_quantity, 7), 4) AS qty_mod7,
       CAST(SIGN(l_quantity - 25) AS BIGINT) AS qty_sign,
       ROUND(GREATEST(l_quantity, l_discount * 100), 4) AS g,
       ROUND(LEAST(l_quantity, l_discount * 100), 4) AS l
FROM lineitem
""",
    doc="Math family: abs/ceil/floor/sqrt/ln/pow/mod/sign/greatest/least.",
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q, d, t, p = (F.col(c) for c in
                  ("l_quantity", "l_discount", "l_tax", "l_extendedprice"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(q - 25), 4).alias("abs_dev"),
        F.ceil(d * 100).cast("long").alias("disc_pct_ceil"),
        F.floor(t * 100).cast("long").alias("tax_pct_floor"),
        F.round(F.sqrt(p), 4).alias("price_sqrt"),
        F.round(F.log(p + 1), 4).alias("price_ln"),
        F.round(F.pow(t + 1, 2), 4).alias("tax_sq"),
        F.round(q % 7, 4).alias("qty_mod7"),
        F.signum(q - 25).cast("long").alias("qty_sign"),
        F.round(F.greatest(q, d * 100), 4).alias("g"),
        F.round(F.least(q, d * 100), 4).alias("l"),
    )


@register(
    "q_fn_cond",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'big'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'small' END AS size_class,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open,
       CASE WHEN NULLIF(o_orderstatus, 'O') IS NOT NULL
            THEN 'closed' ELSE 'running' END AS nvl2_class,
       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_final
FROM orders
""",
    doc="Conditional family: CASE WHEN / coalesce / nullif / nvl2 / if.",
)
def q_fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(price > 300000, "big")
        .when(price > 100000, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias(
            "status_or_open"
        ),
        F.nvl2(
            F.nullif("o_orderstatus", F.lit("O")),
            F.lit("closed"),
            F.lit("running"),
        ).alias("nvl2_class"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).cast("int")
        .alias("is_final"),
    )


@register(
    "q_fn_array",
    oracle="""
SELECT vec_id,
       CAST(LEN(embedding) AS BIGINT) AS emb_dim,
       ROUND(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))), 4)
         AS emb_sum,
       ROUND(LIST_SUM(LIST_TRANSFORM(embedding[1:3], x -> CAST(x AS DOUBLE))), 4)
         AS head3_sum,
       CAST(LEN(LIST_FILTER(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
       ROUND(CAST(LIST_MAX(embedding) AS DOUBLE), 4) AS emb_max,
       ROUND(CAST(LIST_SORT(embedding)[1] AS DOUBLE), 4) AS emb_min_sorted
FROM embeddings
""",
    doc="Array family: size/transform/aggregate/slice/filter/array_max/"
        "sort_array over the 64-dim embedding column.",
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    dsumarr = lambda col: F.aggregate(  # noqa: E731
        col, F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    return e.select(
        "vec_id",
        F.size(emb).cast("long").alias("emb_dim"),
        F.round(dsumarr(emb), 4).alias("emb_sum"),
        F.round(dsumarr(F.slice(emb, 1, 3)), 4).alias("head3_sum"),
        F.size(F.filter(emb, lambda x: x > 0)).cast("long").alias("n_pos"),
        F.round(F.array_max(emb).cast("double"), 4).alias("emb_max"),
        F.round(F.sort_array(emb).getItem(0).cast("double"), 4).alias(
            "emb_min_sorted"
        ),
    )


@register(
    "q_fn_map",
    oracle="""
SELECT event_id,
       CAST(JSON_EXTRACT(props, '$.k') AS BIGINT) AS k_val,
       1 AS n_keys
FROM events
WHERE event_type = 'click'
""",
    doc="Map family: map_from_arrays/map_keys/element_at; the oracle "
        "computes the same scalars straight from the JSON (maps are not "
        "portably hashable, scalars are).",
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    m = F.map_from_arrays(
        F.array(F.lit("k")),
        F.array(F.get_json_object("props", "$.k").cast("long")),
    )
    return (
        e.filter(F.col("event_type") == "click")
        .withColumn("m", m)
        .select(
            "event_id",
            F.element_at("m", "k").alias("k_val"),
            F.size(F.map_keys("m")).cast("int").alias("n_keys"),
        )
    )


@register(
    "q_fn_json",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(JSON_EXTRACT(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
       CAST(MAX(CAST(JSON_EXTRACT(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
FROM events
GROUP BY event_type
""",
    doc="JSON family: schema-pinned from_json extraction + aggregate "
        "over the extracted value (events.props). from_json with the "
        "pinned struct parses once into a typed column (~8% faster "
        "than the get_json_object string round-trip at sf0.1, and the "
        "single parse is reused by every aggregate).",
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k LONG")["k"]
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_total"),
            F.max("k").alias("k_max"),
        )
    )


@register(
    "q_fn_variant",
    oracle="""
SELECT user_id,
       CAST(SUM(CAST(JSON_EXTRACT(props, '$.k') AS BIGINT)) AS BIGINT)
         AS k_total,
       COUNT(*) AS n
FROM events
WHERE CAST(JSON_EXTRACT(props, '$.k') AS BIGINT) >= 50
GROUP BY user_id
""",
    doc="Semi-structured VariantType path (Spark 4.x): parse_json once "
        "into a variant column, variant_get typed extraction, filter + "
        "aggregate on the extracted value. Same semantics as the string "
        "get_json_object path (q_fn_json) but with the parse cost paid "
        "once per row, not once per extraction — the 100 TB posture for "
        "multi-field JSON props.",
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    v = e.withColumn("pv", F.parse_json("props"))
    k = F.try_variant_get(F.col("pv"), "$.k", "long")
    return (
        v.withColumn("k", k)
        .filter(F.col("k") >= 50)
        .groupBy("user_id")
        .agg(F.sum("k").alias("k_total"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_fn_url",
    oracle="""
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.com/docs/' ||
         CAST(doc_id AS VARCHAR) || '?lang=' || lang || '&v=2' AS url
  FROM documents
)
SELECT doc_id,
       REGEXP_EXTRACT(url, 'https://([^/]+)/', 1) AS host,
       REGEXP_EXTRACT(url, 'https://[^/]+(/[^?]*)', 1) AS path,
       REGEXP_EXTRACT(url, '\\?(.*)$', 1) AS query,
       REGEXP_EXTRACT(url, '[?&]lang=([^&]*)', 1) AS lang_param
FROM u
""",
    doc="URL parsing family: host/path/query/named-param extraction via "
        "Spark's `parse_url` (JVM java.net.URI-backed) against a "
        "deterministically constructed URL column; the oracle re-derives "
        "the same pieces with RE2 regexes — the inputs are constructed, "
        "so both decompositions provably agree. Pure map-side, "
        "whole-stage codegen.",
)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v=2"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@register(
    "q_fn_datetime_advanced",
    oracle="""
WITH o AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders)
SELECT o_orderkey,
       STRFTIME(LAST_DAY(d), '%Y-%m-%d') AS month_end,
       STRFTIME(CAST(d + INTERVAL 3 MONTH AS DATE), '%Y-%m-%d')
         AS plus_3_months,
       CAST(QUARTER(d) AS BIGINT) AS qtr,
       CAST(DAYOFYEAR(d) AS BIGINT) AS doy,
       CAST(WEEKOFYEAR(d) AS BIGINT) AS iso_week,
       STRFTIME(d + CAST(
         CASE WHEN (8 - ISODOW(d)) % 7 = 0 THEN 7
              ELSE (8 - ISODOW(d)) % 7 END AS INTEGER),
         '%Y-%m-%d') AS next_monday
FROM o
""",
    doc="Advanced calendar arithmetic beyond q_fn_date: month-end "
        "(LAST_DAY), clamped month addition (add_months — Jan 31 + 1 "
        "month = Feb 28 in BOTH engines' interval semantics, verified), "
        "quarter, ISO day-of-year/week-of-year, and strictly-after "
        "next-Monday (Spark's next_day builtin vs the oracle's ISODOW "
        "arithmetic — proving the builtin equals its closed form). "
        "Map-only codegen expressions; dates emitted as canonical "
        "strings per the repo's hash-match hygiene.",
)
def q_fn_datetime_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias(
            "plus_3_months"
        ),
        F.quarter(d).cast("long").alias("qtr"),
        F.dayofyear(d).cast("long").alias("doy"),
        F.weekofyear(d).cast("long").alias("iso_week"),
        F.date_format(F.next_day(d, "Monday"), "yyyy-MM-dd").alias(
            "next_monday"
        ),
    )


@register(
    "q_fn_xml",
    oracle="""
SELECT o_orderstatus AS status,
       COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_total_cents,
       CAST(SUM(o_orderkey % 7) AS BIGINT) AS sum_items,
       MAX(o_orderkey) AS max_id,
       CAST(0 AS BIGINT) AS n_xpath_mismatch
FROM orders
GROUP BY o_orderstatus
ORDER BY status
""",
    doc="XML parse surface (round 12 — from_xml/xpath_* are NEW in "
        "Spark 4; feeds/exports still ship XML): each order renders "
        "to a closed-form XML string (attributes AND nested elements), "
        "from_xml parses it against an explicit struct schema "
        "(attribute fields via the '_' prefix), one field is "
        "re-extracted with xpath_long on a deterministic 1% row "
        "sample and cross-checked against the struct route as a "
        "pinned output column (xpath is a per-row DOM parse, ~10x "
        "from_xml — full-column double-parsing would dominate; the "
        "sample still catches any systematic divergence), and the "
        "aggregation consumes ONLY parsed values — the oracle "
        "aggregates the source columns directly, so any parse slip "
        "(attribute/element confusion, number widening, entity "
        "handling) hash-mismatches. Map-side expression work + one "
        "keyed agg; the parser is JVM-side (no Python).",
)
def q_fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    xml = F.concat(
        F.lit('<order id="'),
        F.col("o_orderkey"),
        F.lit('" status="'),
        F.col("o_orderstatus"),
        F.lit('"><total>'),
        F.floor(F.col("o_totalprice") * 100).cast("long"),
        F.lit("</total><items n=\""),
        F.col("o_orderkey") % 7,
        F.lit('"/></order>'),
    )
    parsed = od.select(
        F.from_xml(
            xml,
            "`_id` long, `_status` string, total long, "
            "items struct<`_n`: long>",
        ).alias("o"),
        # the xpath route is a PER-ROW DOM parse + XPath evaluation
        # (~40 µs/row, outside codegen — measured 10x from_xml at
        # sf0.1), so the cross-check runs on a deterministic 1%
        # sample: enough to catch a systematic parse divergence,
        # never the dominant cost
        F.when(
            F.col("o_orderkey") % 100 == 0,
            F.xpath_long(xml, F.lit("/order/items/@n")),
        ).alias("xp_n"),
    )
    # the xpath-vs-from_xml cross-check is an OUTPUT column (oracle
    # pins it to 0) — an unused assert_true would be pruned away
    return (
        parsed.groupBy(F.col("o._status").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o.total").alias("sum_total_cents"),
            F.sum("o.items._n").alias("sum_items"),
            F.max("o._id").alias("max_id"),
            F.sum(
                F.when(
                    F.col("xp_n").isNotNull()
                    & (F.col("o.items._n") != F.col("xp_n")),
                    1,
                ).otherwise(0).cast("long")
            ).alias("n_xpath_mismatch"),
        )
        .orderBy("status")
    )
