"""Data-quality and table-maintenance analytics (B-3/B-2 adjacent):
batch sessionization, constraint validation, snapshot diffing, and
deletion-neighborhood fuzzy joins.

The operators a warehouse team runs *around* their data: sessionize the
event stream in batch (the gaps-and-islands twin of q_stream_session),
validate referential/uniqueness/range/enum constraints before publishing
a table, diff two table snapshots (the audit step of every backfill),
and resolve near-identical keys with an edit-distance join that never
goes quadratic (SymSpell-style deletion neighborhoods).

Determinism: epoch arithmetic is floored seconds on both engines, money
goes through cent fixed point, and every window order carries the
(ts, event_id) total tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from netcdf4_variable_streamer_spark.registry import register
from netcdf4_variable_streamer_spark.tables import load_table

_GAP_S = 1800  # 30-minute session gap


@register(
    "q_sessionize_gap",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, ts::TIMESTAMP AS ts,
         CAST(FLOOR(EPOCH(ts::TIMESTAMP)) AS BIGINT) AS es,
         CAST(FLOOR(value * 1000000) AS BIGINT) AS v_fp
  FROM events
),
marked AS (
  SELECT *,
         CASE WHEN es - LAG(es) OVER w > {_GAP_S}
                OR LAG(es) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
ids AS (
  SELECT *,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM marked
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       MAX(es) - MIN(es) AS duration_s,
       CAST(SUM(v_fp) AS BIGINT) AS sum_value_fp
FROM ids GROUP BY user_id, session_id
""",
    doc="Batch sessionization (gaps-and-islands): a new session starts "
        "when a user is idle > 30 min; sessions get per-user ordinal ids "
        "via the running sum of session-start flags — the batch twin of "
        "q_stream_session (same semantics, no watermark needed). ONE "
        "shuffle: both windows and the final roll-up share the user_id "
        "partitioning (the windows' (ts,event_id) sort orders the "
        "aggregation input for free). Floored-epoch gap comparison and "
        "fixed-point value sums keep it engine-exact. At 100 TB the "
        "window partition is one user's events — skew-bounded by the "
        "busiest user, the same bound the streaming twin carries.",
)
def q_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.unix_timestamp("ts").alias("es"),
        F.floor(F.col("value") * 1000000).cast("long").alias("v_fp"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "is_new",
        F.when(
            (F.col("es") - F.lag("es").over(w) > _GAP_S)
            | F.lag("es").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    ids = marked.withColumn(
        "session_id",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return ids.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        (F.max("es") - F.min("es")).alias("duration_s"),
        F.sum("v_fp").alias("sum_value_fp"),
    )


@register(
    "q_validate_constraints",
    oracle="""
SELECT 'fk_orders_customer' AS check_name,
       COUNT(*) AS n_violations, COUNT(*) = 0 AS passed
FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
WHERE c.c_custkey IS NULL
UNION ALL
SELECT 'unique_customer_key',
       COUNT(*) - COUNT(DISTINCT c_custkey),
       COUNT(*) - COUNT(DISTINCT c_custkey) = 0
FROM customer
UNION ALL
SELECT 'notnull_l_quantity',
       COUNT(*) - COUNT(l_quantity),
       COUNT(*) - COUNT(l_quantity) = 0
FROM lineitem
UNION ALL
SELECT 'range_l_discount',
       CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
                     THEN 1 ELSE 0 END) AS BIGINT),
       SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
                THEN 1 ELSE 0 END) = 0
FROM lineitem
UNION ALL
SELECT 'enum_o_orderstatus',
       CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                     THEN 1 ELSE 0 END) AS BIGINT),
       SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                THEN 1 ELSE 0 END) = 0
FROM orders
""",
    doc="Declarative constraint validation — the publish gate of a data "
        "pipeline: referential integrity (orders→customer via LEFT ANTI "
        "join), key uniqueness (count vs distinct), not-null, numeric "
        "range, and enum domain, each reported as (check, violations, "
        "passed). Every check is a single aggregation over its table "
        "with map-side partials; the FK check is the only join and its "
        "dim side broadcasts. At 100 TB this is the cheap full-scan "
        "audit (one pass per table, checks over the same table fuse "
        "into one scan), and the violation counts feed quarantine "
        "routing — the rows themselves are recoverable by re-running "
        "the same predicate as a filter instead of an aggregate.",
)
def q_validate_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")

    def row(name: str, viol: DataFrame) -> DataFrame:
        return viol.select(
            F.lit(name).alias("check_name"),
            F.col("n").alias("n_violations"),
            (F.col("n") == 0).alias("passed"),
        )

    fk = row(
        "fk_orders_customer",
        orders.join(
            F.broadcast(customer),
            orders.o_custkey == customer.c_custkey,
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("n")),
    )
    uniq = row(
        "unique_customer_key",
        customer.agg(
            (F.count(F.lit(1)) - F.countDistinct("c_custkey")).alias("n")
        ),
    )
    nn = row(
        "notnull_l_quantity",
        li.agg((F.count(F.lit(1)) - F.count("l_quantity")).alias("n")),
    )
    rng = row(
        "range_l_discount",
        li.agg(
            F.sum(
                F.when(
                    (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1),
                    1,
                ).otherwise(0)
            ).alias("n")
        ),
    )
    enum = row(
        "enum_o_orderstatus",
        orders.agg(
            F.sum(
                F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
                .otherwise(0)
            ).alias("n")
        ),
    )
    return fk.unionAll(uniq).unionAll(nn).unionAll(rng).unionAll(enum)


# deterministic synthetic "new snapshot" of orders:
#   keys % 97 == 0  → deleted
#   keys % 13 == 0  → totalprice bumped by 1.00 (detected as changed)
#   keys < 100      → re-inserted as key+20000 (detected as added)
_DIFF_NEW_CTE = """
new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 13 = 0
              THEN CAST(FLOOR(o_totalprice * 100) AS BIGINT) + 100
              ELSE CAST(FLOOR(o_totalprice * 100) AS BIGINT) END AS cents,
         o_orderstatus
  FROM orders WHERE o_orderkey % 97 <> 0
  UNION ALL
  SELECT o_orderkey + 20000,
         CAST(FLOOR(o_totalprice * 100) AS BIGINT),
         o_orderstatus
  FROM orders WHERE o_orderkey < 100
),
old AS (
  SELECT o_orderkey,
         CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderstatus
  FROM orders
)"""


@register(
    "q_table_diff",
    oracle=f"""
WITH {_DIFF_NEW_CTE},
d AS (
  SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS k,
         CASE WHEN old.o_orderkey IS NULL THEN 'added'
              WHEN new.o_orderkey IS NULL THEN 'removed'
              WHEN old.cents <> new.cents
                OR old.o_orderstatus <> new.o_orderstatus THEN 'changed'
              ELSE 'unchanged' END AS change_type,
         CASE WHEN old.o_orderkey IS NOT NULL
               AND new.o_orderkey IS NOT NULL
              THEN ABS(new.cents - old.cents) ELSE 0 END AS delta_cents
  FROM old FULL OUTER JOIN new ON new.o_orderkey = old.o_orderkey
)
SELECT change_type, COUNT(*) AS n,
       CAST(SUM(delta_cents) AS BIGINT) AS sum_delta_cents,
       MIN(k) AS min_key, MAX(k) AS max_key
FROM d GROUP BY change_type
""",
    doc="Snapshot diff — the audit step after every backfill/merge: two "
        "versions of a table are FULL OUTER joined on the key and every "
        "row is classified added/removed/changed/unchanged, with the "
        "absolute value drift (cent fixed point) accumulated for changed "
        "rows. The 'new' snapshot is derived deterministically from the "
        "old inside the query (delete %97, mutate %13, re-insert <100 "
        "shifted) so the whole diff is oracle-checkable. Shape at "
        "100 TB: ONE co-partitioned full-outer shuffle join on the key "
        "+ one tiny keyed roll-up; column comparison happens inline "
        "(no md5 row-hash materialization needed — Catalyst compares "
        "in codegen). This is also q_merge_scd1's verification dual: "
        "diff(old, merge(old, changes)) must equal the change set.",
)
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    old = o.select(
        "o_orderkey", cents.alias("cents"), "o_orderstatus"
    )
    new = (
        o.filter(F.col("o_orderkey") % 97 != 0)
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 13 == 0, cents + 100)
            .otherwise(cents)
            .alias("cents"),
            "o_orderstatus",
        )
        .unionAll(
            o.filter(F.col("o_orderkey") < 100).select(
                (F.col("o_orderkey") + 20000).alias("o_orderkey"),
                cents.alias("cents"),
                "o_orderstatus",
            )
        )
    )
    j = old.alias("old").join(
        new.alias("new"),
        F.col("old.o_orderkey") == F.col("new.o_orderkey"),
        "full_outer",
    )
    both = (
        F.col("old.o_orderkey").isNotNull()
        & F.col("new.o_orderkey").isNotNull()
    )
    d = j.select(
        F.coalesce(F.col("old.o_orderkey"), F.col("new.o_orderkey")).alias(
            "k"
        ),
        F.when(F.col("old.o_orderkey").isNull(), "added")
        .when(F.col("new.o_orderkey").isNull(), "removed")
        .when(
            (F.col("old.cents") != F.col("new.cents"))
            | (F.col("old.o_orderstatus") != F.col("new.o_orderstatus")),
            "changed",
        )
        .otherwise("unchanged")
        .alias("change_type"),
        F.when(both, F.abs(F.col("new.cents") - F.col("old.cents")))
        .otherwise(0)
        .alias("delta_cents"),
    )
    return d.groupBy("change_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("delta_cents").alias("sum_delta_cents"),
        F.min("k").alias("min_key"),
        F.max("k").alias("max_key"),
    )


@register(
    "q_join_fuzzy_levenshtein",
    oracle="""
WITH probes AS (
  SELECT c_custkey AS probe_key,
         SUBSTR(c_name, 1, 9 + (c_custkey % 8))
           || SUBSTR(c_name, 11 + (c_custkey % 8)) AS typo
  FROM customer
),
dels AS (
  SELECT c_custkey AS cand_key,
         SUBSTR(c_name, 1, i - 1) || SUBSTR(c_name, i + 1) AS var,
         c_name
  FROM customer, UNNEST(generate_series(1, LEN(c_name))) AS u(i)
),
m AS (
  SELECT DISTINCT p.probe_key, d.cand_key
  FROM probes p JOIN dels d ON d.var = p.typo
  WHERE levenshtein(p.typo, d.c_name) = 1
)
SELECT probe_key, COUNT(*) AS n_candidates, MIN(cand_key) AS best_key,
       MAX(CASE WHEN cand_key = probe_key THEN 1 ELSE 0 END) = 1
         AS self_found
FROM m GROUP BY probe_key
""",
    doc="Fuzzy key-resolution join via deletion neighborhoods (the "
        "SymSpell algorithm): probe strings with one deleted character "
        "are matched against the dictionary by generating every "
        "1-deletion variant of the dictionary side and EQUI-joining — "
        "edit-distance-1 matching with zero distance computations in "
        "the join itself (levenshtein runs only as a verify on the "
        "candidate pairs). This is how entity resolution avoids the "
        "quadratic all-pairs distance matrix: |dict| * len variants, "
        "one shuffle equi-join on the variant string, never a cross "
        "join. Probes are the customer names with char 10+(key%8) "
        "dropped, so every probe must re-find its own key "
        "(self_found asserted per row).",
)
def q_join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    probes = c.select(
        F.col("c_custkey").alias("probe_key"),
        F.concat(
            F.expr("substr(c_name, 1, 9 + (c_custkey % 8))"),
            F.expr("substr(c_name, 11 + (c_custkey % 8))"),
        ).alias("typo"),
    )
    nm = c.select(F.col("c_custkey").alias("cand_key"), "c_name")
    dels = nm.select(
        "cand_key",
        "c_name",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("c_name")),
                lambda i: F.concat(
                    F.col("c_name").substr(F.lit(1), i - 1),
                    F.col("c_name").substr(i + 1, F.length("c_name")),
                ),
            )
        ).alias("var"),
    )
    m = (
        probes.join(dels, probes.typo == dels.var)
        .filter(F.levenshtein("typo", "c_name") == 1)
        .select("probe_key", "cand_key")
        .distinct()
    )
    return m.groupBy("probe_key").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.min("cand_key").alias("best_key"),
        (
            F.max(
                F.when(F.col("cand_key") == F.col("probe_key"), 1).otherwise(
                    0
                )
            )
            == 1
        ).alias("self_found"),
    )


# deterministic versioned dimension: every customer has a v1 balance;
# customers with key % 3 == 0 got a +10.00 correction effective 1998-01-01
_PIT_CUT = "1998-01-01"


@register(
    "q_join_point_in_time",
    oracle=f"""
WITH dim AS (
  SELECT c_custkey AS k, CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS bal,
         1 AS version,
         TIMESTAMP '1995-01-01' AS eff_from,
         CASE WHEN c_custkey % 3 = 0 THEN TIMESTAMP '{_PIT_CUT}'
              ELSE TIMESTAMP '9999-01-01' END AS eff_to
  FROM customer
  UNION ALL
  SELECT c_custkey, CAST(FLOOR(c_acctbal * 100) AS BIGINT) + 1000,
         2, TIMESTAMP '{_PIT_CUT}', TIMESTAMP '9999-01-01'
  FROM customer WHERE c_custkey % 3 = 0
)
SELECT CAST(d.version AS BIGINT) AS version,
       CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
       COUNT(*) AS n_orders,
       CAST(SUM(d.bal) AS BIGINT) AS sum_bal_cents
FROM orders o
JOIN dim d ON d.k = o.o_custkey
          AND o.o_orderdate >= d.eff_from AND o.o_orderdate < d.eff_to
GROUP BY version, o_year
""",
    doc="Point-in-time (temporal) dimension lookup — the consumption "
        "side of SCD-2 history (q_merge_scd2 builds it, this queries "
        "it): every fact row joins the dimension VERSION that was valid "
        "at the fact's own timestamp (eff_from <= ts < eff_to), so 1997 "
        "orders see the old balance and 1999 orders the corrected one — "
        "the 'as the business knew it then' semantics reports need for "
        "restatements. Shape at 100 TB: an EQUI-join on the dimension "
        "key (co-partitioned with the fact's own key) with the validity "
        "range as a cheap post-join filter — fan-out bounded by versions "
        "per key (rarely > a handful); never a range-only join. The "
        "roll-up is |versions × years|-sized.",
)
def q_join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    bal = F.floor(F.col("c_acctbal") * 100).cast("long")
    v1 = cust.select(
        F.col("c_custkey").alias("k"),
        bal.alias("bal"),
        F.lit(1).alias("version"),
        F.lit("1995-01-01").cast("timestamp").alias("eff_from"),
        F.when(
            F.col("c_custkey") % 3 == 0, F.lit(_PIT_CUT)
        )
        .otherwise(F.lit("9999-01-01"))
        .cast("timestamp")
        .alias("eff_to"),
    )
    v2 = cust.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("k"),
        (bal + 1000).alias("bal"),
        F.lit(2).alias("version"),
        F.lit(_PIT_CUT).cast("timestamp").alias("eff_from"),
        F.lit("9999-01-01").cast("timestamp").alias("eff_to"),
    )
    dim = v1.unionAll(v2)
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(
            dim,
            (o.o_custkey == dim.k)
            & (o.o_orderdate >= dim.eff_from)
            & (o.o_orderdate < dim.eff_to),
        )
        .groupBy(
            F.col("version").cast("long").alias("version"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("bal").alias("sum_bal_cents"),
        )
    )


@register(
    "q_validate_referential",
    oracle="""
WITH ck AS (SELECT l_orderkey AS k, COUNT(*) AS n FROM lineitem GROUP BY 1),
ok AS (SELECT o_orderkey AS k, COUNT(*) AS n FROM orders GROUP BY 1),
cu AS (SELECT c_custkey AS k FROM customer),
oc AS (SELECT o_custkey AS k, COUNT(*) AS n FROM orders GROUP BY 1)
SELECT relation, n_child_rows, n_child_keys, n_orphan_keys,
       n_parent_keys, n_childless_parents FROM (
  SELECT 'lineitem->orders' AS relation,
         CAST((SELECT SUM(n) FROM ck) AS BIGINT) AS n_child_rows,
         (SELECT COUNT(*) FROM ck) AS n_child_keys,
         (SELECT COUNT(*) FROM ck
          WHERE k NOT IN (SELECT k FROM ok)) AS n_orphan_keys,
         (SELECT COUNT(*) FROM ok) AS n_parent_keys,
         (SELECT COUNT(*) FROM ok
          WHERE k NOT IN (SELECT k FROM ck)) AS n_childless_parents
  UNION ALL
  SELECT 'orders->customer',
         CAST((SELECT SUM(n) FROM oc) AS BIGINT),
         (SELECT COUNT(*) FROM oc),
         (SELECT COUNT(*) FROM oc
          WHERE k NOT IN (SELECT k FROM cu)),
         (SELECT COUNT(*) FROM cu),
         (SELECT COUNT(*) FROM cu
          WHERE k NOT IN (SELECT k FROM oc))
) u ORDER BY relation
""",
    doc="REFERENTIAL-integrity audit (round 12 — the FK sibling of "
        "q_validate_constraints; every warehouse load and every "
        "multi-table training-data join needs this before trusting a "
        "join): for each declared child->parent relation, count child "
        "rows/keys, ORPHAN child keys (no parent — broken joins drop "
        "these rows silently), parent keys, and CHILDLESS parents "
        "(expected in TPC-H: ~a third of customers have no orders — "
        "a nonzero here is signal, not failure). Shape: each side "
        "collapses to its KEY table map-side combinably first; the "
        "orphan/childless checks are key-table anti-joins — shuffle "
        "volume is |distinct keys|, never |rows|, and the audit "
        "output is O(relations).",
)
def q_validate_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")

    def relation(name, child_keys, parent_keys):
        ck = child_keys.groupBy(F.col("k")).agg(F.sum("one").alias("n"))
        pk = parent_keys.groupBy(F.col("k")).count().select("k")
        orphans = ck.join(pk, "k", "left_anti")
        childless = pk.join(ck.select("k"), "k", "left_anti")
        stats = ck.agg(
            F.sum("n").alias("n_child_rows"),
            F.count(F.lit(1)).alias("n_child_keys"),
        ).crossJoin(orphans.agg(F.count(F.lit(1)).alias("n_orphan_keys")))
        stats = stats.crossJoin(
            pk.agg(F.count(F.lit(1)).alias("n_parent_keys"))
        ).crossJoin(
            childless.agg(
                F.count(F.lit(1)).alias("n_childless_parents")
            )
        )
        return stats.select(
            F.lit(name).alias("relation"),
            "n_child_rows",
            "n_child_keys",
            "n_orphan_keys",
            "n_parent_keys",
            "n_childless_parents",
        )

    r1 = relation(
        "lineitem->orders",
        li.select(F.col("l_orderkey").alias("k"), F.lit(1).cast("long").alias("one")),
        od.select(F.col("o_orderkey").alias("k")),
    )
    r2 = relation(
        "orders->customer",
        od.select(F.col("o_custkey").alias("k"), F.lit(1).cast("long").alias("one")),
        cu.select(F.col("c_custkey").alias("k")),
    )
    return r1.unionAll(r2).orderBy("relation")
