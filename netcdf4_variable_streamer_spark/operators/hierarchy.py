"""Hierarchy flattening and privacy auditing (warehouse side-operators).

``q_hierarchy_flatten`` builds the bounded-depth ancestor CLOSURE of a
tree — the materialization behind org-chart rollups, BOM explosions, and
category-path filters. Spark has no recursive CTE, so the closure is k
deterministic self-join rounds (depth is a declared constant, exactly
like q_graph_bfs_reach's frontier hops); the DuckDB oracle is the real
``WITH RECURSIVE`` with the same depth bound, proving the unrolled form
equals the recursive one.

``q_privacy_k_anonymity`` is the release-gate audit: group sizes over a
quasi-identifier tuple, rows in groups smaller than k flagged for
suppression — one aggregation, the privacy twin of
q_validate_constraints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from netcdf4_variable_streamer_spark.registry import register
from netcdf4_variable_streamer_spark.tables import load_table

_DEPTH = 4  # ancestor closure bound
_FANOUT = 8  # parent(c) = c div 8 — a deterministic 8-ary tree
_K_ANON = 5


@register(
    "q_hierarchy_flatten",
    oracle=f"""
WITH RECURSIVE nodes AS (
  SELECT c_custkey AS node, c_custkey // {_FANOUT} AS parent
  FROM customer
),
anc(node, anc, depth) AS (
  SELECT node, parent, 1 FROM nodes WHERE parent > 0
  UNION ALL
  SELECT a.node, n.parent, a.depth + 1
  FROM anc a JOIN nodes n ON n.node = a.anc
  WHERE n.parent > 0 AND a.depth < {_DEPTH}
)
SELECT node, anc, CAST(depth AS BIGINT) AS depth FROM anc
""",
    doc="Bounded-depth ancestor closure of an 8-ary tree over customer "
        "keys (parent = key div 8): every (node, ancestor, depth<=4) "
        "pair, the materialized path table hierarchies are queried "
        "through. Spark side: 4 unrolled self-joins on the parent edge "
        "set (each round one keyed equi-join — the recursive-CTE "
        "unrolling, same shape as q_graph_bfs_reach); oracle side: a "
        "genuine WITH RECURSIVE with the same bound, so the unrolled "
        "plan is proven equal to the recursive semantics. At 100 TB "
        "closure size is nodes x depth (linear for bounded-depth "
        "trees); each round reuses the same parent-key partitioning.",
)
def q_hierarchy_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    nodes = c.select(
        F.col("c_custkey").alias("node"),
        F.expr(f"c_custkey div {_FANOUT}").alias("parent"),
    )
    edges = nodes.filter(F.col("parent") > 0)
    closure = edges.select(
        "node", F.col("parent").alias("anc"), F.lit(1).alias("depth")
    )
    frontier = closure
    for _ in range(_DEPTH - 1):
        frontier = (
            frontier.join(
                nodes.select(
                    F.col("node").alias("anc"),
                    F.col("parent").alias("next_anc"),
                ),
                "anc",
            )
            .filter(F.col("next_anc") > 0)
            .select(
                "node",
                F.col("next_anc").alias("anc"),
                (F.col("depth") + 1).alias("depth"),
            )
        )
        closure = closure.unionByName(frontier)
    return closure.select("node", "anc", F.col("depth").cast("long"))


@register(
    "q_privacy_k_anonymity",
    oracle=f"""
WITH qi AS (
  SELECT c_mktsegment AS segment, c_nationkey AS nation,
         CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
         COUNT(*) AS group_size
  FROM customer
  GROUP BY 1, 2, 3
)
SELECT segment, nation, bal_bucket, group_size,
       group_size >= {_K_ANON} AS meets_k,
       CASE WHEN group_size >= {_K_ANON} THEN 0
            ELSE group_size END AS rows_to_suppress
FROM qi
""",
    doc=f"k-anonymity audit (k={_K_ANON}) over the quasi-identifier "
        "tuple (market segment, nation, $1000 balance bucket): any "
        "group smaller than k re-identifies its members and is flagged "
        "with its suppression cost. One hash aggregation — the privacy "
        "release gate that runs before every data publish, shaped "
        "exactly like q_validate_constraints. At 100 TB the group "
        "count is bounded by the QI domain product, not the row count.",
)
def q_privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    qi = c.groupBy(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nation"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket"),
    ).agg(F.count(F.lit(1)).alias("group_size"))
    meets = F.col("group_size") >= _K_ANON
    return qi.select(
        "segment",
        "nation",
        "bal_bucket",
        "group_size",
        meets.alias("meets_k"),
        F.when(meets, 0).otherwise(F.col("group_size"))
        .cast("long")
        .alias("rows_to_suppress"),
    )
