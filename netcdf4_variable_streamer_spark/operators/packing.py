"""Sequence packing — the training-batch assembly step of an LLM data
pipeline: concatenate documents in a deterministic order and cut the
stream into fixed token-budget training sequences ("concat-and-chunk"
packing; each document is assigned to the sequence where it starts).

The interesting part is HOW the global running token count is computed.
A naive ``Window.orderBy(doc_id)`` with no partition key collapses the
whole corpus into ONE partition — the canonical Spark scale-killer. This
operator instead computes the exact global prefix sum in two phases, the
way a 1000-executor cluster has to:

  phase A  deterministic order-preserving range buckets on ``doc_id``
           (bucket width derived from ``max(doc_id)`` — one scalar agg);
           per-bucket token totals are aggregated and collected — a
           provably bounded driver collect (``_N_BUCKETS`` rows, like the
           IVF centroid collect precedent);
  phase B  exclusive prefix offsets over those totals become a literal
           CASE column; each bucket then runs a LOCAL cumulative-sum
           window partitioned by bucket (max partition size = bucket
           width, never the corpus) and adds its offset.

offset(bucket) + local_cumsum == global cumsum exactly, independent of
bucket boundaries — asserted against the oracle's single global window.
The plan contains NO single-partition Exchange (test_plans assertion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from netcdf4_variable_streamer_spark.registry import register
from netcdf4_variable_streamer_spark.tables import load_table

_BUDGET = 2048  # tokens per packed training sequence
_N_BUCKETS = 64  # prefix-sum parallelism (↑ with cluster size)


@register(
    "q_pack_sequences",
    oracle=f"""
WITH d AS (
  SELECT doc_id,
         CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM d
),
assigned AS (
  SELECT doc_id, n_tokens,
         CAST((cum - n_tokens) // {_BUDGET} AS BIGINT) AS seq_id
  FROM c
)
SELECT seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM assigned
GROUP BY seq_id
""",
    doc="Token-budget sequence packing via a two-phase distributed prefix "
        "sum: per-bucket totals -> exclusive offsets -> bucket-local "
        "cumsum windows. Exactly equals the oracle's single global "
        "window, with no single-partition Exchange anywhere in the plan.",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )

    # deterministic, order-preserving range bucketing on the sort key;
    # max(doc_id) is a scalar aggregate (metadata-cheap)
    max_id = d.agg(F.max("doc_id")).collect()[0][0] or 0
    width = max_id // _N_BUCKETS + 1
    d = d.withColumn("bkt", (F.col("doc_id") / width).cast("long"))

    # phase A: per-bucket token totals — bounded collect (≤ _N_BUCKETS rows)
    totals = {
        r["bkt"]: r["s"]
        for r in d.groupBy("bkt").agg(F.sum("n_tokens").alias("s")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(totals):
        offsets[b] = acc
        acc += totals[b]

    off = F.lit(0).cast("long")
    for b, v in offsets.items():
        off = F.when(F.col("bkt") == b, F.lit(v).cast("long")).otherwise(off)

    # phase B: bucket-local running sum + offset == exact global cumsum
    w = (
        Window.partitionBy("bkt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w) + off
    assigned = d.select(
        "doc_id",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / _BUDGET).alias("seq_id"),
    )
    return assigned.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("seq_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@register(
    "q_pipeline_pretrain",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang, text,
         CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
kept AS (
  SELECT * FROM scored
  WHERE n_tokens >= 20
    AND MD5(CAST(doc_id AS VARCHAR)) <
        CASE lang WHEN 'en' THEN '33333333' WHEN 'zh' THEN 'ffffffff'
                  ELSE 'cccccccc' END
),
deduped AS (
  SELECT doc_id, lang, n_tokens FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY text
                                 ORDER BY doc_id) AS rn
    FROM kept) t
  WHERE rn = 1
),
c AS (
  SELECT doc_id, lang, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM deduped
),
assigned AS (
  SELECT lang, n_tokens,
         CAST((cum - n_tokens) // {_BUDGET} AS BIGINT) AS seq_id
  FROM c
)
SELECT seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
       COUNT(DISTINCT lang) AS n_langs
FROM assigned
GROUP BY seq_id
""",
    doc="End-to-end pretraining-data pipeline composed from the engine's "
        "own stages: length filter -> per-language deterministic "
        "downsampling (md5 keep-rates: en 20 %, zh ~100 %, rest 80 %) -> "
        "exact dedup (keep lowest doc_id per text) -> token-budget "
        "sequence packing via the same two-phase distributed prefix sum "
        "as q_pack_sequences (bucket totals -> offsets -> bucket-local "
        "windows; no single-partition Exchange). One declarative plan "
        "end to end — Catalyst fuses the filter+sample into the scan, "
        "the dedup is one keyed shuffle, packing adds one bounded "
        "collect + one bucket-keyed window. The oracle replays the "
        "identical pipeline as chained CTEs.",
)
def q_pipeline_pretrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "text",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    rate = (
        F.when(F.col("lang") == "en", "33333333")
        .when(F.col("lang") == "zh", "ffffffff")
        .otherwise("cccccccc")
    )
    kept = d.filter(
        (F.col("n_tokens") >= 20)
        & (F.md5(F.col("doc_id").cast("string")) < rate)
    )
    w_dedup = Window.partitionBy("text").orderBy("doc_id")
    deduped = (
        kept.withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "n_tokens")
    )

    # two-phase prefix sum over the SURVIVING docs (ids no longer dense —
    # range buckets only need order preservation, not density)
    max_id = deduped.agg(F.max("doc_id")).collect()[0][0] or 0
    width = max_id // _N_BUCKETS + 1
    dd = deduped.withColumn("bkt", (F.col("doc_id") / width).cast("long"))
    totals = {
        r["bkt"]: r["s"]
        for r in dd.groupBy("bkt").agg(F.sum("n_tokens").alias("s")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(totals):
        offsets[b] = acc
        acc += totals[b]
    off = F.lit(0).cast("long")
    for b, v in offsets.items():
        off = F.when(F.col("bkt") == b, F.lit(v).cast("long")).otherwise(off)
    w = (
        Window.partitionBy("bkt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w) + off
    assigned = dd.select(
        "lang",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / _BUDGET).alias("seq_id"),
    )
    return assigned.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("seq_tokens"),
        F.countDistinct("lang").alias("n_langs"),
    )
