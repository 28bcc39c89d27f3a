"""B-10 deduplication operators (north star: LLM-data-pipeline dedup).

Four strategies over `documents`, all shuffle-disciplined for 100 TB:

- exact:       one hash-shuffle on the full text (or its md5 at scale);
- n-gram Jaccard: exact all-pairs on a bounded subset (quadratic — the
  honest baseline the LSH variants approximate);
- MinHash+LSH: shingle → 32-perm MinHash → 8×4 banding → bucket join →
  exact-Jaccard verify of candidates only. The candidate join is on
  (band, signature) — cardinality ∝ near-duplicates, not |corpus|²;
- SimHash:     60-bit sign fingerprint, 15-bit chunk bucketing (pigeonhole:
  hamming ≤ 3 ⇒ ≥1 of 4 chunks equal), bit_count verify.

All arithmetic is integer/hash-based → fully deterministic AND fully
cross-engine portable: the base hash is an md5-derived integer
(identical in Spark and DuckDB) and the MinHash permutations are
universal-hash arithmetic ((a*h + b) mod p), so both pipelines admit a
complete DuckDB oracle — no xxhash64, no rows-only escape hatch.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from netcdf4_variable_streamer_spark.registry import register
from netcdf4_variable_streamer_spark.tables import load_table

NUM_PERM = 32
BANDS = 8
ROWS_PER_BAND = NUM_PERM // BANDS
MAX_BUCKET = 64  # LSH bucket-width cap: wider = boilerplate, not near-dups

# Universal-hash MinHash permutations: mh_p(x) = (A[p]*h(x) + B[p]) mod P
# with h(x) a 28-bit md5-derived int. P = 2^31-1 (prime); A*h < 2^59 so the
# arithmetic never overflows int64 in either engine. The constants are
# seeded module-level so the Spark builder and the DuckDB oracle string are
# generated from the SAME values by construction.
MINHASH_P = 2_147_483_647
_rng = random.Random(42)
MH_A = [_rng.randrange(1, MINHASH_P) for _ in range(NUM_PERM)]
MH_B = [_rng.randrange(0, MINHASH_P) for _ in range(NUM_PERM)]

# md5-derived integer hashes, identical in Spark and DuckDB (verified):
#   Spark : CAST(conv(substring(md5(x), 1, n), 16, 10) AS BIGINT)
#   DuckDB: CAST(('0x' || SUBSTR(MD5(x), 1, n)) AS BIGINT)
# n=7 hex chars → 28-bit (minhash base), n=15 → 60-bit (simhash token hash).


def _md5_int(col: Column, hex_chars: int) -> Column:
    return F.conv(F.substring(F.md5(col), 1, hex_chars), 16, 10).cast("long")


def _md5_int_sql(expr: str, hex_chars: int) -> str:
    return f"CAST(('0x' || SUBSTR(MD5({expr}), 1, {hex_chars})) AS BIGINT)"


# DuckDB twin of _shingles() over the whole documents table (UNNESTed).
_SHINGLES_SQL = """
  SELECT doc_id, UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
           generate_series(1, LEN(STRING_SPLIT(text, ' ')) - 2),
           i -> STRING_SPLIT(text, ' ')[i] || ' ' ||
                STRING_SPLIT(text, ' ')[i+1] || ' ' ||
                STRING_SPLIT(text, ' ')[i+2]))) AS s
  FROM documents
"""


def _shingles(toks: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles from a MATERIALIZED token array.

    ``toks`` must be a projected column holding ``split(text, ' ')``, not
    the split expression itself: Spark re-evaluates an inline expression
    on every ``element_at`` inside the lambda — O(tokens²) splits per row
    (measured 7× slower at sf0.1).

    Docs shorter than ``k`` tokens yield an EMPTY array: without the
    guard, ``sequence(1, size-k+1)`` DESCENDS for size < k (Spark infers
    step -1) and ``element_at`` then faults under ANSI with
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT (found by the round-11
    two-table-API test; the documents fixture never has < k tokens).
    """
    idx = F.sequence(F.lit(1), F.size(toks) - (k - 1))
    return F.when(F.size(toks) < k, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j) for j in range(k)]
                ),
            )
        )
    )


@register(
    "q_dedup_exact",
    oracle="""
SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies, MD5(text) AS text_md5
FROM documents
GROUP BY text
""",
    doc="Exact dedup: keep min doc_id per identical text. At 100 TB the "
        "shuffle key is md5(text) (16 bytes), not the text itself.",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.withColumn("text_md5", F.md5("text"))
        .groupBy("text_md5")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keep_id", "n_copies", "text_md5")
    )


@register(
    "q_dedup_ngram_jaccard",
    oracle="""
WITH sh AS (
  SELECT doc_id,
         LIST_DISTINCT(LIST_TRANSFORM(
           generate_series(1, LEN(STRING_SPLIT(text,' ')) - 2),
           i -> STRING_SPLIT(text,' ')[i] || ' ' ||
                STRING_SPLIT(text,' ')[i+1] || ' ' ||
                STRING_SPLIT(text,' ')[i+2])) AS ss
  FROM documents WHERE doc_id < 150
)
SELECT a.doc_id AS d1, b.doc_id AS d2,
       ROUND(CAST(LEN(LIST_INTERSECT(a.ss, b.ss)) AS DOUBLE)
             / LEN(LIST_DISTINCT(LIST_CONCAT(a.ss, b.ss))), 4) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE CAST(LEN(LIST_INTERSECT(a.ss, b.ss)) AS DOUBLE)
      / LEN(LIST_DISTINCT(LIST_CONCAT(a.ss, b.ss))) >= 0.2
""",
    doc="Exact all-pairs word-3-gram Jaccard on a bounded subset — the "
        "ground-truth kernel the LSH pipeline approximates.",
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 150)
        .select("doc_id", F.split("text", " ").alias("toks"))
        .select("doc_id", _shingles(F.col("toks")).alias("ss"))
    )
    a, b = d.alias("a"), d.alias("b")
    inter = F.size(F.array_intersect(F.col("a.ss"), F.col("b.ss")))
    union = F.size(F.array_union(F.col("a.ss"), F.col("b.ss")))
    jac = inter.cast("double") / union
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(jac >= 0.2)
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            F.round(jac, 4).alias("jaccard"),
        )
    )


def _minhash_oracle() -> str:
    mh_cols = ",\n         ".join(
        f"MIN(({MH_A[p]} * h + {MH_B[p]}) % {MINHASH_P}) AS mh{p}"
        for p in range(NUM_PERM)
    )
    band_selects = "\n  UNION ALL ".join(
        "SELECT doc_id, {b} AS band, MD5(CONCAT_WS(',', {cols})) AS sig FROM mh".format(
            b=b,
            cols=", ".join(
                f"mh{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)
            ),
        )
        for b in range(BANDS)
    )
    return f"""
WITH sh AS ({_SHINGLES_SQL}),
h AS (SELECT doc_id, {_md5_int_sql('s', 7)} AS h FROM sh),
mh AS (
  SELECT doc_id,
         {mh_cols}
  FROM h GROUP BY doc_id
),
bands AS (
  {band_selects}
),
capped AS (
  SELECT doc_id, band, sig FROM (
    SELECT doc_id, band, sig,
           COUNT(*) OVER (PARTITION BY band, sig) AS w
    FROM bands) WHERE w <= {MAX_BUCKET}
),
cands AS (
  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
  FROM capped x JOIN capped y
    ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.d1, c.d2, COUNT(*) AS n_inter
  FROM cands c
  JOIN sh s1 ON s1.doc_id = c.d1
  JOIN sh s2 ON s2.doc_id = c.d2 AND s2.s = s1.s
  GROUP BY c.d1, c.d2
)
SELECT i.d1, i.d2,
       ROUND(CAST(n_inter AS DOUBLE) / (z1.n_sh + z2.n_sh - n_inter), 4)
         AS jaccard
FROM inter i
JOIN sizes z1 ON z1.doc_id = i.d1
JOIN sizes z2 ON z2.doc_id = i.d2
WHERE CAST(n_inter AS DOUBLE) / (z1.n_sh + z2.n_sh - n_inter) >= 0.6
"""


@register(
    "q_dedup_near_minhash",
    oracle=_minhash_oracle(),
    doc="MinHash+LSH near-dup pipeline: 3-gram shingles → 32-perm MinHash "
        "(universal-hash permutations over a 28-bit md5-derived base hash "
        "— portable to DuckDB, so the WHOLE pipeline is oracle-checked) → "
        "8 bands × 4 rows → bucket join for candidates → exact Jaccard "
        "≥ 0.6 verify on candidates only. At 100 TB the band signature "
        "stays a 16-byte digest, never the raw minhash tuple.",
)
def q_dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("toks"))
        .select("doc_id", _shingles(F.col("toks")).alias("ss"))
    )
    # Round 19 (guide §5, train-once): the shingled frame feeds three
    # branches (band table, explode-verify, sizes) that diverge BEFORE
    # any exchange, so each would re-run the O(tokens) shingle HOF over
    # the full corpus — checkpoint makes shingle-once a plan contract.
    d = d.filter(F.size("ss") > 0).localCheckpoint(eager=False)
    ex = d.select("doc_id", F.explode("ss").alias("sh")).withColumn(
        "h", _md5_int(F.col("sh"), 7)
    )

    # 32 universal-hash min-aggregations in one shuffle on doc_id
    mh = ex.groupBy("doc_id").agg(
        *[
            F.min((F.lit(MH_A[p]) * F.col("h") + F.lit(MH_B[p])) % MINHASH_P)
            .alias(f"mh{p}")
            for p in range(NUM_PERM)
        ]
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"mh{b * ROWS_PER_BAND + r}")
                            for r in range(ROWS_PER_BAND)
                        ],
                    )
                ).alias("sig"),
            )
            for b in range(BANDS)
        ]
    )
    bands = mh.select("doc_id", F.explode(band_structs).alias("bs")).select(
        "doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )
    # Skew guard (standard LSH practice): a bucket with > MAX_BUCKET members
    # is boilerplate colliding into one signature, not near-duplicates —
    # and it would contribute O(width^2) candidate pairs. Cap it before the
    # self-join so one pathological signature can't quadratically dominate;
    # AQE skew-split handles the sub-cap imbalance that remains.
    wb = Window.partitionBy("band", "sig")
    bands = bands.withColumn(
        "bucket_width", F.count(F.lit(1)).over(wb)
    ).filter(F.col("bucket_width") <= MAX_BUCKET).drop("bucket_width")
    x, y = bands.alias("x"), bands.alias("y")
    cands = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.sig") == F.col("y.sig"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("d1"), F.col("y.doc_id").alias("d2")
        )
        .distinct()
    )

    # exact-Jaccard verification of candidates only
    sizes = d.select("doc_id", F.size("ss").alias("n_sh"))
    sh = d.select("doc_id", F.explode("ss").alias("sh"))
    inter = (
        cands.join(sh.alias("s1"), F.col("d1") == F.col("s1.doc_id"))
        .join(
            sh.alias("s2"),
            (F.col("d2") == F.col("s2.doc_id"))
            & (F.col("s1.sh") == F.col("s2.sh")),
        )
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.alias("z1"), F.col("d1") == F.col("z1.doc_id"))
        .join(sizes.alias("z2"), F.col("d2") == F.col("z2.doc_id"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("z1.n_sh") + F.col("z2.n_sh") - F.col("n_inter")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= 0.6)
        .select("d1", "d2", "jaccard")
    )


SIMHASH_BITS = 60  # 15 hex chars of md5 → 60-bit portable token hash
SIMHASH_CHUNK = 15  # 4 chunks × 15 bits; hamming ≤ 3 ⇒ ≥1 chunk equal
_CHUNK_MASK = (1 << SIMHASH_CHUNK) - 1


def _simhash_oracle() -> str:
    bit_cols = ",\n         ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(SIMHASH_BITS)
    )
    fp_terms = "\n         + ".join(
        f"(CASE WHEN b{b} > 0 THEN CAST(1 AS BIGINT) << {b} ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, UNNEST(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS tok
  FROM documents
),
h AS (SELECT doc_id, {_md5_int_sql('tok', 15)} AS h FROM toks),
bs AS (
  SELECT doc_id,
         {bit_cols}
  FROM h GROUP BY doc_id
),
fp AS (
  SELECT doc_id,
         {fp_terms} AS simhash
  FROM bs
),
chunks AS (
  SELECT doc_id, simhash, c,
         (simhash >> ({SIMHASH_CHUNK} * c)) & {_CHUNK_MASK} AS v
  FROM fp CROSS JOIN (VALUES (0), (1), (2), (3)) t(c)
)
SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2,
       CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
FROM chunks x JOIN chunks y
  ON x.c = y.c AND x.v = y.v AND x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
"""


@register(
    "q_dedup_simhash",
    oracle=_simhash_oracle(),
    doc="SimHash near-dup: 60-bit sign fingerprint of md5-derived token "
        "hashes (portable → full DuckDB oracle); 15-bit-chunk bucketing "
        "(hamming ≤ 3 ⇒ some chunk equal) then bit_count(xor) verify.",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    ).withColumn("h", _md5_int(F.col("tok"), 15))

    bit_sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"b{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    sim = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        sim = sim.bitwiseOR(
            F.shiftleft((F.col(f"b{b}") > 0).cast("long"), b)
        )
    # Round 19 (guide §5, compute-once): the chunk self-join below
    # consumes fp on BOTH sides with no reusable exchange between them
    # (the build side is broadcast), so the expensive token-explode +
    # 60-column sign aggregate ran twice per execution. fp is one tiny
    # row per doc — checkpoint it so the fingerprint is built once.
    fp = bit_sums.select("doc_id", sim.alias("simhash")).localCheckpoint(
        eager=False
    )

    chunks = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        F.shiftright("simhash", SIMHASH_CHUNK * c)
                        .bitwiseAND(F.lit(_CHUNK_MASK))
                        .alias("v"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ch"),
    ).select("doc_id", "simhash", F.col("ch.c").alias("c"), F.col("ch.v").alias("v"))

    x, y = chunks.alias("x"), chunks.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.c") == F.col("y.c"))
            & (F.col("x.v") == F.col("y.v"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("d1"),
            F.col("y.doc_id").alias("d2"),
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            ).cast("long").alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= 3)


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (north-star dedup family, 5th strategy): treat
# cosine >= TAU_EMB between embedding vectors as "same content". Two forms:
# one-hop canonicalization (SQL-oracle-able) and full transitive clustering
# (iterative label propagation, hash-matched against a DuckDB recursive CTE).
# ---------------------------------------------------------------------------

TAU_EMB = 0.35  # pair threshold; the sf* fixtures have clusters above this

_EMB_NORM_SQL = (
    "SQRT(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * x)))"
)
_EMB_DOT_SQL = (
    "LIST_SUM(LIST_TRANSFORM(generate_series(1, LEN({a}.embedding)), "
    "i -> CAST({a}.embedding[i] AS DOUBLE) * CAST({b}.embedding[i] AS DOUBLE)))"
)
_EMB_PAIRS_CTE = f"""
v AS (SELECT vec_id, embedding, {_EMB_NORM_SQL} AS nrm FROM embeddings),
p AS (
  SELECT a.vec_id AS v1, b.vec_id AS v2
  FROM v a JOIN v b ON a.vec_id < b.vec_id
  WHERE {_EMB_DOT_SQL.format(a='a', b='b')} / (a.nrm * b.nrm) >= {TAU_EMB}
)"""


def _emb_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(v1, v2) with v1 < v2 and cosine >= TAU_EMB — shared edge set.

    Round 19 (guide §4.2): the quadratic theta-join + interpreted HOF
    dot per pair is now the vectorized ordered-fold mapInArrow kernel
    shared with q_sim_threshold_pairs — bit-identical pair set (see
    ``_exact_pairs_kernel``'s contract and its fixture test)."""
    from netcdf4_variable_streamer_spark.operators.similarity import (
        exact_threshold_pairs,
    )

    return exact_threshold_pairs(spark, sf_dir, TAU_EMB).select("v1", "v2")


@register(
    "q_dedup_embed_cosine",
    oracle=f"""
WITH {_EMB_PAIRS_CTE}
SELECT e.vec_id,
       COALESCE(MIN(p.v1), e.vec_id) AS canonical_id,
       CAST(CASE WHEN COUNT(p.v1) > 0 THEN 1 ELSE 0 END AS BIGINT) AS is_dup
FROM embeddings e LEFT JOIN p ON p.v2 = e.vec_id
GROUP BY e.vec_id
""",
    doc=f"Embedding-cosine near-dup, keep-lowest-id one-hop: each vector's "
        f"canonical is its smallest-id neighbor with cosine >= {TAU_EMB} "
        "(or itself). One aggregation over the pair set; full transitive "
        "closure is q_dedup_cc_clusters.",
)
def q_dedup_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select("vec_id")
    p = _emb_pairs(spark, sf_dir)
    return (
        e.join(p, e.vec_id == p.v2, "left")
        .groupBy("vec_id")
        .agg(
            F.coalesce(F.min("v1"), F.first("vec_id")).alias("canonical_id"),
            (F.count("v1") > 0).cast("long").alias("is_dup"),
        )
    )


@register(
    "q_dedup_cc_clusters",
    oracle=f"""
WITH RECURSIVE {_EMB_PAIRS_CTE},
e AS (SELECT v1 AS src, v2 AS dst FROM p
      UNION ALL SELECT v2, v1 FROM p),
reach(v, lab) AS (
  SELECT vec_id, vec_id FROM v
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN e ON e.src = r.v
)
SELECT v AS vec_id, MIN(lab) AS component_id FROM reach GROUP BY v
""",
    doc="Transitive near-dup clustering: connected components of the "
        "cosine>=TAU_EMB graph by iterative min-label propagation "
        "(converges in O(diameter) joins; lineage cut per iteration via "
        "localCheckpoint). Driver sees only one scalar per iteration "
        "(sum of labels — strictly decreasing, so equality = fixpoint). "
        "Oracle: DuckDB recursive CTE computing min reachable id.",
)
def q_dedup_cc_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cc_over_pairs(spark, sf_dir, _emb_pairs(spark, sf_dir))


def _cc_over_pairs(
    spark: SparkSession, sf_dir: str, p: DataFrame
) -> DataFrame:
    """Connected components over an undirected (v1, v2) pair set by
    iterative min-label propagation; O(diameter) rounds, lineage cut per
    round, only a strictly-decreasing label-sum scalar ever reaches the
    driver (equality = fixpoint)."""
    # Round 19 (guide §2.2): both edge directions come from ONE pass over
    # the pair set — explode of a 2-struct array — instead of a union of
    # two selects. The union form duplicated p's whole subtree (the pair
    # generator's exact-verify projection, or the quadratic theta-join
    # itself for cc_clusters) above any reusable exchange, so it executed
    # twice inside the one edge materialization; a localCheckpoint on p
    # fixed the duplication but its persist barrier measured net-negative
    # at sf0.01 (cc_clusters 4.9 -> 5.6 s). The explode needs no state.
    edges = (
        p.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("v1").alias("src"), F.col("v2").alias("dst")
                    ),
                    F.struct(
                        F.col("v2").alias("src"), F.col("v1").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .localCheckpoint()  # edge set reused every iteration
    )
    labels = (
        load_table(spark, sf_dir, "embeddings")
        .select(F.col("vec_id"), F.col("vec_id").alias("lab"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("lab")).first()[0]
    for _ in range(50):  # bound >> any realistic near-dup graph diameter
        prop = labels.join(edges, labels.vec_id == edges.src).select(
            F.col("dst").alias("vec_id"), F.col("lab")
        )
        labels = (
            labels.unionByName(prop)
            .groupBy("vec_id")
            .agg(F.min("lab").alias("lab"))
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("lab")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select("vec_id", F.col("lab").alias("component_id"))


def _cc_lsh_oracle() -> str:
    from netcdf4_variable_streamer_spark.operators.similarity import (
        PLSH_PAIRS_CTE,
    )

    return f"""
WITH RECURSIVE {PLSH_PAIRS_CTE},
e AS (SELECT v1 AS src, v2 AS dst FROM lsh_pairs
      UNION ALL SELECT v2, v1 FROM lsh_pairs),
reach(v, lab) AS (
  SELECT vec_id, vec_id FROM vv
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN e ON e.src = r.v
)
SELECT v AS vec_id, MIN(lab) AS component_id FROM reach GROUP BY v
"""


@register(
    "q_dedup_cc_lsh",
    oracle=_cc_lsh_oracle(),
    doc="PRODUCTION-shaped transitive near-dup clustering: the edge set "
        "comes from the LSH-bucketed pair generator (equi-join candidates "
        "+ exact cosine verify — q_sim_threshold_lsh's pipeline) instead "
        "of the quadratic all-pairs join, then the same min-label "
        "propagation as q_dedup_cc_clusters. Because the LCG hyperplanes "
        "are engine-portable, the DuckDB oracle reproduces the LSH edge "
        "set exactly and runs the recursive closure over it — the whole "
        "approximate pipeline is hash-checked end to end. This is the "
        "composition a 100 TB dedup actually runs: bucketed candidates → "
        "verify → cluster; no stage is quadratic.",
)
def q_dedup_cc_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from netcdf4_variable_streamer_spark.operators.similarity import (
        lsh_threshold_pairs,
    )

    pairs = lsh_threshold_pairs(spark, sf_dir).select("v1", "v2")
    return _cc_over_pairs(spark, sf_dir, pairs)


# ---------------------------------------------------------------------------
# SemDeDup-shaped semantic dedup: partition the embedding space into
# clusters FIRST, then near-dup only WITHIN each cluster. This is how
# production pipelines (SemDeDup, Abbas et al. 2023) bound the quadratic
# pair stage: the all-pairs cost drops from |corpus|² to Σ|cluster|², and
# each cluster's pair join is an equi-join on cluster_id — embarrassingly
# shuffle-parallel. Centroids here are the 16 lowest-id vectors (fully
# deterministic, so the WHOLE pipeline — assignment included — is
# reproducible in the DuckDB oracle; production swaps in k-means
# centroids, same plan shape).
# ---------------------------------------------------------------------------

_SEM_NLIST = 16


@register(
    "q_dedup_semantic",
    oracle=f"""
WITH v AS (SELECT vec_id, embedding, {_EMB_NORM_SQL} AS nrm
           FROM embeddings),
c AS (SELECT vec_id AS c_id, embedding, nrm FROM v
      WHERE vec_id < {_SEM_NLIST}),
sc AS (
  SELECT v.vec_id, c.c_id,
         ROUND({_EMB_DOT_SQL.format(a='v', b='c')} / (v.nrm * c.nrm), 4)
           AS cs
  FROM v CROSS JOIN c
),
assign AS (
  SELECT vec_id, c_id AS cluster_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY cs DESC, c_id) AS rn
    FROM sc) t
  WHERE rn = 1
),
va AS (SELECT v.vec_id, v.embedding, v.nrm, a.cluster_id
       FROM v JOIN assign a USING (vec_id)),
p AS (
  SELECT a.vec_id AS v1, b.vec_id AS v2
  FROM va a JOIN va b
    ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
  WHERE {_EMB_DOT_SQL.format(a='a', b='b')} / (a.nrm * b.nrm)
        >= {TAU_EMB}
)
SELECT e.vec_id, e.cluster_id,
       COALESCE(MIN(p.v1), e.vec_id) AS canonical_id,
       CAST(CASE WHEN COUNT(p.v1) > 0 THEN 1 ELSE 0 END AS BIGINT)
         AS is_dup
FROM va e LEFT JOIN p ON p.v2 = e.vec_id
GROUP BY e.vec_id, e.cluster_id
""",
    doc="SemDeDup-shaped semantic dedup: assign every vector to its "
        "nearest of 16 deterministic centroids (broadcast join — the "
        "centroid table is tiny), then near-dup detection runs only "
        "WITHIN clusters via an equi-join on cluster_id, keep-lowest-id "
        "canonicalization. The cluster stage bounds the quadratic pair "
        "cost at Σ|cluster|² and removes any global cartesian; at 100 TB "
        "cluster sizes are capped by recursive sub-clustering, same plan "
        "shape.",
)
def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from netcdf4_variable_streamer_spark.operators.similarity import (
        _dot,
        _with_norm,
    )

    v = _with_norm(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    seeds = v.filter(F.col("vec_id") < _SEM_NLIST).select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    cs = F.round(
        _dot("embedding", "c_emb")
        / (F.col("nrm") * F.col("c_nrm")),
        4,
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("c_id"))
    assign = (
        v.crossJoin(F.broadcast(seeds))
        .select("vec_id", "c_id", cs.alias("cs"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("c_id").alias("cluster_id"))
    )
    va = v.join(assign, "vec_id")
    a = va.select(
        F.col("vec_id").alias("v1"),
        F.col("embedding").alias("emb1"),
        F.col("nrm").alias("n1"),
        "cluster_id",
    )
    b = va.select(
        F.col("vec_id").alias("v2"),
        F.col("embedding").alias("emb2"),
        F.col("nrm").alias("n2"),
        "cluster_id",
    )
    cos = _dot("emb1", "emb2") / (F.col("n1") * F.col("n2"))
    p = (
        a.join(b, "cluster_id")
        .filter(F.col("v1") < F.col("v2"))
        .filter(cos >= TAU_EMB)
        .select("v1", "v2")
    )
    return (
        va.select("vec_id", "cluster_id")
        .join(p, va.vec_id == p.v2, "left")
        .groupBy("vec_id", "cluster_id")
        .agg(
            F.coalesce(F.min("v1"), F.first("vec_id")).alias("canonical_id"),
            (F.count("v1") > 0).cast("long").alias("is_dup"),
        )
    )


def _sem_trained_oracle() -> str:
    from netcdf4_variable_streamer_spark.operators.similarity import (
        _coarse_sql_ctes,
    )

    parts, _ = _coarse_sql_ctes(_SEM_NLIST)
    ctes = ",\n".join(parts)
    return f"""
WITH {ctes},
v AS (SELECT vec_id, embedding, {_EMB_NORM_SQL} AS nrm
      FROM embeddings),
va AS (SELECT v.vec_id, v.embedding, v.nrm, a.cl AS cluster_id
       FROM v JOIN ca a USING (vec_id)),
p AS (
  SELECT a.vec_id AS v1, b.vec_id AS v2
  FROM va a JOIN va b
    ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
  WHERE {_EMB_DOT_SQL.format(a='a', b='b')} / (a.nrm * b.nrm)
        >= {TAU_EMB}
)
SELECT e.vec_id, CAST(e.cluster_id AS BIGINT) AS cluster_id,
       COALESCE(MIN(p.v1), e.vec_id) AS canonical_id,
       CAST(CASE WHEN COUNT(p.v1) > 0 THEN 1 ELSE 0 END AS BIGINT)
         AS is_dup
FROM va e LEFT JOIN p ON p.v2 = e.vec_id
GROUP BY e.vec_id, e.cluster_id
"""


@register(
    "q_dedup_semantic_trained",
    oracle=_sem_trained_oracle(),
    doc="TRAINED SemDeDup (round 17, VERDICT r16 #5) — the actual "
        "SemDeDup recipe (Abbas et al. 2023): q_dedup_semantic's "
        "pipeline with the 16 md5-deterministic centroid stand-ins "
        "replaced by k-means centroids trained with the round-17 "
        "coarse-Lloyd machinery (2 deterministic rounds, full-vector "
        "fixed-point arithmetic, packed-MIN assignment, FLOOR-mean "
        "updates — the q_sim_ivf_train_coarse chain at nlist=16), so "
        "the cluster-bounded near-dup stage runs on REAL embedding "
        "structure instead of arbitrary seed vectors. Assignment is "
        "exact-integer L2 argmin; the within-cluster pair stage is "
        "unchanged (exact cosine >= tau, keep-lowest-id canonical). "
        "Measured on the fixture (exact all-pairs ground truth = 201 "
        "dup vectors): training lifts dup recall 61 → 68 recovered "
        "vectors (+11%) at marginally LOWER within-cluster pair "
        "volume (Σ|cluster|² 16,062 → 15,976) — better-structured "
        "clusters put near-neighbors together instead of splitting "
        "them across arbitrary seed boundaries (pinned in pytest, "
        "recorded in SCALE.md). 100 TB: training is O(iters) "
        "corpus-linear passes with a KB-scale model, run ONCE — the "
        "trained (vec_id, cluster) assignment is localCheckpoint'd "
        "before the self-join so the Lloyd subtree never re-derives "
        "per plan branch (round-18 fix; production persists the "
        "assignment table the same way); the pair stage stays an "
        "equi-join on cluster_id bounded by Σ|cluster|², with "
        "recursive sub-clustering the documented cap for oversized "
        "clusters.",
)
def q_dedup_semantic_trained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from netcdf4_variable_streamer_spark.operators.similarity import (
        _civf_chain,
        _dot,
        _with_norm,
    )

    # this key re-checkpoints the cast assignment itself below (the
    # r18 train-once contract), and consumes nothing else from the
    # chain — chain-internal checkpoints would only add eager
    # plannings (round 19, see _pqt_chain)
    _, _, assign, _ = _civf_chain(
        spark, sf_dir, nlist=_SEM_NLIST, ckpt=frozenset()
    )
    # Train ONCE: the (vec_id, cluster) assignment feeds both branches
    # of the within-cluster self-join. localCheckpoint (lazy) cuts the
    # lineage so the Lloyd subtree materializes exactly once by
    # CONTRACT — before round 18 that dedup was only ReusedExchange
    # luck, which AQE re-planning can and does break. Round-18
    # re-measurement (count(), best-of-3, 500 → 5000 vectors): the 10×
    # premium over the untrained twin is NOT double derivation — a
    # single training chain alone scales 1.48 → 3.59 s while the whole
    # untrained key runs 0.90 → 1.19 s — it is the O(N·nlist·dim)
    # training pass itself, corpus-linear by construction. Eager
    # checkpointing was measured SLOWER (extra blocking materialization
    # per build: 2.35/7.24 s vs lazy 1.86/5.24 s), so lazy it is.
    asg = assign.select(
        "vec_id", F.col("cl").cast("long").alias("cluster_id")
    ).localCheckpoint(eager=False)
    v = _with_norm(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
    )
    va = v.join(asg, "vec_id")
    a = va.select(
        F.col("vec_id").alias("v1"),
        F.col("embedding").alias("emb1"),
        F.col("nrm").alias("n1"),
        "cluster_id",
    )
    b = va.select(
        F.col("vec_id").alias("v2"),
        F.col("embedding").alias("emb2"),
        F.col("nrm").alias("n2"),
        "cluster_id",
    )
    cos = _dot("emb1", "emb2") / (
        F.col("n1") * F.col("n2")
    )
    p = (
        a.join(b, "cluster_id")
        .filter(F.col("v1") < F.col("v2"))
        .filter(cos >= TAU_EMB)
        .select("v1", "v2")
    )
    return (
        va.select("vec_id", "cluster_id")
        .join(p, va.vec_id == p.v2, "left")
        .groupBy("vec_id", "cluster_id")
        .agg(
            F.coalesce(F.min("v1"), F.first("vec_id")).alias(
                "canonical_id"
            ),
            (F.count("v1") > 0).cast("long").alias("is_dup"),
        )
    )


@register(
    "q_dedup_containment",
    oracle="""
WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ts FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g
  FROM d, UNNEST(generate_series(1, GREATEST(LEN(ts) - 2, 0))) AS u(i)
),
dfg AS (SELECT g, COUNT(*) AS df FROM sh GROUP BY g),
rare AS (
  SELECT sh.doc_id, sh.g FROM sh JOIN dfg USING (g) WHERE dfg.df <= 20
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
cand AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2,
         CAST(COUNT(*) AS BIGINT) AS shared
  FROM rare a JOIN rare b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id HAVING COUNT(*) >= 3
)
SELECT c.d1, c.d2, c.shared,
       CAST(s1.n AS BIGINT) AS n1, CAST(s2.n AS BIGINT) AS n2,
       FLOOR(CAST(c.shared AS DOUBLE) / LEAST(s1.n, s2.n) * 10000)
         / 10000 AS containment
FROM cand c
JOIN sizes s1 ON c.d1 = s1.doc_id
JOIN sizes s2 ON c.d2 = s2.doc_id
WHERE CAST(c.shared AS DOUBLE) / LEAST(s1.n, s2.n) >= 0.2
""",
    doc="Containment near-dup detection — the ASYMMETRIC measure "
        "C(A,B) = |A∩B| / min(|A|,|B|) that catches sub-document "
        "duplication (a quoted article, a page embedded in a larger "
        "one) which symmetric Jaccard dilutes toward 0 as the superset "
        "grows (the RefinedWeb/FineWeb rationale for containment "
        "passes alongside MinHash): distinct word-3-gram sets, "
        "posting-list candidate generation (pairs sharing >= 3 "
        "shingles, formed by a shingle-keyed self-join with a "
        "document-frequency cap df <= 20 so stopword-like shingles "
        "never explode the join — the prefix-filtering family's "
        "scale-bounding knob; at web scale the cap tightens and the "
        "candidate volume is sum over shingles of df^2, bounded by "
        "cap x corpus shingle count), then exact containment verify "
        ">= 0.2. No MinHash approximation anywhere: candidates are "
        "supported pairs only, so the result is exact over a bounded "
        "join. All stages gram- or pair-keyed; no window sorts.",
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("ts")
    )
    ts = F.col("ts")
    grams = F.when(
        F.size(ts) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(ts) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(ts, i),
                F.element_at(ts, i + 1),
                F.element_at(ts, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = (
        d.select("doc_id", F.explode(grams).alias("g"))
        .distinct()
    )
    dfg = sh.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    rare = sh.join(dfg, "g").filter(F.col("df") <= 20).select("doc_id", "g")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = rare.select(F.col("doc_id").alias("d1"), "g")
    b = rare.select(F.col("doc_id").alias("d2"), "g")
    cand = (
        a.join(b, "g")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .filter(F.col("shared") >= 3)
    )
    s1 = sizes.select(
        F.col("doc_id").alias("d1"), F.col("n").cast("long").alias("n1")
    )
    s2 = sizes.select(
        F.col("doc_id").alias("d2"), F.col("n").cast("long").alias("n2")
    )
    cont = F.col("shared").cast("double") / F.least("n1", "n2")
    return (
        cand.join(s1, "d1")
        .join(s2, "d2")
        .filter(cont >= 0.2)
        .select(
            "d1",
            "d2",
            "shared",
            "n1",
            "n2",
            (F.floor(cont * 10000) / 10000).alias("containment"),
        )
    )


_INC_SPLIT = 400  # doc_id < split = the standing index; >= split = new crawl


def _shingled(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, distinct word-3-gram shingle array) for docs with >= 1 shingle."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.split(F.col(text_col), " ").alias("toks"),
        )
        .select("doc_id", _shingles(F.col("toks")).alias("ss"))
        .filter(F.size("ss") > 0)
    )


def _minhash_band_table(shingled: DataFrame) -> DataFrame:
    """(doc_id, band, sig) LSH band table from a ``_shingled`` frame:
    md5-int shingle hashes -> 32-perm universal-hash MinHash -> 8x4
    banding, one md5 signature per band."""
    ex = shingled.select("doc_id", F.explode("ss").alias("sh")).withColumn(
        "h", _md5_int(F.col("sh"), 7)
    )
    mh = ex.groupBy("doc_id").agg(
        *[
            F.min(
                (F.lit(MH_A[p]) * F.col("h") + F.lit(MH_B[p])) % MINHASH_P
            ).alias(f"mh{p}")
            for p in range(NUM_PERM)
        ]
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"mh{b * ROWS_PER_BAND + r}")
                            for r in range(ROWS_PER_BAND)
                        ],
                    )
                ).alias("sig"),
            )
            for b in range(BANDS)
        ]
    )
    return mh.select("doc_id", F.explode(band_structs).alias("bs")).select(
        "doc_id",
        F.col("bs.band").alias("band"),
        F.col("bs.sig").alias("sig"),
    )


def incremental_near_dedup(
    index_df: DataFrame,
    batch_df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Near-dedup a new crawl ``batch_df`` against a standing ``index_df``.

    The production two-table API behind ``q_dedup_minhash_incremental``
    (VERDICT r10 next #3): the index corpus's LSH band buckets
    (bucket-capped at ``max_bucket`` against boilerplate signatures) are
    PROBED by the batch's bands with a plain equi-join, so new-vs-new and
    index-vs-index pairs are never generated and each crawl costs
    proportionally to the BATCH, not the corpus. Candidates verify by
    exact shingle Jaccard >= ``threshold``.

    Inputs need ``id_col`` (integral, unique within each table) and
    ``text_col`` (whitespace-tokenizable string); ids may be arbitrary
    64-bit values — the best-match tie-break is a window row_number, not
    an id-packed integer. Returns one decision row per batch doc (docs
    too short to shingle are trivially not duplicates):
    ``(id_col, is_dup, best_match, best_jaccard)`` with ``best_match``
    the index id of the highest-Jaccard verified match (lowest id on
    ties) and ``best_jaccard`` quantized to 4 decimals via half-up
    integer rounding — bit-identical cross-engine by construction.

    100 TB posture: compute the index band table ONCE, persist it, and
    pass the same ``index_df`` every crawl; per-batch cost is then the
    batch's own shingling plus a broadcast-or-shuffle equi-join whose
    output cardinality is proportional to true near-duplicates.
    """
    qthr = int(round(threshold * 10000))
    # Round 19 (guide §5, train-once): each shingled frame feeds three
    # branches of _incremental_decisions (band table, explode-verify,
    # sizes) — checkpoint so the shingle pass runs once per side.
    idx_sh = _shingled(index_df, id_col, text_col).localCheckpoint(
        eager=False
    )
    new_sh = _shingled(batch_df, id_col, text_col).localCheckpoint(
        eager=False
    )
    return _incremental_decisions(
        _minhash_band_table(idx_sh),
        idx_sh,
        new_sh,
        batch_df.select(F.col(id_col).alias("doc_id")),
        qthr,
        max_bucket,
    ).withColumnRenamed("doc_id", id_col)


def _incremental_decisions(
    idx_bands: DataFrame,
    idx_sh: DataFrame,
    new_sh: DataFrame,
    batch_ids: DataFrame,
    qthr: int,
    max_bucket: int,
) -> DataFrame:
    """Probe core shared by the batch API and the foreachBatch crawl
    loop: takes PREPARED index state — ``idx_bands`` (doc_id, band, sig)
    and ``idx_sh`` (doc_id, ss) — so a standing index persisted across
    micro-batches is never recomputed from text. Returns one decision
    row per ``batch_ids`` row (columns doc_id, is_dup, best_match,
    best_jaccard). The bucket cap applies to the standing index's band
    table at probe time, so boilerplate signatures accumulated across
    crawls stay capped."""
    wb = Window.partitionBy("band", "sig")
    idx = (
        idx_bands
        .withColumn("w", F.count(F.lit(1)).over(wb))
        .filter(F.col("w") <= max_bucket)
        .select(F.col("doc_id").alias("d_idx"), "band", "sig")
    )
    probe = _minhash_band_table(new_sh).select(
        F.col("doc_id").alias("d_new"), "band", "sig"
    )
    cands = (
        probe.join(idx, ["band", "sig"]).select("d_new", "d_idx").distinct()
    )
    sh_new = new_sh.select("doc_id", F.explode("ss").alias("sh"))
    sh_idx = idx_sh.select("doc_id", F.explode("ss").alias("sh"))
    inter = (
        cands.join(sh_new.alias("s1"), F.col("d_new") == F.col("s1.doc_id"))
        .join(
            sh_idx.alias("s2"),
            (F.col("d_idx") == F.col("s2.doc_id"))
            & (F.col("s1.sh") == F.col("s2.sh")),
        )
        .groupBy("d_new", "d_idx")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes_new = new_sh.select("doc_id", F.size("ss").alias("n_sh"))
    sizes_idx = idx_sh.select("doc_id", F.size("ss").alias("n_sh"))
    # Quantize to 1e-4 with half-up rounding on a double built from the
    # same IEEE ops in both engines (CAST(n AS DOUBLE)*10000 / union) —
    # the emitted double is then qint/10000 on both sides, bit-identical.
    verified = (
        inter.join(
            sizes_new.alias("z1"), F.col("d_new") == F.col("z1.doc_id")
        )
        .join(sizes_idx.alias("z2"), F.col("d_idx") == F.col("z2.doc_id"))
        .withColumn(
            "q",
            F.round(
                F.col("n_inter").cast("double")
                * 10000
                / (
                    F.col("z1.n_sh")
                    + F.col("z2.n_sh")
                    - F.col("n_inter")
                )
            ).cast("long"),
        )
        .filter(F.col("q") >= qthr)
        .select("d_new", "d_idx", "q")
    )
    wbest = Window.partitionBy("d_new").orderBy(
        F.desc("q"), F.asc("d_idx")
    )
    best = (
        verified.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return (
        batch_ids
        .join(best, F.col("doc_id") == F.col("d_new"), "left")
        .select(
            "doc_id",
            F.col("d_new").isNotNull().alias("is_dup"),
            F.col("d_idx").alias("best_match"),
            (F.col("q").cast("double") / 10000).alias("best_jaccard"),
        )
    )


def _inc_minhash_oracle() -> str:
    mh_cols = ",\n         ".join(
        f"MIN(({MH_A[p]} * h + {MH_B[p]}) % {MINHASH_P}) AS mh{p}"
        for p in range(NUM_PERM)
    )
    band_selects = "\n  UNION ALL ".join(
        "SELECT doc_id, {b} AS band, MD5(CONCAT_WS(',', {cols})) AS sig FROM mh".format(
            b=b,
            cols=", ".join(
                f"mh{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)
            ),
        )
        for b in range(BANDS)
    )
    return f"""
WITH sh AS ({_SHINGLES_SQL}),
h AS (SELECT doc_id, {_md5_int_sql('s', 7)} AS h FROM sh),
mh AS (
  SELECT doc_id,
         {mh_cols}
  FROM h GROUP BY doc_id
),
bands AS (
  {band_selects}
),
idx AS (
  SELECT doc_id, band, sig FROM (
    SELECT doc_id, band, sig,
           COUNT(*) OVER (PARTITION BY band, sig) AS w
    FROM bands WHERE doc_id < {_INC_SPLIT}) WHERE w <= {MAX_BUCKET}
),
probe AS (
  SELECT doc_id, band, sig FROM bands WHERE doc_id >= {_INC_SPLIT}
),
cands AS (
  SELECT DISTINCT p.doc_id AS d_new, i.doc_id AS d_idx
  FROM probe p JOIN idx i ON i.band = p.band AND i.sig = p.sig
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.d_new, c.d_idx, COUNT(*) AS n_inter
  FROM cands c
  JOIN sh s1 ON s1.doc_id = c.d_new
  JOIN sh s2 ON s2.doc_id = c.d_idx AND s2.s = s1.s
  GROUP BY c.d_new, c.d_idx
),
verified AS (
  SELECT i.d_new, i.d_idx,
         CAST(ROUND(CAST(i.n_inter AS DOUBLE) * 10000
                    / (z1.n_sh + z2.n_sh - i.n_inter)) AS BIGINT) AS q
  FROM inter i
  JOIN sizes z1 ON z1.doc_id = i.d_new
  JOIN sizes z2 ON z2.doc_id = i.d_idx
),
best AS (
  SELECT d_new, d_idx, q FROM (
    SELECT d_new, d_idx, q,
           ROW_NUMBER() OVER (PARTITION BY d_new
                              ORDER BY q DESC, d_idx ASC) AS rn
    FROM verified WHERE q >= 6000) t
  WHERE rn = 1
)
SELECT n.doc_id,
       (b.d_new IS NOT NULL) AS is_dup,
       b.d_idx AS best_match,
       CAST(b.q AS DOUBLE) / 10000 AS best_jaccard
FROM (SELECT doc_id FROM documents WHERE doc_id >= {_INC_SPLIT}) n
LEFT JOIN best b ON b.d_new = n.doc_id
ORDER BY n.doc_id
"""


@register(
    "q_dedup_minhash_incremental",
    oracle=_inc_minhash_oracle(),
    doc="INCREMENTAL near-dedup (round 10) — the production 'dedupe "
        "the new crawl against the standing index' shape: the index "
        "corpus's LSH band buckets (doc_id < 400, bucket-capped "
        "against boilerplate signatures) are PROBED by the new "
        "batch's bands with a plain equi-join — new-vs-new and "
        "index-vs-index pairs are never generated, so each crawl's "
        "cost is proportional to the BATCH, not the corpus. "
        "Candidates verify by exact Jaccard >= 0.6; every new doc "
        "gets a decision row (is_dup, best matching index doc by "
        "packed-MAX jaccard with lowest-id tie-break). At 100 TB the "
        "index bucket table is computed once and amortized across "
        "crawls — the incremental twin of q_dedup_near_minhash.",
)
def q_dedup_minhash_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return incremental_near_dedup(
        index_df=docs.filter(F.col("doc_id") < _INC_SPLIT),
        batch_df=docs.filter(F.col("doc_id") >= _INC_SPLIT),
    ).orderBy("doc_id")


# Truncation-duplicate detection (round 11): crawls routinely carry the
# same page at several truncation lengths (feed snippets, AMP variants,
# re-crawls with different byte budgets). Near-dup shingling often
# misses extreme truncations (Jaccard of a 10%-prefix vs the full doc
# is ~0.1), so the dedicated detector buckets on the md5 of a fixed
# PREFIX WINDOW and verifies true prefix containment.
_PFX_K = 64          # prefix-window chars: bucket key = md5(first 64)
_PFX_MAX_BUCKET = 64  # boilerplate cap, same rationale as LSH buckets


_PFX_ORACLE = f"""
WITH d AS (
  SELECT doc_id, text, n_chars,
         MD5(SUBSTR(text, 1, {_PFX_K})) AS pfx
  FROM documents WHERE n_chars >= {_PFX_K}
),
capped AS (
  SELECT * FROM (
    SELECT doc_id, text, n_chars, pfx,
           COUNT(*) OVER (PARTITION BY pfx) AS w
    FROM d) t WHERE w <= {_PFX_MAX_BUCKET}
),
pairs AS (
  SELECT a.doc_id AS d_short, b.doc_id AS d_long,
         a.n_chars AS n_short, b.n_chars AS n_long
  FROM capped a JOIN capped b ON a.pfx = b.pfx
  WHERE (a.n_chars < b.n_chars
         OR (a.n_chars = b.n_chars AND a.doc_id < b.doc_id))
    AND SUBSTR(b.text, 1, a.n_chars) = a.text
)
SELECT d_short, d_long, n_short, n_long,
       (n_short = n_long) AS exact_dup
FROM pairs
ORDER BY d_short, d_long
"""


@register(
    "q_dedup_prefix_truncation",
    oracle=_PFX_ORACLE,
    doc="TRUNCATION-duplicate detection (round 11): the crawl-dedup "
        "case shingled near-dedup misses by construction — the same "
        "page stored at different truncation lengths has tiny Jaccard "
        "when the cut is deep. Candidates bucket on md5 of the first "
        "64 chars (a 16-byte shuffle key, bucket-capped against "
        "boilerplate openings), then verify TRUE prefix containment: "
        "the shorter text must equal the longer one's prefix exactly "
        "(equal lengths degrade to exact duplicates, flagged). At "
        "100 TB the verify compares only within capped buckets — "
        "candidate cardinality is bounded by bucket caps, never "
        "corpus² — and production would replace the full-text equality "
        "with chained per-segment hashes to keep the shuffle payload "
        "at 16 bytes per segment; the fixture-scale key carries the "
        "text to keep the oracle exact.",
)
def q_dedup_prefix_truncation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("n_chars") >= _PFX_K)
        .select(
            "doc_id",
            "text",
            "n_chars",
            F.md5(F.substring("text", 1, _PFX_K)).alias("pfx"),
        )
    )
    wb = Window.partitionBy("pfx")
    capped = (
        d.withColumn("w", F.count(F.lit(1)).over(wb))
        .filter(F.col("w") <= _PFX_MAX_BUCKET)
        .drop("w")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    pairs = (
        a.join(b, F.col("a.pfx") == F.col("b.pfx"))
        .filter(
            (F.col("a.n_chars") < F.col("b.n_chars"))
            | (
                (F.col("a.n_chars") == F.col("b.n_chars"))
                & (F.col("a.doc_id") < F.col("b.doc_id"))
            )
        )
        .filter(
            F.col("b.text").substr(F.lit(1), F.col("a.n_chars"))
            == F.col("a.text")
        )
    )
    return pairs.select(
        F.col("a.doc_id").alias("d_short"),
        F.col("b.doc_id").alias("d_long"),
        F.col("a.n_chars").alias("n_short"),
        F.col("b.n_chars").alias("n_long"),
        (F.col("a.n_chars") == F.col("b.n_chars")).alias("exact_dup"),
    ).orderBy("d_short", "d_long")


@register(
    "q_dedup_prefix_segmented",
    oracle=_PFX_ORACLE,
    doc="SEGMENT-HASH truncation dedup (round 12, VERDICT r11 #8 — "
        "the production variant q_dedup_prefix_truncation's docstring "
        "promised): the verify join carries NO text. Each doc ships "
        "(pfx, n_chars, ch, tail) where ch[k] = the BINARY 16-byte "
        "md5 of the first k*64 chars (exactly 16 B/segment in the "
        "shuffle — "
        "computed here as direct prefix hashes; at 100 TB a rolling "
        "chained hash gives the same equality semantics in one pass) "
        "and tail is the <64-char residual. A shorter doc is a prefix "
        "of a longer one iff their hashes agree at the shorter's last "
        "full segment AND the shorter's tail equals the longer's "
        "bytes at that offset. The bucket join (md5-prefix buckets, "
        "bucket-capped) decides the full-segment part hash-to-hash; "
        "only pairs with a non-empty residual touch text again — via "
        "a BROADCAST of the surviving candidate ids against the "
        "documents scan, so full text never enters a shuffle. Output "
        "is identical to q_dedup_prefix_truncation (same oracle); "
        "only the plan differs: shuffle payload is 16 B/segment + "
        "<=63 chars, never the document.",
)
def q_dedup_prefix_segmented(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    S = _PFX_K
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("n_chars") >= S)
        .select(
            "doc_id",
            "n_chars",
            F.md5(F.substring("text", 1, S)).alias("pfx"),
            F.expr(
                f"transform(sequence(1, int(n_chars div {S})), "
                f"k -> md5(substr(text, 1, k * {S})))"
            ).alias("ch"),
            F.expr(
                f"substr(text, int(n_chars div {S}) * {S} + 1, "
                f"int(n_chars % {S}))"
            ).alias("tail"),
            F.expr(f"int(n_chars div {S})").alias("fa"),
            F.expr(f"int(n_chars % {S})").alias("ra"),
        )
    )
    wb = Window.partitionBy("pfx")
    capped = (
        d.withColumn("w", F.count(F.lit(1)).over(wb))
        .filter(F.col("w") <= _PFX_MAX_BUCKET)
        .drop("w")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    cand = (
        a.join(b, F.col("a.pfx") == F.col("b.pfx"))
        .filter(
            (F.col("a.n_chars") < F.col("b.n_chars"))
            | (
                (F.col("a.n_chars") == F.col("b.n_chars"))
                & (F.col("a.doc_id") < F.col("b.doc_id"))
            )
        )
        # full-segment part: hashes agree at a's last full segment
        # (n_chars >= 64 so fa >= 1; try_element_at because Catalyst
        # may evaluate this conjunct BEFORE the n_chars ordering
        # filter — an OOB index then means a is longer, i.e. no pair)
        .filter(
            F.try_element_at(F.col("a.ch"), F.col("a.fa"))
            == F.try_element_at(F.col("b.ch"), F.col("a.fa"))
        )
        .select(
            F.col("a.doc_id").alias("d_short"),
            F.col("b.doc_id").alias("d_long"),
            F.col("a.n_chars").alias("n_short"),
            F.col("b.n_chars").alias("n_long"),
            F.col("a.fa").alias("fa"),
            F.col("a.ra").alias("ra"),
            F.col("a.tail").alias("tail"),
        )
    )
    whole = cand.filter(F.col("ra") == 0).select(
        "d_short", "d_long", "n_short", "n_long"
    )
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("d_long"), "text"
    )
    # residual check: broadcast the surviving candidates against the
    # documents scan — text stays map-side, never shuffled
    tails = (
        docs.join(
            F.broadcast(cand.filter(F.col("ra") > 0)), "d_long"
        )
        .filter(
            F.expr(f"substr(text, fa * {S} + 1, ra)")
            == F.col("tail")
        )
        .select("d_short", "d_long", "n_short", "n_long")
    )
    return (
        whole.unionByName(tails)
        .select(
            "d_short",
            "d_long",
            "n_short",
            "n_long",
            (F.col("n_short") == F.col("n_long")).alias("exact_dup"),
        )
        .orderBy("d_short", "d_long")
    )


_XC_SPLIT = 500  # doc_id < split = reference corpus; >= split = new batch


@register(
    "q_dedup_cross_corpus",
    oracle=f"""
WITH ref AS (
  SELECT DISTINCT MD5(text) AS h FROM documents
  WHERE doc_id < {_XC_SPLIT}
),
new_docs AS (
  SELECT doc_id, lang, MD5(text) AS h FROM documents
  WHERE doc_id >= {_XC_SPLIT}
),
dec AS (
  SELECT n.doc_id, n.lang,
         (r.h IS NOT NULL) AS in_reference
  FROM new_docs n LEFT JOIN ref r ON n.h = r.h
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_new,
       CAST(SUM(CASE WHEN in_reference THEN 1 ELSE 0 END) AS BIGINT)
         AS n_collisions,
       CAST(SUM(CASE WHEN NOT in_reference THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       MIN(CASE WHEN in_reference THEN doc_id END) AS first_collision
FROM dec GROUP BY lang ORDER BY lang
""",
    doc="CROSS-CORPUS exact dedup (round 12) — the asymmetric "
        "dedup-against-reference posture: drop NEW documents whose "
        "exact text already exists in the STANDING corpus, without "
        "deduplicating within either side (train-vs-train stays "
        "untouched; the cross direction is what prevents re-crawled "
        "pages re-entering an already-curated corpus, and it is the "
        "document-level sibling of n-gram eval decontamination "
        "q_text_contamination). Both sides shuffle ONLY 16-byte "
        "md5 keys (never text) into one hash anti/left join; the "
        "reference side is DISTINCT hashes — at 100 TB persist that "
        "hash set once and every crawl joins against it at "
        "batch-proportional cost, the exact-dedup twin of "
        "incremental_near_dedup's posture.",
)
def q_dedup_cross_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.md5("text").alias("h")
    )
    ref = (
        d.filter(F.col("doc_id") < _XC_SPLIT)
        .select("h")
        .distinct()
        .withColumn("in_ref", F.lit(1))
    )
    new_docs = d.filter(F.col("doc_id") >= _XC_SPLIT)
    dec = new_docs.join(ref, "h", "left").select(
        "doc_id",
        "lang",
        F.col("in_ref").isNotNull().alias("in_reference"),
    )
    return (
        dec.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_new"),
            F.sum(F.col("in_reference").cast("long")).alias(
                "n_collisions"
            ),
            F.sum((~F.col("in_reference")).cast("long")).alias(
                "n_kept"
            ),
            F.min(
                F.when(F.col("in_reference"), F.col("doc_id"))
            ).alias("first_collision"),
        )
        .orderBy("lang")
    )


def _minhash_calibration_oracle() -> str:
    mh_cols = ",\n         ".join(
        f"MIN(({MH_A[p]} * h + {MH_B[p]}) % {MINHASH_P}) AS mh{p}"
        for p in range(NUM_PERM)
    )
    band_selects = "\n  UNION ALL ".join(
        "SELECT doc_id, {b} AS band, MD5(CONCAT_WS(',', {cols})) AS sig"
        " FROM mh".format(
            b=b,
            cols=", ".join(
                f"mh{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)
            ),
        )
        for b in range(BANDS)
    )
    est_terms = " + ".join(
        f"CASE WHEN a.mh{p} = b.mh{p} THEN 1 ELSE 0 END"
        for p in range(NUM_PERM)
    )
    return f"""
WITH sh AS ({_SHINGLES_SQL}),
h AS (SELECT doc_id, {_md5_int_sql('s', 7)} AS h FROM sh),
mh AS (
  SELECT doc_id,
         {mh_cols}
  FROM h GROUP BY doc_id
),
bands AS (
  {band_selects}
),
capped AS (
  SELECT doc_id, band, sig FROM (
    SELECT doc_id, band, sig,
           COUNT(*) OVER (PARTITION BY band, sig) AS w
    FROM bands) WHERE w <= {MAX_BUCKET}
),
cands AS (
  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
  FROM capped x JOIN capped y
    ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
),
est AS (
  SELECT c.d1, c.d2, ({est_terms}) AS est32
  FROM cands c
  JOIN mh a ON a.doc_id = c.d1
  JOIN mh b ON b.doc_id = c.d2
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.d1, c.d2, COUNT(*) AS n_inter
  FROM cands c
  JOIN sh s1 ON s1.doc_id = c.d1
  JOIN sh s2 ON s2.doc_id = c.d2 AND s2.s = s1.s
  GROUP BY c.d1, c.d2
),
j AS (
  SELECT e.est32,
         CAST((COALESCE(i.n_inter, 0) * 1000000)
              // (z1.n_sh + z2.n_sh - COALESCE(i.n_inter, 0))
              AS BIGINT) AS jac_ppm
  FROM est e
  LEFT JOIN inter i ON i.d1 = e.d1 AND i.d2 = e.d2
  JOIN sizes z1 ON z1.doc_id = e.d1
  JOIN sizes z2 ON z2.doc_id = e.d2
)
SELECT CAST(est32 AS BIGINT) AS est32,
       COUNT(*) AS n_pairs,
       CAST(SUM(jac_ppm) // COUNT(*) AS BIGINT) AS mean_jac_ppm,
       MIN(jac_ppm) AS min_jac_ppm,
       MAX(jac_ppm) AS max_jac_ppm
FROM j GROUP BY est32 ORDER BY est32
"""


@register(
    "q_dedup_minhash_calibration",
    oracle=_minhash_calibration_oracle(),
    doc="MinHash ESTIMATOR CALIBRATION (round 12 — how the dedup "
        "threshold is actually chosen at 100 TB: measure the "
        "estimator against ground truth on the candidate set, then "
        "pick the signature cutoff with the desired precision): for "
        "every LSH candidate pair, the matching-component count of "
        "the 32-perm signatures (the estimator, E[matches/32] = "
        "true Jaccard) is bucketed against the EXACT shingle Jaccard "
        "in integer ppm — per estimator value: pair count, mean/min/"
        "max true Jaccard. Zero-intersection candidates (pure band "
        "collisions) stay in the curve via the LEFT join — they are "
        "exactly the false-positive mass the threshold must cut. "
        "Cost is candidate-bounded (bucket-capped, never corpus²): "
        "two doc-keyed mh joins + the shingle-intersection join the "
        "verify stage already pays.",
)
def q_dedup_minhash_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("toks"))
        .select("doc_id", _shingles(F.col("toks")).alias("ss"))
        .filter(F.size("ss") > 0)
        # Round 19 (guide §5, train-once): d feeds three branches
        # (minhash explode, sizes, verify explode), mh feeds three
        # (band table + both estimator joins) — each divergence is
        # before an exchange, so without the checkpoints the shingle
        # HOF and the 32-min aggregation replay per branch.
        .localCheckpoint(eager=False)
    )
    ex = d.select("doc_id", F.explode("ss").alias("sh")).withColumn(
        "h", _md5_int(F.col("sh"), 7)
    )
    mh = ex.groupBy("doc_id").agg(
        *[
            F.min(
                (F.lit(MH_A[p]) * F.col("h") + F.lit(MH_B[p])) % MINHASH_P
            ).alias(f"mh{p}")
            for p in range(NUM_PERM)
        ]
    ).localCheckpoint(eager=False)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"mh{b * ROWS_PER_BAND + r}")
                            for r in range(ROWS_PER_BAND)
                        ],
                    )
                ).alias("sig"),
            )
            for b in range(BANDS)
        ]
    )
    bands = mh.select(
        "doc_id", F.explode(band_structs).alias("bs")
    ).select("doc_id", "bs.band", "bs.sig")
    wb = Window.partitionBy("band", "sig")
    bands = (
        bands.withColumn("w", F.count(F.lit(1)).over(wb))
        .filter(F.col("w") <= MAX_BUCKET)
        .drop("w")
    )
    x, y = bands.alias("x"), bands.alias("y")
    cands = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.sig") == F.col("y.sig"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("d1"), F.col("y.doc_id").alias("d2")
        )
        .distinct()
        .localCheckpoint(eager=False)  # round 19: feeds est AND inter
    )
    a, b = mh.alias("a"), mh.alias("b")
    est32 = sum(
        (F.col(f"a.mh{p}") == F.col(f"b.mh{p}")).cast("int")
        for p in range(NUM_PERM)
    )
    est = (
        cands.join(a, F.col("d1") == F.col("a.doc_id"))
        .join(b, F.col("d2") == F.col("b.doc_id"))
        .select("d1", "d2", est32.alias("est32"))
    )
    sizes = d.select("doc_id", F.size("ss").alias("n_sh"))
    sh = d.select("doc_id", F.explode("ss").alias("sh"))
    inter = (
        cands.join(
            sh.alias("s1"), F.col("d1") == F.col("s1.doc_id")
        )
        .join(
            sh.alias("s2"),
            (F.col("d2") == F.col("s2.doc_id"))
            & (F.col("s1.sh") == F.col("s2.sh")),
        )
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    j = (
        est.join(inter, ["d1", "d2"], "left")
        .join(
            sizes.select(
                F.col("doc_id").alias("d1"), F.col("n_sh").alias("n1")
            ),
            "d1",
        )
        .join(
            sizes.select(
                F.col("doc_id").alias("d2"), F.col("n_sh").alias("n2")
            ),
            "d2",
        )
        .select(
            "est32",
            F.expr(
                "(COALESCE(n_inter, 0) * 1000000)"
                " div (n1 + n2 - COALESCE(n_inter, 0))"
            ).alias("jac_ppm"),
        )
    )
    return (
        j.groupBy(F.col("est32").cast("long").alias("est32"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.expr("SUM(jac_ppm) DIV COUNT(*)").alias("mean_jac_ppm"),
            F.min("jac_ppm").alias("min_jac_ppm"),
            F.max("jac_ppm").alias("max_jac_ppm"),
        )
        .orderBy("est32")
    )


_SPAN_K = 8  # tokens per span — the exact-substring detection unit
_SPAN_MAX_OCC = 64  # boilerplate cap: hotter clusters are dropped

# Pinned whitespace class for the span tokenizer (ADVICE r13 #2): Java's
# \s includes \x0B (vertical tab) while DuckDB/RE2's does not, so a bare
# \s+ splitter could make span hashes diverge cross-engine on corpora
# containing vertical tabs. The explicit class below means the same five
# characters in both regex dialects.
_SPAN_WS = r"[ \t\n\f\r]+"


def _span_table(docs: DataFrame) -> DataFrame:
    """Map-side span-hash table over any (doc_id, text) frame: one
    16-byte md5 per token position. The hash is computed before any
    exchange — the projection after the explode drops tk, so shuffles
    carry only (doc_id, span_start, cluster)."""
    K = _SPAN_K
    toks = docs.select(
        "doc_id", F.split("text", _SPAN_WS).alias("tk")
    ).filter(F.size("tk") >= K)
    return (
        toks.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.size("tk") - (K - 1))
            ).alias("span_start"),
            "tk",
        )
        .select(
            "doc_id",
            F.col("span_start").cast("long").alias("span_start"),
            F.md5(
                F.array_join(F.expr(f"slice(tk, span_start, {K})"), " ")
            ).alias("cluster"),
        )
    )


def _span_quarantine(spans, sref) -> DataFrame:
    """doc_ids whose contamination ratio vs the reference span set
    ``sref`` (columns h, hit) reaches the quarantine threshold —
    the single Spark home of the integer-ppm rule shared by the
    batch and streaming full-recipe composites."""
    return (
        spans.withColumnRenamed("cluster", "h")
        .join(sref, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.expr(
                "SUM(CASE WHEN hit IS NOT NULL THEN 1 ELSE 0 END)"
                " * 1000000 DIV COUNT(*)"
            ).alias("ppm")
        )
        .filter(F.col("ppm") >= _SXC_QUARANTINE_PPM)
        .select("doc_id")
    )


def _cluster_stats(spans: DataFrame) -> DataFrame:
    """The family's qualifying-cluster rule, in ONE place: clusters
    repeated across >=2 distinct docs, under the boilerplate
    occurrence cap — counted over whatever span subset is passed
    (full table, fingerprint sample, winnow anchors, flagged docs)."""
    stats = spans.groupBy("cluster").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_occ"),
    )
    return stats.where(
        (F.col("n_docs") >= 2) & (F.col("n_occ") <= _SPAN_MAX_OCC)
    )


def _substring_span_tables(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(spans, qualifying cluster stats) shared by the substring-span
    keys: one 16-byte md5 per token position computed MAP-SIDE, stats
    filtered to cross-document repeats under the boilerplate cap."""
    spans = _span_table(load_table(spark, sf_dir, "documents"))
    stats = _cluster_stats(spans)
    return spans, stats



# DuckDB twin of _span_table — the single SQL home of the pinned
# k-token span-hash construction (tokenize -> positions -> md5),
# parameterized by source table and CTE-name prefix so the batch and
# streaming composites reuse it verbatim (round-14 review finding #2).
def _span_cte_sql(src: str = "documents", prefix: str = "") -> str:
    """Three CTEs `{prefix}t` / `{prefix}pos` / `{prefix}spans`; the
    last has columns (doc_id, span_start, cluster)."""
    return r"""{p}t AS (
  SELECT doc_id, regexp_split_to_array(text, '[ \t\n\f\r]+') AS tk
  FROM {src}
),
{p}pos AS (
  SELECT doc_id, tk,
         CAST(unnest(generate_series(1, len(tk) - {K1}))
              AS BIGINT) AS span_start
  FROM {p}t WHERE len(tk) >= {K}
),
{p}spans AS (
  SELECT doc_id, span_start,
         MD5(array_to_string(
             tk[span_start:span_start + {K1}], ' '))
           AS cluster
  FROM {p}pos
)""".format(src=src, p=prefix, K=_SPAN_K, K1=_SPAN_K - 1)


# the shared CTE prefix of every substring-dedup oracle (ends at
# `spans` with columns doc_id, span_start, cluster)
_SPAN_CTE_SQL = _span_cte_sql()


def _substring_emit(spans, stats):
    """The shared emit block of the exact and fingerprint span keys:
    qualifying-cluster join + the canonical output column set."""
    return (
        spans.join(stats, "cluster")
        .select(
            "doc_id",
            "span_start",
            F.lit(_SPAN_K).cast("long").alias("span_len"),
            "cluster",
            "n_docs",
            "n_occ",
        )
        .orderBy("cluster", "doc_id", "span_start")
    )


@register(
    "q_dedup_substring_spans",
    oracle=f"""
WITH {_SPAN_CTE_SQL},
stats AS (
  SELECT cluster, COUNT(DISTINCT doc_id) AS n_docs,
         COUNT(*) AS n_occ
  FROM spans GROUP BY cluster
)
SELECT s.doc_id, s.span_start,
       CAST({_SPAN_K} AS BIGINT) AS span_len, s.cluster,
       CAST(st.n_docs AS BIGINT) AS n_docs,
       CAST(st.n_occ AS BIGINT) AS n_occ
FROM spans s JOIN stats st USING (cluster)
WHERE st.n_docs >= 2 AND st.n_occ <= {_SPAN_MAX_OCC}
ORDER BY cluster, doc_id, span_start
""",
    doc="SUBSTRING-SPAN exact dedup (round 13, VERDICT r12 #2 — the "
        "Lee et al. 'Deduplicating Training Data Makes Language "
        "Models Better' ExactSubstr family, re-expressed Spark-first "
        "instead of the paper's suffix array): detect >=k-token "
        "spans repeated ACROSS documents — the duplication document-"
        "level and near-dedup both miss (a quoted paragraph inside "
        "otherwise-distinct pages). Every token position emits the "
        "16-byte md5 of its k-token window MAP-SIDE (an exploded "
        "position sequence + slice + array_join — one hash per token, corpus-LINEAR in "
        "tokens, never a suffix array on the driver and never "
        "all-pairs); only (doc_id, span_start, cluster) ever enters "
        "a shuffle — document text is plan-excluded, machine-"
        "enforced by tests/test_plans.py. Clusters with >=2 distinct "
        "docs are true cross-document repeats; clusters hotter than "
        f"{_SPAN_MAX_OCC} occurrences are boilerplate (headers, "
        "licenses) and are dropped by the cap — the cap also bounds "
        "the emit join's fan-out, so output stays proportional to "
        "genuine duplication. At 100 TB the span table is "
        "~32 B/position (hash + ids) — comparable to corpus bytes, "
        "the same order as Lee et al.'s 8 B/token suffix array, and "
        "an honest cost both designs pay; production trims it with "
        "stride sampling (hash every s-th position, catching any "
        "repeat of length >= k+s-1) or a Bloom pre-filter on the "
        "hash before the shuffle. The stats agg is a standard "
        "partial-agg shuffle on the hash, and merging adjacent "
        "emitted spans into maximal ranges is the per-doc window "
        "q_dedup_substring_maximal implements.",
)
def q_dedup_substring_spans(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    spans, stats = _substring_span_tables(spark, sf_dir)
    return _substring_emit(spans, stats)


@register(
    "q_dedup_substring_maximal",
    oracle=f"""
WITH {_SPAN_CTE_SQL},
stats AS (
  SELECT cluster, COUNT(DISTINCT doc_id) AS n_docs,
         COUNT(*) AS n_occ
  FROM spans GROUP BY cluster
),
rep AS (
  SELECT s.doc_id, s.span_start
  FROM spans s JOIN stats st USING (cluster)
  WHERE st.n_docs >= 2 AND st.n_occ <= {_SPAN_MAX_OCC}
),
marked AS (
  SELECT doc_id, span_start,
         CASE WHEN span_start > COALESCE(MAX(span_start + {_SPAN_K})
                OVER (PARTITION BY doc_id ORDER BY span_start
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_island
  FROM rep
),
islands AS (
  SELECT doc_id, span_start,
         CAST(SUM(new_island) OVER (PARTITION BY doc_id
              ORDER BY span_start
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
  FROM marked
)
SELECT doc_id, island,
       MIN(span_start) AS range_start,
       MAX(span_start) + {_SPAN_K} AS range_end,
       MAX(span_start) + {_SPAN_K} - MIN(span_start)
         AS n_tokens_covered,
       CAST(COUNT(*) AS BIGINT) AS n_spans
FROM islands
GROUP BY doc_id, island
ORDER BY doc_id, range_start
""",
    doc="MAXIMAL repeated-range merge (round 13) — the second half "
        "of the Lee et al. ExactSubstr recipe: the per-position "
        "repeated spans q_dedup_substring_spans detects merge into "
        "MAXIMAL per-document token ranges (the unit a production "
        "pipeline actually cuts from each document), via the classic "
        "gaps-and-islands pattern — a span opens a new island iff it "
        "starts past the running max end of its predecessors. The "
        "window is partitioned per doc_id over REPEATED spans only, "
        "so its input is proportional to detected duplication, not "
        "the corpus; everything upstream is the shared map-side "
        "span-hash machinery (text never shuffles, 16 B/position). "
        "Output: (doc_id, island, range_start, range_end, coverage, "
        "n_spans) — range_end - range_start >= k by construction, "
        "overlapping k-grams collapse to one row per contiguous "
        "repeated region.",
)
def q_dedup_substring_maximal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    K = _SPAN_K
    spans, stats = _substring_span_tables(spark, sf_dir)
    rep = spans.join(stats, "cluster").select("doc_id", "span_start")
    w = Window.partitionBy("doc_id").orderBy("span_start")
    marked = rep.withColumn(
        "new_island",
        (
            F.col("span_start")
            > F.coalesce(
                F.max(F.col("span_start") + K).over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(-1),
            )
        ).cast("int"),
    )
    islands = marked.withColumn(
        "island",
        F.sum("new_island")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("span_start").alias("range_start"),
            (F.max("span_start") + K).alias("range_end"),
            (F.max("span_start") + K - F.min("span_start")).alias(
                "n_tokens_covered"
            ),
            F.count(F.lit(1)).alias("n_spans"),
        )
        .orderBy("doc_id", "range_start")
    )


_SXC_SPLIT = 400  # doc_id < split = reference (eval/benchmark) corpus
_SXC_QUARANTINE_PPM = 100000  # quarantine at >= 10% contaminated spans


@register(
    "q_dedup_substring_cross_corpus",
    oracle=f"""
WITH {_SPAN_CTE_SQL},
ref AS (
  SELECT DISTINCT cluster AS h FROM spans
  WHERE doc_id < {_SXC_SPLIT}
),
new_spans AS (
  SELECT s.doc_id, s.span_start, (r.h IS NOT NULL) AS hit
  FROM spans s LEFT JOIN ref r ON s.cluster = r.h
  WHERE s.doc_id >= {_SXC_SPLIT}
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contaminated,
       CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS contamination_ppm,
       MIN(CASE WHEN hit THEN span_start END) AS first_hit,
       (CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) >= {_SXC_QUARANTINE_PPM})
         AS quarantine
FROM new_spans GROUP BY doc_id ORDER BY doc_id
""",
    doc="SPAN-LEVEL eval decontamination (round 13) — the k-token "
        "cross-corpus check the GPT-3 appendix and Lee et al. run "
        "before training: every span of a NEW document is probed "
        "against the DISTINCT span-hash set of the standing "
        "reference corpus (here the eval/benchmark side), and "
        "documents whose contamination ratio crosses the quarantine "
        "threshold are flagged — the span-granular sibling of "
        "document-level q_dedup_cross_corpus and 13-gram "
        "q_text_contamination (k-token spans catch quoted passages "
        "those two bracket from opposite sides). Both sides shuffle "
        "ONLY 16-byte md5s through one distinct + one left join; "
        "text is plan-excluded by the shared map-side span-hash "
        "machinery. At 100 TB the reference span set is built ONCE "
        "and persisted (eval sets are small and static — the set is "
        "MB-scale), then every crawl batch probes at "
        "batch-proportional cost; integer-ppm ratios keep the "
        "quarantine boundary bit-identical cross-engine.",
)
def q_dedup_substring_cross_corpus(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    spans, _stats = _substring_span_tables(spark, sf_dir)
    spans = spans.withColumnRenamed("cluster", "h")
    ref = (
        spans.filter(F.col("doc_id") < _SXC_SPLIT)
        .select("h")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    new = spans.filter(F.col("doc_id") >= _SXC_SPLIT)
    return (
        new.join(ref, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.col("hit").isNotNull().cast("long")).alias(
                "n_contaminated"
            ),
            F.expr(
                "SUM(CASE WHEN hit IS NOT NULL THEN 1 ELSE 0 END)"
                " * 1000000 DIV COUNT(*)"
            ).alias("contamination_ppm"),
            F.min(
                F.when(F.col("hit").isNotNull(), F.col("span_start"))
            ).alias("first_hit"),
            (
                F.expr(
                    "SUM(CASE WHEN hit IS NOT NULL THEN 1 ELSE 0 END)"
                    " * 1000000 DIV COUNT(*)"
                )
                >= _SXC_QUARANTINE_PPM
            ).alias("quarantine"),
        )
        .orderBy("doc_id")
    )


_SPAN_FP_MOD = 8  # keep 1/8 of span hashes (content-defined anchors)


@register(
    "q_dedup_substring_fingerprint",
    oracle=f"""
WITH {_SPAN_CTE_SQL},
sampled AS (
  SELECT * FROM spans
  WHERE CAST(('0x' || SUBSTR(cluster, 1, 7)) AS BIGINT)
        % {_SPAN_FP_MOD} = 0
),
stats AS (
  SELECT cluster, COUNT(DISTINCT doc_id) AS n_docs,
         COUNT(*) AS n_occ
  FROM sampled GROUP BY cluster
)
SELECT s.doc_id, s.span_start,
       CAST({_SPAN_K} AS BIGINT) AS span_len, s.cluster,
       CAST(st.n_docs AS BIGINT) AS n_docs,
       CAST(st.n_occ AS BIGINT) AS n_occ
FROM sampled s JOIN stats st USING (cluster)
WHERE st.n_docs >= 2 AND st.n_occ <= {_SPAN_MAX_OCC}
ORDER BY cluster, doc_id, span_start
""",
    doc="FINGERPRINT-SAMPLED substring dedup (round 13) — the scale "
        "path q_dedup_substring_spans's docstring promises, made "
        "real: Manber's 0-mod-p fingerprint selection (the sif/"
        "winnowing family): only span hashes with hash % "
        f"{_SPAN_FP_MOD} == 0 enter the shuffle. The anchor test is "
        "CONTENT-DEFINED (a function of the hash itself, not the "
        "position), so two documents sharing a span select it "
        "identically — cross-document detection is exact ON the "
        "sampled subset, and a repeated region of L tokens is caught "
        f"with probability 1-(1-1/{_SPAN_FP_MOD})^(L-k+1) (~79% at "
        "L=2k, ~99% at L=4k; winnowing's min-in-window selection "
        "makes the guarantee deterministic at the cost of a window "
        "pass). Hashing stays map-side over every position (compute "
        f"is cheap); the SHUFFLED span table shrinks {_SPAN_FP_MOD}x "
        "— the term that dominates at 100 TB, where the full span "
        "table is corpus-scale. Same emit shape and plan posture as "
        "the exact twin (text plan-excluded; occurrence cap bounds "
        "fan-out).",
)
def q_dedup_substring_fingerprint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    spans, _ = _substring_span_tables(spark, sf_dir)
    sampled = spans.filter(
        F.conv(F.substring("cluster", 1, 7), 16, 10).cast("long")
        % _SPAN_FP_MOD
        == 0
    )
    stats = _cluster_stats(sampled)
    return _substring_emit(sampled, stats)


def _keep_first_cut(spans: DataFrame, stats: DataFrame) -> DataFrame:
    """The pinned keep-first-occurrence policy: per qualifying
    cluster, every occurrence except the (doc_id, span_start)-minimal
    one is CUT. Returns (doc_id, span_start) of cut occurrences."""
    wfirst = Window.partitionBy("cluster").orderBy(
        "doc_id", "span_start"
    )
    return (
        spans.join(stats.select("cluster"), "cluster")
        .withColumn("rn", F.row_number().over(wfirst))
        .filter(F.col("rn") > 1)
        .select("doc_id", "span_start")
    )


def _rewrite_kept(
    spark: SparkSession,
    sf_dir: str,
    cut: DataFrame,
    docs: DataFrame | None = None,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Shared core of the rewrite keys: merge the CUT occurrences into
    maximal disjoint per-doc ranges (gaps-and-islands), broadcast them
    into ONE map-side reassembly of the corpus, and return one row per
    non-NULL-text document (of ``docs`` when given — e.g. the crawl
    side only — else the whole documents table) with the original
    token array ``tk``, the post-cut array ``kept``, and ``n_ranges``
    (NULL for untouched docs). ``extra_cols`` carries additional
    document columns (e.g. ``lang``) through the map stage so
    consumers never need a second documents join."""
    cuts_per_doc = _cut_ranges_per_doc(cut)
    # NULL-text docs are omitted, matching the oracle (whose
    # position CTE yields no rows for a NULL token array and whose
    # inner join then drops the doc); without this pin Spark would
    # emit a row of NULLs where DuckDB emits none.
    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    docs = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", *extra_cols, F.split("text", _SPAN_WS).alias("tk")
    )
    return docs.join(
        F.broadcast(cuts_per_doc), "doc_id", "left"
    ).withColumn("kept", _kept_expr())


def _kept_expr():
    """The rewrite map stage's position filter (shared by the
    broadcast and bucketed physicalizations)."""
    return F.expr(
        "CASE WHEN cuts IS NULL THEN tk ELSE filter(tk, "
        "(x, i) -> NOT exists(cuts, c -> i + 1 >= "
        "c.range_start AND i + 1 < c.range_end)) END"
    )


def _cut_ranges_per_doc(cut: DataFrame) -> DataFrame:
    """Merge CUT occurrences into maximal disjoint per-doc ranges
    (gaps-and-islands over cut positions only — duplication-
    proportional) and collect them per doc: (doc_id, cuts
    array<struct<range_start,range_end>>, n_ranges)."""
    K = _SPAN_K
    wdoc = Window.partitionBy("doc_id").orderBy("span_start")
    marked = cut.withColumn(
        "new_island",
        (
            F.col("span_start")
            > F.coalesce(
                F.max(F.col("span_start") + K).over(
                    wdoc.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(-1),
            )
        ).cast("int"),
    )
    ranges = (
        marked.withColumn(
            "island",
            F.sum("new_island").over(
                wdoc.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("doc_id", "island")
        .agg(
            F.min("span_start").alias("range_start"),
            (F.max("span_start") + K).alias("range_end"),
        )
    )
    return ranges.groupBy("doc_id").agg(
        F.collect_list(F.struct("range_start", "range_end")).alias(
            "cuts"
        ),
        F.count(F.lit(1)).alias("n_ranges"),
    )


def _rewrite_emit(
    spark: SparkSession,
    sf_dir: str,
    cut: DataFrame,
    docs: DataFrame | None = None,
) -> DataFrame:
    """The verified-rewrite projection over :func:`_rewrite_kept`:
    before/after token counts, merged-range count, and the rewritten
    text's md5, one row per non-NULL-text document."""
    return _rewrite_project(_rewrite_kept(spark, sf_dir, cut, docs))


def _rewrite_project(kept: DataFrame) -> DataFrame:
    """The canonical verified-rewrite output over a (doc_id, tk,
    kept, n_ranges) frame — shared by the broadcast and bucketed
    physicalizations."""
    return (
        kept.select(
            "doc_id",
            F.size("tk").cast("long").alias("n_tokens_before"),
            F.coalesce(F.col("n_ranges"), F.lit(0))
            .cast("long")
            .alias("n_ranges"),
            (F.size("tk") - F.size("kept"))
            .cast("long")
            .alias("n_tokens_cut"),
            F.size("kept").cast("long").alias("n_tokens_after"),
            F.md5(F.array_join("kept", " ")).alias("rewritten_md5"),
        )
        .orderBy("doc_id")
    )



# the shared tail of the rewrite oracles: islands-merge of the CUT
# occurrences, per-position left join, and the verified-rewrite
# projection (consumes the `cut` CTE plus the token-array CTE named
# by ``docs_cte`` — `t` for whole-corpus rewrites)
def _rewrite_ranges_cte_sql(docs_cte: str = "t") -> str:
    """The range-merge + per-position half of the rewrite oracle tail:
    CTEs ``marked``/``islands``/``ranges``/``rng``/``pos2``/``posk``
    (consumes ``cut`` plus the token-array CTE named by ``docs_cte``;
    ends at ``posk`` with columns doc_id, p, tok, is_cut). Shared by
    the full rewrite tail below and the decontam-aware budget sampler
    (operators/corpus.py), which scores/budgets over posk directly."""
    return f"""marked AS (
  SELECT doc_id, span_start,
         CASE WHEN span_start > COALESCE(MAX(span_start + {_SPAN_K})
                OVER (PARTITION BY doc_id ORDER BY span_start
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_island
  FROM cut
),
islands AS (
  SELECT doc_id, span_start,
         SUM(new_island) OVER (PARTITION BY doc_id
              ORDER BY span_start
              ROWS UNBOUNDED PRECEDING) AS island
  FROM marked
),
ranges AS (
  SELECT doc_id, MIN(span_start) AS range_start,
         MAX(span_start) + {_SPAN_K} AS range_end
  FROM islands GROUP BY doc_id, island
),
rng AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_ranges
  FROM ranges GROUP BY doc_id
),
pos2 AS (
  SELECT doc_id, tk,
         CAST(unnest(generate_series(1, len(tk))) AS BIGINT) AS p
  FROM {docs_cte}
),
posk AS (
  SELECT p.doc_id, p.p, p.tk[p.p] AS tok,
         (r.doc_id IS NOT NULL) AS is_cut
  FROM pos2 p LEFT JOIN ranges r
    ON p.doc_id = r.doc_id
   AND p.p >= r.range_start AND p.p < r.range_end
)"""


def _rewrite_tail_sql(docs_cte: str = "t") -> str:
    return _rewrite_ranges_cte_sql(docs_cte) + f""",
rw AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens_before,
         CAST(SUM(CASE WHEN is_cut THEN 1 ELSE 0 END) AS BIGINT)
           AS n_tokens_cut,
         MD5(COALESCE(STRING_AGG(CASE WHEN NOT is_cut THEN tok END,
             ' ' ORDER BY p), '')) AS rewritten_md5
  FROM posk GROUP BY doc_id
)
SELECT rw.doc_id,
       rw.n_tokens_before,
       CAST(COALESCE(g.n_ranges, 0) AS BIGINT) AS n_ranges,
       rw.n_tokens_cut,
       rw.n_tokens_before - rw.n_tokens_cut AS n_tokens_after,
       rw.rewritten_md5
FROM rw LEFT JOIN rng g USING (doc_id)
ORDER BY rw.doc_id
"""


_REWRITE_TAIL_SQL = _rewrite_tail_sql()


# the exact-rewrite oracle, shared verbatim by the broadcast key and
# its bucketed sort-merge twin (identical semantics, different join
# physicalization)
_REWRITE_ORACLE = f"""
WITH {_SPAN_CTE_SQL},
stats AS (
  SELECT cluster, COUNT(DISTINCT doc_id) AS n_docs,
         COUNT(*) AS n_occ
  FROM spans GROUP BY cluster
),
qual AS (
  SELECT s.doc_id, s.span_start,
         ROW_NUMBER() OVER (PARTITION BY s.cluster
                            ORDER BY s.doc_id, s.span_start) AS rn
  FROM spans s JOIN stats st USING (cluster)
  WHERE st.n_docs >= 2 AND st.n_occ <= {_SPAN_MAX_OCC}
),
cut AS (SELECT doc_id, span_start FROM qual WHERE rn > 1),
{_REWRITE_TAIL_SQL}
"""


@register(
    "q_dedup_substring_rewrite",
    oracle=_REWRITE_ORACLE,
    doc="SUBSTRING-DEDUP REWRITE (round 14, VERDICT r13 #2) — the "
        "third step of the Lee et al. ExactSubstr recipe and the one "
        "production pipelines actually ship: CUT the repeated token "
        "ranges out of each document. Policy (pinned): keep-first-"
        "occurrence — per qualifying cluster (>=2 docs, under the "
        f"{_SPAN_MAX_OCC}-occurrence boilerplate cap) the occurrence "
        "with the smallest (doc_id, span_start) survives; every other "
        "occurrence's k-token coverage is cut. Cut spans merge into "
        "maximal disjoint per-doc ranges (the q_dedup_substring_"
        "maximal gaps-and-islands pattern over CUT occurrences only), "
        "which a broadcast join hands to a single JVM-side map stage: "
        "filter(tk, (x, i) -> no cut range covers i) + array_join — "
        "the q_text_pii_scrub verified-rewrite pattern applied to "
        "dedup, with the rewritten text's md5 AND before/after token "
        "counts pinned so the oracle verifies the rewrite itself, not "
        "just the bookkeeping. Scale: everything upstream shuffles "
        "only (doc_id, position, 16-byte hash) — text enters the "
        "FINAL map-side reassembly straight off the scan and never an "
        "exchange (plan-enforced); the ranges side is proportional to "
        "detected duplication, so the broadcast is duplication-sized, "
        "not corpus-sized (at 100 TB, fall back to the doc_id-"
        "bucketed sort-merge join that "
        "q_dedup_substring_rewrite_bucketed implements — the map "
        "stage is unchanged). Whitespace is "
        "normalized to single spaces by the rewrite (the tokenizer's "
        "documented contract).",
)
def q_dedup_substring_rewrite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    spans, stats = _substring_span_tables(spark, sf_dir)
    return _rewrite_emit(spark, sf_dir, _keep_first_cut(spans, stats))


_WINNOW_W = 15  # winnowing window: every W consecutive positions anchor

# DuckDB twin of _winnow_anchor_table (consumes the `spans` CTE):
# per-doc window minima of cluster||':'||zero-padded position, distinct
_WINNOW_CTE_SQL = f"""ss AS (
  SELECT doc_id, span_start,
         COUNT(*) OVER (PARTITION BY doc_id) AS n_spans,
         MIN(cluster || ':' ||
             lpad(CAST(span_start AS VARCHAR), 12, '0'))
           OVER (PARTITION BY doc_id ORDER BY span_start
                 ROWS BETWEEN CURRENT ROW
                 AND {_WINNOW_W - 1} FOLLOWING) AS wmin
  FROM spans
),
anchors AS (
  SELECT DISTINCT doc_id,
         CAST(SUBSTR(wmin, 34, 12) AS BIGINT) AS span_start,
         SUBSTR(wmin, 1, 32) AS cluster
  FROM ss
  WHERE span_start <= GREATEST(n_spans - {_WINNOW_W - 1}, 1)
)"""


def _winnow_anchor_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The winnowed anchor set: per document, the distinct union of
    per-window minima of cluster||':'||zero-padded-position strings
    over every valid window start (short docs winnow their single
    truncated window). Exposed as a helper so the >=1-anchor-per-
    window guarantee is testable on the real output, pre-stats.

    Round 15: computed ENTIRELY MAP-SIDE with array higher-order
    functions instead of a doc-keyed window pass. Winnowing is
    per-document with a bounded window, and a document's span strings
    are already adjacent inside its own row — shuffling every
    position to a Window operator (the round-14 shape) paid a full
    corpus-scale Exchange of 45-byte strings for ordering the plan
    already had. Here `transform` builds the per-position strings
    once, `array_min(slice(ss, p, W))` takes each window's minimum
    in place (the slice truncates at the array end, which IS the
    short-window rule), and `array_distinct` dedups before the
    explode — so the FIRST thing that ever reaches an Exchange is
    the ~1/8-sampled anchor table itself [plan-enforced]. The
    O(n·W) in-place string comparisons replace a corpus-scale
    shuffle stage: measured 2.2x on the anchor build at fixture
    scale and 3.5x on the composed decontam probe at 10x crawl
    docs; on local[32] the in-memory shuffle is cheap enough that
    the raw anchor build reaches only parity at 10x — the
    structural claim is the plan one (one fewer corpus-scale
    Exchange and Sort in every winnow consumer), which is what
    matters on a real cluster where that Exchange is network
    I/O."""
    return _winnow_anchors_of(load_table(spark, sf_dir, "documents"))


def _winnow_anchors_of(docs: DataFrame) -> DataFrame:
    """:func:`_winnow_anchor_table` over an arbitrary documents frame
    — the form the streaming per-batch posture needs (each micro-batch
    anchors only its own rows, then probes the standing index)."""
    W = _WINNOW_W
    K = _SPAN_K
    toks = (
        docs
        .select("doc_id", F.split("text", _SPAN_WS).alias("tk"))
        .filter(F.size("tk") >= K)
    )
    ss = toks.select(
        "doc_id",
        F.expr(
            f"transform(sequence(1, size(tk) - {K - 1}), p -> "
            f"concat(md5(array_join(slice(tk, p, {K}), ' ')), ':', "
            "lpad(cast(p as string), 12, '0')))"
        ).alias("ss"),
    )
    return (
        ss.select(
            "doc_id",
            F.explode(
                F.expr(
                    "array_distinct(transform("
                    f"sequence(1, greatest(size(ss) - {W - 1}, 1)), "
                    f"p -> array_min(slice(ss, p, {W}))))"
                )
            ).alias("wmin"),
        )
        .select(
            "doc_id",
            F.substring("wmin", 34, 12).cast("long").alias(
                "span_start"
            ),
            F.substring("wmin", 1, 32).alias("cluster"),
        )
    )


@register(
    "q_dedup_substring_winnow",
    oracle=f"""
WITH {_SPAN_CTE_SQL},
{_WINNOW_CTE_SQL},
stats AS (
  SELECT cluster, COUNT(DISTINCT doc_id) AS n_docs,
         COUNT(*) AS n_occ
  FROM anchors GROUP BY cluster
)
SELECT a.doc_id, a.span_start,
       CAST({_SPAN_K} AS BIGINT) AS span_len, a.cluster,
       CAST(st.n_docs AS BIGINT) AS n_docs,
       CAST(st.n_occ AS BIGINT) AS n_occ
FROM anchors a JOIN stats st USING (cluster)
WHERE st.n_docs >= 2 AND st.n_occ <= {_SPAN_MAX_OCC}
ORDER BY cluster, doc_id, span_start
""",
    doc="WINNOWED substring dedup (round 14, VERDICT r13 #3 — the "
        "Schleimer/Wilkerson/Aiken winnowing upgrade the fingerprint "
        "key's own docstring names): per document, every window of "
        f"{_WINNOW_W} consecutive span positions selects its MINIMUM "
        "hash (total order pinned by cluster||':'||zero-padded "
        "position, so ties can't exist and the window min is ONE "
        "plain string MIN window function in both engines); the "
        "anchor set is the distinct union of per-window minima. "
        "Unlike the 0-mod-p fingerprint's probabilistic recall, the "
        "guarantee is DETERMINISTIC by construction: every "
        f"{_WINNOW_W}-position window contains >=1 anchor "
        "(test-enforced), so any repeated region of >= W+k-1 = "
        f"{_WINNOW_W + _SPAN_K - 1} tokens shares a full window in "
        "both documents and therefore selects the SAME min cluster "
        "in both — detection is guaranteed above the winnowing "
        "threshold (the min over identical hash windows is content-"
        "defined; the position tie-break only picks WHICH occurrence "
        "is reported, never which cluster). Expected anchor density "
        f"is 2/(W+1) = 1/{(_WINNOW_W + 1) // 2} "
        "of positions, matching the fingerprint key's measured ~8x "
        "shuffle cut — and since round 15 anchor construction is "
        "ENTIRELY map-side (per-document HOF window minima over the "
        "in-row span-string array; a document's spans are already "
        "adjacent in its own row, so the round-14 doc-keyed Window "
        "pass paid a corpus-scale Exchange for an ordering the plan "
        "had for free): the FIRST thing to reach an Exchange is the "
        "~1/8-sampled anchor table itself, never text and never the "
        "full position set [plan-enforced, no Window operator in "
        "the plan]. Short docs (< W spans) winnow "
        "their single truncated window, so no document escapes "
        "anchoring. Emit shape and downstream posture identical to "
        "the exact/fingerprint twins.",
)
def q_dedup_substring_winnow(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    anchors = _winnow_anchor_table(spark, sf_dir)
    stats = _cluster_stats(anchors)
    return _substring_emit(anchors, stats)


@register(
    "q_dedup_substring_rewrite_anchored",
    oracle=f"""
WITH {_SPAN_CTE_SQL},
{_WINNOW_CTE_SQL},
astats AS (
  SELECT cluster, COUNT(DISTINCT doc_id) AS n_docs,
         COUNT(*) AS n_occ
  FROM anchors GROUP BY cluster
),
flagged AS (
  SELECT DISTINCT a.doc_id
  FROM anchors a JOIN astats st USING (cluster)
  WHERE st.n_docs >= 2 AND st.n_occ <= {_SPAN_MAX_OCC}
),
fspans AS (
  SELECT s.* FROM spans s JOIN flagged USING (doc_id)
),
stats AS (
  SELECT cluster, COUNT(DISTINCT doc_id) AS n_docs,
         COUNT(*) AS n_occ
  FROM fspans GROUP BY cluster
),
qual AS (
  SELECT s.doc_id, s.span_start,
         ROW_NUMBER() OVER (PARTITION BY s.cluster
                            ORDER BY s.doc_id, s.span_start) AS rn
  FROM fspans s JOIN stats st USING (cluster)
  WHERE st.n_docs >= 2 AND st.n_occ <= {_SPAN_MAX_OCC}
),
cut AS (SELECT doc_id, span_start FROM qual WHERE rn > 1),
{_REWRITE_TAIL_SQL}
""",
    doc="ANCHORED substring rewrite (round 14) — the 100 TB path of "
        "q_dedup_substring_rewrite, composing this round's two new "
        "pieces: DETECT with the winnowed anchor table (the only "
        "corpus-scale pass — its shuffled table is ~1/8 of span "
        "positions, and every repeated region of >= W+k-1 = "
        f"{_WINNOW_W + _SPAN_K - 1} tokens is flagged "
        "DETERMINISTICALLY, the winnow guarantee — provided the "
        "shared anchor cluster itself survives the boilerplate cap), "
        "then recompute EXACT spans over the FLAGGED documents only "
        "— a set proportional to detected duplication, reached "
        "through a broadcast join on the scan. Exact re-detection "
        "also catches sub-threshold repeats AMONG flagged docs. "
        "Honest divergences from the full-table twin, both flagged-"
        "LOCAL by construction: (1) keep-first ranks over flagged "
        "spans only, so a cluster whose global first occurrence "
        "lies in an unflagged doc keeps its flagged-first occurrence "
        "instead — the anchored path cuts a SUBSET of the twin's "
        "ranges there; (2) occurrence caps are evaluated on the "
        "anchor table and the flagged subset, so boilerplate bounds "
        "are approximate on this path. BOTH divergences are now "
        "EXERCISED on purpose-built corpora (round 15): (1) pins the "
        "per-doc subset relationship — anchored cut ranges are a "
        "subset of the twin's when a cluster's global first "
        "occurrence hides in an unflagged doc "
        "[test_anchored_rewrite_keeper_divergence]; (2) pins the "
        "opposite direction — a cluster past the corpus-wide cap but "
        "under it on the flagged subset is cut by THIS path only "
        "[test_anchored_rewrite_cap_divergence]. On the shipped "
        "fixture neither case arises and the two outputs coincide "
        "500/500 (test-asserted as a fixture property, not a general "
        "identity). "
        "Output shape and policy identical to the exact twin "
        "(keep-first-occurrence, all non-NULL-text docs, rewritten-"
        "text md5 + token counts pinned); the corpus text enters "
        "only the scan-side broadcast joins and the final map-side "
        "reassembly — never an exchange [plan-enforced].",
)
def q_dedup_substring_rewrite_anchored(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    anchors = _winnow_anchor_table(spark, sf_dir)
    astats = _cluster_stats(anchors)
    flagged = (
        anchors.join(astats.select("cluster"), "cluster")
        .select("doc_id")
        .distinct()
    )
    docs_f = load_table(spark, sf_dir, "documents").join(
        F.broadcast(flagged), "doc_id"
    )
    spans_f = _span_table(docs_f)
    stats_f = _cluster_stats(spans_f)
    return _rewrite_emit(
        spark, sf_dir, _keep_first_cut(spans_f, stats_f)
    )


# frequent-n-gram exclusion for the surgical decontam path: reference
# spans matching more crawl positions than this are ubiquitous common
# text (stop-phrases), not eval leakage — cutting them would shred
# documents while growing the cut table without bound (the GPT-3
# appendix applies the same exclusion to its overlap decontamination)
_SDR_MAX_OCC = _SPAN_MAX_OCC


def _cap_excluded_cut(hits: DataFrame) -> DataFrame:
    """The frequent-n-gram exclusion (GPT-3 appendix) applied to a
    (doc_id, span_start, cluster) hit table: clusters with more than
    ``_SDR_MAX_OCC`` hits are ubiquitous common text, not leakage —
    drop them and return the bounded (doc_id, span_start) cut table.
    The SINGLE Spark home of the rule (round-15 review: it had been
    copy-pasted into four consumers)."""
    common = (
        hits.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") > _SDR_MAX_OCC)
        .select("cluster")
    )
    return hits.join(common, "cluster", "left_anti").select(
        "doc_id", "span_start"
    )


def _sdr_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The surgical-decontam CUT table (doc_id, span_start over the
    crawl side): every crawl span matching a reference-corpus span
    cluster, minus clusters exceeding the ``_SDR_MAX_OCC``
    frequent-n-gram exclusion. Shared by
    ``q_dedup_substring_decontam_rewrite`` and the decontam-aware
    budget sampler (operators/corpus.py)."""
    spans = _span_table(load_table(spark, sf_dir, "documents"))
    sref = (
        spans.filter(F.col("doc_id") < _SXC_SPLIT)
        .select("cluster")
        .distinct()
    )
    hits = spans.filter(F.col("doc_id") >= _SXC_SPLIT).join(
        sref, "cluster"
    )
    return _cap_excluded_cut(hits)


# the decontam cut CTEs shared (verbatim) by the two oracles that
# consume _sdr_cut: reference span set, crawl hits, frequent-n-gram
# exclusion, and the final cut table
_SDR_CUT_CTE_SQL = f"""sref AS (
  SELECT DISTINCT cluster FROM spans WHERE doc_id < {_SXC_SPLIT}
),
hits AS (
  SELECT s.doc_id, s.span_start, s.cluster
  FROM spans s JOIN sref USING (cluster)
  WHERE s.doc_id >= {_SXC_SPLIT}
),
common AS (
  SELECT cluster FROM hits GROUP BY cluster
  HAVING COUNT(*) > {_SDR_MAX_OCC}
),
cut AS (
  SELECT h.doc_id, h.span_start
  FROM hits h LEFT JOIN common c USING (cluster)
  WHERE c.cluster IS NULL
),
ct AS (
  SELECT * FROM t WHERE doc_id >= {_SXC_SPLIT}
)"""


@register(
    "q_dedup_substring_decontam_rewrite",
    oracle=f"""
WITH {_SPAN_CTE_SQL},
{_SDR_CUT_CTE_SQL},
{_rewrite_tail_sql("ct")}
""",
    doc="SURGICAL span-level decontamination (round 14) — the "
        "rewrite-out alternative to quarantining: instead of dropping "
        "a crawl document whose contamination ratio crosses a "
        "threshold (q_dedup_substring_cross_corpus / the curation "
        "composites), CUT every k-token span that matches the "
        "reference/eval corpus out of every crawl document — the "
        "policy production pipelines use when documents are valuable "
        "but quoted benchmark text must not be trained on. Every "
        "contaminated occurrence is cut (no keep-first here: eval "
        "text must ALL go); overlapping hits merge into maximal "
        "disjoint ranges via the shared gaps-and-islands machinery, "
        "and the shared verified-rewrite emit pins the rewritten "
        "text's md5 + token counts for every crawl document "
        "(n_tokens_cut = 0 rows prove clean docs pass untouched). "
        "Reference spans matching more than "
        f"{_SDR_MAX_OCC} crawl positions are excluded as ubiquitous "
        "common text (stop-phrases are not eval leakage — the GPT-3 "
        "appendix applies the same frequent-n-gram exclusion), which "
        "BOUNDS the cut table to |reference spans| x the cap, making "
        "the broadcast defensible by construction rather than by "
        "hope. Scale: the reference span set is the same MB-scale, "
        "build-once table the probe key documents; only (doc_id, "
        "position, 16-byte hash) ever shuffles, and crawl text "
        "enters ONLY the final map-side reassembly [plan-enforced].",
)
def q_dedup_substring_decontam_rewrite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    crawl = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") >= _SXC_SPLIT
    )
    return _rewrite_emit(
        spark, sf_dir, _sdr_cut(spark, sf_dir), docs=crawl
    )


def _sxc_anchored_ranges_oracle(
    ref: tuple[int, int], crawl: tuple[int, int]
) -> str:
    """The anchored-decontam oracle parameterized over doc_id RANGES
    — reference [ref_lo, ref_hi), crawl [crawl_lo, crawl_hi) — the
    form the streaming TTL posture needs (each batch's probe sees
    only the RETAINED reference window, so its oracle is this query
    at that window)."""
    rlo, rhi = ref
    clo, chi = crawl
    return f"""
WITH {_SPAN_CTE_SQL},
{_WINNOW_CTE_SQL},
refa AS (
  SELECT DISTINCT cluster FROM anchors
  WHERE doc_id >= {rlo} AND doc_id < {rhi}
),
flagged AS (
  SELECT DISTINCT a.doc_id FROM anchors a JOIN refa USING (cluster)
  WHERE a.doc_id >= {clo} AND a.doc_id < {chi}
),
sref AS (
  SELECT DISTINCT cluster FROM spans
  WHERE doc_id >= {rlo} AND doc_id < {rhi}
),
hits AS (
  SELECT s.doc_id, s.span_start, s.cluster
  FROM spans s JOIN flagged USING (doc_id) JOIN sref USING (cluster)
),
common AS (
  SELECT cluster FROM hits GROUP BY cluster
  HAVING COUNT(*) > {_SDR_MAX_OCC}
),
cut AS (
  SELECT h.doc_id, h.span_start
  FROM hits h LEFT JOIN common c USING (cluster)
  WHERE c.cluster IS NULL
),
ct AS (
  SELECT * FROM t WHERE doc_id >= {clo} AND doc_id < {chi}
),
{_rewrite_tail_sql("ct")}
"""


# shared by the batch key below AND the streaming per-batch posture
# (streaming/queries.py q_stream_dedup_substring_anchored, whose
# 2-batch run at the same split must reproduce this output exactly)
_SXC_ANCHORED_ORACLE = f"""
WITH {_SPAN_CTE_SQL},
{_WINNOW_CTE_SQL},
refa AS (
  SELECT DISTINCT cluster FROM anchors WHERE doc_id < {_SXC_SPLIT}
),
flagged AS (
  SELECT DISTINCT a.doc_id FROM anchors a JOIN refa USING (cluster)
  WHERE a.doc_id >= {_SXC_SPLIT}
),
sref AS (
  SELECT DISTINCT cluster FROM spans WHERE doc_id < {_SXC_SPLIT}
),
hits AS (
  SELECT s.doc_id, s.span_start, s.cluster
  FROM spans s JOIN flagged USING (doc_id) JOIN sref USING (cluster)
),
common AS (
  SELECT cluster FROM hits GROUP BY cluster
  HAVING COUNT(*) > {_SDR_MAX_OCC}
),
cut AS (
  SELECT h.doc_id, h.span_start
  FROM hits h LEFT JOIN common c USING (cluster)
  WHERE c.cluster IS NULL
),
ct AS (
  SELECT * FROM t WHERE doc_id >= {_SXC_SPLIT}
),
{_rewrite_tail_sql("ct")}
"""


@register(
    "q_dedup_substring_decontam_anchored",
    oracle=_SXC_ANCHORED_ORACLE,
    doc="ANCHORED surgical decontamination (round 15) — the 100 TB "
        "path of q_dedup_substring_decontam_rewrite, the same winnow-"
        "flag-then-exact-recompute composition the anchored rewrite "
        "key applies to dedup: DETECT contaminated crawl documents by "
        "intersecting the crawl side's winnowed anchors with the "
        "reference side's winnowed anchor set (the only corpus-scale "
        "pass — ~1/8 of span positions shuffle, and any quoted "
        f"region of >= W+k-1 = {_WINNOW_W + _SPAN_K - 1} tokens "
        "shares a full window with the reference and therefore "
        "selects the SAME anchor cluster on both sides — detection "
        "of long contamination is DETERMINISTIC, the winnow "
        "guarantee), then recompute EXACT spans over the FLAGGED "
        "documents only (contamination-proportional, 7% of the crawl "
        "on the fixture, reached via a broadcast on the scan) and "
        "cut every reference-matching span exactly as the full twin "
        "does. Honest divergences, both flagged-local: (1) a crawl "
        "doc whose ONLY contamination is shorter than the winnowing "
        f"threshold ({_WINNOW_W + _SPAN_K - 1} tokens) may escape "
        "flagging — the full twin cuts down to single "
        f"{_SPAN_K}-token quotes; (2) the frequent-n-gram exclusion "
        "counts hits over "
        "flagged docs only, so a phrase ubiquitous corpus-wide but "
        "rare among flagged docs is cut here and excluded there. "
        "Both are exercised on a purpose-built corpus "
        "[test_anchored_decontam_short_quote_divergence]; on the "
        "shipped fixture the outputs coincide 100/100 (a fixture "
        "property — its planted contamination is all above the "
        "threshold). Output shape identical to the full twin (every "
        "non-NULL-text crawl doc, n_tokens_cut = 0 rows prove clean "
        "docs pass untouched); crawl text enters only the scan-side "
        "broadcast joins and the final map-side reassembly "
        "[plan-enforced].",
)
def q_dedup_substring_decontam_anchored(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    anchors = _winnow_anchor_table(spark, sf_dir)
    refa = (
        anchors.filter(F.col("doc_id") < _SXC_SPLIT)
        .select("cluster")
        .distinct()
    )
    flagged = (
        anchors.filter(F.col("doc_id") >= _SXC_SPLIT)
        .join(F.broadcast(refa), "cluster")
        .select("doc_id")
        .distinct()
    )
    docs = load_table(spark, sf_dir, "documents")
    crawl = docs.filter(F.col("doc_id") >= _SXC_SPLIT)
    fdocs = crawl.join(F.broadcast(flagged), "doc_id")
    fspans = _span_table(fdocs)
    sref = (
        _span_table(docs.filter(F.col("doc_id") < _SXC_SPLIT))
        .select("cluster")
        .distinct()
    )
    hits = fspans.join(sref, "cluster")
    return _rewrite_emit(
        spark, sf_dir, _cap_excluded_cut(hits), docs=crawl
    )


@register(
    "q_dedup_substring_rewrite_bucketed",
    oracle=_REWRITE_ORACLE,
    doc="BUCKETED substring rewrite (round 15) — the exact rewrite "
        "key's documented 100 TB fallback MADE REAL instead of "
        "narrated: when the cut-range table outgrows a broadcast "
        "(massive duplication), the reassembly becomes a doc_id-"
        "bucketed SORT-MERGE join against a documents copy written "
        "bucketBy(doc_id)+sortBy(doc_id) ONCE at ingest — the "
        "storage layout q_join_bucketed demonstrates, applied to "
        "the one place the rewrite family still leaned on broadcast "
        "hope. Semantics identical to q_dedup_substring_rewrite "
        "(same oracle string, keep-first policy, range merge, "
        "verified md5/counts); only the join physicalization "
        "changes: the ranges side shuffles (doc_id, ranges) to the "
        "bucket layout while the documents side is read IN PLACE "
        "per bucket, pre-sorted — so document text STILL never "
        "enters an Exchange [asserted in-key on the composed plan: "
        "every Exchange input excludes text/tk, and >=1 "
        "SortMergeJoin is present], which is precisely why this is "
        "the correct shape when broadcast is off the table. The "
        "span detection side also reads the bucketed copy (one "
        "ingest copy serves every stage). The bucketed write here "
        "is per-invocation because the fixture has no standing "
        "catalog; production pays it once at ingest.",
)
def q_dedup_substring_rewrite_bucketed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import shutil
    import uuid as _uuid

    from netcdf4_variable_streamer_spark.plans.inspect import (
        count_nodes,
        plan_string,
    )
    from netcdf4_variable_streamer_spark.sources.queries import SCRATCH

    tag = _uuid.uuid4().hex[:8]
    db = f"rwb_{tag}"
    loc = os.path.join(SCRATCH, f"rwbdb_{tag}")
    spark.sql(f"CREATE DATABASE {db} LOCATION '{loc}'")
    try:
        (
            load_table(spark, sf_dir, "documents")
            .repartition(8, F.col("doc_id"))
            .write.bucketBy(8, "doc_id")
            .sortBy("doc_id")
            .option("path", os.path.join(loc, "documents_b"))
            .mode("overwrite")
            .saveAsTable(f"{db}.documents_b")
        )
        docs_b = spark.table(f"{db}.documents_b")
        spans = _span_table(docs_b.select("doc_id", "text"))
        stats = _cluster_stats(spans)
        cuts_per_doc = _cut_ranges_per_doc(
            _keep_first_cut(spans, stats)
        )
        toks = docs_b.filter(F.col("text").isNotNull()).select(
            "doc_id", F.split("text", _SPAN_WS).alias("tk")
        )
        # shuffle the duplication-sized ranges side INTO the bucket
        # layout (8-way doc_id hash, matching the table's bucket
        # spec) — without this Spark aligns partition counts by
        # re-shuffling the BUCKETED side up to shuffle.partitions,
        # which would put text back in an Exchange and defeat the
        # whole layout
        ranges8 = cuts_per_doc.repartition(8, F.col("doc_id"))
        out = _rewrite_project(
            toks.join(ranges8.hint("merge"), "doc_id", "left")
            .withColumn("kept", _kept_expr())
        )
        plan = plan_string(out)
        # plain raises, not asserts: the in-key plan guarantee must
        # survive `python -O` (the ADVICE-r14 class this repo fixed
        # in the oracle-surgery guards)
        if count_nodes(plan, "SortMergeJoin") < 1:
            raise RuntimeError(
                "bucketed rewrite lost its SortMergeJoin:\n" + plan
            )
        import re as _re

        for block in _re.split(r"\n\n", plan):
            if _re.match(
                r"\(\d+\) (Exchange|BroadcastExchange)\b",
                block.strip(),
            ):
                m = _re.search(r"Input \[\d+\]: \[(.*)\]", block)
                if m is None or "text#" in m.group(1) or (
                    "tk#" in m.group(1)
                ):
                    raise RuntimeError(
                        "bucketed rewrite shuffled document text:\n"
                        + block
                    )
        # localCheckpoint, NOT collect: the result must outlive the
        # fixture-lifecycle DROP of the temp bucketed database, but a
        # driver-side collect would be corpus-sized at scale —
        # executor-block materialization cuts the lineage at executor
        # parallelism instead (production keeps the bucketed table
        # and returns the lazy frame; none of this block exists)
        return out.localCheckpoint(eager=True)
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        shutil.rmtree(loc, ignore_errors=True)
