"""Property-based differential fuzzing: random queries from a shared
grammar run on BOTH engines (Spark via `F.expr`, DuckDB via the same SQL
text) and must hash-match — upgrading SURVEY §5.2's example-based oracle
layer to a whole grammar of filter/group/agg queries.

The grammar covers the engine's hot relational path: comparison and
boolean predicates over numeric/string/date columns, optional grouping,
and the deterministic aggregate kernel (`dsum` fixed-point sums, counts,
min/max). Constants are drawn from the columns' real value ranges so
predicates are selective-but-nonempty most of the time; empty results
are still compared (both engines must agree on emptiness).

Runs at sf0.001 for per-example speed; ~40 examples per property.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from netcdf4_variable_streamer_spark import oracle as oracle_mod
from netcdf4_variable_streamer_spark.registry import SQL_DSUM, dsum
from netcdf4_variable_streamer_spark.tables import load_table

FUZZ_SF = "/root/testdata/sf0.001"

# column -> (sql type class, constant strategy)
NUM_COLS = {
    "l_quantity": st.integers(1, 50).map(float),
    "l_extendedprice": st.integers(900, 100_000).map(float),
    "l_discount": st.sampled_from([0.0, 0.02, 0.04, 0.06, 0.08, 0.1]),
    "l_tax": st.sampled_from([0.0, 0.02, 0.04, 0.06, 0.08]),
}
STR_COLS = {
    "l_returnflag": st.sampled_from(["A", "N", "R"]),
    "l_linestatus": st.sampled_from(["F", "O"]),
}
CMP_OPS = ["<", "<=", ">", ">=", "=", "<>"]
GROUP_COLS = [None, "l_returnflag", "l_linestatus"]


@st.composite
def comparison(draw) -> str:
    if draw(st.booleans()):
        col = draw(st.sampled_from(sorted(NUM_COLS)))
        val = draw(NUM_COLS[col])
        op = draw(st.sampled_from(CMP_OPS))
        return f"({col} {op} {val!r})"
    col = draw(st.sampled_from(sorted(STR_COLS)))
    val = draw(STR_COLS[col])
    op = draw(st.sampled_from(["=", "<>"]))
    return f"({col} {op} '{val}')"


@st.composite
def predicate(draw, depth: int = 2) -> str:
    if depth == 0 or draw(st.integers(0, 2)) == 0:
        return draw(comparison())
    left = draw(predicate(depth=depth - 1))
    right = draw(predicate(depth=depth - 1))
    combinator = draw(st.sampled_from(["AND", "OR"]))
    neg = "NOT " if draw(st.booleans()) else ""
    return f"{neg}({left} {combinator} {right})"


@pytest.fixture(scope="module")
def fuzz_ctx(spark):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{FUZZ_SF}/lineitem.parquet')"
    )
    li = load_table(spark, FUZZ_SF, "lineitem")
    return spark, con, li


@given(pred=predicate(), group=st.sampled_from(GROUP_COLS))
@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_filter_agg_differential(fuzz_ctx, pred, group):
    spark, con, li = fuzz_ctx

    group_sql = f"GROUP BY {group}" if group else ""
    group_cols = f"{group}, " if group else ""
    sql = f"""
        SELECT {group_cols}COUNT(*) AS cnt,
               {SQL_DSUM('l_quantity')} AS sum_qty,
               MIN(l_extendedprice) AS min_price,
               MAX(l_extendedprice) AS max_price
        FROM lineitem WHERE {pred} {group_sql}
    """
    opdf = con.execute(sql).fetchdf()

    sdf = li.filter(F.expr(pred))
    grouped = sdf.groupBy(group) if group else sdf.groupBy()
    spdf = grouped.agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum("l_quantity").alias("sum_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    ).toPandas()

    # global agg over an empty input: SQL returns one row of NULL/0 per
    # ANSI, Spark's API-level global agg does too — both length-1; grouped
    # empty results are length-0 in both. Just compare.
    oracle_mod.compare_frames(spdf, opdf, f"fuzz[{pred} | {group}]")


@given(pred=predicate())
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_filter_rowset_differential(fuzz_ctx, pred):
    """The filtered row *set* itself (projected to a stable key) matches —
    catches predicate-evaluation differences that aggregation could mask."""
    spark, con, li = fuzz_ctx
    sql = f"""
        SELECT l_orderkey, l_partkey, l_quantity
        FROM lineitem WHERE {pred}
    """
    opdf = con.execute(sql).fetchdf()
    spdf = (
        li.filter(F.expr(pred))
        .select("l_orderkey", "l_partkey", "l_quantity")
        .toPandas()
    )
    oracle_mod.compare_frames(spdf, opdf, f"fuzz-rows[{pred}]")


# ---------------------------------------------------------------------------
# Join fuzzing: random join type x random side-filters, customer |><| orders.
# ---------------------------------------------------------------------------

ORDER_PRED = {
    "o_totalprice": st.integers(1000, 300_000).map(float),
    "o_custkey": st.integers(1, 1500).map(float),
}
CUST_PRED = {
    "c_acctbal": st.integers(-999, 9999).map(float),
    "c_custkey": st.integers(1, 1500).map(float),
}


@st.composite
def side_pred(draw, cols) -> str:
    col = draw(st.sampled_from(sorted(cols)))
    val = draw(cols[col])
    op = draw(st.sampled_from(CMP_OPS))
    return f"({col} {op} {val!r})"


@pytest.fixture(scope="module")
def join_ctx(spark):
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{FUZZ_SF}/{t}.parquet')"
        )
    c = load_table(spark, FUZZ_SF, "customer")
    o = load_table(spark, FUZZ_SF, "orders")
    return spark, con, c, o


@given(
    how=st.sampled_from(["inner", "left", "left_semi", "left_anti"]),
    cpred=side_pred(CUST_PRED),
    opred=side_pred(ORDER_PRED),
)
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_join_differential(join_ctx, how, cpred, opred):
    spark, con, c, o = join_ctx
    cf = c.filter(F.expr(cpred))
    of = o.filter(F.expr(opred))

    if how in ("left_semi", "left_anti"):
        word = "EXISTS" if how == "left_semi" else "NOT EXISTS"
        sql = f"""
            SELECT c_custkey, COUNT(*) AS n FROM customer c
            WHERE {cpred} AND {word} (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey AND {opred})
            GROUP BY c_custkey
        """
        sdf = cf.join(of, cf.c_custkey == of.o_custkey, how).groupBy(
            "c_custkey"
        ).agg(F.count(F.lit(1)).alias("n"))
    else:
        join_word = "JOIN" if how == "inner" else "LEFT JOIN"
        sql = f"""
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
            FROM (SELECT * FROM customer WHERE {cpred}) c
            {join_word} (SELECT * FROM orders WHERE {opred}) o
              ON o.o_custkey = c.c_custkey
            GROUP BY c.c_custkey
        """
        sdf = cf.join(of, cf.c_custkey == of.o_custkey, how).groupBy(
            "c_custkey"
        ).agg(F.count("o_orderkey").alias("n_orders"))

    opdf = con.execute(sql).fetchdf()
    oracle_mod.compare_frames(sdf.toPandas(), opdf, f"fuzz-join[{how}|{cpred}|{opred}]")


# ---------------------------------------------------------------------------
# Window fuzzing: random function x partition key x frame over events,
# with a total deterministic order (ts, event_id) so ranks are unique.
# ---------------------------------------------------------------------------

WIN_PARTITIONS = ["user_id", "event_type"]


@pytest.fixture(scope="module")
def win_ctx(spark):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT event_id, user_id, event_type, "
        "value, ts::TIMESTAMP AS ts FROM "
        f"read_parquet('{FUZZ_SF}/events.parquet')"
    )
    e = load_table(spark, FUZZ_SF, "events")
    return spark, con, e


@given(
    part=st.sampled_from(WIN_PARTITIONS),
    fn=st.sampled_from(["row_number", "rank", "lag", "lead", "run_sum", "mov_min"]),
    frame_lo=st.integers(1, 5),
)
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_window_differential(win_ctx, part, fn, frame_lo):
    from pyspark.sql import Window

    spark, con, e = win_ctx
    order_sql = "ORDER BY ts, event_id"
    w = Window.partitionBy(part).orderBy("ts", "event_id")

    if fn == "row_number":
        expr, col = F.row_number(), f"ROW_NUMBER() OVER (PARTITION BY {part} {order_sql})"
    elif fn == "rank":
        expr, col = F.rank(), f"RANK() OVER (PARTITION BY {part} {order_sql})"
    elif fn == "lag":
        expr = F.lag("event_id", frame_lo)
        col = f"LAG(event_id, {frame_lo}) OVER (PARTITION BY {part} {order_sql})"
    elif fn == "lead":
        expr = F.lead("event_id", frame_lo)
        col = f"LEAD(event_id, {frame_lo}) OVER (PARTITION BY {part} {order_sql})"
    elif fn == "run_sum":
        expr = F.sum(F.floor(F.col("value") * 1_000_000).cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # outer CAST: DuckDB window SUM(BIGINT) returns HUGEINT ->
        # fetchdf float64, which the strict mirror (correctly) rejects
        col = (
            f"CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) OVER ("
            f"PARTITION BY {part} {order_sql} "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"
        )
    else:  # mov_min over a bounded trailing frame
        expr = F.min("event_id").over(w.rowsBetween(-frame_lo, 0))
        col = (
            f"MIN(event_id) OVER (PARTITION BY {part} {order_sql} "
            f"ROWS BETWEEN {frame_lo} PRECEDING AND CURRENT ROW)"
        )

    if fn in ("row_number", "rank", "lag", "lead"):
        expr = expr.over(w)

    sql = f"SELECT event_id, {col} AS win_val FROM events"
    opdf = con.execute(sql).fetchdf()
    spdf = e.select("event_id", expr.alias("win_val")).toPandas()
    oracle_mod.compare_frames(spdf, opdf, f"fuzz-win[{fn}|{part}|{frame_lo}]")


# ---------------------------------------------------------------------------
# Round 15: random-corpus differential for the substring-span family.
# The driver checks these keys on the FIXED fixtures; this property runs
# the exact-span, verified-rewrite and winnowed-anchor keys on RANDOM
# corpora drawn over a 2-token alphabet (so k-token repeats arise
# naturally), with NULL-text, empty, sub-threshold and mixed-whitespace
# documents injected — the cross-engine edges (tokenizer class, span
# grid, keep-first ranking, islands merge, window minima) under inputs
# nobody hand-picked.
# ---------------------------------------------------------------------------

_SPAN_FUZZ_KEYS = [
    "q_dedup_substring_spans",
    "q_dedup_substring_rewrite",
    "q_dedup_substring_winnow",
]


@st.composite
def _span_corpus(draw):
    n_docs = draw(st.integers(3, 7))
    docs = []
    for i in range(n_docs):
        kind = draw(st.integers(0, 9))
        if kind == 0:
            docs.append(None)  # NULL text
        elif kind == 1:
            docs.append("")  # empty
        elif kind == 2:
            docs.append("a b a")  # below the span threshold
        else:
            toks = draw(
                st.lists(
                    st.sampled_from(["a", "b"]),
                    min_size=0,
                    max_size=50,
                )
            )
            sep = draw(st.sampled_from([" ", "  ", " \t", "\n"]))
            docs.append(sep.join(toks))
    return docs


@given(docs=_span_corpus(), key=st.sampled_from(_SPAN_FUZZ_KEYS))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_substring_family_random_corpus_differential(
    spark, tmp_path_factory, docs, key
):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from netcdf4_variable_streamer_spark.registry import REGISTRY

    sf = str(tmp_path_factory.mktemp("spanfuzz"))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(
                    range(1, len(docs) + 1), type=pa.int64()
                ),
                # explicit type: an all-NULL draw must not degrade
                # the column to the null type (unreadable as text)
                "text": pa.array(docs, type=pa.string()),
            }
        ),
        f"{sf}/documents.parquet",
    )
    got = REGISTRY[key].builder(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS FROM '{sf}/documents.parquet'"
    )
    want = con.execute(REGISTRY[key].oracle).df()
    oracle_mod.compare_frames(got, want, f"spanfuzz:{key}")


# ---------------------------------------------------------------------------
# Round 15: random-corpus differential for the batch curation
# composites. These chain every cross-engine hazard the repo documents
# — fixed-point LN scoring, integer-ppm ratios, truncated-division
# cutoffs, hashed-classifier buckets, keep-first dedup — so random
# corpora (two languages, natural repeats, reference/crawl split,
# NULL/empty/whitespace edges) are the right stress for the seams
# between stages that the fixed fixtures cannot move.
# ---------------------------------------------------------------------------

_CURATION_FUZZ_KEYS = [
    "q_pipeline_curation_full",
    "q_pipeline_curation_surgical",
]


@st.composite
def _curation_corpus(draw):
    rows = []
    # reference side: doc_id < 400
    for i in range(draw(st.integers(2, 4))):
        toks = draw(
            st.lists(st.sampled_from(["a", "b", "c"]), max_size=40)
        )
        rows.append((1 + i, draw(st.sampled_from(["en", "de"])),
                     " ".join(toks)))
    # crawl side: doc_id >= 400, with occasional NULL/empty/dup docs
    n_crawl = draw(st.integers(3, 8))
    for i in range(n_crawl):
        kind = draw(st.integers(0, 9))
        lang = draw(st.sampled_from(["en", "de"]))
        if kind == 0:
            rows.append((400 + i, lang, None))
        elif kind == 1:
            rows.append((400 + i, lang, ""))
        elif kind == 2 and rows:
            rows.append((400 + i, lang, rows[-1][2]))  # exact dup
        else:
            toks = draw(
                st.lists(st.sampled_from(["a", "b", "c"]), max_size=40)
            )
            sep = draw(st.sampled_from([" ", "  "]))
            rows.append((400 + i, lang, sep.join(toks)))
    return rows


@given(rows=_curation_corpus(), key=st.sampled_from(_CURATION_FUZZ_KEYS))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_curation_composites_random_corpus_differential(
    spark, tmp_path_factory, rows, key
):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from netcdf4_variable_streamer_spark.registry import REGISTRY

    sf = str(tmp_path_factory.mktemp("curfuzz"))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(
                    [d for d, _, _ in rows], type=pa.int64()
                ),
                "lang": pa.array(
                    [la for _, la, _ in rows], type=pa.string()
                ),
                "text": pa.array(
                    [t for _, _, t in rows], type=pa.string()
                ),
            }
        ),
        f"{sf}/documents.parquet",
    )
    got = REGISTRY[key].builder(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS FROM '{sf}/documents.parquet'"
    )
    want = con.execute(REGISTRY[key].oracle).df()
    oracle_mod.compare_frames(got, want, f"curfuzz:{key}")
