"""Central operator/query registry — the SURVEY.md §2 Table B contract.

Each engine operator registers one key here with a DataFrame builder
``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) an equivalent
DuckDB oracle SQL string. ``__spark_entry__.py`` re-exports this registry
as the driver contract ``queries()`` / ``oracle_sql()``.

Hash-match hygiene (SURVEY.md §7.5) enforced by convention here:
- float SUM/AVG go through decimal-exact accumulation (see ``dsum``) so
  both engines produce bit-identical doubles;
- every computed column is aliased identically in builder and oracle;
- timestamps are emitted as canonical strings (no tz ambiguity);
- every ORDER BY/LIMIT and window order has a total deterministic key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class QuerySpec:
    key: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(key: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a query builder under ``key``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if key in REGISTRY:
            raise ValueError(f"duplicate query key: {key}")
        REGISTRY[key] = QuerySpec(key, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


# ---------------------------------------------------------------------------
# Deterministic cross-engine numeric helpers.
#
# Summing doubles is order-dependent; Spark and DuckDB will disagree in the
# low bits and (at 1e8+ magnitudes) even past a 4-decimal rounding. The fix:
# accumulate in DECIMAL (exact), cast the exact result to double, round.
# Both engines round the *same* per-row double to decimal(18,6) (never a
# tie: 7+-digit decimal fractions are not dyadic), sum exactly, and cast the
# same exact decimal back — bit-identical output. Oracle SQL mirrors this:
#   ROUND(CAST(SUM(CAST(expr AS DECIMAL(18,6))) AS DOUBLE), s)
# ---------------------------------------------------------------------------

def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent (decimal-exact) SUM of a double column → double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast("decimal(18,6)")).cast("double"), scale)


def davg(col: Column | str, scale: int = 4) -> Column:
    """Order-independent AVG: exact decimal sum / count → double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(c.cast("decimal(18,6)")).cast("double") / F.count(c), scale
    )


def SQL_DSUM(expr: str, scale: int = 2) -> str:
    return f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE), {scale})"


def SQL_DAVG(expr: str, scale: int = 4) -> str:
    return (
        f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT({expr}), {scale})"
    )


def ts_str(col: Column | str, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """Canonical timestamp→string projection (UTC session; SURVEY §7.4)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, fmt)
