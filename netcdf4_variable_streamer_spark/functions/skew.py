"""Skew-mitigation join helpers (SCALE.md, SURVEY §4.2 AQE row).

AQE's skew-join splitting handles skew it can *observe* (oversized
shuffle partitions at runtime). `salted_join` is the explicit-control
variant for keys known to be pathological up front (the classic case: a
null/default key holding 30% of a 100 TB fact table), and it works in
places AQE skew handling does not reach — e.g. under
`spark.sql.shuffle.partitions` pinned by a foreign session, or for
aggregation-free joins feeding a streaming sink.

Mechanics: the skewed (large) side gets a uniform random salt in
[0, n_salts); the small side is exploded n_salts times, one copy per
salt value; the join key becomes (key, salt). Each hot key's rows now
spread over n_salts shuffle partitions instead of one. Row multiplication
happens only on the SMALL side (n_salts×|small|), which is the knob that
keeps this cheap.

The salt uses `F.rand(seed)` — per-row uniform, independent of the data,
so result *sets* are identical to the unsalted join (asserted in
tests/test_skew.py) while the partition histogram flattens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__nvss_salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    n_salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Equi-join `large ⋈ small` on `on`, salted against skew in `large`.

    `small` is replicated n_salts× (keep it the dimension side). Supports
    the join types where replication is sound for the small side:
    inner / left (left = the large side). Result columns match
    `large.join(small, on, how)`.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)

    salted_large = large.withColumn(
        SALT_COL, (F.rand(seed) * n_salts).cast("int")
    )
    salted_small = small.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )
    out = salted_large.join(salted_small, keys + [SALT_COL], how)
    return out.drop(SALT_COL)
