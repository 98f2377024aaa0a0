"""Temporal operators Spark lacks as built-ins, re-expressed as
compositions of native ops.

``asof_join`` — for every left row, the single most recent right row
with ``ts_right <= ts_left`` per key (event attribution, price
lookups, sensor alignment).  Spark has no ASOF JOIN; the naive
range-join (`l JOIN r ON key AND r.ts <= l.ts` + keep-max) explodes to
the full per-key cross product before pruning.  This implementation is
the scalable composition:

    union both sides (right rows sort BEFORE left rows at equal ts)
    → one window per key ordered by (ts, side, tiebreak)
    → last(right_payload, ignorenulls=True) carry-forward
    → keep left rows

ONE shuffle on the key, zero row amplification, whole-stage codegen
throughout — the plan a 100 TB event table needs.  The DuckDB oracle
is the genuinely independent twin: its NATIVE ``ASOF JOIN`` operator
(a different algorithm entirely — per-key binary search).

No reference analog; graft addition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key_cols: list[str],
              ts_col: str, payload_cols: list[str],
              tiebreak_col: str | None = None,
              prefix: str = "r_") -> DataFrame:
    """Backward as-of join: left columns + ``prefix``-named right
    payload columns from the latest right row with
    ``right.ts_col <= left.ts_col`` per key (nulls when no such row).

    ``tiebreak_col`` orders right rows sharing a (key, ts) — the
    LARGEST tiebreak wins, deterministically; pass one whenever
    (key, ts) is not unique on the right."""
    r_order = [ts_col, "_side"] + ([tiebreak_col] if tiebreak_col else [])
    r = right.select(
        *key_cols,
        F.col(ts_col),
        *([F.col(tiebreak_col)] if tiebreak_col else []),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_r"),
        F.lit(0).alias("_side"),
    )
    left_cols = left.columns
    l = left.select(
        *left_cols,
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
        F.lit(1).alias("_side"),
    )
    # align: right rows carry only key/ts/tiebreak/_r/_side; left rows
    # carry everything — union on the superset with nulls on the right
    for c in left_cols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    if tiebreak_col and tiebreak_col not in left_cols:
        l = l.withColumn(tiebreak_col, F.lit(None).cast(dict(right.dtypes)[tiebreak_col]))
    cols = [*left_cols] + ([tiebreak_col] if tiebreak_col and tiebreak_col not in left_cols else []) + ["_r", "_side"]
    u = l.select(*cols).unionByName(r.select(*cols))
    w = (Window.partitionBy(*key_cols).orderBy(*[F.col(c) for c in r_order])
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = u.withColumn("_carry", F.last("_r", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).select(
        *left_cols,
        *[F.col(f"_carry.{c}").alias(f"{prefix}{c}") for c in payload_cols],
    )
    return out
