"""Skew-resistant join strategies.

The reference joins nothing bigger than a 510-row lookup
(/root/reference/cianparser/constants.py:233-758 consumed as a dict);
at warehouse scale the engine's fact⋈fact joins shuffle on their keys,
and a hot key (one mega-order, one mega-domain) turns a 1000-executor
shuffle into one straggler task.  ``salted_join`` is the classic
remedy, packaged so the salt never leaks into results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                fact_unique_cols: list[str], buckets: int = 16,
                how: str = "inner") -> DataFrame:
    """Equi-join that survives a skewed ``key``: every fact row gets a
    deterministic salt (xxhash64 of its unique columns mod ``buckets``)
    and the dim side is replicated ``buckets``× with an exploded salt
    column, so the shuffle spreads a hot key over ``buckets`` reducer
    partitions instead of one straggler.

    Result is EXACTLY the plain join (salt is an internal column,
    dropped on return) — the contract query's oracle is the unsalted
    SQL join, so the driver checks the equivalence end-to-end.

    Use when BOTH sides are too big to broadcast and a key is hot; for
    a small dim prefer ``F.broadcast``; with AQE's skew-join handling
    this is the manual fallback for deterministic plans / non-AQE
    engines.  Cost model: dim shuffle volume × ``buckets`` (the price
    of balance), fact volume unchanged.  Deterministic: the salt is a
    pure function of the fact row, never ``rand()`` — re-runs,
    retries, and speculative tasks agree (a rand() salt breaks
    exactly-once on stage retry, the classic silent-dup bug)."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        # right/full joins would emit every unmatched dim row once PER
        # REPLICA — a silent buckets× duplication
        raise ValueError(f"salted_join supports fact-preserving joins only, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact_unique_cols]),
                  F.lit(buckets)).cast("int")
    f = fact.withColumn("_salt", salt)
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
    d = d.withColumn("_salt", F.col("_salt").cast("int"))
    return f.join(d, [key, "_salt"], how).drop("_salt")
