"""Skew-handling join strategies for the 100 TB regime.

A shuffled join on a skewed key funnels the hot key's rows through one
reducer; at 1000 executors that one task dominates the stage. Two
remedies, composable with everything else in dataops:

  * AQE skew-join splitting (on by default in session.py) — handles
    skew Spark can SEE (post-shuffle partition sizes).
  * Explicit salting (this module) — handles skew you know about up
    front, works for any join shape AQE can't split (e.g. when the
    skewed side feeds an aggregation on the same key and you want to
    keep one shuffle).

Salting is result-neutral: the skewed side gets a uniform salt in
[0, S); the other side is replicated S× with every salt value; the
equi-join on (key, salt) then produces exactly the plain join's rows,
with the hot key spread over S reducers. The replication cost is
S × |small side| — pick S ≈ observed hot-key multiplicity / target
rows-per-task, and keep the replicated side the SMALL one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    salt: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the skewed side salted and `other` replicated.

    `how` supports 'inner' and 'left' (left = skewed side preserved —
    the shapes where per-row salting keeps semantics exact; for right/
    full joins flip the operands). Output columns = skewed's then
    other's non-key columns, like a plain df.join(other, on, how).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    keys = [on] if isinstance(on, str) else list(on)
    s = skewed.withColumn("__salt", (F.rand(seed) * salt).cast("int"))
    o = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>"))
    )
    out = s.join(o, keys + ["__salt"], how)
    return out.drop("__salt")
