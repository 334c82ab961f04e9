"""Skew-aware join — explicit salting for hot keys.

AQE's skew-join handling (``spark.sql.adaptive.skewJoin.*``) splits
oversized SORT-MERGE partitions at runtime and is the first line of
defense. Salting is the explicit fallback for the cases AQE can't fix:
a broadcast-ineligible dimension joined on a key where one value holds
a double-digit share of all rows (the "null key" / "default tenant" /
"hottest sensor" pattern). Mechanism:

- fact side: append a random salt in [0, buckets) to the join key;
- dim side: explode each row into all ``buckets`` salted copies;
- equi-join on (key, salt) → the hot key's rows spread over ``buckets``
  reducers instead of one straggler task.

Dim-side blowup is ×buckets, so salt ONLY the keys that need it: pass
``hot_keys`` (from a cheap pre-aggregation or prior run's metrics) and
everything else joins unsalted, then the two results union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    buckets: int = 16,
    hot_keys: list | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` ⋈ ``dim`` on ``key`` with salting. If ``hot_keys``
    is given, only those keys are salted (dim blowup limited to the hot
    rows); otherwise every key is salted. Result columns = fact's then
    dim's non-key columns, exactly like ``fact.join(dim, key)``."""
    salt = F.floor(F.rand(seed=42) * buckets).cast("int")
    if hot_keys is None:
        f = fact.withColumn("__salt", salt)
        d = dim.withColumn(
            "__salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
        )
        return f.join(d, [key, "__salt"], how).drop("__salt")
    hot = F.col(key).isin(hot_keys)
    out_hot = salted_join(fact.filter(hot), dim.filter(hot), key, buckets, None, how)
    out_cold = fact.filter(~hot).join(dim.filter(~hot), key, how)
    return out_hot.unionByName(out_cold)


def key_histogram(df: DataFrame, key: str, top: int = 20) -> DataFrame:
    """The cheap pre-pass that finds candidates for ``hot_keys``: top-N
    key frequencies with their share of all rows. One partial-agg
    shuffle; run it on a sample at extreme scale.

    The denominator is a scalar agg broadcast back onto the counts
    table — NOT an unpartitioned window, which would collapse the
    whole distinct-key table (billions of rows for a user-id key at
    corpus scale) into one task to compute a single number."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share", F.round(F.col("n") / F.col("__total"), 6))
        .drop("__total")
        .orderBy(F.desc("n"), F.asc(key))
        .limit(top)
    )
