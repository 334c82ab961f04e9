"""Data-quality gate — declarative rule checks producing a violations
report, the admission-control pass a training-data pipeline runs before
anything enters the corpus.

One scan, one global aggregate: every predicate rule compiles to a
conditional sum in a single pass (map-side partial agg → one row), then
unpivots to (rule, n_violations) via ``stack``. Uniqueness is the one
rule that genuinely needs a distinct aggregate; it shares the same
pass. At 100 TB this is a full scan but zero extra shuffles — the
cheapest possible shape for a corpus-wide audit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dq_report(
    df: DataFrame,
    rules: dict[str, Column],
    unique_key: str | None = None,
) -> DataFrame:
    """Count violations of each predicate rule (predicate == True means
    the row VIOLATES the rule), plus an optional duplicate-key rule."""
    aggs = [
        F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(name)
        for name, pred in rules.items()
    ]
    names = list(rules)
    if unique_key is not None:
        aggs.append(
            (F.count(unique_key) - F.count_distinct(F.col(unique_key)))
            .cast("long")
            .alias(f"duplicate_{unique_key}")
        )
        names.append(f"duplicate_{unique_key}")
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{n}', {n}" for n in names)
    return wide.selectExpr(
        f"stack({len(names)}, {stack}) AS (rule, n_violations)"
    )


#: The standard rule set for the events table (thresholds chosen so
#: some rules fire on the fixtures — a gate that never fires is
#: untested by definition).
def events_rules() -> dict[str, Column]:
    return {
        "null_user_id": F.col("user_id").isNull(),
        "value_out_of_range": (F.col("value") < 0) | (F.col("value") > 340),
        "unknown_event_type": ~F.col("event_type").isin(
            "click", "view", "purchase", "error", "signup"
        ),
        "stale_timestamp": (F.col("ts") < F.lit("2024-01-01").cast("timestamp"))
        | (F.col("ts") >= F.lit("2027-01-01").cast("timestamp")),
    }
