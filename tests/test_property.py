"""Property-based checks (hypothesis): the engine's predicates and
rewrites hold over randomized inputs, not just fixture shapes."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

readings = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=120),   # temperature
        st.integers(min_value=0, max_value=150),   # humidity
    ),
    min_size=1,
    max_size=60,
)


def _ref_keep(t: float, h: float) -> bool:
    # the reference predicate (StreamProcessor.java:61-78): DROP iff
    # empty reading (0,0) OR out-of-range (t>=50 AND h>=100)
    return not ((t == 0 and h == 0) or (t >= 50 and h >= 100))


@given(readings)
@SLOW
def test_validity_filter_matches_reference_predicate(spark, rows):
    from iotstream.operators.filters import is_valid

    df = spark.createDataFrame(
        [(i, float(t), float(h)) for i, (t, h) in enumerate(rows)],
        "i long, temperature double, humidity double",
    ).select(
        "i",
        F.struct(
            F.col("temperature"), F.col("humidity")
        ).alias("metrics"),
    )
    kept = {r.i for r in df.filter(is_valid()).collect()}
    expect = {i for i, (t, h) in enumerate(rows) if _ref_keep(t, h)}
    assert kept == expect


@given(
    st.lists(st.integers(min_value=0, max_value=8), min_size=1, max_size=80),
    st.integers(min_value=2, max_value=5),
)
@SLOW
def test_salted_join_equals_plain_join(spark, keys, buckets):
    from iotstream.ext.skew import salted_join

    fact = spark.createDataFrame(
        [(k, i) for i, k in enumerate(keys)], "k long, fact_id long"
    )
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(0, 9, 2)], "k long, label string"
    )
    plain = sorted(
        (r.k, r.fact_id, r.label) for r in fact.join(dim, "k").collect()
    )
    salted = sorted(
        (r.k, r.fact_id, r.label)
        for r in salted_join(fact, dim, "k", buckets=buckets).collect()
    )
    assert salted == plain
