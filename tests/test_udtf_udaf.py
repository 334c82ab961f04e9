"""§2.9 UDF/UDAF/UDTF surface — the escape hatches exist and agree
with the native-expression fast paths (which remain the hot-path
default; see README 'UDFs are the slow path')."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from iotstream.ext.text import ngram_counts
from iotstream.schemas import load_table
from tests.conftest import SF_DIR


@udtf(returnType="ngram: string")
class BigramUDTF:
    """Row-at-a-time table function: text → one row per bigram.
    Demo of the UDTF surface; the production kernel is the
    index-explode expression in ext/text.py (codegen, no Python)."""

    def eval(self, text: str):
        toks = text.split(" ")
        for a, b in zip(toks, toks[1:]):
            yield (f"{a} {b}",)


def test_udtf_matches_expression_kernel(spark):
    docs = load_table(spark, SF_DIR, "documents")
    docs.createOrReplaceTempView("docs_udtf")
    spark.udtf.register("bigrams", BigramUDTF)
    got = spark.sql(
        "SELECT ngram, count(*) AS cnt FROM docs_udtf, "
        "LATERAL bigrams(text) GROUP BY ngram HAVING count(*) >= 5"
    )
    want = ngram_counts(docs, n=2, min_count=5)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_grouped_agg_pandas_udaf_matches_sql_formulation(spark):
    import numpy as np

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        return float(np.exp(np.log(v[v > 0]).mean()))

    ev = load_table(spark, SF_DIR, "events")
    got = {
        r["event_type"]: r["g"]
        for r in ev.groupBy("event_type")
        .agg(F.round(geo_mean("value"), 6).alias("g"))
        .collect()
    }
    want = {
        r["event_type"]: r["g"]
        for r in ev.filter(F.col("value") > 0)
        .groupBy("event_type")
        .agg(F.round(F.exp(F.avg(F.log("value"))), 6).alias("g"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-4, (k, got[k], want[k])
