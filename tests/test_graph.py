"""Connected components: closure over chains, singleton handling,
convergence on known topologies."""

from __future__ import annotations

from pyspark.sql import functions as F

from iotstream.ext.graph import connected_components


def _cc(spark, edges, nodes):
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    n = spark.createDataFrame([(x,) for x in nodes], "node bigint")
    out = connected_components(e, n)
    return {r["node"]: r["cluster_id"] for r in out.collect()}


def test_chain_collapses_to_one_cluster(spark):
    # a-b, b-c, c-d: no direct a-d edge, transitive closure must link them
    got = _cc(spark, [(1, 2), (2, 3), (3, 4)], [1, 2, 3, 4, 9])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 9: 9}


def test_two_components_and_singletons(spark):
    got = _cc(spark, [(10, 11), (12, 13), (13, 14)], [10, 11, 12, 13, 14, 20, 21])
    assert got[10] == got[11] == 10
    assert got[12] == got[13] == got[14] == 12
    assert got[20] == 20 and got[21] == 21


def test_long_chain_needs_multiple_rounds(spark):
    # 0-1-2-...-9: diameter 9, exercises the iteration loop (label of
    # node 9 must travel the whole chain)
    edges = [(i, i + 1) for i in range(9)]
    got = _cc(spark, edges, list(range(10)))
    assert set(got.values()) == {0}
