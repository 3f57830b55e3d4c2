"""Hierarchy traversal via pointer doubling (the recursive-CTE class)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_wsi_spark.operators.graph import resolve_roots


def test_deep_chain_resolves_logarithmically(spark):
    """A 500-node single chain (depth 499) must resolve well inside the
    40-round cap — pointer doubling needs ceil(log2(500)) = 9 rounds, a
    naive per-level walk would need 499."""
    nodes = spark.range(1, 501).select(
        F.col("id"),
        F.when(F.col("id") > 1, F.col("id") - 1).alias("parent"))
    out = {r["id"]: (r["root"], r["depth"])
           for r in resolve_roots(nodes, max_rounds=12).collect()}
    assert out[1] == (1, 0)
    assert out[2] == (1, 1)
    assert out[500] == (1, 499)
    assert all(root == 1 and depth == i - 1
               for i, (root, depth) in out.items())


def test_forest_multiple_roots(spark):
    # two trees: 1 <- 2 <- 4, 3 <- 5; roots 1 and 3
    rows = [(1, None), (2, 1), (3, None), (4, 2), (5, 3)]
    nodes = spark.createDataFrame(rows, "id long, parent long")
    out = sorted(map(tuple, resolve_roots(nodes).collect()))
    assert out == [(1, 1, 0), (2, 1, 1), (3, 3, 0), (4, 1, 2), (5, 3, 1)]
