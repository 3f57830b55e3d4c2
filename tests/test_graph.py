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


def _und(spark, pairs):
    e = spark.createDataFrame(pairs, "src long, dst long")
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return e.unionByName(rev)


def test_bfs_hops_on_cycle_with_chord(spark):
    from mapreduce_wsi_spark.operators.graph import bfs_hops

    # 6-cycle 1-2-3-4-5-6-1 plus chord 2-5: cycles must terminate and
    # the chord must shorten 1->5 to 2 hops (via 2), 1->4 to 3 hops.
    edges = _und(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 1),
                         (2, 5)])
    got = {r["id"]: r["hops"] for r in bfs_hops(edges, 1).collect()}
    assert got == {1: 0, 2: 1, 6: 1, 3: 2, 5: 2, 4: 3}


def test_bfs_unreachable_nodes_absent(spark):
    from mapreduce_wsi_spark.operators.graph import bfs_hops

    edges = _und(spark, [(1, 2), (10, 11)])
    got = {r["id"] for r in bfs_hops(edges, 1).collect()}
    assert got == {1, 2}


def test_triangle_count_known_graph(spark, sf_oracle):
    """Catalog triangle_count equals the known sf0.01 structure and the
    builder blocks double counting (each triangle once as lo<mid<hi)."""
    from mapreduce_wsi_spark.plans.registry import load_catalog

    row = load_catalog()["triangle_count"].fn(spark, sf_oracle).collect()[0]
    # support counts DISTINCT orders (a part on two lineitems of one
    # order contributes once): 3445 edges / 61 triangles at sf0.01
    assert row["n_edges"] == 3445
    assert row["n_triangles"] == 61
    assert 0 < row["n_nodes"] <= 2000


def _pagerank_ref(edges, n_iter=3, scale=10**12):
    """Independent pure-Python twin of the pagerank_fixed integer
    recurrence (same semantics: nodes = ids with outdeg >= 1)."""
    from collections import defaultdict

    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    n = len(deg)
    u0 = scale // n
    pr = {v: u0 for v in deg}
    for _ in range(n_iter):
        inc = defaultdict(int)
        for s, d in edges:
            if d in deg:
                inc[d] += pr[s] // deg[s]
        pr = {v: (15 * u0) // 100 + (85 * inc.get(v, 0)) // 100
              for v in deg}
    return pr


def test_pagerank_fixed_matches_reference_on_random_graphs(spark):
    """Bit-exact equality with the pure-Python integer recurrence on
    seeded random undirected graphs — the fixed-point claim is 'any
    engine reproduces this', so a second independent implementation must
    agree to the last unit."""
    import random

    from mapreduce_wsi_spark.operators.graph import pagerank_fixed

    for seed in (7, 42, 99):
        rng = random.Random(seed)
        und = {(a, b) for _ in range(60)
               for a, b in [sorted(rng.sample(range(20), 2))]}
        edges = [(a, b) for a, b in und] + [(b, a) for a, b in und]
        df = spark.createDataFrame(edges, "src bigint, dst bigint") \
            .repartition(5)
        got = {r["id"]: r["pr"]
               for r in pagerank_fixed(df, n_iter=3).collect()}
        assert got == _pagerank_ref(edges), f"seed {seed}"


def test_pagerank_star_center_dominates(spark):
    """Sanity on the structure: the hub of a star graph outranks every
    leaf, and total mass stays <= SCALE (floor division only loses)."""
    from mapreduce_wsi_spark.operators.graph import (
        PAGERANK_SCALE,
        pagerank_fixed,
    )

    star = [(0, i) for i in range(1, 9)] + [(i, 0) for i in range(1, 9)]
    df = spark.createDataFrame(star, "src bigint, dst bigint")
    pr = {r["id"]: r["pr"] for r in pagerank_fixed(df, n_iter=3).collect()}
    assert pr[0] > max(pr[i] for i in range(1, 9))
    assert sum(pr.values()) <= PAGERANK_SCALE


def test_lpa_respects_density_where_components_merge(spark):
    """Two triangles joined by ONE bridge edge: connected components
    merges them into one cluster; 2-round LPA keeps two communities —
    the density-awareness that makes LPA a different operator."""
    from mapreduce_wsi_spark.operators.dedup import connected_components
    from mapreduce_wsi_spark.operators.graph import (
        label_propagation_communities,
    )

    und = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in und] + [(b, a) for a, b in und],
        "src bigint, dst bigint")
    # 3 rounds: synchronous LPA needs the extra round for the bridge
    # node's label to settle (2-round states still oscillate there)
    lpa = {r["id"]: r["community"]
           for r in label_propagation_communities(edges,
                                                  n_rounds=3).collect()}
    assert lpa[1] == lpa[2] == lpa[3]
    assert lpa[4] == lpa[5] == lpa[6]
    assert lpa[1] != lpa[4]
    pairs = spark.createDataFrame([(a, b) for a, b in und],
                                  "doc_a bigint, doc_b bigint")
    comp = {r["id"]: r["comp"]
            for r in connected_components(pairs).collect()}
    assert len(set(comp.values())) == 1  # components see one blob


def test_lpa_directed_keeps_nodes_without_incoming_edges(spark):
    """On a DIRECTED edge list a src-only node has no incoming labels;
    it must keep its own label each round, not vanish from the output.
    Node 9 points into the triangle but nothing points back at it."""
    from mapreduce_wsi_spark.operators.graph import (
        label_propagation_communities,
    )

    und = [(1, 2), (2, 3), (1, 3)]
    directed = ([(a, b) for a, b in und] + [(b, a) for a, b in und]
                + [(9, 1)])
    edges = spark.createDataFrame(directed, "src bigint, dst bigint")
    lpa = {r["id"]: r["community"]
           for r in label_propagation_communities(edges,
                                                  n_rounds=2).collect()}
    assert set(lpa) == {1, 2, 3, 9}      # nobody dropped
    assert lpa[9] == 9                   # no incoming -> keeps own label
    assert lpa[1] == lpa[2] == lpa[3]


def test_hits_ranks_hubs_and_authorities(spark):
    """On 1->{10,11,12}, 2->{10,11}, 3->{10}: node 10 is the top
    authority (in-degree 3, fed by the best hub), node 1 the top hub;
    max-normalization pins both maxima at exactly SCALE; pure
    authorities have hub 0 and vice versa."""
    from mapreduce_wsi_spark.operators.graph import HITS_SCALE, hits_fixed

    e = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11), (3, 10)],
        "src long, dst long")
    got = {r["id"]: r for r in hits_fixed(e, n_iter=2).collect()}
    assert got[10]["auth"] == HITS_SCALE
    assert got[1]["hub"] == HITS_SCALE
    assert got[10]["auth"] > got[11]["auth"] > got[12]["auth"] > 0
    assert got[1]["hub"] > got[2]["hub"] > got[3]["hub"] > 0
    assert all(got[i]["hub"] == 0 for i in (10, 11, 12))
    assert all(got[i]["auth"] == 0 for i in (1, 2, 3))


def test_kcore_peels_pendant_chain(spark):
    """Triangle {1,2,3} + pendant chain 3-4-5: the 2-core is exactly
    the triangle — removing 5 (degree 1) exposes 4, so the peel needs
    a second round; a 1-round cap must raise, not return the
    half-peeled set."""
    import pytest as _pytest
    from mapreduce_wsi_spark.operators.graph import kcore_nodes
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "lo int, hi int")
    got = sorted(r["id"] for r in kcore_nodes(e, k=2).collect())
    assert got == [1, 2, 3]
    with _pytest.raises(RuntimeError, match="converge"):
        kcore_nodes(e, k=2, max_rounds=2)


def test_link_prediction_square_and_path(spark):
    """Square 1-2-3-4-1: both diagonals score common=2 with Jaccard 1.0
    (neighborhoods identical); adjacent pairs never appear (anti-join);
    an attached path 4-5 predicts (3,5) and (1,5) with common=1."""
    from mapreduce_wsi_spark.operators.graph import link_prediction_topk
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4), (4, 5)], "lo int, hi int")
    rows = {(r["u"], r["v"]): (r["common"], r["union_size"], r["jaccard"])
            for r in link_prediction_topk(e, top_k=10).collect()}
    assert rows[(1, 3)] == (2, 2, 1.0)
    assert rows[(2, 4)][0] == 2
    assert (1, 2) not in rows and (4, 5) not in rows
    # N(3) = {2,4}, N(5) = {4}: common 1, union 2
    assert rows[(3, 5)] == (1, 2, 0.5)


def test_personalized_pagerank_localizes_to_seeds(spark):
    """Two disconnected triangles; seed set = {1}. All rank mass must
    stay in triangle {1,2,3}: the other component's nodes get exactly
    0 (integer arithmetic — no epsilon), the seed outranks its
    neighbors, and neighbors of the seed split the rest equally."""
    from pyspark.sql import functions as F
    from mapreduce_wsi_spark.operators.graph import (
        personalized_pagerank_fixed)
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)],
        "lo int, hi int")
    both = (e.select(F.col("lo").alias("src"), F.col("hi").alias("dst"))
            .unionByName(e.select(F.col("hi").alias("src"),
                                  F.col("lo").alias("dst"))))
    got = {r["id"]: r["pr"]
           for r in personalized_pagerank_fixed(
               both, lambda c: c == 1, n_iter=3).collect()}
    assert got[10] == 0 and got[11] == 0 and got[12] == 0
    assert got[1] > got[2] == got[3] > 0


def test_degree_orientation_bounds_hub_wedges(spark):
    """VERDICT r9 ask #3: a power-law hub must not emit ~deg^2 wedge
    candidates. Planted melt case for the old (lo<hi) chain form: hub
    id 500 with 100 lower-id and 100 higher-id spokes — the chain join
    e1=(a,hub) x e2=(hub,c) would emit 100*100 = 10,000 candidates.
    Degree orientation points every spoke edge INTO the hub (spoke
    degree 1-2 < hub degree 200), so the hub's out-degree is 0 and the
    only wedges come from the three planted triangles. Count must be
    unchanged."""
    from pyspark.sql import functions as F
    from mapreduce_wsi_spark.operators.graph import (
        degree_oriented_edges, oriented_wedges, triangle_count_oriented)

    hub = 500
    lows = [(i, hub) for i in range(100)]            # lo < hi holds
    highs = [(hub, 1000 + i) for i in range(100)]
    tri = [(0, 1), (2, 3), (1000, 1001)]             # close 3 triangles
    e = spark.createDataFrame(lows + highs + tri, "lo long, hi long")

    # old chain form: wedges a<hub<c through the hub
    ab = e.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    bc = e.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    old_wedges = ab.join(bc, "b").count()
    assert old_wedges >= 10_000  # the melt the orientation removes

    o = degree_oriented_edges(e)
    new_wedges = oriented_wedges(o).count()
    assert new_wedges <= 10  # 3 true wedges + nothing hub-quadratic

    # out-degree bound: the hub emits nothing; no node exceeds its
    # arboricity-grade fan-out
    outdeg = {r["src"]: r["n"] for r in
              o.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert hub not in outdeg
    assert max(outdeg.values()) <= 2

    assert triangle_count_oriented(e).collect()[0]["n_triangles"] == 3


def test_oriented_triangles_match_chain_form_on_random_graphs(spark):
    """Orientation changes candidate volume, never the count: on random
    graphs the degree-oriented count equals the (lo<hi) chain-join
    count (the old implementation, inlined here as the reference)."""
    import random

    from pyspark.sql import functions as F
    from mapreduce_wsi_spark.operators.graph import triangle_count_oriented

    rng = random.Random(7)
    for trial in range(3):
        pairs = sorted({tuple(sorted(rng.sample(range(30), 2)))
                        for _ in range(80)})
        e = spark.createDataFrame(pairs, "lo long, hi long")
        ab = e.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
        bc = e.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
        ac = e.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
        chain = ab.join(bc, "b").join(ac, ["a", "c"]).count()
        got = triangle_count_oriented(e).collect()[0]["n_triangles"]
        assert got == chain, f"trial {trial}: {got} != {chain}"
