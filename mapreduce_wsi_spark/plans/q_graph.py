"""Graph analytics over a derived co-purchase graph (SURVEY §2-adjacent:
the iterative/self-join query class a reference user would script as
repeated map/reduce rounds — reference: src/MapReduceWSIImpl.java:89-115
runs arbitrary client programs per pass).

Graph: nodes = parts, an undirected edge between two parts iff they
co-occur in >= 2 DISTINCT orders (the support threshold prunes the
quadratic long tail of one-off pairs before any downstream graph op —
at sf0.01 that is 3,445 edges over 1,880 parts with 61 triangles, a
genuinely sparse structure). Basket-size capping (the other co-occurrence
explosion guard) is available on the operator but unused here: fixture
baskets max out at 13 lines.

Scale posture: the pair builder is an equi-join on l_orderkey (shuffle
on the natural key, partial-agg counts); triangles use degree-based
orientation (low-degree -> high-degree; r10) so per-node wedge fan-out
is O(sqrt(m)) even on a power-law hub; BFS is frontier-based with
localCheckpoint per round — work per round is O(frontier x degree),
not O(V).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_wsi_spark.operators.graph import bfs_hops
from mapreduce_wsi_spark.plans.registry import register, tbl
from mapreduce_wsi_spark.util import iter_checkpoint

# Shared CTE text: the support->=2 part co-purchase edge list (lo < hi).
# Support counts DISTINCT orders — a part listed on two lineitems of the
# same order contributes one co-occurrence, matching the documented
# "co-occur in >= 2 orders" semantics exactly.
_EDGES_CTE = """
    SELECT a.l_partkey AS lo, b.l_partkey AS hi
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY lo, hi HAVING count(DISTINCT a.l_orderkey) >= 2
"""


def part_edges(li: DataFrame, min_support: int = 2,
               max_basket: int | None = None) -> DataFrame:
    """(lo, hi, n) part pairs co-occurring in >= min_support DISTINCT
    orders, lo < hi — n counts orders, not lineitem pairs, so a part
    appearing on two lineitems of one order isn't double-counted.
    max_basket (unused by the catalog entries — fixture baskets are
    <= 13 lines) caps the per-order line count before the self-join,
    the production guard against quadratic blowup on pathological
    baskets."""
    if max_basket is not None:
        ok = (li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("__n"))
              .filter(F.col("__n") <= max_basket).select("l_orderkey"))
        li = li.join(ok, "l_orderkey")
    # distinct (order, part) BEFORE the self-join: each pair then occurs
    # once per order, so a plain count equals the distinct-order support —
    # cheaper than count(DISTINCT) after the join (no expand, and the
    # quadratic self-join input shrinks)
    pp = li.select("l_orderkey", "l_partkey").distinct()
    a = pp.select("l_orderkey", F.col("l_partkey").alias("lo"))
    b = pp.select("l_orderkey", F.col("l_partkey").alias("hi"))
    return (a.join(b, "l_orderkey").filter(F.col("lo") < F.col("hi"))
            .groupBy("lo", "hi").agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= min_support))


@register(
    "copurchase_pairs_topk",
    oracle="""
    WITH pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(DISTINCT a.l_orderkey) AS n
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY part_a, part_b
    )
    SELECT part_a, part_b, n FROM pairs
    ORDER BY n DESC, part_a, part_b LIMIT 20
    """,
    note="market-basket co-purchase: self-join on the basket key, "
         "distinct-order pair support (not lineitem-pair multiplicity), "
         "top-20 by the total order (n DESC, part_a, part_b) so the "
         "LIMIT is deterministic and lowers to TakeOrderedAndProject")
def copurchase_pairs_topk(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    pairs = part_edges(li, min_support=1) \
        .select(F.col("lo").alias("part_a"), F.col("hi").alias("part_b"), "n")
    return pairs.orderBy(F.col("n").desc(), "part_a", "part_b").limit(20)


@register(
    "triangle_count",
    oracle=f"""
    WITH e AS ({_EDGES_CTE})
    SELECT
        CAST((SELECT count(*) FROM (SELECT lo AS s FROM e
                                    UNION SELECT hi FROM e)) AS BIGINT)
            AS n_nodes,
        CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
        CAST((SELECT count(*)
              FROM e e1
              JOIN e e2 ON e2.lo = e1.hi
              JOIN e e3 ON e3.lo = e1.lo AND e3.hi = e2.hi) AS BIGINT)
            AS n_triangles
    """,
    note="triangle counting on the support>=2 co-purchase graph via "
         "DEGREE-BASED orientation (Chiba-Nishizeki / Suri-"
         "Vassilvitskii; VERDICT r9 ask #3): edges re-oriented "
         "low-degree -> high-degree (tie: smaller id), wedges = "
         "out-neighbor pairs of each pivot, closed by one equi-join. "
         "Every out-degree is O(sqrt(m)) by construction, so a "
         "power-law hub emits O(m) candidates instead of the "
         "(lo<hi) chain form's #lower x #higher ~ deg^2 — same count, "
         "bounded wedge space (graph.triangle_count_oriented; the "
         "planted-hub bound is pinned in tests/test_graph.py). Edge "
         "list localCheckpointed so the stat reads don't recompute "
         "the pair aggregation")
def triangle_count(spark, sf_dir):
    from mapreduce_wsi_spark.operators.graph import triangle_count_oriented
    li = tbl(spark, sf_dir, "lineitem")
    e = iter_checkpoint(part_edges(li).select("lo", "hi"))
    n_nodes = (e.select(F.col("lo").alias("s"))
               .unionByName(e.select(F.col("hi").alias("s"))).distinct()
               .agg(F.count(F.lit(1)).alias("n_nodes")))
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    n_tri = triangle_count_oriented(e)
    return n_nodes.crossJoin(n_edges).crossJoin(n_tri)


@register(
    "graph_bfs_hops",
    oracle=f"""
    WITH RECURSIVE e AS ({_EDGES_CTE}
    ), und AS (
        SELECT lo AS src, hi AS dst FROM e
        UNION ALL
        SELECT hi AS src, lo AS dst FROM e
    ), bfs AS (
        SELECT (SELECT min(lo) FROM e) AS id, 0 AS hops
        UNION
        SELECT u.dst, bfs.hops + 1
        FROM bfs JOIN und u ON u.src = bfs.id
        WHERE bfs.hops < 20
    )
    SELECT id, CAST(min(hops) AS BIGINT) AS hops
    FROM bfs GROUP BY id
    """,
    note="BFS hop distance from the smallest node over the undirected "
         "support>=2 co-purchase graph (cyclic — the recursive-CTE "
         "class resolve_roots cannot express). Frontier BFS, "
         "O(diameter) rounds, localCheckpoint per round; the 1-row "
         "min-node collect is the only driver-side value. Oracle is "
         "DuckDB's honest WITH RECURSIVE UNION twin")
def graph_bfs_hops(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    e = iter_checkpoint(part_edges(li).select("lo", "hi"))
    und = (e.select(F.col("lo").alias("src"), F.col("hi").alias("dst"))
           .unionByName(
               e.select(F.col("hi").alias("src"), F.col("lo").alias("dst"))))
    source = e.agg(F.min("lo")).collect()[0][0]  # 1 row, like jdbc bounds
    return bfs_hops(und, source).select(
        "id", F.col("hops").cast("bigint").alias("hops"))


@register(
    "entity_resolution_pipeline",
    oracle="""
    WITH RECURSIVE d AS (
        SELECT doc_id, lang, source, substr(text, 1, 4) AS blk,
               substr(text, 1, 24) AS prefix
        FROM documents
    ), p AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM d a JOIN d b
          ON a.lang = b.lang AND a.source = b.source AND a.blk = b.blk
         AND a.doc_id < b.doc_id
        WHERE levenshtein(a.prefix, b.prefix) <= 12
    ), edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM p
        UNION SELECT doc_b, doc_a FROM p
    ), reach AS (
        SELECT DISTINCT src AS id, src AS r FROM edges
        UNION
        SELECT e.dst AS id, reach.r AS r
        FROM reach JOIN edges e ON e.src = reach.id
    ), comp AS (
        SELECT id, min(r) AS comp FROM reach GROUP BY id
    )
    SELECT doc_id, COALESCE(comp.comp, doc_id) AS canon_id,
           (COALESCE(comp.comp, doc_id) = doc_id) AS is_survivor
    FROM documents LEFT JOIN comp ON comp.id = documents.doc_id
    """,
    note="end-to-end entity resolution: blocked fuzzy join "
         "(join_fuzzy_levenshtein's plan) -> connected components "
         "(min-label propagation) -> every document mapped to its "
         "cluster-canonical id, singletons to themselves. The "
         "record-linkage composition a reference user would run as "
         "three hand-rolled MR passes; oracle replays it as one "
         "recursive-CTE closure")
def entity_resolution_pipeline(spark, sf_dir):
    from mapreduce_wsi_spark.operators.dedup import connected_components
    from mapreduce_wsi_spark.plans.q_extras import join_fuzzy_levenshtein

    docs = tbl(spark, sf_dir, "documents").select("doc_id")
    pairs = join_fuzzy_levenshtein(spark, sf_dir)
    comp = connected_components(pairs)
    canon = F.coalesce(F.col("comp"), F.col("doc_id"))
    return (docs.join(comp, docs["doc_id"] == comp["id"], "left")
            .select("doc_id", canon.alias("canon_id"),
                    (canon == F.col("doc_id")).alias("is_survivor")))


def _pagerank_oracle(n_iter: int = 3) -> str:
    """Unrolled fixed-point PageRank twin: DuckDB has no iterative UPDATE,
    so the constant iteration count unrolls into chained CTEs — every
    arithmetic step is BIGINT floor division, so both engines agree
    bit-for-bit (operators/graph.py::pagerank_fixed documents the rule).
    DuckDB sums BIGINT into HUGEINT; each sum is cast straight back
    (values stay < 2^53, the driver hash is type-aware)."""
    s = 1_000_000_000_000
    parts = [f"""
    e0 AS ({_EDGES_CTE}),
    e AS (SELECT lo AS src, hi AS dst FROM e0
          UNION ALL SELECT hi AS src, lo AS dst FROM e0),
    deg AS (SELECT src AS id, count(*) AS deg FROM e GROUP BY 1),
    u AS (SELECT CAST({s} AS BIGINT) // count(*) AS u0 FROM deg),
    p0 AS (SELECT id, deg, u0, u0 AS pr FROM deg, u)"""]
    for i in range(1, n_iter + 1):
        parts.append(f"""
    s{i} AS (SELECT e.dst AS id, CAST(sum(p.pr // p.deg) AS BIGINT) AS m
             FROM e JOIN p{i - 1} p ON p.id = e.src GROUP BY 1),
    p{i} AS (SELECT p.id, p.deg, p.u0,
                    CAST((15 * p.u0) // 100
                         + (85 * coalesce(s.m, 0)) // 100 AS BIGINT) AS pr
             FROM p{i - 1} p LEFT JOIN s{i} s ON s.id = p.id)""")
    return ("WITH" + ",".join(parts) + f"""
    SELECT id, pr, CAST(pr AS DOUBLE) / {s} AS pr_norm FROM p{n_iter}
    """)


@register(
    "graph_pagerank",
    oracle=_pagerank_oracle(3),
    note="fixed-point integer PageRank (damping 0.85, 3 rounds) on the "
         "undirected co-purchase graph: rank mass in 10^12-scaled "
         "BIGINTs with floor division, so the result is bit-identical "
         "across engines AND partitionings (float PageRank never "
         "hash-matches — partition-order ulps). One rank-vs-edges "
         "equi-join + one partial-agg sum per round, lineage cut per "
         "round; DuckDB twin unrolls the same integer recurrence "
         "(operators/graph.py::pagerank_fixed)")
def graph_pagerank(spark, sf_dir):
    from mapreduce_wsi_spark.operators.graph import pagerank_fixed
    li = tbl(spark, sf_dir, "lineitem")
    e = part_edges(li).select("lo", "hi")
    both = (e.select(F.col("lo").alias("src"), F.col("hi").alias("dst"))
            .unionByName(
                e.select(F.col("hi").alias("src"), F.col("lo").alias("dst"))))
    return pagerank_fixed(both, n_iter=3)


@register(
    "graph_label_propagation",
    oracle=f"""
    WITH e0 AS ({_EDGES_CTE}),
    e AS (SELECT lo AS src, hi AS dst FROM e0
          UNION ALL SELECT hi AS src, lo AS dst FROM e0),
    l0 AS (SELECT DISTINCT src AS id, src AS lbl FROM e),
    n1 AS (SELECT e.dst AS id, l.lbl, count(*) AS c
           FROM e JOIN l0 l ON l.id = e.src GROUP BY 1, 2),
    l1 AS (SELECT id, lbl FROM (
               SELECT *, row_number() OVER (PARTITION BY id
                                            ORDER BY c DESC, lbl) AS rn
               FROM n1) t WHERE rn = 1),
    n2 AS (SELECT e.dst AS id, l.lbl, count(*) AS c
           FROM e JOIN l1 l ON l.id = e.src GROUP BY 1, 2),
    l2 AS (SELECT id, lbl FROM (
               SELECT *, row_number() OVER (PARTITION BY id
                                            ORDER BY c DESC, lbl) AS rn
               FROM n2) t WHERE rn = 1)
    SELECT id, lbl AS community FROM l2
    """,
    note="deterministic synchronous label propagation (2 rounds, mode "
         "of neighbor labels, ties to smallest) on the undirected "
         "co-purchase graph — density-aware communities vs connected "
         "components' reachability (a one-edge bridge does not merge "
         "two cliques). The async/random-order textbook LPA is "
         "irreproducible by design; fixed rounds + lexicographic ties "
         "make this a pure function of the graph, replayed exactly by "
         "the unrolled twin "
         "(operators/graph.py::label_propagation_communities)")
def graph_label_propagation(spark, sf_dir):
    from mapreduce_wsi_spark.operators.graph import (
        label_propagation_communities,
    )
    li = tbl(spark, sf_dir, "lineitem")
    e = part_edges(li).select("lo", "hi")
    both = (e.select(F.col("lo").alias("src"), F.col("hi").alias("dst"))
            .unionByName(
                e.select(F.col("hi").alias("src"), F.col("lo").alias("dst"))))
    return label_propagation_communities(both, n_rounds=2)


@register(
    "graph_hits",
    oracle=f"""
    WITH e0 AS ({_EDGES_CTE}),
    e AS (SELECT lo AS src, hi AS dst FROM e0),
    n AS (SELECT DISTINCT src AS id FROM e
          UNION SELECT DISTINCT dst FROM e),
    a1r AS (SELECT n.id, coalesce(s.v, 0) AS v FROM n LEFT JOIN (
              SELECT dst AS id, sum(CAST(1000000 AS BIGINT)) AS v
              FROM e GROUP BY 1) s USING (id)),
    a1m AS (SELECT max(v) AS mx FROM a1r),
    a1 AS (SELECT id, CAST((v * 1000000) // mx AS BIGINT) AS v FROM a1r, a1m),
    h1r AS (SELECT n.id, coalesce(s.v, 0) AS v FROM n LEFT JOIN (
              SELECT e.src AS id, sum(a1.v) AS v
              FROM e JOIN a1 ON a1.id = e.dst GROUP BY 1) s USING (id)),
    h1m AS (SELECT max(v) AS mx FROM h1r),
    h1 AS (SELECT id, CAST((v * 1000000) // mx AS BIGINT) AS v FROM h1r, h1m),
    a2r AS (SELECT n.id, coalesce(s.v, 0) AS v FROM n LEFT JOIN (
              SELECT e.dst AS id, sum(h1.v) AS v
              FROM e JOIN h1 ON h1.id = e.src GROUP BY 1) s USING (id)),
    a2m AS (SELECT max(v) AS mx FROM a2r),
    a2 AS (SELECT id, CAST((v * 1000000) // mx AS BIGINT) AS v FROM a2r, a2m),
    h2r AS (SELECT n.id, coalesce(s.v, 0) AS v FROM n LEFT JOIN (
              SELECT e.src AS id, sum(a2.v) AS v
              FROM e JOIN a2 ON a2.id = e.dst GROUP BY 1) s USING (id)),
    h2m AS (SELECT max(v) AS mx FROM h2r),
    h2 AS (SELECT id, CAST((v * 1000000) // mx AS BIGINT) AS v FROM h2r, h2m)
    SELECT n.id, a2.v AS auth, h2.v AS hub,
           CAST(a2.v AS DOUBLE) / 1000000 AS auth_norm,
           CAST(h2.v AS DOUBLE) / 1000000 AS hub_norm
    FROM n JOIN a2 ON a2.id = n.id JOIN h2 ON h2.id = n.id
    """,
    note="HITS hubs & authorities (Kleinberg 1999, 2 rounds) on the "
         "DIRECTED lo->hi co-purchase graph: fixed-point 10^6-scaled "
         "BIGINTs with max-normalization per half-round ((x*SCALE) div "
         "max — L2 would need a sqrt and floats), so scores are "
         "bit-identical across engines and partitionings like "
         "pagerank_fixed; 10^6 not 10^12 because the renormalizing "
         "product must fit BIGINT. One equi-join + partial-agg sum + "
         "1-row max broadcast per half-round; DuckDB twin unrolls all "
         "four half-rounds (operators/graph.py::hits_fixed)")
def graph_hits(spark, sf_dir):
    from mapreduce_wsi_spark.operators.graph import hits_fixed
    li = tbl(spark, sf_dir, "lineitem")
    e = part_edges(li).select(F.col("lo").alias("src"),
                              F.col("hi").alias("dst"))
    return hits_fixed(e, n_iter=2)


def _kcore_oracle(k: int, rounds: int) -> str:
    """Unrolled synchronous-peel twin: round i recomputes degrees over
    the round i-1 edge set and keeps ids with degree >= k. The k-core
    is a shrinking fixpoint, so extra rounds past convergence are
    no-ops — the unroll depth (16) carries >1.5x headroom over the
    measured sf0.01 convergence (10 rounds at k=3); the Spark side
    loops to the true fixpoint regardless of scale and raises if it
    ever needs more than max_rounds."""
    # AS MATERIALIZED is load-bearing: each round references the
    # previous CTE ~5 times, so DuckDB's default inlining would expand
    # the chain exponentially (observed as fd exhaustion on the
    # parquet scan); materializing keeps the unroll linear.
    parts = [f"WITH e0 AS MATERIALIZED ({_EDGES_CTE})"]
    prev = "e0"
    for i in range(1, rounds + 1):
        parts.append(f"""
    n{i} AS MATERIALIZED (SELECT id FROM (
                 SELECT id, count(*) AS d FROM (
                     SELECT lo AS id FROM {prev}
                     UNION ALL SELECT hi FROM {prev}) u{i}
                 GROUP BY id) d{i}
             WHERE d >= {k}),
    e{i} AS MATERIALIZED (SELECT lo, hi FROM {prev}
             WHERE lo IN (SELECT id FROM n{i})
               AND hi IN (SELECT id FROM n{i}))""")
        prev = f"e{i}"
    parts_sql = ",".join(parts)
    return (f"{parts_sql}\n"
            f"    SELECT CAST(id AS BIGINT) AS id FROM n{rounds}")


@register(
    "graph_kcore",
    oracle=_kcore_oracle(3, 16),
    note="3-core of the support>=2 co-purchase graph (935 of 1,880 "
         "nodes at sf0.01): synchronous peel, one degree agg + two "
         "semi-join filters per round over the SURVIVING edges only, "
         "localCheckpoint lineage truncation, raises on "
         "non-convergence (operators/graph.py::kcore_nodes)")
def graph_kcore(spark, sf_dir):
    from mapreduce_wsi_spark.operators.graph import kcore_nodes
    li = tbl(spark, sf_dir, "lineitem")
    return (kcore_nodes(part_edges(li).select("lo", "hi"), k=3)
            .select(F.col("id").cast("long").alias("id")))


@register(
    "graph_link_prediction",
    oracle=f"""
    WITH e AS ({_EDGES_CTE}),
    und AS (SELECT lo AS src, hi AS dst FROM e
            UNION ALL SELECT hi, lo FROM e),
    deg AS (SELECT src AS id, count(*) AS d FROM und GROUP BY 1),
    w AS (SELECT a.dst AS u, b.dst AS v, count(*) AS common
          FROM und a JOIN und b ON a.src = b.src AND a.dst < b.dst
          GROUP BY 1, 2),
    ne AS (SELECT w.u, w.v, w.common FROM w
           LEFT JOIN e ON e.lo = w.u AND e.hi = w.v
           WHERE e.lo IS NULL)
    SELECT ne.u, ne.v, CAST(common AS BIGINT) AS common,
           CAST(du.d + dv.d - common AS BIGINT) AS union_size,
           round(CAST(common AS DOUBLE) / (du.d + dv.d - common), 9)
               AS jaccard
    FROM ne JOIN deg du ON du.id = ne.u JOIN deg dv ON dv.id = ne.v
    ORDER BY common DESC, ne.u, ne.v LIMIT 20
    """,
    note="common-neighbor link prediction with exact neighborhood "
         "Jaccard over non-adjacent part pairs: wedge equi-join on the "
         "shared neighbor (u < v, each pair once), LEFT ANTI vs the "
         "edge list, two degree joins, top-20 by the total order "
         "(common DESC, u, v) -> TakeOrderedAndProject; jaccard is one "
         "IEEE division of exact BIGINTs "
         "(operators/graph.py::link_prediction_topk)")
def graph_link_prediction(spark, sf_dir):
    from mapreduce_wsi_spark.operators.graph import link_prediction_topk
    li = tbl(spark, sf_dir, "lineitem")
    return link_prediction_topk(part_edges(li).select("lo", "hi"),
                                top_k=20)


def _ppr_oracle(n_iter: int = 3) -> str:
    """Unrolled personalized-PageRank twin: pagerank's recurrence with
    the teleport vector restricted to the seed set (id % 97 == 0) —
    every step BIGINT floor division (see _pagerank_oracle)."""
    s = 1_000_000_000_000
    parts = [f"""
    e0 AS ({_EDGES_CTE}),
    e AS (SELECT lo AS src, hi AS dst FROM e0
          UNION ALL SELECT hi AS src, lo AS dst FROM e0),
    deg AS (SELECT src AS id, count(*) AS deg FROM e GROUP BY 1),
    ns AS (SELECT count(*) AS n_seeds FROM deg WHERE id % 97 = 0),
    p0 AS (SELECT id, deg,
                  CASE WHEN id % 97 = 0
                       THEN CAST({s} AS BIGINT) // n_seeds
                       ELSE CAST(0 AS BIGINT) END AS s0,
                  CASE WHEN id % 97 = 0
                       THEN CAST({s} AS BIGINT) // n_seeds
                       ELSE CAST(0 AS BIGINT) END AS pr
           FROM deg, ns)"""]
    for i in range(1, n_iter + 1):
        parts.append(f"""
    s{i} AS (SELECT e.dst AS id, CAST(sum(p.pr // p.deg) AS BIGINT) AS m
             FROM e JOIN p{i - 1} p ON p.id = e.src GROUP BY 1),
    p{i} AS (SELECT p.id, p.deg, p.s0,
                    CAST((15 * p.s0) // 100
                         + (85 * coalesce(s.m, 0)) // 100 AS BIGINT)
                        AS pr
             FROM p{i - 1} p LEFT JOIN s{i} s ON s.id = p.id)""")
    return ("WITH" + ",".join(parts) + f"""
    SELECT id, pr, CAST(pr AS DOUBLE) / {s} AS pr_norm FROM p{n_iter}
    """)


@register(
    "graph_personalized_pagerank",
    oracle=_ppr_oracle(3),
    note="personalized PageRank (topic-sensitive, Haveliwala 2002) "
         "from the in-plan seed set id % 97 == 0: teleport mass "
         "returns to seeds only, so fixed-point ranks measure "
         "proximity to the seeds — the related-items/seed-expansion "
         "primitive. Same BIGINT floor-division exactness and "
         "join+agg-per-round shape as graph_pagerank; non-seeds far "
         "from any seed correctly decay to 0 "
         "(operators/graph.py::personalized_pagerank_fixed)")
def graph_personalized_pagerank(spark, sf_dir):
    from mapreduce_wsi_spark.operators.graph import (
        personalized_pagerank_fixed)
    li = tbl(spark, sf_dir, "lineitem")
    e = part_edges(li).select("lo", "hi")
    both = (e.select(F.col("lo").alias("src"), F.col("hi").alias("dst"))
            .unionByName(
                e.select(F.col("hi").alias("src"),
                         F.col("lo").alias("dst"))))
    return personalized_pagerank_fixed(
        both, lambda c: c % 97 == 0, n_iter=3)


@register(
    "copurchase_lift_rules",
    oracle=f"""
    WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    np AS (SELECT l_partkey AS p, count(*) AS n_p FROM pp GROUP BY 1),
    tot AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM pp),
    e AS (SELECT a.l_partkey AS lo, b.l_partkey AS hi, count(*) AS n_ab
          FROM pp a JOIN pp b
            ON a.l_orderkey = b.l_orderkey
           AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2)
    SELECT lo, hi, CAST(n_ab AS BIGINT) AS n_ab,
           CAST(na.n_p AS BIGINT) AS n_a,
           CAST(nb.n_p AS BIGINT) AS n_b,
           round(CAST(n_ab AS DOUBLE) * n_orders
                 / (CAST(na.n_p AS DOUBLE) * nb.n_p), 9) AS lift,
           round(CAST(n_ab AS DOUBLE) / na.n_p, 9) AS confidence
    FROM e JOIN np na ON na.p = e.lo JOIN np nb ON nb.p = e.hi, tot
    ORDER BY lift DESC, lo, hi LIMIT 20
    """,
    note="association rules over co-purchase pairs: lift = "
         "P(ab)/(P(a)P(b)) and confidence a->b from exact distinct-"
         "order counts, one IEEE expression each; top-20 by (lift "
         "DESC, lo, hi) lowers to TakeOrderedAndProject. Support "
         "pruning (n_ab >= 2) bounds the rule space before the "
         "degree joins — the market-basket readout on the same "
         "edge builder as the graph family")
def copurchase_lift_rules(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    pp = li.select("l_orderkey", "l_partkey").distinct()
    np_ = pp.groupBy(F.col("l_partkey").alias("p")).agg(
        F.count(F.lit(1)).alias("n_p"))
    tot = pp.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    e = part_edges(li, min_support=2).select(
        "lo", "hi", F.col("n").alias("n_ab"))
    na = np_.select(F.col("p").alias("lo"), F.col("n_p").alias("n_a"))
    nb = np_.select(F.col("p").alias("hi"), F.col("n_p").alias("n_b"))
    lift = F.round(F.col("n_ab").cast("double") * F.col("n_orders")
                   / (F.col("n_a").cast("double") * F.col("n_b")), 9)
    conf = F.round(F.col("n_ab").cast("double") / F.col("n_a"), 9)
    return (e.join(na, "lo").join(nb, "hi")
            .crossJoin(F.broadcast(tot))
            .select("lo", "hi", F.col("n_ab").cast("long").alias("n_ab"),
                    F.col("n_a").cast("long").alias("n_a"),
                    F.col("n_b").cast("long").alias("n_b"),
                    lift.alias("lift"), conf.alias("confidence"))
            .orderBy(F.col("lift").desc(), "lo", "hi").limit(20))


@register(
    "graph_assortativity",
    oracle=f"""
    WITH e AS ({_EDGES_CTE}),
    und AS (SELECT lo AS src, hi AS dst FROM e
            UNION ALL SELECT hi, lo FROM e),
    deg AS (SELECT src AS id, count(*) AS d FROM und GROUP BY 1),
    p AS (SELECT da.d AS x, db.d AS y
          FROM und u JOIN deg da ON da.id = u.src
                     JOIN deg db ON db.id = u.dst),
    m AS (SELECT count(*) AS n,
                 sum(CAST(x AS DECIMAL(38,0))) AS sx,
                 sum(CAST(y AS DECIMAL(38,0))) AS sy,
                 sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
                 sum(CAST(y AS DECIMAL(38,0)) * y) AS syy,
                 sum(CAST(x AS DECIMAL(38,0)) * y) AS sxy
          FROM p)
    SELECT CAST(n AS BIGINT) AS n_directed_edges,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                 9) AS assortativity
    FROM m
    """,
    note="degree assortativity (Newman): Pearson r of endpoint "
         "degrees over directed edge instances — do hubs attach to "
         "hubs (r>0) or to leaves (r<0)? Decides whether hub-salting "
         "or star-contraction wins. Two degree joins over the edge "
         "list, exact DECIMAL moments, one fixed IEEE closing "
         "expression")
def graph_assortativity(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    e = iter_checkpoint(part_edges(li).select("lo", "hi"))
    und = (e.select(F.col("lo").alias("src"), F.col("hi").alias("dst"))
           .unionByName(e.select(F.col("hi").alias("src"),
                                 F.col("lo").alias("dst"))))
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("d"))
    p = (und.join(deg.select(F.col("id").alias("src"),
                             F.col("d").alias("x")), "src")
         .join(deg.select(F.col("id").alias("dst"),
                          F.col("d").alias("y")), "dst"))
    dd = "decimal(38,0)"
    m = p.agg(F.count(F.lit(1)).alias("n"),
              F.sum(F.col("x").cast(dd)).alias("sx"),
              F.sum(F.col("y").cast(dd)).alias("sy"),
              F.sum((F.col("x").cast(dd) * F.col("x"))).alias("sxx"),
              F.sum((F.col("y").cast(dd) * F.col("y"))).alias("syy"),
              F.sum((F.col("x").cast(dd) * F.col("y"))).alias("sxy"))
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    r = ((n * sxy - sx * sy)
         / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)))
    return m.select(F.col("n").cast("long").alias("n_directed_edges"),
                    F.round(r, 9).alias("assortativity"))
