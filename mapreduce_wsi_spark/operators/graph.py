"""Hierarchy / graph traversal: the recursive-CTE query class Spark lacks.

Spark has no WITH RECURSIVE; the scalable re-expression is pointer
doubling — each round substitutes every node's ancestor pointer with that
ancestor's own pointer, so the distance covered doubles: O(log depth)
rounds of self-joins instead of O(depth). Each round cuts lineage via
util.iter_checkpoint (localCheckpoint by default; reliable checkpoint()
when a checkpoint dir is configured — same iterative-lineage discipline
as ``dedup.connected_components``, dedup.py).

At 100 TB: a naive per-level loop over a deep hierarchy (bill of
materials, org chart, thread trees) is depth-many shuffles; pointer
doubling is log2(depth) shuffles, each an equi-join on the ancestor key
that AQE can size. The DuckDB oracle runs the honest WITH RECURSIVE twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_wsi_spark.util import iter_checkpoint, iter_checkpoint_probe


def resolve_roots(nodes: DataFrame, id_col: str = "id",
                  parent_col: str = "parent",
                  max_rounds: int = 40) -> DataFrame:
    """For a forest given as (id, parent) rows (parent NULL at roots),
    return (id, root, depth): the root of each node's tree and its
    distance from it. Pointer doubling: after round t every node points
    at its 2^t-th ancestor (or its root), so 64-level hierarchies resolve
    in 6 rounds."""
    # cur: id -> (anc, dist) where anc is the farthest known ancestor and
    # dist the hop count to it; done when anc is a root (its own parent
    # is NULL), flagged so finished rows skip the join.
    roots = nodes.filter(F.col(parent_col).isNull()) \
        .select(F.col(id_col).alias("__r"))
    cur = iter_checkpoint(nodes.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.col(parent_col), F.col(id_col)).alias("anc"),
        F.when(F.col(parent_col).isNull(), 0).otherwise(1).alias("dist")))
    for _ in range(max_rounds):
        # finished = anc is a root; only unfinished rows need the jump.
        # r14: the cut moved from the hop join to HERE, before the
        # count probe — the hop step self-joins cur, so cutting first
        # means the done-join computes once per round instead of twice;
        # the pending-count probe rides the checkpoint job itself
        # (iter_checkpoint_probe), so each round is ONE action
        cur, probe = iter_checkpoint_probe(
            cur.join(F.broadcast(roots), cur["anc"] == roots["__r"],
                     "left").select("id", "anc", "dist",
                                    roots["__r"].isNotNull().alias("__done")),
            F.count_if(~F.col("__done")).alias("__pending"))
        if probe["__pending"] == 0:
            cur = cur.drop("__done")
            break
        hop = cur.select(F.col("id").alias("__jid"),
                         F.col("anc").alias("__janc"),
                         F.col("dist").alias("__jdist"))
        cur = (cur.join(hop, cur["anc"] == hop["__jid"], "left")
               .select("id",
                       F.when(F.col("__done") | F.col("__janc").isNull(),
                              F.col("anc")).otherwise(F.col("__janc"))
                       .alias("anc"),
                       F.when(F.col("__done") | F.col("__janc").isNull(),
                              F.col("dist"))
                       .otherwise(F.col("dist") + F.col("__jdist"))
                       .alias("dist")))
    return cur.select("id", F.col("anc").alias("root"),
                      F.col("dist").alias("depth"))


def bfs_hops(edges: DataFrame, source: int, src_col: str = "src",
             dst_col: str = "dst", max_rounds: int = 20) -> DataFrame:
    """Minimum hop count from ``source`` over a directed (possibly
    cyclic) edge set; pass both directions for an undirected graph.
    Returns (id, hops) for every reachable node.

    Frontier BFS: each round joins only the newly-discovered frontier
    against the edges and anti-joins the visited set, so work per round
    is O(frontier x degree), rounds = graph diameter. Cycles terminate
    because a revisited node is always anti-joined away. Every round
    cuts lineage via util.iter_checkpoint (the same iterative-lineage
    discipline as dedup.connected_components) so the plan doesn't grow
    with the iteration count. The DuckDB oracle runs the honest
    WITH RECURSIVE UNION (dedup) twin."""
    spark = edges.sparkSession
    # the 1-row seed needs no cut; visited accumulates as a FLAT union
    # of per-round cut frontiers (each leaf materialized, so the union
    # plan never deepens — no per-round visited checkpoint job, r14)
    visited = spark.range(1).select(
        F.lit(source).cast("bigint").alias("id"),
        F.lit(0).alias("hops"))
    frontier = visited
    for r in range(1, max_rounds + 1):
        # emptiness probe rides the frontier checkpoint job (r14):
        # one action per round
        nxt, probe = iter_checkpoint_probe(
            frontier.join(edges, frontier["id"] == edges[src_col])
            .select(F.col(dst_col).cast("bigint").alias("id")).distinct()
            .join(visited, "id", "left_anti")
            .select("id", F.lit(r).alias("hops")),
            F.count(F.lit(1)).alias("__n"))
        if probe["__n"] == 0:
            break
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


PAGERANK_SCALE = 1_000_000_000_000  # fixed-point: 1.0 == 10^12


def pagerank_fixed(edges: DataFrame, n_iter: int = 3,
                   src_col: str = "src", dst_col: str = "dst",
                   checkpoint_every: int = 2) -> DataFrame:
    """PageRank in fixed-point integer arithmetic (damping 0.85), the
    iterative scoring pass of a link graph. Pass both edge directions
    for an undirected graph. Returns ``(id, pr, pr_norm)`` where ``pr``
    is the 10^12-scaled integer rank after ``n_iter`` rounds and
    ``pr_norm`` the double view of it.

    Why integers: float PageRank sums contributions in partition order,
    so two runs of the same data can differ in the last ulps and an
    engine twin never hash-matches. With ``div`` floor division and
    integer sums the result is bit-identical on ANY engine and ANY
    partitioning — the determinism trick mirrors the decimal-exact
    aggregation spine (FIXTURES.md §B). Update rule per node v:

        pr'(v) = (15 * u0) div 100  +  (85 * sum_in(pr(u) div deg(u))) div 100

    with ``u0 = SCALE div n`` the uniform start mass. Nodes in the edge
    list always have deg >= 1, so there is no dangling-mass term (the
    lost remainder mass is the documented price of exactness).

    Scale shape: per round one equi-join of the rank table against the
    edge list (shuffle on the join key — co-partition both on src at
    100 TB and it is exchange-free) + one partial-agg sum; lineage cut
    per round via iter_checkpoint; rounds are a constant, not a
    function of data size.
    """
    # materialize the edge list ONCE: it is re-joined every round, and an
    # unmaterialized lineage (e.g. the co-purchase self-join feeding the
    # catalog entry) would otherwise recompute per round — the same
    # discipline as triangle_count's eager edge checkpoint (measured
    # 7.7 s -> ~2 s at sf0.1 for 3 rounds)
    e = iter_checkpoint(edges.select(F.col(src_col).alias("src"),
                                     F.col(dst_col).alias("dst")))
    # n rides the deg checkpoint job as an observed count (r14): the
    # exact BIGINT folds back in as a plan literal — replacing the
    # crossJoin(broadcast(n1)) pair, which paid a broadcast exchange +
    # build job re-running the deg subtree (the hits_fixed normalize
    # treatment; driver traffic is the same single scalar the broadcast
    # exchange already collected)
    deg, probe = iter_checkpoint_probe(
        e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        .select(F.col("src").alias("id"), "deg"),
        F.count(F.lit(1)).alias("__n"))
    base = deg.select("id", "deg",
                      F.expr(f"(cast({PAGERANK_SCALE} as bigint) "
                             f"div cast({probe['__n']} as bigint))")
                      .alias("__u0"))
    cur = iter_checkpoint(base.select("id", "deg",
                                      F.col("__u0"),
                                      F.col("__u0").alias("pr")))
    for i in range(n_iter):
        contrib = cur.select(F.col("id").alias("src"),
                             F.expr("pr div deg").alias("__c"))
        incoming = (e.join(contrib, "src")
                    .groupBy(F.col("dst").alias("id"))
                    .agg(F.sum("__c").alias("__in")))
        cur = (cur.select("id", "deg", "__u0")
               .join(incoming, "id", "left")
               .select("id", "deg", "__u0",
                       F.expr("(15 * __u0) div 100 "
                              "+ (85 * coalesce(__in, 0)) div 100")
                       .alias("pr")))
        # lineage cut every checkpoint_every rounds: unlike the
        # data-dependent loops (components/BFS, which probe convergence
        # and MUST materialize per round), a constant-round recurrence
        # can chain a couple of rounds per cut — each eager checkpoint
        # is a full job, and halving them measured 3.9 s -> ~3.3 s for
        # 3 rounds at sf0.1 with identical results
        if (i + 1) % max(1, checkpoint_every) == 0 or i == n_iter - 1:
            cur = iter_checkpoint(cur)
    return cur.select("id", "pr",
                      (F.col("pr").cast("double") / F.lit(float(PAGERANK_SCALE)))
                      .alias("pr_norm"))


def label_propagation_communities(edges: DataFrame, n_rounds: int = 2,
                                  src_col: str = "src",
                                  dst_col: str = "dst") -> DataFrame:
    """Community detection by SYNCHRONOUS label propagation: every node
    starts labeled with its own id; each round relabels every node with
    the MODE of its neighbors' labels, ties to the smallest label — the
    deterministic variant of Raghavan et al.'s LPA (the classic
    asynchronous/random-order formulation is irreproducible by design;
    fixed rounds + lexicographic ties make the result a pure function
    of the graph, so an engine twin can replay it). Returns
    ``(id, community)`` after ``n_rounds``.

    Edges are treated as DIRECTED influence: a node adopts the mode of
    the labels flowing in over its INCOMING edges. For the classic
    undirected LPA, pass each edge in both directions (the catalog
    entry does). A node with no incoming edges keeps its current label
    each round rather than vanishing — the node universe is src ∪ dst
    and every round's relabeling is left-joined back onto it.

    Scale shape per round: one labels-vs-edges equi-join, one
    (node, label) count aggregation, one per-node top-1 window, one
    id-keyed carry join — all keyed by node id, lineage cut per round.
    Unlike connected components, LPA respects edge DENSITY: two cliques
    joined by one bridge edge stay separate communities where
    components would merge them.
    """
    e = iter_checkpoint(edges.select(F.col(src_col).alias("src"),
                                     F.col(dst_col).alias("dst")))
    # the node universe is only ever consumed as the initial labeling,
    # so it folds into the lab checkpoint — one materialization action
    # instead of two (r14)
    lab = iter_checkpoint(
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id"))).distinct()
        .select("id", F.col("id").alias("lbl")))
    from pyspark.sql import Window
    for _ in range(n_rounds):
        nb = (e.join(lab.withColumnRenamed("id", "src"), "src")
              .groupBy(F.col("dst").alias("id"), "lbl")
              .agg(F.count(F.lit(1)).alias("c")))
        w = Window.partitionBy("id").orderBy(F.desc("c"), F.col("lbl").asc())
        relabel = (nb.withColumn("__rn", F.row_number().over(w))
                   .filter(F.col("__rn") == 1)
                   .select("id", F.col("lbl").alias("__new")))
        lab = iter_checkpoint(
            lab.join(relabel, "id", "left")
            .select("id", F.coalesce("__new", "lbl").alias("lbl")))
    return lab.select("id", F.col("lbl").alias("community"))


HITS_SCALE = 1_000_000  # fixed-point: 1.0 == 10^6 (see overflow note)


def hits_fixed(edges: DataFrame, n_iter: int = 2,
               src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """HITS hubs & authorities (Kleinberg, JACM 1999) in fixed-point
    integer arithmetic on a DIRECTED edge list: per round,
    auth(v) = sum of hub over in-edges, renormalized so max(auth) ==
    SCALE, then hub(u) = sum of auth over out-edges, renormalized the
    same way. Max-normalization (not L2) keeps every step in integers:
    x_norm = (x * SCALE) div max(x) — bit-identical on any engine and
    any partitioning, the pagerank_fixed determinism scheme.

    SCALE is 10^6 (not PageRank's 10^12) by overflow arithmetic: a raw
    score is <= max_degree * SCALE and the renormalizing product is
    raw * SCALE <= max_degree * SCALE^2 — at 10^6 that stays inside
    BIGINT for degrees up to ~9e6; 10^12 would overflow at degree 1.
    Scale shape per half-round: one rank-vs-edges equi-join + one
    partial-agg sum + a 1-row max broadcast; rounds are a constant.
    Returns (id, auth, hub, auth_norm, hub_norm)."""
    e = iter_checkpoint(edges.select(F.col(src_col).alias("src"),
                                     F.col(dst_col).alias("dst")))
    nodes = iter_checkpoint(
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id"))).distinct())
    cur = nodes.withColumn("hub", F.lit(HITS_SCALE).cast("long"))

    def normalize(df, col):
        # r14: checkpoint the RAW scores, collect the 1-row max, and
        # fold it back in as an exact BIGINT literal — replacing the
        # crossJoin(broadcast(max)) pair, which re-ran the raw-score
        # subtree inside the broadcast job each half-round and paid a
        # broadcast exchange per normalization. Driver traffic is the
        # same single row the broadcast exchange already collected
        # (the jdbc-bounds action class). Tightened further: the max
        # rides the checkpoint job itself (iter_checkpoint_probe), so
        # each half-round normalization is ONE action.
        df, probe = iter_checkpoint_probe(df, F.max(col).alias("__mx"))
        mx = probe["__mx"]
        if mx is None:  # empty graph: keep the old NULL-div semantics
            mx = 0
        return df.select("id", F.expr(
            f"({col} * cast({HITS_SCALE} as bigint)) "
            f"div cast({mx} as bigint)").alias(col))

    # r15: the per-half-round zero-fill join against the node universe
    # is gone — scores are carried for SCORED nodes only (auth rows =
    # the dst-node set, hub rows = the src-node set, both constant
    # across rounds), and the universe is re-attached ONCE at the end.
    # Exactness: all scores are >= 0, so zero-filled rows can never
    # change a max (the scored set is nonempty whenever the edge set
    # is), and an absent row contributes exactly what a 0-valued row
    # contributed to the in/out sums — every edge endpoint is in the
    # scored set by construction, so no edge loses its contribution.
    # Saves one node-sized join + exchange pair per half-round (guide
    # §2.4); identical (id, auth, hub, *_norm) rows, pytest-pinned.
    auth = None
    for _ in range(n_iter):
        raw_a = (e.join(cur.select(F.col("id").alias("src"), "hub"),
                        "src")
                 .groupBy(F.col("dst").alias("id"))
                 .agg(F.sum("hub").alias("auth")))
        auth = normalize(raw_a, "auth")
        raw_h = (e.join(auth.select(F.col("id").alias("dst"), "auth"),
                        "dst")
                 .groupBy(F.col("src").alias("id"))
                 .agg(F.sum("auth").alias("hub")))
        cur = normalize(raw_h, "hub")
    s = float(HITS_SCALE)
    zero = F.lit(0).cast("long")
    return (nodes.join(auth, "id", "left").join(cur, "id", "left")
            .select("id",
                    F.coalesce("auth", zero).alias("auth"),
                    F.coalesce("hub", zero).alias("hub"))
            .select("id", "auth", "hub",
                    (F.col("auth").cast("double") / s).alias("auth_norm"),
                    (F.col("hub").cast("double") / s).alias("hub_norm")))


def kcore_nodes(edges: DataFrame, k: int,
                max_rounds: int = 50) -> DataFrame:
    """Nodes of the k-core: the maximal subgraph where every node has
    degree >= k — the standard density filter before community mining
    or embedding training (peels off the long tail of weakly-connected
    nodes that dominate a co-occurrence graph's size but carry no
    structure).

    Synchronous peel: each round recomputes degrees over the surviving
    edge set and drops EVERY node below k at once (the fixpoint is the
    same as sequential peeling — the k-core is unique). Work per round
    is one degree aggregation + two semi-join filters over the current
    edges, O(E_t). r15: ONE checkpoint action per round instead of two
    — the keep set stays lazy inside the round's edge-filter plan (its
    degree-agg subtree appears on both join sides, canonically
    identical, so ReuseExchange dedups it) and the convergence probe
    (edge count) rides the edge checkpoint. The edge set only shrinks,
    and it shrinks iff some node was peeled, so a stable edge count is
    exactly the old stable-node-count fixpoint: at that point every
    endpoint of the surviving edge set has degree >= k, and the
    returned node set (the same groupBy/filter construction over the
    stable edges, now lazy) is identical to the old materialized keep.
    Raises on non-convergence within max_rounds — never returns a
    half-peeled set.

    edges: (lo, hi) undirected, lo < hi, deduplicated.
    """
    def survivors(ed: DataFrame) -> DataFrame:
        und = (ed.select(F.col("lo").alias("id"))
               .unionByName(ed.select(F.col("hi").alias("id"))))
        return (und.groupBy("id").agg(F.count(F.lit(1)).alias("__d"))
                .filter(F.col("__d") >= k).select("id"))

    e, probe = iter_checkpoint_probe(edges.select("lo", "hi"),
                                     F.count(F.lit(1)).alias("__n"))
    prev = probe["__n"]
    for _ in range(max_rounds):
        keep = survivors(e)
        e, probe = iter_checkpoint_probe(
            e.join(keep.select(F.col("id").alias("lo")), "lo")
            .join(keep.select(F.col("id").alias("hi")), "hi")
            .select("lo", "hi"),
            F.count(F.lit(1)).alias("__n"))
        n = probe["__n"]
        if n == prev:
            return survivors(e)
        prev = n
    raise RuntimeError(
        f"k-core peel did not converge in {max_rounds} rounds")


def link_prediction_topk(edges: DataFrame, top_k: int = 20) -> DataFrame:
    """Common-neighbor link prediction with EXACT neighborhood Jaccard:
    for non-adjacent pairs (u, v), score = |N(u) n N(v)| and
    jaccard = common / (deg(u) + deg(v) - common) — the classic
    related-items / you-may-also-like candidate generator.

    Plan: wedges from the doubled adjacency (one equi-join on the
    shared neighbor, u < v orientation so each pair counts once),
    partial-agg counts, LEFT ANTI against the existing edge list, two
    broadcastable degree joins, then a total-ordered top-k that lowers
    to TakeOrderedAndProject. Wedge count is sum(deg(w)^2) — bounded
    upstream by the same support/basket pruning that keeps the graph
    sparse (see plans/q_graph.py). Jaccard divides two exact BIGINTs
    in one IEEE op, so agg order cannot perturb it.
    """
    e = iter_checkpoint(edges.select("lo", "hi"))
    und = (e.select(F.col("lo").alias("src"), F.col("hi").alias("dst"))
           .unionByName(
               e.select(F.col("hi").alias("src"),
                        F.col("lo").alias("dst"))))
    deg = (und.groupBy(F.col("src").alias("id"))
           .agg(F.count(F.lit(1)).alias("d")))
    a = und.select(F.col("src").alias("w"), F.col("dst").alias("u"))
    b = und.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    wedges = (a.join(b, "w").filter(F.col("u") < F.col("v"))
              .groupBy("u", "v").agg(F.count(F.lit(1)).alias("common")))
    nonedge = wedges.join(
        e, (wedges["u"] == e["lo"]) & (wedges["v"] == e["hi"]),
        "left_anti")
    du = deg.select(F.col("id").alias("u"), F.col("d").alias("__du"))
    dv = deg.select(F.col("id").alias("v"), F.col("d").alias("__dv"))
    scored = (nonedge.join(du, "u").join(dv, "v")
              .withColumn("union_size",
                          F.col("__du") + F.col("__dv")
                          - F.col("common")))
    jac = F.round(F.col("common").cast("double") / F.col("union_size"), 9)
    return (scored.select("u", "v",
                          F.col("common").cast("long").alias("common"),
                          F.col("union_size").cast("long")
                          .alias("union_size"),
                          jac.alias("jaccard"))
            .orderBy(F.col("common").desc(), "u", "v").limit(top_k))


def personalized_pagerank_fixed(edges: DataFrame, seed_pred,
                                n_iter: int = 3,
                                src_col: str = "src",
                                dst_col: str = "dst") -> DataFrame:
    """Personalized PageRank (fixed-point integers, damping 0.85):
    teleport mass returns to a SEED SET instead of the uniform vector,
    so ranks measure proximity to the seeds — the
    related-to-these-items recommender / seed-expansion primitive
    (topic-sensitive PageRank, Haveliwala 2002).

    ``seed_pred`` is a callable Column builder: seed_pred(id_col) ->
    boolean Column, evaluated in-plan (no driver-side seed list; a
    literal id list works too via isin). Seeds each start with
    SCALE div n_seeds mass; non-seeds start at 0. Update per node:

        pr'(v) = (15 * s0(v)) div 100 + (85 * sum_in(pr(u) div deg(u))) div 100

    Same exactness argument as pagerank_fixed: every step is BIGINT
    floor division, bit-identical across engines and partitionings.
    Same plan shape: one equi-join + one partial-agg sum per round,
    eager checkpoint per round, n_seeds rides a 1-row broadcast.
    """
    e = iter_checkpoint(edges.select(F.col(src_col).alias("src"),
                                     F.col(dst_col).alias("dst")))
    # n_seeds rides the deg checkpoint job as an observed sum and folds
    # back in as an exact BIGINT literal (r14, the pagerank_fixed n
    # treatment) — no crossJoin(broadcast) pair per fit
    deg, probe = iter_checkpoint_probe(
        e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        .select(F.col("src").alias("id"), "deg"),
        F.sum(seed_pred(F.col("id")).cast("int")).alias("__ns"))
    ns_sql = ("cast(null as bigint)" if probe["__ns"] is None
              else f"cast({probe['__ns']} as bigint)")
    seeded = deg.withColumn("__is_seed",
                            seed_pred(F.col("id")).cast("int"))
    base = seeded.select("id", "deg",
                         F.expr(f"CASE WHEN __is_seed = 1 THEN "
                                f"cast({PAGERANK_SCALE} as bigint) "
                                f"div {ns_sql} "
                                f"ELSE cast(0 as bigint) END")
                         .alias("__s0"))
    cur = iter_checkpoint(base.withColumn("pr", F.col("__s0")))
    for _ in range(n_iter):
        contrib = cur.select(F.col("id").alias("src"),
                             F.expr("pr div deg").alias("__c"))
        incoming = (e.join(contrib, "src")
                    .groupBy(F.col("dst").alias("id"))
                    .agg(F.sum("__c").alias("__in")))
        cur = iter_checkpoint(
            cur.select("id", "deg", "__s0")
            .join(incoming, "id", "left")
            .select("id", "deg", "__s0",
                    F.expr("(15 * __s0) div 100 "
                           "+ (85 * coalesce(__in, 0)) div 100")
                    .alias("pr")))
    return cur.select(
        "id", "pr",
        (F.col("pr").cast("double") / F.lit(float(PAGERANK_SCALE)))
        .alias("pr_norm"))


def degree_oriented_edges(edges: DataFrame, lo_col: str = "lo",
                          hi_col: str = "hi") -> DataFrame:
    """Orient an undirected (lo < hi) edge list low-DEGREE -> high-degree
    (tie-break: smaller id first) — the standard triangle-counting
    orientation (Chiba & Nishizeki 1985; Suri & Vassilvitskii 2011 "
    "MapReduce curse-of-the-last-reducer): every node's OUT-degree is
    then bounded by O(sqrt(m)) regardless of its true degree, so the
    wedge space generated at a power-law hub collapses from deg(hub)^2
    to O(m) total. Returns (src, dst, d_dst) with rank(src) < rank(dst)
    under rank(x) = (degree(x), x); d_dst rides along so the wedge join
    can order endpoints without re-joining degrees."""
    und = (edges.select(F.col(lo_col).alias("x"), F.col(hi_col).alias("y"))
           .unionByName(edges.select(F.col(hi_col).alias("x"),
                                     F.col(lo_col).alias("y"))))
    deg = und.groupBy("x").agg(F.count(F.lit(1)).alias("d"))
    e = (edges
         .join(deg.select(F.col("x").alias(lo_col),
                          F.col("d").alias("d_lo")), lo_col)
         .join(deg.select(F.col("x").alias(hi_col),
                          F.col("d").alias("d_hi")), hi_col))
    lo_first = ((F.col("d_lo") < F.col("d_hi"))
                | ((F.col("d_lo") == F.col("d_hi"))
                   & (F.col(lo_col) < F.col(hi_col))))
    return e.select(
        F.when(lo_first, F.col(lo_col)).otherwise(F.col(hi_col))
        .alias("src"),
        F.when(lo_first, F.col(hi_col)).otherwise(F.col(lo_col))
        .alias("dst"),
        F.when(lo_first, F.col("d_hi")).otherwise(F.col("d_lo"))
        .alias("d_dst"))


def oriented_wedges(oriented: DataFrame) -> DataFrame:
    """Candidate wedges (u, v, w) from a degree-oriented edge list: two
    out-edges of the same pivot u, endpoint pair ordered by the same
    (degree, id) rank that oriented the edges — so if {v, w} is an edge
    it is oriented exactly v -> w and one equi-join closes the triangle.
    With degree orientation the pivot's out-degree is O(sqrt(m)), so
    wedge volume is bounded by sum(outdeg^2) = O(m^1.5) worst case and
    ~O(m * arboricity) on real graphs — a hub no longer emits deg^2."""
    e1 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"),
                         F.col("d_dst").alias("dv"))
    e2 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("w"),
                         F.col("d_dst").alias("dw"))
    return (e1.join(e2, "u")
            .filter((F.col("dv") < F.col("dw"))
                    | ((F.col("dv") == F.col("dw"))
                       & (F.col("v") < F.col("w"))))
            .select("u", "v", "w"))


def triangle_count_oriented(edges: DataFrame) -> DataFrame:
    """Triangle count via degree orientation: wedges from the oriented
    list closed by one (v, w) equi-join. Counts each triangle exactly
    once (at its lowest-rank vertex). Same answer as the (lo < hi)
    wedge-close for any input — the orientation changes candidate
    volume, never the count."""
    o = iter_checkpoint(degree_oriented_edges(edges))
    closed = oriented_wedges(o).join(
        o.select(F.col("src").alias("v"), F.col("dst").alias("w")),
        ["v", "w"])
    return closed.agg(F.count(F.lit(1)).alias("n_triangles"))
