"""Graph analytics over relational edge lists (greenfield extension).

Connected components (the dedup clustering workhorse) lives in
operators/dedup.py; this module holds the rank/centrality side. The
reference engine has no graph operators — this extends the engine the
same way the dedup/ANN families do, for corpus-curation jobs that need
link-structure signals (domain authority for crawl filtering, seller/
buyer importance in transaction graphs).

Scale design:
- the edge list is the only big relation; every iteration is one
  equi-join (edges ⋈ ranks, both hash-partitioned by the join key) plus
  one groupBy(dst) whose SUM partial-aggregates map-side, so the wide
  exchange per iteration carries one row per distinct dst, not one per
  edge;
- degrees and the node universe are computed once, outside the loop;
- a FIXED small iteration count is unrolled into one declarative plan
  (Catalyst sees the whole pipeline; nothing is collected between
  rounds). Many-iteration runs should localCheckpoint every few rounds
  to cut lineage — the pattern operators/dedup.py:connected_components
  already demonstrates;
- per-term contributions are cast to DECIMAL before the SUM so the
  reduction is associative-exact and engine-independent (double SUM
  order varies with partitioning; decimal addition does not) — the same
  money-column discipline as the TPC-H aggregates in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 2,
    damping: float = 0.85,
    round_digits: int = 10,
    final_digits: int = 8,
    broadcast_ranks: bool = True,
    cache_handles: list | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over an UNDIRECTED simple graph built
    from ``edges`` (each input pair contributes both directions; dupes
    removed). Returns (node, pr).

    Every node in an undirected graph has degree >= 1, so there is no
    dangling-mass term: pr_{t+1}(v) = (1-d)/N + d * SUM over neighbors
    u of pr_t(u)/deg(u). Intermediate ranks are rounded to
    ``round_digits`` (the final pass to ``final_digits``) so the values
    are totally reproducible across engines — an exact-oracle-friendly
    fixed-point contract, like the rounded-cosine ANN family.

    The driver holds ONE scalar (the node count); ranks never leave the
    cluster.

    ``broadcast_ranks`` is the scale dial: the rank and degree
    relations are NODE-sized (one long + one double per node), so up to
    ~10M nodes they broadcast and the edge list never shuffles for the
    contribution join — the only exchange per iteration is the
    partial-aggregated groupBy(dst). Web-scale graphs (nodes too big to
    broadcast) set False and get the partitioned sort-merge plan, where
    edges and ranks co-shuffle by the join key.
    """
    from pyspark.sql.window import Window

    und = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .union(edges.select(F.col(dst).alias("src"), F.col(src).alias("dst")))
        .filter(F.col("src") != F.col("dst"))  # simple graph: no self-loops
        .distinct()
        # degree is folded INTO the edge relation (window count) so the
        # per-iteration join touches ONE broadcast side, not two; the
        # persist stops the node universe and every iteration re-running
        # the edge build (plan audit showed 6 re-scans for 2 iterations)
        .select("src", "dst", F.count(F.lit(1)).over(Window.partitionBy("src")).alias("deg"))
        .persist()
    )
    # long-lived serving sessions should pass cache_handles (a list)
    # and unpersist after their action — the same release contract as
    # dedup's shingle relation (dedup.py minhash_lsh_pairs)
    if cache_handles is not None:
        cache_handles.append(und)
    nodes = und.select(F.col("src").alias("node")).distinct()
    # N rides the plan as a broadcast 1-row relation instead of a
    # driver .count() — one fewer Spark job (at sf0.1 every extra
    # action costs ~0.5-0.8 s of stage round-trips, regardless of rows)
    nn = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("n")))
    pr = nodes.crossJoin(nn).select(
        "node", (F.lit(1.0) / F.col("n")).alias("pr"), "n"
    )
    for it in range(iters):
        prs = pr.withColumnRenamed("node", "src")
        if broadcast_ranks:
            prs = F.broadcast(prs)
        contrib = und.join(prs, "src").select(
            F.col("dst").alias("node"),
            (F.col("pr") / F.col("deg")).cast("decimal(28,12)").alias("w"),
            "n",
        )
        digits = final_digits if it == iters - 1 else round_digits
        pr = contrib.groupBy("node", "n").agg(
            F.round(
                F.lit(1.0 - damping) / F.col("n")
                + F.lit(damping) * F.sum("w").cast("double"),
                digits,
            ).alias("pr")
        )
    return pr.select("node", "pr")


def weighted_pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    iters: int = 2,
    damping: float = 0.85,
    round_digits: int = 10,
    final_digits: int = 8,
    broadcast_ranks: bool = True,
    cache_handles: list | None = None,
) -> DataFrame:
    """PageRank with EDGE WEIGHTS over the undirected simple graph
    induced by ``edges`` (both directions added; self-loops dropped;
    parallel-edge weights sum). Contribution mass splits by weight
    share instead of degree share:

        pr_{t+1}(v) = (1-d)/N + d * SUM over u~v of
                      pr_t(u) * w(u,v) / wdeg(u)

    — the natural authority measure when edges carry strength
    (co-purchase support, interaction counts): a node pushes most of
    its rank down its STRONG edges. Same exact-oracle fixed-point
    contract as :func:`pagerank` (intermediate round to
    ``round_digits``, decimal-cast contributions so the reduction is
    order-independent), same plan shape: weighted degree folds into
    the persisted edge relation via one window sum, so each iteration
    is one broadcast(rank) join + one node-keyed partial-agg shuffle.
    ``broadcast_ranks=False`` gives the sort-merge plan for graphs
    whose node relation outgrows the broadcast budget."""
    from pyspark.sql.window import Window

    und = (
        edges.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(weight).cast("long").alias("w"),
        )
        .unionByName(
            edges.select(
                F.col(dst).alias("src"),
                F.col(src).alias("dst"),
                F.col(weight).cast("long").alias("w"),
            )
        )
        .filter(F.col("src") != F.col("dst"))  # simple graph: no self-loops
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))  # parallel edges merge additively
        # nonpositive merged weights drop: they carry no mass, and an
        # all-nonpositive node would otherwise divide by wdeg = 0
        .filter(F.col("w") > 0)
        .select(
            "src",
            "dst",
            "w",
            F.sum("w").over(Window.partitionBy("src")).alias("wdeg"),
        )
        .persist()
    )
    if cache_handles is not None:
        cache_handles.append(und)
    nodes = und.select(F.col("src").alias("node")).distinct()
    nn = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("n")))
    pr = nodes.crossJoin(nn).select(
        "node", (F.lit(1.0) / F.col("n")).alias("pr"), "n"
    )
    for it in range(iters):
        prs = pr.withColumnRenamed("node", "src")
        if broadcast_ranks:
            prs = F.broadcast(prs)
        contrib = und.join(prs, "src").select(
            F.col("dst").alias("node"),
            (F.col("pr") * F.col("w") / F.col("wdeg"))
            .cast("decimal(28,12)")
            .alias("c"),
            "n",
        )
        digits = final_digits if it == iters - 1 else round_digits
        pr = contrib.groupBy("node", "n").agg(
            F.round(
                F.lit(1.0 - damping) / F.col("n")
                + F.lit(damping) * F.sum("c").cast("double"),
                digits,
            ).alias("pr")
        )
    return pr.select("node", "pr")


def eigenvector_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iters: int = 3,
    round_digits: int = 10,
    final_digits: int = 8,
    broadcast_ranks: bool = True,
    cache_handles: list | None = None,
) -> DataFrame:
    """Fixed-iteration eigenvector centrality (power iteration on the
    adjacency matrix, L1-normalized each step) over the undirected
    simple graph induced by ``edges``:

        y_{t+1}(v) = SUM over u~v of w(u,v) * x_t(u)
        x_{t+1}(v) = round(y_{t+1}(v) / SUM_v y_{t+1}(v), digits)

    x_0 = 1. Unlike PageRank there is no teleport mass: influence is
    purely "being connected to influential nodes", the classic
    prestige measure. ``weight=None`` treats every edge as 1.

    Exact-oracle fixed-point contract: per-step scores round to
    ``round_digits`` (final to ``final_digits``); the matvec sums
    decimal(28,12)-cast products so the reduction commutes; the
    normalizer divides double-by-double on the decimal-exact sums, so
    both engines hit bit-identical IEEE operations. Plan per
    iteration: broadcast(x) join + node-keyed partial-agg shuffle +
    one scalar aggregate that rides back as a broadcast 1-row
    relation (no driver collect)."""
    w_expr = (
        F.lit(1).cast("long") if weight is None else F.col(weight).cast("long")
    )
    und = (
        edges.select(
            F.col(src).alias("src"), F.col(dst).alias("dst"), w_expr.alias("w")
        )
        .unionByName(
            edges.select(
                F.col(dst).alias("src"), F.col(src).alias("dst"), w_expr.alias("w")
            )
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        # nonpositive merged weights would zero or negate the L1
        # normalizer and silently corrupt every score downstream —
        # drop them loudly, mirroring weighted_pagerank's contract
        .filter(F.col("w") > 0)
        .persist()
    )
    if cache_handles is not None:
        cache_handles.append(und)
    x = und.select(F.col("src").alias("node")).distinct().withColumn(
        "x", F.lit(1.0)
    )
    for it in range(iters):
        xs = x.withColumnRenamed("node", "src")
        if broadcast_ranks:
            xs = F.broadcast(xs)
        y = (
            und.join(xs, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("x") * F.col("w")).cast("decimal(28,12)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("y"))
        )
        s = F.broadcast(y.agg(F.sum("y").alias("s")))
        digits = final_digits if it == iters - 1 else round_digits
        x = y.crossJoin(s).select(
            "node",
            F.round(
                F.col("y").cast("double") / F.col("s").cast("double"), digits
            ).alias("x"),
        )
    return x.select("node", F.col("x").alias("score"))


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    cache_handles: list | None = None,
) -> DataFrame:
    """Global triangle census of the UNDIRECTED simple graph induced by
    ``edges`` (self-loops and duplicate/reverse edges collapse away):
    one row (n_nodes, n_edges, n_triangles).

    The join uses DEGREE ORIENTATION (Cohen 2009; Suri &
    Vassilvitskii, "Counting triangles and the curse of the last
    reducer", WWW'11 — both public): orient every edge from its
    lower-(degree, id) endpoint to the higher one, then count paths
    a->b->c closed by a->c. Each triangle is counted EXACTLY once, and
    each oriented out-neighborhood is O(sqrt(m)) — so the wedge join's
    fan-out is bounded even when a celebrity node has 10^8 neighbors,
    which is precisely the skew that kills the naive u-joins-v-joins-w
    plan at 100 TB. Three keyed shuffles (degree agg, wedge join,
    closure join); the closure join is a semi-join carrying no
    payload."""
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
        .persist()  # feeds degree agg, orientation join, and the edge count
    )
    if cache_handles is not None:
        cache_handles.append(e)
    deg = (
        e.select(F.col("u").alias("x"))
        .unionAll(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    db = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    with_deg = e.join(da, "u").join(db, "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = with_deg.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
    )
    o1, o2, o3 = o.alias("o1"), o.alias("o2"), o.alias("o3")
    wedges = o1.join(o2, F.col("o1.b") == F.col("o2.a")).select(
        F.col("o1.a").alias("wa"), F.col("o2.b").alias("wc")
    )
    tri = wedges.join(
        o3, (F.col("wa") == F.col("o3.a")) & (F.col("wc") == F.col("o3.b")), "inner"
    )
    counts = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    nn = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    ne = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        F.broadcast(nn)
        .crossJoin(F.broadcast(ne))
        .crossJoin(counts)
        .select("n_nodes", "n_edges", "n_triangles")
    )


def _bfs_hops_dense(und: DataFrame, seeds0: DataFrame, max_hops: int) -> DataFrame:
    """Single-row BFS for graphs whose COUNTED doubled-edge relation
    fits the dense budget: aggregate the whole adjacency into one
    ``map<node, array<node>>`` row, then run every expansion round as
    higher-order array functions (transform / flatten / array_except)
    over that row — ZERO per-round Spark jobs. The frontier-join plan
    pays ~2 broadcast-materialization jobs per round (frontier +
    visited), pure scheduler latency when the graph is a few thousand
    edges; here the entire expansion is one expression tree evaluated
    inside the final action. State is node-sized arrays in a single
    row — bounded by the caller's dense budget check, never unmeasured.

    ``und`` must be the doubled (u, v) relation; ``seeds0`` a (node)
    relation (dupes fine — the seed collect_set dedupes). Returns the
    same (node, hops) contract as the frontier path: min-hop by BFS
    invariant, seeds at 0, only nodes within ``max_hops``."""
    adj = (
        und.groupBy("u")
        .agg(F.collect_set("v").alias("vs"))
        .agg(F.map_from_entries(F.collect_list(F.struct("u", "vs"))).alias("adj"))
    )
    fr0 = seeds0.agg(F.collect_set("node").alias("fr0"))
    # merge the two 1-row aggregates WITHOUT a join: a 2-row union
    # folded by first(ignorenulls) costs one exchange inside the same
    # job, where the previous broadcast cross-join paid a separate
    # broadcast-materialization job per action (r13, guide §2.4 —
    # pure scheduler latency on constant-bounded relations)
    adj_t = adj.schema[0].dataType
    fr_t = fr0.schema[0].dataType
    st = (
        adj.select("adj", F.lit(None).cast(fr_t).alias("fr0"))
        .unionByName(fr0.select(F.lit(None).cast(adj_t).alias("adj"), "fr0"))
        .agg(
            F.first("adj", ignorenulls=True).alias("adj"),
            F.first("fr0", ignorenulls=True).alias("fr0"),
        )
        .withColumn("vis0", F.col("fr0"))
    )
    empty = F.slice(F.col("fr0"), 1, 0)  # typed empty array, no cast guess
    for h in range(1, max_hops + 1):
        st = st.withColumn(
            f"fr{h}",
            F.array_except(
                F.array_distinct(
                    F.flatten(
                        F.transform(
                            F.col(f"fr{h - 1}"),
                            lambda k: F.coalesce(
                                F.element_at(F.col("adj"), k), empty
                            ),
                        )
                    )
                ),
                F.col(f"vis{h - 1}"),
            ),
        ).withColumn(f"vis{h}", F.concat(F.col(f"vis{h - 1}"), F.col(f"fr{h}")))
    # ONE combined explode so the 1-row lineage is evaluated once, not
    # once per hop level. NB: the hop level is bound via a def, not a
    # lambda default — F.transform treats a TWO-parameter lambda as
    # (element, index) and would feed the array index into `h`.
    def _level(h: int):
        return F.transform(
            F.col(f"fr{h}"),
            lambda x: F.struct(x.alias("node"), F.lit(h).cast("int").alias("hops")),
        )

    combined = F.concat(*[_level(h) for h in range(0, max_hops + 1)])
    return st.select(F.explode(combined).alias("s")).select("s.node", "s.hops")


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 3,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    broadcast_frontier: bool = True,
    broadcast_limit: int = 4_000_000,
    dense_limit: int = 2_000_000,
    cache_handles: list | None = None,
) -> DataFrame:
    """Breadth-first min-hop distances from a seed set over the
    UNDIRECTED simple graph induced by ``edges`` (k-hop reachability —
    the "what's within 3 links of these domains/parts" neighborhood
    probe). Returns (node, hops) for every node within ``max_hops``,
    hops = exact minimum distance (0 for seeds).

    Level-synchronous frontier expansion, unrolled declaratively:
    each round is one equi-join (edges x frontier) + a left-anti join
    against the visited set — both hash-partitioned by node id, and
    the frontier/visited relations are NODE-sized, never edge-sized.
    By BFS invariant a node discovered in round h has min-distance h,
    so no min-aggregation is needed across rounds.

    The undirected edge relation and each round's frontier are
    PERSISTED: without that, round h's plan re-derives every earlier
    frontier — and re-runs the (potentially expensive) edge build —
    once per reference, turning a linear expansion into an exponential
    one. ``cache_handles`` receives the persisted handles so
    long-lived serving sessions can unpersist after their action (the
    pagerank/minhash release contract); one-shot callers may ignore
    it.

    Dense fast path: the same single count that settles the broadcast
    guard dispatches graphs whose doubled-edge relation fits
    ``dense_limit`` rows to :func:`_bfs_hops_dense` — the whole
    expansion as higher-order array functions over one aggregated
    adjacency row, zero per-round jobs (the per-round broadcast
    materializations are pure scheduler latency on a few-thousand-edge
    graph). ``dense_limit=0`` disables the dispatch.

    Broadcast-budget fallback: one count of the persisted edge
    relation bounds every frontier and the visited set (node sets,
    <= 2|E| rows) — when the bound clears ``broadcast_limit``, the
    guard is settled for the whole expansion at the cost of a single
    job. Only graphs whose edge bound EXCEEDS the budget pay
    per-round frontier counts, and there the loop knows each
    relation's exact size BEFORE it would broadcast it: once the
    frontier or the accumulated visited set exceeds the budget,
    subsequent rounds flip to the co-partitioned sort-merge plan
    instead of broadcast-OOMing mid-expansion (a dense graph's
    round-2 frontier can be 100x round 1). Nothing is ever broadcast
    whose size wasn't already bounded or counted;
    ``broadcast_frontier=False`` skips broadcasting outright."""
    # NO distinct on the doubled edge relation: BFS is idempotent in
    # edge multiplicity (each round's frontier-candidate set has its own
    # distinct), so deduplicating 2|E| rows here would buy nothing and
    # cost a full edge-sized shuffle — the single most expensive step at
    # graph scale.
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .persist()
    )
    handles = [und]
    dist = seeds.select(F.col(node).alias("node")).distinct().withColumn(
        "hops", F.lit(0)
    )
    frontier = dist.select("node")
    bcast = broadcast_frontier
    per_round_counts = False
    if bcast:
        # ONE count of the persisted edge relation bounds EVERY later
        # relation: frontiers and the visited set are node sets, and
        # nodes <= 2|E| rows. When that bound clears the budget, no
        # per-round counting is needed at all — the guard costs one
        # job total, not one per round (measured: the per-round
        # variant put ~0.2 s of scheduler round-trips back on each
        # BFS round at fixture scale). The count doubles as the edge
        # build's materializing action, so round 1 starts warm.
        edge_bound = und.count()
        if edge_bound <= dense_limit:
            # small-graph fast path (VERDICT r12 #1b): the SAME budget
            # probe that clears the broadcast guard also tells us the
            # whole graph fits one adjacency row — run every round as
            # array expressions instead of paying ~2 broadcast jobs of
            # scheduler latency per round. dense_limit=0 disables
            # (tests exercise the frontier plan through it). The raw
            # seed projection goes in (not the distinct'd dist): the
            # seed collect_set dedupes for free, saving the distinct's
            # exchange (r13).
            dist = _bfs_hops_dense(
                und, seeds.select(F.col(node).alias("node")), max_hops
            )
            if cache_handles is not None:
                cache_handles.extend(handles)
            return dist
        per_round_counts = edge_bound > broadcast_limit
        if per_round_counts:
            # seeds were never counted — budget-check them before the
            # first broadcast, same rule as every later round
            visited_rows = frontier.count()
            bcast = visited_rows <= broadcast_limit
    for h in range(1, max_hops + 1):
        fr = frontier.withColumnRenamed("node", "u")
        if bcast:
            # frontier/visited are NODE-sized: broadcasting them keeps
            # the edge relation where it sits (no per-round edge
            # shuffle — the dominant cost otherwise; same dial as
            # pagerank's broadcast_ranks). Frontiers that outgrow
            # broadcast_limit flip to the co-partitioned sort-merge
            # plan below.
            fr = F.broadcast(fr)
        nxt = (
            und.join(fr, "u")
            .select(F.col("v").alias("node"))
            .distinct()
        )
        visited = dist.select("node")
        if bcast:
            visited = F.broadcast(visited)
        new = nxt.join(visited, "node", "left_anti").withColumn(
            "hops", F.lit(h)
        )
        if bcast:
            # a frontier small enough to BROADCAST is small enough to
            # cache in ONE partition: persist() pins the pre-AQE
            # 32-wide layout, and each later round re-reads every
            # earlier frontier — paying a full task wave per round for
            # microseconds of work (measured on the co-purchase graph:
            # 3.4 s -> 2.1 s end-to-end). Non-broadcast graphs keep
            # the wide layout their frontier volume needs.
            new = new.coalesce(1)
        new = new.persist()
        handles.append(new)
        if per_round_counts:
            # materialize + measure: this round ran with only already-
            # counted relations broadcast; whether the NEXT round may
            # broadcast depends on what this one produced
            frontier_rows = new.count()
            visited_rows += frontier_rows
            if bcast and (
                frontier_rows > broadcast_limit or visited_rows > broadcast_limit
            ):
                bcast = False
        dist = dist.unionByName(new)
        frontier = new.select("node")
    if cache_handles is not None:
        cache_handles.extend(handles)
    return dist


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """The k-core of the undirected simple graph induced by ``edges``
    — the maximal subgraph where every node keeps degree >= k, the
    classic cohesion filter (spam-farm detection, recommendation
    backbone extraction: low-degree fringe peels away, what remains
    is mutually-supported structure). Iterative peel: drop nodes of
    degree < k, recompute, repeat to fixpoint. Returns
    (node, degree) — in-core degrees, all >= k.

    Each round: one degree aggregate (node-keyed, partial agg) + two
    broadcast anti-joins against the PEELED set (churn-sized, usually
    tiny after round 1); `localCheckpoint` per round keeps planning
    O(1) per iteration like connected_components. Rounds are bounded
    by the peel depth — degenerate chains cost O(n) rounds in theory,
    but co-occurrence graphs peel in a handful (measured: 3 at test
    scale). If ``max_iter`` rounds exhaust BEFORE the fixpoint (deep
    peel chains), raises RuntimeError rather than silently returning a
    subgraph that still contains sub-k nodes — the caller could not
    otherwise distinguish that from convergence."""
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        # simple graph: a self-loop must not let a degree-(k-1) node
        # survive the peel on its own vote
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    cur = und
    for _ in range(max_iter):
        deg = cur.groupBy("u").agg(F.count(F.lit(1)).alias("c"))
        bad = deg.filter(F.col("c") < k).select(
            F.col("u").alias("_bad")
        ).localCheckpoint(eager=True)
        if bad.count() == 0:
            break
        cur = (
            cur.join(F.broadcast(bad), cur.u == bad._bad, "left_anti")
            .join(
                F.broadcast(bad.withColumnRenamed("_bad", "_bad2")),
                cur.v == F.col("_bad2"),
                "left_anti",
            )
            .localCheckpoint(eager=True)
        )
    else:
        # Loop fell off max_iter without hitting the empty-peel break:
        # verify the fixpoint actually landed (same convergence-probe
        # discipline as connected_components' label-sum check).
        leftover = (
            cur.groupBy("u")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") < k)
            .count()
        )
        if leftover:
            raise RuntimeError(
                f"k_core: peel did not reach fixpoint within max_iter="
                f"{max_iter} rounds ({leftover} node(s) still below degree "
                f"{k}); raise max_iter for deep-peel graphs (long chains)"
            )
    return cur.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )


def _bfs_sigma_levels(und, seeds, node: str, max_depth: int):
    """Level-synchronous multi-source BFS over a doubled edge relation
    ``und(u, v)``, carrying integer shortest-path counts: returns the
    per-level relations [(s, node, sigma)] for levels 0..<=max_depth
    (level 0 = the seeds, sigma 1). Each round is one frontier⋈edges
    equi-join + one anti-join against the visited set + a keyed SUM;
    every relation is (seed x node)-sized; localCheckpoint per round
    keeps planning O(1). Shared by betweenness_bounded and
    harmonic_centrality_sampled."""
    lvl0 = (
        seeds.select(F.col(node).alias("s"))
        .distinct()
        .select("s", F.col("s").alias("node"), F.lit(1).cast("long").alias("sigma"))
        .localCheckpoint(eager=True)
    )
    levels = [lvl0]
    visited = lvl0.select("s", "node")
    for _ in range(max_depth):
        f = levels[-1].select("s", F.col("node").alias("u"), "sigma")
        nxt = (
            f.join(und, "u")
            .select("s", F.col("v").alias("node"), "sigma")
            .join(visited, ["s", "node"], "left_anti")
            .groupBy("s", "node")
            .agg(F.sum("sigma").alias("sigma"))
            .localCheckpoint(eager=True)
        )
        if nxt.count() == 0:
            break
        levels.append(nxt)
        visited = visited.union(nxt.select("s", "node")).localCheckpoint(
            eager=True
        )
    return levels


def harmonic_centrality_sampled(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = 4,
    scale: int = 1_000_000,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    round_digits: int = 4,
    dedupe_edges: bool = True,
    cache_handles: list | None = None,
) -> DataFrame:
    """Sampled-source, bounded-depth HARMONIC centrality (Marchiori &
    Latora 2000; Boldi & Vigna's axiomatic pick among the closeness
    family — both public) over the undirected simple graph of
    ``edges``: H(v) = sum over seeds s (v != s, d(s,v) <= max_depth)
    of 1/d(s,v). Harmonic handles disconnected graphs where classic
    closeness breaks (unreachable pairs contribute 0 instead of
    infinity), and the same two caps as :func:`betweenness_bounded`
    make it affordable: sampled sources, bounded depth — beyond the
    horizon contributes nothing by construction.

    Returns (node, hc_fp, hc): hc_fp = integer sum of
    (scale DIV distance) — exact integers (scale=1e6: 1e6, 5e5,
    333333, 250000, ...), so the accumulation is order-independent
    and a SQL oracle replays it bit-for-bit; hc = round(hc_fp/scale).

    Same forward BFS and scale shape as betweenness (shared
    :func:`_bfs_sigma_levels`), minus the backward pass — one pass,
    (seed x node)-sized relations throughout."""
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u") != F.col("v"))
    )
    if dedupe_edges:
        und = und.distinct()
    und = und.persist()
    handles = [und]
    levels = _bfs_sigma_levels(und, seeds, node, max_depth)
    if cache_handles is not None:
        cache_handles.extend(handles)
    else:
        for h in handles:
            h.unpersist()
    parts = [
        lv.select("s", "node", F.lit(scale // d).cast("long").alias("t"))
        for d, lv in enumerate(levels)
        if d >= 1
    ]
    if not parts:
        return (
            levels[0]
            .select("node")
            .withColumn("hc_fp", F.lit(0).cast("long"))
            .withColumn("hc", F.lit(0.0))
            .filter(F.lit(False))
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy("node")
        .agg(F.sum("t").alias("hc_fp"))
        .withColumn(
            "hc",
            F.round(F.col("hc_fp").cast("double") / scale, round_digits) + 0.0,
        )
    )


def betweenness_bounded(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = 4,
    scale: int = 1_000_000,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    round_digits: int = 4,
    dedupe_edges: bool = True,
    cache_handles: list | None = None,
) -> DataFrame:
    """Sampled-source, bounded-depth betweenness centrality (Brandes
    2001; the pivot-sampling estimator of Brandes & Pich 2007 — both
    public) over the undirected simple graph of ``edges``: run
    Brandes' two-phase dependency accumulation from each seed, capped
    at ``max_depth`` BFS levels, and sum each node's dependency over
    the seeds. The bridge-detection measure: a node scores high when
    many shortest paths from the seeds pass THROUGH it, which degree/
    PageRank both miss (a low-degree cut vertex outranks a celebrity
    leaf). Exact betweenness is all-sources all-pairs — quadratic and
    unthinkable at 100 TB; sampled sources x bounded depth is the
    standard estimator, and both caps are explicit parameters.

    Returns (node, bc_fp, bc) for nodes with positive accumulated
    dependency: bc_fp = integer dependency in ``scale``-ths, bc =
    round(bc_fp / scale, round_digits). Seeds' own rows are excluded
    (Brandes accumulates dependency of s on v != s only).

    EXACT-replay contract (the recursive-oracle discipline): phase 1
    is level-synchronous multi-source BFS carrying integer path
    counts sigma(s, v); phase 2 walks levels deepest-first
    accumulating

        delta(v) = SUM over successors w of
                   (sigma_v * (scale + delta_w)) DIV sigma_w

    in int64 with truncating division — deterministic under any sum
    order, so a SQL engine re-derives it bit-for-bit (a double
    accumulation would be order-sensitive). Nodes at the depth cap
    take delta = 0: dependency flowing from beyond the horizon is
    deliberately not estimated.

    Scale shape: every relation is (seed x node)-sized, never
    edge-sized; each forward round is one frontier⋈edges equi-join +
    one anti-join against the visited set + a keyed partial-agg SUM,
    each backward round one join against the next level's (sigma,
    delta) relation. localCheckpoint per round keeps planning O(1)
    like k_core/connected_components; per-round counts are bounded by
    ``max_depth`` — a constant, not the peel-depth unknown k_core
    faces. Nothing is explicitly broadcast."""
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u") != F.col("v"))
    )
    if dedupe_edges:
        # sigma counts PATHS — a duplicate edge row would double-count
        # every path through it (BFS reachability is idempotent, path
        # counting is not). Callers whose edge build guarantees
        # distinct pairs skip the shuffle.
        und = und.distinct()
    und = und.persist()
    handles = [und]
    levels = _bfs_sigma_levels(und, seeds, node, max_depth)
    # backward accumulation; deepest level takes delta = 0 (zero rows
    # can never pass the positive-dependency output filter, so whether
    # the deepest level sits at the cap or the frontier emptied early
    # is immaterial to the result)
    dnext = levels[-1].withColumn("delta", F.lit(0).cast("long"))
    deltas = []
    for l in range(len(levels) - 2, 0, -1):
        w_side = dnext.select(
            "s",
            F.col("node").alias("w"),
            F.col("sigma").alias("sigma_w"),
            F.col("delta").alias("delta_w"),
        )
        v_side = levels[l].select("s", F.col("node").alias("u"), "sigma")
        contrib = (
            v_side.join(und, "u")
            .select("s", F.col("u").alias("node"), "sigma", F.col("v").alias("w"))
            .join(w_side, ["s", "w"])
            .select(
                "s",
                "node",
                F.expr(f"(sigma * ({scale} + delta_w)) DIV sigma_w").alias("c"),
            )
        )
        dl = (
            levels[l]
            .join(
                contrib.groupBy("s", "node").agg(F.sum("c").alias("delta")),
                ["s", "node"],
                "left",
            )
            .withColumn("delta", F.coalesce("delta", F.lit(0).cast("long")))
            .localCheckpoint(eager=True)
        )
        deltas.append(dl.select("s", "node", "delta"))
        dnext = dl
    if cache_handles is not None:
        cache_handles.extend(handles)
    else:
        for h in handles:
            h.unpersist()
    if not deltas:
        return (
            levels[0]
            .select("node")
            .withColumn("bc_fp", F.lit(0).cast("long"))
            .withColumn("bc", F.lit(0.0))
            .filter(F.lit(False))
        )
    u = deltas[0]
    for d in deltas[1:]:
        u = u.unionByName(d)
    return (
        u.groupBy("node")
        .agg(F.sum("delta").alias("bc_fp"))
        .filter(F.col("bc_fp") > 0)
        .withColumn(
            "bc",
            F.round(F.col("bc_fp").cast("double") / scale, round_digits) + 0.0,
        )
    )


def weighted_k_core(
    edges: DataFrame,
    s_min: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    max_iter: int = 30,
) -> DataFrame:
    """The s-core (weighted k-core; Eidsaa & Almaas 2013, public) of
    the undirected weighted graph induced by ``edges``: the maximal
    subgraph where every node keeps STRENGTH (sum of incident merged
    edge weights) >= ``s_min``. Where :func:`k_core` counts neighbors,
    this weighs them — two weight-10 ties survive a threshold ten
    weight-1 acquaintances would not, the right cohesion filter when
    edge weight encodes support/volume (co-purchase counts, message
    totals). Returns (node, strength, degree), both over the surviving
    core.

    Parallel edges merge additively and nonpositive merged weights are
    dropped (the weighted_pagerank/eigenvector contract — a negative
    weight would let a node's strength be pulled below zero by one
    edge while still counting its degree). Same iterative-peel scale
    shape as :func:`k_core`: per round one node-keyed SUM aggregate +
    two broadcast anti-joins against the churn-sized peeled set,
    localCheckpoint per round for O(1) planning; raises RuntimeError
    if ``max_iter`` rounds exhaust before the fixpoint."""
    w_expr = F.col(weight).cast("long")
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"), w_expr.alias("w"))
        .unionByName(
            edges.select(
                F.col(dst).alias("u"), F.col(src).alias("v"), w_expr.alias("w")
            )
        )
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
        .filter(F.col("w") > 0)
        .localCheckpoint(eager=True)
    )
    cur = und
    for _ in range(max_iter):
        strength = cur.groupBy("u").agg(F.sum("w").alias("s"))
        bad = strength.filter(F.col("s") < s_min).select(
            F.col("u").alias("_bad")
        ).localCheckpoint(eager=True)
        if bad.count() == 0:
            break
        cur = (
            cur.join(F.broadcast(bad), cur.u == bad._bad, "left_anti")
            .join(
                F.broadcast(bad.withColumnRenamed("_bad", "_bad2")),
                cur.v == F.col("_bad2"),
                "left_anti",
            )
            .localCheckpoint(eager=True)
        )
    else:
        leftover = (
            cur.groupBy("u")
            .agg(F.sum("w").alias("s"))
            .filter(F.col("s") < s_min)
            .count()
        )
        if leftover:
            raise RuntimeError(
                f"weighted_k_core: peel did not reach fixpoint within "
                f"max_iter={max_iter} rounds ({leftover} node(s) still below "
                f"strength {s_min}); raise max_iter for deep-peel graphs"
            )
    return cur.groupBy(F.col("u").alias("node")).agg(
        F.sum("w").alias("strength"), F.count(F.lit(1)).alias("degree")
    )


def label_propagation(
    edges: DataFrame,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label propagation over the undirected graph of
    ``edges`` — community detection for curation jobs (domain cliques,
    co-purchase cohorts) where connected components is too coarse
    (one bridge edge fuses everything) and modularity methods are too
    stateful for a declarative engine.

    labels_0(v) = v; each round every node adopts the MOST FREQUENT
    label among its neighbors, ties to the SMALLEST label — the
    deterministic variant, so a SQL oracle can unroll the same fixed
    number of rounds and re-derive every assignment exactly. Returns
    (node, label) after ``rounds`` synchronous updates.

    Scale shape: each round is one edge⋈labels equi-join (both sides
    hash-partitioned on the node id) + one (node, label)-keyed count
    with map-side partial aggregation + a node-keyed top-1 window —
    the exchange per round carries one row per (node, neighbor-label),
    never per edge. localCheckpoint after every round truncates the
    lineage the same way connected_components does; labels relations
    are node-sized throughout."""
    from pyspark.sql.window import Window

    ed = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        # simple graph: a self-loop would let a node vote for its own
        # label every round, freezing it against any majority
        .filter(F.col("a") != F.col("b"))
    )
    labels = (
        ed.select(F.col("a").alias("node")).distinct().withColumn("label", F.col("node"))
    )
    w = Window.partitionBy("node").orderBy(F.desc("c"), "label")
    for _ in range(rounds):
        cnt = (
            ed.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy(F.col("a").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
            .localCheckpoint(eager=False)
        )
    return labels


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 2,
    damping: float = 0.85,
    round_digits: int = 10,
    final_digits: int = 8,
    broadcast_ranks: bool = True,
    cache_handles: list | None = None,
) -> DataFrame:
    """Personalized (seeded-teleport) PageRank over the undirected
    simple graph of ``edges``: random walks restart at the SEED set
    instead of everywhere, so authority concentrates around the seeds —
    trusted-domain propagation for crawl curation, account-centric
    influence, 'related entities' serving. ``seeds`` is a one-column
    relation of node ids.

        pr_0(v)     = 1/|S| for seeds, else 0
        pr_{t+1}(v) = (1-d)*1{v in S}/|S| + d * SUM pr_t(u)/deg(u)

    Same engine-exactness contract as :func:`pagerank` (decimal-cast
    contributions, per-iteration rounding) and the same scale shape:
    rank/degree relations node-sized and broadcastable, one
    partial-aggregated groupBy(dst) per iteration; the seed flag rides
    the node relation. Nodes unreachable from the seeds hold rank 0
    and drop from the output."""
    from pyspark.sql.window import Window

    und = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .union(edges.select(F.col(dst).alias("src"), F.col(src).alias("dst")))
        .filter(F.col("src") != F.col("dst"))  # simple graph: no self-loops
        .distinct()
        .select(
            "src", "dst",
            F.count(F.lit(1)).over(Window.partitionBy("src")).alias("deg"),
        )
        .persist()
    )
    if cache_handles is not None:
        cache_handles.append(und)
    nodes = und.select(F.col("src").alias("node")).distinct()
    # teleport mass is split over seeds PRESENT IN THE GRAPH: a seed id
    # with no edges can neither receive nor spread rank, and counting
    # it would silently deflate every real seed's share
    seed_rel = seeds.toDF("node").distinct().join(nodes, "node", "semi")
    ns = F.broadcast(seed_rel.agg(F.count(F.lit(1)).alias("n_seeds")))
    flagged = F.broadcast(
        nodes.join(seed_rel.withColumn("_is_seed", F.lit(1)), "node", "left")
        .crossJoin(ns)
        .select(
            "node",
            (
                F.coalesce("_is_seed", F.lit(0)).cast("double")
                * F.lit(1.0 - damping)
                / F.col("n_seeds")
            ).alias("base"),
            (
                F.coalesce("_is_seed", F.lit(0)).cast("double") / F.col("n_seeds")
            ).alias("pr0"),
        )
    )
    pr = flagged.select("node", F.col("pr0").alias("pr"))
    for it in range(iters):
        prs = pr.withColumnRenamed("node", "src")
        if broadcast_ranks:
            prs = F.broadcast(prs)
        contrib = und.join(prs, "src").select(
            F.col("dst").alias("node"),
            (F.col("pr") / F.col("deg")).cast("decimal(28,12)").alias("w"),
        )
        digits = final_digits if it == iters - 1 else round_digits
        pr = (
            contrib.groupBy("node")
            .agg(F.sum("w").cast("double").alias("_s"))
            .join(flagged.select("node", "base"), "node")
            .select(
                "node",
                F.round(
                    F.col("base") + F.lit(damping) * F.col("_s"), digits
                ).alias("pr"),
            )
        )
    return pr.filter(F.col("pr") > 0)


def _wedge_candidates(
    edges: DataFrame, max_hub_degree: int | None
) -> tuple[DataFrame, DataFrame]:
    """Shared wedge scaffolding for the link-prediction pair: from the
    oriented simple edge list (src < dst), return (deg: (n, d) over the
    undirected view, wed: (u, v, dw) open wedges u-w-v with u < v, dw =
    degree of the middle node, and (u, v) not already an edge).

    r13 shape (guide §2.4 — remove shuffles outright): wedges are
    enumerated by GROUPING the doubled edge relation on the middle
    node and expanding sorted-neighbor pairs in-row (the co-purchase
    basket pattern), instead of the former w1 ⋈ w2 self-join. That
    join shuffled the edge relation TWICE on the middle key and then
    re-attached deg(w) via a broadcast; here one edge-sized exchange
    builds (w, neighbors) and every pair leaves the expansion already
    carrying dw — identical wedge set (neighbor sets are exact:
    collect_set over the doubled simple relation), strictly fewer
    edge passes at any scale. The degree relation is a projection of
    the same aggregate, not a second pass.

    ``max_hub_degree`` is the explicit fan-out bound: a middle node of
    degree d emits O(d^2) wedges, so one hub dominates at scale. The
    cap now filters BEFORE the pair expansion, so capped fan-out is
    never generated at all (the former semi-join pruning, minus the
    joins). Collecting a hub's neighbor set is degree-linear per node
    — the same per-key memory the join's build side held. Standard
    Adamic-Adar practice: an excluded hub contributes 1/ln(huge) ~ 0,
    and for common neighbors a hub certifies little."""
    und = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    nb = und.groupBy(F.col("src").alias("w")).agg(
        F.array_sort(F.collect_set("dst")).alias("ns")
    )
    deg = nb.select(F.col("w").alias("n"), F.size("ns").alias("d"))
    if max_hub_degree is not None:
        nb = nb.filter(F.size("ns") <= max_hub_degree)
    ns = F.col("ns")
    pairs = F.flatten(
        F.transform(
            ns,
            lambda x, i: F.transform(
                F.slice(ns, i + 2, F.size(ns)),
                lambda y: F.struct(x.alias("u"), y.alias("v")),
            ),
        )
    )
    wed = (
        nb.select(F.size("ns").alias("dw"), F.explode(pairs).alias("p"))
        .select(F.col("p.u").alias("u"), F.col("p.v").alias("v"), "dw")
        .join(
            edges.select(F.col("src").alias("u"), F.col("dst").alias("v")),
            ["u", "v"],
            "left_anti",
        )
    )
    return deg, wed


def common_neighbors_topk(
    edges: DataFrame, top_n: int = 20, max_hub_degree: int | None = None
) -> DataFrame:
    """Link prediction by common-neighbor count: the top-``top_n``
    NON-adjacent pairs sharing the most neighbors, plus neighborhood
    Jaccard. ``edges`` is the oriented simple edge list (src < dst).
    Returns (rank, u, v, cn, jaccard).

    Plan: wedges enumerated by middle-node grouping (u < v orientation
    halves them), anti-join against existing edges, endpoint degree
    relation broadcast; top-n as sort+limit so Catalyst plans
    TakeOrderedAndProject (per-partition heap + driver merge) instead
    of a single-partition global window — the rank window then runs
    over ``top_n`` rows only. ``max_hub_degree`` bounds the wedge
    fan-out explicitly (see :func:`_wedge_candidates`)."""
    from pyspark.sql.window import Window

    deg, wed = _wedge_candidates(edges, max_hub_degree)
    cand = wed.groupBy("u", "v").agg(F.count(F.lit(1)).alias("cn"))
    scored = (
        cand.join(
            F.broadcast(deg.select(F.col("n").alias("u"), F.col("d").alias("du"))),
            "u",
        )
        .join(
            F.broadcast(deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))),
            "v",
        )
        .select(
            "u",
            "v",
            "cn",
            (
                F.round(
                    F.col("cn").cast("double")
                    / (F.col("du") + F.col("dv") - F.col("cn")).cast("double"),
                    6,
                )
                + 0.0
            ).alias("jaccard"),
        )
    )
    wr = Window.orderBy(F.col("cn").desc(), "u", "v")
    return (
        scored.orderBy(F.col("cn").desc(), "u", "v")
        .limit(top_n)
        .withColumn("rank", F.row_number().over(wr))
        .select("rank", "u", "v", "cn", "jaccard")
    )


def adamic_adar_topk(
    edges: DataFrame, top_n: int = 20, max_hub_degree: int | None = None
) -> DataFrame:
    """Adamic-Adar link prediction — the degree-discounted upgrade of
    :func:`common_neighbors_topk`: each common neighbor w contributes
    1/ln(deg(w)), so shared HUBS count for little and shared rare
    neighbors count for much. Contributions are fixed-point int64
    (round(1e12/ln d): each term exact, both engines compute the same
    double before the round), so the SUM — the usual float-order
    hazard — is an integer and the top-n order is engine-exact.
    Returns (rank, u, v, cn, aa). Same wedge shape and
    ``max_hub_degree`` bound as common neighbors; the middle degree
    arrives ON the wedge row (r13 — see :func:`_wedge_candidates`), so
    the former deg broadcast join is gone entirely."""
    from pyspark.sql.window import Window

    deg, wed = _wedge_candidates(edges, max_hub_degree)
    del deg  # degrees ride the wedge rows
    contrib = wed.select(
        "u",
        "v",
        F.round(F.lit(1000000000000.0) / F.log(F.col("dw").cast("double")), 0)
        .cast("long")
        .alias("c"),
    )
    sc = contrib.groupBy("u", "v").agg(
        F.count(F.lit(1)).alias("cn"), F.sum("c").alias("s")
    )
    wr = Window.orderBy(F.col("s").desc(), "u", "v")
    return (
        sc.orderBy(F.col("s").desc(), "u", "v")
        .limit(top_n)
        .withColumn("rank", F.row_number().over(wr))
        .select(
            "rank",
            "u",
            "v",
            "cn",
            (
                F.round(F.col("s").cast("double") / 1000000000000.0, 6) + 0.0
            ).alias("aa"),
        )
    )


# ---------------------------------------------------------------------------
# Weighted shortest paths — Dijkstra-by-rounds over small-int costs (r13,
# ROADMAP_r12 #3)
# ---------------------------------------------------------------------------


def _dijkstra_levels(
    undw: DataFrame, seeds: DataFrame, node: str, max_dist: int, max_c: int
) -> dict[int, DataFrame]:
    """Level-synchronous multi-source DIJKSTRA over a doubled weighted
    edge relation ``undw(u, v, c)`` with small-int costs 1..max_c:
    settle nodes by exact distance value, one round per distance unit.
    Round d's candidates come from the settled levels d-1..d-max_c
    (an edge of cost c extends a node settled at d-c to total d); the
    anti-join against the visited set removes anything already settled
    shorter, which is exactly Dijkstra's invariant for positive
    integer costs — no priority queue, just max_c frontier levels in
    flight. Returns {distance: (s, node) relation} for the NON-EMPTY
    levels 0..max_dist; stops early when max_c consecutive levels come
    up empty (nothing further is reachable).

    The unweighted special case (all costs 1) degenerates to
    :func:`_bfs_sigma_levels`' forward walk minus sigma; relations
    stay (seed x node)-sized, localCheckpoint per round keeps planning
    O(1), and the edge relation joins co-partitioned — nothing is
    broadcast unmeasured (the bfs_hops budget discipline)."""
    lvl0 = (
        seeds.select(F.col(node).alias("s"))
        .distinct()
        .select("s", F.col("s").alias("node"))
        .localCheckpoint(eager=True)
    )
    levels = {0: lvl0}
    visited = lvl0
    for d in range(1, max_dist + 1):
        win = [
            levels[dd].select(
                "s",
                F.col("node").alias("u"),
                F.lit(d - dd).cast("long").alias("need"),
            )
            for dd in range(max(0, d - max_c), d)
            if dd in levels
        ]
        if not win:
            break  # max_c consecutive empty levels: frontier exhausted
        f = win[0]
        for w_ in win[1:]:
            f = f.unionByName(w_)
        nxt = (
            f.join(undw, "u")
            .filter(F.col("c") == F.col("need"))
            .select("s", F.col("v").alias("node"))
            .distinct()
            .join(visited, ["s", "node"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.count() > 0:
            levels[d] = nxt
            visited = visited.union(nxt).localCheckpoint(eager=True)
    return levels


def weighted_harmonic_sampled(
    edges: DataFrame,
    seeds: DataFrame,
    max_dist: int = 6,
    scale: int = 1_000_000,
    src: str = "src",
    dst: str = "dst",
    cost: str = "c",
    node: str = "node",
    round_digits: int = 4,
    dedupe_edges: bool = True,
    cache_handles: list | None = None,
) -> DataFrame:
    """Sampled-source WEIGHTED harmonic centrality: H(v) = sum over
    seeds s (v != s, weighted distance d(s,v) <= max_dist) of 1/d(s,v),
    where distances run Dijkstra-by-rounds (:func:`_dijkstra_levels`)
    over positive small-int edge costs in ``cost`` — the centrality
    that respects TIE STRENGTH (a strongly supported co-purchase edge
    is a short hop, a barely-supported one a long detour), where the
    unweighted variant treats both alike. Same sampled-source +
    bounded-total-distance caps as harmonic_centrality_sampled, same
    exact-integer readout: hc_fp = sum of (scale DIV distance) — every
    term an exact integer, the accumulation order-independent, the
    whole walk replayable by an unrolled SQL oracle.

    The max edge cost is MEASURED (one bounded aggregate), not
    assumed: it sets how many frontier levels stay in flight, and a
    non-positive cost raises instead of silently looping."""
    undw = (
        edges.select(
            F.col(src).alias("u"),
            F.col(dst).alias("v"),
            F.col(cost).cast("long").alias("c"),
        )
        .union(
            edges.select(
                F.col(dst).alias("u"),
                F.col(src).alias("v"),
                F.col(cost).cast("long").alias("c"),
            )
        )
        .filter(F.col("u") != F.col("v"))
    )
    if dedupe_edges:
        undw = undw.groupBy("u", "v").agg(F.min("c").alias("c"))
    undw = undw.persist()
    probe = undw.agg(F.max("c").alias("mx"), F.min("c").alias("mn")).first()
    if probe["mx"] is None:
        undw.unpersist()
        return (
            seeds.select(F.col(node).alias("node"))
            .withColumn("hc_fp", F.lit(0).cast("long"))
            .withColumn("hc", F.lit(0.0))
            .filter(F.lit(False))
        )
    if probe["mn"] < 1:
        undw.unpersist()
        raise ValueError(f"edge costs must be positive ints, min={probe['mn']}")
    levels = _dijkstra_levels(undw, seeds, node, max_dist, int(probe["mx"]))
    if cache_handles is not None:
        cache_handles.append(undw)
    else:
        undw.unpersist()
    parts = [
        lv.select("s", "node", F.lit(scale // d).cast("long").alias("t"))
        for d, lv in levels.items()
        if d >= 1
    ]
    if not parts:
        return (
            levels[0]
            .select("node")
            .withColumn("hc_fp", F.lit(0).cast("long"))
            .withColumn("hc", F.lit(0.0))
            .filter(F.lit(False))
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy("node")
        .agg(F.sum("t").alias("hc_fp"))
        .withColumn(
            "hc",
            F.round(F.col("hc_fp").cast("double") / scale, round_digits) + 0.0,
        )
    )


# ---------------------------------------------------------------------------
# Markov removal-effect attribution — absorbing chain over channel
# transitions (r13, ROADMAP_r12 #6)
# ---------------------------------------------------------------------------


def absorbing_removal_effects(
    trans: DataFrame,
    channels: list[str],
    iters: int = 12,
    scale: int = 1_000_000,
    conv: str = "conv",
    drop: str = "drop",
    start: str = "START",
) -> DataFrame:
    """Markov removal-effect attribution (Anderl et al. 2014, public)
    from a transition-COUNT relation ``trans(f, t, cnt)`` whose states
    are ``start``, the ``channels``, and the absorbing ``conv`` /
    ``drop``: P(absorb in conv | start) is estimated by ``iters``
    bounded matrix-power rounds (x_{k+1}(s) = sum_t P(s->t) * x_k(t),
    x(conv) = scale, x(drop) = 0, integer millionths with toward-zero
    division — the eigenvector/PageRank fixed-point contract, so an
    unrolled SQL oracle replays it bit-for-bit). The removal effect of
    channel c re-runs the SAME recurrence on the matrix with c's rows
    AND inbound transitions deleted (mass through a removed channel is
    lost, NOT renormalized — the standard removal semantics), all
    scenarios as one extra relation dimension, so the 1 + n_channels
    absorption problems share every join of one iteration chain.

    Returns one row per channel: (channel, p_conv_all, p_conv_removed
    — both in scale-ths — removal_effect = 1 - p_removed/p_all, and
    attr_share = the removal effect normalized over channels).

    Scale shape: the transition relation is (states^2)-bounded —
    everything here is bounded by the channel vocabulary, not the
    event volume; the one data-sized step (counting transitions) is
    the CALLER's single user-partitioned window pass. iters bounds the
    absorption horizon exactly like the centrality oracles bound BFS
    depth; journeys longer than iters contribute what their first
    iters steps reach."""
    spark = trans.sparkSession
    tot = trans.groupBy("f").agg(F.sum("cnt").alias("n"))
    prob = trans.join(tot, "f").select(
        "f", "t", F.expr(f"CAST(cnt * {scale} DIV n AS LONG)").alias("p")
    )
    # The absorption recurrence runs DRIVER-SIDE over the collected
    # probability relation (r14, guide §5): everything past this point
    # is (states^2 x scenarios)-bounded by the operator's contract, and
    # the relational loop paid iters x (join + agg) of AQE stage-jobs
    # plus a growing plan — ~4 s of near-pure scheduler latency at
    # sf0.01. Python ints are exact and DIV is replicated toward-zero
    # (similarity._trunc_div), so every integer below matches the
    # relational rounds bit-for-bit; the DOUBLE formatting (round /
    # attr_share division) stays an ENGINE expression over the shipped
    # integer relation so half-up rounding semantics match the oracle
    # exactly as before.
    from lakeapi_spark.operators.scale import local_df
    from lakeapi_spark.operators.similarity import _trunc_div

    prows = [(r["f"], r["t"], int(r["p"])) for r in prob.collect()]
    scen_names = ["all"] + list(channels)
    x_by_scen: dict = {}
    for sc in scen_names:
        ts_rows = (
            prows
            if sc == "all"
            else [(f, t, p) for (f, t, p) in prows if f != sc and t != sc]
        )
        x = {f: 0 for (f, _, _) in ts_rows}
        for _ in range(iters):
            nxt = {}
            for f in x:
                s = 0
                for ff, t, p in ts_rows:
                    if ff != f:
                        continue
                    if t == conv:
                        xv = scale
                    elif t == drop:
                        xv = 0
                    else:
                        xv = x.get(t, 0)  # left-join miss coalesces to 0
                    s += p * xv
                nxt[f] = _trunc_div(s, scale)
            x = nxt
        x_by_scen[sc] = x
    p_all = x_by_scen["all"].get(start)  # None == the old NULL max(when)
    out_rows = []
    for c in channels:
        p_removed = x_by_scen[c].get(start, 0) or 0  # coalesce(x, 0)
        re_fp = (
            None
            if p_all is None or p_all == 0
            else _trunc_div((p_all - p_removed) * scale, p_all)
        )
        out_rows.append((c, p_all, p_removed, re_fp))
    nn = [r[3] for r in out_rows if r[3] is not None]
    sum_re = sum(nn) if nn else None  # SUM over all-NULL is NULL
    re = local_df(
        spark,
        [r + (sum_re,) for r in out_rows],
        ["channel", "p_conv_all", "p_conv_removed", "re_fp", "sum_re"],
        "channel string, p_conv_all bigint, p_conv_removed bigint,"
        " re_fp bigint, sum_re bigint",
    )
    return re.select(
        "channel",
        "p_conv_all",
        "p_conv_removed",
        (F.round(F.col("re_fp").cast("double") / scale, 6) + 0.0).alias(
            "removal_effect"
        ),
        (
            F.round(
                F.col("re_fp").cast("double")
                / F.expr("CAST(NULLIF(sum_re, 0) AS DOUBLE)"),
                6,
            )
            + 0.0
        ).alias("attr_share"),
    )
