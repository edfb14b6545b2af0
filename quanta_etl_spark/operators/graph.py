"""Distributed connected components and dedup-cluster assembly.

Near-duplicate PAIRS (from MinHash/SimHash/embedding LSH — see
``operators.dedup``) are only half of a dedup pipeline: the pairs must
be grouped into clusters and one survivor kept per cluster. The
reference has no counterpart (its ETL is linear — dags/spark/etl.py has
no dedup at all); this is part of the LLM-training-data surface this
engine adds on top.

Connected components uses the alternating **large-star / small-star**
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC 2014): each round is one groupBy + one join on node id,
and the edge set converges to a star forest (every node points at its
cluster's minimum id) in O(log²  n) rounds — in practice 2-4 rounds for
dedup graphs, whose clusters are near-cliques. Contrast with naive
min-label propagation, which needs O(diameter) rounds and dies on long
chains.

At 100 TB every step here is a plain hash shuffle on node id: min() is
map-side combinable, hot nodes (a template shared by millions of docs)
are one skewed group that AQE splits, and no step ever materializes a
neighborhood in driver memory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _dedup_edges(edges: DataFrame, a: str, b: str) -> DataFrame:
    """Canonical undirected edge set: (lo, hi), self-loops dropped."""
    lo, hi = F.least(F.col(a), F.col(b)), F.greatest(F.col(a), F.col(b))
    return (
        edges.select(lo.alias("a"), hi.alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u: attach every LARGER neighbor to the minimum of
    N(u) ∪ {u}. Emits (v, m) for v > u — strictly decreases the sum of
    component heights without ever disconnecting anything."""
    bidir = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    mins = bidir.groupBy("a").agg(
        F.least(F.min("b"), F.first("a")).alias("m")
    )
    return (
        bidir.join(mins, "a")
        .where(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """For each node u: attach u and every SMALLER-or-equal neighbor to
    the minimum of that set. The (u, m) edge keeps u connected.

    The larger→smaller direction is derived with greatest/least, NOT
    by assuming the input arrives canonically ordered (r12 bug, found
    by the sf10 differential sweep): ``_large_star`` emits its edges
    as (larger, smaller), so the old ``b→a`` flip re-oriented them to
    (smaller, larger) — grouping by the SMALLER endpoint, whose
    "smaller-or-equal neighbors" set is empty, which made small-star a
    NO-OP on every round after the first large-star. The loop then ran
    large-star alone, whose own fixpoint is not necessarily a star
    forest: on the sf10 multikey entity graph (1.5M sparse ids
    stitched by two mod-key families, 2.84M edges) it settled at 2.79M
    edges and fragmented the true 100×15,000-member clustering into
    ~700 pieces — silently, because the composed checksum was stable.
    Every graph below ``small_graph_edges`` dodged the bug via the
    union-find path, which is why eleven rounds of sf0.01/sf1 sweeps
    never caught it."""
    # direct every edge from the larger endpoint to the smaller,
    # regardless of the input's orientation
    dir_e = e.select(
        F.greatest(F.col("a"), F.col("b")).alias("a"),
        F.least(F.col("a"), F.col("b")).alias("b"),
    )
    mins = dir_e.groupBy("a").agg(
        F.least(F.min("b"), F.first("a")).alias("m")
    )
    joined = dir_e.join(mins, "a")
    out = joined.select(F.col("b").alias("a"), F.col("m").alias("b")).union(
        mins.select(F.col("a"), F.col("m").alias("b"))
    )
    return out.where(F.col("a") != F.col("b")).distinct()


def _edge_checksum(e: DataFrame) -> tuple[int, int]:
    """(count, order-insensitive hash) — one tiny job per iteration.

    Equality of checksums across an iteration certifies the fixpoint
    without a full set-difference join."""
    # bit_xor, not sum: order-insensitive and overflow-free under ANSI
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("a", "b")), F.lit(0)).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def _free_local_checkpoint(df: DataFrame) -> None:
    """Release a localCheckpointed DataFrame's storage blocks NOW.

    ``Dataset.unpersist`` only uncaches CacheManager-registered
    ``persist()`` entries; a localCheckpoint's blocks are NOT
    registered there, so the public API is a silent no-op on them
    (verified on PySpark 4.1.2: blocks remain fully cached after
    ``unpersist(blocking=True)``). Reaching the LogicalRDD's
    underlying RDD via py4j and unpersisting THAT frees the blocks
    immediately — without it, superseded rank/edge generations pin
    storage until driver GC + ContextCleaner get around to them,
    which at sf100 working sets means "never, before the OOM".

    The frame is UNUSABLE afterwards (its lineage was truncated at
    the checkpoint, so lost blocks cannot be recomputed) — callers
    must only pass generations nothing references again. Best-effort:
    the py4j path is private API, so any reflection failure falls
    back to the old GC-eventually behavior rather than erroring.

    Also releases plain ``persist()`` caches (r14): the first
    superseded generation of the CC loop is now a persisted frame,
    not a checkpoint, and for those the public ``Dataset.unpersist``
    IS the correct (and sufficient) release path.
    """
    try:
        df.unpersist(False)
    except Exception:
        pass
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def _cc_single_task(e: DataFrame) -> DataFrame:
    """Union-find over the whole edge set in ONE executor task — the
    small-graph fast path. Star contraction costs ~4 Spark jobs per
    round no matter how small the graph is; below a few hundred
    thousand edges that fixed overhead dwarfs the work, and a
    path-compressed disjoint-set over one partition answers in
    milliseconds. The output contract is identical to the distributed
    path: (node, component=min reachable id), one row per node."""
    import pandas as pd

    node_t = e.schema["a"].dataType
    out_schema = (
        f"node {node_t.simpleString()}, component {node_t.simpleString()}"
    )

    def part(pdfs):
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for pdf in pdfs:
            for u, v in zip(pdf["a"], pdf["b"]):
                if u not in parent:
                    parent[u] = u
                if v not in parent:
                    parent[v] = v
                ru, rv = find(u), find(v)
                if ru != rv:
                    # union by id: larger root under smaller keeps the
                    # min-id-as-label invariant without a second pass
                    if rv < ru:
                        ru, rv = rv, ru
                    parent[rv] = ru
        if parent:
            nodes = list(parent)
            yield pd.DataFrame(
                {"node": nodes, "component": [find(n) for n in nodes]}
            )

    # coalesce(1), not repartition(1): the input is already
    # materialized (persisted/checkpointed by connected_components),
    # so one task reading the cached blocks directly beats a
    # 1-partition shuffle of the whole edge set (r14; narrow
    # dependency, zero shuffle I/O). Union-find is order-insensitive,
    # so the partition traversal order cannot change the labels.
    return e.coalesce(1).mapInPandas(part, out_schema)


def connected_components(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
    max_iterations: int = 20,
    small_graph_edges: int = 500_000,
) -> DataFrame:
    """Label every node in the undirected graph with the MINIMUM node id
    reachable from it. Returns ``(node, component)`` — one row per
    distinct node appearing in ``edges``.

    Size-adaptive: the deduped edge count (already computed for the
    convergence checksum) picks the algorithm. At or below
    ``small_graph_edges`` the whole graph goes through one union-find
    task (dedup-pair graphs are tiny relative to their corpus — bounded
    by the duplicate count, not the corpus size); above it, the
    O(log n)-round star contraction whose every step is a plain hash
    shuffle. Pass ``small_graph_edges=0`` to force the distributed path.

    Each iteration eagerly localCheckpoints the edge frame: the output
    of round k is consumed by both round k+1 and the convergence
    checksum, and a lazily-checkpointed subtree consumed twice gets
    computed twice (see NOTES.md round-2 landmine).

    The INITIAL edge set is persisted, not checkpointed (r14): the
    checksum aggregate that immediately follows materializes the
    cache in the same action, so the separate eager-checkpoint
    barrier job disappears — one job instead of two before the
    algorithm is even chosen. Lineage depth grows by just the one
    dedup layer (the loop still truncates per round), and
    ``_free_local_checkpoint`` releases persisted frames too, so the
    generation-freeing discipline is unchanged.
    """
    from pyspark import StorageLevel

    e = _dedup_edges(edges, a, b).persist(StorageLevel.MEMORY_AND_DISK)
    prev = _edge_checksum(e)
    if prev[0] <= small_graph_edges:
        return _cc_single_task(e)
    for _ in range(max_iterations):
        superseded = e
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # free the PREVIOUS generation's checkpoint blocks now that the
        # new one is materialized — bounds live storage to 2 edge
        # generations instead of one per round (r13; see
        # _free_local_checkpoint for why Dataset.unpersist can't)
        _free_local_checkpoint(superseded)
        cur = _edge_checksum(e)
        if cur == prev:
            break
        prev = cur
    else:
        # r12: never proceed silently on an unconverged edge set — the
        # labels below assume a star forest, and wrong clusters are
        # strictly worse than a loud failure.
        raise RuntimeError(
            f"connected_components: star contraction did not converge "
            f"within max_iterations={max_iterations} "
            f"({prev[0]} edges at last round); raise max_iterations"
        )
    # Certify the fixpoint IS a star forest before trusting it: in a
    # star forest no node appears as both a child (left) and a root
    # (right). A checksum-stable state that fails this would have
    # produced silently fragmented clusters (the r12 small-star
    # orientation bug did exactly that at sf10); one set-intersection
    # job at exit is cheap insurance against any future operator drift.
    if e.select("a").intersect(e.select("b")).limit(1).count() > 0:
        raise RuntimeError(
            "connected_components: contraction reached a checksum "
            "fixpoint that is not a star forest (a node is both child "
            "and root) — star operators are broken; refusing to emit "
            "fragmented clusters"
        )
    # fixpoint: e is a star forest (child -> root). Roots appear only on
    # the right; give each a self-labelled row so every node gets one.
    labels = e.select(F.col("a").alias("node"), F.col("b").alias("component"))
    roots = e.select(F.col("b").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return labels.unionByName(roots).groupBy("node").agg(
        F.min("component").alias("component")
    )


def assign_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
    small_graph_edges: int = 500_000,
) -> DataFrame:
    """Near-dup pairs → ``(id, cluster_id, is_survivor)``: cluster_id is
    the minimum member id (the deterministic survivor — same rule as
    ``exact_dedup_by_fingerprint``), ``is_survivor`` marks it. Docs not
    in any pair are absent — join back to the corpus with a left join
    and ``coalesce(cluster_id, id)`` to keep singletons."""
    cc = connected_components(
        pairs, id_a, id_b, max_iterations, small_graph_edges
    )
    return cc.select(
        F.col("node").alias("id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("is_survivor"),
    )


def apply_dedup(
    corpus: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
    small_graph_edges: int = 500_000,
) -> DataFrame:
    """The last step of the dedup pipeline: drop every non-survivor.
    Clusters the near-dup pairs, keeps the minimum-id member of each
    cluster, and anti-joins the losers out of the corpus — documents in
    no pair pass through untouched.

    The loser set is tiny relative to the corpus (it is bounded by the
    number of near-duplicate documents), so the anti-join's build side
    is the loser table; AQE turns it into a broadcast join when it fits.
    """
    losers = (
        assign_clusters(pairs, id_a, id_b, max_iterations, small_graph_edges)
        .where(~F.col("is_survivor"))
        .select(F.col("id").alias(id_col))
    )
    return corpus.join(losers, id_col, "left_anti")


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    in_memory_edges: int = 30_000_000,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list — the canonical
    iterative-join algorithm, included to demonstrate how this engine
    runs fixpoint graph workloads (the CC routine above converges by
    checksum; PageRank runs a declared iteration budget, the common
    production choice because rank deltas stabilize long before exact
    convergence).

    Semantics: dangling nodes (no out-edges) hold rank but leak their
    mass (the simple formulation most SQL engines mirror 1:1 —
    deterministic and cross-engine reproducible). Initial rank 1/N;
    each round: rank = (1-d)/N + d * Σ_in rank/out_deg.

    Determinism at scale: per-round contribution sums accumulate in
    decimal(38,18), so results are identical across partitionings and
    task orders — the same discipline every gated aggregate in this
    engine keeps. The loop is K chained (join + groupBy) stages, all
    hashing on node id; ranks are localCheckpointed every round to
    truncate lineage (without it, round k's plan re-derives rounds
    1..k-1 and the DAG grows quadratically).

    At 100 TB: out_deg and the node set are computed once; each
    iteration shuffles edge-count rows on dst — pre-bucketing edges by
    dst makes every round exchange-free on the big side.

    Memory discipline (r12, revised r13; measured at sf100 = 600M
    distinct edges / 21M nodes in one JVM): the edge checkpoint is
    DISK_ONLY — a localCheckpoint's blocks are the lineage-truncation
    point, so they pin storage memory for the whole loop if cached
    on-heap, and the 600M-edge cache OOMed a 72g heap before round 1
    (and, held alongside per-round execution memory, a 100g heap by
    round 3). Edges are scanned once per round sequentially — exactly
    the access pattern disk-backed storage is free for. r13 makes the
    read path adaptive: at or below ``in_memory_edges`` (counted from
    the materialized checkpoint — the count is the checkpoint's
    materializing action, so it is not an extra derivation pass) a
    MEMORY_AND_DISK ``persist()`` is layered on top, so small graphs
    iterate against the columnar cache while the disk blocks remain
    the lineage root — this reclaims the local-scale cost the r12
    DISK_ONLY move introduced (sf0.1 bench 3.2→4.5s) without touching
    the sf100 posture (above the threshold nothing changes).

    Rank-generation discipline is adaptive on the same threshold.
    ABOVE it (the sf100 regime), per-round ranks are checkpointed
    EAGERLY so the superseded generation can be FREED immediately —
    via ``_free_local_checkpoint`` (r13): ``Dataset.unpersist`` is a
    silent no-op on checkpoint blocks (not CacheManager-registered),
    so the r12 code's eager-release claim only held for the DISK_ONLY
    edges; rank generations actually accumulated until driver GC. All
    loop invariants are likewise freed before returning — the
    returned frame is its own materialized checkpoint and owes them
    nothing. AT OR BELOW the threshold, rank checkpoints stay LAZY
    (lineage still truncates at first materialization, but the loop
    issues zero barrier jobs — measured 5.6→5.1s at sf0.1,
    interleaved same-session min-of-3) and nothing is freed eagerly:
    K node-count generations are noise at small scale, the returned
    plan still references the unmaterialized invariants, and the
    session's usual cache hygiene (bench drops leftover persists;
    ContextCleaner otherwise) reclaims them. None of this affects
    results: storage level and materialization order do not touch
    the decimal fold.
    """
    from pyspark import StorageLevel

    # Loop invariants are localCheckpointed once: every iteration
    # references e/nodes/out_deg/n_frame, and without truncation each
    # round would re-derive them from the raw edge source (measured:
    # 4x the per-round cost at sf0.1).
    e_cp = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    # materialize + count in one action; small graphs then iterate
    # against an on-heap columnar cache fed from the disk root
    e = e_cp
    small = e_cp.count() <= in_memory_edges
    if small:
        e = e_cp.persist(StorageLevel.MEMORY_AND_DISK)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    out_deg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("out_deg"))
        .localCheckpoint(eager=False)
    )
    # N via a 1-row frame, crossJoin-broadcast (never .collect())
    n_frame = nodes.agg(
        F.count(F.lit(1)).cast("double").alias("n")
    ).localCheckpoint(eager=False)
    ranks = nodes.crossJoin(F.broadcast(n_frame)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    # big graphs pay a barrier job per generation to gain the right to
    # free the superseded one; small graphs skip both (docstring)
    ranks = ranks.localCheckpoint(eager=not small)
    for _ in range(iterations):
        contribs = (
            e.join(out_deg, "src")
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
        )
        summed = contribs.groupBy("node").agg(
            F.sum(F.col("c").cast("decimal(38,18)")).cast("double").alias("s")
        )
        prev = ranks
        ranks = (
            nodes.join(summed, "node", "left")
            .crossJoin(F.broadcast(n_frame))
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("n")
                    + damping * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
            # big path — eager: materialize THIS generation before
            # dropping the previous one (lazy would pin all K
            # generations until the terminal action)
            .localCheckpoint(eager=not small)
        )
        if not small:
            _free_local_checkpoint(prev)
    if not small:
        # big path: the final ranks are their own (materialized)
        # checkpoint; release everything the loop pinned before
        # handing them back. Small path must NOT free — the returned
        # lazy plan still references the unmaterialized invariants.
        for invariant in (e_cp, nodes, out_deg, n_frame):
            _free_local_checkpoint(invariant)
    return ranks


def _canonical_undirected(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Canonical undirected simple edge set (a < b): least/greatest
    orientation, self-loops dropped, duplicates collapsed — the shared
    first step of every undirected-graph operator here (one fix to
    edge canonicalization lands everywhere)."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _both_directions(e: DataFrame) -> DataFrame:
    return e.select("a", "b").union(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )


def _degrees(e: DataFrame) -> DataFrame:
    """(node, deg) over a canonical undirected edge set."""
    return _both_directions(e).groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle counts over an undirected simple graph —
    the clustering/community primitive, via the standard degree-
    ordered wedge join (each triangle found exactly once).

    Algorithm: canonicalize edges to (lo, hi) by (degree, id) order —
    every edge points from the lower-degree endpoint to the higher —
    then join wedges (a→b, a→c with b<c) against the edge set to close
    them. Degree ordering bounds wedge fan-out by O(sqrt(m)) per node
    (arboricity argument), which is what makes this survive power-law
    graphs at 100 TB where naive wedge-joining on raw direction
    explodes on hub nodes. Three hash shuffles total (degree agg,
    wedge build, closing join) — no iteration.

    Returns (node, triangles) for every node of the graph, 0 included.
    """
    # The canonical edge set and the degree frame are each read by
    # several downstream joins; checkpoint once so the upstream scan +
    # distinct doesn't re-execute per consumer (same discipline as
    # pagerank's loop invariants).
    e = _canonical_undirected(edges, src, dst).localCheckpoint(eager=False)
    both = _both_directions(e)
    deg = _degrees(e).localCheckpoint(eager=False)
    # Orient every edge lower-rank → higher-rank by (deg, id).
    ranked = (
        both.join(deg.withColumnRenamed("node", "a"), "a")
        .withColumnRenamed("deg", "da")
        .join(
            deg.select(
                F.col("node").alias("b"), F.col("deg").alias("db")
            ),
            "b",
        )
    )
    oriented = ranked.where(
        (F.col("da") < F.col("db"))
        | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    ).select(F.col("a").alias("lo"), F.col("b").alias("hi")).localCheckpoint(
        eager=False
    )
    # Wedges centered at the lowest-ranked vertex; close with an edge.
    w1 = oriented.select(
        F.col("lo").alias("c"), F.col("hi").alias("x")
    )
    w2 = oriented.select(
        F.col("lo").alias("c"), F.col("hi").alias("y")
    )
    wedges = w1.join(w2, "c").where(F.col("x") < F.col("y"))
    # NOTE: union() is positional — the reversed frame must emit
    # (hi, lo) in column ORDER, not rely on aliases.
    closing = oriented.select(
        F.col("lo").alias("x"), F.col("hi").alias("y")
    ).union(
        oriented.select(
            F.col("hi").alias("x"), F.col("lo").alias("y")
        )
    ).distinct()
    tri = wedges.join(closing, ["x", "y"])
    per_node = (
        tri.select(F.col("c").alias("node"))
        .union(tri.select(F.col("x").alias("node")))
        .union(tri.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return (
        deg.select("node")
        .join(per_node, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
        )
    )


def bfs_depths(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 3,
    directed: bool = False,
) -> DataFrame:
    """Multi-source breadth-first search: minimum hop count from any
    source node, up to ``max_hops`` — reachability/radius analysis as
    a fixed-budget iterative join (the same fixpoint pattern as
    :func:`pagerank`, min-aggregated instead of summed).

    ``sources`` is a 1-column DataFrame of node ids (depth 0). Each
    round expands the CURRENT frontier only (rows at depth k), unions
    into the visited set, and min-aggregates — so work per round is
    proportional to the frontier, not the visited set. Frontiers are
    localCheckpointed to truncate lineage. Unreachable nodes (within
    the budget) are absent from the result.

    At 100 TB: the edge list is the loop invariant — pre-partition it
    on the join key once (bucketing) and every round's expansion is
    exchange-free on the big side.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if not directed:
        e = e.union(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
    e = e.distinct().localCheckpoint(eager=False)
    visited = (
        sources.toDF("node")
        .distinct()
        .select("node", F.lit(0).alias("depth"))
        .localCheckpoint(eager=False)
    )
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(
                e, frontier["node"] == e["u"], "inner"
            )
            .select(F.col("v").alias("node"), F.lit(hop).alias("depth"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .localCheckpoint(eager=False)
        )
        visited = visited.union(nxt).localCheckpoint(eager=False)
        frontier = nxt
    return visited.groupBy("node").agg(F.min("depth").alias("depth"))


def link_prediction_jaccard(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    top_k: int = 20,
) -> DataFrame:
    """Jaccard-coefficient link prediction: for node pairs that share
    at least one neighbor but are NOT connected, score
    |Γ(a)∩Γ(b)| / |Γ(a)∪Γ(b)| and return the ``top_k`` predicted
    links — the classic "who should connect next" primitive
    (recommendations, knowledge-graph completion).

    Shape: candidates come from a wedge join through the shared
    neighbor (only pairs with ≥1 common neighbor ever materialize —
    never the all-pairs square), common-neighbor counts aggregate on
    the pair key, degrees join in from a broadcastable node frame, and
    existing edges are anti-joined away. Hub fan-out in the wedge is
    the scale knob — cap or sample super-hub adjacency in the same way
    the dedup family caps hot buckets.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    adj = e.select(F.col("a").alias("n"), F.col("b").alias("nb")).union(
        e.select(F.col("b").alias("n"), F.col("a").alias("nb"))
    )
    deg = adj.groupBy("n").agg(F.count(F.lit(1)).alias("deg"))
    # wedges through the shared neighbor nb: (x, nb), (y, nb), x < y
    w1 = adj.select(F.col("nb").alias("c"), F.col("n").alias("x"))
    w2 = adj.select(F.col("nb").alias("c"), F.col("n").alias("y"))
    common = (
        w1.join(w2, "c")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    candidates = common.join(
        e, (common["x"] == e["a"]) & (common["y"] == e["b"]), "left_anti"
    )
    scored = (
        candidates.join(deg.withColumnRenamed("n", "x"), "x")
        .withColumnRenamed("deg", "deg_x")
        .join(
            deg.select(F.col("n").alias("y"), F.col("deg").alias("deg_y")),
            "y",
        )
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("deg_x") + F.col("deg_y") - F.col("common")),
        )
    )
    return (
        scored.select(
            F.col("x").alias("node_a"),
            F.col("y").alias("node_b"),
            "common",
            "jaccard",
        )
        .orderBy(
            F.col("jaccard").desc(),
            F.col("node_a").asc(),
            F.col("node_b").asc(),
        )
        .limit(top_k)
    )


def clustering_coefficient(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Local clustering coefficient per node over an undirected simple
    graph: ``2·T(v) / (deg(v)·(deg(v)−1))`` — how close each node's
    neighborhood is to a clique (the community-structure diagnostic
    that pairs with ``triangle_counts``).

    Reuses the degree-ordered wedge join of :func:`triangle_counts`
    (O(sqrt(m)) wedge fan-out per node, hub-safe), plus one degree
    aggregation and a join on the node key. Degree-0/1 nodes have no
    possible wedge — their coefficient is NULL, not 0 (a 0 would
    conflate "no closed wedges" with "no wedges possible").

    Returns (node, deg, triangles, clustering_coeff).
    """
    tri = triangle_counts(edges, src, dst)
    deg = _degrees(_canonical_undirected(edges, src, dst))
    d = F.col("deg").cast("double")
    coeff = F.when(
        F.col("deg") >= 2,
        F.lit(2.0) * F.col("triangles").cast("double") / (d * (d - 1.0)),
    )
    return (
        tri.join(deg, "node")
        .select("node", "deg", "triangles", coeff.alias("clustering_coeff"))
    )


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_peels: int = 8,
) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly drop
    nodes of degree < ``k`` (and their incident edges) until stable or
    ``max_peels`` rounds — the standard dense-subgraph / influence
    filter.

    Semantics are FIXED-ROUND: the result is "the graph after
    ``max_peels`` peels", which equals the true k-core whenever
    peeling converges earlier (extra rounds are then no-ops — the
    early-exit below is a pure optimization, never a semantic change).
    This makes the operator oracle-checkable by unrolling the same
    rounds in SQL (the ``pagerank`` discipline).

    Scale shape: each round is one degree aggregation + two semi-joins
    on the canonical edge set, with ``localCheckpoint`` truncating
    lineage per round (iterative-algorithm discipline shared with
    ``pagerank``/``connected_components``); the early-exit costs one
    count action per round and stops the common case after the graph
    stabilizes in 2-4 peels.

    Returns (node, deg) for nodes in the surviving core (deg >= k
    within the peeled edge set).
    """
    # The connected_components-style persist+count fusion was tried
    # here too (r14) and REVERTED on measurement: k_core re-reads the
    # edge frame several times per peel round (degree agg + two
    # semi-joins), and iterating against the InMemoryRelation measured
    # ~2× slower than against the materialized checkpoint RDD
    # (isolated A/B min-of-3: 1.38s checkpoint vs 2.65s persist) —
    # the barrier job it saves is cheaper than what the loop loses.
    e = _canonical_undirected(edges, src, dst).localCheckpoint(eager=True)
    n_edges = e.count()
    for _ in range(max_peels):
        if n_edges == 0:
            break
        keep = _degrees(e).where(F.col("deg") >= k).select("node")
        e = (
            e.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        n2 = e.count()
        if n2 == n_edges:
            break  # stable: further peels are no-ops
        n_edges = n2
    return _degrees(e).where(F.col("deg") >= k)
