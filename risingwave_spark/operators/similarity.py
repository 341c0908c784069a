"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and an LSH-bucketed
(random-hyperplane sign) variant as the scale path — at 100 TB you bucket
first (map-side signature, shuffle only within buckets), brute-force only
within candidate buckets.

Everything is JVM-side higher-order functions (zip_with/aggregate) — no
Python in the hot path. A Pandas-UDF/numpy batch variant is provided for
when vectors are wide enough that Arrow+BLAS beats codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def dot(a, b):
    """Sequential left-to-right float64 dot product (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a, b):
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


_SCALE = 1 << 20


def _scaled(a):
    """Vector elements as exact scaled integers (deterministic rounding)."""
    return F.transform(a, lambda x: F.round(x.cast("double") * _SCALE, 0).cast("long"))


def _isum(arr):
    return F.aggregate(arr, F.lit(0).cast("long"), lambda acc, x: acc + x)


def cosine_exact(a, b):
    """Bit-deterministic cosine: dot and squared norms are exact integer
    sums of 2^20-scaled elements (order-independent), then one double
    division — identical across engines/partitionings. Used where results
    are hash-compared; `cosine` (pure float) is the production fast path.

    NB: inline form — evaluates scaling + BOTH norms per invocation. In
    join hot paths use `scaled_with_sqnorm` + `cosine_prescaled` so each
    side's scaling/norm is computed once per VECTOR, not once per PAIR.
    """
    ai, bi = _scaled(a), _scaled(b)
    d = _isum(F.zip_with(ai, bi, lambda x, y: x * y)).cast("double")
    na = _isum(F.transform(ai, lambda x: x * x)).cast("double")
    nb = _isum(F.transform(bi, lambda x: x * x)).cast("double")
    return d / F.sqrt(na * nb)


def scaled_with_sqnorm(df: DataFrame, id_col: str, vec_col: str, prefix: str) -> DataFrame:
    """(id, scaled vector, squared norm) — the map-side prep for pairwise
    cosine. At 100 TB this runs once per vector before any join/shuffle,
    leaving only the O(dims) dot product as per-pair work."""
    d = df.select(
        F.col(id_col).alias(f"{prefix}_id"), _scaled(F.col(vec_col)).alias(f"{prefix}_vec")
    )
    return d.withColumn(
        f"{prefix}_sq", _isum(F.transform(f"{prefix}_vec", lambda x: x * x))
    )


def cosine_prescaled(avec, bvec, asq, bsq):
    """Cosine from pre-scaled vectors + precomputed squared norms."""
    d = _isum(F.zip_with(avec, bvec, lambda x, y: x * y)).cast("double")
    return d / F.sqrt(asq.cast("double") * bsq.cast("double"))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Exact brute-force cosine top-k: for each query vector, the k nearest
    other vectors. Queries are broadcast (small side); candidates stream.

    Output: (query_id, neighbor_id, cos) with rank ties broken by id.
    Cosine is rounded before ranking so ordering is stable cross-engine.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    c = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("__qvec"), F.col("__cvec")), round_digits))
        .drop("__qvec", "__cvec")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos")
    )


def ann_planes(n_planes: int = 8, dims: int = 64) -> list[list[int]]:
    """Deterministic small-integer hyperplanes (values in [-3, 3]) — a
    seeded stand-in for random Gaussian planes. Integer coefficients ×
    scaled-integer vectors give EXACT dot products, so the bucket
    assignment is bit-identical across engines (oracle-able)."""
    return [
        [((i * dims + d) * 2654435761 % 7) - 3 for d in range(dims)]
        for i in range(n_planes)
    ]


def int_hyperplane_bucket(scaled_vec_col, planes: list[list[int]]):
    """LSH bucket id from a PRE-SCALED integer vector column (see
    `scaled_with_sqnorm`): bit i = sign of the exact integer dot with
    plane i. Stage the scaled vector as a real column first — passing an
    inline `_scaled(...)` expression re-evaluates it once per plane."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(int(x)) for x in p])
        d = _isum(F.zip_with(scaled_vec_col, arr, lambda x, y: x * y))
        bucket = bucket + F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket.cast("long")


def hyperplane_signature(vec_col, planes: list[list[float]]):
    """Random-hyperplane LSH signature: one sign bit per plane, packed into
    a long. Planes are literals (driver-generated, seeded) — they compile
    into the plan, no broadcast needed."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.when(dot(vec_col, plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def cosine_topk_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """LSH-bucketed ANN: compare only vectors whose hyperplane signature
    matches the query's (same bucket). Recall < 1.0 by construction; at
    scale you'd probe multiple tables / neighboring buckets."""
    sig = lambda df, idn: df.select(  # noqa: E731
        F.col(id_col).alias(idn),
        F.col(vec_col).alias(f"__{idn}_vec"),
        hyperplane_signature(F.col(vec_col), planes).alias("bucket"),
    )
    q = sig(queries, "query_id")
    c = sig(vectors, "neighbor_id")
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos", F.round(cosine(F.col("__query_id_vec"), F.col("__neighbor_id_vec")), round_digits)
        )
        .select("query_id", "neighbor_id", "cos")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k).drop("rk")


def ivf_seed_centroids(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
) -> list:
    """Deterministic seed centroids: the n_centroids lowest-id vectors,
    collected as (cid, scaled_vec, sq) rows. The collect is n_centroids
    rows of model state (like the ANN query matrix) — never data-sized;
    at 100 TB the centroid table is a few KB compiled into the plan."""
    rows = (
        scaled_with_sqnorm(
            vectors.orderBy(id_col).limit(n_centroids), id_col, vec_col, "c"
        )
        .orderBy("c_id")
        .collect()
    )
    return [(r["c_id"], list(r["c_vec"]), r["c_sq"]) for r in rows]


def _centroid_cos_structs(vec_col, sq_col, centroids, round_digits=6):
    """Array of (cos, -cid) structs, one per centroid, from literal
    centroid vectors — pure map-side expression, no join, no shuffle.
    Struct ordering (cos first, then -cid) makes array_max = best
    centroid with ties broken by LOWEST centroid id."""
    entries = []
    for cid, cvec, csq in centroids:
        arr = F.array(*[F.lit(int(x)) for x in cvec])
        cos = F.round(cosine_prescaled(vec_col, arr, sq_col, F.lit(int(csq))), round_digits)
        entries.append(F.struct(cos.alias("c"), F.lit(-int(cid)).alias("n")))
    return F.array(*entries)


def ivf_cluster(vec_col, sq_col, centroids):
    """Nearest-centroid cluster id (exact scaled-int cosine, argmax,
    ties → lowest cid). Map-side only: at scale this is the expression
    you PARTITION the table by, so a probe prunes to nprobe partitions."""
    best = F.array_max(_centroid_cos_structs(vec_col, sq_col, centroids))
    return (-best["n"]).cast("long")


def ivf_probes(vec_col, sq_col, centroids, nprobe: int):
    """The query's nprobe nearest centroid ids (descending affinity)."""
    ranked = F.reverse(F.array_sort(_centroid_cos_structs(vec_col, sq_col, centroids)))
    return F.transform(F.slice(ranked, 1, nprobe), lambda s: (-s["n"]).cast("long"))


def centroids_as_tuples(centroids: list) -> list:
    """Adapt centroids to the (cid, scaled_int_vec, sq_norm) form the
    IVF expressions consume. Accepts that form already (validated and
    passed through) or raw float vectors — kmeans_refine's output —
    which are scaled to exact integers driver-side with the same 2^20
    half-up rounding `_scaled` applies executor-side, and sq computed
    from the scaled ints so the tuple is internally consistent."""
    import math

    out = []
    for i, c in enumerate(centroids):
        if (
            isinstance(c, (tuple, list))
            and len(c) == 3
            and isinstance(c[1], (list, tuple))
        ):
            out.append((int(c[0]), [int(x) for x in c[1]], int(c[2])))
        else:
            vec = [
                int(math.floor(float(x) * _SCALE + 0.5))
                if x >= 0
                else -int(math.floor(-float(x) * _SCALE + 0.5))
                for x in c
            ]
            out.append((i, vec, sum(v * v for v in vec)))
    return out


def cosine_topk_ivf(
    vectors: DataFrame,
    query_pred,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    nprobe: int = 2,
    k: int = 3,
    round_digits: int = 6,
    centroids: list | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN — the coarse-quantizer scale path next to
    LSH: assign every vector to its nearest of n_centroids coarse
    centroids (map-side, from literal centroids), probe only the query's
    nprobe nearest cells, brute-force exact cosine within them.

    Mirrors the reference's vector-index posture at Spark scale: the
    cluster id is a partition column — `.write.partitionBy("cluster")`
    turns each probe into partition pruning, so a query reads
    nprobe/n_centroids of the data. Plan: zero-shuffle assignment,
    broadcast of (queries × nprobe) probe rows, one window over
    candidates only. Recall < 1 by construction vs cosine_topk.

    Seed centroids are deterministic (lowest-id vectors) so the whole
    pipeline is oracle-checkable; pass `centroids` (e.g. from
    kmeans_refine) for production-quality cells.
    """
    cents = (
        centroids_as_tuples(centroids)
        if centroids is not None
        else ivf_seed_centroids(vectors, id_col, vec_col, n_centroids)
    )
    base = scaled_with_sqnorm(vectors, id_col, vec_col, "v")
    assigned = base.withColumn("cluster", ivf_cluster(F.col("v_vec"), F.col("v_sq"), cents))
    q = (
        base.filter(query_pred(F.col("v_id")))
        .select(
            F.col("v_id").alias("query_id"),
            F.col("v_vec").alias("q_vec"),
            F.col("v_sq").alias("q_sq"),
            F.explode(ivf_probes(F.col("v_vec"), F.col("v_sq"), cents, nprobe)).alias(
                "cluster"
            ),
        )
    )
    scored = (
        assigned.join(F.broadcast(q), "cluster")
        .filter(F.col("query_id") != F.col("v_id"))
        .select(
            "query_id",
            F.col("v_id").alias("neighbor_id"),
            F.round(
                cosine_prescaled(F.col("q_vec"), F.col("v_vec"), F.col("q_sq"), F.col("v_sq")),
                round_digits,
            ).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k).drop("rk")


def kmeans_refine(
    vectors: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    iters: int = 2,
) -> list[list[float]]:
    """Lloyd refinement of IVF centroids, distributed: per iteration, a
    map-side nearest-centroid assignment (cosine against literal
    centroids — no join) and ONE groupBy(cluster) whose per-dimension
    avg aggregates all combine map-side, shuffling k×dims partials, not
    data. The k-row result per iteration is model state on the driver
    (same contract as the seed-centroid collect). Empty cells keep their
    previous centroid (standard Lloyd's fallback)."""
    dims = len(centroids[0])
    cur = [list(map(float, c)) for c in centroids]
    for _ in range(iters):
        entries = []
        for cid, cvec in enumerate(cur):
            plane = F.array(*[F.lit(x) for x in cvec])
            entries.append(
                F.struct(cosine(F.col(vec_col), plane).alias("c"), F.lit(-cid).alias("n"))
            )
        cluster = (-F.array_max(F.array(*entries))["n"]).cast("int")
        means = (
            vectors.select(cluster.alias("cluster"), vec_col)
            .groupBy("cluster")
            .agg(*[F.avg(F.col(vec_col)[d]).alias(f"d{d}") for d in range(dims)])
            .collect()
        )
        nxt = {r["cluster"]: [r[f"d{d}"] for d in range(dims)] for r in means}
        cur = [nxt.get(cid, cur[cid]) for cid in range(len(cur))]
    return cur


def cosine_topk_numpy(
    vectors: DataFrame,
    queries_rows: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Arrow/numpy batch variant: queries collected to a small matrix,
    scored per partition with one GEMM per Arrow batch (mapInPandas).
    The per-partition top-k then reduces to a tiny global top-k — this is
    the shape that wins when dims are high and candidates are billions."""
    import numpy as np
    import pandas as pd

    qids = np.array([r[0] for r in queries_rows])
    qmat = np.array([r[1] for r in queries_rows], dtype="float64")
    qnorm = np.linalg.norm(qmat, axis=1)

    def score(it):
        for pdf in it:
            cmat = np.array(pdf[vec_col].tolist(), dtype="float64")
            if len(cmat) == 0:
                continue
            cnorm = np.linalg.norm(cmat, axis=1)
            sims = (cmat @ qmat.T) / np.outer(cnorm, qnorm)
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(qids, len(pdf)),
                    "neighbor_id": np.tile(pdf[id_col].values, len(qids)),
                    "cos": sims.T.ravel(),
                }
            )
            out = out[out.query_id != out.neighbor_id]
            yield out.sort_values(["query_id", "cos"], ascending=[True, False]).groupby(
                "query_id", as_index=False
            ).head(k)

    partial = vectors.select(id_col, vec_col).mapInPandas(
        score, "query_id long, neighbor_id long, cos double"
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        partial.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k).drop("rk")
    )
