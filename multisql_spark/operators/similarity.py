"""Similarity search over embedding columns (beyond-reference,
BASELINE.json): brute-force cosine top-k as the correctness baseline, and
two scale paths — random-hyperplane LSH bucketing and IVF-style inverted
lists.

Embeddings are ``array<float>`` columns; all math is done JVM-side, no
Python.  Dot products accumulate left-to-right in float64 — the same order
DuckDB's ``list_dot_product`` uses, so oracle comparisons are exact
(rounded to 6 decimals for belt-and-braces).

r11 (optimization, guide §1.1 measure-first): pair stages precompute each
row's norm ``sqrt(dot(v,v))`` ONCE per row instead of once per pair — the
same two doubles are multiplied in the same order, so ``cosine`` is
unchanged bit-for-bit and the per-pair cost drops from three dots to one
(measured 2.4x on a 200k-pair join).  An unrolled 64-term
``element_at`` expression chain was ALSO tried for the dot itself and
REVERTED on measurement: even fully codegen'd it ran ~5x SLOWER than the
``zip_with``/``aggregate`` HOF (Spark 4 evaluates the HOF fold as one
specialized primitive-array loop, while the 64-term chain pays per-term
null/bounds checks and defeats JIT) — the HOF is the right JVM form.

Scale design (100 TB / billions of vectors):
- brute force is O(Q·N·d) and only for small Q (broadcast the queries,
  never shuffle the corpus);
- LSH: bucket key is computed per-row in one pass (8 hyperplanes → 256
  buckets); candidate search shuffles only same-bucket pairs;
- IVF: the coarse assignment is a partition key — per-list scans are
  partition-pruned scans. Two variants: ``ivf_topk`` (the ``label``
  column as a ready-made coarse assignment) and ``ivf_kmeans_topk``
  (a real KMeans quantizer: deterministic hash seeding + fixed-point
  Lloyd iterations with broadcast centroids, fit-on-sample at scale).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def as_double(vec_col: str):
    # Cast (codegen'd, one pass) instead of a transform() lambda
    # (CodegenFallback): element-wise float→double widening either way.
    return F.col(vec_col).cast("array<double>")


def dot(a, b):
    """Sequential left-to-right float64 dot product (zip_with/aggregate:
    measured the fastest JVM form — see module docstring)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a, b):
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def norm_col(v):
    """Per-row vector norm ``sqrt(dot(v, v))`` — precomputed once per row
    so pair stages divide by the product of two ready norms instead of
    recomputing both dots per pair (same doubles, same order →
    ``cosine`` bit-identical)."""
    return F.sqrt(dot(v, v))


def _py_norm(vec: list[float]) -> float:
    """Python replay of ``sqrt(dot(c, c))`` for a literal centroid:
    CPython floats are IEEE doubles and the loop accumulates in the same
    left-to-right order; ``math.sqrt`` and Spark's SQRT are both the
    correctly-rounded IEEE sqrt — bit-identical."""
    import math

    acc = 0.0
    for x in vec:
        acc = acc + x * x
    return math.sqrt(acc)


def hyperplane(m: int, dim: int) -> list[float]:
    """Deterministic ±1 hyperplane m: component j is the md5 high-bit of
    'plane:{m}:{j}' — reproducible in any engine (and in this Python)."""
    out = []
    for j in range(dim):
        h = hashlib.md5(f"plane:{m}:{j}".encode()).hexdigest()
        out.append(1.0 if h[0] in "89abcdef" else -1.0)
    return out


def lsh_bucket_col(vec_col, planes: list[list[float]]):
    """Bucket id = bitmap of dot-product signs over the hyperplanes."""
    bucket = F.lit(0)
    for m, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        bit = F.when(dot(vec_col, lit_plane) >= 0, F.lit(1 << m)).otherwise(
            F.lit(0)
        )
        bucket = bucket + bit
    return bucket.cast("int")


def brute_force_topk(
    emb: DataFrame,
    query_filter,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus; per-query top-k via window. Returns (q_id, cand_id, cos_sim,
    rn).  Norms precompute once per row (module docstring)."""
    from pyspark.sql import Window as W

    base = emb.select(
        F.col(id_col), as_double(vec_col).alias("v")
    ).withColumn("nv", norm_col(F.col("v")))
    q = base.filter(query_filter).select(
        F.col(id_col).alias("q_id"),
        F.col("v").alias("qv"),
        F.col("nv").alias("nq"),
    )
    pairs = (
        base.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("q_id"))
        .select(
            "q_id",
            F.col(id_col).alias("cand_id"),
            F.round(
                dot(F.col("qv"), F.col("v"))
                / (F.col("nq") * F.col("nv")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select(
            F.col("q_id").cast("long"),
            F.col("cand_id").cast("long"),
            "cos_sim",
            "rn",
        )
    )


def lsh_bucketed_topk(
    emb: DataFrame,
    query_filter,
    n_planes: int = 8,
    dim: int = 64,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cand_filter=None,
) -> DataFrame:
    """ANN: search only within the query's LSH bucket. Recall trades off
    against bucket count (2^n_planes); multi-probe = union over adjacent
    buckets (not needed at this corpus size).

    ``cand_filter`` is the filtered-search variant: a metadata predicate
    applied to the CANDIDATE side before the bucket join (PRE-filter).
    Pre-filtering is the scale-correct composition — the predicate
    evaluates in the candidate scan stage before any exchange (simple
    equality/range attribute predicates additionally reach Parquet
    PushedFilters), the bucket join's probe side shrinks with the
    predicate's selectivity, and every query receives a full top-k
    drawn from the filtered distribution; post-filtering an unfiltered
    shortlist instead under-delivers (< k survivors) exactly when the
    predicate is selective, which is when filtered search matters."""
    from pyspark.sql import Window as W

    planes = [hyperplane(m, dim) for m in range(n_planes)]

    def with_bucket(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.col(id_col),
                as_double(vec_col).alias("v"),
            )
            .withColumn("bucket", lsh_bucket_col(F.col("v"), planes))
            .withColumn("nv", norm_col(F.col("v")))
        )

    base = with_bucket(
        emb.filter(cand_filter) if cand_filter is not None else emb
    )
    q = with_bucket(emb.filter(query_filter)).select(
        F.col(id_col).alias("q_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("q_bucket"),
        F.col("nv").alias("nq"),
    )
    pairs = (
        base.join(
            F.broadcast(q), base["bucket"] == q["q_bucket"], "inner"
        )
        .filter(F.col(id_col) != F.col("q_id"))
        .select(
            "q_id",
            F.col(id_col).alias("cand_id"),
            F.round(
                dot(F.col("qv"), F.col("v"))
                / (F.col("nq") * F.col("nv")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select(
            F.col("q_id").cast("long"),
            F.col("cand_id").cast("long"),
            "cos_sim",
            "rn",
        )
    )


def ivf_topk(
    emb: DataFrame,
    query_filter,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    list_col: str = "label",
) -> DataFrame:
    """IVF probe: search only the query's inverted list (coarse cluster).
    ``list_col`` is the coarse assignment — here the dataset's ``label``;
    at scale, a KMeans-assigned partition key giving partition-pruned
    scans per probe."""
    from pyspark.sql import Window as W

    base = emb.select(
        F.col(id_col), as_double(vec_col).alias("v"), F.col(list_col)
    ).withColumn("nv", norm_col(F.col("v")))
    q = base.filter(query_filter).select(
        F.col(id_col).alias("q_id"),
        F.col("v").alias("qv"),
        F.col(list_col).alias("q_list"),
        F.col("nv").alias("nq"),
    )
    pairs = (
        base.join(F.broadcast(q), base[list_col] == q["q_list"], "inner")
        .filter(F.col(id_col) != F.col("q_id"))
        .select(
            "q_id",
            F.col(id_col).alias("cand_id"),
            F.round(
                dot(F.col("qv"), F.col("v"))
                / (F.col("nq") * F.col("nv")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select(
            F.col("q_id").cast("long"),
            F.col("cand_id").cast("long"),
            "cos_sim",
            "rn",
        )
    )


def kmeans_fit(
    emb: DataFrame,
    n_lists: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic Lloyd's KMeans as DataFrame jobs — the real coarse
    quantizer for IVF (replacing the dataset-label stand-in).

    - Seeds: the ``n_lists`` vectors with smallest ``md5(id)`` (order-free,
      engine-reproducible); cid = rank in that order.
    - Assign: argmin over ``dot(c,c) - 2*dot(v,c)`` (ties → smallest cid),
      centroids broadcast as literals — one corpus scan, no shuffle beyond
      the (n_lists × dim)-row mean aggregation.
    - Update: per-component mean in **fixed-point** (values quantized to
      1e-6, summed as exact BIGINTs) so the result is bit-identical
      regardless of partition/accumulation order — this is what lets a SQL
      oracle replay the fit exactly.

    Centroids live on the driver (n_lists × dim doubles — tiny) between
    iterations. At 100 TB you fit on a sample (``emb.sample(...)``) and
    assign the full corpus once; the per-iteration cost here is one scan +
    one n_lists×dim-group aggregation either way.
    """
    base = emb.select(
        F.col(id_col).alias("_id"), as_double(vec_col).alias("v")
    )
    seed_rows = (
        base.orderBy(F.md5(F.col("_id").cast("string")))
        .limit(n_lists)
        .collect()
    )
    centroids = [(i, [float(x) for x in r["v"]]) for i, r in enumerate(seed_rows)]

    for _ in range(iters):
        assigned = base.select(
            _assign_col(F.col("v"), centroids).alias("cid"), "v"
        )
        rows = (
            assigned.select("cid", F.posexplode("v").alias("pos", "val"))
            .withColumn("q", F.round(F.col("val") * 1e6).cast("long"))
            .groupBy("cid", "pos")
            .agg(
                (
                    F.round(F.sum("q") / F.count(F.lit(1))).cast("double")
                    / 1e6
                ).alias("m")
            )
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cid.setdefault(r["cid"], {})[r["pos"]] = r["m"]
        centroids = [
            (cid, [comps[p] for p in sorted(comps)])
            for cid, comps in sorted(by_cid.items())
        ]
    return centroids


def _assign_col(vcol, centroids: list[tuple[int, list[float]]]):
    """Nearest-centroid id: argmin of dot(c,c) - 2*dot(v,c) (the ||v||²
    term is constant per row), ties broken by smallest cid. Centroids are
    literals → pure codegen, no shuffle.

    An empty fit (zero input vectors → zero centroids) yields a typed
    NULL id instead of the null-typed ``array()`` literals Spark cannot
    analyze — the surrounding query then degrades to its natural empty
    result."""
    if not centroids:
        return F.lit(None).cast("int")
    scores = []
    for _, c in centroids:
        cc = 0.0
        for x in c:  # sequential, mirroring list_dot_product(c, c)
            cc = cc + x * x
        lit_c = F.array(*[F.lit(x) for x in c])
        scores.append(F.lit(cc) - F.lit(2.0) * dot(vcol, lit_c))
    arr = F.array(*scores)
    idx = F.array_position(arr, F.array_min(arr)).cast("int")
    cid_arr = F.array(*[F.lit(cid) for cid, _ in centroids])
    return F.element_at(cid_arr, idx)


def ivf_kmeans_topk(
    emb: DataFrame,
    query_filter,
    n_lists: int = 8,
    iters: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe over KMeans-fit inverted lists: fit the coarse quantizer
    (see :func:`kmeans_fit`), assign corpus and queries in one codegen'd
    pass, then search only the query's list (nprobe=1). The list id is the
    partition key at scale → partition-pruned probe scans."""
    from pyspark.sql import Window as W

    centroids = kmeans_fit(emb, n_lists, iters, id_col, vec_col)
    base = (
        emb.select(F.col(id_col), as_double(vec_col).alias("v"))
        .withColumn("list_id", _assign_col(F.col("v"), centroids))
        .withColumn("nv", norm_col(F.col("v")))
    )
    q = base.filter(query_filter).select(
        F.col(id_col).alias("q_id"),
        F.col("v").alias("qv"),
        F.col("list_id").alias("q_list"),
        F.col("nv").alias("nq"),
    )
    pairs = (
        base.join(F.broadcast(q), base["list_id"] == q["q_list"], "inner")
        .filter(F.col(id_col) != F.col("q_id"))
        .select(
            "q_id",
            F.col(id_col).alias("cand_id"),
            F.round(
                dot(F.col("qv"), F.col("v"))
                / (F.col("nq") * F.col("nv")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select(
            F.col("q_id").cast("long"),
            F.col("cand_id").cast("long"),
            "cos_sim",
            "rn",
        )
    )


#: Adaptive-LSH clamp bounds and the target mean bucket occupancy.
#: 2**ADAPTIVE_MAX_PLANES buckets is the most the plane table supports;
#: TARGET_OCCUPANCY rows/bucket keeps the per-bucket quadratic pair
#: compute ~O(64^2/2) regardless of corpus size.
ADAPTIVE_MIN_PLANES = 8
ADAPTIVE_MAX_PLANES = 16
TARGET_OCCUPANCY = 64


def adaptive_n_planes(
    n: int,
    lo: int = ADAPTIVE_MIN_PLANES,
    hi: int = ADAPTIVE_MAX_PLANES,
    target: int = TARGET_OCCUPANCY,
) -> int:
    """Plane count that keeps mean LSH bucket occupancy ≈ ``target``:
    ceil(log2(n / target)), clamped to [lo, hi].  Deterministic given the
    corpus count, and expressible in ANSI SQL (GREATEST/LEAST/CEIL/LOG2)
    so DuckDB oracles can mirror it exactly."""
    import math

    if n <= 0:
        return lo
    return max(lo, min(hi, math.ceil(math.log2(n / target))))


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int | None = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by LSH bucket so the
    self-join is keyed (work ∝ bucket collisions, never all-pairs).

    ``n_planes=None`` derives the plane count from a cheap corpus
    count via :func:`adaptive_n_planes`, so mean bucket occupancy (and
    with it the quadratic per-bucket pair compute) stays ~flat as the
    corpus grows — the 100 TB setting.  A pinned ``n_planes`` keeps the
    legacy fixed-blocking behavior for oracle parity.

    The probe side is explicitly repartitioned on the bucket key: the
    INPUT is small (id + vector rows) so Spark broadcast-joins it and
    AQE would otherwise coalesce the probe into a couple of partitions —
    but the pair COMPUTE is quadratic in bucket occupancy, and the r9
    sf100 sweep found one task grinding ~78M cosine evaluations.  An
    explicit user repartition spreads buckets across the cluster and is
    respected by AQE.  The width is capped at max(4×parallelism, 256):
    2**n_planes partitions would grow exponentially (2^~30 at the 100 TB
    setting) while the useful spread is bounded by the cluster."""
    if n_planes is None:
        n_planes = adaptive_n_planes(emb.count())
    planes = [hyperplane(m, dim) for m in range(n_planes)]
    base = (
        emb.select(F.col(id_col), as_double(vec_col).alias("v"))
        .withColumn("bucket", lsh_bucket_col(F.col("v"), planes))
        .withColumn("nv", norm_col(F.col("v")))
    )
    spread = min(
        1 << n_planes,
        max(4 * emb.sparkSession.sparkContext.defaultParallelism, 256),
    )
    a = base.select(
        F.col(id_col).alias("id_a"),
        F.col("v").alias("va"),
        F.col("nv").alias("na"),
        "bucket",
    ).repartition(spread, F.col("bucket"))
    b = base.select(
        F.col(id_col).alias("id_b"),
        F.col("v").alias("vb"),
        F.col("nv").alias("nb"),
        "bucket",
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            F.col("id_a").cast("long"),
            F.col("id_b").cast("long"),
            F.round(
                dot(F.col("va"), F.col("vb"))
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def kmeans_cluster_stats(
    emb: DataFrame,
    n_lists: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic clustering summary over KMeans-fit lists: per-cluster
    member count and mean cosine-to-centroid (cohesion) — the topic-
    bucketing / semantic-dedup view of the corpus.

    The mean is fixed-point (cosines rounded to 1e-6, summed as exact
    BIGINTs) so it is order-independent and SQL-replayable, like the fit
    itself. One assignment pass + one (n_lists)-group aggregation."""
    centroids = kmeans_fit(emb, n_lists, iters, id_col, vec_col)
    base = emb.select(
        F.col(id_col), as_double(vec_col).alias("v")
    ).withColumn("list_id", _assign_col(F.col("v"), centroids))
    cent_map = (
        F.map_from_arrays(
            F.array(*[F.lit(cid) for cid, _ in centroids]),
            F.array(
                *[F.array(*[F.lit(x) for x in c]) for _, c in centroids]
            ),
        )
        if centroids
        # empty fit: a typed empty map keeps the plan analyzable
        else F.lit(None).cast("map<int,array<double>>")
    )
    # Per-centroid norms replayed in Python (bit-identical: same fold,
    # same IEEE sqrt) → the per-centroid dot is hoisted out of the row
    # path; each row still computes two dots (v·centroid and its own
    # v·v for the row norm), down from three.
    cent_norm_map = (
        F.map_from_arrays(
            F.array(*[F.lit(cid) for cid, _ in centroids]),
            F.array(*[F.lit(_py_norm(c)) for _, c in centroids]),
        )
        if centroids
        else F.lit(None).cast("map<int,double>")
    )
    withcos = base.withColumn(
        "q",
        F.round(
            F.round(
                dot(F.col("v"), cent_map[F.col("list_id")])
                / (
                    norm_col(F.col("v"))
                    * cent_norm_map[F.col("list_id")]
                ),
                6,
            )
            * 1e6
        ).cast("long"),
    )
    return (
        withcos.groupBy("list_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            (
                F.round(F.sum("q") / F.count(F.lit(1))).cast("double")
                / 1e6
            ).alias("mean_cos_to_centroid"),
        )
        .select(
            F.col("list_id").cast("int"),
            "n_members",
            "mean_cos_to_centroid",
        )
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.9,
    n_lists: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    the corpus with the deterministic KMeans fit, compare embeddings
    pairwise ONLY within a cluster, and drop the higher-id member of any
    pair with cosine ≥ ``threshold``.  Returns the survivors as
    ``(vec_id, list_id)``.

    The cluster id is the blocking key, so the self-join is keyed — work
    is ∝ Σ cluster_size², never corpus².  At 100 TB you raise ``n_lists``
    to ~√N (bounding expected cluster size), fit on a sample, and the
    within-cluster join shuffles each side once on ``list_id``; skewed
    (over-dense) clusters split under AQE or an extra LSH sub-bucket.
    Complements :func:`embedding_neardup_pairs` (hyperplane blocking):
    KMeans blocks by global topic structure, hyperplanes by random
    projection."""
    centroids = kmeans_fit(emb, n_lists, iters, id_col, vec_col)
    base = (
        emb.select(F.col(id_col), as_double(vec_col).alias("v"))
        .withColumn("list_id", _assign_col(F.col("v"), centroids))
        .withColumn("nv", norm_col(F.col("v")))
    )
    a = base.select(
        F.col(id_col).alias("id_a"),
        F.col("v").alias("va"),
        F.col("nv").alias("na"),
        "list_id",
    )
    b = base.select(
        F.col(id_col).alias("id_b"),
        F.col("v").alias("vb"),
        F.col("nv").alias("nb"),
        "list_id",
    )
    drops = (
        a.join(b, "list_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.round(
                dot(F.col("va"), F.col("vb"))
                / (F.col("na") * F.col("nb")),
                6,
            )
            >= threshold
        )
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return (
        base.join(drops, id_col, "left_anti")
        .select(
            F.col(id_col).cast("long"),
            F.col("list_id").cast("int"),
        )
    )


def lsh_multiprobe_topk(
    emb: DataFrame,
    query_filter,
    n_planes: int = 8,
    dim: int = 64,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe LSH ANN: each query searches its own bucket PLUS the
    ``n_planes`` single-bit-flip neighbors (the buckets a near-neighbor
    most likely fell into when one hyperplane sign disagreed). Recall
    rises sharply for the cost of (n_planes + 1)× probe joins — still
    keyed equi-joins, never all-pairs, and the corpus is hashed once.

    The probe expansion is a per-query explode of n_planes + 1 literal
    XOR masks — the corpus side never replicates.
    """
    from pyspark.sql import Window as W

    planes = [hyperplane(m, dim) for m in range(n_planes)]
    base = (
        emb.select(F.col(id_col), as_double(vec_col).alias("v"))
        .withColumn("bucket", lsh_bucket_col(F.col("v"), planes))
        .withColumn("nv", norm_col(F.col("v")))
    )
    masks = F.array(*[F.lit(0)] + [F.lit(1 << m) for m in range(n_planes)])
    q = (
        base.filter(query_filter)
        .select(
            F.col(id_col).alias("q_id"),
            F.col("v").alias("qv"),
            F.col("nv").alias("nq"),
            F.explode(
                F.transform(
                    masks, lambda m: F.col("bucket").bitwiseXOR(m)
                )
            ).alias("probe_bucket"),
        )
    )
    pairs = (
        base.join(
            F.broadcast(q), base["bucket"] == q["probe_bucket"], "inner"
        )
        .filter(F.col(id_col) != F.col("q_id"))
        .select(
            "q_id",
            F.col(id_col).alias("cand_id"),
            F.round(
                dot(F.col("qv"), F.col("v"))
                / (F.col("nq") * F.col("nv")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select(
            F.col("q_id").cast("long"),
            F.col("cand_id").cast("long"),
            "cos_sim",
            "rn",
        )
    )


def pq_fit(
    emb: DataFrame,
    m_sub: int = 4,
    dim: int = 64,
    n_codes: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[tuple[int, list[float]]]]:
    """Product-quantization codebooks: an independent deterministic KMeans
    (same hash seeding + fixed-point Lloyd as :func:`kmeans_fit`) per
    disjoint subspace of ``dim / m_sub`` components.  Returns one centroid
    list per subspace.  At 100 TB: fit on a sample; codebooks are
    m_sub × n_codes × sub_len doubles — kilobytes, broadcast as literals.
    """
    sub_len = dim // m_sub
    base = emb.select(F.col(id_col), as_double(vec_col).alias("v"))
    books = []
    for m in range(m_sub):
        sub = base.select(
            F.col(id_col),
            F.slice(F.col("v"), m * sub_len + 1, sub_len).alias("sub"),
        )
        books.append(kmeans_fit(sub, n_codes, iters, id_col, "sub"))
    return books


def pq_topk(
    emb: DataFrame,
    query_filter,
    m_sub: int = 4,
    dim: int = 64,
    n_codes: int = 8,
    iters: int = 1,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ + asymmetric-distance (ADC) top-k: the corpus is stored as
    ``m_sub`` one-byte codes per vector (the 100 TB point — a 64-dim
    float corpus compresses 64×), queries stay uncompressed, and the
    approximate inner product is the sum of per-subspace lookup-table
    partials.

    Plan shape: codebooks are literal constants (encode = pure codegen,
    no shuffle); the per-query LUT (Q × m_sub × n_codes rows) broadcasts
    onto the long code table; the only wide operation is the
    (q_id, cand_id) partial-sum aggregation, which carries exact
    1e-6-quantized BIGINT partials so accumulation order cannot change
    the result.  In production ADC composes with IVF (probe a list, then
    ADC-rank inside it); here it ranks the full corpus to keep the
    oracle exact.

    Returns (q_id, cand_id, approx_dot, rn ≤ k).
    """
    sub_len = dim // m_sub
    books = pq_fit(emb, m_sub, dim, n_codes, iters, id_col, vec_col)
    base = emb.select(F.col(id_col), as_double(vec_col).alias("v"))
    codes = _pq_codes(base, books, sub_len, id_col)
    q = base.filter(query_filter).select(
        F.col(id_col).alias("q_id"), F.col("v").alias("qv")
    )
    lut = _pq_lut(q, books, sub_len)
    scored = (
        codes.join(
            F.broadcast(lut),
            (codes["m"] == lut["m"]) & (codes["code"] == lut["cid"]),
        )
        .groupBy("q_id", "cand_id")
        .agg(
            F.round(F.sum("partial_q") / 1e6, 6).alias("approx_dot")
        )
        .filter(F.col("q_id") != F.col("cand_id"))
    )
    return _rank_topk(scored, k)


def _pq_codes(base: DataFrame, books, sub_len: int, id_col: str) -> DataFrame:
    """Corpus → M codes, exploded long: (cand_id, m, code)."""
    code_structs = [
        F.struct(
            F.lit(m).alias("m"),
            _assign_col(
                F.slice(F.col("v"), m * sub_len + 1, sub_len), books[m]
            ).alias("code"),
        )
        for m in range(len(books))
    ]
    return base.select(
        F.col(id_col).alias("cand_id"),
        F.explode(F.array(*code_structs)).alias("c"),
    ).select("cand_id", F.col("c.m").alias("m"), F.col("c.code").alias("code"))


def _pq_lut(q: DataFrame, books, sub_len: int) -> DataFrame:
    """Per-query ADC lookup table (q_id, m, cid, partial_q) with the
    partial dot product 1e-6-quantized to an exact BIGINT."""
    lut_structs = []
    for m in range(len(books)):
        qsub = F.slice(F.col("qv"), m * sub_len + 1, sub_len)
        for cid, cvec in books[m]:
            lit_c = F.array(*[F.lit(x) for x in cvec])
            lut_structs.append(
                F.struct(
                    F.lit(m).alias("m"),
                    F.lit(cid).alias("cid"),
                    F.round(dot(qsub, lit_c) * 1e6).cast("long")
                    .alias("partial_q"),
                )
            )
    if not lut_structs:  # empty codebooks (empty fit): empty typed LUT
        return q.select(
            "q_id",
            F.lit(None).cast("int").alias("m"),
            F.lit(None).cast("int").alias("cid"),
            F.lit(None).cast("long").alias("partial_q"),
        ).where(F.lit(False))
    return q.select(
        "q_id", F.explode(F.array(*lut_structs)).alias("e")
    ).select(
        "q_id",
        F.col("e.m").alias("m"),
        F.col("e.cid").alias("cid"),
        F.col("e.partial_q").alias("partial_q"),
    )


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """(q_id, cand_id, approx_dot) → top-k rows per query with rank."""
    from pyspark.sql import Window as W

    w = W.partitionBy("q_id").orderBy(
        F.col("approx_dot").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select(
            F.col("q_id").cast("long"),
            F.col("cand_id").cast("long"),
            "approx_dot",
            "rn",
        )
    )


def ivfadc_topk(
    emb: DataFrame,
    query_filter,
    n_lists: int = 8,
    coarse_iters: int = 2,
    m_sub: int = 4,
    dim: int = 64,
    n_codes: int = 8,
    pq_iters: int = 1,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFADC: the production ANN composition — a KMeans coarse quantizer
    prunes the corpus to the query's inverted list (nprobe=1), then PQ
    codes rank the survivors by asymmetric distance.

    This is the billion-vector architecture (inverted file + compressed
    residuals in FAISS terms; codes here are over raw vectors, the
    simplification is documented): the coarse list id is the partition
    key, so a probe touches ~n/n_lists of the code table — itself 64×
    smaller than the vectors — and every per-row step (coarse assign,
    encode, LUT partials) is literal-constant codegen with exact
    quantized sums.  Both fits and the full probe replay in the SQL
    oracle.
    """
    sub_len = dim // m_sub
    coarse = kmeans_fit(emb, n_lists, coarse_iters, id_col, vec_col)
    books = pq_fit(emb, m_sub, dim, n_codes, pq_iters, id_col, vec_col)
    base = emb.select(F.col(id_col), as_double(vec_col).alias("v")) \
        .withColumn("list_id", _assign_col(F.col("v"), coarse))
    q = base.filter(query_filter).select(
        F.col(id_col).alias("q_id"),
        F.col("v").alias("qv"),
        F.col("list_id").alias("q_list"),
    )
    # candidate pairs: same coarse list only (the IVF prune)
    cands = (
        base.join(
            F.broadcast(q.select("q_id", "q_list")),
            base["list_id"] == F.col("q_list"),
        )
        .filter(F.col(id_col) != F.col("q_id"))
        .select("q_id", F.col(id_col).alias("cand_id"))
    )
    codes = _pq_codes(base.select(id_col, "v"), books, sub_len, id_col)
    lut = _pq_lut(q.select("q_id", "qv"), books, sub_len)
    scored = (
        cands.join(codes, "cand_id")
        .join(
            F.broadcast(lut),
            (codes["m"] == lut["m"])
            & (codes["code"] == lut["cid"])
            & (cands["q_id"] == lut["q_id"]),
        )
        .drop(lut["q_id"])
        .groupBy("q_id", "cand_id")
        .agg(F.round(F.sum("partial_q") / 1e6, 6).alias("approx_dot"))
    )
    return _rank_topk(scored, k)
