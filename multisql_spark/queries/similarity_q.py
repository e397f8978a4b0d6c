"""Similarity-search queries over ``embeddings`` (operators in
:mod:`multisql_spark.operators.similarity`).

The LSH hyperplanes are deterministic md5-derived ±1 vectors, inlined as
literals into BOTH the Spark plan and the DuckDB oracle, so even the ANN
variants are full hash-match checks."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multisql_spark.operators import similarity as sim
from multisql_spark.queries import register
from multisql_spark.tables import load_tables

DIM = 64
N_PLANES = 8
_PLANES = [sim.hyperplane(m, DIM) for m in range(N_PLANES)]
_PLANES_MAX = [sim.hyperplane(m, DIM) for m in range(sim.ADAPTIVE_MAX_PLANES)]


def _plane_literal(plane: list[float]) -> str:
    return "[" + ", ".join(str(x) for x in plane) + "]::DOUBLE[]"


def _bucket_sql(vec: str) -> str:
    terms = [
        f"(CASE WHEN list_dot_product({vec}, {_plane_literal(p)}) >= 0 "
        f"THEN {1 << m} ELSE 0 END)"
        for m, p in enumerate(_PLANES)
    ]
    return "CAST(" + " + ".join(terms) + " AS INT)"


# Adaptive variants (operators/similarity.py adaptive_n_planes): the
# plane count comes from the corpus COUNT(*) — ceil(log2(n/64)) clamped
# to [8, 16] — so bucket occupancy stays ~flat across scale factors.
# The SQL masks each plane's bit with ``m < np`` over the full 16-plane
# table, which is exactly planes[:np] on the Spark side.
_NP_SQL = (
    "GREATEST(8, LEAST(16, CAST(CEIL(LOG2(COUNT(*) / 64.0)) AS INT)))"
)


def _bucket_sql_adaptive(vec: str, np_col: str) -> str:
    terms = [
        f"(CASE WHEN {m} < {np_col} AND "
        f"list_dot_product({vec}, {_plane_literal(p)}) >= 0 "
        f"THEN {1 << m} ELSE 0 END)"
        for m, p in enumerate(_PLANES_MAX)
    ]
    return "CAST(" + " + ".join(terms) + " AS INT)"


_COS = (
    "round(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
)


@register(
    "sim_bruteforce_topk",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    q AS (SELECT vec_id AS q_id, v AS qv FROM emb WHERE vec_id < 5),
    pairs AS (
      SELECT q_id, c.vec_id AS cand_id,
             {_COS.format(a="qv", b="c.v")} AS cos_sim
      FROM q, emb c WHERE c.vec_id <> q_id
    )
    SELECT CAST(q_id AS BIGINT) AS q_id, CAST(cand_id AS BIGINT) AS cand_id,
           cos_sim, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY cos_sim DESC, cand_id) AS rn
      FROM pairs
    ) WHERE rn <= 10
    """,
    tags=("similarity", "knn"),
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for query vectors (vec_id < 5): the correctness
    baseline every ANN variant is measured against."""
    t = load_tables(spark, sf_dir, ["embeddings"])
    return sim.brute_force_topk(
        t["embeddings"], F.col("vec_id") < 5, k=10
    )


@register(
    "sim_lsh_buckets",
    oracle=f"""
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           {_bucket_sql("embedding::DOUBLE[]")} AS bucket
    FROM embeddings
    """,
    tags=("similarity", "lsh"),
)
def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucket assignment (8 planes → 256 buckets):
    the one-pass partitioning key for ANN at scale."""
    t = load_tables(spark, sf_dir, ["embeddings"])
    base = t["embeddings"].select(
        F.col("vec_id").cast("long"),
        sim.as_double("embedding").alias("v"),
    )
    return base.select(
        "vec_id", sim.lsh_bucket_col(F.col("v"), _PLANES).alias("bucket")
    )


@register(
    "sim_ann_lsh",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             {_bucket_sql("embedding::DOUBLE[]")} AS bucket
      FROM embeddings
    ),
    q AS (SELECT vec_id AS q_id, v AS qv, bucket AS q_bucket
          FROM emb WHERE vec_id < 5),
    pairs AS (
      SELECT q_id, c.vec_id AS cand_id,
             {_COS.format(a="qv", b="c.v")} AS cos_sim
      FROM q JOIN emb c ON c.bucket = q.q_bucket
      WHERE c.vec_id <> q.q_id
    )
    SELECT CAST(q_id AS BIGINT) AS q_id, CAST(cand_id AS BIGINT) AS cand_id,
           cos_sim, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY cos_sim DESC, cand_id) AS rn
      FROM pairs
    ) WHERE rn <= 5
    """,
    tags=("similarity", "lsh", "ann"),
)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 within the query's LSH bucket — the scale path: the
    self-join keys on bucket, so compared pairs ∝ collisions."""
    t = load_tables(spark, sf_dir, ["embeddings"])
    return sim.lsh_bucketed_topk(
        t["embeddings"], F.col("vec_id") < 5, n_planes=N_PLANES, dim=DIM, k=5
    )


@register(
    "sim_ann_filtered",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, embedding::DOUBLE[] AS v, label,
             {_bucket_sql("embedding::DOUBLE[]")} AS bucket
      FROM embeddings
    ),
    q AS (SELECT vec_id AS q_id, v AS qv, bucket AS q_bucket
          FROM emb WHERE vec_id < 5),
    pairs AS (
      SELECT q_id, c.vec_id AS cand_id,
             {_COS.format(a="qv", b="c.v")} AS cos_sim
      FROM q JOIN emb c ON c.bucket = q.q_bucket
      WHERE c.vec_id <> q.q_id AND c.label % 2 = 0
    )
    SELECT CAST(q_id AS BIGINT) AS q_id, CAST(cand_id AS BIGINT) AS cand_id,
           cos_sim, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY cos_sim DESC, cand_id) AS rn
      FROM pairs
    ) WHERE rn <= 5
    """,
    tags=("similarity", "lsh", "ann", "filtered"),
)
def sim_ann_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search: ANN top-5 within the query's LSH bucket
    among candidates satisfying a metadata predicate (even ``label``) —
    the attribute-constrained retrieval every production vector store
    serves ("similar items in category X").

    Scale design — PRE-filter, not post-filter: the predicate is applied
    to the candidate side before the bucket join, so it evaluates in the
    scan stage ahead of any exchange, the join's probe side shrinks with
    the predicate's selectivity, and each query's top-k is drawn
    complete from the filtered distribution. Post-filtering an
    unfiltered ANN shortlist returns fewer than k exactly when the
    filter is selective — the known failure mode this composition
    avoids."""
    t = load_tables(spark, sf_dir, ["embeddings"])
    return sim.lsh_bucketed_topk(
        t["embeddings"],
        F.col("vec_id") < 5,
        n_planes=N_PLANES,
        dim=DIM,
        k=5,
        cand_filter=F.col("label") % 2 == 0,
    )


@register(
    "sim_ann_ivf",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
    ),
    q AS (SELECT vec_id AS q_id, v AS qv, label AS q_list
          FROM emb WHERE vec_id < 5),
    pairs AS (
      SELECT q_id, c.vec_id AS cand_id,
             {_COS.format(a="qv", b="c.v")} AS cos_sim
      FROM q JOIN emb c ON c.label = q.q_list
      WHERE c.vec_id <> q.q_id
    )
    SELECT CAST(q_id AS BIGINT) AS q_id, CAST(cand_id AS BIGINT) AS cand_id,
           cos_sim, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY cos_sim DESC, cand_id) AS rn
      FROM pairs
    ) WHERE rn <= 5
    """,
    tags=("similarity", "ivf", "ann"),
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe: search only the query's inverted list (coarse cluster =
    ``label``; at scale a KMeans partition key → partition-pruned probe
    scans)."""
    t = load_tables(spark, sf_dir, ["embeddings"])
    return sim.ivf_topk(t["embeddings"], F.col("vec_id") < 5, k=5)


def _kmeans_fit_ctes(
    n_lists: int = 8, iters: int = 2, where: str = ""
) -> str:
    """SQL replay of the deterministic KMeans fit (hash seeds →
    fixed-point Lloyd updates → argmin assignment), exactly mirroring
    ``operators.similarity.kmeans_fit`` — the fixed-point mean (values
    quantized to 1e-6, summed as BIGINTs) is what makes the two engines
    bit-identical regardless of accumulation order. Ends with ``af``
    (vec_id, v, list_id) and the final centroid CTE ``c{iters}``.
    ``where`` optionally restricts the fit/assign corpus (incremental
    index maintenance fits on the standing corpus only)."""
    score = (
        "list_dot_product(c.c, c.c) - 2 * list_dot_product(e.v, c.c)"
    )
    where_sql = f"WHERE {where}" if where else ""
    sql = f"""
    WITH emb AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings {where_sql}
    ),
    c0 AS (
      SELECT ROW_NUMBER() OVER (ORDER BY md5(vec_id::VARCHAR)) - 1 AS cid,
             v AS c
      FROM emb ORDER BY md5(vec_id::VARCHAR) LIMIT {n_lists}
    )"""
    prev = "c0"
    for it in range(1, iters + 1):
        sql += f""",
    a{it} AS (
      SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.v, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {score}, c.cid) AS rn
        FROM emb e CROSS JOIN {prev} c
      ) WHERE rn = 1
    ),
    c{it} AS (
      SELECT cid, list(m ORDER BY pos) AS c FROM (
        SELECT a.cid, t.pos,
               round(sum(CAST(round(a.v[t.pos] * 1000000) AS BIGINT))
                     / count(*)) / 1000000.0 AS m
        FROM a{it} a CROSS JOIN range(1, 65) t(pos)
        GROUP BY a.cid, t.pos
      ) GROUP BY cid
    )"""
        prev = f"c{it}"
    sql += f""",
    af AS (
      SELECT vec_id, v, cid AS list_id FROM (
        SELECT e.vec_id, e.v, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {score}, c.cid) AS rn
        FROM emb e CROSS JOIN {prev} c
      ) WHERE rn = 1
    )"""
    return sql


def _kmeans_oracle(n_lists: int = 8, iters: int = 2, k: int = 5) -> str:
    """Fit replay + IVF probe (nprobe=1, top-k per query)."""
    sql = _kmeans_fit_ctes(n_lists, iters)
    sql += f""",
    q AS (SELECT vec_id AS q_id, v AS qv, list_id AS q_list
          FROM af WHERE vec_id < 5),
    pairs AS (
      SELECT q_id, c.vec_id AS cand_id,
             {_COS.format(a="qv", b="c.v")} AS cos_sim
      FROM q JOIN af c ON c.list_id = q.q_list
      WHERE c.vec_id <> q.q_id
    )
    SELECT CAST(q_id AS BIGINT) AS q_id, CAST(cand_id AS BIGINT) AS cand_id,
           cos_sim, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY cos_sim DESC, cand_id) AS rn
      FROM pairs
    ) WHERE rn <= {k}
    """
    return sql


@register(
    "sim_ann_ivf_kmeans",
    oracle=_kmeans_oracle(),
    tags=("similarity", "ivf", "ann", "kmeans"),
)
def sim_ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with a real KMeans coarse quantizer (deterministic hash seeding
    + 2 fixed-point Lloyd iterations), not the dataset-label stand-in:
    fit, assign corpus + queries, probe only the query's list. Fully
    hash-checked against a SQL replay of the same fit."""
    t = load_tables(spark, sf_dir, ["embeddings"])
    return sim.ivf_kmeans_topk(
        t["embeddings"], F.col("vec_id") < 5, n_lists=8, iters=2, k=5
    )


@register(
    "sim_embedding_neardup",
    oracle=f"""
    WITH np AS (SELECT {_NP_SQL} AS np FROM embeddings),
    emb AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             {_bucket_sql_adaptive("embedding::DOUBLE[]", "np.np")} AS bucket
      FROM embeddings, np
    )
    SELECT CAST(a.vec_id AS BIGINT) AS id_a, CAST(b.vec_id AS BIGINT) AS id_b,
           {_COS.format(a="a.v", b="b.v")} AS cos_sim
    FROM emb a JOIN emb b ON a.bucket = b.bucket
    WHERE a.vec_id < b.vec_id
      AND {_COS.format(a="a.v", b="b.v")} >= 0.9
    """,
    tags=("similarity", "dedup"),
)
def sim_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (≥0.9), LSH-blocked with the
    ADAPTIVE plane count (``n_planes=None`` → ceil(log2(n/64)) in [8,16],
    r10): mean bucket occupancy — and the quadratic per-bucket pair
    compute that red-flagged the r9 sf100 sweep — stays ~flat across
    scale factors instead of growing linearly with the corpus.  The
    oracle derives the same count from COUNT(*) and masks the same
    16-plane table, so the blocking is bit-identical."""
    t = load_tables(spark, sf_dir, ["embeddings"])
    return sim.embedding_neardup_pairs(
        t["embeddings"], threshold=0.9, n_planes=None, dim=DIM
    )


@register(
    "dedup_semantic",
    oracle=_kmeans_fit_ctes()
    + f""",
    drops AS (
      SELECT DISTINCT b.vec_id
      FROM af a JOIN af b
        ON a.list_id = b.list_id AND a.vec_id < b.vec_id
      WHERE {_COS.format(a="a.v", b="b.v")} >= 0.9
    )
    SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
           CAST(e.list_id AS INT) AS list_id
    FROM af e ANTI JOIN drops d ON d.vec_id = e.vec_id
    """,
    tags=("similarity", "dedup", "kmeans"),
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: KMeans-cluster blocking + within-cluster cosine ≥ 0.9
    drops the higher id of each near-dup pair; survivors returned with
    their semantic cluster. Fully hash-checked via the SQL fit replay."""
    t = load_tables(spark, sf_dir, ["embeddings"])
    return sim.semantic_dedup(
        t["embeddings"], threshold=0.9, n_lists=8, iters=2
    )


@register(
    "sim_kmeans_cluster_stats",
    oracle=_kmeans_fit_ctes()
    + f""",
    withcos AS (
      SELECT a.list_id,
             CAST(round({_COS.format(a="a.v", b="c.c")} * 1000000) AS BIGINT)
               AS q
      FROM af a JOIN c2 c ON c.cid = a.list_id
    )
    SELECT CAST(list_id AS INT) AS list_id,
           count(*) AS n_members,
           round(sum(q) / count(*)) / 1000000.0 AS mean_cos_to_centroid
    FROM withcos GROUP BY list_id
    """,
    tags=("similarity", "kmeans", "clustering"),
)
def sim_kmeans_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster size and cohesion (mean cosine to centroid) over the
    KMeans-fit semantic clusters — fully hash-checked via the SQL fit
    replay."""
    t = load_tables(spark, sf_dir, ["embeddings"])
    return sim.kmeans_cluster_stats(t["embeddings"], n_lists=8, iters=2)


@register(
    "sim_ann_lsh_multiprobe",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             {_bucket_sql("embedding::DOUBLE[]")} AS bucket
      FROM embeddings
    ),
    q AS (
      SELECT vec_id AS q_id, v AS qv, xor(bucket, m) AS probe_bucket
      FROM emb,
           unnest([{", ".join(str(x) for x in [0] + [1 << m for m in range(N_PLANES)])}]) t(m)
      WHERE vec_id < 5
    ),
    pairs AS (
      SELECT q_id, c.vec_id AS cand_id,
             {_COS.format(a="qv", b="c.v")} AS cos_sim
      FROM q JOIN emb c ON c.bucket = q.probe_bucket
      WHERE c.vec_id <> q.q_id
    )
    SELECT CAST(q_id AS BIGINT) AS q_id, CAST(cand_id AS BIGINT) AS cand_id,
           cos_sim, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY cos_sim DESC, cand_id) AS rn
      FROM pairs
    ) WHERE rn <= 5
    """,
    tags=("similarity", "lsh", "ann", "multiprobe"),
)
def sim_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH top-5: the query's bucket plus all one-bit-flip
    neighbor buckets — the standard recall lever that keeps the probe an
    equi-join."""
    t = load_tables(spark, sf_dir, ["embeddings"])
    return sim.lsh_multiprobe_topk(
        t["embeddings"], F.col("vec_id") < 5, n_planes=N_PLANES, dim=DIM, k=5
    )


def _pq_fit_ctes(
    m_sub: int = 4, dim: int = 64, n_codes: int = 8, iters: int = 1
) -> str:
    """CTE fragment (appended after an ``emb`` CTE) replaying the PQ fit:
    per-subspace deterministic KMeans (hash seeds, fixed-point means —
    same contract as `_kmeans_fit_ctes`), code assignment ``codes``
    (cand_id, m, cid) and query LUT ``lut`` (q_id, m, cid, partial_q)
    with partials quantized to 1e-6 BIGINTs."""
    sub_len = dim // m_sub
    score = "list_dot_product(c.c, c.c) - 2 * list_dot_product(e.sv, c.c)"
    sql = ""
    for m in range(m_sub):
        lo = m * sub_len + 1
        hi = (m + 1) * sub_len
        sql += f""",
    sub_{m} AS (
      SELECT vec_id, list_slice(v, {lo}, {hi}) AS sv FROM emb
    ),
    c0_{m} AS (
      SELECT ROW_NUMBER() OVER (ORDER BY md5(vec_id::VARCHAR)) - 1 AS cid,
             sv AS c
      FROM sub_{m} ORDER BY md5(vec_id::VARCHAR) LIMIT {n_codes}
    )"""
        prev = f"c0_{m}"
        for it in range(1, iters + 1):
            sql += f""",
    a{it}_{m} AS (
      SELECT vec_id, sv, cid FROM (
        SELECT e.vec_id, e.sv, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {score}, c.cid) AS rn
        FROM sub_{m} e CROSS JOIN {prev} c
      ) WHERE rn = 1
    ),
    c{it}_{m} AS (
      SELECT cid, list(mm ORDER BY pos) AS c FROM (
        SELECT a.cid, t.pos,
               round(sum(CAST(round(a.sv[t.pos] * 1000000) AS BIGINT))
                     / count(*)) / 1000000.0 AS mm
        FROM a{it}_{m} a CROSS JOIN range(1, {sub_len + 1}) t(pos)
        GROUP BY a.cid, t.pos
      ) GROUP BY cid
    )"""
            prev = f"c{it}_{m}"
        sql += f""",
    af_{m} AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {score}, c.cid) AS rn
        FROM sub_{m} e CROSS JOIN {prev} c
      ) WHERE rn = 1
    ),
    lut_{m} AS (
      SELECT q.vec_id AS q_id, c.cid,
             CAST(round(list_dot_product(
               list_slice(q.v, {lo}, {hi}), c.c) * 1e6) AS BIGINT)
               AS partial_q
      FROM emb q CROSS JOIN {prev} c
      WHERE q.vec_id < 5
    )"""
    codes_union = " UNION ALL ".join(
        f"SELECT vec_id AS cand_id, {m} AS m, cid FROM af_{m}"
        for m in range(m_sub)
    )
    lut_union = " UNION ALL ".join(
        f"SELECT q_id, {m} AS m, cid, partial_q FROM lut_{m}"
        for m in range(m_sub)
    )
    sql += f""",
    codes AS ({codes_union}),
    lut AS ({lut_union})"""
    return sql


_PQ_RANKED = """
    SELECT CAST(q_id AS BIGINT) AS q_id, CAST(cand_id AS BIGINT) AS cand_id,
           approx_dot, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY approx_dot DESC, cand_id) AS rn
      FROM scored
    ) WHERE rn <= {k}
    """


def _pq_oracle(
    m_sub: int = 4, dim: int = 64, n_codes: int = 8, iters: int = 1, k: int = 5
) -> str:
    """PQ fit replay + full-corpus ADC ranking."""
    return (
        """
    WITH emb AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    )"""
        + _pq_fit_ctes(m_sub, dim, n_codes, iters)
        + """,
    scored AS (
      SELECT l.q_id, c.cand_id,
             round(sum(l.partial_q) / 1e6, 6) AS approx_dot
      FROM codes c JOIN lut l ON l.m = c.m AND l.cid = c.cid
      GROUP BY l.q_id, c.cand_id
      HAVING l.q_id <> c.cand_id
    )"""
        + _PQ_RANKED.format(k=k)
    )


def _ivfadc_oracle(
    n_lists: int = 8,
    coarse_iters: int = 2,
    m_sub: int = 4,
    dim: int = 64,
    n_codes: int = 8,
    pq_iters: int = 1,
    k: int = 5,
) -> str:
    """Coarse-KMeans fit replay (`af`: vec_id → list_id) + PQ fit replay
    + list-pruned ADC ranking — the full IVFADC probe in SQL."""
    return (
        _kmeans_fit_ctes(n_lists, coarse_iters)
        + _pq_fit_ctes(m_sub, dim, n_codes, pq_iters)
        + """,
    cand_in_list AS (
      SELECT q.vec_id AS q_id, c.vec_id AS cand_id
      FROM af q JOIN af c ON c.list_id = q.list_id
      WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
    ),
    scored AS (
      SELECT cil.q_id, cil.cand_id,
             round(sum(l.partial_q) / 1e6, 6) AS approx_dot
      FROM cand_in_list cil
      JOIN codes c ON c.cand_id = cil.cand_id
      JOIN lut l ON l.q_id = cil.q_id AND l.m = c.m AND l.cid = c.cid
      GROUP BY cil.q_id, cil.cand_id
    )"""
        + _PQ_RANKED.format(k=k)
    )


@register(
    "sim_ann_pq",
    oracle=_pq_oracle(),
    tags=("similarity", "pq", "ann"),
)
def sim_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization + asymmetric distance (ADC) top-k: 4
    subspaces × 8 codes (the corpus compresses to 4 small ints per
    vector), per-query lookup tables broadcast onto the code table,
    exact integer partial sums. Completes the ANN family next to LSH,
    multi-probe LSH, and KMeans-IVF; at scale ADC ranks inside an IVF
    list rather than the full corpus."""
    t = load_tables(spark, sf_dir, ["embeddings"])
    return sim.pq_topk(
        t["embeddings"], F.col("vec_id") < 5,
        m_sub=4, dim=DIM, n_codes=8, iters=1, k=5,
    )


@register(
    "sim_ann_ivfadc",
    oracle=_ivfadc_oracle(),
    tags=("similarity", "ivf", "pq", "ann"),
)
def sim_ann_ivfadc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC — the production billion-vector composition: KMeans coarse
    lists prune the corpus to the query's cell (nprobe=1), PQ codes rank
    the survivors by asymmetric distance. Probe cost ∝ (n / n_lists) rows
    of the 64×-compressed code table; both fits and the probe replay in
    the SQL oracle (fixed-point means, quantized LUT partials)."""
    t = load_tables(spark, sf_dir, ["embeddings"])
    return sim.ivfadc_topk(
        t["embeddings"], F.col("vec_id") < 5,
        n_lists=8, coarse_iters=2, m_sub=4, dim=DIM, n_codes=8,
        pq_iters=1, k=5,
    )


@register(
    "sim_ann_recall",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             {_bucket_sql("embedding::DOUBLE[]")} AS bucket
      FROM embeddings
    ),
    q AS (SELECT vec_id AS q_id, v AS qv, bucket AS q_bucket
          FROM emb WHERE vec_id < 5),
    bf AS (
      SELECT q_id, cand_id FROM (
        SELECT q.q_id, c.vec_id AS cand_id,
               ROW_NUMBER() OVER (PARTITION BY q.q_id
                 ORDER BY {_COS.format(a="q.qv", b="c.v")} DESC, c.vec_id)
                 AS rn
        FROM q, emb c WHERE c.vec_id <> q.q_id
      ) WHERE rn <= 5
    ),
    ann AS (
      SELECT q_id, cand_id FROM (
        SELECT q.q_id, c.vec_id AS cand_id,
               ROW_NUMBER() OVER (PARTITION BY q.q_id
                 ORDER BY {_COS.format(a="q.qv", b="c.v")} DESC, c.vec_id)
                 AS rn
        FROM q JOIN emb c ON c.bucket = q.q_bucket
        WHERE c.vec_id <> q.q_id
      ) WHERE rn <= 5
    ),
    hits AS (
      SELECT bf.q_id, COUNT(ann.cand_id) AS n_hits
      FROM bf LEFT JOIN ann
        ON ann.q_id = bf.q_id AND ann.cand_id = bf.cand_id
      GROUP BY bf.q_id
    )
    SELECT CAST(q_id AS BIGINT) AS q_id,
           n_hits,
           round(n_hits / 5.0, 2) AS recall_at_5
    FROM hits
    """,
    tags=("similarity", "ann", "evaluation"),
)
def sim_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the LSH-bucket ANN against the exact brute-force
    top-5 — the evaluation harness that justifies an ANN config before
    it replaces exact search in a pipeline. Both sides are keyed joins;
    the comparison itself is a join on (query, candidate) + one bounded
    aggregation. At 100 TB you run this on a query SAMPLE (it is an
    estimate of recall, not a per-corpus-row computation)."""
    t = load_tables(spark, sf_dir, ["embeddings"])
    bf = sim.brute_force_topk(
        t["embeddings"], F.col("vec_id") < 5, k=5
    ).select("q_id", "cand_id")
    ann = sim.lsh_bucketed_topk(
        t["embeddings"], F.col("vec_id") < 5, n_planes=N_PLANES, dim=DIM, k=5
    ).select(F.col("q_id").alias("a_qid"), F.col("cand_id").alias("a_cid"))
    return (
        bf.join(
            ann,
            (F.col("q_id") == F.col("a_qid"))
            & (F.col("cand_id") == F.col("a_cid")),
            "left",
        )
        .groupBy("q_id")
        .agg(F.count("a_cid").alias("n_hits"))
        .select(
            F.col("q_id").cast("long"),
            "n_hits",
            F.round(F.col("n_hits") / 5.0, 2).alias("recall_at_5"),
        )
    )


def _pca_iter_sql(n: int) -> str:
    """One matrix-free power-iteration step as SQL: y = Xᵀ(X·v), then
    renormalize to max|component| = 1000 integer units."""
    return f"""
    s{n} AS (
      SELECT q.vec_id, sum(q.qx * v.vq) AS s
      FROM qx q JOIN v{n} v ON q.dim = v.dim
      GROUP BY q.vec_id
    ),
    y{n} AS (
      SELECT q.dim, sum(CAST(q.qx AS HUGEINT) * s.s) AS y
      FROM qx q JOIN s{n} s ON q.vec_id = s.vec_id
      GROUP BY q.dim
    ),
    ymax{n} AS (SELECT max(abs(y)) AS m FROM y{n}),
    v{n + 1} AS (
      SELECT y.dim,
             CAST(floor(CAST(y.y AS DOUBLE) / CAST(x.m AS DOUBLE) * 1000.0)
                  AS BIGINT) AS vq
      FROM y{n} y, ymax{n} x
    )"""


@register(
    "sim_pca_power_iteration",
    oracle=f"""
    WITH qx AS (
      SELECT vec_id, i - 1 AS dim,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5)
                  AS BIGINT) AS qx
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    v0 AS (
      SELECT DISTINCT dim, CAST(1000 AS BIGINT) AS vq FROM qx
    ),
    {_pca_iter_sql(0)},
    {_pca_iter_sql(1)}
    SELECT dim, vq AS loading_q, round(vq / 1000.0, 4) AS loading
    FROM v2
    """,
    tags=("embeddings", "pca", "power-iteration"),
)
def sim_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding cloud via power
    iteration on the Gram matrix.

    r11 (guide §1.3/§6.1): the r6 matrix-free form re-referenced the
    quantized (vec_id, dim, qx) explode FOUR times (two iterations ×
    two joins), compiling to 16 parquet scans — at 100 TB that is four
    full passes over X.  Since y ← Xᵀ(X·v) = (XᵀX)·v and the algebra
    is exact integers, both renormalized steps fold onto the 64×64
    Gram matrix C = XᵀX, computed in ONE pass (a per-row nested
    transform emits the 4 096 qx_d·qx_e products; the map-side partial
    aggregate shrinks the shuffle to ≤4 096 sums per split).  The
    iterations then run on C's 4 096 rows — broadcast matvecs.

    Exactness: qx and vq are integer-quantized, so
    Σ_r qx_rd·(Σ_e qx_re·vq_e) = Σ_e (Σ_r qx_rd·qx_re)·vq_e holds
    bit-for-bit (DECIMAL(38,0) sums, same as the oracle's HUGEINT);
    renormalization divides the same two doubles.  Loadings are
    identical to the chained-CTE SQL replay at any parallelism
    (driver t2 green at sf0.001/0.01/0.1)."""
    t = load_tables(spark, sf_dir, ["embeddings"])

    # r11 second pass (guide §4.2): the nested-transform explode
    # materialized 64×64 = 4 096 (d, e, p) rows PER VECTOR before the
    # partial aggregate (~150M rows at sf0.1 — 8 s of explode/agg for
    # a 64×64 result).  The Gram matrix is instead computed per Arrow
    # batch as one integer matmul QᵀQ (numpy int64 — exact, and far
    # from overflow: |cell| ≤ n·(1000·max|x|)² ≪ 2⁶³), accumulated
    # across batches, and emitted ONCE per task as 4 096 partial sums
    # — the same scan-stage-kernel shape as the codec family; only
    # the embedding column enters the worker.  The DECIMAL(38,0)
    # final sum and everything downstream are unchanged, so the
    # quantized algebra — floor(x·1000 + 0.5) in IEEE double, then
    # integer products/sums — is bit-identical to the oracle replay.
    def gram(batches):
        import numpy as np
        import pandas as pd

        total = None
        for pdf in batches:
            col = pdf["embedding"].dropna()
            if len(col) == 0:
                continue
            x = np.array(col.tolist(), dtype=np.float64)
            q = np.floor(x * 1000.0 + 0.5).astype(np.int64)
            g = q.T @ q
            total = g if total is None else total + g
        if total is not None:
            n = total.shape[0]
            yield pd.DataFrame(
                {
                    "d": np.repeat(np.arange(n), n).astype("int32"),
                    "e": np.tile(np.arange(n), n).astype("int32"),
                    "p": total.reshape(-1),
                }
            )

    qprod = t["embeddings"].select("embedding").mapInPandas(
        gram, "d int, e int, p long"
    )
    cov = qprod.groupBy("d", "e").agg(
        F.sum(F.col("p").cast("decimal(38,0)")).alias("c")
    )
    v = cov.select(F.col("d").alias("dim")).distinct().select(
        "dim", F.lit(1000).cast("long").alias("vq")
    )
    for _ in range(2):
        y = (
            cov.join(F.broadcast(v), cov.e == F.col("dim"))
            .groupBy("d")
            .agg(F.sum(F.col("c") * F.col("vq")).alias("y"))
        )
        ymax = y.agg(F.max(F.abs(F.col("y"))).alias("m"))
        v = y.join(F.broadcast(ymax)).select(
            F.col("d").alias("dim"),
            F.floor(
                F.col("y").cast("double") / F.col("m").cast("double") * 1000.0
            )
            .cast("long")
            .alias("vq"),
        )
    return v.select(
        F.col("dim").alias("dim"),
        F.col("vq").alias("loading_q"),
        F.round(F.col("vq") / 1000.0, 4).alias("loading"),
    )


@register(
    "sim_random_projection",
    oracle="""
    WITH qx AS (
      SELECT vec_id, i - 1 AS dim,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5)
                  AS BIGINT) AS qx
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    signs AS (
      SELECT k.k, d.dim,
             CASE WHEN substr(md5('rp' || CAST(k.k AS VARCHAR) || ':'
                              || CAST(d.dim AS VARCHAR)), 1, 1) < '8'
                  THEN 1 ELSE -1 END AS sgn
      FROM unnest(range(0, 16)) AS k(k),
           unnest(range(0, 64)) AS d(dim)
    ),
    proj AS (
      SELECT q.vec_id, s.k, sum(s.sgn * q.qx) AS p
      FROM qx q JOIN signs s ON q.dim = s.dim
      GROUP BY q.vec_id, s.k
    ),
    pnorm AS (
      SELECT vec_id, sum(p * p) AS proj_norm2_q FROM proj GROUP BY vec_id
    ),
    onorm AS (
      SELECT vec_id, sum(qx * qx) AS orig_norm2_q FROM qx GROUP BY vec_id
    )
    SELECT o.vec_id AS vec_id,
           CAST(o.orig_norm2_q AS BIGINT) AS orig_norm2_q,
           CAST(p.proj_norm2_q AS BIGINT) AS proj_norm2_q,
           round(p.proj_norm2_q / (16.0 * o.orig_norm2_q), 4)
             AS norm_ratio
    FROM onorm o JOIN pnorm p ON o.vec_id = p.vec_id
    """,
    tags=("embeddings", "random-projection", "jl"),
)
def sim_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss random projection 64 → 16 dims with a
    DETERMINISTIC ±1 sign matrix derived from md5 — the cheap
    dimensionality reduction in front of clustering / ANN when even
    int8 vectors are too wide to shuffle.

    The sign matrix is 16×64 literals broadcast onto the exploded
    component stream; projections and both squared norms are exact
    integer algebra on 1e-3-quantized components, so results are
    repartition-stable and engine-identical.  The per-vector
    `norm_ratio` (E[ratio] = 1 under JL) is the self-audit that the
    projection preserves geometry before anything downstream consumes
    it.  One vec_id-keyed shuffle; nothing wider than 16 longs leaves
    a partition."""
    t = load_tables(spark, sf_dir, ["embeddings"])
    qx = (
        t["embeddings"]
        .select("vec_id", F.posexplode("embedding").alias("dim", "x"))
        .select(
            "vec_id",
            "dim",
            F.floor(F.col("x").cast("double") * 1000 + 0.5)
            .cast("long")
            .alias("qx"),
        )
    )
    ks = spark.range(16).select(F.col("id").cast("int").alias("k"))
    ds = spark.range(64).select(F.col("id").cast("int").alias("dim"))
    signs = ks.crossJoin(ds).select(
        "k",
        "dim",
        F.when(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("rp"),
                        F.col("k").cast("string"),
                        F.lit(":"),
                        F.col("dim").cast("string"),
                    )
                ),
                1,
                1,
            )
            < "8",
            1,
        )
        .otherwise(-1)
        .alias("sgn"),
    )
    proj = (
        qx.join(F.broadcast(signs), "dim")
        .groupBy("vec_id", "k")
        .agg(F.sum(F.col("sgn") * F.col("qx")).alias("p"))
    )
    pnorm = proj.groupBy("vec_id").agg(
        F.sum(F.col("p") * F.col("p")).alias("proj_norm2_q")
    )
    onorm = qx.groupBy("vec_id").agg(
        F.sum(F.col("qx") * F.col("qx")).alias("orig_norm2_q")
    )
    return onorm.join(pnorm, "vec_id").select(
        "vec_id",
        F.col("orig_norm2_q").cast("long").alias("orig_norm2_q"),
        F.col("proj_norm2_q").cast("long").alias("proj_norm2_q"),
        F.round(
            F.col("proj_norm2_q") / (16.0 * F.col("orig_norm2_q")), 4
        ).alias("norm_ratio"),
    )


def _nprobe_sweep_oracle(n_lists: int = 8, iters: int = 2) -> str:
    """Fit replay + multi-probe IVF recall/cost sweep at nprobe 1/2/4."""
    score = "list_dot_product(c.c, c.c) - 2 * list_dot_product(e.v, c.c)"
    cos_pc = _COS.format(a="p.qv", b="c.v")
    cos_qc = _COS.format(a="q.v", b="c.v")
    return f"""{_kmeans_fit_ctes(n_lists, iters)},
    qd AS (
      SELECT e.vec_id AS q_id, e.v AS qv, c.cid,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
               ORDER BY {score}, c.cid) AS crank
      FROM af e CROSS JOIN c{iters} c
      WHERE e.vec_id < 5
    ),
    probes AS (SELECT q_id, qv, cid, crank FROM qd WHERE crank <= 4),
    sweep AS (SELECT unnest([1, 2, 4]) AS nprobe),
    cand AS (
      SELECT s.nprobe, p.q_id, c.vec_id AS cand_id,
             {cos_pc} AS cos_sim
      FROM sweep s
      JOIN probes p ON p.crank <= s.nprobe
      JOIN af c ON c.list_id = p.cid
      WHERE c.vec_id <> p.q_id
    ),
    annk AS (
      SELECT nprobe, q_id, cand_id FROM (
        SELECT nprobe, q_id, cand_id,
               ROW_NUMBER() OVER (PARTITION BY nprobe, q_id
                 ORDER BY cos_sim DESC, cand_id) AS rn
        FROM cand
      ) WHERE rn <= 5
    ),
    cost AS (
      SELECT nprobe, sum(cnt) AS total_candidates FROM (
        SELECT nprobe, q_id, count(*) AS cnt FROM cand GROUP BY 1, 2
      ) GROUP BY nprobe
    ),
    exact AS (
      SELECT q_id, cand_id FROM (
        SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                 ORDER BY {cos_qc} DESC, c.vec_id) AS rn
        FROM af q JOIN af c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < 5
      ) WHERE rn <= 5
    ),
    hits AS (
      SELECT s.nprobe, e.q_id, count(a.cand_id) AS n_hits
      FROM sweep s
      CROSS JOIN exact e
      LEFT JOIN annk a ON a.nprobe = s.nprobe AND a.q_id = e.q_id
                      AND a.cand_id = e.cand_id
      GROUP BY 1, 2
    )
    SELECT CAST(h.nprobe AS BIGINT) AS nprobe,
           CAST(count(*) AS BIGINT) AS n_queries,
           round(sum(h.n_hits) / (5.0 * count(*)), 4) AS recall_at_5,
           CAST(any_value(c.total_candidates) AS BIGINT)
             AS total_candidates
    FROM hits h JOIN cost c ON h.nprobe = c.nprobe
    GROUP BY h.nprobe
    """


@register(
    "sim_ann_nprobe_sweep",
    oracle=_nprobe_sweep_oracle(),
    tags=("similarity", "ivf", "nprobe", "evaluation"),
)
def sim_ann_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF nprobe tuning sweep: recall@5 vs candidate-scan cost at
    nprobe ∈ {1, 2, 4} against the SAME KMeans quantizer — the table an
    operator reads to pick the recall/latency point before deploying ANN
    (the multi-list generalization of `sim_ann_recall`).

    Queries rank ALL centroids once (a sorted literal-array expression —
    pure codegen, no join), probe their top-nprobe lists, and each sweep
    point re-ranks the probed union.  Corpus vectors shuffle ONCE keyed
    by list_id; the sweep dimension rides the tiny broadcast query side.
    Exact ground truth broadcasts the 5 queries (never a corpus
    self-join).  At 100 TB the sweep runs on a query sample and the
    probe scans are partition-pruned by list_id."""
    t = load_tables(spark, sf_dir, ["embeddings"])
    emb = t["embeddings"]
    centroids = sim.kmeans_fit(emb, n_lists=8, iters=2)
    base = (
        emb.select("vec_id", sim.as_double("embedding").alias("v"))
        .withColumn("list_id", sim._assign_col(F.col("v"), centroids))
        .withColumn("nv", sim.norm_col(F.col("v")))
    )

    # per-query centroid ranking as a sorted (score, cid) struct array
    structs = []
    for cid, c in centroids:
        cc = 0.0
        for x in c:
            cc = cc + x * x
        lit_c = F.array(*[F.lit(x) for x in c])
        structs.append(
            F.struct(
                (F.lit(cc) - F.lit(2.0) * sim.dot(F.col("v"), lit_c)).alias(
                    "s"
                ),
                F.lit(cid).alias("cid"),
            )
        )
    ranked = (
        F.slice(F.sort_array(F.array(*structs)), 1, 4)
        if structs
        # empty fit: posexplode of a typed NULL array yields no rows
        else F.lit(None).cast("array<struct<s:double,cid:int>>")
    )
    probes = (
        base.filter(F.col("vec_id") < 5)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("v").alias("qv"),
            F.col("nv").alias("nq"),
            F.posexplode(ranked).alias("pos", "pc"),
        )
        .select(
            "q_id",
            "qv",
            "nq",
            F.col("pc.cid").alias("probe_list"),
            (F.col("pos") + 1).alias("crank"),
        )
    )
    # expand each probe row to the sweep points it serves via a filtered
    # literal array — pure codegen, no inequality join, no cartesian
    sweep_arr = F.array(F.lit(1), F.lit(2), F.lit(4))
    probes_x = probes.select(
        "q_id",
        "qv",
        "nq",
        "probe_list",
        F.explode(
            F.filter(sweep_arr, lambda n: F.col("crank") <= n)
        ).alias("nprobe"),
    )
    cand = (
        base.join(
            F.broadcast(probes_x),
            F.col("list_id") == F.col("probe_list"),
        )
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "nprobe",
            "q_id",
            F.col("vec_id").alias("cand_id"),
            F.round(
                sim.dot(F.col("qv"), F.col("v"))
                / (F.col("nq") * F.col("nv")),
                6,
            ).alias("cos_sim"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("nprobe", "q_id").orderBy(
        F.desc("cos_sim"), F.asc("cand_id")
    )
    # r11 (guide §1.2/§2.4): the scan-cost readout shares the top-k
    # window pass — per-group candidate counts ride a whole-partition
    # count window over the same (nprobe, q_id) exchange, and cost sums
    # the rn==1 rows' counts, instead of re-instantiating the corpus ⋈
    # probes join (and its per-candidate cosines) in a second groupBy
    # lineage.  Groups exist iff they have ≥1 candidate in both shapes,
    # so the summed integers are identical.
    ranked_cand = (
        cand.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "cnt", F.count(F.lit(1)).over(W.partitionBy("nprobe", "q_id"))
        )
        .filter(F.col("rn") <= 5)
    )
    annk = ranked_cand.select("nprobe", "q_id", "cand_id")
    cost = (
        ranked_cand.filter(F.col("rn") == 1)
        .groupBy("nprobe")
        .agg(F.sum("cnt").alias("total_candidates"))
    )
    exact = sim.brute_force_topk(emb, F.col("vec_id") < 5, k=5).select(
        "q_id", "cand_id"
    )
    exact_x = exact.select(
        "q_id", "cand_id", F.explode(sweep_arr).alias("nprobe")
    )
    hits = (
        exact_x
        .join(
            annk.toDF("a_np", "a_qid", "a_cid"),
            (F.col("nprobe") == F.col("a_np"))
            & (F.col("q_id") == F.col("a_qid"))
            & (F.col("cand_id") == F.col("a_cid")),
            "left",
        )
        .groupBy("nprobe", "q_id")
        .agg(F.count("a_cid").alias("n_hits"))
    )
    return (
        hits.groupBy("nprobe")
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.round(
                F.sum("n_hits") / (5.0 * F.count(F.lit(1))), 4
            ).alias("recall_at_5"),
        )
        .join(F.broadcast(cost), "nprobe")
        .select(
            F.col("nprobe").cast("long").alias("nprobe"),
            F.col("n_queries").cast("long").alias("n_queries"),
            "recall_at_5",
            F.col("total_candidates").cast("long").alias("total_candidates"),
        )
    )


def _kcenter_oracle(rounds: int = 3) -> str:
    """Chained-CTE replay of deterministic farthest-point k-center
    selection on 1e-3-quantized integer vectors."""
    dist = (
        "list_sum(list_transform(range(1, 65), "
        "i -> (x.qv[i] - c.qv[i]) * (x.qv[i] - c.qv[i])))"
    )
    sql = """
    WITH qx AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[],
                            v -> CAST(floor(v * 1000 + 0.5) AS BIGINT))
               AS qv
      FROM embeddings
    ),
    c0 AS (
      SELECT vec_id, qv, 0 AS rnk FROM qx
      ORDER BY md5(vec_id::VARCHAR) LIMIT 1
    ),
    d0 AS (
      SELECT x.vec_id, x.qv, {d} AS d
      FROM qx x CROSS JOIN c0 c
    )""".format(d=dist)
    for r in range(1, rounds + 1):
        sql += f""",
    c{r} AS (
      SELECT vec_id, qv, {r} AS rnk FROM d{r - 1}
      ORDER BY d DESC, vec_id LIMIT 1
    ),
    d{r} AS (
      SELECT x.vec_id, x.qv, least(x.d, {dist.replace('x.qv', 'x.qv')}) AS d
      FROM d{r - 1} x CROSS JOIN c{r} c
    )"""
    centers_union = " UNION ALL ".join(
        f"SELECT vec_id, qv, rnk FROM c{r}" for r in range(rounds + 1)
    )
    return f"""{sql},
    ctr AS ({centers_union}),
    ad AS (
      SELECT x.vec_id, c.rnk,
             list_sum(list_transform(range(1, 65),
               i -> (x.qv[i] - c.qv[i]) * (x.qv[i] - c.qv[i]))) AS d
      FROM qx x CROSS JOIN ctr c
    ),
    best AS (
      SELECT vec_id, rnk, d FROM (
        SELECT vec_id, rnk, d,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY d, rnk) AS rn
        FROM ad
      ) WHERE rn = 1
    )
    SELECT CAST(c.rnk AS BIGINT) AS center_rank,
           CAST(c.vec_id AS BIGINT) AS center_vec_id,
           CAST(count(*) AS BIGINT) AS n_assigned,
           CAST(max(b.d) AS BIGINT) AS max_dist_q
    FROM best b JOIN ctr c ON b.rnk = c.rnk
    GROUP BY 1, 2
    """


@register(
    "sample_kcenter_coreset",
    oracle=_kcenter_oracle(),
    tags=("sampling", "coreset", "k-center"),
)
def sample_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset (farthest-point sampling): pick 4 maximally
    spread exemplar vectors, then report each center's assignment count
    and coverage radius — the diversity-maximizing data-selection rule
    (a coreset that bounds every point's distance to its exemplar, used
    for embedding-space-covering subset selection).

    Each round is ONE corpus scan: the running min-distance-to-selected
    updates against the (broadcast-literal) newest center, and the next
    center is the argmax — a TakeOrderedAndProject head, never a sort.
    Components quantize to 1e-3 integers so every distance is an exact
    BIGINT and the argmax/assignment ties (broken by vec_id / rank) are
    engine-independent; the chained-CTE oracle replays the fit
    verbatim.  At 100 TB you run rounds on a uniform sample and assign
    the full corpus once — the same two-phase shape as `kmeans_fit`."""
    t = load_tables(spark, sf_dir, ["embeddings"])
    qx = t["embeddings"].select(
        "vec_id",
        F.transform(
            sim.as_double("embedding"),
            lambda v: F.floor(v * 1000 + 0.5).cast("long"),
        ).alias("qv"),
    )

    def sqdist_to(lit_center: list[int]):
        lit_arr = F.array(*[F.lit(int(x)) for x in lit_center])
        return F.aggregate(
            F.zip_with(
                F.col("qv"), lit_arr, lambda a, b: (a - b) * (a - b)
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    head = qx.orderBy(F.md5(F.col("vec_id").cast("string"))).limit(1).collect()
    if not head:  # empty corpus: no exemplars to select
        return spark.createDataFrame(
            [],
            "center_rank LONG, center_vec_id LONG, n_assigned LONG,"
            " max_dist_q LONG",
        )
    first = head[0]
    centers = [(0, int(first["vec_id"]), list(first["qv"]))]
    cur = qx.withColumn("d", sqdist_to(centers[0][2]))
    for r in range(1, 4):
        far = cur.orderBy(F.desc("d"), F.asc("vec_id")).limit(1).collect()[0]
        centers.append((r, int(far["vec_id"]), list(far["qv"])))
        cur = cur.withColumn(
            "d", F.least(F.col("d"), sqdist_to(centers[-1][2]))
        )
    dists = [sqdist_to(qvv).alias(f"dd{r}") for r, _, qvv in centers]
    ad = qx.select("vec_id", *dists)
    mn = F.least(*[F.col(f"dd{r}") for r in range(4)])
    rnk = F.when(F.col("dd0") == F.col("mn"), 0)
    for r in range(1, 4):
        rnk = rnk.when(F.col(f"dd{r}") == F.col("mn"), r)
    assign = ad.withColumn("mn", mn).select(
        "vec_id", "mn", rnk.alias("rnk")
    )
    centers_df = spark.createDataFrame(
        [(r, v) for r, v, _ in centers],
        "center_rank INT, center_vec_id LONG",
    )
    return (
        assign.groupBy("rnk")
        .agg(
            F.count(F.lit(1)).alias("n_assigned"),
            F.max("mn").alias("max_dist_q"),
        )
        .join(
            F.broadcast(centers_df),
            F.col("rnk") == F.col("center_rank"),
        )
        .select(
            F.col("center_rank").cast("long").alias("center_rank"),
            F.col("center_vec_id").cast("long").alias("center_vec_id"),
            F.col("n_assigned").cast("long").alias("n_assigned"),
            F.col("max_dist_q").cast("long").alias("max_dist_q"),
        )
    )


def _mmr_oracle(k_sel: int = 5, shortlist: int = 20) -> str:
    """Chained-CTE replay of MMR selection over int8 shortlists."""
    base = f"""
    WITH q8 AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[],
               x -> CASE WHEN mx = 0 THEN 0
                    ELSE CAST(floor(x * 127.0 / mx + 0.5) AS BIGINT) END)
               AS qv
      FROM (
        SELECT vec_id, embedding,
               list_max(list_transform(embedding::DOUBLE[], x -> abs(x)))
                 AS mx
        FROM embeddings
      )
    ),
    qs AS (SELECT vec_id AS q_id, qv AS qq FROM q8 WHERE vec_id < 5),
    rel AS (
      SELECT q_id, cand_id, r FROM (
        SELECT q.q_id, c.vec_id AS cand_id,
               list_dot_product(q.qq, c.qv) AS r,
               ROW_NUMBER() OVER (PARTITION BY q.q_id
                 ORDER BY list_dot_product(q.qq, c.qv) DESC, c.vec_id) AS rn
        FROM qs q JOIN q8 c ON c.vec_id <> q.q_id
      ) WHERE rn <= {shortlist}
    ),
    sims AS (
      SELECT a.q_id, a.cand_id AS c1, b.cand_id AS c2,
             list_dot_product(x.qv, y.qv) AS s
      FROM rel a
      JOIN rel b ON a.q_id = b.q_id AND a.cand_id <> b.cand_id
      JOIN q8 x ON x.vec_id = a.cand_id
      JOIN q8 y ON y.vec_id = b.cand_id
    ),
    s1 AS (
      SELECT q_id, cand_id, 1 AS step FROM (
        SELECT q_id, cand_id,
               ROW_NUMBER() OVER (PARTITION BY q_id
                 ORDER BY r DESC, cand_id) AS rn
        FROM rel
      ) WHERE rn = 1
    )"""
    prev_union = "SELECT q_id, cand_id, step FROM s1"
    for k in range(2, k_sel + 1):
        base += f""",
    sel{k - 1} AS ({prev_union}),
    s{k} AS (
      SELECT q_id, cand_id, {k} AS step FROM (
        SELECT r.q_id, r.cand_id,
               ROW_NUMBER() OVER (PARTITION BY r.q_id
                 ORDER BY 7 * r.r - 3 * ms.maxsim DESC, r.cand_id) AS rn
        FROM rel r
        JOIN (
          SELECT s.q_id, s.c1 AS cand_id, max(s.s) AS maxsim
          FROM sims s
          JOIN sel{k - 1} d ON d.q_id = s.q_id AND d.cand_id = s.c2
          GROUP BY s.q_id, s.c1
        ) ms ON ms.q_id = r.q_id AND ms.cand_id = r.cand_id
        WHERE NOT EXISTS (
          SELECT 1 FROM sel{k - 1} d
          WHERE d.q_id = r.q_id AND d.cand_id = r.cand_id
        )
      ) WHERE rn = 1
    )"""
        prev_union += f" UNION ALL SELECT q_id, cand_id, step FROM s{k}"
    return f"""{base}
    SELECT CAST(q_id AS BIGINT) AS q_id,
           CAST(step AS BIGINT) AS step,
           CAST(cand_id AS BIGINT) AS cand_id
    FROM ({prev_union})
    """


@register(
    "sim_mmr_diversified_topk",
    oracle=_mmr_oracle(),
    tags=("similarity", "mmr", "diversity", "retrieval"),
)
def sim_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998): pick 5
    results per query that are RELEVANT but mutually DIVERSE —
    iteratively argmax λ·rel(c) − (1−λ)·max sim(c, selected) with
    λ = 0.7 (integer-scaled 7·rel − 3·maxsim) — the re-rank layer that
    stops near-duplicate passages from filling a retrieval context
    window.

    MMR's iterations are inherently sequential, so the scale design
    confines them to a per-query SHORTLIST (top-20 by relevance — a
    WindowGroupLimit heap over the int8 scoring pass); all pairwise
    similarities live inside shortlists (20² per query, never corpus²).
    Int8 dots make every score an exact integer — selection ties break
    on cand_id identically in both engines, and the chained-CTE oracle
    replays all five steps."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ["embeddings"])
    emb = t["embeddings"].select(
        "vec_id",
        F.col("embedding").alias("v"),
        F.array_max(
            F.transform(F.col("embedding"), lambda x: F.abs(x))
        ).alias("mx"),
    )
    q8 = emb.select(
        "vec_id",
        F.transform(
            F.col("v"),
            lambda x: F.when(F.col("mx") == 0, F.lit(0).cast("long"))
            .otherwise(
                F.floor(x * 127.0 / F.col("mx") + 0.5).cast("long")
            ),
        ).alias("qv"),
    )
    idot = F.aggregate(
        F.zip_with(F.col("qq"), F.col("cv"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    qs = q8.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("qv").alias("qq")
    )
    cands = q8.select(
        F.col("vec_id").alias("cand_id"), F.col("qv").alias("cv")
    )
    wrel = W.partitionBy("q_id").orderBy(F.desc("r"), F.asc("cand_id"))
    rel = (
        qs.crossJoin(F.broadcast(cands))
        .filter(F.col("cand_id") != F.col("q_id"))
        .select("q_id", "cand_id", "cv", idot.alias("r"))
        .withColumn("rn", F.row_number().over(wrel))
        .filter(F.col("rn") <= 20)
        .drop("rn")
    )
    # r11 (guide §2.4/§3.3): the former driver-side greedy loop built
    # `selected` by unioning a `pick` that re-referenced rel + sims +
    # the previous `selected` each step — lineage grew geometrically
    # (441 Exchanges / 402 parquet scans in the physical plan) and the
    # plan itself became the scale wall past sf100.  The shortlist is
    # ≤20 candidates per query by construction, so the whole 5-step
    # selection fits in ONE row per query: collect each shortlist,
    # precompute the ≤20×20 integer sims matrix with nested transforms,
    # and run the greedy argmax inside a single aggregate() expression.
    # Selection math is unchanged and all-integer: step 1 maximizes
    # 7·r (same argmax and cand_id tie-break as ordering by r), later
    # steps 7·r − 3·max_{d∈selected} sim(c, d); ties break on the
    # lowest cand_id because cs is sorted by cand_id and the argmax
    # uses a strict >.  Physical plan: 2 scans / 3 exchanges, no
    # per-step re-instantiation.
    grouped = rel.groupBy("q_id").agg(
        F.sort_array(
            F.collect_list(F.struct("cand_id", "r", "cv"))
        ).alias("cs")
    )
    dot = lambda u, v: F.aggregate(
        F.zip_with(u, v, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    with_sims = grouped.select(
        "q_id",
        "cs",
        F.transform(
            F.col("cs"),
            lambda ci: F.transform(
                F.col("cs"), lambda cj: dot(ci["cv"], cj["cv"])
            ),
        ).alias("sm"),
    )
    n = F.size(F.col("cs"))

    def pick(sel):
        # argmax over unselected shortlist indexes of
        # 7·r − 3·maxsim(·, sel); first (lowest cand_id) wins ties
        def score(i):
            r_i = F.element_at(F.col("cs"), i + 1)["r"]
            maxsim = F.when(
                F.size(sel) == 0, F.lit(0).cast("long")
            ).otherwise(
                F.array_max(
                    F.transform(
                        sel,
                        lambda j: F.element_at(
                            F.element_at(F.col("sm"), i + 1), j + 1
                        ),
                    )
                )
            )
            return 7 * r_i - 3 * maxsim

        return F.aggregate(
            F.filter(
                F.sequence(F.lit(0), n - 1),
                lambda i: ~F.array_contains(sel, i),
            ),
            F.struct(
                F.lit(-1).alias("bi"), F.lit(None).cast("long").alias("bs")
            ),
            lambda st, i: F.when(
                st["bs"].isNull() | (score(i) > st["bs"]),
                F.struct(i.alias("bi"), score(i).alias("bs")),
            ).otherwise(st),
        )["bi"]

    sel_idx = F.aggregate(
        F.sequence(F.lit(1), F.least(F.lit(5), n)),
        F.array().cast("array<int>"),
        lambda acc, _k: F.array_append(acc, pick(acc)),
    )
    return (
        with_sims.select(
            "q_id", "cs", F.posexplode(sel_idx).alias("pos", "idx")
        )
        .select(
            F.col("q_id").cast("long").alias("q_id"),
            (F.col("pos") + 1).cast("long").alias("step"),
            F.element_at(F.col("cs"), F.col("idx") + 1)["cand_id"]
            .cast("long")
            .alias("cand_id"),
        )
    )


@register(
    "sim_rrf_hybrid",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
    docfreq AS (SELECT tok, count(*) AS df_docs FROM tf GROUP BY tok),
    nd AS (SELECT count(*) * 1.0 AS n_docs FROM documents),
    q AS (SELECT unnest(['spark', 'join', 'fast']) AS tok),
    lex AS (
      SELECT doc_id, row_number() OVER (
               ORDER BY score_q DESC, doc_id ASC) AS rank_lex
      FROM (
        SELECT tf.doc_id,
               sum(tf.tf * CAST(round(ln(n_docs / df_docs) * 1e6) AS BIGINT))
                 AS score_q
        FROM tf JOIN q USING (tok) JOIN docfreq USING (tok), nd
        GROUP BY tf.doc_id
      ) QUALIFY rank_lex <= 50
    ),
    emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    qv AS (SELECT v AS qv FROM emb WHERE vec_id = 0),
    vec AS (
      SELECT vec_id, row_number() OVER (
               ORDER BY cos_sim DESC, vec_id ASC) AS rank_vec
      FROM (
        SELECT c.vec_id, {{cos}} AS cos_sim
        FROM emb c, qv WHERE c.vec_id <> 0
      ) QUALIFY rank_vec <= 50
    ),
    fused AS (
      SELECT COALESCE(l.doc_id, v.vec_id) AS doc_id,
             COALESCE(l.rank_lex, 0) AS rank_lex,
             COALESCE(v.rank_vec, 0) AS rank_vec,
             COALESCE(CAST(round(1e9 / (60 + l.rank_lex)) AS BIGINT), 0)
             + COALESCE(CAST(round(1e9 / (60 + v.rank_vec)) AS BIGINT), 0)
               AS rrf_q
      FROM lex l FULL OUTER JOIN vec v ON v.vec_id = l.doc_id
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(rank_lex AS BIGINT) AS rank_lex,
           CAST(rank_vec AS BIGINT) AS rank_vec,
           round(rrf_q / 1e9, 6) AS rrf,
           CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT *, row_number() OVER (ORDER BY rrf_q DESC, doc_id ASC) AS rn
      FROM fused
    ) WHERE rn <= 15
    """.format(cos=_COS.format(a="qv", b="c.v")),
    tags=("similarity", "retrieval", "hybrid", "rrf"),
)
def sim_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion (k=60): a lexical
    shortlist (tf-idf over a fixed query term set, top-50) and a vector
    shortlist (exact cosine against a fixed anchor embedding, top-50)
    fuse by summed 1/(60+rank) — the standard production combination of
    keyword and semantic search, linked on the shared doc_id = vec_id.

    Scale shape: each arm is an already-proven bounded pattern (postings
    broadcast-join + TakeOrdered heap; broadcast query vector + heap);
    the fusion itself joins two ≤50-row shortlists — driver-free,
    corpus-size-independent.  RRF contributions are 1e-9-quantized
    BIGINTs so the fused ordering is engine-exact; absent ranks surface
    as 0 (arm did not propose the document)."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ["documents", "embeddings"])

    # lexical arm: identical scoring to text_keyword_search.
    # r11 (guide §1.2): document frequency as a count window over the
    # query-matched postings, partitioned by term — a term's tf rows
    # ARE its posting list, so the per-partition count equals df_docs
    # exactly.  The old shape re-instantiated the tokenize+tf
    # aggregation to build a whole-vocabulary docfreq table and
    # broadcast it back (an O(|vocab|) broadcast growing with the
    # corpus); now the token explode runs once and only the ≤|q|-term
    # partitions are counted.
    toks = t["documents"].select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    n_docs = t["documents"].agg(
        F.count(F.lit(1)).cast("double").alias("n_docs")
    )
    q = spark.createDataFrame([("spark",), ("join",), ("fast",)], ["tok"])
    # r12 (guide §2.3): filter BEFORE aggregating — the broadcast query
    # join drops non-matching tokens map-side, so the tf aggregation is
    # over matched postings only, not the corpus vocabulary (same
    # rewrite as text_keyword_search; identical tf for matched terms).
    tf = (
        toks.join(F.broadcast(q), "tok")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf_q = F.round(
        F.log(F.col("n_docs") / F.col("df_docs")) * 1e6
    ).cast("long")
    lex_scored = (
        tf.withColumn(
            "df_docs", F.count(F.lit(1)).over(W.partitionBy("tok"))
        )
        .crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * idf_q).alias("score_q"))
    )
    w_lex = W.orderBy(F.col("score_q").desc(), F.col("doc_id").asc())
    lex = (
        lex_scored.withColumn("rank_lex", F.row_number().over(w_lex))
        .filter(F.col("rank_lex") <= 50)
        .select("doc_id", "rank_lex")
    )

    # vector arm: exact cosine against the anchor embedding (vec_id 0)
    emb = t["embeddings"].select(
        F.col("vec_id"), sim.as_double("embedding").alias("v")
    )
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("v").alias("qv"),
        sim.norm_col(F.col("v")).alias("nq"),
    )
    w_vec = W.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    vec = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            F.round(
                sim.dot(F.col("qv"), F.col("v"))
                / (F.col("nq") * sim.norm_col(F.col("v"))),
                6,
            ).alias("cos_sim"),
        )
        .withColumn("rank_vec", F.row_number().over(w_vec))
        .filter(F.col("rank_vec") <= 50)
        .select("vec_id", "rank_vec")
    )

    rrf_arm = lambda r: F.round(1e9 / (60 + F.col(r))).cast("long")  # noqa: E731
    fused = (
        lex.join(vec, lex.doc_id == vec.vec_id, "full_outer")
        .select(
            F.coalesce("doc_id", "vec_id").alias("doc_id"),
            F.coalesce("rank_lex", F.lit(0)).alias("rank_lex"),
            F.coalesce("rank_vec", F.lit(0)).alias("rank_vec"),
            (
                F.coalesce(rrf_arm("rank_lex"), F.lit(0))
                + F.coalesce(rrf_arm("rank_vec"), F.lit(0))
            ).alias("rrf_q"),
        )
    )
    w_f = W.orderBy(F.col("rrf_q").desc(), F.col("doc_id").asc())
    return (
        fused.withColumn("rn", F.row_number().over(w_f).cast("long"))
        .filter(F.col("rn") <= 15)
        .select(
            F.col("doc_id").cast("long"),
            F.col("rank_lex").cast("long"),
            F.col("rank_vec").cast("long"),
            F.round(F.col("rrf_q") / 1e9, 6).alias("rrf"),
            "rn",
        )
    )


@register(
    "sim_ivf_incremental_add",
    oracle=_kmeans_fit_ctes(where="vec_id % 10 <> 0")
    + """,
    newb AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE vec_id % 10 = 0
    ),
    assigned_new AS (
      SELECT vec_id, cid AS list_id,
             CAST(round(score * 1000000) AS BIGINT) AS sq
      FROM (
        SELECT e.vec_id, c.cid,
               list_dot_product(c.c, c.c)
                 - 2 * list_dot_product(e.v, c.c) AS score,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY list_dot_product(c.c, c.c)
                          - 2 * list_dot_product(e.v, c.c), c.cid) AS rn
        FROM newb e CROSS JOIN c2 c
      ) WHERE rn = 1
    ),
    old_counts AS (
      SELECT list_id, count(*) AS n_old FROM af GROUP BY list_id
    ),
    add_counts AS (
      SELECT list_id, count(*) AS n_added,
             sum(sq) AS ssq
      FROM assigned_new GROUP BY list_id
    )
    SELECT CAST(o.list_id AS BIGINT) AS list_id,
           CAST(o.n_old AS BIGINT) AS n_old,
           CAST(COALESCE(a.n_added, 0) AS BIGINT) AS n_added,
           CAST(o.n_old + COALESCE(a.n_added, 0) AS BIGINT) AS n_total,
           round(COALESCE(a.n_added, 0) * 1.0 / o.n_old, 6) AS growth,
           round(a.ssq / a.n_added / 1000000.0, 6) AS mean_add_score
    FROM old_counts o LEFT JOIN add_counts a USING (list_id)
    """,
    tags=("similarity", "ivf", "incremental", "maintenance"),
)
def sim_ivf_incremental_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index maintenance: the coarse quantizer is fitted
    on the STANDING corpus only (vec_id % 10 ≠ 0), then the new batch
    (vec_id % 10 = 0) assigns to the FROZEN centroids — adds never
    retrain, which is what makes continuous embedding ingestion cheap.
    Reports per list: standing size, additions, growth, and the mean
    assignment score of the added vectors — the drift signal that says
    when new data has moved away from the existing centroids and a
    re-train is due.

    Scale shape: the fit touches the corpus (sampled at 100 TB); the
    per-batch add is ONE narrow map over the new vectors against
    broadcast centroid literals plus a ≤n_lists-row aggregation —
    cost tracks the batch, never the index.  Assignment scores quantize
    to 1e-6 integers so the per-list means are engine-exact."""
    t = load_tables(spark, sf_dir, ["embeddings"])
    emb = t["embeddings"].select(
        F.col("vec_id"), sim.as_double("embedding").alias("v")
    )
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    newb = emb.filter(F.col("vec_id") % 10 == 0)
    centroids = sim.kmeans_fit(
        corpus, n_lists=8, iters=2, id_col="vec_id", vec_col="v"
    )

    def assign_with_score(df):
        if not centroids:  # empty fit: typed NULLs keep the plan analyzable
            return df.select(
                "vec_id",
                F.lit(None).cast("int").alias("list_id"),
                F.lit(None).cast("long").alias("sq"),
            )
        scores = []
        for _, c in centroids:
            cc = 0.0
            for x in c:  # sequential, mirroring list_dot_product(c, c)
                cc = cc + x * x
            lit_c = F.array(*[F.lit(x) for x in c])
            scores.append(
                F.lit(cc) - F.lit(2.0) * sim.dot(F.col("v"), lit_c)
            )
        arr = F.array(*scores)
        idx = F.array_position(arr, F.array_min(arr)).cast("int")
        cid_arr = F.array(*[F.lit(cid) for cid, _ in centroids])
        return df.select(
            "vec_id",
            F.element_at(cid_arr, idx).alias("list_id"),
            F.round(F.array_min(arr) * 1000000).cast("long").alias("sq"),
        )

    old_counts = (
        assign_with_score(corpus)
        .groupBy("list_id")
        .agg(F.count(F.lit(1)).alias("n_old"))
    )
    add_counts = (
        assign_with_score(newb)
        .groupBy("list_id")
        .agg(
            F.count(F.lit(1)).alias("n_added"),
            F.sum("sq").alias("ssq"),
        )
    )
    return old_counts.join(add_counts, "list_id", "left").select(
        F.col("list_id").cast("long"),
        F.col("n_old").cast("long"),
        F.coalesce("n_added", F.lit(0)).cast("long").alias("n_added"),
        (F.col("n_old") + F.coalesce("n_added", F.lit(0)))
        .cast("long")
        .alias("n_total"),
        F.round(
            F.coalesce("n_added", F.lit(0)) * 1.0 / F.col("n_old"), 6
        ).alias("growth"),
        F.round(
            F.col("ssq") / F.col("n_added") / 1000000.0, 6
        ).alias("mean_add_score"),
    )
