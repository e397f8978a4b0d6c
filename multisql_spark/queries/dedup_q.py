"""Deduplication queries over the ``documents`` table (beyond-reference
operators from BASELINE.json, implemented in
:mod:`multisql_spark.operators.dedup`).

All fingerprints are md5-based, so the DuckDB oracle computes *identical*
signatures — these are full hash-match checks, not rows-only."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multisql_spark.operators import dedup
from multisql_spark.queries import register
from multisql_spark.tables import load_tables

K = 12
BANDS = 4
ROWS_PER_BAND = K // BANDS
# Per-bucket membership cap — the 100 TB guard (operators/dedup.py:210).
# Every consumer of LSH candidate pairs uses the capped enumeration;
# uncapped Θ(m²) buckets empirically OOM one decade up (r6 sf1 sweep).
CAP = 32
# The one uncapped query (`dedup_minhash_lsh`) runs on a deterministic
# 1/SAMPLE_MOD document sample instead: the calibration baseline that
# shows full uncapped semantics at a corpus-size-decoupled cost.
SAMPLE_MOD = 16


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS h, CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           COUNT(*) AS n_dups
    FROM documents GROUP BY md5(text)
    """,
    tags=("dedup", "exact"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash (hash-groupBy; only 32-byte digests
    shuffle at 100 TB, not documents)."""
    t = load_tables(spark, sf_dir, ["documents"])
    return dedup.exact_dedup(t["documents"])


def _pairs_oracle(capped: bool = True, sample_mod: int | None = None) -> str:
    """DuckDB SQL for the banded-LSH candidate pairs with estimated
    Jaccard — the shared CTE every dedup consumer's oracle embeds.

    ``capped=True`` mirrors :func:`dedup.lsh_candidate_pairs_capped`
    (per-bucket ROW_NUMBER ≤ CAP over doc_id — the 100 TB guard);
    ``sample_mod`` mirrors the deterministic md5 document sample of the
    uncapped calibration baseline."""
    sig_cols = ",\n      ".join(
        f"min(md5(tok || '#{i}')) AS sig_{i}" for i in range(1, K + 1)
    )
    band_cases = []
    for b in range(BANDS):
        parts = " || '|' || ".join(
            f"sig_{b * ROWS_PER_BAND + j + 1}" for j in range(ROWS_PER_BAND)
        )
        band_cases.append(f"WHEN {b} THEN md5({parts})")
    band_case = "CASE band_id " + " ".join(band_cases) + " END"
    agree = " + ".join(
        f"(CASE WHEN sa.sig_{i} = sb.sig_{i} THEN 1 ELSE 0 END)"
        for i in range(1, K + 1)
    )
    where = ""
    if sample_mod is not None:
        where = (
            "WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))"
            f" AS BIGINT) % {sample_mod} = 0"
        )
    if capped:
        member_src = f"""
    capped AS (
      SELECT doc_id, band_id, band_key
      FROM (
        SELECT doc_id, band_id, band_key,
               ROW_NUMBER() OVER (
                 PARTITION BY band_id, band_key ORDER BY doc_id
               ) AS rnk
        FROM bandk
      ) WHERE rnk <= {CAP}
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM capped a
      JOIN capped b ON a.band_id = b.band_id AND a.band_key = b.band_key
      WHERE a.doc_id < b.doc_id
    )"""
    else:
        member_src = """
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bandk a
      JOIN bandk b ON a.band_id = b.band_id AND a.band_key = b.band_key
      WHERE a.doc_id < b.doc_id
    )"""
    # Mirror of the engine's narrowed band join (operators/dedup.py:
    # round-2 fix): the DISTINCT over candidate pairs carries ids ONLY,
    # and the K signature columns re-join by id afterwards — without
    # this the oracle drags 2K md5 strings through the pair dedup and
    # spills tens of GB at sf0.1 while the engine side runs fine.
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
      FROM documents
      {where}
    ),
    sigs AS (
      SELECT doc_id,
      {sig_cols}
      FROM toks GROUP BY doc_id
    ),
    bandk AS (
      SELECT doc_id, band_id, {band_case} AS band_key
      FROM sigs, (VALUES (0), (1), (2), (3)) AS bb(band_id)
    ),{member_src}
    SELECT CAST(p.doc_a AS BIGINT) AS doc_a,
           CAST(p.doc_b AS BIGINT) AS doc_b,
           round(({agree}) / {K}.0, 4) AS est_sim
    FROM pairs p
    JOIN sigs sa ON sa.doc_id = p.doc_a
    JOIN sigs sb ON sb.doc_id = p.doc_b
    """


def _capped_pairs_oracle() -> str:
    """Capped full-corpus candidate pairs — what every dedup consumer
    (graph, calibration, ensemble, precision/recall) builds on."""
    return _pairs_oracle(capped=True)


def _sample_filter(docs: DataFrame) -> DataFrame:
    """Deterministic 1/SAMPLE_MOD md5 document sample (Spark side of the
    oracle's ``sample_mod`` predicate)."""
    return docs.filter(
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % SAMPLE_MOD
        == 0
    )


@register(
    "dedup_minhash_lsh",
    oracle=_pairs_oracle(capped=False, sample_mod=SAMPLE_MOD),
    tags=("dedup", "lsh"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(k=12) + 4-band LSH candidate pairs with estimated Jaccard
    — the UNCAPPED enumeration, run on a deterministic 1/16 md5 document
    sample.  This is the calibration baseline for the production path
    (`dedup_lsh_bucket_capped` and every downstream consumer, which all
    use the per-bucket cap): the sample bounds the cost — uncapped
    buckets are Θ(m²) and a full-corpus run empirically OOMs one decade
    up — while preserving exact uncapped semantics on the sampled
    subset, so cap recall can be measured against it.  At 100 TB the
    sample fraction is the knob: dial it so the sampled corpus stays
    ~1M docs and the baseline's cost is decoupled from corpus size.
    Scale shape: signature build is one groupBy(doc); the band self-join
    keys on (band_id, band_key), so work is proportional to real
    collisions — never all-pairs."""
    t = load_tables(spark, sf_dir, ["documents"])
    sigs = dedup.minhash_signatures(_sample_filter(t["documents"]), k=K)
    return dedup.lsh_candidate_pairs(sigs, k=K, bands=BANDS)


def _simhash_oracle() -> str:
    return f"""
    WITH toks0 AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
      FROM documents
    ),
    toks AS (SELECT doc_id, md5(tok) AS h FROM toks0)
    SELECT doc_id, CAST({dedup.simhash_bit_sql()} AS BIGINT) AS simhash
    FROM toks GROUP BY doc_id
    """


@register("dedup_simhash", oracle=_simhash_oracle(), tags=("dedup", "simhash"))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprints (bit votes over token md5s). The SQL
    bit logic is literally shared with the oracle
    (operators.dedup.simhash_bit_sql)."""
    t = load_tables(spark, sf_dir, ["documents"])
    return dedup.simhash(t["documents"])


@register(
    "dedup_ngram_jaccard",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             list_distinct(string_split(text, ' ')) AS toks,
             md5(array_to_string(list_slice(string_split(text, ' '), 1, 8),
                 ' ')) AS blk
      FROM documents
    )
    SELECT CAST(a.doc_id AS BIGINT) AS doc_a,
           CAST(b.doc_id AS BIGINT) AS doc_b,
           round(len(list_intersect(a.toks, b.toks)) * 1.0
                 / len(list_distinct(a.toks || b.toks)), 4) AS jaccard
    FROM base a JOIN base b ON a.blk = b.blk
    WHERE a.doc_id < b.doc_id
      AND round(len(list_intersect(a.toks, b.toks)) * 1.0
                / len(list_distinct(a.toks || b.toks)), 4) >= 0.5
    """,
    tags=("dedup", "jaccard"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard within prefix-fingerprint blocks — the
    verify stage after LSH candidate generation."""
    t = load_tables(spark, sf_dir, ["documents"])
    return dedup.ngram_jaccard_pairs(
        t["documents"], block_tokens=8, threshold=0.5
    )


def _cc_oracle() -> str:
    """Connected components as a DuckDB recursive CTE over the same
    minhash candidate pairs: component label = min reachable doc_id —
    an algorithm-independent graph property, so the iterative Spark
    propagation and the recursive closure must agree exactly."""
    return f"""
    WITH RECURSIVE simpairs AS ({_capped_pairs_oracle()}),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM simpairs WHERE est_sim >= 0.5
      UNION
      SELECT doc_b AS u, doc_a AS v FROM simpairs WHERE est_sim >= 0.5
    ),
    reach(node, r) AS (
      SELECT u, v FROM edges
      UNION
      SELECT reach.node, e.v FROM reach JOIN edges e ON reach.r = e.u
    ),
    comp AS (
      SELECT node, LEAST(node, MIN(r)) AS cluster FROM reach GROUP BY node
    ),
    labeled AS (
      SELECT d.doc_id AS node,
             COALESCE(c.cluster, d.doc_id) AS cluster
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    )
    SELECT CAST(cluster AS BIGINT) AS cluster,
           COUNT(*) AS n_docs,
           CAST(MAX(node) AS BIGINT) AS max_doc
    FROM labeled GROUP BY cluster
    """


@register(
    "dedup_cluster_components",
    oracle=_cc_oracle(),
    tags=("dedup", "graph", "connected-components"),
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: LSH candidate pairs (est_sim ≥ 0.5) →
    connected components → one row per cluster with its canonical id
    (min doc_id), size, and max member. Singleton documents are their own
    cluster. This is the pair→cluster→keep-list step of a production
    dedup pipeline; shuffles carry (id, label) longs only."""
    from pyspark.sql import functions as F

    t = load_tables(spark, sf_dir, ["documents"])
    sigs = dedup.minhash_signatures(t["documents"], k=K)
    pairs = dedup.lsh_candidate_pairs_capped(
        sigs, k=K, bands=BANDS, cap=CAP
    ).filter(
        F.col("est_sim") >= 0.5
    )
    comp = dedup.connected_components(pairs)
    docs = t["documents"].select(
        F.col("doc_id").cast("long").alias("node")
    )
    labeled = docs.join(comp, "node", "left").select(
        "node", F.coalesce("label", F.col("node")).alias("cluster")
    )
    return labeled.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("node").alias("max_doc"),
    )


@register(
    "dedup_chunks",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    ch AS (
      SELECT doc_id,
             unnest(list_transform(range(0, len(toks) // 8),
                    i -> array_to_string(toks[i*8+1:i*8+8], ' '))) AS chunk
      FROM t WHERE len(toks) >= 8
    )
    SELECT chunk,
           count(DISTINCT doc_id) AS n_docs,
           count(*) AS n_occurrences
    FROM ch GROUP BY chunk HAVING count(DISTINCT doc_id) > 1
    """,
    tags=("dedup", "chunks", "passage"),
)
def dedup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level exact dedup: disjoint 8-token chunks occurring in
    more than one document — catches shared boilerplate that whole-doc
    hashing misses."""
    t = load_tables(spark, sf_dir, ["documents"])
    return dedup.chunk_dup_stats(t["documents"], width=8)


@register(
    "dedup_incremental",
    oracle="""
    WITH hashed AS (
      SELECT doc_id, md5(lower(trim(text))) AS h FROM documents
    ),
    idx AS (
      SELECT h, min(doc_id) AS canonical_id
      FROM hashed WHERE doc_id % 10 <> 0 GROUP BY h
    )
    SELECT CAST(n.doc_id AS BIGINT) AS doc_id,
           i.canonical_id IS NOT NULL AS is_dup,
           CAST(i.canonical_id AS BIGINT) AS canonical_id
    FROM hashed n LEFT JOIN idx i USING (h)
    WHERE n.doc_id % 10 = 0
    """,
    tags=("dedup", "incremental", "ingestion"),
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: the new batch (doc_id % 10 = 0)
    probes the standing corpus's (hash → min-id) index; only the new
    slice shuffles."""
    t = load_tables(spark, sf_dir, ["documents"])
    return dedup.incremental_dedup(
        t["documents"], F.col("doc_id") % 10 == 0
    )


@register(
    "dedup_remove_boilerplate",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    ch AS (
      SELECT doc_id, u.pos AS pos, u.chunk AS chunk FROM (
        SELECT doc_id,
               unnest(list_transform(range(0, len(toks) // 8),
                      i -> {'pos': i,
                            'chunk': array_to_string(toks[i*8+1:i*8+8], ' ')}))
                 AS u
        FROM t WHERE len(toks) >= 8
      )
    ),
    dup AS (
      SELECT chunk FROM ch GROUP BY chunk
      HAVING count(DISTINCT doc_id) > 1
    ),
    kept AS (SELECT doc_id, pos, chunk FROM ch ANTI JOIN dup USING (chunk)),
    clean AS (
      SELECT doc_id, count(*) AS n_kept,
             md5(string_agg(chunk, ' ' ORDER BY pos)) AS clean_md5
      FROM kept GROUP BY doc_id
    ),
    tot AS (SELECT doc_id, count(*) AS n_chunks FROM ch GROUP BY doc_id)
    SELECT CAST(tot.doc_id AS BIGINT) AS doc_id,
           tot.n_chunks,
           CAST(tot.n_chunks - coalesce(clean.n_kept, 0) AS BIGINT)
             AS n_removed,
           coalesce(clean.clean_md5, md5('')) AS clean_md5
    FROM tot LEFT JOIN clean ON tot.doc_id = clean.doc_id
    """,
    tags=("dedup", "boilerplate", "transform"),
)
def dedup_remove_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strip cross-document duplicated chunks and reassemble each
    document from its surviving chunks — the cleaning transform on top of
    dedup_chunks' detection pass."""
    t = load_tables(spark, sf_dir, ["documents"])
    return dedup.remove_boilerplate(t["documents"], width=8)


_BLOOM_BIT = (
    "(('0x' || substr(h, {off}, 8))::BIGINT % 4096)"
)


def _bloom_oracle() -> str:
    def struct(off: int) -> str:
        pos = _BLOOM_BIT.format(off=off)
        return (
            "{'word_idx': " + pos + " // 32, "
            "'mask': 1::BIGINT << (" + pos + " % 32)}"
        )

    both = f"[{struct(1)}, {struct(9)}]"
    return f"""
    WITH hashed AS (
      SELECT doc_id, md5(lower(trim(text))) AS h FROM documents
    ),
    corpus AS (SELECT * FROM hashed WHERE doc_id % 10 <> 0),
    corpus_bits AS (
      SELECT u.word_idx AS word_idx, u.mask AS mask FROM (
        SELECT unnest({both}) AS u FROM corpus
      )
    ),
    bloom AS (
      SELECT word_idx, bit_or(mask) AS word FROM corpus_bits GROUP BY word_idx
    ),
    idx AS (SELECT h, min(doc_id) AS canonical_id FROM corpus GROUP BY h),
    new_bits AS (
      SELECT doc_id, h, u.word_idx AS word_idx, u.mask AS mask FROM (
        SELECT doc_id, h, unnest({both}) AS u
        FROM hashed WHERE doc_id % 10 = 0
      )
    ),
    probed AS (
      SELECT nb.doc_id, nb.h,
             bool_and(b.word IS NOT NULL AND (b.word & nb.mask) = nb.mask)
               AS bloom_positive
      FROM new_bits nb LEFT JOIN bloom b USING (word_idx)
      GROUP BY nb.doc_id, nb.h
    )
    SELECT CAST(p.doc_id AS BIGINT) AS doc_id,
           p.bloom_positive,
           i.canonical_id IS NOT NULL AS is_dup
    FROM probed p LEFT JOIN idx i USING (h)
    """


@register(
    "dedup_bloom_prefilter",
    oracle=_bloom_oracle(),
    tags=("dedup", "bloom", "ingestion"),
)
def dedup_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter prefilter before exact ingestion dedup: the corpus is
    summarized as a 4096-bit / 2-hash bloom filter (one aggregation, at
    most 128 rows), each new doc (doc_id % 10 = 0) probes the broadcast
    filter, and the output exposes both the bloom verdict and the exact
    one — no false negatives by construction, false positives visible.
    At 100 TB the exact-index join only runs over bloom-positive rows."""
    t = load_tables(spark, sf_dir, ["documents"])
    return dedup.bloom_prefilter(
        t["documents"], F.col("doc_id") % 10 == 0, m_bits=4096
    )


def _incremental_minhash_oracle() -> str:
    sig_cols = ",\n      ".join(
        f"min(md5(tok || '#{i}')) AS sig_{i}" for i in range(1, K + 1)
    )
    band_cases = []
    for b in range(BANDS):
        parts = " || '|' || ".join(
            f"sig_{b * ROWS_PER_BAND + j + 1}" for j in range(ROWS_PER_BAND)
        )
        band_cases.append(f"WHEN {b} THEN md5({parts})")
    band_case = "CASE band_id " + " ".join(band_cases) + " END"
    agree = " + ".join(
        f"(CASE WHEN a.sig_{i} = b.sig_{i} THEN 1 ELSE 0 END)"
        for i in range(1, K + 1)
    )
    vals = ", ".join(f"({b})" for b in range(BANDS))
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
      FROM documents
    ),
    sigs AS (
      SELECT doc_id,
      {sig_cols}
      FROM toks GROUP BY doc_id
    ),
    flagged AS (SELECT *, doc_id % 10 = 0 AS is_new FROM sigs),
    bandk AS (
      SELECT doc_id, is_new, band_id, {band_case} AS band_key
      FROM flagged, (VALUES {vals}) AS bb(band_id)
    ),
    bandc AS (
      SELECT doc_id, band_id, band_key FROM (
        SELECT doc_id, band_id, band_key,
               row_number() OVER (
                 PARTITION BY band_id, band_key ORDER BY doc_id) AS rnk
        FROM bandk WHERE NOT is_new
      ) WHERE rnk <= {CAP}
    ),
    cands AS (
      SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
      FROM bandk n
      JOIN bandc c ON n.band_id = c.band_id AND n.band_key = c.band_key
      WHERE n.is_new
    ),
    scored AS (
      SELECT cand.new_id, cand.corpus_id,
             round(({agree}) / {K}.0, 4) AS est_sim
      FROM cands cand
      JOIN sigs a ON a.doc_id = cand.new_id
      JOIN sigs b ON b.doc_id = cand.corpus_id
    ),
    best AS (
      SELECT new_id, count(*) AS n_candidates,
             max(CASE WHEN rn = 1 THEN corpus_id END) AS best_match_id,
             max(CASE WHEN rn = 1 THEN est_sim END) AS best_sim
      FROM (
        SELECT *, row_number() OVER (
          PARTITION BY new_id ORDER BY est_sim DESC, corpus_id ASC) AS rn
        FROM scored
      ) GROUP BY new_id
    )
    SELECT CAST(f.doc_id AS BIGINT) AS doc_id,
           CAST(coalesce(b.n_candidates, 0) AS BIGINT) AS n_candidates,
           CAST(b.best_match_id AS BIGINT) AS best_match_id,
           b.best_sim,
           coalesce(b.best_sim >= 0.5, FALSE) AS is_neardup
    FROM flagged f LEFT JOIN best b ON b.new_id = f.doc_id
    WHERE f.is_new
    """


@register(
    "dedup_incremental_minhash",
    oracle=_incremental_minhash_oracle(),
    tags=("dedup", "incremental", "lsh"),
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup ingestion probe: the new batch (doc_id % 10 = 0) queries
    the corpus's banded-LSH index and reports its best match by estimated
    Jaccard. One-sided LSH — the corpus contributes only its band index,
    bucket-capped to the CAP smallest ids per (band, key) since r8 (the
    r7 capped-family discipline applied to the incremental probe: the
    uncapped probe went quadratic on derived-scale mega-buckets and
    OOM-killed the sf10 streaming sweep); work per new row is at most
    bands × CAP candidates."""
    t = load_tables(spark, sf_dir, ["documents"])
    return dedup.incremental_minhash_dedup(
        t["documents"], F.col("doc_id") % 10 == 0,
        k=K, bands=BANDS, threshold=0.5, bucket_cap=CAP,
    )


def _ensemble_oracle() -> str:
    return f"""
    WITH est AS ({_capped_pairs_oracle()}),
    toks AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
      FROM documents
    ),
    tsets AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts
      FROM documents
    ),
    hashes AS (SELECT doc_id, md5(tok) AS h FROM toks),
    sh AS (
      SELECT doc_id, CAST({dedup.simhash_bit_sql()} AS BIGINT) AS simhash
      FROM hashes GROUP BY doc_id
    )
    SELECT CAST(e.doc_a AS BIGINT) AS doc_a,
           CAST(e.doc_b AS BIGINT) AS doc_b,
           e.est_sim,
           round(len(list_intersect(ta.ts, tb.ts)) * 1.0
                 / len(list_distinct(ta.ts || tb.ts)), 4) AS jaccard,
           CAST(bit_count(xor(sa.simhash, sb.simhash)) AS BIGINT)
             AS hamming,
           (CASE WHEN e.est_sim >= 0.5 THEN 1 ELSE 0 END
            + CASE WHEN len(list_intersect(ta.ts, tb.ts)) * 1.0
                        / len(list_distinct(ta.ts || tb.ts)) >= 0.5
                   THEN 1 ELSE 0 END
            + CASE WHEN bit_count(xor(sa.simhash, sb.simhash)) <= 4
                   THEN 1 ELSE 0 END) >= 2 AS is_dup
    FROM est e
    JOIN tsets ta ON ta.doc_id = e.doc_a
    JOIN tsets tb ON tb.doc_id = e.doc_b
    JOIN sh sa ON sa.doc_id = e.doc_a
    JOIN sh sb ON sb.doc_id = e.doc_b
    """


@register(
    "dedup_ensemble_verdict",
    oracle=_ensemble_oracle(),
    tags=("dedup", "ensemble"),
)
def dedup_ensemble_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ensemble near-dup verdict over LSH candidate pairs: MinHash
    estimate, exact token Jaccard, and SimHash Hamming distance each
    vote; 2-of-3 declares a duplicate. Candidates come from the banded
    index (never all-pairs); the three scores are keyed id-joins on the
    candidate list, so verification cost ∝ candidates. This is the
    precision stage a production dedup pipeline runs before deletion —
    single-signal verdicts over-fire on boilerplate."""
    t = load_tables(spark, sf_dir, ["documents"])
    docs = t["documents"]
    # ONE fused per-doc feature pass (sigs + simhash in a single
    # explode→agg, guide §2.4/§1.2) instead of the r3 plan's four
    # signature-subtree instantiations and two simhash passes; the token
    # arrays attach via one keyed join and each pair side joins the
    # feature table once (2 joins instead of 6).  Output bit-identical
    # (driver t2 + pytest pinned); oracle unchanged.
    feats = dedup.doc_features(docs, k=K).join(
        docs.select(
            F.col("doc_id"), dedup.tokens_col("text").alias("ts")
        ),
        "doc_id",
    )
    capped = dedup.lsh_capped_members(feats, k=K, bands=BANDS, cap=CAP)
    left = capped.select(F.col("doc_id").alias("doc_a"), "band_id", "band_key")
    right = capped.select(F.col("doc_id").alias("doc_b"), "band_id", "band_key")
    pairs = (
        left.join(right, ["band_id", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    fa = feats.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"sig_{i}").alias(f"la_{i}") for i in range(1, K + 1)],
        F.col("simhash").alias("sh_a"),
        F.col("ts").alias("ts_a"),
    )
    fb = feats.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"sig_{i}").alias(f"lb_{i}") for i in range(1, K + 1)],
        F.col("simhash").alias("sh_b"),
        F.col("ts").alias("ts_b"),
    )
    agree = sum(
        F.when(F.col(f"la_{i}") == F.col(f"lb_{i}"), 1).otherwise(0)
        for i in range(1, K + 1)
    )
    est_sim = F.round(agree / F.lit(float(K)), 4)
    # r11 (guide §1.2/§4.2): |A∪B| = |A|+|B|−|A∩B| for the distinct
    # token arrays, so the union array never needs materializing —
    # array_union was ~40% of the per-pair CPU in the verdict's final
    # stage (measured 0.49 s → 0.28 s warm at sf0.1); F.size on an
    # array column is O(1).  Same integers, same division, same round.
    isect = F.size(F.array_intersect("ts_a", "ts_b"))
    jac = F.round(
        isect
        / (F.size("ts_a") + F.size("ts_b") - isect).cast("double"),
        4,
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("long")
    votes = (
        F.when(est_sim >= 0.5, 1).otherwise(0)
        + F.when(jac >= 0.5, 1).otherwise(0)
        + F.when(ham <= 4, 1).otherwise(0)
    )
    return (
        pairs.join(fa, "doc_a")
        .join(fb, "doc_b")
        .select(
            F.col("doc_a").cast("long"),
            F.col("doc_b").cast("long"),
            est_sim.alias("est_sim"),
            jac.alias("jaccard"),
            ham.alias("hamming"),
            (votes >= 2).alias("is_dup"),
        )
    )


@register(
    "dedup_containment",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             list_distinct(string_split(text, ' ')) AS toks,
             md5(array_to_string(list_slice(string_split(text, ' '), 1, 8),
                 ' ')) AS blk
      FROM documents
    )
    SELECT CAST(a.doc_id AS BIGINT) AS doc_a,
           CAST(b.doc_id AS BIGINT) AS doc_b,
           round(len(list_intersect(a.toks, b.toks)) * 1.0
                 / len(a.toks), 4) AS a_in_b,
           round(len(list_intersect(a.toks, b.toks)) * 1.0
                 / len(b.toks), 4) AS b_in_a
    FROM base a JOIN base b ON a.blk = b.blk
    WHERE a.doc_id < b.doc_id
      AND greatest(len(list_intersect(a.toks, b.toks)) * 1.0 / len(a.toks),
                   len(list_intersect(a.toks, b.toks)) * 1.0 / len(b.toks))
          >= 0.8
    """,
    tags=("dedup", "containment"),
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment (|A∩B| / |A| and / |B|) within blocking
    buckets — catches excerpt/quote duplication that symmetric Jaccard
    misses: a short doc fully contained in a long one scores high on one
    side only. Same keyed-block join discipline as the Jaccard verify
    (never all-pairs)."""
    t = load_tables(spark, sf_dir, ["documents"])
    base = t["documents"].select(
        F.col("doc_id"),
        dedup.tokens_col("text").alias("toks"),
        F.md5(
            F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 8))
        ).alias("blk"),
    )
    a = base.select(
        F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a"), "blk"
    )
    b = base.select(
        F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b"), "blk"
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("double")
    a_in_b = F.round(inter / F.size("toks_a"), 4)
    b_in_a = F.round(inter / F.size("toks_b"), 4)
    return (
        a.join(b, "blk")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(
            F.greatest(
                inter / F.size("toks_a"), inter / F.size("toks_b")
            )
            >= 0.8
        )
        .select(
            F.col("doc_a").cast("long"),
            F.col("doc_b").cast("long"),
            a_in_b.alias("a_in_b"),
            b_in_a.alias("b_in_a"),
        )
    )


def _pagerank_oracle(iters: int = 3, damping: float = 0.85) -> str:
    """SQL replay of the fixed-point PageRank: same 1e-9 integer units,
    same floor-divided contributions, same per-iteration rounding — the
    chained-CTE unrolling of the Spark loop."""
    sql = f"""
    WITH simpairs AS ({_capped_pairs_oracle()}),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM simpairs WHERE est_sim >= 0.5
      UNION
      SELECT doc_b AS u, doc_a AS v FROM simpairs WHERE est_sim >= 0.5
    ),
    deg AS (SELECT u, COUNT(*) AS d FROM edges GROUP BY u),
    nn AS (SELECT COUNT(*) AS n FROM deg),
    r0 AS (
      SELECT u AS node, CAST(round(1000000000.0 / nn.n) AS BIGINT) AS rq
      FROM deg, nn
    )"""
    prev = "r0"
    for it in range(1, iters + 1):
        sql += f""",
    r{it} AS (
      SELECT e.v AS node,
             CAST(round({(1.0 - damping)} * 1000000000.0 / nn.n) AS BIGINT)
             + CAST(round({damping} * SUM(r.rq // d.d)) AS BIGINT) AS rq
      FROM edges e
      JOIN {prev} r ON r.node = e.u
      JOIN deg d ON d.u = e.u, nn
      GROUP BY e.v, nn.n
    )"""
        prev = f"r{it}"
    sql += f"""
    SELECT CAST(r.node AS BIGINT) AS node,
           CAST(d.d AS BIGINT) AS degree,
           CAST(r.rq AS BIGINT) AS pr_q
    FROM {prev} r JOIN deg d ON d.u = r.node
    """
    return sql


@register(
    "dedup_graph_pagerank",
    oracle=_pagerank_oracle(),
    tags=("dedup", "graph", "pagerank", "iterative"),
)
def dedup_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the near-dup graph (LSH pairs ≥ 0.5):
    ranks the most-connected documents so cluster representatives can be
    chosen by centrality instead of min-id. Three fixed iterations in
    1e-9 fixed-point integer math — bit-identical across engines, proven
    by the chained-CTE SQL replay. Each round is one keyed join + one
    groupBy carrying (node, rank) longs only."""
    t = load_tables(spark, sf_dir, ["documents"])
    sigs = dedup.minhash_signatures(t["documents"], k=K)
    pairs = dedup.lsh_candidate_pairs_capped(
        sigs, k=K, bands=BANDS, cap=CAP
    ).filter(
        F.col("est_sim") >= 0.5
    )
    return dedup.pagerank_fixed(pairs, iters=3, damping=0.85)


def _minhash_calibration_oracle() -> str:
    cand = _capped_pairs_oracle()
    return f"""
    WITH cand AS ({cand}),
    tok AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
      FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS nt FROM tok GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS ni
      FROM cand c
      JOIN tok ta ON ta.doc_id = c.doc_a
      JOIN tok tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT c.est_sim,
        CAST(floor(c.est_sim * 1000000 + 0.5) AS BIGINT) AS est_q,
        CAST(floor(coalesce(i.ni, 0) * 1000000.0
             / (sa.nt + sb.nt - coalesce(i.ni, 0)) + 0.5) AS BIGINT)
          AS jac_q
      FROM cand c
      LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
      JOIN sizes sa ON sa.doc_id = c.doc_a
      JOIN sizes sb ON sb.doc_id = c.doc_b
    )
    SELECT est_sim,
           COUNT(*) AS n_pairs,
           round(sum(jac_q) / COUNT(*) / 1000000.0, 6) AS mean_exact_jac,
           round(sum(abs(est_q - jac_q)) / COUNT(*) / 1000000.0, 6)
             AS mean_abs_err
    FROM scored GROUP BY est_sim
    """


@register(
    "dedup_minhash_calibration",
    oracle=_minhash_calibration_oracle(),
    tags=("dedup", "minhash", "calibration"),
)
def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash calibration harness: per signature-agreement level, the
    mean EXACT token Jaccard of the LSH candidate pairs and the mean
    estimation error — the measurement that picks (k, bands) and the
    delete threshold before any mass dedup run.

    The dedup twin of `sim_ann_recall`: exact Jaccard is computed only
    for LSH candidates (keyed token joins bounded by the candidate
    count, never all-pairs), and the error aggregation is quantized
    integer arithmetic.  At 100 TB, run on a document sample — the
    harness cost is decoupled from corpus size."""
    t = load_tables(spark, sf_dir, ["documents"])
    docs = t["documents"]
    sigs = dedup.minhash_signatures(docs, k=K)
    cand = dedup.lsh_candidate_pairs_capped(
        sigs, k=K, bands=BANDS, cap=CAP
    )
    # r11 (guide §1.2/§2.3): exact |∩| via array_intersect on per-doc
    # distinct-token arrays (two id-keyed joins) instead of exploding
    # the full token table twice and re-aggregating per pair — the
    # explode shape shuffled |cand|·avg_tokens rows into the
    # (doc_b, tok) join at any scale.  |set| is the map-side
    # size(array_distinct(...)) — the separate tokenize+groupBy sizes
    # pass is gone.  The integers are identical: array_distinct
    # preserves the same distinct-token sets the oracle's
    # list_distinct/unnest pipeline counts, and a doc with NULL/absent
    # text can never appear in cand (no tokens → no signature → no
    # band), so inner-join semantics match the old sizes join.
    toks = dedup.tokens_col("text")
    tarr = docs.select(
        "doc_id", toks.alias("toks"), F.size(toks).cast("long").alias("nt")
    )
    ni = F.size(F.array_intersect("toks_a", "toks_b")).cast("long")
    scored = (
        cand.join(
            tarr.select(
                F.col("doc_id").alias("doc_a"),
                F.col("toks").alias("toks_a"),
                F.col("nt").alias("na"),
            ),
            "doc_a",
        )
        .join(
            tarr.select(
                F.col("doc_id").alias("doc_b"),
                F.col("toks").alias("toks_b"),
                F.col("nt").alias("nb"),
            ),
            "doc_b",
        )
        .select(
            "est_sim",
            F.floor(F.col("est_sim") * 1000000 + 0.5)
            .cast("long")
            .alias("est_q"),
            F.floor(
                ni * 1000000.0 / (F.col("na") + F.col("nb") - ni) + 0.5
            )
            .cast("long")
            .alias("jac_q"),
        )
    )
    return scored.groupBy("est_sim").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(
            F.sum("jac_q") / F.count(F.lit(1)) / 1000000.0, 6
        ).alias("mean_exact_jac"),
        F.round(
            F.sum(F.abs(F.col("est_q") - F.col("jac_q")))
            / F.count(F.lit(1))
            / 1000000.0,
            6,
        ).alias("mean_abs_err"),
    )


@register(
    "dedup_family_histogram",
    oracle=f"""
    WITH cc AS ({_cc_oracle()})
    SELECT n_docs AS family_size,
           COUNT(*) AS n_families,
           CAST(sum(n_docs) AS BIGINT) AS n_docs_total
    FROM cc GROUP BY n_docs
    """,
    tags=("dedup", "graph", "histogram"),
)
def dedup_family_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup family-size histogram: how many clusters of each size
    the corpus contains, and how many documents they hold — the
    one-glance dedup report (singletons vs long-tail vs mega-families)
    that sizes the deletion budget and flags pathological templates.

    One extra bounded aggregation on top of the connected-components
    clusters; the expensive part (LSH + CC) is shared with
    `dedup_cluster_components`."""
    from pyspark.sql import functions as F

    t = load_tables(spark, sf_dir, ["documents"])
    sigs = dedup.minhash_signatures(t["documents"], k=K)
    pairs = dedup.lsh_candidate_pairs_capped(
        sigs, k=K, bands=BANDS, cap=CAP
    ).filter(
        F.col("est_sim") >= 0.5
    )
    comp = dedup.connected_components(pairs)
    docs = t["documents"].select(
        F.col("doc_id").cast("long").alias("node")
    )
    labeled = docs.join(comp, "node", "left").select(
        "node", F.coalesce("label", F.col("node")).alias("cluster")
    )
    fam = labeled.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return fam.groupBy(F.col("n_docs").alias("family_size")).agg(
        F.count(F.lit(1)).alias("n_families"),
        F.sum("n_docs").cast("long").alias("n_docs_total"),
    )


def _lsh_pr_oracle() -> str:
    cand = _capped_pairs_oracle()
    return f"""
    WITH cand AS ({cand}),
    tok AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
      FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS nt FROM tok GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS ni
      FROM cand c
      JOIN tok ta ON ta.doc_id = c.doc_a
      JOIN tok tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT c.est_sim >= 0.5 AS pred,
        coalesce(i.ni, 0) * 2 >= sa.nt + sb.nt - coalesce(i.ni, 0)
          AS truth
      FROM cand c
      LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
      JOIN sizes sa ON sa.doc_id = c.doc_a
      JOIN sizes sb ON sb.doc_id = c.doc_b
    )
    SELECT
      CAST(sum(CASE WHEN pred AND truth THEN 1 ELSE 0 END) AS BIGINT)
        AS tp,
      CAST(sum(CASE WHEN pred AND NOT truth THEN 1 ELSE 0 END)
        AS BIGINT) AS fp,
      CAST(sum(CASE WHEN NOT pred AND truth THEN 1 ELSE 0 END)
        AS BIGINT) AS fn,
      round(sum(CASE WHEN pred AND truth THEN 1 ELSE 0 END) * 1.0
            / nullif(sum(CASE WHEN pred THEN 1 ELSE 0 END), 0), 6)
        AS precision_at_05,
      round(sum(CASE WHEN pred AND truth THEN 1 ELSE 0 END) * 1.0
            / nullif(sum(CASE WHEN truth THEN 1 ELSE 0 END), 0), 6)
        AS recall_within_candidates
    FROM scored
    """


@register(
    "dedup_lsh_precision_recall",
    oracle=_lsh_pr_oracle(),
    tags=("dedup", "minhash", "evaluation"),
)
def dedup_lsh_precision_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Precision/recall of the MinHash estimate at the 0.5 delete
    threshold, judged against exact token Jaccard (2·|∩| ≥ |∪| in pure
    integer form) — the confusion-matrix summary that complements the
    per-level `dedup_minhash_calibration` curve.

    Recall is measured WITHIN the LSH candidate set (pairs no band
    proposed are invisible to both systems — the banding miss rate is
    the separate 1−(1−s^r)^b analytical bound).  Same bounded keyed
    joins as the calibration harness; the verdict is one aggregation
    of integer flags."""
    from pyspark.sql import functions as F

    t = load_tables(spark, sf_dir, ["documents"])
    docs = t["documents"]
    sigs = dedup.minhash_signatures(docs, k=K)
    cand = dedup.lsh_candidate_pairs_capped(
        sigs, k=K, bands=BANDS, cap=CAP
    )
    # r11 (guide §1.2/§2.3): same array_intersect restructure as
    # dedup_minhash_calibration — see the comment there; pred/truth are
    # the same integer comparisons on identical values.
    toks = dedup.tokens_col("text")
    tarr = docs.select(
        "doc_id", toks.alias("toks"), F.size(toks).cast("long").alias("nt")
    )
    ni = F.size(F.array_intersect("toks_a", "toks_b")).cast("long")
    scored = (
        cand.join(
            tarr.select(
                F.col("doc_id").alias("doc_a"),
                F.col("toks").alias("toks_a"),
                F.col("nt").alias("na"),
            ),
            "doc_a",
        )
        .join(
            tarr.select(
                F.col("doc_id").alias("doc_b"),
                F.col("toks").alias("toks_b"),
                F.col("nt").alias("nb"),
            ),
            "doc_b",
        )
        .select(
            (F.col("est_sim") >= 0.5).alias("pred"),
            (ni * 2 >= F.col("na") + F.col("nb") - ni).alias("truth"),
        )
    )
    tp = F.sum(F.when(F.col("pred") & F.col("truth"), 1).otherwise(0))
    fp = F.sum(F.when(F.col("pred") & ~F.col("truth"), 1).otherwise(0))
    fn = F.sum(F.when(~F.col("pred") & F.col("truth"), 1).otherwise(0))
    npred = F.sum(F.when(F.col("pred"), 1).otherwise(0))
    ntruth = F.sum(F.when(F.col("truth"), 1).otherwise(0))
    return scored.agg(
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        F.round(tp / F.nullif(npred, F.lit(0)), 6).alias(
            "precision_at_05"
        ),
        F.round(tp / F.nullif(ntruth, F.lit(0)), 6).alias(
            "recall_within_candidates"
        ),
    )


@register(
    "dedup_graph_triangles",
    oracle=f"""
    WITH simpairs AS ({_capped_pairs_oracle()}),
    e AS (
      SELECT doc_a AS a, doc_b AS b FROM simpairs WHERE est_sim >= 0.5
    ),
    und AS (
      SELECT a AS u, b AS v FROM e UNION ALL SELECT b AS u, a AS v FROM e
    ),
    deg AS (SELECT u, count(*) AS d FROM und GROUP BY u),
    hubs AS (SELECT u FROM deg WHERE d > 64),
    ke AS (
      SELECT e.a, e.b FROM e
      WHERE e.a NOT IN (SELECT u FROM hubs)
        AND e.b NOT IN (SELECT u FROM hubs)
    ),
    kund AS (
      SELECT a AS u, b AS v FROM ke UNION ALL SELECT b AS u, a AS v FROM ke
    ),
    kdeg AS (SELECT u, count(*) AS d FROM kund GROUP BY u),
    tri AS (
      SELECT count(*) AS n_triangles
      FROM ke e1
      JOIN ke e2 ON e2.a = e1.b
      JOIN ke e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    agg AS (
      SELECT (SELECT count(*) FROM deg) AS n_nodes,
             (SELECT count(*) FROM e) AS n_edges,
             (SELECT count(*) FROM hubs) AS n_hubs_excluded,
             (SELECT count(*) FROM ke) AS n_edges_capped,
             (SELECT COALESCE(sum(d * (d - 1) / 2), 0) FROM kdeg)
               AS n_wedges,
             (SELECT n_triangles FROM tri) AS n_triangles
    )
    SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
           CAST(n_edges AS BIGINT) AS n_edges,
           CAST(n_hubs_excluded AS BIGINT) AS n_hubs_excluded,
           CAST(n_edges_capped AS BIGINT) AS n_edges_capped,
           CAST(n_wedges AS BIGINT) AS n_wedges,
           CAST(n_triangles AS BIGINT) AS n_triangles,
           CASE WHEN n_wedges > 0
                THEN round(3.0 * n_triangles / n_wedges, 6)
                ELSE 0.0 END AS clustering_coeff
    FROM agg
    """,
    tags=("dedup", "graph", "triangles"),
)
def dedup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the near-dup candidate graph on its
    HUB-CAPPED subgraph (degree ≤ 64), plus the global clustering
    coefficient (3·triangles / wedges): high transitivity says LSH
    buckets capture coherent duplicate FAMILIES (safe to collapse via
    `dedup_cluster_components`); low says candidates chain through hubs
    and a same-component collapse would over-delete.

    The hub cap is what makes this scale-safe: a duplicate clique of m
    members contains Θ(m³) triangles — ANY enumerating engine dies on a
    template family of millions, so production triangle counts exclude
    hubs (their clustering is already known: they are dup families by
    construction and better measured by `dedup_family_histogram`).
    With the cap, the ordered-edge (a<b) double join's fan-out is ≤64²
    per vertex and everything shuffles (long, long) pairs.  Full-graph
    node/edge/hub counts are reported alongside so the exclusion is
    visible, and both engines apply the identical cap."""
    t = load_tables(spark, sf_dir, ["documents"])
    sigs = dedup.minhash_signatures(t["documents"], k=K)
    e = (
        dedup.lsh_candidate_pairs_capped(sigs, k=K, bands=BANDS, cap=CAP)
        .filter(F.col("est_sim") >= 0.5)
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    )
    # r11 (guide §2.1/§3): the former shape re-instantiated the whole
    # minhash→LSH lineage once per reference (und 2×, ke 5×, scalar
    # count branches…), compiling to a 2204-node plan with 280 parquet
    # scans and 281 Exchanges that only finished at scale thanks to
    # AQE runtime stage reuse.  Three structural changes, results
    # identical (edges are DISTINCT with a<b by the operator contract):
    #   1. endpoint multisets come from ONE reference via
    #      explode(array(a,b)) instead of a unionAll of two projections;
    #   2. node/edge/hub scalars all derive from a single degree pass
    #      (count(e) == sum(d)/2 exactly), and capped-edge/wedge scalars
    #      from a single kdeg pass — no per-scalar re-aggregation of e;
    #   3. triangles count via the forward-adjacency intersection: for
    #      ordered edges, Σ_(a,b)∈ke |N⁺(a) ∩ N⁺(b)| counts each
    #      triangle x<y<z exactly once (at edge (x,y)) — same count as
    #      the e1⋈e2⋈e3 enumeration, but shuffling ≤64-long adjacency
    #      arrays against a node-sized table instead of a 3-way
    #      edge-table self-join.
    # r11 second pass (guide §1.2/§2.4): the hub filter no longer
    # anti-joins e against a separately aggregated degree table (which
    # re-instantiated the LSH lineage once per anti-join side, 3×).
    # Each edge row explodes into its two endpoint memberships WHILE
    # CARRYING THE EDGE, endpoint degrees come from one count-over-u
    # window, and the kept-edge set regroups by (a, b): max of the two
    # endpoint degrees ≤ 64 ⇔ neither endpoint is a hub — the same ke
    # set, from ONE e reference.  The node-level stats regroup the same
    # windowed rows by u (already partitioned by u — no new exchange,
    # and the explode's Exchange(u) subtree is AQE-reused).
    from pyspark.sql import Window as W

    und = e.select("a", "b", F.explode(F.array("a", "b")).alias("u"))
    und_d = und.withColumn(
        "d", F.count(F.lit(1)).over(W.partitionBy("u"))
    )
    gstats = (
        und_d.groupBy("u")
        .agg(F.min("d").alias("d"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            (F.sum("d") / 2).cast("long").alias("n_edges"),
            F.sum(F.when(F.col("d") > 64, 1).otherwise(0)).alias(
                "n_hubs_excluded"
            ),
        )
    )
    ke = (
        und_d.groupBy("a", "b")
        .agg(F.max("d").alias("dmax"))
        .filter(F.col("dmax") <= 64)
        .select("a", "b")
    )
    kund = ke.select(F.explode(F.array("a", "b")).alias("u"))
    kdeg = kund.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    kstats = kdeg.agg(
        (F.sum("d") / 2).cast("long").alias("n_edges_capped"),
        F.coalesce(F.sum(F.col("d") * (F.col("d") - 1) / 2), F.lit(0))
        .cast("long")
        .alias("n_wedges"),
    )
    fadj = ke.groupBy("a").agg(F.collect_list("b").alias("nb"))
    tri = (
        fadj.select(
            F.col("nb").alias("nx"), F.explode("nb").alias("y")
        )
        .join(
            fadj.select(F.col("a").alias("y"), F.col("nb").alias("ny")),
            "y",
        )
        .agg(
            F.coalesce(
                F.sum(F.size(F.array_intersect("nx", "ny"))), F.lit(0)
            )
            .cast("long")
            .alias("n_triangles")
        )
    )
    counts = gstats.join(kstats).join(tri)
    return counts.select(
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("n_edges").cast("long").alias("n_edges"),
        F.col("n_hubs_excluded").cast("long").alias("n_hubs_excluded"),
        F.col("n_edges_capped").cast("long").alias("n_edges_capped"),
        F.col("n_wedges").cast("long").alias("n_wedges"),
        F.col("n_triangles").cast("long").alias("n_triangles"),
        F.when(
            F.col("n_wedges") > 0,
            F.round(3.0 * F.col("n_triangles") / F.col("n_wedges"), 6),
        )
        .otherwise(0.0)
        .alias("clustering_coeff"),
    )


@register(
    "dedup_cluster_representatives",
    oracle=f"""
    WITH RECURSIVE simpairs AS ({_capped_pairs_oracle()}),
    und AS (
      SELECT doc_a AS u, doc_b AS v FROM simpairs WHERE est_sim >= 0.5
      UNION ALL
      SELECT doc_b AS u, doc_a AS v FROM simpairs WHERE est_sim >= 0.5
    ),
    deg AS (SELECT u, count(*) AS d FROM und GROUP BY u),
    edges AS (SELECT DISTINCT u, v FROM und),
    reach(node, r) AS (
      SELECT u, v FROM edges
      UNION
      SELECT reach.node, e.v FROM reach JOIN edges e ON reach.r = e.u
    ),
    comp AS (
      SELECT node, LEAST(node, MIN(r)) AS cluster FROM reach GROUP BY node
    ),
    members AS (
      SELECT d.doc_id AS node,
             COALESCE(c2.cluster, d.doc_id) AS cluster
      FROM documents d LEFT JOIN comp c2 ON c2.node = d.doc_id
    ),
    rep AS (
      SELECT cluster, node AS representative, d AS rep_degree FROM (
        SELECT m.cluster, m.node, COALESCE(g.d, 0) AS d,
               ROW_NUMBER() OVER (
                 PARTITION BY m.cluster
                 ORDER BY COALESCE(g.d, 0) DESC, m.node
               ) AS rn
        FROM members m LEFT JOIN deg g ON g.u = m.node
      ) WHERE rn = 1
    )
    SELECT CAST(r.cluster AS BIGINT) AS cluster,
           CAST(r.representative AS BIGINT) AS representative,
           CAST(r.rep_degree AS BIGINT) AS rep_degree,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM rep r JOIN members m ON m.cluster = r.cluster
    GROUP BY 1, 2, 3
    """,
    tags=("dedup", "graph", "representative"),
)
def dedup_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KEEP decision that completes the dedup pipeline: for every
    near-dup cluster, elect the most CENTRAL member (highest candidate-
    graph degree, ties → smallest id) as the survivor — degree
    centrality picks the member most representative of its family,
    where min-id keeps an arbitrary one.

    Reuses the connected-components labels and the candidate-pair
    degree table; election is a WindowGroupLimit head per cluster
    (bounded groups).  Everything that shuffles is (id, label) /
    (id, degree) longs — the blob-free dedup discipline throughout."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ["documents"])
    sigs = dedup.minhash_signatures(t["documents"], k=K)
    pairs = dedup.lsh_candidate_pairs_capped(
        sigs, k=K, bands=BANDS, cap=CAP
    ).filter(
        F.col("est_sim") >= 0.5
    )
    # r11 (guide §1.2/§2.4): endpoint multiset from ONE pairs reference
    # via explode (the unionAll instantiated the whole LSH lineage per
    # delta side), and the election + member count fused into one
    # window pass over `members` — the former shape re-joined members
    # against its own rank-1 head, re-instantiating the CC lineage.
    # count(*) over the cluster partition is exactly the old
    # groupBy(cluster).count of the second members reference.
    und = pairs.select(
        F.explode(F.array("doc_a", "doc_b")).alias("u")
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    comp = dedup.connected_components(pairs)
    docs = t["documents"].select(F.col("doc_id").cast("long").alias("node"))
    members = docs.join(comp, "node", "left").select(
        "node", F.coalesce("label", F.col("node")).alias("cluster")
    )
    w = W.partitionBy("cluster").orderBy(
        F.desc("d"), F.asc("node")
    )
    return (
        members.join(deg, members.node == deg.u, "left")
        .select(
            "cluster", "node", F.coalesce("d", F.lit(0)).alias("d")
        )
        .withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_docs", F.count(F.lit(1)).over(W.partitionBy("cluster"))
        )
        .filter(F.col("rn") == 1)
        .select(
            F.col("cluster").cast("long").alias("cluster"),
            F.col("node").cast("long").alias("representative"),
            F.col("d").cast("long").alias("rep_degree"),
            F.col("n_docs").cast("long").alias("n_docs"),
        )
    )



@register(
    "dedup_lsh_bucket_capped",
    oracle=_capped_pairs_oracle(),
    tags=("dedup", "lsh", "scale"),
)
def dedup_lsh_bucket_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded LSH candidate pairs under a deterministic per-bucket cap
    (32 smallest ids per (band, key) bucket) — the 100 TB guard for the
    ONE place banded LSH can go quadratic: a pathological bucket
    (boilerplate, templated spam, replicated fixtures) of m members
    otherwise emits Θ(m²) pairs.  Capped, every bucket contributes at
    most C(32,2) pairs, so worst-case work is linear in corpus size.
    On buckets under the cap the output is bit-identical to
    `dedup_minhash_lsh` (test-pinned); what the cap drops is quantified
    exactly by `dedup_lsh_bucket_audit` — no silent truncation."""
    t = load_tables(spark, sf_dir, ["documents"])
    sigs = dedup.minhash_signatures(t["documents"], k=K)
    return dedup.lsh_candidate_pairs_capped(
        sigs, k=K, bands=BANDS, cap=CAP
    )


def _audit_oracle() -> str:
    sig_cols = ",\n      ".join(
        f"min(md5(tok || '#{i}')) AS sig_{i}" for i in range(1, K + 1)
    )
    band_cases = []
    for b in range(BANDS):
        parts = " || '|' || ".join(
            f"sig_{b * ROWS_PER_BAND + j + 1}" for j in range(ROWS_PER_BAND)
        )
        band_cases.append(f"WHEN {b} THEN md5({parts})")
    band_case = "CASE band_id " + " ".join(band_cases) + " END"
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
      FROM documents
    ),
    sigs AS (
      SELECT doc_id,
      {sig_cols}
      FROM toks GROUP BY doc_id
    ),
    bandk AS (
      SELECT doc_id, band_id, {band_case} AS band_key
      FROM sigs, (VALUES (0), (1), (2), (3)) AS bb(band_id)
    ),
    buckets AS (
      SELECT band_id, band_key, CAST(count(*) AS BIGINT) AS m
      FROM bandk GROUP BY band_id, band_key
    )
    SELECT band_id,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(CASE WHEN m > {CAP} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_overflow,
           CAST(max(m) AS BIGINT) AS max_bucket,
           CAST(sum(m) AS BIGINT) AS members,
           CAST(sum(m - LEAST(m, {CAP})) AS BIGINT) AS members_dropped,
           CAST(sum(m * (m - 1) // 2) AS BIGINT) AS pairs_uncapped,
           CAST(sum(LEAST(m, {CAP}) * (LEAST(m, {CAP}) - 1) // 2)
                AS BIGINT) AS pairs_capped
    FROM buckets GROUP BY band_id ORDER BY band_id
    """


@register(
    "dedup_lsh_bucket_audit",
    oracle=_audit_oracle(),
    tags=("dedup", "lsh", "monitor", "scale"),
)
def dedup_lsh_bucket_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-band LSH bucket-size audit: what would the 32-member cap of
    `dedup_lsh_bucket_capped` cost on THIS corpus?  Reports buckets
    total/overflowing, the largest bucket, members kept vs dropped, and
    enumerated candidate pairs with vs without the cap — all from exact
    integer arithmetic on bucket sizes, so the audit itself never
    materializes a pair and stays linear even where uncapped
    enumeration would not.  Output is `bands` rows."""
    t = load_tables(spark, sf_dir, ["documents"])
    sigs = dedup.minhash_signatures(t["documents"], k=K)
    return dedup.lsh_bucket_audit(sigs, k=K, bands=BANDS, cap=CAP)


@register(
    "dedup_duplicated_spans",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
      WHERE len(string_split(text, ' ')) >= 8
    ),
    wins0 AS (
      SELECT doc_id, tk, len(tk) AS total_tokens,
             unnest(range(1, len(tk) - 6)) AS start
      FROM toks
    ),
    wins AS (
      SELECT doc_id, total_tokens, start,
             CAST(('0x' || substr(md5(array_to_string(
               list_slice(tk, start, start + 7), ' ')), 1, 15))
               AS BIGINT) AS h
      FROM wins0
    ),
    dup_h AS (
      SELECT h FROM wins GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    marked AS (
      SELECT w.doc_id, w.total_tokens, w.start
      FROM wins w JOIN dup_h USING (h)
    ),
    islands AS (
      SELECT doc_id, total_tokens, start,
             CASE WHEN start > lag(start) OVER
                    (PARTITION BY doc_id ORDER BY start) + 8
                  THEN 1 ELSE 0 END AS brk
      FROM marked
    ),
    grp AS (
      SELECT doc_id, total_tokens, start,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY start
                            ROWS UNBOUNDED PRECEDING) AS g
      FROM islands
    ),
    spans AS (
      SELECT doc_id, total_tokens, g,
             MAX(start) + 8 - MIN(start) AS span_len
      FROM grp GROUP BY 1, 2, 3
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(span_len) AS BIGINT) AS dup_tokens,
           CAST(total_tokens AS BIGINT) AS total_tokens,
           round(CAST(SUM(span_len) AS DOUBLE) / total_tokens, 4)
             AS dup_fraction
    FROM spans
    GROUP BY doc_id, total_tokens
    """,
    tags=("dedup", "substring", "spans"),
)
def dedup_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated-span detection (sliding 8-token windows merged
    by a gaps-and-islands pass) — the exact-substring dedup grain from
    the published training-data dedup method, which `dedup_chunks`'s
    disjoint chunking approximates but cannot bound: a duplicated
    passage straddling a chunk boundary is invisible to chunks yet
    surfaces here as one maximal span.  Reference parity: the reference
    has no text operators at all; beyond-reference scale family."""
    t = load_tables(spark, sf_dir, ["documents"])
    return dedup.duplicated_spans(t["documents"], width=8)


@register(
    "dedup_cdc_chunks",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
      WHERE len(string_split(text, ' ')) >= 4
    ),
    cuts AS (
      SELECT doc_id, tk,
             list_concat(list_concat(
               [CAST(0 AS BIGINT)],
               list_filter(range(4, len(tk) + 1),
                 i -> CAST(('0x' || substr(md5(array_to_string(
                        list_slice(tk, i - 3, i), ' ')), 1, 8)) AS BIGINT)
                      % 16 = 0)),
               [len(tk)]) AS bounds
      FROM toks
    ),
    chunks AS (
      SELECT doc_id,
             unnest(list_filter(
               list_transform(range(1, len(bounds)),
                 j -> {'start': bounds[j] + 1,
                       'len': bounds[j + 1] - bounds[j]}),
               c -> c.len > 0)) AS c,
             tk
      FROM cuts
    )
    SELECT md5(array_to_string(
             list_slice(tk, c.start, c.start + c.len - 1), ' ')) AS h,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_occurrences,
           CAST(MAX(c.len) AS BIGINT) AS chunk_tokens
    FROM chunks
    GROUP BY 1
    HAVING COUNT(DISTINCT doc_id) > 1
    """,
    tags=("dedup", "cdc", "chunks"),
)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup (gear/Rabin-style cut condition on
    a local token-window hash): variable-length chunks re-synchronize
    after insertions where fixed-width chunking loses all alignment —
    the storage-dedup grain, complementing `dedup_chunks` (fixed) and
    `dedup_duplicated_spans` (sliding maximal spans)."""
    t = load_tables(spark, sf_dir, ["documents"])
    return dedup.cdc_chunk_stats(t["documents"], window=4, mask=16)
