"""Deduplication operators for large-scale training-data pipelines.

The reference engine has no dedup surface (SELECT DISTINCT is even ignored,
``src/executor/query/select/manual/mod.rs:47``); these are the
beyond-reference operators required by BASELINE.json, built Spark-first:

- **exact_dedup** — hash-groupBy on a content fingerprint. One shuffle on
  md5(text); at 100 TB this is the canonical map-side-combine plan (the
  fingerprint is tiny vs the document payload, and only (hash, min_id)
  travels).
- **minhash_signatures / lsh_candidate_pairs** — MinHash + banded LSH.
  Signature = k lexicographic-min md5 digests over the token set (a valid
  minhash family: md5 is a uniform permutation of the token universe per
  seed suffix). Banding: b bands of r rows; docs sharing any band key are
  candidates. Scale shape: one shuffle to build signatures (groupBy doc),
  one shuffle per-band self-join keyed on (band, band_key) — bucket sizes
  are bounded by collision probability, and AQE's skew-join splits hot
  buckets. No driver-side state.
- **simhash** — n-bit fingerprint from per-token md5 bit votes; Hamming-
  near pairs found by banding the fingerprint bytes (pigeonhole: two
  fingerprints within d bits share at least one of d+1 byte-bands).
- **ngram_jaccard_pairs** — exact token-set Jaccard within cheap blocking
  buckets (prefix fingerprint), the verification stage after LSH.

All hashing is md5-based so results are engine-independent (the DuckDB
oracle computes the identical signatures — md5 yields the same lowercase
hex in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from multisql_spark.operators import spread


def tokens_col(text_col: str = "text"):
    """Distinct word tokens of a document (order-insensitive set)."""
    return F.array_distinct(F.split(F.col(text_col), " "))


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact duplicate groups by content hash; keeps the smallest id as
    canonical. Returns (h, keep_id, n_dups)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("h"), F.col(id_col))
        .groupBy("h")
        .agg(
            F.min(id_col).cast("long").alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 12,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(id, sig_1..sig_k) — sig_i = min over tokens of md5(token ⊕ i).

    One explode + one groupBy(doc) with k min-aggregates: a single
    shuffle whose payload is k×32-byte strings per doc regardless of
    document size.  ``carry`` names extra per-doc columns functionally
    dependent on ``id_col`` (e.g. a batch flag); they join the group
    keys so callers get them back without a second pass over ``df``.
    """
    keep = [F.col(id_col), *(F.col(c) for c in carry)]
    toks = spread(
        df.select(*keep, F.col(text_col)), key=id_col
    ).select(*keep, F.explode(tokens_col(text_col)).alias("tok"))
    aggs = [
        F.min(F.md5(F.concat(F.col("tok"), F.lit(f"#{i}")))).alias(f"sig_{i}")
        for i in range(1, k + 1)
    ]
    return toks.groupBy(id_col, *carry).agg(*aggs)


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    k: int = 12,
    bands: int = 4,
) -> DataFrame:
    """Banded LSH over a minhash signature table → candidate pairs with
    estimated Jaccard (fraction of agreeing signature components).

    Returns (doc_a, doc_b, est_sim) with doc_a < doc_b.
    """
    rows_per_band = k // bands
    band_keys = []
    for b in range(bands):
        parts = [
            F.col(f"sig_{b * rows_per_band + j + 1}")
            for j in range(rows_per_band)
        ]
        band_keys.append(
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(F.concat_ws("|", *parts)).alias("band_key"),
            )
        )
    # the band join carries ids ONLY — at billions of docs the shuffle
    # payload is (id, band_key), not k signature columns per side; the
    # per-pair dedup is a 2-column distinct.  Signatures are fetched back
    # afterwards by two keyed id-joins for the agreement estimate.
    exploded = sig_df.select(
        F.col(id_col),
        F.explode(F.array(*band_keys)).alias("bk"),
    ).select(
        F.col(id_col),
        F.col("bk.band_id").alias("band_id"),
        F.col("bk.band_key").alias("band_key"),
    )
    left = exploded.select(
        F.col(id_col).alias("doc_a"), "band_id", "band_key"
    )
    right = exploded.select(
        F.col(id_col).alias("doc_b"), "band_id", "band_key"
    )
    pairs = (
        left.join(right, ["band_id", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()  # a pair may share several bands
    )
    sig_a = sig_df.select(
        F.col(id_col).alias("doc_a"),
        *[F.col(f"sig_{i}").alias(f"la_{i}") for i in range(1, k + 1)],
    )
    sig_b = sig_df.select(
        F.col(id_col).alias("doc_b"),
        *[F.col(f"sig_{i}").alias(f"lb_{i}") for i in range(1, k + 1)],
    )
    matches = pairs.join(sig_a, "doc_a").join(sig_b, "doc_b")
    agree = sum(
        F.when(F.col(f"la_{i}") == F.col(f"lb_{i}"), 1).otherwise(0)
        for i in range(1, k + 1)
    )
    return matches.select(
        F.col("doc_a").cast("long"),
        F.col("doc_b").cast("long"),
        F.round(agree / F.lit(float(k)), 4).alias("est_sim"),
    )


def lsh_capped_members(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    k: int = 12,
    bands: int = 4,
    cap: int = 32,
) -> DataFrame:
    """Exploded (doc, band) membership with a deterministic per-bucket
    cap: within each (band_id, band_key) bucket only the ``cap`` smallest
    doc ids stay eligible for pair enumeration.

    This is the 100 TB guard for banded LSH.  Uncapped, a pathological
    bucket (boilerplate pages, templated spam, a replicated fixture) of
    m members emits Θ(m²) candidate pairs — the ONE place the otherwise
    collision-proportional plan can go quadratic.  The cap bounds every
    bucket's contribution at C(cap, 2) pairs while keeping the result
    deterministic and SQL-expressible (rank = ROW_NUMBER() ordered by
    doc_id), so the DuckDB oracle reproduces it bit-for-bit.  Dropped
    members are NOT silently lost: pair them with
    :func:`lsh_bucket_audit`, which quantifies overflow buckets and the
    exact number of pairs the cap avoided.

    Members of an overflow bucket beyond the cap still surface through
    their OTHER bands (b independent chances), and at real-corpus dup
    densities recall loss is confined to mega-clusters whose membership
    is already established by any cap-sized subset — the standard
    production trade (e.g. the cluster-size caps in web-dedup pipelines).

    Returns (doc_id, band_id, band_key) — rank already applied.
    """
    rows_per_band = k // bands
    band_keys = []
    for b in range(bands):
        parts = [
            F.col(f"sig_{b * rows_per_band + j + 1}")
            for j in range(rows_per_band)
        ]
        band_keys.append(
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(F.concat_ws("|", *parts)).alias("band_key"),
            )
        )
    exploded = sig_df.select(
        F.col(id_col),
        F.explode(F.array(*band_keys)).alias("bk"),
    ).select(
        F.col(id_col),
        F.col("bk.band_id").alias("band_id"),
        F.col("bk.band_key").alias("band_key"),
    )
    from pyspark.sql import Window

    # per-BUCKET window, never global: partition key is the same
    # (band_id, band_key) the pair join shuffles on anyway, so the rank
    # adds no extra exchange — AQE sees one hash-partitioning reused.
    w = Window.partitionBy("band_id", "band_key").orderBy(id_col)
    return (
        exploded.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= cap)
        .drop("rnk")
    )


def lsh_candidate_pairs_capped(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    k: int = 12,
    bands: int = 4,
    cap: int = 32,
) -> DataFrame:
    """Banded LSH candidate pairs with a per-bucket membership cap (see
    :func:`lsh_capped_members`).  Identical output contract to
    :func:`lsh_candidate_pairs` — (doc_a, doc_b, est_sim), doc_a < doc_b
    — but every bucket contributes at most C(cap, 2) pairs, so worst-case
    work is ``n_buckets × cap²`` instead of ``Σ m_i²``: linear in data
    for any fixed cap.  On buckets that never exceed the cap the result
    is bit-identical to the uncapped operator (test-pinned)."""
    capped = lsh_capped_members(sig_df, id_col, k=k, bands=bands, cap=cap)
    left = capped.select(F.col(id_col).alias("doc_a"), "band_id", "band_key")
    right = capped.select(F.col(id_col).alias("doc_b"), "band_id", "band_key")
    pairs = (
        left.join(right, ["band_id", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sig_a = sig_df.select(
        F.col(id_col).alias("doc_a"),
        *[F.col(f"sig_{i}").alias(f"la_{i}") for i in range(1, k + 1)],
    )
    sig_b = sig_df.select(
        F.col(id_col).alias("doc_b"),
        *[F.col(f"sig_{i}").alias(f"lb_{i}") for i in range(1, k + 1)],
    )
    matches = pairs.join(sig_a, "doc_a").join(sig_b, "doc_b")
    agree = sum(
        F.when(F.col(f"la_{i}") == F.col(f"lb_{i}"), 1).otherwise(0)
        for i in range(1, k + 1)
    )
    return matches.select(
        F.col("doc_a").cast("long"),
        F.col("doc_b").cast("long"),
        F.round(agree / F.lit(float(k)), 4).alias("est_sim"),
    )


def lsh_bucket_audit(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    k: int = 12,
    bands: int = 4,
    cap: int = 32,
) -> DataFrame:
    """The no-silent-caps companion to :func:`lsh_candidate_pairs_capped`:
    one bounded aggregation over bucket sizes reporting, per band,
    exactly what the cap costs — buckets total / overflowing, the
    largest bucket, members kept vs dropped, and candidate pairs with vs
    without the cap (Σ C(m,2) vs Σ C(min(m,cap),2)).

    Scale shape: groupBy (band_id, band_key) → per-band re-aggregation;
    output is ``bands`` rows.  The pair counts are exact integer
    arithmetic on bucket sizes — no pair is ever materialized, so the
    audit itself stays linear even where the uncapped enumeration would
    not."""
    rows_per_band = k // bands
    band_keys = []
    for b in range(bands):
        parts = [
            F.col(f"sig_{b * rows_per_band + j + 1}")
            for j in range(rows_per_band)
        ]
        band_keys.append(
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(F.concat_ws("|", *parts)).alias("band_key"),
            )
        )
    exploded = sig_df.select(
        F.col(id_col),
        F.explode(F.array(*band_keys)).alias("bk"),
    ).select(
        F.col("bk.band_id").alias("band_id"),
        F.col("bk.band_key").alias("band_key"),
    )
    buckets = exploded.groupBy("band_id", "band_key").agg(
        F.count(F.lit(1)).alias("m")
    )
    m = F.col("m").cast("long")
    kept = F.least(m, F.lit(cap).cast("long"))
    return (
        buckets.groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(F.when(m > cap, 1).otherwise(0)).alias("n_overflow"),
            F.max(m).alias("max_bucket"),
            F.sum(m).alias("members"),
            F.sum(m - kept).alias("members_dropped"),
            # exact integer C(m,2): m*(m-1) is even, DIV stays BIGINT
            F.sum(F.expr(
                f"CAST(m AS BIGINT) * (m - 1) DIV 2"
            )).alias("pairs_uncapped"),
            F.sum(F.expr(
                f"LEAST(CAST(m AS BIGINT), {cap}) "
                f"* (LEAST(CAST(m AS BIGINT), {cap}) - 1) DIV 2"
            )).alias("pairs_capped"),
        )
        .orderBy("band_id")
    )


def simhash_bit_sql(ncols: int = 32) -> str:
    """Shared SQL fragment (valid in both Spark SQL and DuckDB) computing
    an ``ncols``-bit simhash over rows (doc_id, h) where h = md5(token):
    bit j = sign of Σ_tokens (high-bit of hex nibble j ? +1 : -1)."""
    terms = []
    for j in range(1, ncols + 1):
        vote = (
            f"SUM(CASE WHEN substr(h, {j}, 1) IN "
            "('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END)"
        )
        terms.append(f"(CASE WHEN {vote} >= 0 THEN {2 ** (j - 1)} ELSE 0 END)")
    return " + ".join(terms)


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash BIGINT): 32-bit fingerprint. Near-dup pairs are then
    found by banding the 4 fingerprint bytes (exact-match join per byte,
    Hamming filter) — same join shape as LSH, no all-pairs pass."""
    toks = spread(df.select(F.col(id_col), F.col(text_col)), key=id_col).select(
        F.col(id_col), F.explode(tokens_col(text_col)).alias("tok")
    ).select(F.col(id_col), F.md5("tok").alias("h"))
    toks.createOrReplaceTempView("__simhash_toks")
    return toks.sparkSession.sql(
        f"SELECT {id_col}, CAST({simhash_bit_sql()} AS BIGINT) AS simhash "
        f"FROM __simhash_toks GROUP BY {id_col}"
    )


def doc_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 12,
) -> DataFrame:
    """(id, sig_1..sig_k, simhash) in ONE explode + ONE groupBy — the
    fused per-document feature pass for ensemble verdicts.

    Computes exactly the same columns as :func:`minhash_signatures`
    (sig_i = min md5(tok ⊕ i)) plus :func:`simhash` (32-bit fingerprint
    from per-token md5 bit votes), but over a single token explode and a
    single aggregation exchange instead of two full passes.  The consumer
    (``dedup_ensemble_verdict``) previously instantiated the signature
    subtree four times and the simhash subtree twice; fusing here turns
    3 explode→agg pipelines into 1 (guide §2.4: remove shuffles outright;
    §1.2: don't compute things twice).  Output values are bit-identical
    to the separate operators (test-pinned)."""
    # Simhash votes as BIT ARITHMETIC, not 32 substring/IN CASEs: the
    # hex digit j of md5(tok) has its high bit set iff the digit is in
    # 8..f, so packing each 8-hex-digit group into a long via conv()
    # turns every vote into sum((group >> shift) & 1).  The CASE form
    # made the 44-aggregate update method exceed the JIT/codegen method
    # limit and fall back to interpreted evaluation (~100x slower,
    # measured 26 s CPU for 116k tokens in the verdict's broadcast
    # builds); the bit form keeps the generated update method small.
    # vote_j >= 0  ⟺  2·cnt1_j >= n  (cnt1 +1s, n-cnt1 −1s) — values
    # identical to :func:`simhash` (test-pinned).
    toks = spread(df.select(F.col(id_col), F.col(text_col)), key=id_col).select(
        F.col(id_col), F.explode(tokens_col(text_col)).alias("tok")
    ).select(
        F.col(id_col),
        *[
            F.conv(F.substring(F.md5("tok"), 8 * g + 1, 8), 16, 10)
            .cast("long")
            .alias(f"b_{g}")
            for g in range(4)
        ],
        *[
            F.md5(F.concat(F.col("tok"), F.lit(f"#{i}"))).alias(f"m_{i}")
            for i in range(1, k + 1)
        ],
    )
    aggs = (
        [F.min(f"m_{i}").alias(f"sig_{i}") for i in range(1, k + 1)]
        + [F.count(F.lit(1)).alias("n_tok")]
        + [
            # hex digit j lives in group g = (j-1)//8 at nibble shift
            # (8 - 1 - (j-1)%8)*4; +3 selects the nibble's high bit
            F.sum(
                F.shiftright(
                    F.col(f"b_{(j - 1) // 8}"),
                    (7 - (j - 1) % 8) * 4 + 3,
                ).bitwiseAND(F.lit(1))
            ).alias(f"c_{j}")
            for j in range(1, 33)
        ]
    )
    votes = toks.groupBy(id_col).agg(*aggs)
    simhash_bits = sum(
        F.when(
            F.col(f"c_{j}") * 2 >= F.col("n_tok"), F.lit(2 ** (j - 1))
        ).otherwise(F.lit(0))
        for j in range(1, 33)
    )
    return votes.select(
        F.col(id_col),
        *[F.col(f"sig_{i}") for i in range(1, k + 1)],
        simhash_bits.cast("long").alias("simhash"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_tokens: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact token-set Jaccard within blocking buckets.

    Blocking key = md5 of the first ``block_tokens`` tokens: cheap, high
    recall for near-identical prefixes, and keeps the self-join keyed
    (no cartesian). Returns (doc_a, doc_b, jaccard)."""
    base = df.select(
        F.col(id_col),
        tokens_col(text_col).alias("toks"),
        F.md5(
            F.concat_ws(" ", F.slice(F.split(F.col(text_col), " "), 1, block_tokens))
        ).alias("blk"),
    )
    a = base.select(
        F.col(id_col).alias("doc_a"), F.col("toks").alias("toks_a"), "blk"
    )
    b = base.select(
        F.col(id_col).alias("doc_b"), F.col("toks").alias("toks_b"), "blk"
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size(F.array_union("toks_a", "toks_b"))
    return (
        a.join(b, "blk")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            F.col("doc_a").cast("long"),
            F.col("doc_b").cast("long"),
            F.round(inter / union, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node in ``pairs`` — component is the
    minimum node id reachable through the pair graph.

    Iterative min-label propagation: each round every node takes the
    minimum label across itself and its neighbors; converges in
    O(component diameter) rounds, which for near-dup clusters (dense,
    LSH-generated) is small. Each round is one keyed join + one groupBy —
    both shuffles carry (node, label) longs only, never documents.
    Lineage is cut per round with localCheckpoint; on a real cluster use
    ``spark.sparkContext.setCheckpointDir`` + ``checkpoint()`` so rounds
    don't pin executor memory. This is the pair→cluster step a dedup
    pipeline needs before choosing canonical documents (the reference has
    no graph operators; this is beyond-reference)."""
    edges = pairs.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    )
    edges = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    # materialize the edge list ONCE — pairs is typically the output of
    # the full LSH pipeline (signatures + band join); without this every
    # propagation round would re-execute that upstream plan
    edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    prev_sum = None
    for _ in range(max_iter):
        nbr = edges.join(
            labels.withColumnRenamed("node", "v"), "v"
        ).select(F.col("u").alias("node"), "label")
        new_labels = (
            labels.union(nbr).groupBy("node").agg(F.min("label").alias("label"))
        ).localCheckpoint(eager=True)
        # labels only ever decrease, so the total strictly drops while any
        # node still changes — one scalar aggregate replaces the per-round
        # change-detection join
        cur_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels = new_labels.select("node", "label")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def chunk_dup_stats(
    docs: DataFrame,
    width: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact substring-level dedup at chunk grain: split each document
    into disjoint ``width``-token chunks and report every chunk that
    occurs in more than one document (the passage-dedup pass that
    document-level hashing misses — boilerplate headers, license blocks,
    templated text).

    One explode + one partially-aggregated groupBy on the chunk — shuffle
    carries (chunk, doc_id) pairs only. At 100 TB the group key is a
    64-bit chunk hash and the chunk text is dropped before the exchange;
    survivors re-fetch text by id. Returns (chunk, n_docs, n_occurrences).
    """
    # r11 (guide §1.3, measured ~9x on the build+explode stage): explode
    # the chunk-index sequence and build each chunk as a plain codegen'd
    # projection — identical concat_ws/slice strings, no interpreted
    # transform() lambda per element.
    return (
        docs.withColumn("_toks", F.split(F.col("text"), " "))
        .filter(F.size("_toks") >= width)
        .withColumn(
            "_i",
            F.explode(
                F.sequence(
                    F.lit(0),
                    (F.size("_toks") / width).cast("int") - 1,
                )
            ),
        )
        .withColumn(
            "chunk",
            F.concat_ws(
                " ",
                F.slice(F.col("_toks"), F.col("_i") * width + 1, width),
            ),
        )
        .groupBy("chunk")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") > 1)
    )


def incremental_dedup(
    docs: DataFrame,
    new_filter,
    id_col: str = "doc_id",
) -> DataFrame:
    """Ingestion-time dedup: flag each NEW document whose (normalized)
    content hash already exists in the standing corpus, and report the
    surviving canonical owner.

    This is the shape incremental 100 TB ingestion needs: only the new
    batch streams through the join; the corpus side is its (hash →
    min-id) index — a bucketed/Z-ordered table in production, so the
    probe is a co-located join, and the full corpus text is never
    re-read. Exact-hash here; the MinHash/SimHash band indexes compose
    the same way for near-dup probes.
    """
    hashed = docs.select(
        F.col(id_col),
        F.md5(F.lower(F.trim(F.col("text")))).alias("h"),
    )
    corpus_index = (
        hashed.filter(~new_filter)
        .groupBy("h")
        .agg(F.min(id_col).alias("canonical_id"))
    )
    return (
        hashed.filter(new_filter)
        .join(corpus_index, "h", "left")
        .select(
            F.col(id_col).cast("long"),
            F.col("canonical_id").isNotNull().alias("is_dup"),
            F.col("canonical_id").cast("long"),
        )
    )


def remove_boilerplate(
    docs: DataFrame,
    width: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Boilerplate removal: strip every chunk that
    :func:`chunk_dup_stats` flags as shared across documents, then
    reassemble each document from its surviving chunks in order.

    The cleaning pass is chunk-grained (the trailing sub-chunk tail is
    outside the dedup domain by construction). The dup-chunk set is small
    (boilerplate is rare relative to corpus bytes) so it broadcasts; the
    reassembly is one partially-aggregated groupBy per document. Returns
    (doc_id, n_chunks, n_removed, clean_md5) — the md5 stands in for the
    rewritten text column so the result stays narrow.
    """
    from multisql_spark.operators import spread

    # r11 (guide §2.2): fan the narrow projection out before the chunk
    # map (no-op on multi-split tables).  Second r11 pass (measured ~9x
    # on the build+explode stage): explode the chunk-index sequence and
    # build each chunk as a plain codegen'd projection — identical
    # concat_ws/slice strings, and the 0-based index IS the old
    # posexplode ordinal.
    ch = (
        spread(docs.select(F.col(id_col), "text"), key=id_col)
        .withColumn("_toks", F.split(F.col("text"), " "))
        .filter(F.size("_toks") >= width)
        .select(
            F.col(id_col),
            "_toks",
            F.explode(
                F.sequence(
                    F.lit(0),
                    (F.size("_toks") / width).cast("int") - 1,
                )
            ).alias("pos"),
        )
        .select(
            F.col(id_col),
            "pos",
            F.concat_ws(
                " ",
                F.slice(
                    F.col("_toks"), F.col("pos") * width + 1, width
                ),
            ).alias("chunk"),
        )
    )
    dup = (
        ch.groupBy("chunk")
        .agg(F.countDistinct(id_col).alias("nd"))
        .filter(F.col("nd") > 1)
        .select("chunk", F.lit(1).alias("_dup"))
    )
    # r11 (guide §1.2): totals and the clean reassembly in ONE
    # aggregate over the flagged chunks — the former totals/clean
    # split re-instantiated the chunk map + dup join per side.
    # collect_list skips the NULL the `when` yields for duplicated
    # chunks, so the sorted kept-chunk array (and its md5) is
    # identical; an all-boilerplate doc yields n_kept = 0 and
    # md5(array_join([])) = md5('') — exactly the old left-join
    # coalesces.
    flagged = ch.join(F.broadcast(dup), "chunk", "left")
    kept_struct = F.when(
        F.col("_dup").isNull(), F.struct("pos", "chunk")
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.count(F.when(F.col("_dup").isNull(), 1)).alias("n_kept"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(kept_struct)),
                        lambda s: s["chunk"],
                    ),
                    " ",
                )
            ).alias("clean_md5"),
        )
        .select(
            F.col(id_col).cast("long"),
            "n_chunks",
            (F.col("n_chunks") - F.col("n_kept"))
            .cast("long")
            .alias("n_removed"),
            F.col("clean_md5"),
        )
    )


def bloom_prefilter(
    docs: DataFrame,
    new_filter,
    id_col: str = "doc_id",
    m_bits: int = 4096,
) -> DataFrame:
    """Bloom-filter prefilter for incremental ingestion dedup.

    The standing corpus is summarized as an ``m_bits``-wide bloom filter
    (2 hash functions derived from the content md5), materialized as at
    most ``m_bits / 32`` (word_idx, word) rows via ONE aggregation with
    map-side combine.  Each NEW document probes the filter first; only
    bloom-positive docs need the exact (hash -> min-id) index join that
    `incremental_dedup` does.

    100 TB shape: the filter is O(m_bits) regardless of corpus size —
    gigabit-scale filters broadcast to every executor, so the probe is a
    narrow map, and the expensive exact-verification shuffle runs over
    the (tiny) bloom-positive slice only.  False positives are bounded
    by m/n sizing; false negatives are impossible, which the test pins
    (`is_dup` implies `bloom_positive`).

    Returns per NEW doc: (doc_id, bloom_positive, is_dup) — is_dup is
    the exact verdict, so ``bloom_positive AND NOT is_dup`` rows surface
    the filter's false-positive rate.  Determinism contract: bit
    positions come from md5 hex substrings (32-bit words, no sign
    issues), identical in the DuckDB oracle.
    """
    n_words = m_bits // 32
    hashed = docs.select(
        F.col(id_col),
        F.md5(F.lower(F.trim(F.col("text")))).alias("h"),
    )

    def bits(col_h):
        # two independent positions from disjoint 32-bit md5 slices
        out = []
        for off in (1, 9):
            pos = (
                F.conv(F.substring(col_h, off, 8), 16, 10).cast("long")
                % m_bits
            )
            # F.shiftleft only takes a literal shift amount; 2^k is exact
            # in double for k < 32, so pow is the column-shift equivalent
            out.append(
                F.struct(
                    (pos / 32).cast("int").alias("word_idx"),
                    F.pow(F.lit(2.0), (pos % 32).cast("double"))
                    .cast("long")
                    .alias("mask"),
                )
            )
        return F.array(*out)

    corpus = hashed.filter(~new_filter)
    bloom_words = (
        corpus.select(F.explode(bits(F.col("h"))).alias("b"))
        .groupBy(F.col("b.word_idx").alias("word_idx"))
        .agg(F.expr("bit_or(b.mask)").alias("word"))
    )
    corpus_index = corpus.groupBy("h").agg(F.min(id_col).alias("canonical_id"))

    new_bits = hashed.filter(new_filter).select(
        F.col(id_col), F.col("h"), F.explode(bits(F.col("h"))).alias("b")
    )
    probed = (
        new_bits.join(
            F.broadcast(bloom_words),
            new_bits["b.word_idx"] == bloom_words["word_idx"],
            "left",
        )
        .select(
            F.col(id_col),
            F.col("h"),
            (
                F.col("word").isNotNull()
                & (F.col("word").bitwiseAND(F.col("b.mask")) == F.col("b.mask"))
            ).alias("bit_set"),
        )
        .groupBy(id_col, "h")
        .agg(F.expr("bool_and(bit_set)").alias("bloom_positive"))
    )
    return (
        probed.join(corpus_index, "h", "left")
        .select(
            F.col(id_col).cast("long"),
            F.col("bloom_positive"),
            F.col("canonical_id").isNotNull().alias("is_dup"),
        )
    )


def _band_key_structs(k: int, bands: int) -> list:
    """(band_id, band_key) structs over sig_1..sig_k — the shared LSH
    bucketing formula (md5 over the band's signature slice)."""
    rows_per_band = k // bands
    out = []
    for b in range(bands):
        parts = [
            F.col(f"sig_{b * rows_per_band + j + 1}")
            for j in range(rows_per_band)
        ]
        out.append(
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(F.concat_ws("|", *parts)).alias("band_key"),
            )
        )
    return out


def incremental_minhash_dedup(
    docs: DataFrame,
    new_filter,
    id_col: str = "doc_id",
    k: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Near-dup ingestion probe: each NEW document queries the standing
    corpus's banded-LSH index and reports its best near-duplicate match.

    The exact-hash ingestion probe (`incremental_dedup`) composes with
    this: run exact first, then this for survivors.  Scale shape mirrors
    the batch LSH path but one-sided — the corpus contributes only its
    (band_key → id) index (a bucketed table in production, built once and
    appended to), the band join carries ids only, and signatures are
    fetched back by keyed id-joins for the agreement estimate.  Work is
    proportional to real collisions for the NEW batch — and, with
    ``bucket_cap`` set, HARD-BOUNDED even when a bucket degenerates:
    the corpus index keeps only the ``bucket_cap`` smallest ids per
    (band_id, band_key) (the :func:`lsh_capped_members` discipline, same
    deterministic ROW_NUMBER-by-id rank, same SQL replay), so one new
    row joins at most ``bands × bucket_cap`` candidates.  Uncapped, a
    mega-bucket (boilerplate, replicated fixtures — exactly the shape
    derived scale dirs create) makes the probe quadratic: the r8 sf10
    streaming sweep OOM-killed on it, the same cliff the r7 pair
    enumeration cap closed for the batch family.

    Returns one row per NEW doc: (doc_id, n_candidates, best_match_id,
    best_sim, is_neardup) — docs with no band collision keep a row with
    n_candidates = 0.
    """
    from pyspark.sql import Window

    # r11 (guide §1.2): the batch flag rides the signature aggregation
    # as an extra (functionally dependent) group key instead of a
    # post-hoc flags join — the join shape re-scanned ``docs`` once per
    # signature-subtree instantiation (4×) and, because the flag
    # arrived via a different lineage, defeated exchange reuse between
    # the corpus/new consumers below (each side's filtered signature
    # subtree is now self-contained and identical across its two uses,
    # so AQE executes each side's tokenize+agg once).
    sigs = minhash_signatures(
        docs.select(
            F.col(id_col), new_filter.alias("_is_new"), F.col("text")
        ),
        id_col=id_col,
        k=k,
        carry=("_is_new",),
    )

    def band_rows(df, out_id):
        return df.select(
            F.col(id_col).alias(out_id),
            F.explode(F.array(*_band_key_structs(k, bands))).alias("bk"),
        ).select(
            out_id,
            F.col("bk.band_id").alias("band_id"),
            F.col("bk.band_key").alias("band_key"),
        )

    corpus_sigs = sigs.filter(~F.col("_is_new")).drop("_is_new")
    new_sigs = sigs.filter(F.col("_is_new")).drop("_is_new")
    corpus_index = band_rows(corpus_sigs, "corpus_id")
    if bucket_cap is not None:
        bw = Window.partitionBy("band_id", "band_key").orderBy("corpus_id")
        corpus_index = (
            corpus_index.withColumn("_rnk", F.row_number().over(bw))
            .filter(F.col("_rnk") <= bucket_cap)
            .drop("_rnk")
        )
    cands = (
        band_rows(new_sigs, "new_id")
        .join(corpus_index, ["band_id", "band_key"])
        .select("new_id", "corpus_id")
        .distinct()
    )
    sig_n = new_sigs.select(
        F.col(id_col).alias("new_id"),
        *[F.col(f"sig_{i}").alias(f"la_{i}") for i in range(1, k + 1)],
    )
    sig_c = corpus_sigs.select(
        F.col(id_col).alias("corpus_id"),
        *[F.col(f"sig_{i}").alias(f"lb_{i}") for i in range(1, k + 1)],
    )
    agree = sum(
        F.when(F.col(f"la_{i}") == F.col(f"lb_{i}"), 1).otherwise(0)
        for i in range(1, k + 1)
    )
    scored = (
        cands.join(sig_n, "new_id")
        .join(sig_c, "corpus_id")
        .select(
            "new_id",
            "corpus_id",
            F.round(agree / F.lit(float(k)), 4).alias("est_sim"),
        )
    )
    w = Window.partitionBy("new_id").orderBy(
        F.col("est_sim").desc(), F.col("corpus_id").asc()
    )
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .groupBy("new_id")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.max(F.when(F.col("rn") == 1, F.col("corpus_id")))
            .alias("best_match_id"),
            F.max(F.when(F.col("rn") == 1, F.col("est_sim")))
            .alias("best_sim"),
        )
    )
    return (
        new_sigs.select(F.col(id_col).alias("new_id"))
        .join(best, "new_id", "left")
        .select(
            F.col("new_id").cast("long").alias(id_col),
            F.coalesce("n_candidates", F.lit(0)).cast("long")
            .alias("n_candidates"),
            F.col("best_match_id").cast("long"),
            F.col("best_sim"),
            F.coalesce(F.col("best_sim") >= threshold, F.lit(False))
            .alias("is_neardup"),
        )
    )


def pagerank_fixed(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over the undirected pair graph, in 1e-9
    fixed-point integer arithmetic so every engine computes bit-identical
    ranks (floating accumulation order never enters the result).

    Per iteration: one keyed join (edge × rank) + one groupBy(v) —
    shuffles carry (node, rank_q) longs only. ``iters`` is fixed (not
    run-to-convergence) because centrality ordering stabilizes in a few
    rounds on dense near-dup clusters; at 100 TB each round is a
    self-contained shuffle pair and the edge list is checkpointed once.
    Returns (node, degree, pr_q) with pr_q = rank × 1e9 as BIGINT.
    """
    edges = pairs.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    )
    edges = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    edges = edges.localCheckpoint(eager=True)
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    # max(·,1): an empty graph degrades to an empty result instead of a
    # driver-side division by zero
    n = deg.count() or 1
    base_q = F.lit(round((1.0 - damping) * 1e9 / n)).cast("long")
    rank = deg.select(
        F.col("u").alias("node"),
        F.lit(round(1e9 / n)).cast("long").alias("rq"),
    )
    for _ in range(iters):
        contrib = (
            edges.join(rank.withColumnRenamed("node", "u"), "u")
            .join(deg, "u")
            .select(
                F.col("v").alias("node"),
                F.floor(F.col("rq") / F.col("d")).cast("long").alias("c"),
            )
        )
        rank = contrib.groupBy("node").agg(
            (
                base_q
                + F.round(F.lit(damping) * F.sum("c")).cast("long")
            ).alias("rq")
        )
    return (
        rank.join(deg.withColumnRenamed("u", "node"), "node")
        .select("node", F.col("d").alias("degree"), F.col("rq").alias("pr_q"))
    )


def duplicated_spans(
    docs: DataFrame,
    width: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window exact-substring dedup: find every MAXIMAL token
    span that is duplicated across documents — the substring-level pass
    from the training-data dedup literature (suffix-array ExactSubstr;
    here windowed n-gram hashing, the shuffle-friendly equivalent).

    Unlike ``chunk_dup_stats`` (disjoint chunks — a duplicated passage
    that straddles a chunk boundary is missed), this slides a
    ``width``-token window one token at a time, keeps windows whose hash
    occurs in ≥2 distinct documents, and merges overlapping duplicated
    windows into maximal spans per document with a gaps-and-islands
    pass.  Window starts are monotone per doc and all windows share one
    width, so span ends are monotone too and a plain LAG break test is
    exact (no running-max needed).

    Scale shape: the explode emits (digest, doc_id, start) — never
    text — so the dup-hash groupBy shuffles digests only; the
    survivors rejoin windows on the digest and the island merge runs
    inside one per-doc window partition.  The digest is the first 60
    bits of the window's md5 as a BIGINT (r10): 32-char hex-string agg
    keys put ~1 GB of variable-width map state in each partial-agg
    task at derived sf1000 and OOM'd the heap before the spill
    threshold tripped; a fixed-width long key shrinks the state ~10x
    and keeps the hash map in UnsafeRow fast paths.  60-bit collision
    odds (birthday bound n²/2^61): ~0.1-0.2 expected colliding pairs
    at the ~600M windows of derived sf1000, and each collision marks
    at most one extra window duplicated; the DuckDB oracle mirrors
    the same prefix so both sides agree exactly.  Unlike
    ``ngram_jaccard`` (which joins doc PAIRS through each shingle and
    therefore needs a stop-shingle frequency prune), the rejoin here
    matches each window row to at most ONE ``dup_h`` row — a
    boilerplate 8-gram present in every document multiplies nothing;
    it is only hot-key shuffle skew on that digest, which AQE's
    skew-join splitting absorbs.  Returns one row per document that
    contains at least one duplicated span: (doc_id, n_spans,
    dup_tokens, total_tokens, dup_fraction).
    """
    from pyspark.sql import Window as W

    toks = docs.select(
        F.col(id_col), F.split(F.col("text"), " ").alias("_toks")
    ).filter(F.size("_toks") >= width)
    # r11 (guide §1.3, measured ~9x on the build+explode stage): explode
    # the window-start sequence and hash each window as a plain
    # codegen'd projection — identical md5/conv/slice values, no
    # interpreted transform() lambda per window.
    wins = toks.select(
        F.col(id_col),
        F.size("_toks").alias("total_tokens"),
        "_toks",
        F.explode(
            F.sequence(F.lit(1), F.size("_toks") - (width - 1))
        ).alias("start"),
    ).select(
        id_col,
        "total_tokens",
        "start",
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        " ", F.slice(F.col("_toks"), F.col("start"), width)
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("h"),
    )
    # r11 second pass (guide §1.2, measured 7.8x on this stage at
    # derived sf10: 242 -> 31 s): the former dup-hash groupBy + join
    # back re-instantiated the whole window build (divergent column
    # pruning defeated exchange reuse) and sort-merge-joined the full
    # window stream against it.  A window with ≥2 distinct documents
    # is exactly one with min(doc_id) != max(doc_id) over its digest
    # partition — ONE exchange on h, no second build, no join; row set
    # proven identical at sf0.1.  Per-digest groups are tiny (a hot
    # boilerplate digest degrades to a spilled window buffer, the same
    # hot-key skew the join shape had).
    # Skew disposition (r11 ADVICE): the spilled-window shape is
    # validated through derived sf10 (231 s total, no window spill
    # observed — sweeps/r11 holdout); a single digest only goes hot
    # when one exact `width`-token window repeats across a large
    # fraction of the corpus, i.e. boilerplate that remove_boilerplate
    # strips upstream in the production pipeline.  If an ultra-hot
    # digest does appear, the guard is the aggregate+join form (map-
    # side-combined min/max per h joined back) that this replaced —
    # 7.8x slower in the common case, skew-immune in the pathological
    # one; switching is a two-line revert kept in git history.
    wh = W.partitionBy("h")
    marked = (
        wins.withColumn("_mn", F.min(id_col).over(wh))
        .withColumn("_mx", F.max(id_col).over(wh))
        .filter(F.col("_mn") != F.col("_mx"))
        .select(id_col, "total_tokens", "start")
    )
    w = W.partitionBy(id_col).orderBy("start")
    islands = marked.withColumn(
        "brk",
        F.when(
            F.col("start") > F.lag("start").over(w) + width, 1
        ).otherwise(0),
    ).withColumn(
        "grp", F.sum("brk").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    spans = islands.groupBy(id_col, "total_tokens", "grp").agg(
        (F.max("start") + width - F.min("start")).alias("span_len")
    )
    return (
        spans.groupBy(id_col, "total_tokens")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("span_len").cast("bigint").alias("dup_tokens"),
        )
        .select(
            F.col(id_col),
            F.col("n_spans").cast("bigint").alias("n_spans"),
            "dup_tokens",
            F.col("total_tokens").cast("bigint").alias("total_tokens"),
            F.round(
                F.col("dup_tokens") / F.col("total_tokens"), 4
            ).alias("dup_fraction"),
        )
    )


def cdc_chunk_stats(
    docs: DataFrame,
    window: int = 4,
    mask: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking (CDC) dedup: cut each document into
    VARIABLE-length chunks at positions where a hash of the local token
    window satisfies the cut condition (h % mask == 0 → mean chunk ≈
    mask tokens), then report chunks occurring in >1 document.

    Why a third chunk grain: fixed-width chunks (``chunk_dup_stats``)
    lose ALL alignment after a single-token insertion — every downstream
    chunk shifts and re-hashes.  CDC cut-points depend only on local
    content, so they re-synchronize right after the edit and the rest of
    the document still dedups — the property storage/backup dedup
    systems rely on (gear/Rabin chunking), pinned by
    ``test_cdc_chunks_resynchronize_after_edit``.

    Engine-exact determinism: the cut decision at position i hashes the
    w-token window ENDING at i (md5 → first 8 hex → integer → % mask) —
    a per-position local predicate, not a sequential rolling state, so
    both engines compute identical cut sets with pure list algebra.

    Scale shape: chunking is a narrow map (higher-order functions over
    the token array, JVM-side, no UDF); only (md5(chunk), doc_id, len)
    rows shuffle for the dup groupBy, which partially aggregates
    map-side — identical shuffle budget to ``chunk_dup_stats``.
    """
    w, m = window, mask
    cuts = (
        f"filter(sequence({w}, size(_toks)),"
        f"  i -> CAST(conv(substring(md5(concat_ws(' ',"
        f"       slice(_toks, i - {w} + 1, {w}))), 1, 8), 16, 10) AS BIGINT)"
        f"       % {m} = 0)"
    )
    # r11 (guide §1.3): the cut-point array is materialized ONCE per
    # doc as a column — the former expression text was inlined at every
    # element_at() site inside the transform lambda, re-running the
    # full md5 cut scan per boundary element (O(positions²) hashing)
    bounds = f"concat(array(0), {cuts}, array(size(_toks)))"
    # r11 second pass: the explode-index rewrite that won for the
    # n-gram/window builds was TRIED here and REVERTED on measurement
    # (0.84 -> 2.25 s fresh-plan): the boundary walk touches only
    # ~size/mask elements, so the interpreted-lambda saving is tiny
    # while the exploded rows would carry (and copy) the full _toks +
    # _bounds arrays per chunk through the Generate.  Rule: explode-
    # index wins when per-element lambda work dominates; a short
    # array-to-array walk should stay a HOF.
    chunks = (
        "filter(transform(sequence(1, size(_bounds) - 1),"
        "  j -> named_struct("
        "       'start', element_at(_bounds, j) + 1,"
        "       'len', element_at(_bounds, j + 1)"
        "              - element_at(_bounds, j))),"
        "  c -> c.len > 0)"
    )
    chunk_rows = (
        f"transform({chunks},"
        f"  c -> named_struct("
        f"       'h', md5(concat_ws(' ', slice(_toks, c.start, c.len))),"
        f"       'len', c.len))"
    )
    return (
        docs.withColumn("_toks", F.split(F.col("text"), " "))
        .filter(F.size("_toks") >= w)
        .withColumn("_bounds", F.expr(bounds))
        .select(F.col(id_col), F.explode(F.expr(chunk_rows)).alias("c"))
        .select(id_col, "c.h", "c.len")
        .groupBy("h")
        .agg(
            F.count_distinct(F.col(id_col)).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.max("len").alias("chunk_tokens"),
        )
        .filter(F.col("n_docs") > 1)
        .select(
            "h",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("n_occurrences").cast("bigint").alias("n_occurrences"),
            F.col("chunk_tokens").cast("bigint").alias("chunk_tokens"),
        )
    )
