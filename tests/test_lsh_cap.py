"""Bucket-capped LSH: the 100 TB guard for pathological duplicate
buckets.  Pins the three claims the operator docstrings make:

1. under the cap the output is bit-identical to the uncapped operator;
2. over the cap every bucket contributes at most C(cap, 2) pairs, the
   kept members are exactly the ``cap`` smallest ids, and the capped
   pair set is a subset of the uncapped one with equal est_sim;
3. the audit's integer arithmetic (members / dropped / pairs with and
   without the cap) matches direct enumeration.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from multisql_spark.operators import dedup

K = 12
BANDS = 4


def _sig_frame(spark, groups):
    """Build a signature frame where every doc in a group shares one
    signature vector (→ one LSH bucket per band per group)."""
    rows = []
    for gi, n in enumerate(groups):
        for d in range(n):
            doc_id = gi * 1000 + d
            rows.append(
                (doc_id, *[f"g{gi}_s{i}" for i in range(1, K + 1)])
            )
    cols = ["doc_id"] + [f"sig_{i}" for i in range(1, K + 1)]
    return spark.createDataFrame(rows, cols)


def _pairs(df):
    return {
        (r["doc_a"], r["doc_b"]): r["est_sim"] for r in df.collect()
    }


def test_capped_equals_uncapped_under_cap(spark):
    sigs = _sig_frame(spark, [3, 5, 2, 1])
    base = _pairs(dedup.lsh_candidate_pairs(sigs, k=K, bands=BANDS))
    capped = _pairs(
        dedup.lsh_candidate_pairs_capped(sigs, k=K, bands=BANDS, cap=32)
    )
    assert capped == base
    # C(3,2)+C(5,2)+C(2,2)=3+10+1; identical sigs → est_sim 1.0
    assert len(base) == 14
    assert all(v == 1.0 for v in base.values())


def test_cap_bounds_pairs_and_keeps_smallest_ids(spark):
    sigs = _sig_frame(spark, [10])
    cap = 4
    capped = _pairs(
        dedup.lsh_candidate_pairs_capped(sigs, k=K, bands=BANDS, cap=cap)
    )
    base = _pairs(dedup.lsh_candidate_pairs(sigs, k=K, bands=BANDS))
    # subset with equal similarity, exactly C(cap,2) pairs over the
    # cap smallest ids (0..3), across-band distinct
    assert set(capped) <= set(base)
    assert len(capped) == cap * (cap - 1) // 2
    touched = {d for ab in capped for d in ab}
    assert touched == {0, 1, 2, 3}
    assert all(capped[k_] == base[k_] for k_ in capped)


def test_audit_arithmetic_matches_enumeration(spark):
    groups = [10, 3, 1]
    cap = 4
    sigs = _sig_frame(spark, groups)
    audit = dedup.lsh_bucket_audit(sigs, k=K, bands=BANDS, cap=cap)
    rows = audit.collect()
    assert [r["band_id"] for r in rows] == list(range(BANDS))
    for r in rows:
        assert r["n_buckets"] == len(groups)
        assert r["n_overflow"] == sum(1 for m in groups if m > cap)
        assert r["max_bucket"] == max(groups)
        assert r["members"] == sum(groups)
        assert r["members_dropped"] == sum(
            m - min(m, cap) for m in groups
        )
        assert r["pairs_uncapped"] == sum(
            m * (m - 1) // 2 for m in groups
        )
        assert r["pairs_capped"] == sum(
            min(m, cap) * (min(m, cap) - 1) // 2 for m in groups
        )


def test_registry_capped_subset_of_uncapped_on_fixture(spark, sf_dir):
    """On the real sf0.001 corpus the capped registry query emits a
    subset of the full uncapped enumeration's pairs (operator level —
    the registry `dedup_minhash_lsh` is the SAMPLED uncapped baseline,
    so the full-corpus uncapped reference comes from the operator)."""
    from multisql_spark.operators import dedup as dd
    from multisql_spark.queries import load_all
    from multisql_spark.tables import load_tables

    reg = load_all()
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    sigs = dd.minhash_signatures(docs, k=K)
    base = _pairs(dd.lsh_candidate_pairs(sigs, k=K, bands=BANDS))
    capped = _pairs(reg["dedup_lsh_bucket_capped"].fn(spark, sf_dir))
    assert set(capped) <= set(base)
    assert capped  # non-degenerate on the fixture
    assert all(capped[k_] == base[k_] for k_ in capped)


def test_registry_minhash_lsh_is_sampled_uncapped(spark, sf_dir):
    """The registry calibration baseline runs UNCAPPED semantics on the
    deterministic 1/16 md5 document sample: its pairs are exactly the
    full uncapped pairs restricted to sampled doc ids."""
    import hashlib

    from multisql_spark.operators import dedup as dd
    from multisql_spark.queries import load_all
    from multisql_spark.tables import load_tables

    reg = load_all()
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    sampled = {
        int(r["doc_id"])
        for r in docs.select("doc_id").collect()
        if int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16)
        % 16
        == 0
    }
    got = _pairs(reg["dedup_minhash_lsh"].fn(spark, sf_dir))
    assert got  # the sample still collides on the fixture corpus
    assert all(a in sampled and b in sampled for a, b in got)
    sigs = dd.minhash_signatures(docs, k=K)
    full = _pairs(dd.lsh_candidate_pairs(sigs, k=K, bands=BANDS))
    expect = {
        p: s for p, s in full.items()
        if p[0] in sampled and p[1] in sampled
    }
    assert got == expect


def test_incremental_probe_cap_semantics(spark, sf_dir):
    """r8: the incremental minhash probe's corpus band index carries the
    same cap discipline.  Pins: (1) with a cap no bucket can bind, the
    capped probe is bit-identical to the uncapped one; (2) with a tight
    cap every NEW doc still gets exactly one verdict row and its
    candidate count is bounded by bands x cap; (3) capped candidates are
    a subset of uncapped ones, so best_sim can only stay or drop."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    new = F.col("doc_id") % 10 == 0

    uncapped = dedup.incremental_minhash_dedup(
        docs, new, k=K, bands=BANDS, threshold=0.5
    ).collect()
    loose = dedup.incremental_minhash_dedup(
        docs, new, k=K, bands=BANDS, threshold=0.5, bucket_cap=10**9
    ).collect()
    assert sorted(map(tuple, loose)) == sorted(map(tuple, uncapped))

    tight = dedup.incremental_minhash_dedup(
        docs, new, k=K, bands=BANDS, threshold=0.5, bucket_cap=2
    ).collect()
    assert len(tight) == len(uncapped)  # one verdict row per new doc
    un_by_id = {r["doc_id"]: r for r in uncapped}
    for r in tight:
        assert r["n_candidates"] <= BANDS * 2
        u = un_by_id[r["doc_id"]]
        assert r["n_candidates"] <= u["n_candidates"]
        if r["best_sim"] is not None:
            assert u["best_sim"] is not None
            assert r["best_sim"] <= u["best_sim"] + 1e-9


def test_minhash_signatures_carry_is_passthrough(spark, sf_dir):
    """r11: the ``carry`` group keys (functionally dependent per-doc
    flags riding the signature aggregation) change neither the row set
    nor any signature — they only delete the post-hoc flags join."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plain = dedup.minhash_signatures(docs, k=K)
    carried = dedup.minhash_signatures(
        docs.select(
            "doc_id", (F.col("doc_id") % 10 == 0).alias("_is_new"), "text"
        ),
        k=K,
        carry=("_is_new",),
    )
    a = sorted(map(tuple, plain.collect()))
    b = sorted(
        (r["doc_id"], *[r[f"sig_{i}"] for i in range(1, K + 1)])
        for r in carried.collect()
    )
    assert a == b
    assert all(
        r["_is_new"] == (r["doc_id"] % 10 == 0) for r in carried.collect()
    )
