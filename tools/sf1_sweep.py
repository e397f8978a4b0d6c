"""Chunked full-registry value-verification sweep at derived sf1.

VERDICT r4 ask #7: extend the sf1 evidence beyond the 35-query sample to
the full oracle-bearing registry.  Running 270 queries in one
``driver_sim`` process risks losing everything to a single pathological
query (the derived-sf1 corpus replicates document text 10x, so
near-dup candidate pairs grow ~quadratically in the replication factor
for the LSH family).  This wrapper instead:

- splits the registry into fixed-size chunks, light families first and
  the 23 quadratic-risk dedup/near-dup names in dedicated tail chunks;
- runs each chunk as its own ``tools/driver_sim.py`` subprocess under a
  wall timeout, so a blowup costs one chunk, not the sweep;
- each completed chunk lands its own ``sweeps/r5sf1_*.json`` artifact
  (driver_sim already does this keyed by the query-name digest);
- prints a final roll-up of value-verified / rows-only / timed-out names.

Usage: python tools/sf1_sweep.py [sf_dir] [chunk_timeout_sec]
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multisql_spark.queries import load_all

HEAVY = {
    # near-dup families: candidate pairs scale ~quadratically in the
    # derived-sf1 replication factor (same text, 10 copies)
    "dedup_chunks", "dedup_containment", "dedup_graph_pagerank",
    "dedup_graph_triangles", "dedup_incremental",
    "dedup_lsh_precision_recall", "dedup_minhash_calibration",
    "dedup_remove_boilerplate", "dedup_token_savings",
    "dedup_family_histogram", "dedup_cluster_representatives",
    "mm_content_dedup", "text_novelty_rate", "dedup_exact",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard",
    "dedup_cluster_components", "dedup_bloom_prefilter",
    "dedup_incremental_minhash", "dedup_ensemble_verdict",
    "sim_embedding_neardup", "dedup_semantic",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_derived"
    chunk_timeout = int(sys.argv[2]) if len(sys.argv) > 2 else 1800
    names = list(load_all())
    light = [n for n in names if n not in HEAVY]
    heavy = [n for n in names if n in HEAVY]
    chunks = [light[i : i + 25] for i in range(0, len(light), 25)]
    # heavy names one-per-chunk so each gets its own timeout budget
    chunks += [[n] for n in heavy]

    env = dict(os.environ, SWEEP_LABEL="r5sf1")
    timed_out: list[str] = []
    failed_chunks: list[str] = []
    here = os.path.dirname(os.path.abspath(__file__))
    for i, chunk in enumerate(chunks):
        print(f"=== chunk {i + 1}/{len(chunks)} ({len(chunk)} queries) "
              f"{chunk[0]}..{chunk[-1]}", flush=True)
        try:
            rc = subprocess.run(
                [sys.executable, os.path.join(here, "driver_sim.py"),
                 sf_dir, *chunk],
                timeout=chunk_timeout, env=env,
            ).returncode
            if rc != 0:
                failed_chunks.append(chunk[0])
        except subprocess.TimeoutExpired:
            timed_out.extend(chunk)
            print(f"TIMEOUT after {chunk_timeout}s: {chunk}", flush=True)
    print("\n=== sweep done ===")
    print("timed out:", timed_out)
    print("chunks with reds:", failed_chunks)
    return 0


if __name__ == "__main__":
    main()
