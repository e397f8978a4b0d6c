#!/usr/bin/env python
"""Build the BPE tokenizer fixtures that give ``text_bpe_encode`` a real
SQL oracle.

Iterative merge application has no SQL equivalent, so the DuckDB oracle
instead JOINs each corpus word to a fixture of (word -> n_subwords)
produced HERE by a pure-Python BPE trainer + encoder, with no Spark and
no multisql_spark import — the second-independent-implementation
tradition of tools/make_zlib_fixture.py and tools/heavy_oracle.py.  The
engine-side Arrow-batched encoder (operators/textan.py:bpe_encode_len)
must agree with this one on every corpus word for the driver's
hash-compare to pass; tests/test_text_ops.py additionally pins the two
implementations against each other directly.

Two artifacts:

- ``bpe_merges.parquet``  (rank, left, right) — the merge table, learned
  once from the sf0.001 corpus word frequencies (deterministic: highest
  pair count, ties broken by lexicographically smallest pair).  This is
  the "pre-trained tokenizer" every encode run shares — at 100 TB the
  merge table is a trained artifact distributed to executors, never
  re-learned per batch.
- ``bpe_word_tokens.parquet`` (word, n_subwords) — the learned encoder
  applied to every DISTINCT word across the base sf dirs (plus the empty
  word -> 0).  Derived scale dirs replicate texts verbatim
  (tools/make_scaled_sf.py offsets key columns only), so they are
  covered by construction.

Usage: python tools/make_bpe_fixture.py [fixtures_dir] [sf_dir ...]
"""

from __future__ import annotations

import os
import sys
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq

DEFAULT_SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
TRAIN_SF = "/root/testdata/sf0.001"
N_MERGES = 20


def train_merges(word_freq: Counter, n_merges: int) -> list[tuple[str, str]]:
    """Classic character-level BPE training over a word-frequency table.

    Each round counts adjacent symbol pairs (weighted by word frequency),
    merges the most frequent pair everywhere, and records it.  Ties break
    on the lexicographically smallest (left, right) so the table is
    deterministic regardless of dict ordering."""
    vocab = {tuple(w): c for w, c in word_freq.items() if w}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, cnt in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += cnt
        if not pairs:
            break
        top = max(pairs.values())
        best_pair = min(p for p, c in pairs.items() if c == top)
        merges.append(best_pair)
        a, b = best_pair
        ab = a + b
        new_vocab = {}
        for sym, cnt in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
    return merges


def encode_len(word: str, merges: list[tuple[str, str]]) -> int:
    """Number of subword units after applying the merge table in rank
    order (one left-to-right pass per merge — the reference semantics the
    engine-side encoder must reproduce)."""
    if not word:
        return 0
    sym = list(word)
    for a, b in merges:
        i, out = 0, []
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return len(sym)


def corpus_word_freq(sf_dir: str) -> Counter:
    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    freq: Counter = Counter()
    for txt in tbl.column("text").to_pylist():
        if txt:
            freq.update(txt.split(" "))
    return freq


def main() -> None:
    fixtures_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
    )
    sf_dirs = sys.argv[2:] or DEFAULT_SF_DIRS
    os.makedirs(fixtures_dir, exist_ok=True)

    merges = train_merges(corpus_word_freq(TRAIN_SF), N_MERGES)
    pq.write_table(
        pa.table(
            {
                "rank": pa.array(range(1, len(merges) + 1), pa.int64()),
                "left": pa.array([a for a, _ in merges], pa.string()),
                "right": pa.array([b for _, b in merges], pa.string()),
            }
        ),
        os.path.join(fixtures_dir, "bpe_merges.parquet"),
    )

    words: set[str] = {""}
    for d in sf_dirs:
        fp = os.path.join(d, "documents.parquet")
        if os.path.exists(fp):
            words.update(corpus_word_freq(d).keys())
    ordered = sorted(words)
    pq.write_table(
        pa.table(
            {
                "word": pa.array(ordered, pa.string()),
                "n_subwords": pa.array(
                    [encode_len(w, merges) for w in ordered], pa.int64()
                ),
            }
        ),
        os.path.join(fixtures_dir, "bpe_word_tokens.parquet"),
    )
    print(
        f"{len(merges)} merges, {len(ordered)} vocab words -> {fixtures_dir}"
    )
    for r, (a, b) in enumerate(merges, 1):
        print(f"  {r:2d}: {a!r} + {b!r}")


if __name__ == "__main__":
    main()
