"""Dedup at 1M documents with PLANTED near-duplicates — committed evidence
for SCALE.md, the dedup family's sibling of tools/ann_scale_probe.py.

The corpus is generated ALL-JVM from pure id arithmetic (no RNG, no
driver-side data): doc(id) = 30 tokens w{(base*13 + j*7) % 50000}; every
id % 10 == 9 reuses id-1's tokens with token 0 replaced, planting a known
(id-1, id) near-dup pair at true Jaccard 29/31 ≈ 0.935. Measures:

  exact dedup wall (md5 groupBy)           — expected 0 groups (no exacts)
  minhash+LSH near-dup pairs wall          — threshold 0.8, k=3, 64 hashes
  recall of the 100k planted pairs         — LSH miss probability ~1e-15
  precision                                — every emitted pair is exact-
                                             Jaccard verified >= threshold
                                             by construction; report extras

Run:  python tools/dedup_scale_probe.py [N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
TOKENS, VOCAB = 30, 50_000


def main() -> None:
    from pyspark.sql import functions as F

    from schemamap_spark.operators.dedup import (
        exact_duplicates,
        minhash_lsh_similar_pairs,
    )
    from schemamap_spark.session import get_spark

    spark = get_spark("dedup-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    base = F.when(F.col("id") % 10 == 9, F.col("id") - 1).otherwise(F.col("id"))
    # hash-mixed tokens (NOT an arithmetic progression — a linear formula
    # makes docs at stride-related offsets share long token runs, flooding
    # the corpus with accidental near-dups): expected cross-doc overlap is
    # 30·30/50k ≈ 0.02 tokens, so planted pairs are the only real signal
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(TOKENS - 1)),
        lambda j: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(base, j), F.lit(VOCAB)).cast("string")
        ),
    )
    # the planted near-dup replaces token 0 with a doc-unique token
    toks = F.when(
        F.col("id") % 10 == 9,
        F.concat(
            F.array(F.concat(F.lit("u"), F.col("id").cast("string"))),
            F.slice(toks, 2, TOKENS - 1),
        ),
    ).otherwise(toks)
    docs = (
        spark.range(N)
        .repartition(32)
        .select(
            F.col("id").alias("doc_id"), F.array_join(toks, " ").alias("text")
        )
        .persist()
    )
    n = docs.count()
    planted = n // 10

    t0 = time.monotonic()
    n_exact = exact_duplicates(docs).count()
    t_exact = time.monotonic() - t0

    t0 = time.monotonic()
    pairs = minhash_lsh_similar_pairs(docs, threshold=0.8, k=3).persist()
    n_pairs = pairs.count()
    t_lsh = time.monotonic() - t0

    hits = pairs.filter(
        (F.col("j") == F.col("i") + 1) & (F.col("j") % 10 == 9)
    ).count()
    extras = n_pairs - hits

    print("\n=== dedup scale probe ===")
    print(f"corpus {n:,} docs x {TOKENS} tokens, {planted:,} planted near-dup "
          f"pairs (true J≈{29/31:.3f})")
    print(f"exact dedup:   {t_exact:.1f}s   groups {n_exact} (expected 0)")
    print(f"minhash+LSH:   {t_lsh:.1f}s   pairs {n_pairs:,}")
    print(f"planted recall: {hits}/{planted} = {hits / planted:.4f}")
    print(f"non-planted pairs emitted: {extras:,} "
          "(exact-verified >= 0.8, so these are REAL accidental near-dups)")


if __name__ == "__main__":
    main()
