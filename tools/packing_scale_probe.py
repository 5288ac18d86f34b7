"""Sequence packing at 1M documents — wall + fill-ratio evidence for the
FFD packer. Lengths are generated all-JVM (log-ish spread 16..1500 tokens
via hash mixing — the shape real corpora have), packing budget 2048.

Measures: pack_sequences wall over the slim (doc_id, n_tokens) frame, the
achieved FILL RATIO (packed tokens / (sequences x budget) — the number a
training team actually optimizes, padding waste = 1 - fill), oversize
count, and the per-sequence doc fan-in.

Run:  python tools/packing_scale_probe.py [N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
BUDGET = 2048


def main() -> None:
    from pyspark.sql import functions as F

    from schemamap_spark.operators.packing import pack_sequences
    from schemamap_spark.session import get_spark

    spark = get_spark("packing-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # length ∈ [16, ~1500], right-skewed: 16 + (h % 64)^1.8-ish via two hashes
    h1 = F.pmod(F.xxhash64(F.col("id"), F.lit("a")), F.lit(64))
    h2 = F.pmod(F.xxhash64(F.col("id"), F.lit("b")), F.lit(24))
    docs = (
        spark.range(N)
        .repartition(32)
        .select(
            F.col("id").alias("doc_id"),
            (F.lit(16) + h1 * h2).cast("int").alias("n_tok"),
        )
        .persist()
    )
    total_tokens = docs.agg(F.sum("n_tok")).first()[0]

    t0 = time.monotonic()
    packed = pack_sequences(docs, BUDGET, tokens_col="n_tok").persist()
    n_docs = packed.count()
    t_pack = time.monotonic() - t0

    stats = packed.filter(~F.col("oversize")).groupBy("seq_id").agg(
        F.first("seq_tokens").alias("seq_tokens"),
        F.count(F.lit(1)).alias("docs_in_seq"),
    )
    agg = stats.agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.sum("seq_tokens").alias("packed_tokens"),
        F.avg("docs_in_seq").alias("avg_fanin"),
    ).first()
    oversize = packed.filter("oversize").count()
    fill = agg["packed_tokens"] / (agg["n_seqs"] * BUDGET)

    print("\n=== packing scale probe ===")
    print(f"{N:,} docs, {total_tokens / 1e6:.0f}M tokens, budget {BUDGET}")
    print(f"pack_sequences wall: {t_pack:.1f}s  ({n_docs:,} assignments)")
    print(f"sequences: {agg['n_seqs']:,}   fill ratio {fill:.4f} "
          f"(padding waste {1 - fill:.2%})   avg docs/seq {agg['avg_fanin']:.1f}")
    print(f"oversize docs (> budget, passed through flagged): {oversize:,}")


if __name__ == "__main__":
    main()
