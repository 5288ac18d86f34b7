"""DSIR selection at 1M candidate documents — scale evidence for the #2
bench-cost operator. All-JVM corpus from id arithmetic (the dedup-probe
pattern): candidates draw 30 hash-mixed tokens from a 50k vocabulary;
the 2,000-doc TARGET corpus draws from a narrow 2k slice of it, so
target-likeness is a real, verifiable signal (selected docs should carry
far more target-vocab tokens than the candidate average).

Measures: dsir_select wall end-to-end (tokenize→hash features→models→
score→top-k) at the given N, plus the selection-signal sanity check.

Run:  python tools/dsir_scale_probe.py [N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
TOKENS, VOCAB, TARGET_VOCAB, N_TARGET, N_SELECT = 30, 50_000, 2_000, 2_000, 1_000


def main() -> None:
    from pyspark.sql import functions as F

    from schemamap_spark.operators.dsir import dsir_select
    from schemamap_spark.session import get_spark

    spark = get_spark("dsir-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def gen(n, vocab, tag):
        toks = F.transform(
            F.sequence(F.lit(0), F.lit(TOKENS - 1)),
            lambda j: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(F.col("id"), j, F.lit(tag)), F.lit(vocab)).cast(
                    "string"
                ),
            ),
        )
        return (
            spark.range(n)
            .repartition(32)
            .select(F.col("id").alias("doc_id"), F.array_join(toks, " ").alias("text"))
        )

    cand = gen(N, VOCAB, "cand").persist()
    cand.count()
    targ = gen(N_TARGET, TARGET_VOCAB, "targ").persist()
    targ.count()

    t0 = time.monotonic()
    sel = dsir_select(cand, targ, N_SELECT).persist()
    n_sel = sel.count()
    t_select = time.monotonic() - t0

    # signal check: fraction of tokens inside the target's 2k-vocab slice,
    # selected docs vs the candidate average (w0..w1999 is the shared slice)
    in_slice = F.size(
        F.filter(
            F.split(F.col("text"), " "),
            lambda t: F.substring(t, 2, 10).cast("long") < TARGET_VOCAB,
        )
    ) / F.lit(float(TOKENS))
    base = cand.select(F.avg(in_slice)).first()[0]
    picked = (
        sel.join(cand, "doc_id").select(F.avg(in_slice)).first()[0]
    )

    print("\n=== DSIR scale probe ===")
    print(f"candidates {N:,} x {TOKENS} tokens (vocab {VOCAB:,}); target "
          f"{N_TARGET:,} docs on a {TARGET_VOCAB:,}-token slice; select "
          f"{N_SELECT:,}")
    print(f"dsir_select end-to-end: {t_select:.1f}s  ({n_sel} rows)")
    print(f"target-vocab token share: candidates {base:.3f} -> selected "
          f"{picked:.3f} ({picked / base:.2f}x enrichment)")


if __name__ == "__main__":
    main()
