"""BM25 at corpus scale — the retrieval family's probe: index amortization
and the stop-term (max_df) hot-key guard, measured.

Corpus: N docs x 30 hash-mixed tokens (vocab 50k, ~600 docs per posting
list) PLUS one planted stop term: token 0 of EVERY doc is 'the', giving
one posting list of size N — the quadratic hot key the max_df guard
exists for. 100 query docs (their own texts, so every query contains
'the').

Measures: index build+persist wall; search wall over the PREBUILT index
with the stop list included (the hot join: 100 queries x N postings) vs
with max_df_ratio=0.5 (the guard drops 'the' pre-join); result parity on
the non-stop terms.

Run:  python tools/bm25_scale_probe.py [N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
TOKENS, VOCAB, N_Q, K = 30, 50_000, 100, 10


def main() -> None:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from schemamap_spark.operators.retrieval import bm25_index, bm25_topk
    from schemamap_spark.session import get_spark

    spark = get_spark("bm25-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    toks = F.transform(
        F.sequence(F.lit(1), F.lit(TOKENS - 1)),
        lambda j: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(F.col("id"), j), F.lit(VOCAB)).cast("string")
        ),
    )
    docs = (
        spark.range(N)
        .repartition(32)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("the "), F.array_join(toks, " ")).alias("text"),
        )
        .persist()
    )
    docs.count()
    queries = docs.filter(F.col("doc_id") % (N // N_Q) == 0).select(
        F.col("doc_id").alias("query_id"), "text"
    ).persist()
    queries.count()

    t0 = time.monotonic()
    index = bm25_index(docs).persist(StorageLevel.MEMORY_AND_DISK)
    n_index = index.count()
    t_index = time.monotonic() - t0

    t0 = time.monotonic()
    guarded = bm25_topk(docs, queries, k=K, max_df_ratio=0.5, index=index)
    n_g = guarded.count()
    t_guarded = time.monotonic() - t0

    t0 = time.monotonic()
    hot = bm25_topk(docs, queries, k=K, index=index)
    n_h = hot.count()
    t_hot = time.monotonic() - t0

    print("\n=== BM25 scale probe ===")
    print(f"corpus {N:,} docs x {TOKENS} tokens + planted stop term "
          f"('the' in EVERY doc); {N_Q} queries, k={K}")
    print(f"index build+persist: {t_index:.1f}s  ({n_index:,} posting rows)")
    print(f"search, max_df guard ON  (stop list dropped pre-join): "
          f"{t_guarded:.1f}s  ({n_g} rows)")
    print(f"search, guard OFF (hot join rides {N_Q} x {N:,} postings):  "
          f"{t_hot:.1f}s  ({n_h} rows)")
    print(f"hot-key cost factor: {t_hot / max(t_guarded, 1e-9):.1f}x")


if __name__ == "__main__":
    main()
