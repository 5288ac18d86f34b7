"""ANN index store at a production-shaped corpus size — committed evidence
for SCALE.md. Synthesizes a 200k x 64-dim 50-cluster mixture-of-Gaussians
corpus (same geometry family as fixtures/clustered_embeddings, 100x the
rows), then measures the full store lifecycle:

  build (train + encode + atomic swap) | append 20k | search 100 queries
  at nprobe 4 / 8 / 16 (+exact rerank) | store bytes vs raw vector bytes |
  recall@10 vs exact brute force (cosine_topk method="matmul") |
  coarse-router comparison: the same search grid against a second store
  built with centroids="kmeans" (routing, not PQ resolution, binds recall
  in this dense regime — the trained router is the lever)

Run:  python tools/ann_scale_probe.py          (writes under /tmp)
Prints one human-readable block; paste the numbers into SCALE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, N_APPEND, DIMS, CLUSTERS, N_Q, K = 200_000, 20_000, 64, 50, 100, 10


def make_corpus(n, seed, id_base=0):
    rng = np.random.RandomState(seed)
    cents = rng.randn(CLUSTERS, DIMS)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    assign = rng.randint(0, CLUSTERS, size=n)
    v = cents[assign] + 0.35 * rng.randn(n, DIMS)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pd.DataFrame(
        {"vec_id": np.arange(id_base, id_base + n, dtype=np.int64),
         "embedding": list(v.astype(np.float64))}
    )


def main() -> None:
    from schemamap_spark.operators.ann_index import (
        ann_index_append,
        ann_index_build,
        ann_index_compact,
        ann_index_search,
    )
    from schemamap_spark.operators.similarity import cosine_topk
    from schemamap_spark.session import get_spark

    spark = get_spark("ann-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    base = "/tmp/ann_scale_probe"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    idx = os.path.join(base, "index")

    emb = spark.createDataFrame(make_corpus(N, seed=7)).repartition(32).cache()
    emb.count()
    q = emb.limit(N_Q).cache()
    q.count()

    t0 = time.monotonic()
    # explicitly the SAMPLED router: this store is the baseline leg of the
    # sampled-vs-kmeans grid below (the build default flipped to kmeans in r8)
    ann_index_build(
        emb, idx, m=16, k_per_sub=64, num_centroids=64, sample=8192,
        centroids="sample",
    )
    t_build = time.monotonic() - t0

    t_append = 0.0
    for j in range(4):
        batch = spark.createDataFrame(
            make_corpus(N_APPEND // 4, seed=8 + j, id_base=N + j * (N_APPEND // 4))
        )
        t0 = time.monotonic()
        ann_index_append(batch, idx)
        t_append += time.monotonic() - t0

    t0 = time.monotonic()
    folded = ann_index_compact(spark, idx)
    t_compact = time.monotonic() - t0

    t0 = time.monotonic()
    exact = cosine_topk(emb, q, k=K, method="matmul").cache()
    n_exact = exact.count()
    t_exact = time.monotonic() - t0
    truth = {
        (r.query_id, r.neighbor_id) for r in exact.collect()
    }

    def recall(df):
        got = {(r.query_id, r.neighbor_id) for r in df.collect()}
        return len(got & truth) / len(truth)

    grid = [(4, 0), (8, 0), (16, 0), (8, 4), (8, 16), (16, 16), (32, 16)]

    def sweep(index_dir):
        out = []
        for nprobe, rerank in grid:
            t0 = time.monotonic()
            res = ann_index_search(
                spark, index_dir, q, k=K, nprobe=nprobe, rerank=rerank,
                vectors=emb if rerank else None,
            ).cache()
            res.count()
            dt = time.monotonic() - t0
            out.append((nprobe, rerank, dt, recall(res)))
            res.unpersist()
        return out

    results = sweep(idx)

    # second store, identical PQ params, trained coarse router
    idx_km = os.path.join(base, "index_kmeans")
    t0 = time.monotonic()
    ann_index_build(
        emb, idx_km, m=16, k_per_sub=64, num_centroids=64, sample=8192,
        centroids="kmeans",
    )
    t_build_km = time.monotonic() - t0
    results_km = sweep(idx_km)

    store_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(idx) for f in fs
    )
    raw_bytes = (N + N_APPEND) * DIMS * 8

    print("\n=== ANN index store probe ===")
    print(f"corpus {N:,} + append {N_APPEND:,}  x {DIMS} dims, "
          f"{CLUSTERS} clusters; {N_Q} queries, k={K}")
    print(f"build  (train+encode+swap): {t_build:.1f}s")
    print(f"append ({N_APPEND:,} rows, 4 batches): {t_append:.1f}s")
    print(f"compact ({folded} batches -> 1):   {t_compact:.1f}s")
    print(f"exact brute force (matmul): {t_exact:.1f}s  ({n_exact} rows)")
    print(f"kmeans-router build: {t_build_km:.1f}s (sampled build {t_build:.1f}s)")
    print(f"{'config':24s} {'sampled':>16s} {'kmeans':>16s}")
    for (nprobe, rerank, dt, r), (_, _, dtk, rk) in zip(results, results_km):
        tag = f"nprobe={nprobe}" + (f" rerank={rerank}x" if rerank else "")
        print(f"search {tag:17s} {dt:5.1f}s r@{K} {r:.3f}   "
              f"{dtk:5.1f}s r@{K} {rk:.3f}")
    print(f"store size: {store_bytes/1e6:.1f} MB vs raw {raw_bytes/1e6:.1f} MB "
          f"({raw_bytes/store_bytes:.1f}x compression)")


if __name__ == "__main__":
    main()
