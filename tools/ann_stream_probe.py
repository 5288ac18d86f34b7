"""Streaming ANN ingest at probe scale — completes the store-twin probe
trilogy (dedup gate 500k, rollup store 2M, and now the ANN store): how
fast does ann_ingest_stream encode+commit vectors into a seed-built
IVF-PQ store, and does the token-based exactly-once hold?

Shape: seed-build on N_SEED vectors, stage N_STREAM more as parquet,
drain availableNow with small file triggers (several real micro-batches,
each an encode pass + one atomic manifest commit). Verify:
  - store contents == one batch append of the same vectors (search
    equality over N_Q queries)
  - crash-replay: re-appending with a token the stream already committed
    (what a post-crash restart of the SAME checkpoint carries) no-ops —
    the manifest-committed tokens, not the checkpoint, carry exactly-once

Run:  python tools/ann_stream_probe.py [N_STREAM]   (default 100,000)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_STREAM = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
N_SEED, DIMS, CLUSTERS, N_Q, K, FILES = 100_000, 64, 50, 50, 10, 8


def make_corpus(n, seed, id_base=0):
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(seed)
    cents = rng.randn(CLUSTERS, DIMS)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    assign = rng.randint(0, CLUSTERS, size=n)
    v = cents[assign] + 0.35 * rng.randn(n, DIMS)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pd.DataFrame(
        {"vec_id": list(range(id_base, id_base + n)),
         "embedding": list(v.astype(np.float64))}
    )


def main() -> None:
    import json

    from schemamap_spark.operators.ann_index import (
        ann_index_append,
        ann_index_build,
        ann_index_search,
    )
    from schemamap_spark.session import get_spark
    from schemamap_spark.streaming import ann_ingest_stream

    spark = get_spark("ann-stream-probe")
    spark.sparkContext.setLogLevel("ERROR")

    base = "/tmp/ann_stream_probe"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    idx, idx_batch = os.path.join(base, "idx"), os.path.join(base, "idx_batch")
    src = os.path.join(base, "src")

    seed = spark.createDataFrame(make_corpus(N_SEED, seed=7)).repartition(16).cache()
    seed.count()
    incoming = spark.createDataFrame(make_corpus(N_STREAM, seed=9, id_base=N_SEED))
    incoming.repartition(FILES).write.mode("overwrite").parquet(src)
    q = seed.limit(N_Q).cache()
    q.count()

    ann_index_build(seed, idx, m=16, k_per_sub=64, num_centroids=64, sample=8192)
    shutil.copytree(idx, idx_batch)

    stream = (
        spark.readStream.schema(incoming.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    t0 = time.monotonic()
    ann_ingest_stream(stream, idx, os.path.join(base, "ckpt")).awaitTermination()
    t_stream = time.monotonic() - t0

    # batch twin on the copied store
    t0 = time.monotonic()
    ann_index_append(spark.read.parquet(src), idx_batch)
    t_batch = time.monotonic() - t0

    got = sorted(map(tuple, ann_index_search(spark, idx, q, k=K, nprobe=8).collect()))
    want = sorted(
        map(tuple, ann_index_search(spark, idx_batch, q, k=K, nprobe=8).collect())
    )

    with open(os.path.join(idx, "manifest.json")) as f:
        manifest = json.load(f)
    dirs_before = [d["name"] for d in manifest["dirs"]]
    tokens = [d["batch_token"] for d in manifest["dirs"] if "batch_token" in d]
    t0 = time.monotonic()
    replay_appended = ann_index_append(
        spark.read.parquet(src), idx, batch_token=tokens[0]
    )
    t_replay = time.monotonic() - t0
    with open(os.path.join(idx, "manifest.json")) as f:
        dirs_after = [d["name"] for d in json.load(f)["dirs"]]

    n_batches = len(dirs_before) - 1  # minus the build codes dir
    print("\n=== streaming ANN ingest probe ===")
    print(f"seed {N_SEED:,} + stream {N_STREAM:,} x {DIMS} dims, "
          f"{FILES} files, 2-file triggers -> {n_batches} micro-batches")
    print(f"streaming ingest: {t_stream:.1f}s "
          f"({N_STREAM / t_stream / 1000:.0f}k vectors/s encode+commit)")
    print(f"single batch append of the same vectors: {t_batch:.1f}s")
    print(f"stream == batch-append search results: {got == want} "
          f"({len(got)} rows)")
    print(f"committed-token replay: no-op in {t_replay:.2f}s, "
          f"manifest unchanged: {dirs_after == dirs_before}")
    if got != want or dirs_after != dirs_before or replay_appended:
        raise SystemExit("PROBE FAILED")


if __name__ == "__main__":
    main()
