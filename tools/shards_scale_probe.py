"""Training-shard export at 1M synthetic documents — wall, balance, and
reproducibility evidence for sources/shards.write_training_shards.

Generates 1M (doc_id, text≈200B, n_tokens) rows all-JVM, exports them into
SHARDS shards twice, and checks the claims that matter at 100 TB:
- wall is ONE shuffle + a within-partition sort (no global sort): reported
  as docs/s and bytes/s;
- balance: max/min shard row counts (multinomial around N/SHARDS);
- reproducibility: the two exports' manifests are IDENTICAL, and one
  spot-checked shard has byte-equal row ORDER across exports;
- the manifest's totals equal the corpus exactly.

Run:  python tools/shards_scale_probe.py [N] [SHARDS]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
SHARDS = int(sys.argv[2]) if len(sys.argv) > 2 else 64


def main() -> None:
    from pyspark.sql import functions as F

    from schemamap_spark.session import get_spark
    from schemamap_spark.sources.shards import write_training_shards

    spark = get_spark("shards-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = (
        spark.range(N)
        .repartition(32)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("doc "),
                F.repeat(F.md5(F.col("id").cast("string")), 6),
            ).alias("text"),
            (F.lit(32) + F.pmod(F.xxhash64("id"), F.lit(512))).cast("long")
            .alias("n_tokens"),
        )
        .persist()
    )
    n_bytes = docs.agg(F.sum(F.length("text"))).first()[0]

    base = "/tmp/shards_scale_probe"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)

    walls = []
    for run in (1, 2):
        t0 = time.monotonic()
        write_training_shards(
            docs, f"{base}/exp{run}", SHARDS, token_col="n_tokens"
        )
        walls.append(time.monotonic() - t0)

    m1 = json.loads(open(f"{base}/exp1/_SHARDS.json").read())
    m2 = json.loads(open(f"{base}/exp2/_SHARDS.json").read())
    sizes = [s["rows"] for s in m1["shards"]]
    tokens = sum(s["tokens"] for s in m1["shards"])
    expect_tokens = docs.agg(F.sum("n_tokens")).first()[0]

    k = max(range(SHARDS), key=lambda i: sizes[i])
    r1 = spark.read.parquet(f"{base}/exp1/shard={k}").collect()
    r2 = spark.read.parquet(f"{base}/exp2/shard={k}").collect()

    print("\n=== training-shard export probe ===")
    print(f"{N:,} docs ({n_bytes/1e6:.0f} MB text) -> {SHARDS} shards")
    print(f"export wall: run1 {walls[0]:.1f}s  run2 {walls[1]:.1f}s "
          f"({N/walls[1]:,.0f} docs/s, {n_bytes/walls[1]/1e6:.0f} MB/s warm)")
    print(f"balance: min {min(sizes):,} max {max(sizes):,} "
          f"(max/min {max(sizes)/min(sizes):.3f})")
    print(f"rows total {sum(sizes):,} (expected {N:,}: {sum(sizes) == N}); "
          f"tokens {tokens:,} (match: {tokens == expect_tokens})")
    print(f"manifests identical: {m1 == m2}")
    print(f"largest shard ({k}: {len(r1):,} rows) byte-equal order across "
          f"exports: {r1 == r2}")

    # r12: the loader-side walk — a full epoch of per-shard pruned reads
    # (the per-yield cost a training worker pays), schedule reproducible,
    # and a 3:1 interleave across both exports holding the deficit
    # invariant at probe scale
    from schemamap_spark.sources.shards import (
        epoch_shard_order,
        interleave_epoch_walks,
        iter_training_epoch,
    )

    t0 = time.monotonic()
    walked = [
        (s, df.count()) for _, s, df in iter_training_epoch(
            spark, f"{base}/exp1", epoch=1
        )
    ]
    walk_wall = time.monotonic() - t0
    walk_rows = sum(c for _, c in walked)
    order_ok = [s for s, _ in walked] == epoch_shard_order(SHARDS, 1)
    print(f"epoch walk: {SHARDS} pruned reads in {walk_wall:.1f}s "
          f"({walk_wall/SHARDS*1000:.0f} ms/shard), rows {walk_rows:,} "
          f"(match: {walk_rows == N}; schedule reproducible: {order_ok})")

    mix = {"a": (f"{base}/exp1", 3.0), "b": (f"{base}/exp2", 1.0)}
    t0 = time.monotonic()
    seq = [(n_, s) for _, n_, s, _df in interleave_epoch_walks(
        spark, mix, epoch=0, verify=None
    )]
    mix_wall = time.monotonic() - t0
    tok = {n_: {s["shard"]: max(1, s["tokens"]) for s in m["shards"]}
           for n_, m in (("a", m1), ("b", m2))}
    em = {"a": 0, "b": 0}
    rem = {"a": SHARDS, "b": SHARDS}
    deficit_ok = True
    for n_, s in seq:
        live = [x for x in em if rem[x] > 0]
        best = min(em[x] / mix[x][1] for x in live)
        deficit_ok &= em[n_] / mix[n_][1] == best
        em[n_] += tok[n_][s]
        rem[n_] -= 1
    print(f"3:1 interleave: {len(seq)} shards scheduled in {mix_wall:.2f}s; "
          f"deficit invariant at every step: {deficit_ok}")

    ok = (
        sum(sizes) == N
        and tokens == expect_tokens
        and m1 == m2
        and r1 == r2
        and max(sizes) < 1.5 * min(sizes)
        and walk_rows == N
        and order_ok
        and len(seq) == 2 * SHARDS
        and deficit_ok
    )
    print("PASS" if ok else "FAIL")
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
