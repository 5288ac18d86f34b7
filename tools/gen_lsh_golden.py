"""Regenerate the hyperplane-LSH bucket golden fixture.

lsh_topk's bucket assignment derives from Spark's xxhash64 (the hyperplane
weights), which has no portable SQL twin — the same situation as the SimHash
fingerprints. The engine's bucket ids over the driver's sf0.01 embeddings
table (8 planes, 64 dims — the ann_lsh_cosine suite parameters) are committed
as a parquet golden; the oracle joins the golden buckets and recomputes the
candidate cosine scores + top-k ranking in DuckDB, so the driver's value hash
pins both the bucketing (any change to the weight derivation or projection
fold diverges from the golden) and the same-bucket top-k scoring logic.

Run: python tools/gen_lsh_golden.py
(deterministic — regeneration should be a no-op diff unless the bucketing
algorithm or the driver testdata changed)
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(ROOT, "fixtures", "lsh_buckets_sf0_01.parquet")
NUM_PLANES = 8  # must match suite/llm.py ann_lsh_cosine
DIMS = 64


def main() -> None:
    import pandas as pd
    from pyspark.sql import functions as F

    from schemamap_spark.operators.similarity import _bucket_col, _plane_weights
    from schemamap_spark.session import get_spark, load_table

    spark = get_spark("gen-lsh-golden", shuffle_partitions=8)
    emb = load_table(spark, SF_DIR, "embeddings")
    weights = _plane_weights(spark, NUM_PLANES, DIMS)
    wdf = F.broadcast(spark.createDataFrame([(weights,)], "W array<array<double>>"))
    rows = (
        emb.crossJoin(wdf)
        .select("vec_id", _bucket_col(F.col("embedding"), F.col("W")).alias("bucket"))
        .orderBy("vec_id")
        .collect()
    )
    pdf = pd.DataFrame(
        {"vec_id": [r.vec_id for r in rows], "bucket": [r.bucket for r in rows]}
    ).astype({"vec_id": "int64", "bucket": "int64"})
    pdf.to_parquet(OUT, index=False)
    print(f"wrote {OUT}: {len(pdf)} bucket assignments")


if __name__ == "__main__":
    main()
