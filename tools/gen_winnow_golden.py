"""Regenerate the winnowing-fingerprint golden fixture.

winnow_fingerprints selects each w-window's MINIMUM xxhash64 value, so the
SELECTED fingerprint set depends on the hash function itself — no portable
SQL twin (the same situation as the SimHash/LSH goldens). The engine's
fingerprint rows over the driver's sf0.01 documents table (k=3, w=4 — the
containment suite parameters) are committed as a parquet golden; the oracle
computes sizes, the max_df stop-fingerprint filter, the i≠j shared counts,
and the containment ratio from the golden in DuckDB, so the driver's value
hash pins both the winnowing output (any change to hashing/window-min
diverges from the golden) and the containment arithmetic.

Run: python tools/gen_winnow_golden.py
(deterministic — regeneration should be a no-op diff unless the winnowing
algorithm or the driver testdata changed)
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(ROOT, "fixtures", "winnow_fps_sf0_01.parquet")
K = 3  # must match suite/extra.py containment_winnow
W = 4


def main() -> None:
    import pandas as pd
    from pyspark.sql import functions as F

    from schemamap_spark.operators.dedup import winnow_fingerprints
    from schemamap_spark.session import get_spark, load_table

    spark = get_spark("gen-winnow-golden", shuffle_partitions=8)
    docs = load_table(spark, SF_DIR, "documents")
    rows = (
        winnow_fingerprints(docs, K, W)
        .select("doc_id", F.explode("fingerprints").alias("f"))
        .orderBy("doc_id", "f")
        .collect()
    )
    pdf = pd.DataFrame(
        {"doc_id": [r.doc_id for r in rows], "f": [r.f for r in rows]}
    ).astype({"doc_id": "int64", "f": "int64"})
    pdf.to_parquet(OUT, index=False)
    print(f"wrote {OUT}: {len(pdf)} fingerprint rows")


if __name__ == "__main__":
    main()
