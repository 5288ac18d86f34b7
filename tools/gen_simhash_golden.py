"""Regenerate the SimHash golden fixture.

SimHash fingerprints are built from Spark's xxhash64, which has no portable
SQL twin — a recomputing DuckDB oracle is impossible. Instead the engine's
own fingerprints over the driver's sf0.01 documents table are committed as a
parquet golden; the dedup_simhash oracle brute-forces Hamming-distance pairs
FROM THE GOLDEN (bit_count(xor(...)) in DuckDB), so the driver's value hash
now pins both the fingerprint values (any change to shingling/hashing/voting
diverges from the golden) and the banding candidate logic (pigeonhole chunks
must recover exactly the brute-force pair set).

Run: python tools/gen_simhash_golden.py
(deterministic — regeneration should be a no-op diff unless the fingerprint
algorithm or the driver testdata changed)
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(ROOT, "fixtures", "simhash_sf0_01.parquet")
SHINGLE_K = 3  # must match suite/llm.py _SHINGLE_K


def main() -> None:
    import pandas as pd

    from schemamap_spark.operators.dedup import simhash_fingerprints
    from schemamap_spark.session import get_spark, load_table

    spark = get_spark("gen-simhash-golden", shuffle_partitions=8)
    docs = load_table(spark, SF_DIR, "documents")
    rows = simhash_fingerprints(docs, k=SHINGLE_K).orderBy("doc_id").collect()
    pdf = pd.DataFrame(
        {"doc_id": [r.doc_id for r in rows], "simhash": [r.simhash for r in rows]}
    ).astype({"doc_id": "int64", "simhash": "int64"})
    pdf.to_parquet(OUT, index=False)
    print(f"wrote {OUT}: {len(pdf)} fingerprints")


if __name__ == "__main__":
    main()
