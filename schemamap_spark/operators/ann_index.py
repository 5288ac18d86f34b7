"""Persisted IVF-PQ ANN index store — build once, append daily, search always.

The third daily-ingest store next to the dedup fingerprint store and the
sketch/stats stores: at 100 TB the embedding corpus cannot be re-encoded
per query session. The index is two artifacts under one directory:

- `codes/`  — parquet (id, cell, codes): ~m bytes + 4 per vector, appendable
- `meta.json` — codebooks + coarse centroids + params: a few hundred KB of
  plain data, written once at build time

Append-consistency is structural: ivf_pq_encode is a pure function of
(vectors, codebooks, centroids), so a batch encoded tomorrow lands in the
same cells with the same codes as if it had been in the build — pinned by
test (build(b1)+append(b2) == one-shot encode over b1∪b2). The trade is
also the honest one: codebooks/centroids are trained on the FIRST build's
distribution; re-build (cheap: one encode pass) when the corpus drifts.

Search loads meta (driver, bounded) and runs ivf_pq_search_encoded over the
codes parquet — the stacked-ADC scorer, reading ~nprobe/C of the store.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from schemamap_spark.operators.embeddings import (
    ivf_centroids,
    ivf_pq_encode,
    ivf_pq_search_encoded,
    pq_train,
)

_META = "meta.json"
_CODES = "codes"


def ann_index_build(
    emb: DataFrame,
    index_dir: str,
    m: int = 8,
    k_per_sub: int = 64,
    num_centroids: int = 16,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Train codebooks + coarse centroids on `emb`, encode it, persist the
    store. The WHOLE index (codes + meta) builds in a temp dir and swaps
    into place atomically (the warehouse _swap_into_place recipe), so a
    crashed or concurrent REBUILD can never pair old codebooks with new
    codes — readers see the previous complete index until the swap."""
    from schemamap_spark.sources.sinks import _swap_into_place

    books = pq_train(emb, vec_col, id_col, m, k_per_sub, sample)
    cents = ivf_centroids(emb, num_centroids, id_col, vec_col)
    encoded = ivf_pq_encode(emb, books, cents, id_col, vec_col)
    parent = os.path.dirname(os.path.abspath(index_dir))
    os.makedirs(parent, exist_ok=True)
    tmp_dir = tempfile.mkdtemp(dir=parent, prefix=".index_new_")
    encoded.write.mode("overwrite").parquet(os.path.join(tmp_dir, _CODES))
    meta = {
        "codebooks": books,
        "centroids": cents,
        "m": m,
        "k_per_sub": k_per_sub,
        "num_centroids": num_centroids,
        "id_col": id_col,
        "vec_col": vec_col,
    }
    with open(os.path.join(tmp_dir, _META), "w") as f:
        json.dump(meta, f)
    _swap_into_place(tmp_dir, index_dir)


def _load_meta(index_dir: str) -> dict:
    path = os.path.join(index_dir, _META)
    if not os.path.exists(path):
        raise ValueError(f"no ANN index at {index_dir} (missing {_META})")
    with open(path) as f:
        return json.load(f)


def ann_index_append(emb: DataFrame, index_dir: str) -> None:
    """Encode a NEW batch with the index's existing models and append its
    codes — the daily-ingest path: one narrow encode pass over the batch,
    no retraining, no touch of existing codes. (Re-appending the same ids
    is the caller's dedup problem — run the batch through
    incremental_exact_dedup first, the stores compose.)"""
    meta = _load_meta(index_dir)
    encoded = ivf_pq_encode(
        emb, meta["codebooks"], meta["centroids"], meta["id_col"], meta["vec_col"]
    )
    encoded.write.mode("append").parquet(os.path.join(index_dir, _CODES))


def ann_index_search(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    rerank: int = 0,
    vectors: DataFrame | None = None,
) -> DataFrame:
    """Top-k over the persisted store. rerank=R re-scores the top R·k with
    exact cosine and needs the raw `vectors` frame (the embedding source
    the index was built from)."""
    meta = _load_meta(index_dir)
    codes = spark.read.parquet(os.path.join(index_dir, _CODES))
    return ivf_pq_search_encoded(
        codes, queries, meta["codebooks"], meta["centroids"],
        k, nprobe, rerank, vectors,
        id_col=meta["id_col"], vec_col=meta["vec_col"],
    )
