"""Persisted ANN index store: build/search equals the direct operator,
append equals one-shot encoding, meta-loudness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schemamap_spark.catalog.fixture import DEFAULT_FIXTURE_DIR
from schemamap_spark.operators.ann_index import (
    ann_index_append,
    ann_index_build,
    ann_index_search,
)
from schemamap_spark.operators.embeddings import (
    ivf_centroids,
    ivf_pq_encode,
    ivf_pq_search_encoded,
    pq_train,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(
        f"{DEFAULT_FIXTURE_DIR}/clustered_embeddings.parquet"
    ).persist()


def _q(emb):
    return emb.filter(F.col("vec_id") % 97 == 0)


def test_build_search_equals_direct_operator(spark, emb, tmp_path):
    idx = str(tmp_path / "idx")
    ann_index_build(emb, idx, m=8, num_centroids=16)
    got = ann_index_search(spark, idx, _q(emb), k=5, nprobe=4).collect()

    books = pq_train(emb, m=8)
    cents = ivf_centroids(emb, 16)
    direct = ivf_pq_search_encoded(
        ivf_pq_encode(emb, books, cents), _q(emb), books, cents, k=5, nprobe=4
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, direct))
    assert len(got) > 0


def test_append_equals_one_shot_encoding(spark, emb, tmp_path):
    """build(b1) + append(b2) must search identically to encoding b1∪b2
    with b1's models in one shot — the append-consistency contract."""
    idx = str(tmp_path / "idx2")
    b1 = emb.filter(F.col("vec_id") % 2 == 0)
    b2 = emb.filter(F.col("vec_id") % 2 == 1)
    ann_index_build(b1, idx, m=8, num_centroids=16)
    ann_index_append(b2, idx)
    got = ann_index_search(spark, idx, _q(emb), k=5, nprobe=4).collect()

    books = pq_train(b1, m=8)
    cents = ivf_centroids(b1, 16)
    direct = ivf_pq_search_encoded(
        ivf_pq_encode(emb, books, cents), _q(emb), books, cents, k=5, nprobe=4
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, direct))


def test_rerank_needs_vectors_and_improves(spark, emb, tmp_path):
    idx = str(tmp_path / "idx3")
    ann_index_build(emb, idx, m=8, num_centroids=16)
    with pytest.raises(ValueError, match="vectors"):
        ann_index_search(spark, idx, _q(emb), k=5, rerank=3)
    rr = ann_index_search(spark, idx, _q(emb), k=5, nprobe=4, rerank=3, vectors=emb)
    assert rr.count() > 0
    # reranked sims are exact cosines: every sim within [-1, 1]
    assert rr.filter(~F.col("cosine_sim").between(-1.0, 1.0)).count() == 0


def test_missing_index_is_loud(spark, emb, tmp_path):
    with pytest.raises(ValueError, match="no ANN index"):
        ann_index_search(spark, str(tmp_path / "nope"), _q(emb))


def test_rebuild_is_atomic_and_self_consistent(spark, emb, tmp_path):
    """A REBUILD over an existing index swaps codes+meta together: after
    rebuilding on a different corpus slice, search still equals the direct
    operator for the new build (no old-meta/new-codes pairing), and no
    half-built temp dirs leak."""
    import os

    idx = str(tmp_path / "idx_rb")
    ann_index_build(emb, idx, m=8, num_centroids=16)
    half = emb.filter(F.col("vec_id") % 2 == 0)
    ann_index_build(half, idx, m=8, num_centroids=8)
    got = ann_index_search(spark, idx, _q(emb), k=5, nprobe=8).collect()
    books = pq_train(half, m=8)
    cents = ivf_centroids(half, 8)
    direct = ivf_pq_search_encoded(
        ivf_pq_encode(half, books, cents), _q(emb), books, cents, k=5, nprobe=8
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, direct))
    leftovers = [d for d in os.listdir(str(tmp_path)) if d.startswith(".index_new_")]
    assert leftovers == []
