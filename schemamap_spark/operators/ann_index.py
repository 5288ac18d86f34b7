"""Persisted IVF-PQ ANN index store — build once, append daily, search always.

The third daily-ingest store next to the dedup fingerprint store and the
sketch/stats stores: at 100 TB the embedding corpus cannot be re-encoded
per query session. The index is three artifacts under one directory:

- `codes/` + `batch_*/`  — parquet (id, cell, codes): ~m bytes + 4 per
  vector; `codes/` from the build, one `batch_*` dir per committed append
- `manifest.json` — the list of COMMITTED code dirs (plus each batch's
  per-cell occupancy). Readers resolve the store through the manifest, so
  a half-written append (crash, concurrent reader) is simply invisible
  until its single atomic manifest rewrite lands — the same
  write-new/rename commit discipline as the build's directory swap.
- `meta.json` — codebooks + coarse centroids + params + the BUILD's
  per-cell occupancy (the trained distribution), written once at build.

Append-consistency is structural: ivf_pq_encode is a pure function of
(vectors, codebooks, centroids), so a batch encoded tomorrow lands in the
same cells with the same codes as if it had been in the build — pinned by
test (build(b1)+append(b2) == one-shot encode over b1∪b2). The trade is
also the honest one: codebooks/centroids are trained on the FIRST build's
distribution; drift is now MEASURED, not hoped about — every append
records its cell occupancy, `ann_index_drift` reports the total-variation
distance between the appended mass and the trained distribution, and
search warns past `drift_warn` (re-build is cheap: one encode pass).

Search loads meta (driver, bounded) and runs ivf_pq_search_encoded over the
manifested code dirs — the stacked-ADC scorer, reading ~nprobe/C of the
store.

Filesystem contract: store paths are DRIVER-LOCAL (os.path / os.rename
commit semantics). Non-local schemes raise loudly up front rather than
corrupting silently; deploying against S3/HDFS means routing these few
calls through the warehouse's FS layer (see sources/sinks.py, same
contract).
"""

from __future__ import annotations

import json
import os
import tempfile
import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from schemamap_spark.operators.embeddings import (
    ivf_centroids,
    ivf_pq_encode,
    ivf_pq_search_encoded,
    pq_train,
)

_META = "meta.json"
_MANIFEST = "manifest.json"
_CODES = "codes"


def _require_local(path: str, op: str) -> None:
    """The store's commit protocol is os.rename — atomic only on a local
    posix filesystem. Refuse URI schemes loudly instead of writing a store
    whose crash-safety contract silently doesn't hold."""
    if "://" in path:
        raise ValueError(
            f"{op} requires a driver-local path (os.rename commit protocol); "
            f"got scheme path {path!r}. Route through a local staging dir or "
            "port the commit to your object store's rename/manifest API."
        )


def _cell_occupancy(spark: SparkSession, codes_dir: str) -> dict[str, int]:
    """Per-cell row counts of one committed code dir — num_centroids rows,
    read back column-pruned from the just-written parquet (cheaper than
    re-encoding, and it counts what is actually on disk)."""
    rows = (
        spark.read.parquet(codes_dir).groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
    ).collect()
    return {str(r["cell"]): r["n"] for r in rows}


def _coarse_centroids(
    emb: DataFrame,
    num_centroids: int,
    id_col: str,
    vec_col: str,
    method: str,
) -> list:
    """Coarse-router training. 'sample': the deterministic hash-ordered
    sample (cheap, one bounded collect). 'kmeans': Spark ML k-means
    (clustering.kmeans_fit — the same router ivf_topk(centroids='kmeans')
    uses), centers L2-normalized because cell assignment is argmax of the
    dot against UNIT corpus vectors (ivf_pq_encode) — unnormalized centers
    would bias routing toward long centroids instead of nearest-by-cosine.
    On clustered corpora sampled centroids are what make routing miss
    cells (the 220k probe: routing, not PQ resolution, binds recall);
    k-means costs one extra training pass at build time only — appends and
    searches just read the recorded centers."""
    if method == "kmeans":
        import numpy as np

        from schemamap_spark.operators.clustering import kmeans_fit

        model = kmeans_fit(emb, k=num_centroids, vec_col=vec_col)
        C = np.array(
            [np.asarray(c, dtype=np.float64) for c in model.clusterCenters()]
        )
        C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        return [[float(x) for x in c] for c in C]
    if method == "sample":
        return ivf_centroids(emb, num_centroids, id_col, vec_col)
    raise ValueError(f"unknown centroids method {method!r} (use 'sample' or 'kmeans')")


def ann_index_build(
    emb: DataFrame,
    index_dir: str,
    m: int = 8,
    k_per_sub: int = 64,
    num_centroids: int = 16,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: str = "sample",
) -> None:
    """Train codebooks + coarse centroids on `emb`, encode it, persist the
    store. The WHOLE index (codes + manifest + meta) builds in a temp dir
    and swaps into place atomically (the warehouse _swap_into_place
    recipe), so a crashed or concurrent REBUILD can never pair old
    codebooks with new codes — readers see the previous complete index
    until the swap. The build's per-cell occupancy is recorded in meta as
    the trained distribution that appends are measured against.

    centroids='kmeans' trains the coarse router with k-means instead of
    the deterministic sample — measurably better cell routing on
    clustered corpora (SCALE.md 'ANN store probe', 220k mixture corpus:
    recall@10 at nprobe=16+rerank 0.626→0.747 sampled→kmeans; the trained
    router reaches at nprobe=16 what the sampled one needs nprobe=32 for)
    at the cost of one extra training pass at build time (9.1s→11.3s at
    220k×64d). Appends/searches are router-agnostic: they read whatever
    centers the build recorded."""
    from schemamap_spark.sources.sinks import _swap_into_place

    _require_local(index_dir, "ann_index_build")
    spark = emb.sparkSession
    books = pq_train(emb, vec_col, id_col, m, k_per_sub, sample)
    cents = _coarse_centroids(emb, num_centroids, id_col, vec_col, centroids)
    encoded = ivf_pq_encode(emb, books, cents, id_col, vec_col)
    parent = os.path.dirname(os.path.abspath(index_dir))
    os.makedirs(parent, exist_ok=True)
    tmp_dir = tempfile.mkdtemp(dir=parent, prefix=".index_new_")
    codes_tmp = os.path.join(tmp_dir, _CODES)
    encoded.write.mode("overwrite").parquet(codes_tmp)
    meta = {
        "codebooks": books,
        "centroids": cents,
        "m": m,
        "k_per_sub": k_per_sub,
        "num_centroids": num_centroids,
        "coarse_router": centroids,
        "id_col": id_col,
        "vec_col": vec_col,
        "cell_occupancy": _cell_occupancy(spark, codes_tmp),
    }
    with open(os.path.join(tmp_dir, _META), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(tmp_dir, _MANIFEST), "w") as f:
        json.dump({"dirs": [{"name": _CODES}]}, f)
    _swap_into_place(tmp_dir, index_dir)


def _load_meta(index_dir: str) -> dict:
    path = os.path.join(index_dir, _META)
    if not os.path.exists(path):
        raise ValueError(f"no ANN index at {index_dir} (missing {_META})")
    with open(path) as f:
        return json.load(f)


def _load_manifest(index_dir: str) -> dict:
    path = os.path.join(index_dir, _MANIFEST)
    if not os.path.exists(path):
        # pre-manifest store (or hand-built): the build dir is the store
        return {"dirs": [{"name": _CODES}]}
    with open(path) as f:
        return json.load(f)


def _commit_manifest(index_dir: str, manifest: dict) -> None:
    """Single-file atomic commit: write-next + os.replace. A reader opening
    the manifest concurrently sees either the old or the new complete list,
    never a torn write."""
    path = os.path.join(index_dir, _MANIFEST)
    fd, tmp = tempfile.mkstemp(dir=index_dir, prefix=".manifest_")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def ann_index_append(emb: DataFrame, index_dir: str) -> None:
    """Encode a NEW batch with the index's existing models and append its
    codes — the daily-ingest path: one narrow encode pass over the batch,
    no retraining, no touch of existing codes. Crash/reader-safe: the
    batch writes to a hidden temp dir, renames to its final name, and only
    then joins the manifest in one atomic rewrite — a crash at any earlier
    point leaves an orphan `.batch_*`/uncommitted dir that no reader ever
    consults. Each committed batch records its per-cell occupancy so drift
    from the trained distribution is measurable (ann_index_drift).
    (Re-appending the same ids is the caller's dedup problem — run the
    batch through incremental_exact_dedup first, the stores compose.)"""
    _require_local(index_dir, "ann_index_append")
    meta = _load_meta(index_dir)
    spark = emb.sparkSession
    encoded = ivf_pq_encode(
        emb, meta["codebooks"], meta["centroids"], meta["id_col"], meta["vec_col"]
    )
    tmp_dir = tempfile.mkdtemp(dir=index_dir, prefix=".batch_")
    encoded.write.mode("overwrite").parquet(tmp_dir)
    occupancy = _cell_occupancy(spark, tmp_dir)
    final_name = "batch_" + os.path.basename(tmp_dir)[len(".batch_"):]
    os.rename(tmp_dir, os.path.join(index_dir, final_name))
    manifest = _load_manifest(index_dir)
    manifest["dirs"].append({"name": final_name, "occupancy": occupancy})
    _commit_manifest(index_dir, manifest)


def ann_index_drift(index_dir: str) -> float:
    """Total-variation distance between the TRAINED cell distribution (the
    build's occupancy, meta.json) and the cell distribution of everything
    APPENDED since — 0.0 when appends mirror the build (or nothing was
    appended), 1.0 when all appended mass lands in cells the build never
    saw. Pure manifest/meta arithmetic: no Spark, no scan. Past ~0.25 the
    coarse router is quantizing a distribution it wasn't trained on and a
    re-build (one encode pass) is warranted."""
    meta = _load_meta(index_dir)
    build_occ = meta.get("cell_occupancy")
    if not build_occ:
        return 0.0  # pre-drift-tracking store: nothing to compare
    appended: dict[str, int] = {}
    for entry in _load_manifest(index_dir)["dirs"]:
        if entry["name"] == _CODES:
            continue
        for cell, n in entry.get("occupancy", {}).items():
            appended[cell] = appended.get(cell, 0) + n
    total_a = sum(appended.values())
    if total_a == 0:
        return 0.0
    total_b = sum(build_occ.values()) or 1
    cells = set(build_occ) | set(appended)
    return 0.5 * sum(
        abs(build_occ.get(c, 0) / total_b - appended.get(c, 0) / total_a)
        for c in cells
    )


def ann_index_search(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    rerank: int = 0,
    vectors: DataFrame | None = None,
    drift_warn: float = 0.25,
) -> DataFrame:
    """Top-k over the persisted store. rerank=R re-scores the top R·k with
    exact cosine and needs the raw `vectors` frame (the embedding source
    the index was built from). Reads ONLY manifest-committed code dirs —
    a concurrently-running or crashed append is invisible. Warns (does not
    fail) when the appended cell occupancy has drifted more than
    `drift_warn` TV-distance from the trained distribution; None disables
    the check."""
    meta = _load_meta(index_dir)
    if drift_warn is not None:
        drift = ann_index_drift(index_dir)
        if drift > drift_warn:
            warnings.warn(
                f"ANN index at {index_dir}: appended vectors' cell occupancy "
                f"has drifted {drift:.2f} TV-distance from the trained "
                f"distribution (threshold {drift_warn}) — recall degrades on "
                "out-of-distribution cells; re-run ann_index_build.",
                stacklevel=2,
            )
    paths = [
        os.path.join(index_dir, d["name"]) for d in _load_manifest(index_dir)["dirs"]
    ]
    codes = spark.read.parquet(*paths)
    return ivf_pq_search_encoded(
        codes, queries, meta["codebooks"], meta["centroids"],
        k, nprobe, rerank, vectors,
        id_col=meta["id_col"], vec_col=meta["vec_col"],
    )


def ann_index_compact(spark: SparkSession, index_dir: str) -> int:
    """Fold all committed APPEND batches into one code dir — the store's
    small-file debt collector: after N daily appends every search opens
    N+1 parquet dirs; compaction returns that to 2 (build codes + one
    compacted batch dir) without touching the build codes or the drift
    accounting (the compacted entry carries the SUM of the folded batches'
    occupancies, so ann_index_drift reports exactly what it did before —
    folding appended rows into `codes/` instead would misfile them as
    trained mass). Returns the number of batch dirs folded (0 = no-op).

    Crash contract mirrors append: the union writes to a hidden temp dir,
    renames, and publishes via one atomic manifest rewrite; the superseded
    batch dirs are deleted only AFTER the commit, so a crash at any point
    leaves either the old manifest (old dirs intact) or the new one
    (orphan old dirs that no reader consults). Single-writer, like every
    store in the repo.

    Reader race, stated honestly: a search that loaded the OLD manifest
    just before the commit can hit deleted batch dirs and FAIL LOUDLY
    (never read wrong data) — the classic compactor-vs-reader window every
    rename-based store has. Run compaction off the query path, or retry
    the search; a grace-period delete (keep superseded dirs for N minutes)
    is the standard production extension if retries are unacceptable."""
    import shutil

    _require_local(index_dir, "ann_index_compact")
    manifest = _load_manifest(index_dir)
    batches = [d for d in manifest["dirs"] if d["name"] != _CODES]
    if len(batches) < 2:
        return 0
    paths = [os.path.join(index_dir, d["name"]) for d in batches]
    tmp_dir = tempfile.mkdtemp(dir=index_dir, prefix=".batch_")
    spark.read.parquet(*paths).write.mode("overwrite").parquet(tmp_dir)
    occupancy: dict[str, int] = {}
    for d in batches:
        for cell, n in d.get("occupancy", {}).items():
            occupancy[cell] = occupancy.get(cell, 0) + n
    final_name = "batch_" + os.path.basename(tmp_dir)[len(".batch_"):]
    os.rename(tmp_dir, os.path.join(index_dir, final_name))
    keep = [d for d in manifest["dirs"] if d["name"] == _CODES]
    _commit_manifest(
        index_dir,
        {**manifest, "dirs": keep + [{"name": final_name, "occupancy": occupancy}]},
    )
    for p in paths:
        shutil.rmtree(p, ignore_errors=True)
    return len(batches)
