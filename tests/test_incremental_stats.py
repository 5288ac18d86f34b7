"""Incremental corpus stats: merged partials must agree with the one-shot
batch report — exactly for additive metrics, within known resolution for
the sketched ones."""

from __future__ import annotations

from pyspark.sql import functions as F

from schemamap_spark.operators.curation import (
    append_corpus_stats,
    corpus_report,
    corpus_stats_report,
)
from schemamap_spark.session import load_table

SF = "/root/testdata/sf0.001"


def test_merged_partials_match_full_batch(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    store = str(tmp_path / "stats_store")
    for i in range(3):
        append_corpus_stats(docs.filter(F.col("doc_id") % 3 == i), store, f"day{i}")

    merged = {r.group: r.asDict() for r in corpus_stats_report(spark, store).collect()}
    full = {r.source: r.asDict() for r in corpus_report(docs).collect()}
    assert set(merged) == set(full)
    for g, m in merged.items():
        f = full[g]
        # additive metrics: exact
        assert (m["docs"], m["tokens"], m["chars"]) == (f["docs"], f["tokens"], f["chars"])
        # integer-micros mean vs float avg: micro-rounding only
        assert abs(m["quality_mean"] - f["quality_mean"]) < 1e-5
        # histogram quantile vs approx_percentile: both approximate the same
        # exact percentile; allow 2 bins + sketch slack
        assert abs(m["quality_p50"] - f["quality_p50"]) < 0.01
        # dup ratio stays clamped and sane
        assert 0.0 <= m["approx_dup_ratio"] <= 1.0


def test_sketch_merge_equals_one_shot_ndv(spark, tmp_path):
    """The HLL component must merge exactly: 3-way-split union == single
    sketch over everything (register max is split-insensitive)."""
    docs = load_table(spark, SF, "documents")
    store = str(tmp_path / "s2")
    for i in range(3):
        append_corpus_stats(docs.filter(F.col("doc_id") % 3 == i), store, f"b{i}")
    merged = {
        r.group: r.approx_unique_texts
        for r in corpus_stats_report(spark, store).collect()
    }
    one = {
        r.group: r.ndv
        for r in docs.withColumn("_fp", F.md5(F.lower(F.trim(F.col("text")))))
        .groupBy(F.col("source").alias("group"))
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("_fp")).alias("ndv"))
        .collect()
    }
    assert merged == one


def test_duplicate_injection_moves_the_needle(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    store = str(tmp_path / "s3")
    append_corpus_stats(docs, store, "b0")
    append_corpus_stats(docs, store, "b1")  # the same corpus again: 50% dups
    rep = corpus_stats_report(spark, store).collect()
    for r in rep:
        assert r.approx_dup_ratio > 0.4, r.group
