"""DSIR importance-resampling tests: feature hashing, exact weight math,
planted-distribution selection, and the seeded Gumbel resampler."""

from __future__ import annotations

import hashlib
import math

import pytest

from schemamap_spark.operators.dsir import (
    dsir_resample,
    dsir_select,
    dsir_weights,
    hashed_gram_features,
)


def _py_bucket(gram: str, buckets: int) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % buckets


def _py_grams(text: str) -> list[str]:
    toks = text.split(" ")
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def test_hashed_gram_features_counts(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "")], "doc_id long, text string"
    )
    rows = hashed_gram_features(docs, buckets=64).collect()
    got = {(r.doc_id, r.bucket): r.c for r in rows}
    # doc 1: unigrams a,b,a + bigrams "a b","b a" — counts by python-side hash
    expect: dict[tuple[int, int], int] = {}
    for g in _py_grams("a b a"):
        k = (1, _py_bucket(g, 64))
        expect[k] = expect.get(k, 0) + 1
    # doc 2: split("", " ") == [""] -> one empty-string unigram
    expect[(2, _py_bucket("", 64))] = 1
    assert got == expect


def test_dsir_weight_matches_manual_computation(spark):
    buckets, alpha = 128, 0.01
    cand = spark.createDataFrame(
        [(1, "cat sat mat"), (2, "dog ran far")], "doc_id long, text string"
    )
    targ = spark.createDataFrame([(9, "cat mat cat")], "doc_id long, text string")

    def bag(texts):
        out: dict[int, int] = {}
        for t in texts:
            for g in _py_grams(t):
                b = _py_bucket(g, buckets)
                out[b] = out.get(b, 0) + 1
        return out

    t_bag = bag(["cat mat cat"])
    r_bag = bag(["cat sat mat", "dog ran far"])
    tt, tr = float(sum(t_bag.values())), float(sum(r_bag.values()))
    ab = alpha * buckets

    def manual_lw(text):
        doc = bag([text])
        micros = 0
        for b, c in doc.items():
            lam = math.log((t_bag.get(b, 0) + alpha) / (tt + ab)) - math.log(
                (r_bag.get(b, 0) + alpha) / (tr + ab)
            )
            micros += int(round_half_up(c * lam * 1e6))
        return micros

    def round_half_up(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    got = {
        r.doc_id: (r.n_grams, r.lw_micros)
        for r in dsir_weights(cand, targ, buckets=buckets, alpha=alpha).collect()
    }
    assert got[1] == (5, manual_lw("cat sat mat"))
    assert got[2] == (5, manual_lw("dog ran far"))
    # the target-overlapping doc must outweigh the disjoint-vocab doc
    assert got[1][1] > got[2][1]


def test_dsir_select_planted_distribution(spark):
    # two equally-sized, equally-long candidate groups; the target corpus
    # shares vocabulary ONLY with group A -> selection must be exactly A
    a_texts = [f"cat mat sat hat bat rat {i}" for i in range(8)]
    b_texts = [f"stock bond yield price index fund {i}" for i in range(8)]
    cand = spark.createDataFrame(
        [(i, t) for i, t in enumerate(a_texts)]
        + [(100 + i, t) for i, t in enumerate(b_texts)],
        "doc_id long, text string",
    )
    targ = spark.createDataFrame(
        [(900, "cat mat sat hat"), (901, "bat rat cat mat")],
        "doc_id long, text string",
    )
    sel = dsir_select(cand, targ, 8, buckets=512)
    picked = sorted(r.doc_id for r in sel.collect())
    assert picked == list(range(8))
    ranks = sorted(r.rank for r in sel.collect())
    assert ranks == list(range(1, 9))


def test_dsir_resample_seeded_and_deterministic(spark):
    cand = spark.createDataFrame(
        [(i, f"tok{i} tok{i + 1} tok{i + 2}") for i in range(30)],
        "doc_id long, text string",
    )
    targ = spark.createDataFrame(
        [(99, "tok0 tok1 tok2 tok3")], "doc_id long, text string"
    )
    a1 = [r.doc_id for r in dsir_resample(cand, targ, 10, seed=1).collect()]
    a2 = [r.doc_id for r in dsir_resample(cand, targ, 10, seed=1).collect()]
    assert a1 == a2  # same seed -> identical draw, any partitioning
    b = [r.doc_id for r in dsir_resample(cand, targ, 10, seed=2).collect()]
    assert set(a1) != set(b)  # different seed -> different sample
    # temperature -> 0 recovers the deterministic top-k
    cold = {
        r.doc_id
        for r in dsir_resample(cand, targ, 5, temperature=1e-9, seed=1).collect()
    }
    det = {r.doc_id for r in dsir_select(cand, targ, 5).collect()}
    assert cold == det


def test_dsir_resample_string_ids_get_real_noise(spark):
    # non-numeric ids must NOT degenerate the draw: the old numeric-cast
    # noise went NULL on string ids, silently making the "sample" first-n
    cand = spark.createDataFrame(
        [(f"doc-{i:03d}", f"tok{i} tok{i + 1} tok{i + 2}") for i in range(30)],
        "doc_id string, text string",
    )
    targ = spark.createDataFrame(
        [("t", "tok0 tok1 tok2 tok3")], "doc_id string, text string"
    )
    out1 = dsir_resample(cand, targ, 10, seed=1).collect()
    assert all(r.score is not None for r in out1)  # noise actually applied
    a1 = [r.doc_id for r in out1]
    assert a1 == [r.doc_id for r in dsir_resample(cand, targ, 10, seed=1).collect()]
    b = [r.doc_id for r in dsir_resample(cand, targ, 10, seed=2).collect()]
    assert set(a1) != set(b)  # seeds reshuffle string-keyed draws too


def test_dsir_input_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="buckets"):
        hashed_gram_features(df, buckets=1)
    with pytest.raises(ValueError, match="alpha"):
        dsir_weights(df, df, alpha=0.0)
    with pytest.raises(ValueError, match="n_select"):
        dsir_select(df, df, 0)
    with pytest.raises(ValueError, match="temperature"):
        dsir_resample(df, df, 1, temperature=0.0)


def test_dsir_empty_target_raises(spark):
    cand = spark.createDataFrame([(1, "some text")], "doc_id long, text string")
    empty = cand.filter("doc_id < 0")
    with pytest.raises(ValueError, match="empty target"):
        dsir_weights(cand, empty)


def test_dsir_null_text_docs_excluded(spark):
    """NULL-text candidates carry no evidence: they are absent from the
    weights (not coalesced to 0, which would outrank negative real docs)."""
    cand = spark.createDataFrame(
        [(1, "cat sat"), (2, None)], "doc_id long, text string"
    )
    targ = spark.createDataFrame([(9, "dog ran")], "doc_id long, text string")
    got = {r.doc_id for r in dsir_weights(cand, targ).collect()}
    assert got == {1}
