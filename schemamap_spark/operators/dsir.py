"""DSIR-style importance resampling for training-data selection.

Data Selection for Language Models via Importance Resampling (Xie et al.,
NeurIPS 2023, public paper): pick candidate documents whose hashed-n-gram
distribution looks like a (small) target corpus. The estimator is two
bag-of-hashed-ngrams models — p_target and p_raw over B feature buckets —
and a per-document log importance weight

    lw(doc) = sum_b c_b(doc) * [ ln p_target(b) - ln p_raw(b) ]

where c_b(doc) counts the doc's unigrams+bigrams hashing into bucket b.
High lw = target-like. Selection is either deterministic top-k (oracle-
checkable, this module's default) or Gumbel-top-k sampling (the paper's
resampling, with a seeded portable hash for the noise so reruns agree).

Engine-portable by construction, like operators/sampling.py:
- the feature hash is the first 8 hex chars of md5(gram) as an integer,
  mod B — identical in Spark (`conv(substr(md5(g),1,8),16,10)`) and DuckDB
  (`('0x'||substr(md5(g),1,8))::bigint`), no engine RNG anywhere;
- per-(doc,bucket) contributions are rounded to integer micro-nats and
  integer-summed (the perplexity_score lp_micros pattern), so the weight is
  independent of partitioning/summation order and replays exactly in the
  DuckDB oracle (suite/extra.py `dsir_select`).

Scale shape (100 TB candidates, MB-scale target):
- text is tokenized once and immediately reduced to (doc_id, bucket, c)
  rows — ints only; raw text never shuffles.
- both models are <= B rows (default 8192); they ride broadcast joins onto
  the candidate side, so the only wide shuffle is the per-doc aggregation
  of slim integer rows.
- top-k selection is orderBy+limit = TakeOrderedAndProject (per-partition
  heaps, k rows to the driver-side merge, never a global sort).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from schemamap_spark.operators.ngrams import ngrams_from_tokens

DEFAULT_BUCKETS = 8192


def _bucket_col(gram_col: str, buckets: int) -> Column:
    """Portable hash bucket for a gram string: int(md5(g)[:8], 16) % B."""
    return F.pmod(
        F.conv(F.substring(F.md5(F.col(gram_col)), 1, 8), 16, 10).cast("long"),
        F.lit(buckets),
    )


def hashed_gram_features(
    docs: DataFrame,
    buckets: int = DEFAULT_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, bucket, c): hashed unigram+bigram counts per document — the
    DSIR feature representation. One scan, one (id,bucket)-keyed aggregation
    of integer rows; the text column is dropped before anything shuffles."""
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    from schemamap_spark.session import ensure_parallelism

    toks = (
        ensure_parallelism(docs, id_col)
        .select(F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("toks"))
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.concat(F.col("toks"), ngrams_from_tokens("toks", 2))
        ).alias("gram"),
    )
    return (
        grams.select("doc_id", _bucket_col("gram", buckets).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_weights(
    candidates: DataFrame,
    target: DataFrame,
    buckets: int = DEFAULT_BUCKETS,
    alpha: float = 0.01,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-candidate log importance weight vs the target corpus, as integer
    micro-nats: (doc_id, n_grams, lw_micros).

    Models are add-alpha smoothed over the B buckets:
        p(b) = (count_b + alpha) / (total + alpha * B)
    computed inline per (doc, bucket) row after LEFT joins against the two
    <=B-row count frames (buckets the doc has but a model lacks coalesce to
    zero counts — the smoothing floor). The raw model is fit on `candidates`
    itself, the paper's setting; pass any other raw corpus by pre-computing
    its features and using `dsir_weights_from_features`.
    """
    # persisted: the candidate features feed BOTH the per-doc scoring branch
    # and the raw-model aggregation — without this the tokenize+hash pass
    # over the (100 TB) candidate corpus runs twice (no ReusedExchange: the
    # two consumers aggregate by different keys). ContextCleaner unpersists
    # once the returned plan is garbage-collected, the dedup-module pattern.
    cand_fb = hashed_gram_features(candidates, buckets, id_col, text_col).persist()
    targ_fb = hashed_gram_features(target, buckets, id_col, text_col)
    return dsir_weights_from_features(
        candidates.select(F.col(id_col).alias("doc_id")),
        cand_fb, targ_fb, buckets, alpha,
    )


def dsir_weights_from_features(
    candidate_ids: DataFrame,
    candidate_features: DataFrame,
    target_features: DataFrame,
    buckets: int = DEFAULT_BUCKETS,
    alpha: float = 0.01,
    raw_features: DataFrame | None = None,
) -> DataFrame:
    """Weight computation over pre-hashed (doc_id, bucket, c) frames; the
    raw model defaults to the candidate features themselves. Exposed so a
    persisted feature store (daily-ingest shape) can skip re-tokenization."""
    if alpha <= 0:
        raise ValueError(f"smoothing alpha must be positive, got {alpha}")
    raw = raw_features if raw_features is not None else candidate_features
    # Both models are <= B rows but each feeds TWO consumers (its broadcast
    # join and its grand-total aggregate) — and t_counts a THIRD (the
    # empty-target guard below). Unpersisted, every consumer re-ran the
    # full tokenize→hash→aggregate pipeline of its corpus: the target
    # corpus was tokenized three times per call and the candidate features
    # re-aggregated twice (guide §2.4 — remove repeated subtrees outright).
    # Persisted, the guard's head(1) is the one materialization of
    # t_counts and everything downstream is a <=B-row cache read;
    # ContextCleaner unpersists with the returned plan (module pattern).
    t_counts = bucket_counts(target_features, "ct").persist()
    r_counts = bucket_counts(raw, "cr").persist()
    # an empty target would make every model total NULL and every weight a
    # silent 0 — fail the contract loudly instead (pq_train convention);
    # the probe costs one small scan of the (tiny) target side only
    if not t_counts.head(1):
        raise ValueError(
            "dsir: empty target corpus — no features to fit p_target"
        )
    return score_against_models(
        candidate_ids, candidate_features, t_counts, r_counts, buckets, alpha
    )


def bucket_counts(features: DataFrame, name: str) -> DataFrame:
    """Corpus bucket-count model from (doc_id, bucket, c) feature rows —
    <= B rows of (bucket, name). Persist these to parquet to train once and
    score forever (the streaming gate's input)."""
    return features.groupBy("bucket").agg(F.sum("c").alias(name))


def score_against_models(
    candidate_ids: DataFrame,
    candidate_features: DataFrame,
    t_counts: DataFrame,
    r_counts: DataFrame,
    buckets: int = DEFAULT_BUCKETS,
    alpha: float = 0.01,
) -> DataFrame:
    """Score pre-hashed features against PRE-TRAINED (bucket, ct) /
    (bucket, cr) model frames — the reusable tail of dsir_weights, and what
    the streaming ingest gate calls per micro-batch (models static, totals a
    tiny <=B-row re-aggregation)."""
    totals = (
        t_counts.agg(F.sum("ct").alias("tot_t"))
        .crossJoin(r_counts.agg(F.sum("cr").alias("tot_r")))
    )
    ab = float(alpha) * buckets
    lam = (
        F.log((F.coalesce(F.col("ct"), F.lit(0)) + F.lit(alpha))
              / (F.col("tot_t").cast("double") + F.lit(ab)))
        - F.log((F.coalesce(F.col("cr"), F.lit(0)) + F.lit(alpha))
                / (F.col("tot_r").cast("double") + F.lit(ab)))
    )
    contrib = F.col("c").cast("double") * lam
    scored = (
        candidate_features
        .join(F.broadcast(t_counts), "bucket", "left")
        .join(F.broadcast(r_counts), "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_grams"),
            F.sum(F.round(contrib * 1e6).cast("bigint")).alias("lw_micros"),
        )
    )
    # Featureless docs (only NULL text produces zero gram rows — empty
    # string still yields one unigram) are EXCLUDED, not scored 0: most
    # real candidates carry negative lw against a small target corpus, so a
    # coalesced 0 would rank contentless docs above every real one in
    # dsir_select — and diverge from the DuckDB oracle, which never emits
    # rows for them. Inner join = "no evidence, no candidacy".
    return candidate_ids.join(scored, "doc_id").select(
        "doc_id", "n_grams", "lw_micros"
    )


def dsir_select(
    candidates: DataFrame,
    target: DataFrame,
    n_select: int,
    buckets: int = DEFAULT_BUCKETS,
    alpha: float = 0.01,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic DSIR selection: the n_select most-target-like candidates
    under the total order (lw_micros desc, doc_id) — engine-stable at the
    limit boundary, so the DuckDB oracle replays the exact row set. Output
    (doc_id, lw_micros, rank). The limit plans as TakeOrderedAndProject; the
    rank window runs over the already-collected n_select rows only."""
    from pyspark.sql import Window

    if n_select < 1:
        raise ValueError(f"n_select must be >= 1, got {n_select}")
    w = dsir_weights(candidates, target, buckets, alpha, id_col, text_col)
    top = w.orderBy(F.desc("lw_micros"), "doc_id").limit(n_select)
    rank = F.row_number().over(
        Window.orderBy(F.desc("lw_micros"), "doc_id")
    )
    return top.select("doc_id", "lw_micros", rank.cast("int").alias("rank"))


def dsir_resample(
    candidates: DataFrame,
    target: DataFrame,
    n_select: int,
    temperature: float = 1.0,
    seed: int = 0,
    buckets: int = DEFAULT_BUCKETS,
    alpha: float = 0.01,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gumbel-top-k importance RESAMPLING (the paper's sampler): score =
    lw/temperature + Gumbel noise, take the k best. Equivalent to sampling
    k docs without replacement with probability proportional to
    exp(lw/temperature); temperature -> 0 recovers dsir_select.

    The noise is a seeded hash uniform on md5 of the id's STRING form —
    portable across id types (a numeric cast of a string id would go NULL
    and silently degenerate the sample to first-n-by-id) — md5(id|seed)
    first 8 hex chars -> bucket of 1e6 -> u in (0,1) -> -ln(-ln u), so the
    draw is reproducible across runs, partitionings, and engines — no
    engine RNG."""
    if temperature <= 0:
        raise ValueError(f"temperature must be positive, got {temperature}")
    w = dsir_weights(candidates, target, buckets, alpha, id_col, text_col)
    id_str = F.coalesce(F.col("doc_id").cast("string"), F.lit("~null~"))
    digest = F.md5(F.concat(id_str, F.lit(f"|{int(seed)}")))
    u_bucket = F.pmod(
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("long"), F.lit(1_000_000)
    )
    u = (u_bucket.cast("double") + F.lit(0.5)) / F.lit(1_000_000.0)
    gumbel = -F.log(-F.log(u))
    score = F.col("lw_micros").cast("double") / F.lit(1e6 * temperature) + gumbel
    return (
        w.withColumn("score", score)
        .orderBy(F.desc("score"), "doc_id")
        .limit(n_select)
        .select("doc_id", "lw_micros", F.round("score", 6).alias("score"))
    )
