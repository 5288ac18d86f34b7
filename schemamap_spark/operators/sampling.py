"""Deterministic sampling / dataset-split operators for training pipelines.

Splits must be REPRODUCIBLE (same row → same split, forever, on any engine,
any partitioning) — engine RNG (`df.sample`) is none of those. These use a
multiplicative (Knuth) hash of the stable id, pure integer arithmetic, so
the assignment is portable enough that the DuckDB oracle recomputes it
exactly.

bucket(id) = ((id mod 2^31) * 2654435761) mod 2^31 mod 1000   (Knuth's
golden-ratio multiplier; the id is reduced mod 2^31 FIRST so the product
stays < 2^31 · KNUTH ≈ 5.7e18 < 2^63 for any 64-bit id — ANSI-safe and
overflow-free).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KNUTH = 2654435761
MOD = 2_147_483_648  # 2^31
BUCKETS = 1000


def knuth_hash(id_col: str, salt: int = 0) -> Column:
    """Full-resolution Knuth hash of (id, salt) in [0, 2^31) — the ONE
    portable hash every deterministic operator derives from (buckets,
    splits, mixture cutoffs, shard assignment, training order). The id is
    reduced mod 2^31 FIRST — before the salt add AND before the multiply —
    so no intermediate overflows bigint for ANY 64-bit id (the product is
    < 2^31 · KNUTH ≈ 5.7e18 < 2^63; adding a salt to the RAW id would
    overflow for hash-derived ids near 2^63): ANSI-safe, and
    engine-portable enough that the DuckDB oracles replay it exactly.
    A nonzero salt shifts the reduced input, selecting a DIFFERENT
    bijection (an affine pre-shift composed with an odd-multiplier
    bijection is itself a bijection mod 2^31) — different enough for
    membership/bucketing (rows land in different buckets), but NOT an
    independent permutation: the whole family is affine in the id, so
    hashes at two salts differ by a CONSTANT (h_{s+d} = (h_s + d·KNUTH)
    mod 2^31) and the orders they induce are rotations of each other
    (ADVICE r9). Callers needing decorrelated ORDERS across salts must
    break the affinity — use scramble_hash."""
    reduced = F.pmod(F.col(id_col).cast("long"), F.lit(MOD))
    if salt:
        reduced = F.pmod(reduced + F.lit(int(salt) % MOD), F.lit(MOD))
    return F.pmod(reduced * F.lit(KNUTH), F.lit(MOD))


def scramble_hash(id_col: str, salt: int = 0) -> Column:
    """knuth_hash decorrelated across salts by a NON-AFFINE mix — the
    ORDER-key companion (the shard exporter's within-shard training
    order). knuth_hash alone is affine in the id, so two salts' orders
    are rotations of each other at a single cut point (successive "epoch
    re-shuffles" would see nearly identical relative row order; ADVICE
    r9). The xorshift step x ⊕ (x >> 15) breaks the affinity: it is
    invertible on 31-bit ints (the top 16 bits pass through, lower bits
    recover iteratively), so composed with the odd-multiplier step the
    whole map stays a bijection of [0, 2^31) — ties only where ids
    collide mod 2^31, same as knuth_hash — while orders at different
    salts are genuinely decorrelated (pinned in test_shards). Same
    overflow envelope as knuth_hash: inputs < 2^31, product < 2^31 ·
    KNUTH ≈ 5.7e18 < 2^63, ANSI-safe. NOT DuckDB-oracled (order keys never are — shard
    MEMBERSHIP, which oracles replay, comes from knuth_hash alone)."""
    h = knuth_hash(id_col, salt)
    mixed = h.bitwiseXOR(F.shiftright(h, 15))
    return F.pmod(mixed * F.lit(KNUTH), F.lit(MOD))


def knuth_py(x: int, salt: int = 0) -> int:
    """Driver-side twin of knuth_hash — same reduce-add-multiply, kept
    BESIDE the Column version so an edit changes both or fails the
    exact-equality pin (test_shards). For single driver-side values
    (e.g. checking a resume token's shard membership) where a Spark job
    would be absurd. Python's % is pmod for any sign, matching pmod."""
    reduced = (x % MOD + salt % MOD) % MOD
    return (reduced * KNUTH) % MOD


def scramble_py(x: int, salt: int = 0) -> int:
    """Driver-side twin of scramble_hash — knuth_py + the same
    xorshift-multiply mix, beside the Column version for the same
    change-together reason (exact equality pinned in test_shards).
    Exists because some schedules are tiny driver lists (the shard-epoch
    walk hashes num_shards ints; a resume token is one int). Bijective
    on [0, 2^31) like its twin, so distinct inputs never tie."""
    h = knuth_py(x, salt)
    mixed = h ^ (h >> 15)
    return (mixed * KNUTH) % MOD


def deterministic_bucket(id_col: str, buckets: int = BUCKETS) -> Column:
    """Stable pseudo-uniform bucket in [0, buckets) from a bigint id column
    (knuth_hash mod buckets — see its portability/overflow contract)."""
    return F.pmod(knuth_hash(id_col), F.lit(buckets))


def assign_splits(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Add a `split` column ('train'/'val'/'test' by default, 96/2/2).

    Weights are per-mille-resolved cumulative thresholds; every row lands in
    exactly one split and re-running (or re-partitioning, or re-reading)
    never moves a row.

    LEAKAGE-SAFE splits: id_col is the assignment KEY, so passing a GROUP
    column instead of the row id keeps whole groups in one split — e.g.
    `assign_splits(curate_corpus(docs), id_col="dup_group")` can never put
    two near-duplicates on opposite sides of a train/test boundary (the
    classic eval-contamination bug of row-level splitting); same for
    splitting by domain/source. Pinned in test_sampling."""
    weights = weights or {"train": 0.96, "val": 0.02, "test": 0.02}
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {sum(weights.values())}")
    b = deterministic_bucket(id_col)
    expr = None
    acc = 0
    for name, w in weights.items():
        acc += round(w * BUCKETS)
        cond = b < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    # rounding remainder (if any) goes to the last split
    last = list(weights)[-1]
    return df.withColumn("split", expr.otherwise(F.lit(last)))


def deterministic_sample(df: DataFrame, fraction: float, id_col: str = "doc_id") -> DataFrame:
    """Stable fraction-of-corpus sample: rows whose bucket falls under
    fraction*1000. Same rows selected on every run/engine/partitioning."""
    return df.filter(deterministic_bucket(id_col) < int(round(fraction * BUCKETS)))


def sample_exact_n(df: DataFrame, n: int, id_col: str = "doc_id") -> DataFrame:
    """EXACTLY n rows (or all, if fewer), stable forever: the n smallest
    rows under the full-resolution Knuth hash of the id (ties broken by
    id) — the "give me exactly 10k eval docs" primitive that
    deterministic_sample's per-mille rate cannot express.

    Properties, all pinned in tests: deterministic across runs/engines/
    partitionings; NESTED — sample_exact_n(df, m) is a subset of
    sample_exact_n(df, n) for m <= n, so growing an eval set never churns
    the existing picks. Plan: orderBy+limit = TakeOrderedAndProject
    (per-partition heaps of n, no global sort); the DuckDB extras oracle
    replays hash, tie order, and cut exactly.

    The key hashes md5 of the id's STRING form (the dsir_resample rule), so
    string/uuid ids sample uniformly instead of silently degenerating to
    first-n-by-id through a NULLed numeric cast.

    n is bounded at 10M: TakeOrderedAndProject allocates its bounded
    priority queue by N — O(n) heap PER PARTITION regardless of how few
    rows exist, so an absurd n (say 10^9) OOMs the JVM on a 150-row table
    (measured: it killed a whole test session). Past the bound you are not
    sampling an eval set any more — use deterministic_sample by fraction,
    or sort+write the whole frame."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if n > 10_000_000:
        raise ValueError(
            f"n={n} exceeds the 10M sample bound (the top-n heap allocates "
            "O(n) memory per partition); use deterministic_sample for "
            "fraction-of-corpus takes"
        )
    id_str = F.coalesce(F.col(id_col).cast("string"), F.lit("~null~"))
    key = F.conv(F.substring(F.md5(id_str), 1, 8), 16, 10).cast("long")
    return (
        df.withColumn("__sk", key)
        .orderBy("__sk", id_col)
        .limit(n)
        .drop("__sk")
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep `fractions[stratum]` of each
    group (language/source balancing). Same Knuth-bucket arithmetic as
    assign_splits — same row kept forever, on any engine/partitioning; no
    shuffle at all (a literal-map lookup + the id hash, pure projection).
    Strata missing from `fractions` get default_fraction (0 = drop)."""
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {s!r} out of [0,1]: {f}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction out of [0,1]: {default_fraction}")
    # cutoffs resolve to per-mille in PYTHON with the same round() as
    # assign_splits/deterministic_sample — F.round (HALF_UP) would diverge
    # from Python's banker's rounding on .5-per-mille fractions and break the
    # "same arithmetic" portability contract
    mapping = F.create_map(
        *[
            F.lit(x)
            for s, f in fractions.items()
            for x in (s, int(round(f * BUCKETS)))
        ]
    )
    cutoff = F.coalesce(
        mapping[F.col(strata_col)], F.lit(int(round(default_fraction * BUCKETS)))
    )
    return df.filter(deterministic_bucket(id_col) < cutoff)


def temperature_mix(
    docs: DataFrame,
    alpha: float,
    source_col: str = "source",
    tokens_col: str | None = None,
    text_col: str = "text",
) -> dict[str, float]:
    """Derive a target mixture from the corpus itself by temperature
    scaling: w_s ∝ n_s^alpha over per-source token counts — the standard
    data-mixing recipe for rebalancing skewed source distributions
    (public method: exponential smoothing in mC4/mT5 and XLM-R; alpha=1
    keeps natural proportions, alpha=0 is uniform, alpha≈0.3 is the
    common multilingual compromise that up-weights small sources without
    letting them dominate).

    Returns {source: weight} with weights summing to 1.0 — exactly the
    `target_mix` shape mixture_weights / mixture_sample consume, so the
    full pipeline is  temperature_mix(docs, 0.3) |> mixture_sample(docs,
    _, budget).  Derivation is one per-source aggregation collected to
    the driver (bounded by source cardinality, dozens not millions); the
    sampling it feeds stays oracle-checked via the mixture_sample row."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    from schemamap_spark.functions.text import token_count

    toks = F.col(tokens_col) if tokens_col else token_count(text_col)
    avail = {
        r["src"]: int(r["toks"])
        for r in docs.groupBy(F.col(source_col).alias("src"))
        .agg(F.sum(toks).cast("bigint").alias("toks"))
        .collect()
        if r["toks"]
    }
    if not avail:
        raise ValueError("no sources with tokens — nothing to mix")
    powered = {s: float(n) ** alpha for s, n in avail.items()}
    total = sum(powered.values())
    return {s: w / total for s, w in sorted(powered.items())}


def mixture_weights(
    docs: DataFrame,
    target_mix: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    tokens_col: str | None = None,
    text_col: str = "text",
) -> dict[str, dict]:
    """Per-source sampling plan to hit a token budget at a target mixture —
    the domain-mixing step of a training-data pipeline (e.g. 60% web /
    30% code / 10% books).

    Returns {source: {available, target, fraction, cutoff}} where `fraction`
    = min(1, target_tokens / available_tokens) and `cutoff` = floor(fraction
    * 1000) is the per-mille Knuth-bucket threshold mixture_sample applies.
    floor (not round) BY CONTRACT: it is portable to any engine (DuckDB
    floor == Python math.floor for non-negatives), where Python's banker's
    rounding is not. An under-supplied source (available < target) caps at
    fraction 1 and the shortfall is visible in the returned plan rather than
    silently rebalanced — rebalancing policy belongs to the caller.

    Driver-side state is one row per source (bounded by the source-domain
    cardinality, dozens not millions)."""
    import math as _math

    if token_budget <= 0:
        raise ValueError(f"token_budget must be positive, got {token_budget}")
    total_w = sum(target_mix.values())
    if total_w <= 0:
        raise ValueError("target_mix weights must sum to a positive value")
    if any(w < 0 for w in target_mix.values()):
        raise ValueError("target_mix weights must be non-negative")
    from schemamap_spark.functions.text import token_count

    toks = F.col(tokens_col) if tokens_col else token_count(text_col)
    avail = {
        r["src"]: int(r["toks"])
        for r in docs.groupBy(F.col(source_col).alias("src"))
        .agg(F.sum(toks).cast("bigint").alias("toks"))
        .collect()
    }
    plan: dict[str, dict] = {}
    for src, w in target_mix.items():
        target = token_budget * (w / total_w)
        a = avail.get(src, 0)
        frac = 1.0 if a == 0 else min(1.0, target / a)
        plan[src] = {
            "available": a,
            "target": int(target),
            "fraction": frac,
            "cutoff": int(_math.floor(frac * BUCKETS)),
        }
    return plan


def mixture_sample(
    docs: DataFrame,
    target_mix: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Deterministic token-budgeted mixture sample: keep each source's rows
    whose Knuth bucket falls under that source's per-mille cutoff from
    mixture_weights. Sources absent from target_mix are DROPPED (explicit
    mixtures only). Same-row-kept-forever semantics as assign_splits /
    stratified_sample — reruns, repartitions, and other engines agree; the
    extra-registry oracle replays the full plan in DuckDB.

    Sampling is per-ROW on a per-source RATE, so the achieved token count
    concentrates around the target (docs ~ i.i.d. within a source) but is
    not exact-to-the-token; exactness would need a sequential knapsack scan,
    which does not distribute."""
    plan = mixture_weights(
        docs, target_mix, token_budget, source_col, tokens_col, text_col
    )
    cutoffs = F.create_map(
        *[F.lit(x) for s, p in plan.items() for x in (s, p["cutoff"])]
    )
    cutoff = cutoffs[F.col(source_col)]
    return docs.filter(
        cutoff.isNotNull() & (deterministic_bucket(id_col) < cutoff)
    )


def sample_n_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic fixed-size sample per group: the n rows whose Knuth
    hash ranks lowest within each group (ties broken by id) — eval-set
    construction ("500 docs per language") without engine RNG. The same
    rows win on every run, engine, and partitioning, so the DuckDB oracle
    replays the pick exactly (sample_per_source extra).

    Scale shape: one window rank per group over (hash, id) — a single
    shuffle on group_col; groups larger than a task's memory sort spill,
    they never collect. For a FRACTION per group use stratified_sample
    (shuffle-free); fixed-N inherently needs the per-group rank."""
    from pyspark.sql import Window

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    w = Window.partitionBy(group_col).orderBy(
        deterministic_bucket(id_col, MOD), F.col(id_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__rk")
    )
