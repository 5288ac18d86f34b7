"""Fuzzy entity matching: staging rows ↔ master-data rows by name similarity.

The reference's import pipeline stages external rows (CSV/XLSX/Sheets/SFDC)
and merges them into master-data tables (SCHEMA:404-450, data_migrations
state machine); real-world staging data spells entity names inconsistently
("  ACME Corp " vs "Acme Corp"), so the match step needs similarity, not
equality. This module is the scale-shaped version of that step:
normalized character-n-gram Jaccard with EXACT results via prefix filtering
— the same lossless candidate-pruning machinery as
dedup.jaccard_similar_pairs, extended to TWO frames.

Cross-frame prefix filter: under one GLOBAL rarity order over both sides'
grams, two sets with Jaccard >= t must share a gram inside each side's
floor((1-t)·|S|)+1 rarest-first prefix, so only the prefixes enter the
inverted-index join — the quadratic all-pairs never materializes, and the
join keys are single grams (shuffle-partitionable). At 100 TB the master
side is the small one (master data is small by definition — the reference's
own candidate-scoring premise, SCHEMA:239-254); the staging side streams
through the index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def normalized_char_ngrams(col, n: int = 3) -> F.Column:
    """Distinct character n-grams of a whitespace-collapsed, lower-cased,
    trimmed string — the standard name-matching token set (robust to case,
    padding, and double spaces; order-sensitive unlike word sets, so
    'Corp Acme' != 'Acme Corp' at high thresholds). Non-empty strings
    shorter than n contribute themselves as a single gram, so a short
    staged name still matches its exact master twin; empty/whitespace-only
    strings yield an EMPTY set (no identity to match on)."""
    s = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.array_distinct(
        F.when(
            # empty/whitespace-only names have NO identity to match on — an
            # empty gram set (callers drop the row), never a {""} singleton
            # that would "match" every other empty name at jaccard 1.0
            F.length(s) == 0,
            F.array().cast("array<string>"),
        )
        .when(F.length(s) < n, F.array(s))
        .otherwise(
            F.transform(
                F.sequence(F.lit(1), F.length(s) - (n - 1)),
                lambda i: s.substr(i, F.lit(n)),
            )
        )
    )


def fuzzy_match(
    left: DataFrame,
    right: DataFrame,
    threshold: float = 0.6,
    left_id: str = "id",
    left_text: str = "name",
    right_id: str = "id",
    right_text: str = "name",
    n: int = 3,
    top: int = 1,
) -> DataFrame:
    """For each LEFT (staging) row, the `top` RIGHT (master) rows whose
    normalized char-n-gram Jaccard >= threshold, ranked by
    (jaccard desc, right id) — EXACT, prefix-filtered.

    Output: (left_id, right_id, jaccard round6, rank). Left rows with no
    match above threshold simply don't appear (the caller's unmatched set is
    a left_anti join away). Gram document frequencies are computed over the
    UNION of both sides so the rarity order is global — per-side orders
    would break the prefix-filter guarantee."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if top < 1:
        raise ValueError(f"top must be >= 1, got {top}")
    from schemamap_spark.session import ensure_parallelism

    lsh = (
        ensure_parallelism(left, left_id)
        .select(
            F.col(left_id).alias("lid"),
            normalized_char_ngrams(F.col(left_text), n).alias("sh"),
        )
        .filter(F.size("sh") > 0)
        .persist()
    )
    rsh = (
        ensure_parallelism(right, right_id)
        .select(
            F.col(right_id).alias("rid"),
            normalized_char_ngrams(F.col(right_text), n).alias("sh"),
        )
        .filter(F.size("sh") > 0)
        .persist()
    )
    ex_l = lsh.select("lid", F.size("sh").alias("sz"), F.explode("sh").alias("s"))
    ex_r = rsh.select("rid", F.size("sh").alias("sz"), F.explode("sh").alias("s"))

    freq = (
        ex_l.select("s").unionAll(ex_r.select("s")).groupBy("s").agg(
            F.count(F.lit(1)).alias("df")
        )
    )

    def _prefix(ex, idc, pos, size):
        return (
            ex.join(freq, "s")
            .withColumn(
                pos,
                F.row_number().over(Window.partitionBy(idc).orderBy("df", "s")),
            )
            .withColumn(
                "plen", F.floor((1.0 - threshold) * F.col("sz")).cast("int") + 1
            )
            .filter(F.col(pos) <= F.col("plen"))
            .select(idc, "s", pos, F.col("sz").alias(size))
        )

    # Positional (ppjoin-style) suffix bound on top of the prefix filter:
    # both sides rank grams by the SAME global rarity order, so the first
    # shared gram attains min position on both sides simultaneously, and
    # overlap(A,B) <= 1 + min(|A| - p_a, |B| - p_b) at that gram. Jaccard
    # >= t  ⇔  overlap >= t/(1+t)·(|A|+|B|), so candidates whose bound
    # can't reach that are pruned LOSSLESSLY before the expensive
    # full-array verify join (the equals-brute-force test pins this). On a
    # hot-gram vocabulary this cuts the candidate set far below what the
    # prefix filter alone leaves (numbers in SCALE.md).
    cand = (
        _prefix(ex_l, "lid", "pl", "szl")
        .join(_prefix(ex_r, "rid", "pr", "szr"), "s")
        .groupBy("lid", "rid", "szl", "szr")
        .agg(F.min("pl").alias("pl"), F.min("pr").alias("pr"))
        .filter(
            F.lit(1.0) + F.least(F.col("szl") - F.col("pl"), F.col("szr") - F.col("pr"))
            >= F.ceil(
                F.lit(threshold / (1.0 + threshold)) * (F.col("szl") + F.col("szr"))
            )
        )
        .select("lid", "rid")
    )
    scored = (
        cand.join(lsh.select("lid", F.col("sh").alias("sh_l")), "lid")
        .join(rsh.select("rid", F.col("sh").alias("sh_r")), "rid")
        .select(
            "lid",
            "rid",
            (
                F.size(F.array_intersect("sh_l", "sh_r")).cast("double")
                / F.size(F.array_union("sh_l", "sh_r")).cast("double")
            ).alias("jac"),
        )
        .filter(F.col("jac") >= threshold)
    )
    w = Window.partitionBy("lid").orderBy(F.desc("jac"), "rid")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top)
        .select(
            F.col("lid").alias(left_id + "_left"),
            F.col("rid").alias(right_id + "_right"),
            F.round("jac", 6).alias("jaccard"),
            "rank",
        )
        .orderBy(left_id + "_left", "rank")
    )


def fuzzy_duplicates(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "id",
    text_col: str = "name",
    n: int = 3,
) -> DataFrame:
    """Potential duplicate entities WITHIN one master table by name
    similarity — the doctor-style data-quality check behind every MDM
    import: find the "Acme Corp" / " ACME corp " rows that key-based
    uniqueness can't see. Self-match through the same prefix + positional
    machinery as fuzzy_match; output (i, j, jaccard) with i < j, each pair
    once. Feed the pairs to graph.connected_components to collapse
    duplicate groups, exactly like the document near-dup family."""
    out = fuzzy_match(
        df, df, threshold,
        left_id=id_col, left_text=text_col,
        right_id=id_col, right_text=text_col,
        n=n, top=2_147_483_647,
    )
    left, right = id_col + "_left", id_col + "_right"
    return (
        out.filter(F.col(left) < F.col(right))
        .select(F.col(left).alias("i"), F.col(right).alias("j"), "jaccard")
        .orderBy("i", "j")
    )
