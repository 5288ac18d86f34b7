"""Sequence packing for LLM training-data pipelines: assign variable-length
documents to fixed token-budget training sequences (bin packing).

Scale shape — global bin packing is inherently sequential, so packing here is
BUCKET-LOCAL: each document lands in a deterministic bucket (Knuth hash of
its id, same arithmetic as operators/sampling.py), every bucket packs
independently with first-fit-decreasing inside one Arrow-batched
applyInPandas group, and sequence ids are (bucket, local_index) pairs. No
global coordination, no driver collect; 1000 executors pack 1000+ buckets in
parallel, and only (id, n_tokens) rides the shuffle — document text never
moves. FFD is within 11/9·OPT+1 of optimal per bucket, and with
pseudo-uniform bucketing the corpus-wide waste matches the per-bucket bound
in expectation.

The reference engine has no packing operator; this belongs to the
training-pipeline layer the engine adds on top (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from schemamap_spark.operators.sampling import deterministic_bucket

_ASSIGN_SCHEMA = (
    "doc_id long, n_tokens long, bucket int, seq_local int, seq_tokens long, oversize boolean"
)


def pack_sequences(
    docs: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    buckets: int = 1024,
) -> DataFrame:
    """Pack documents into training sequences of at most ``max_tokens`` tokens.

    Returns the ASSIGNMENT frame — one row per document:
      doc_id, n_tokens, bucket, seq_local, seq_id (``"<bucket>-<idx>"``),
      seq_tokens (total of the sequence the doc landed in), oversize.
    Join it back to ``docs`` on the id to carry payloads; keeping the packing
    frame slim is what lets the shuffle stay (id, count)-sized at corpus scale.

    Documents longer than the budget get a sequence of their own with
    ``oversize = true`` (truncation policy is the trainer's call, not ours).
    Deterministic: same corpus → same sequences, on any partitioning.
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    if not 1 <= buckets <= 2**31 - 1:
        raise ValueError(f"buckets out of range: {buckets}")

    if tokens_col is not None:
        n_tokens = F.col(tokens_col).cast("long")
    else:
        from schemamap_spark.functions.text import token_count

        n_tokens = token_count(text_col).cast("long")
    # null text / null token counts pack as 0-token docs instead of turning
    # into NaN inside the pandas closure (int(NaN) kills the whole job)
    n_tokens = F.coalesce(n_tokens, F.lit(0))

    slim = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        n_tokens.alias("n_tokens"),
        deterministic_bucket(id_col, buckets).cast("int").alias("bucket"),
    )

    budget = int(max_tokens)

    def _pack(pdf):
        # Self-contained closure (workers can't import schemamap_spark).
        # First-fit-decreasing: sort by (tokens desc, id asc) for determinism,
        # scan bins in creation order, open a new bin when none fits.
        import pandas as pd

        pdf = pdf.sort_values(["n_tokens", "doc_id"], ascending=[False, True])
        remaining: list[int] = []  # tokens left per open bin
        totals: list[int] = []
        assigned: list[int] = []
        for n in pdf["n_tokens"].tolist():
            n = int(n)
            if n > budget:
                # oversize doc: dedicated (already-full) bin
                assigned.append(len(remaining))
                remaining.append(0)
                totals.append(n)
                continue
            for i, rem in enumerate(remaining):
                if rem >= n:
                    assigned.append(i)
                    remaining[i] = rem - n
                    totals[i] += n
                    break
            else:
                assigned.append(len(remaining))
                remaining.append(budget - n)
                totals.append(n)
        pdf = pdf.assign(seq_local=pd.array(assigned, dtype="int32"))
        pdf["seq_tokens"] = pdf["seq_local"].map(lambda i: totals[i]).astype("int64")
        pdf["oversize"] = pdf["n_tokens"] > budget
        return pdf[["doc_id", "n_tokens", "bucket", "seq_local", "seq_tokens", "oversize"]]

    packed = slim.groupBy("bucket").applyInPandas(_pack, schema=_ASSIGN_SCHEMA)
    return packed.withColumn(
        "seq_id", F.format_string("%d-%d", F.col("bucket"), F.col("seq_local"))
    )


def packing_stats(assignment: DataFrame, max_tokens: int) -> DataFrame:
    """One-row packing efficiency report: sequences, docs, token utilization
    (packed tokens / sequence capacity, oversize sequences excluded)."""
    per_seq = assignment.groupBy("bucket", "seq_local").agg(
        F.first("seq_tokens").alias("seq_tokens"),
        F.max(F.col("oversize").cast("int")).alias("oversize"),
    )
    regular = F.sum(F.lit(1) - F.col("oversize"))
    return per_seq.agg(
        F.count(F.lit(1)).alias("sequences"),
        F.sum("oversize").alias("oversize_sequences"),
        # null (not a 0/0 ANSI error) when every sequence is oversize
        F.when(
            regular > 0,
            F.round(
                F.sum(F.when(F.col("oversize") == 0, F.col("seq_tokens")).otherwise(F.lit(0)))
                / (regular * F.lit(max_tokens)).cast("double"),
                6,
            ),
        ).alias("utilization"),
    ).crossJoin(F.broadcast(assignment.agg(F.count(F.lit(1)).alias("docs"))))


CHUNK_COLUMNS = ["doc_id", "chunk_no", "n_chunks", "chunk_text", "chunk_tokens"]


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 256,
    overlap: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping fixed-size token windows — the
    pre-embedding step of every retrieval/embedding pipeline. One output row
    per chunk: (doc_id, chunk_no, n_chunks, chunk_text, chunk_tokens).

    Chunks start every ``chunk_tokens - overlap`` tokens, so consecutive
    chunks share ``overlap`` tokens and every token is covered. Pure Column
    ops: tokens are materialized ONCE per doc, chunk indices posexplode from
    a sequence (a narrow row expansion — no shuffle anywhere), and each
    chunk is a slice + concat. The last chunk may be shorter; docs at or
    under the window emit exactly one chunk."""
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"overlap must be in [0, chunk_tokens): {overlap}")
    stride = chunk_tokens - overlap

    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    with_toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        toks.alias("_toks"),
        F.size(toks).alias("_n"),
    )
    n_chunks = F.when(F.col("_n") <= chunk_tokens, F.lit(1)).otherwise(
        F.ceil((F.col("_n") - F.lit(chunk_tokens)).cast("double") / F.lit(stride)).cast("int") + 1
    )
    exploded = with_toks.withColumn("n_chunks", n_chunks).select(
        "doc_id",
        "n_chunks",
        "_toks",
        F.posexplode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_no", "_i"),
    )
    piece = F.slice(F.col("_toks"), F.col("chunk_no") * stride + 1, chunk_tokens)
    return exploded.select(
        "doc_id",
        "chunk_no",
        "n_chunks",
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).alias("chunk_tokens"),
    )
