"""Byte-pair-encoding subword tokenization: sample-trained, corpus-applied.

Token budgeting (mixture_sample), sequence packing (pack_sequences), and
chunking all consume TOKEN counts; the whitespace/regex counters in
functions/text.py approximate them, this module provides real learned
subwords. The split mirrors how production tokenizer pipelines actually
run (HF tokenizers train on corpus samples, not the corpus):

- `bpe_train`: classic word-frequency BPE (Sennrich et al. 2016, public
  algorithm) on a DETERMINISTIC hash-ordered sample — the bounded driver
  collect pattern pq_train/IVF centroids already use. Ties in pair
  frequency break lexicographically, so the merge list is a pure function
  of the sample.
- `bpe_tokenize`: applies the learned merges corpus-wide in mapInPandas
  (Arrow batches, self-contained closure) with a per-batch word cache —
  each DISTINCT word is encoded once per batch, so cost tracks vocabulary,
  not token count. No shuffle: tokenization is a narrow map.

The end-of-word marker `</w>` rides the last subword of each word, so the
encoding is losslessly invertible (test-pinned roundtrip).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"


def _word_freqs(texts: list[str]) -> dict[str, int]:
    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    return freqs


def _encode_word(word: str, rank: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge application (the standard decoder)."""
    syms = list(word[:-len(END)]) + [END] if word.endswith(END) else list(word)
    while len(syms) > 1:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = rank.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        syms[best : best + 2] = [syms[best] + syms[best + 1]]
    return syms


def bpe_train(
    docs: DataFrame,
    num_merges: int = 200,
    sample_docs: int = 10_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn `num_merges` BPE merges from a hash-ordered corpus sample.
    Deterministic: sample order is xxhash64(id), pair ties break on the
    lexicographically smallest pair. Returns the ordered merge list (rank
    = list position) — plain data, shipped to executors via task closures
    like PQ codebooks."""
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    rows = (
        docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
        .orderBy(F.xxhash64(F.col("_id").cast("string")), "_id")
        .limit(sample_docs)
        .collect()
    )
    freqs = _word_freqs([r._t for r in rows if r._t])
    if not freqs:
        raise ValueError("bpe_train: sample contains no words")
    # word -> symbol sequence (chars + end marker)
    seqs: dict[str, list[str]] = {w: list(w) + [END] for w in freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for w, syms in seqs.items():
            f = freqs[w]
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + f
        if not pair_counts:
            break
        # max count, ties -> lexicographically smallest pair (determinism)
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        if pair_counts[best] < 2:
            break  # nothing left that actually repeats
        merges.append(best)
        a, b = best
        ab = a + b
        for w, syms in seqs.items():
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges


def bpe_tokenize(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """(id, bpe_tokens array<string>, bpe_token_count): the learned-subword
    segmentation of every document. mapInPandas with a per-task word cache
    (bounded at 1M entries, cleared when full); the closure is
    self-contained (workers never import this package)."""
    import pandas as pd  # noqa: F401  (worker-side dependency, checked here)

    from pyspark.sql import types as T

    rank = {tuple(m): i for i, m in enumerate(merges)}
    end = END

    schema = T.StructType([
        T.StructField(id_col, docs.schema[id_col].dataType),
        T.StructField(out_col, T.ArrayType(T.StringType())),
        T.StructField("bpe_token_count", T.IntegerType()),
    ])

    def gen(batches):
        import pandas as _pd

        # word cache persists across the partition's Arrow batches (each
        # DISTINCT word encodes once per task) but is BOUNDED: web-scale
        # partitions can carry millions of distinct words, and an unbounded
        # dict of subword lists would grow executor memory for the task's
        # lifetime
        cache: dict[str, list[str]] = {}
        cache_cap = 1_000_000

        def enc_word(word):
            got = cache.get(word)
            if got is None:
                syms = list(word) + [end]
                while len(syms) > 1:
                    best, best_rank = None, None
                    for i in range(len(syms) - 1):
                        r = rank.get((syms[i], syms[i + 1]))
                        if r is not None and (best_rank is None or r < best_rank):
                            best, best_rank = i, r
                    if best is None:
                        break
                    syms[best : best + 2] = [syms[best] + syms[best + 1]]
                got = syms
                if len(cache) >= cache_cap:
                    cache.clear()
                cache[word] = got
            return got

        for pdf in batches:
            toks = [
                [s for w in (t.split(" ") if t else []) if w for s in enc_word(w)]
                for t in pdf[text_col]
            ]
            yield _pd.DataFrame({
                id_col: pdf[id_col],
                out_col: toks,
                "bpe_token_count": [len(t) for t in toks],
            })

    from schemamap_spark.session import ensure_parallelism

    return ensure_parallelism(docs, id_col).select(id_col, text_col).mapInPandas(
        gen, schema
    )


def bpe_decode_tokens(tokens: list[str]) -> str:
    """Inverse of the encoding: concatenate subwords, split words at the
    end-of-word marker (driver-side helper for tests/debugging)."""
    return " ".join(w for w in "".join(tokens).split(END) if w != "")
