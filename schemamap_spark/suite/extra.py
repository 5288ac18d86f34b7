"""Parity-only registry: value-checked queries that do NOT ride the driver's
50-slot correctness gate.

The driver caps queries() at 50 entries, so coverage that outgrows the cap
lands here instead of silently losing its oracle: tools/parity.py and
tests/test_oracle_parity.py run these exactly like driver entries (rows +
schema + order-insensitive value hash vs DuckDB). Current entries:

- q33_cube: demoted from the driver registry in round 5 (slot given to
  quality_quantile_filter); CUBE's grouping-sets machinery is also proven by
  q28_rollup, this keeps the full value-check.
- incremental_dedup: the daily-ingest exact-dedup shape (batch 2 anti-joins
  its digests against batch 1's persisted fingerprint store). DuckDB replays
  the digest anti-join exactly, value-checking the incremental path outside
  the repo's own two-batch == full-batch pytest.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from schemamap_spark.session import load_table
from schemamap_spark.suite.relational import Q33_CUBE_ORACLE, q33_cube


def incremental_dedup(spark, sf):
    """Split documents into two deterministic batches (doc_id parity); batch
    2 dedups against batch 1's fingerprint store without re-reading batch
    1's text. Output: batch 2's surviving (doc_id, fingerprint) rows — one
    min-id representative per digest, minus anything already in the store."""
    from schemamap_spark.operators.dedup import incremental_exact_dedup

    docs = load_table(spark, sf, "documents")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    _, store1 = incremental_exact_dedup(b1)
    fresh2, _ = incremental_exact_dedup(b2, store1)
    return fresh2.select("doc_id", "fingerprint").orderBy("doc_id")


EXTRA_SPARK_QUERIES = {
    "q33_cube": q33_cube,
    "incremental_dedup": incremental_dedup,
}

EXTRA_ORACLE_SQL = {
    "q33_cube": Q33_CUBE_ORACLE,
    "incremental_dedup": """
        with fp as (
          select doc_id, md5(lower(trim(text))) as fingerprint from documents
        ),
        b1 as (select * from fp where doc_id % 2 = 0),
        b2 as (select * from fp where doc_id % 2 = 1),
        reps as (select fingerprint, min(doc_id) as doc_id from b2 group by 1)
        select r.doc_id, r.fingerprint
        from reps r
        where not exists (select 1 from b1 where b1.fingerprint = r.fingerprint)
        order by r.doc_id
    """,
}
