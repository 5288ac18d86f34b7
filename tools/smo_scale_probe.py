"""SMO catalog flagship at ~18M column rows — the committed version of the
round-6 ad-hoc probe, extended with the round-7 ask: what does DEFINING A
16TH CONCEPT and rebuilding the dynamic wide view cost at that scale?

Corpus: the fixture catalog (175 relations / 1,760 columns / 410
constraints) replicated R times with schema names prefixed per replica
(FK ref_schema prefixed too, so the constraint graph stays closed inside
each replica) — the "thousands of tenant schemas on one cluster" shape.
R=10,400 ≈ 18.3M column rows ≈ 15,000× the reference's tested corpus
(1,236 columns; its only ceiling is statement_timeout=100s).

Measured:
  1. status cold (build_smo + all 15 built-in concepts + one agg pass)
  2. status warm (second run, same plans)
  3. define_concept #16 → wide-view rebuild + status again (the X3
     dynamic-rebuild delta), plus one consumer query of the new concept

Run:  python tools/smo_scale_probe.py [R]      (default 10,400)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 18M-row SMO aggregation needs more than the 8g test-suite default heap
# (local[32] shares one JVM); the probe box has 128 GiB.
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

R = int(sys.argv[1]) if len(sys.argv) > 1 else 10_400


def main() -> None:
    from pyspark.sql import functions as F

    from schemamap_spark.catalog.base import CatalogAdapter
    from schemamap_spark.catalog.fixture import FixtureCatalog
    from schemamap_spark.engine import SchemamapEngine
    from schemamap_spark.session import get_spark

    spark = get_spark("smo-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = FixtureCatalog(spark)

    def replicate(df, extra_schema_cols=()):
        reps = spark.range(R).select(F.col("id").alias("_rep"))
        out = df.crossJoin(reps)
        for c in ("schema_name", *extra_schema_cols):
            out = out.withColumn(
                c,
                F.when(
                    F.col(c).isNotNull(),
                    F.concat(F.lit("r"), F.col("_rep").cast("string"), F.lit("_"), F.col(c)),
                ),
            )
        return out.drop("_rep")

    class ReplicatedCatalog(CatalogAdapter):
        def relations(self):
            return replicate(base.relations())

        def columns(self):
            return replicate(base.columns())

        def constraints(self):
            return replicate(base.constraints(), extra_schema_cols=("ref_schema",))

        def indexes(self):
            return replicate(base.indexes())

        def role_edges(self):
            return base.role_edges()

        def table_grants(self):
            return base.table_grants()

    eng = SchemamapEngine(spark, ReplicatedCatalog())
    n_cols = eng.smo().count()

    t0 = time.monotonic()
    st_cold = eng.status().collect()[0]
    t_cold = time.monotonic() - t0
    t0 = time.monotonic()
    eng.status().collect()
    t_warm = time.monotonic() - t0

    # the round-7 ask: concept #16 + dynamic wide-view rebuild + status
    t0 = time.monotonic()
    eng.concepts.define(
        "has_default", lambda smo: smo["default_value"].isNotNull()
    )
    st16 = eng.status().collect()[0]
    t_define = time.monotonic() - t0
    t0 = time.monotonic()
    n_new = eng.columns().filter(F.col("is_has_default")).count()
    t_consumer = time.monotonic() - t0

    # production posture: nightly refresh persists the SMO snapshot, the
    # interactive status reads the parquet instead of re-deriving the
    # catalog join (the r6 ad-hoc "warm" number's actual shape)
    import shutil

    wh = "/tmp/smo_scale_probe_wh"
    shutil.rmtree(wh, ignore_errors=True)
    cached = SchemamapEngine(spark, ReplicatedCatalog(), warehouse_dir=wh)
    t0 = time.monotonic()
    cached.refresh()
    t_refresh = time.monotonic() - t0
    # serving posture: refresh-persist ONCE, then N interactive status
    # calls — the median is the number a dashboard user actually feels
    t_statuses = []
    for _ in range(5):
        t0 = time.monotonic()
        cached.status().collect()
        t_statuses.append(time.monotonic() - t0)
    t_status_med = sorted(t_statuses)[len(t_statuses) // 2]

    print("\n=== SMO catalog scale probe ===")
    print(f"{R:,} replicas -> {n_cols:,} column rows "
          f"({n_cols / 1236:.0f}x the reference's tested corpus)")
    print(f"status cold (build_smo + 15 concepts + agg): {t_cold:.1f}s")
    print(f"status warm:                                 {t_warm:.1f}s")
    print(f"define 16th concept + rebuild + status:      {t_define:.1f}s")
    print(f"new-concept consumer count ({n_new:,} rows):  {t_consumer:.1f}s")
    print(f"warehouse refresh (persist snapshot):        {t_refresh:.1f}s")
    print(f"status from persisted snapshot (5 calls):    "
          f"median {t_status_med:.1f}s "
          f"[{' '.join(f'{t:.1f}' for t in t_statuses)}]")
    print(f"status sanity: {st_cold.table_count:,} tables, "
          f"{st_cold.column_count:,} columns; 16-concept status matches: "
          f"{st16.column_count == st_cold.column_count}")


if __name__ == "__main__":
    main()
