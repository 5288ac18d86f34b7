"""Staging readers for the declared import sources
(reference rust/create_schemamap_schema.sql:419-426: POSTGRES,
GOOGLE_SPREADSHEET, XLSX, CSV, SALESFORCE).

CSV and JSON are first-class Spark sources. XLSX / Google Sheets / Salesforce
need client libraries absent from this container; they are modeled as
API→Arrow→DataFrame adapters and stubbed behind clear errors, with the
DataFrame-side contract (all-string staging columns, header row) identical to
the CSV path so the rest of the pipeline is source-agnostic.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession


def read_staging_csv(spark: SparkSession, path: str) -> DataFrame:
    """Staging tables are all-string by design (the reference loads into
    unlogged text-typed staging tables; typing happens via mapping fns)."""
    return (
        spark.read.option("header", "true")
        .option("inferSchema", "false")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_json_doc(path: str) -> dict:
    """Whole-document JSON (i18n store ingest — reference
    clojure/src/io/schemamap/core.clj:18-33)."""
    with open(path) as f:
        return json.load(f)


def read_staging_xlsx(spark: SparkSession, path: str) -> DataFrame:
    """XLSX staging. Requires an excel reader (e.g. openpyxl → Arrow) not
    present in this container; the contract matches read_staging_csv."""
    try:
        import openpyxl  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "XLSX staging requires openpyxl; declared source kept for parity "
            "with the reference's XLSX import source"
        ) from e
    import pandas as pd

    pdf = pd.read_excel(path, dtype=str)
    return spark.createDataFrame(pdf)


def read_google_sheet(spark: SparkSession, spreadsheet_id: str, range_a1: str = "A:Z") -> DataFrame:
    """GOOGLE_SPREADSHEET source (declared by the reference,
    SCHEMA:421). Contract: Sheets API values → all-string DataFrame with the
    first row as header — identical downstream shape to read_staging_csv.
    The API client is not available in this container."""
    raise NotImplementedError(
        "Google Sheets staging requires the Sheets API client; contract: "
        "values[0] = header, remaining rows all-string, then the standard "
        "mapping/validation pipeline applies"
    )


def read_salesforce(spark: SparkSession, soql: str) -> DataFrame:
    """SALESFORCE source (declared by the reference, SCHEMA:425). Contract:
    Bulk API 2.0 query → CSV batches → all-string DataFrame. Client not
    available in this container."""
    raise NotImplementedError(
        "Salesforce staging requires simple-salesforce / Bulk API; contract: "
        "SOQL → CSV batches → read_staging_csv-shaped DataFrame"
    )


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    properties: dict | None = None,
) -> DataFrame:
    """POSTGRES source. At scale, always pass partition_column + bounds so the
    read parallelizes across executors instead of one connection."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound or 0))
            .option("upperBound", str(upper_bound or 1_000_000))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()
