"""Staging readers for the declared import sources
(reference rust/create_schemamap_schema.sql:419-426: POSTGRES,
GOOGLE_SPREADSHEET, XLSX, CSV, SALESFORCE).

CSV and JSON are first-class Spark sources. XLSX is read natively (stdlib
zip + SpreadsheetML parse — no client library). Google Sheets / Salesforce
split transport from adaptation: the payload→DataFrame adapters
(sheet_values_to_df, soql_csv_batches_to_df) are real, tested code; only
the API fetch itself is an injectable callable that raises without a client
(none ships in this container). All staging readers share one contract —
all-string columns, first row is the header — so the rest of the pipeline
is source-agnostic.
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


_XLSX_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_XLSX_REL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


def _xlsx_col_index(cell_ref: str | None, fallback: int) -> int:
    """'BC12' -> 54 (0-based). Cells may omit r=; use positional fallback."""
    if not cell_ref:
        return fallback
    n = 0
    for ch in cell_ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return n - 1 if n else fallback


def read_staging_xlsx(spark: SparkSession, path: str, sheet: str | None = None) -> DataFrame:
    """XLSX staging reader — pure stdlib (zipfile + ElementTree), no client
    library: XLSX is a zip of SpreadsheetML parts. First row is the header;
    every value arrives as a string (same contract as read_staging_csv, so
    mapping/validation downstream is source-agnostic). Handles shared-string,
    inline-string, boolean, and numeric cells, sparse rows, and sheet
    selection by name.

    Scale note: a spreadsheet is a driver-side small file by nature (the
    reference treats XLSX as a hand-authored staging source, SCHEMA:419-426);
    the parsed rows are parallelized into the cluster immediately, and bulk
    data should arrive as CSV/Parquet/JDBC instead."""
    import xml.etree.ElementTree as ET
    import zipfile

    def _text(el) -> str:
        return "".join(t.text or "" for t in el.iter(f"{_XLSX_NS}t"))

    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            for si in ET.fromstring(z.read("xl/sharedStrings.xml")).iter(f"{_XLSX_NS}si"):
                shared.append(_text(si))

        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rid_target = {r.get("Id"): r.get("Target") for r in rels}
        sheet_target = None
        for s in wb.iter(f"{_XLSX_NS}sheet"):
            if sheet is None or s.get("name") == sheet:
                sheet_target = rid_target[s.get(f"{_XLSX_REL_NS}id")]
                break
        if sheet_target is None:
            raise ValueError(f"sheet {sheet!r} not found in {path}")
        part = sheet_target.lstrip("/")
        if not part.startswith("xl/"):
            part = "xl/" + part

        grid: list[dict[int, str]] = []
        for row in ET.fromstring(z.read(part)).iter(f"{_XLSX_NS}row"):
            cells: dict[int, str] = {}
            pos = 0
            for c in row.findall(f"{_XLSX_NS}c"):
                idx = _xlsx_col_index(c.get("r"), pos)
                pos = idx + 1
                ctype = c.get("t", "n")
                v = c.find(f"{_XLSX_NS}v")
                if ctype == "s" and v is not None and v.text is not None:
                    cells[idx] = shared[int(v.text)]
                elif ctype == "inlineStr":
                    is_el = c.find(f"{_XLSX_NS}is")
                    cells[idx] = _text(is_el) if is_el is not None else ""
                elif ctype == "b" and v is not None:
                    cells[idx] = "true" if v.text == "1" else "false"
                elif v is not None and v.text is not None:
                    cells[idx] = v.text
            grid.append(cells)

    if not grid:
        raise ValueError(f"empty worksheet in {path}")
    width = max(max(r, default=-1) for r in grid) + 1
    header = [grid[0].get(i) or f"col_{i}" for i in range(width)]
    data = [tuple(r.get(i) for i in range(width)) for r in grid[1:]]
    schema = ", ".join(f"`{h}` string" for h in header)
    return spark.createDataFrame(data, schema)


def sheet_values_to_df(spark: SparkSession, values: list[list]) -> DataFrame:
    """Sheets-API `values` payload → all-string staging DataFrame (first row
    is the header). This is the REAL adapter half of the GOOGLE_SPREADSHEET
    source: the API omits trailing empty cells, so rows arrive RAGGED and are
    padded to header width with NULLs; non-string cells (the API can return
    numbers/booleans under some valueRenderOptions) are stringified to keep
    the all-string staging contract."""
    if not values or not values[0]:
        raise ValueError("sheet payload has no header row")
    # None/empty/whitespace headers fall back to positional names (same
    # contract as the XLSX reader), and repeated names get a positional
    # suffix — duplicate columns would make every downstream select ambiguous.
    header: list[str] = []
    seen: set[str] = set()
    for i, h in enumerate(values[0]):
        name = str(h).strip() if h is not None and str(h).strip() else f"col_{i}"
        if name in seen:
            name = f"{name}_{i}"
        seen.add(name)
        header.append(name)
    width = len(header)

    def norm(cell):
        if cell is None:
            return None
        if isinstance(cell, bool):
            return "true" if cell else "false"
        return str(cell)

    data = [
        tuple(norm(row[i]) if i < len(row) else None for i in range(width))
        for row in values[1:]
    ]
    schema = ", ".join(f"`{h}` string" for h in header)
    return spark.createDataFrame(data, schema)


def read_google_sheet(
    spark: SparkSession,
    spreadsheet_id: str,
    range_a1: str = "A:Z",
    fetch_values=None,
) -> DataFrame:
    """GOOGLE_SPREADSHEET source (declared by the reference, SCHEMA:421).

    Transport and adaptation are split: `fetch_values(spreadsheet_id,
    range_a1) -> list[list]` is the ONLY part that needs the Sheets API
    client (inject it on a real deployment); everything after the fetch —
    ragged-row padding, header contract, stringification — is real code
    (sheet_values_to_df) shared with tests. Without a fetcher this raises:
    no API client ships in this container."""
    if fetch_values is None:
        raise NotImplementedError(
            "Google Sheets staging requires a Sheets API client; pass "
            "fetch_values=lambda sid, rng: service.spreadsheets().values()"
            ".get(spreadsheetId=sid, range=rng).execute()['values']"
        )
    return sheet_values_to_df(spark, fetch_values(spreadsheet_id, range_a1))


def soql_csv_batches_to_df(spark: SparkSession, batches: list[str]) -> DataFrame:
    """Bulk-API CSV result batches → all-string staging DataFrame. The REAL
    adapter half of the SALESFORCE source: each batch is a complete CSV
    document WITH its own header row (that's the Bulk API 2.0 result shape);
    headers after the first batch are validated and dropped. Driver-side
    stdlib csv parse (batches are bounded API pages), then parallelized."""
    import csv
    import io

    header: list[str] | None = None
    rows: list[tuple] = []
    for batch in batches:
        if not batch.strip():
            continue
        parsed = list(csv.reader(io.StringIO(batch)))
        if not parsed:
            continue
        if header is None:
            header = parsed[0]
        elif parsed[0] != header:
            raise ValueError(
                f"inconsistent batch header: {parsed[0]!r} != {header!r}"
            )
        width = len(header)
        rows.extend(
            tuple((r[i] if i < len(r) else None) for i in range(width))
            for r in parsed[1:]
        )
    if header is None:
        raise ValueError("no CSV batches with content")
    schema = ", ".join(f"`{h}` string" for h in header)
    return spark.createDataFrame(rows, schema)


def read_salesforce(
    spark: SparkSession, soql: str, fetch_batches=None
) -> DataFrame:
    """SALESFORCE source (declared by the reference, SCHEMA:425).

    Same transport/adapter split as read_google_sheet: `fetch_batches(soql)
    -> list[str]` wraps the Bulk API 2.0 job (inject simple-salesforce or
    raw REST on a deployment); CSV-batch assembly is real, tested code
    (soql_csv_batches_to_df). Without a fetcher this raises: no client ships
    in this container."""
    if fetch_batches is None:
        raise NotImplementedError(
            "Salesforce staging requires a Bulk API client; pass "
            "fetch_batches=lambda soql: [locator CSV pages from "
            "/jobs/query/{id}/results]"
        )
    return soql_csv_batches_to_df(spark, fetch_batches(soql))


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
