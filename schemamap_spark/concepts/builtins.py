"""Built-in column concepts.

Each concept is a pure Column-expression factory over one SMO row — the Spark
equivalent of the reference's `is_<name>(smo schema_metadata_overview)`
boolean SQL functions (reference rust/create_schemamap_schema.sql:1020-1229).
Keeping these as Column expressions (never Python UDFs) means they stay inside
whole-stage codegen and cost ~nothing even over millions of column rows.

A concept factory has signature  (df: DataFrame-like column accessor) -> Column
where `smo[c]` works for any object supporting __getitem__ on column names
(a DataFrame or a struct Column), so concepts compose.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# reference SCHEMA:1020-1024 — anchored case-insensitive POSIX regex,
# translated to Java regex with an inline (?i) flag.
PII_REGEX = (
    "(?i)^(email|first_name|last_name|full_name|middle_name|phone|telephone|mobile"
    "|address|street|city|state|zip|postal|ssn|social_security|dob|date_of_birth"
    "|birthdate|credit_card|ccn|card_number|passport|driver_license|license_number"
    "|national_id|tax_id|tin|ein|bank_account|account_number|routing_number|iban"
    "|bic|swift|personal_id|medicare|medicaid|health_insurance|policy_number"
    "|insurance_number|patient_id|member_id|user_id|username|login|password"
    "|secret|token|api_key|auth)"
)

# reference SCHEMA:1030-1054 — 12 migration-framework table names.
MIGRATION_TABLE_NAMES = [
    "schema_migrations", "flyway_schema_history", "databasechangelog",
    "databasechangeloglock", "django_migrations", "alembic_version",
    "alembic_version_table", "knex_migrations", "knex_migrations_lock",
    "phinxlog", "typeorm_metadata", "goose_db_version",
]

METADATA_COLUMN_NAMES = ["created_at", "updated_at", "version"]


def _has_constraint_type(smo, ctype: str) -> Column:
    return F.exists(smo["constraints"], lambda c: c["type"] == ctype)


def _has_index_type(smo, ityp: str) -> Column:
    return F.exists(smo["indexes"], lambda i: i["type"] == ityp)


def is_pii(smo) -> Column:
    return F.lower(smo["column_name"]).rlike(PII_REGEX)


def is_metadata(smo) -> Column:
    return smo["column_name"].isin(METADATA_COLUMN_NAMES)


def is_schema_migration_table(smo) -> Column:
    return smo["table_name"].isin(MIGRATION_TABLE_NAMES)


def is_primary_key(smo) -> Column:
    return _has_constraint_type(smo, "p")


def is_foreign_key(smo) -> Column:
    return _has_constraint_type(smo, "f")


def is_unique_key(smo) -> Column:
    # reference SCHEMA:1138-1150: unique constraint OR unique index
    return _has_constraint_type(smo, "u") | _has_index_type(smo, "u")


def is_check_constrained(smo) -> Column:
    return _has_constraint_type(smo, "c")


def is_exclusion_constrained(smo) -> Column:
    return _has_constraint_type(smo, "x")


def is_indexed(smo) -> Column:
    # reference SCHEMA:1168-1179. The reference's literal list contains a
    # typo (' u' with a leading space, which never matches a single-char
    # type); we replicate the *effective* semantics: p/x constraints or
    # i/x indexes.
    return (
        F.exists(smo["constraints"], lambda c: c["type"].isin("p", "x"))
        | F.exists(smo["indexes"], lambda i: i["type"].isin("i", "x"))
    )


def is_generated(smo) -> Column:
    return _has_constraint_type(smo, "g")


def is_natural_key(smo) -> Column:
    # reference SCHEMA:1189-1197: PK with no owned sequence AND no default.
    return (
        F.exists(smo["constraints"], lambda c: (c["type"] == "p") & c["sequence_name"].isNull())
        & smo["default_value"].isNull()
    )


def is_surrogate_key(smo) -> Column:
    # concept composition (reference SCHEMA:1199-1201)
    return is_primary_key(smo) & ~is_natural_key(smo)


def is_self_reference(smo) -> Column:
    # reference SCHEMA:1203-1210: FK definition contains
    # " REFERENCES <own table>(" case-insensitively.
    needle = F.concat(F.lit(" references "), F.lower(smo["table_name"]), F.lit("("))
    return F.exists(
        smo["constraints"],
        lambda c: (c["type"] == "f") & F.lower(c["definition"]).contains(needle),
    )


def is_external_reference(smo) -> Column:
    # reference SCHEMA:1212-1224. ILIKE '_' wildcard semantics preserved by
    # using LIKE over lower() with the verbatim patterns.
    name = F.lower(smo["column_name"])
    patterns = ["%_id", "%url%", "%uri%", "%_ref%", "%_code%", "%uuid%", "%guid%", "%external_%"]
    expr = name.like(patterns[0])
    for p in patterns[1:]:
        expr = expr | name.like(p)
    return ~is_foreign_key(smo) & expr


def is_ignored_table(smo) -> Column:
    return is_schema_migration_table(smo)


BUILTIN_CONCEPTS = {
    "pii": is_pii,
    "metadata": is_metadata,
    "schema_migration_table": is_schema_migration_table,
    "primary_key": is_primary_key,
    "foreign_key": is_foreign_key,
    "unique_key": is_unique_key,
    "check_constrained": is_check_constrained,
    "exclusion_constrained": is_exclusion_constrained,
    "indexed": is_indexed,
    "generated": is_generated,
    "natural_key": is_natural_key,
    "surrogate_key": is_surrogate_key,
    "self_reference": is_self_reference,
    "external_reference": is_external_reference,
    "ignored_table": is_ignored_table,
}


def _sql_in(col: str, names: list[str]) -> str:
    return f"{col} in ({', '.join(repr(n) for n in names)})"


_SQL_PK = "exists(constraints, c -> c.type = 'p')"
_SQL_FK = "exists(constraints, c -> c.type = 'f')"
_SQL_NATURAL = (
    "exists(constraints, c -> c.type = 'p' and c.sequence_name is null)"
    " and default_value is null"
)
_SQL_EXT_LIKE = " or ".join(
    f"lower(column_name) like '{p}'"
    for p in ["%_id", "%url%", "%uri%", "%_ref%", "%_code%", "%uuid%",
              "%guid%", "%external_%"]
)

# The same 15 concepts as parse-once SQL strings — the wide_columns hot
# path (ConceptRegistry.wide_columns) uses these instead of compiling 15
# Column trees whose F.exists lambdas each cost a dozen py4j round trips
# (~0.35 s of driver wall per registry (re)build, r19 profile; guide §1.2
# driver work). Pinned equal to the Column forms row-for-row on the
# fixture SMO by tests/test_concepts.py; the Column factories above stay
# the public composition surface (`registry.column`, struct accessors).
BUILTIN_CONCEPT_SQL = {
    "pii": f"lower(column_name) rlike '{PII_REGEX}'",
    "metadata": _sql_in("column_name", METADATA_COLUMN_NAMES),
    "schema_migration_table": _sql_in("table_name", MIGRATION_TABLE_NAMES),
    "primary_key": _SQL_PK,
    "foreign_key": _SQL_FK,
    "unique_key": (
        "exists(constraints, c -> c.type = 'u')"
        " or exists(indexes, i -> i.type = 'u')"
    ),
    "check_constrained": "exists(constraints, c -> c.type = 'c')",
    "exclusion_constrained": "exists(constraints, c -> c.type = 'x')",
    "indexed": (
        "exists(constraints, c -> c.type in ('p', 'x'))"
        " or exists(indexes, i -> i.type in ('i', 'x'))"
    ),
    "generated": "exists(constraints, c -> c.type = 'g')",
    "natural_key": _SQL_NATURAL,
    "surrogate_key": f"{_SQL_PK} and not ({_SQL_NATURAL})",
    "self_reference": (
        "exists(constraints, c -> c.type = 'f' and contains("
        "lower(c.definition), concat(' references ', lower(table_name), '(')))"
    ),
    "external_reference": f"(not {_SQL_FK}) and ({_SQL_EXT_LIKE})",
    "ignored_table": _sql_in("table_name", MIGRATION_TABLE_NAMES),
}
