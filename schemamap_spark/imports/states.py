"""Data-migration state machine.

States and comments mirror the reference's `data_migration_states` enum table
(rust/create_schemamap_schema.sql:404-412) and `data_migrations` bookkeeping
(SCHEMA:428-450): LOADING → LOADED → IMPORTING → IMPORTED with failure exits.
"""

from __future__ import annotations

import enum


class MigrationState(str, enum.Enum):
    LOADING = "LOADING"
    LOADED = "LOADED"
    LOAD_FAILED = "LOAD_FAILED"
    IMPORTING = "IMPORTING"
    IMPORTED = "IMPORTED"
    IMPORT_FAILED = "IMPORT_FAILED"


VALID_TRANSITIONS: dict[MigrationState, set[MigrationState]] = {
    MigrationState.LOADING: {MigrationState.LOADED, MigrationState.LOAD_FAILED},
    MigrationState.LOADED: {MigrationState.IMPORTING},
    MigrationState.LOAD_FAILED: {MigrationState.LOADING},
    MigrationState.IMPORTING: {MigrationState.IMPORTED, MigrationState.IMPORT_FAILED},
    MigrationState.IMPORTED: set(),
    MigrationState.IMPORT_FAILED: {MigrationState.IMPORTING},
}

IMPORT_SOURCES = ("POSTGRES", "GOOGLE_SPREADSHEET", "XLSX", "CSV", "SALESFORCE")


def check_transition(current: MigrationState, new: MigrationState) -> None:
    if new not in VALID_TRANSITIONS[current]:
        raise ValueError(f"invalid migration state transition {current.value} -> {new.value}")
