"""CLI porcelain: init / status / refresh / doctor / snapshot / restore / list.

JSON to stdout, logs to stderr (pipeable to jq) — the reference CLI's contract
(rust/src/main.rs:31-33, porcelain.rs:113-118).

Usage: python -m schemamap_spark.cli <command> [--warehouse DIR] [--fixtures DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import functions as F


def _engine(args):
    from schemamap_spark import SchemamapEngine
    from schemamap_spark.catalog import FixtureCatalog, JdbcPostgresCatalog
    from schemamap_spark.session import get_spark

    spark = get_spark("schemamap-cli")
    spark.sparkContext.setLogLevel("ERROR")
    if getattr(args, "postgres", False) or getattr(args, "conn", None):
        # Postgres mode: connection resolved via the reference's inference
        # chain (--conn > DATABASE_URL/PG* > docker-compose > supabase >
        # ~/.pgpass > defaults), with --dbname/--username/--port overrides.
        from schemamap_spark.sources.pgconfig import resolve_pg_config

        cfg = resolve_pg_config(
            conn=getattr(args, "conn", None),
            dbname=getattr(args, "dbname", None),
            username=getattr(args, "username", None),
            port=getattr(args, "port", None),
        )
        print(
            f"using postgres config from {cfg.source}: host={cfg.host} "
            f"port={cfg.port} user={cfg.user} dbname={cfg.dbname}",
            file=sys.stderr,
        )
        catalog = JdbcPostgresCatalog(spark, cfg.jdbc_url(), cfg.properties())
    else:
        catalog = FixtureCatalog(spark, args.fixtures) if args.fixtures else FixtureCatalog(spark)
    return SchemamapEngine(spark, catalog, warehouse_dir=args.warehouse)


def cmd_init(args) -> dict:
    """Versioned bootstrap (Flyway parity, reference core.clj:9-16): each
    step is a migration recorded in <warehouse>/schema_version.json;
    re-running init applies only what's missing."""
    from schemamap_spark.plans.versioning import Migration, SchemaVersionStore, apply_migrations

    eng = _engine(args)
    wh = args.warehouse or os.path.join(os.getcwd(), "warehouse")
    eng.warehouse_dir = eng.warehouse_dir or wh
    migrations = [
        Migration(1, f"create warehouse layout at {wh}", lambda: os.makedirs(wh, exist_ok=True)),
        Migration(2, "seed bidi mapping registry (trim_str/identity/split_comma_array)",
                  lambda: None),
        Migration(3, "seed data-migration states + sources", lambda: None),
        Migration(4, "build schema-metadata-overview snapshot", lambda: eng.refresh()),
    ]
    store = SchemaVersionStore(wh)
    if args.dry_run:
        plan = apply_migrations(store, migrations, dry_run=True)
        return {"dry_run": True, "plan": plan, "current_version": store.current()}
    done = apply_migrations(store, migrations)
    return {
        "initialized": True, "steps": done, "warehouse": wh,
        "schema_version": store.current(),
    }


def cmd_status(args) -> dict:
    eng = _engine(args)
    if args.refresh:
        eng.refresh()
    return json.loads(eng.status_json())


def cmd_refresh(args) -> dict:
    eng = _engine(args)
    eng.refresh()
    return {"refreshed": True, "columns": eng.smo().count()}


def cmd_doctor(args) -> dict:
    """Role-closure + grant-aggregation health report (engine.doctor,
    reference rust/src/doctor.rs:58-132)."""
    eng = _engine(args)
    if args.fixtures:
        edges = eng.spark.read.parquet(os.path.join(args.fixtures, "role_edges.parquet"))
        grants = eng.spark.read.parquet(os.path.join(args.fixtures, "table_grants.parquet"))
        return eng.doctor(edges, grants)
    return eng.doctor()


def cmd_snapshot(args) -> dict:
    from schemamap_spark.snapshots import SnapshotManager

    return SnapshotManager(args.warehouse).create(args.name)


def cmd_restore(args) -> dict:
    from schemamap_spark.snapshots import SnapshotManager

    return SnapshotManager(args.warehouse).restore(args.name)


def cmd_list(args) -> dict:
    from schemamap_spark.snapshots import SnapshotManager

    return {"snapshots": SnapshotManager(args.warehouse).list()}


def main(argv: list[str] | None = None) -> int:
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--warehouse", default=None)
    common.add_argument("--fixtures", default=None)
    common.add_argument("--postgres", action="store_true",
                        help="introspect a live Postgres (config inferred)")
    common.add_argument("--conn", default=None,
                        help="admin PG connection string (also via DATABASE_URL)")
    common.add_argument("--username", default=None, help="admin PG username")
    common.add_argument("--dbname", default=None, help="PG database name")
    common.add_argument("--port", type=int, default=None, help="PG database port")

    p = argparse.ArgumentParser(prog="schemamap-spark")
    sub = p.add_subparsers(dest="command", required=True)
    sp = sub.add_parser("init", parents=[common])
    sp.add_argument("--dry-run", action="store_true")
    sp = sub.add_parser("status", parents=[common])
    sp.add_argument("--refresh", action="store_true", default=True)
    sp.add_argument("--no-refresh", dest="refresh", action="store_false")
    sub.add_parser("refresh", parents=[common])
    sub.add_parser("doctor", parents=[common])
    for name in ("snapshot", "restore"):
        sp = sub.add_parser(name, parents=[common])
        sp.add_argument("name")
    sub.add_parser("list", parents=[common])

    args = p.parse_args(argv)
    handler = {
        "init": cmd_init, "status": cmd_status, "refresh": cmd_refresh,
        "doctor": cmd_doctor, "snapshot": cmd_snapshot, "restore": cmd_restore,
        "list": cmd_list,
    }[args.command]
    try:
        out = handler(args)
    except Exception as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    print(json.dumps(out, indent=2, sort_keys=True, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
