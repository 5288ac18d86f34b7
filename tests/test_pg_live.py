"""Live-Postgres validation of the JDBC catalog pushdown SQL.

Boots an embedded Postgres (initdb + pg_ctl on a unix socket in a tmpdir),
loads the reference's fixture mini-schema (docker/test_app_migrations/
V001__add_organizations.sql:1-15) plus a generated column and an extra
index, then executes all four pushdown queries from catalog/jdbc.py through
psql and asserts the introspection facts the SMO builder depends on.

This exercises the exact SQL text a production deployment pushes down; only
the Spark JDBC wire transport remains untested here (no Postgres JDBC driver
jar in the container — documented in COVERAGE.md). Runs as an unprivileged
user when invoked as root (Postgres refuses root); skips cleanly when the
server binaries are unavailable.
"""

from __future__ import annotations

import csv
import io
import os
import shutil
import subprocess
import time

import pytest

PGBIN = {name: shutil.which(name) for name in ("initdb", "pg_ctl", "psql")}

pytestmark = pytest.mark.skipif(
    not all(PGBIN.values()), reason="postgres binaries not available"
)


def _run_as_pg(cmd: list[str], **kw) -> subprocess.CompletedProcess:
    """Run a server-side command, dropping to 'nobody' when root."""
    if os.geteuid() == 0:
        cmd = ["su", "-s", "/bin/sh", "nobody", "-c", " ".join(cmd)]
    return subprocess.run(cmd, capture_output=True, text=True, cwd="/tmp", **kw)


FIXTURE_DDL = """
create table organizations (
    id bigserial primary key,
    name text not null unique check (char_length(name) between 3 and 255),
    created_at timestamptz not null default now(),
    website text check (website like 'http%')
);
create table projects (
    id bigserial primary key,
    organization_id bigint references organizations,
    name text not null check (char_length(name) between 1 and 255),
    created_at timestamptz not null default now(),
    description text check(char_length(name) < 400),
    name_upper text generated always as (upper(name)) stored,
    unique (organization_id, name)
);
create index projects_created_at_idx on projects (created_at);
insert into organizations (name, website) values ('Acme Corp', 'https://acme.test');
insert into projects (organization_id, name) values (1, 'Apollo');
create role schemamap nologin;
create role app_admin nologin;
create role app_user nologin;
grant schemamap to app_admin;   -- app_admin member-of schemamap
grant app_admin to app_user;    -- app_user member-of app_admin (2-hop chain)
grant select, insert on organizations to app_admin;
grant select on projects to app_admin;
analyze;
"""


@pytest.fixture(scope="module")
def pg(tmp_path_factory):
    import tempfile

    if os.geteuid() == 0:
        # pytest's tmp dirs sit under 0700 parents the unprivileged server
        # user cannot traverse; use a directly-reachable /tmp dir instead
        base_str = tempfile.mkdtemp(prefix="pglive_", dir="/tmp")
        os.chmod(base_str, 0o777)
        shutil.chown(base_str, user="nobody")
    else:
        base_str = str(tmp_path_factory.mktemp("pglive"))
    from pathlib import Path

    base = Path(base_str)
    data = str(base / "data")
    r = _run_as_pg([PGBIN["initdb"], "-D", data, "-U", "pgtester", "--no-sync"])
    if r.returncode != 0:
        pytest.skip(f"initdb failed: {r.stderr[-300:]}")
    r = _run_as_pg([
        PGBIN["pg_ctl"], "-D", data,
        "-o", f"'-k {base} -c listen_addresses='",
        "-l", str(base / "log"), "start",
    ])
    if r.returncode != 0:
        pytest.skip(f"pg_ctl start failed: {r.stderr[-300:]}")
    time.sleep(0.5)
    conn = {"host": str(base), "user": "pgtester", "db": "postgres"}
    try:
        sql(conn, FIXTURE_DDL)
        yield conn
    finally:
        _run_as_pg([PGBIN["pg_ctl"], "-D", data, "-m", "immediate", "stop"])
        shutil.rmtree(base, ignore_errors=True)


def sql(conn: dict, text: str) -> list[dict]:
    r = subprocess.run(
        [PGBIN["psql"], "-h", conn["host"], "-U", conn["user"], "-d", conn["db"],
         "--csv", "-v", "ON_ERROR_STOP=1", "-X", "-q"],
        input=text, capture_output=True, text=True, cwd="/tmp",
    )
    assert r.returncode == 0, f"psql failed: {r.stderr}"
    if not r.stdout.strip():
        return []
    return list(csv.DictReader(io.StringIO(r.stdout)))


def test_relations_pushdown(pg):
    from schemamap_spark.catalog.jdbc import RELATIONS_SQL

    rows = {r["table_name"]: r for r in sql(pg, RELATIONS_SQL)}
    assert {"organizations", "projects"} <= set(rows)
    assert rows["organizations"]["object_type"] == "r"
    assert rows["organizations"]["has_usage"] == "t"
    assert rows["organizations"]["schema_name"] == "public"
    # reltuples after analyze reflects the seeded row
    assert int(rows["organizations"]["approx_rows"]) >= 0


def test_columns_pushdown(pg):
    from schemamap_spark.catalog.jdbc import COLUMNS_SQL

    rows = sql(pg, COLUMNS_SQL)
    cols = {(r["table_name"], r["column_name"]): r for r in rows}
    name = cols[("organizations", "name")]
    assert name["not_null"] == "t"
    assert name["data_type"] == "text"
    oid = cols[("organizations", "id")]
    assert "nextval" in oid["default_value"]
    assert int(oid["attnum"]) > 0
    assert cols[("organizations", "created_at")]["data_type"] == "timestamp with time zone"


def test_constraints_pushdown(pg):
    from schemamap_spark.catalog.jdbc import CONSTRAINTS_SQL

    rows = sql(pg, CONSTRAINTS_SQL)
    by_type = {}
    for r in rows:
        by_type.setdefault((r["table_name"], r["constraint_type"]), []).append(r)

    # primary key with its backing sequence resolved
    pk = by_type[("organizations", "p")][0]
    assert pk["sequence_name"] == "public.organizations_id_seq"
    assert pk["keys"] == "{1}"
    # foreign key names the referenced relation
    fk = by_type[("projects", "f")][0]
    assert (fk["ref_schema"], fk["ref_table"]) == ("public", "organizations")
    assert "REFERENCES organizations" in fk["definition"]
    # unique + check constraints surface
    assert ("organizations", "u") in by_type
    assert ("organizations", "c") in by_type
    # generated column arrives as the 'g' pseudo-constraint (SMO is_generated)
    gen = by_type[("projects", "g")][0]
    assert gen["constraint_name"] == "generated_column"
    assert "upper" in gen["definition"]


def test_indexes_pushdown(pg):
    from schemamap_spark.catalog.jdbc import INDEXES_SQL

    rows = sql(pg, INDEXES_SQL)
    by_name = {r["index_name"]: r for r in rows}
    # primary-key indexes are excluded by indisprimary = false
    assert "organizations_pkey" not in by_name
    # unique-constraint backing index classified 'u'
    uq = by_name["organizations_name_key"]
    assert uq["index_type"] == "u"
    assert uq["immediate"] == "t"
    # plain index classified 'i', USING prefix stripped, int2vector keys cast
    plain = by_name["projects_created_at_idx"]
    assert plain["index_type"] == "i"
    assert plain["definition"].startswith("btree (")
    assert plain["keys"] == "{4}"  # created_at is attnum 4


def test_role_edges_pushdown_feeds_closure(pg, spark):
    """Live role-membership edges from the server, transitive closure in
    Spark — the engine's split of the reference doctor's recursive SQL."""
    from schemamap_spark.catalog.jdbc import ROLE_EDGES_SQL
    from schemamap_spark.operators.graph import transitive_closure

    rows = sql(pg, ROLE_EDGES_SQL)
    edges = {(r["member"], r["roleof"]) for r in rows}
    assert ("app_admin", "schemamap") in edges
    assert ("app_user", "app_admin") in edges

    df = spark.createDataFrame(
        [(r["member"], r["roleof"]) for r in rows], "member string, roleof string"
    )
    closure = {(r.member, r.roleof) for r in transitive_closure(df).collect()}
    assert ("app_user", "schemamap") in closure  # 2-hop membership resolved


def test_table_grants_pushdown_feeds_doctor_agg(pg, spark):
    from pyspark.sql import functions as F

    from schemamap_spark.catalog.jdbc import TABLE_GRANTS_SQL

    rows = sql(pg, TABLE_GRANTS_SQL)
    df = spark.createDataFrame(
        [(r["grantee"], r["privilege_type"], r["table_schema"], r["table_name"]) for r in rows],
        "grantee string, privilege_type string, table_schema string, table_name string",
    )
    per = (
        df.filter(F.col("grantee") == "app_admin")
        .groupBy("privilege_type")
        .agg(F.countDistinct("table_schema", "table_name").alias("table_count"))
    )
    got = {r.privilege_type: r.table_count for r in per.collect()}
    assert got["SELECT"] == 2  # organizations + projects
    assert got["INSERT"] == 1  # organizations only
