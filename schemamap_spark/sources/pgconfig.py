"""Postgres connection-config inference.

Mirrors the reference CLI's resolution chain (rust/src/parsers/mod.rs:13-76):
explicit --conn string, else

    env (DATABASE_URL, then the five PG* vars)        parsers/env.rs:5-44
    docker-compose Postgres service                   parsers/docker_compose.rs:127-182
    supabase/config.toml [db] section                 parsers/supabase.rs:42-49
    pgsync / hasura                                   parsers/pgsync.rs:1-3 (stubs
                                                      in the reference too; skipped)
    ~/.pgpass first well-formed line                  parsers/pgpass.rs:24-38
    docker-image defaults                             parsers/default.rs:5-39

with explicit dbname/username/port arguments overriding whatever was inferred
(mod.rs:35-43). Pure Python — no Spark session needed — so the chain is unit
testable; the result feeds spark.read.jdbc via jdbc_url()/properties().
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, replace
from urllib.parse import unquote, urlparse


@dataclass(frozen=True)
class PgConfig:
    host: str = "localhost"
    port: int = 5432
    user: str = "postgres"
    password: str = "postgres"
    dbname: str = "postgres"
    source: str = "defaults"  # which chain link produced this config

    def jdbc_url(self) -> str:
        return f"jdbc:postgresql://{self.host}:{self.port}/{self.dbname}"

    def properties(self) -> dict[str, str]:
        return {"user": self.user, "password": self.password, "driver": "org.postgresql.Driver"}


def parse_conn_string(conn: str) -> PgConfig:
    """postgres:// / postgresql:// URL or libpq-style 'host=... port=...'."""
    conn = conn.strip()
    if conn.startswith(("postgres://", "postgresql://")):
        u = urlparse(conn)
        return PgConfig(
            host=u.hostname or "localhost",
            port=u.port or 5432,
            user=unquote(u.username) if u.username else "postgres",
            password=unquote(u.password) if u.password else "",
            dbname=(u.path or "/postgres").lstrip("/") or "postgres",
            source="conn",
        )
    kv = dict(
        p.split("=", 1) for p in re.split(r"\s+", conn) if "=" in p
    )
    if not kv:
        raise ValueError(f"unparseable connection string: {conn!r}")
    return PgConfig(
        host=kv.get("host", "localhost"),
        port=int(kv.get("port", 5432)),
        user=kv.get("user", "postgres"),
        password=kv.get("password", ""),
        dbname=kv.get("dbname", "postgres"),
        source="conn",
    )


def config_from_env(env: dict[str, str]) -> PgConfig | None:
    """DATABASE_URL preferred; else ALL FIVE PG* vars must be present
    (reference parsers/env.rs:5-44 requires the full set)."""
    url = env.get("DATABASE_URL")
    if url:
        cfg = parse_conn_string(url)
        return replace(cfg, source="env:DATABASE_URL")
    needed = ("PGHOST", "PGPORT", "PGUSER", "PGPASSWORD", "PGDATABASE")
    if all(env.get(k) for k in needed):
        try:
            port = int(env["PGPORT"])
        except ValueError:
            return None
        return PgConfig(
            host=env["PGHOST"], port=port, user=env["PGUSER"],
            password=env["PGPASSWORD"], dbname=env["PGDATABASE"], source="env:PG*",
        )
    return None


# docker-compose file names in the order Docker itself prefers them
# (reference parsers/docker_compose.rs:127-133).
_COMPOSE_NAMES = ("compose.yaml", "compose.yml", "docker-compose.yml", "docker-compose.yaml")


def _compose_env_map(env) -> dict[str, str]:
    if isinstance(env, dict):
        return {str(k): str(v) for k, v in env.items() if v is not None}
    if isinstance(env, list):
        out = {}
        for item in env:
            if isinstance(item, str) and "=" in item:
                k, v = item.split("=", 1)
                out[k] = v
        return out
    return {}


def _compose_published_port(ports, env_map: dict[str, str]) -> int:
    """First published host port: 'HOST:CONTAINER' / 'IP:HOST:CONTAINER'
    short forms or long-form {published: N}; else service PGPORT; else 5432
    (reference parsers/docker_compose.rs:16-52)."""
    for p in ports or []:
        if isinstance(p, str):
            parts = p.split(":")
            cand = parts[0] if len(parts) == 2 else parts[1] if len(parts) == 3 else None
            if cand:
                try:
                    return int(cand)
                except ValueError:
                    pass
        elif isinstance(p, dict) and p.get("published") is not None:
            try:
                return int(p["published"])
            except (TypeError, ValueError):
                pass
        elif isinstance(p, int):
            return p
    try:
        return int(env_map.get("PGPORT", "5432"))
    except ValueError:
        return 5432


def config_from_docker_compose(cwd: str) -> PgConfig | None:
    try:
        import yaml
    except ImportError:  # pragma: no cover - baked into the test container
        return None
    for name in _COMPOSE_NAMES:
        path = os.path.join(cwd, name)
        if not os.path.exists(path):
            continue
        try:
            with open(path) as f:
                compose = yaml.safe_load(f)
        except Exception:
            continue
        services = (compose or {}).get("services") or {}
        for _, svc in services.items():
            if not isinstance(svc, dict):
                continue
            image = str(svc.get("image") or "")
            if "postgres" not in image:
                continue
            env_map = _compose_env_map(svc.get("environment"))
            return PgConfig(
                host=env_map.get("POSTGRES_HOST", "localhost"),
                port=_compose_published_port(svc.get("ports"), env_map),
                user=env_map.get("POSTGRES_USER", "postgres"),
                password=env_map.get("POSTGRES_PASSWORD", "postgres"),
                dbname=env_map.get("POSTGRES_DB", "postgres"),
                source=f"docker-compose:{name}",
            )
    return None


def config_from_supabase(cwd: str) -> PgConfig | None:
    path = os.path.join(cwd, "supabase", "config.toml")
    if not os.path.exists(path):
        return None
    try:
        import tomllib

        with open(path, "rb") as f:
            doc = tomllib.load(f)
        db = doc["db"]
        return PgConfig(
            host=db["host"], port=int(db["port"]), user=db["user"],
            password=db["password"], dbname=db["dbname"], source="supabase",
        )
    except Exception:
        return None


def parse_pgpass_line(line: str) -> PgConfig | None:
    """host:port:dbname:user:password — exactly five fields
    (reference parsers/pgpass.rs:8-22)."""
    parts = line.rstrip("\n").split(":")
    if len(parts) != 5:
        return None
    try:
        port = int(parts[1])
    except ValueError:
        return None
    return PgConfig(
        host=parts[0], port=port, dbname=parts[2], user=parts[3],
        password=parts[4], source="pgpass",
    )


def config_from_pgpass(home: str) -> PgConfig | None:
    path = os.path.join(home, ".pgpass")
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            for line in f:
                cfg = parse_pgpass_line(line)
                if cfg is not None:
                    return cfg
    except OSError:
        return None
    return None


def config_defaults(env: dict[str, str], dbname=None, username=None, port=None) -> PgConfig:
    """Docker-image defaults (reference parsers/default.rs:5-39): dbname from
    POSTGRES_DB, user from POSTGRES_USER then $USER, password from
    POSTGRES_PASSWORD then PGPASSWORD, host from PGHOST."""
    return PgConfig(
        host=env.get("PGHOST", "localhost"),
        port=port or 5432,
        user=username or env.get("POSTGRES_USER") or env.get("USER") or "postgres",
        password=env.get("POSTGRES_PASSWORD") or env.get("PGPASSWORD") or "postgres",
        dbname=dbname or env.get("POSTGRES_DB") or "postgres",
        source="defaults",
    )


def resolve_pg_config(
    conn: str | None = None,
    dbname: str | None = None,
    username: str | None = None,
    port: int | None = None,
    cwd: str | None = None,
    env: dict[str, str] | None = None,
    home: str | None = None,
) -> PgConfig:
    """Full reference chain; explicit dbname/username/port override the
    inferred values last (reference parsers/mod.rs:35-43)."""
    cwd = cwd or os.getcwd()
    env = dict(os.environ) if env is None else env
    home = home or os.path.expanduser("~")

    if conn:
        cfg = parse_conn_string(conn)
    else:
        cfg = (
            config_from_env(env)
            or config_from_docker_compose(cwd)
            or config_from_supabase(cwd)
            or config_from_pgpass(home)
            or config_defaults(env, dbname, username, port)
        )
    if dbname:
        cfg = replace(cfg, dbname=dbname)
    if username:
        cfg = replace(cfg, user=username)
    if port:
        cfg = replace(cfg, port=port)
    return cfg
