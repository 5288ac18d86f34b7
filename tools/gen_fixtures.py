"""Deterministic fixture generator (seed=42) per FIXTURES.md.

Writes parquet files into /root/repo/fixtures/:
  cat_rel, cat_attr, cat_constr, cat_idx       — catalog fixtures (SMO input)
  role_edges, table_grants                     — doctor fixtures
  organizations, projects                      — import-pipeline targets
  staging_organizations_csv, staging_projects_csv (also .csv variants)
  tenants                                      — list_tenants override fixture
  bidi_mapping_fns                             — registry seed (SCHEMA:112-137 shape)
  i18n.json                                    — single JSON document

Shapes model what the reference introspects from pg_catalog
(rust/create_schemamap_schema.sql:846-933); content is synthetic.
Run: python tools/gen_fixtures.py
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")

PII_NAMES = [
    "email", "first_name", "last_name", "full_name", "phone", "mobile",
    "address", "city", "state", "zip", "ssn", "date_of_birth", "credit_card",
    "passport", "national_id", "tax_id", "bank_account", "iban", "username",
    "password", "token", "api_key", "auth_provider", "user_id",
]
EXT_REF_NAMES = [
    "external_id", "website_url", "image_uri", "doc_ref", "country_code",
    "rowguid_uuid", "session_guid", "external_source", "vendor_id", "batch_code",
]
GENERIC_NAMES = [
    "name", "title", "amount", "quantity", "status", "kind", "notes", "payload",
    "score", "rank", "weight", "height", "width", "color", "label", "flag",
    "total", "subtotal", "due_date", "start_ts", "end_ts", "body", "summary",
]
DATA_TYPES = [
    "text", "bigint", "integer", "timestamp with time zone", "uuid",
    "numeric(10,2)", "character varying(50)", "jsonb", "boolean",
]
MIGRATION_TABLES = ["schema_migrations", "flyway_schema_history"]

SCHEMAS = [
    "public", "sales", "person", "hr", "production", "purchasing",
    "finance", "app", "audit", "staging_area", "ops", "internal",
]
TABLE_STEMS = [
    "organizations", "projects", "accounts", "invoices", "payments", "orders_hist",
    "products", "vendors", "warehouses", "shipments", "contacts", "regions_dim",
    "currencies", "countries", "employees", "departments", "roles_dim", "tickets",
    "assets", "contracts", "budgets", "campaigns", "leads", "events_log",
]


def gen_catalog(rng: np.random.RandomState):
    rels, attrs, constrs, idxs = [], [], [], []
    tables_by_schema: dict[str, list[str]] = {}
    for si, schema in enumerate(SCHEMAS):
        n_tables = int(rng.randint(12, 19))
        stems = list(rng.choice(TABLE_STEMS, size=min(n_tables, len(TABLE_STEMS)), replace=False))
        if schema == "public":
            stems = ["organizations", "projects"] + [s for s in stems if s not in ("organizations", "projects")]
        if schema == "app":
            stems = MIGRATION_TABLES + stems
        tnames = [f"{s}" if schema in ("public", "app") else f"{s}_{si}" for s in stems][:n_tables]
        tables_by_schema[schema] = tnames
        for ti, tname in enumerate(tnames):
            kind = "r"
            r = rng.rand()
            if tname not in MIGRATION_TABLES and tname not in ("organizations", "projects"):
                if r > 0.95:
                    kind = "m"
                elif r > 0.85:
                    kind = "v"
            # master-data-like tables (dims) are small and referenced a lot
            is_dim = tname.endswith("_dim") or tname in ("countries", "currencies", "organizations")
            approx = int(rng.randint(5, 500)) if is_dim else int(np.exp(rng.uniform(0, np.log(50_000))))
            rels.append(dict(
                schema_name=schema, table_name=tname, object_type=kind,
                description=None if rng.rand() < 0.7 else f"{tname} table in {schema}",
                has_usage=schema != "internal",
                approx_rows=approx,
            ))
            # --- columns ---
            ncols = int(rng.randint(5, 16))
            surrogate = rng.rand() < 0.7
            colnames = ["id"]
            if rng.rand() < 0.30:
                colnames += ["created_at", "updated_at", "version"]
            pool = []
            if rng.rand() < 0.6:
                pool += list(rng.choice(PII_NAMES, size=rng.randint(1, 4), replace=False))
            if rng.rand() < 0.5:
                pool += list(rng.choice(EXT_REF_NAMES, size=rng.randint(1, 3), replace=False))
            pool += list(rng.choice(GENERIC_NAMES, size=len(GENERIC_NAMES), replace=False))
            seen = set(colnames)
            for c in pool:
                if len(colnames) >= ncols:
                    break
                if c not in seen:
                    colnames.append(c)
                    seen.add(c)
            for attnum, cname in enumerate(colnames, start=1):
                if cname == "id":
                    dtype = "bigint"
                    default = f"nextval('{schema}.{tname}_id_seq'::regclass)" if surrogate else None
                elif cname in ("created_at", "updated_at"):
                    dtype, default = "timestamp with time zone", "now()"
                elif cname == "version":
                    dtype, default = "bigint", "0"
                elif "uuid" in cname or "guid" in cname:
                    dtype = "uuid"
                    default = "uuid_generate_v1()" if rng.rand() < 0.5 else None
                else:
                    dtype = DATA_TYPES[int(rng.randint(0, len(DATA_TYPES)))]
                    default = None
                attrs.append(dict(
                    schema_name=schema, table_name=tname, column_name=cname,
                    data_type=dtype, not_null=bool(rng.rand() < 0.4 or cname == "id"),
                    default_value=default,
                    column_description=None if rng.rand() < 0.8 else f"column {cname}",
                    attnum=attnum,
                ))
            # --- constraints (only real tables get them) ---
            if kind == "r":
                constrs.append(dict(
                    schema_name=schema, table_name=tname,
                    constraint_name=f"{tname}_pkey", constraint_type="p",
                    definition="PRIMARY KEY (id)", keys=[1], fkeys=None,
                    sequence_name=f"{schema}.{tname}_id_seq" if surrogate else None,
                    ref_schema=None, ref_table=None,
                ))
                if rng.rand() < 0.6:
                    for _ in range(int(rng.randint(1, 4))):
                        # prefer dims as parents so candidate ranking is meaningful
                        pschema = SCHEMAS[int(rng.randint(0, len(SCHEMAS) - 1))]
                        ptables = tables_by_schema.get(pschema) or tnames
                        ptable = ptables[int(rng.randint(0, len(ptables)))]
                        if rng.rand() < 0.5:
                            for cand_schema, cand_tables in tables_by_schema.items():
                                hit = [t for t in cand_tables if t.endswith("_dim") or t in ("countries", "currencies", "organizations")]
                                if hit:
                                    pschema, ptable = cand_schema, hit[int(rng.randint(0, len(hit)))]
                                    break
                        key = int(rng.randint(2, max(3, len(colnames))))
                        constrs.append(dict(
                            schema_name=schema, table_name=tname,
                            constraint_name=f"{tname}_fk_{key}", constraint_type="f",
                            definition=f"FOREIGN KEY ({colnames[min(key, len(colnames)) - 1]}) REFERENCES {pschema}.{ptable}(id)",
                            keys=[key], fkeys=[1], sequence_name=None,
                            ref_schema=pschema, ref_table=ptable,
                        ))
                if rng.rand() < 0.08 and len(colnames) > 2:
                    constrs.append(dict(
                        schema_name=schema, table_name=tname,
                        constraint_name=f"{tname}_parent_fk", constraint_type="f",
                        definition=f"FOREIGN KEY (parent_id) REFERENCES {tname}(id)",
                        keys=[2], fkeys=[1], sequence_name=None,
                        ref_schema=schema, ref_table=tname,
                    ))
                if rng.rand() < 0.25 and len(colnames) > 2:
                    constrs.append(dict(
                        schema_name=schema, table_name=tname,
                        constraint_name=f"{tname}_{colnames[1]}_key", constraint_type="u",
                        definition=f"UNIQUE ({colnames[1]})", keys=[2], fkeys=None,
                        sequence_name=None, ref_schema=None, ref_table=None,
                    ))
                if rng.rand() < 0.25 and len(colnames) > 2:
                    constrs.append(dict(
                        schema_name=schema, table_name=tname,
                        constraint_name=f"{tname}_check", constraint_type="c",
                        definition=f"CHECK ((char_length({colnames[1]}) >= 3))",
                        keys=[2], fkeys=None, sequence_name=None,
                        ref_schema=None, ref_table=None,
                    ))
                if rng.rand() < 0.04:
                    constrs.append(dict(
                        schema_name=schema, table_name=tname,
                        constraint_name=f"{tname}_excl", constraint_type="x",
                        definition="EXCLUDE USING gist (name WITH =)", keys=[2], fkeys=None,
                        sequence_name=None, ref_schema=None, ref_table=None,
                    ))
                if rng.rand() < 0.06 and len(colnames) > 3:
                    constrs.append(dict(
                        schema_name=schema, table_name=tname,
                        constraint_name="generated_column", constraint_type="g",
                        definition=f"GENERATED ALWAYS AS (lower({colnames[2]})) STORED",
                        keys=[3], fkeys=None, sequence_name=None,
                        ref_schema=None, ref_table=None,
                    ))
                # --- indexes ---
                for ii in range(int(rng.randint(0, 4))):
                    key = int(rng.randint(1, max(2, len(colnames))))
                    ityp = "u" if rng.rand() < 0.2 else ("x" if rng.rand() < 0.05 else "i")
                    idxs.append(dict(
                        schema_name=schema, table_name=tname,
                        index_name=f"ix_{tname}_{ii}", index_type=ityp,
                        definition=f"btree ({colnames[key - 1]})",
                        immediate=bool(rng.rand() < 0.95), keys=[key],
                    ))
    return (pd.DataFrame(rels), pd.DataFrame(attrs), pd.DataFrame(constrs), pd.DataFrame(idxs))


def gen_doctor(rng: np.random.RandomState, rel: pd.DataFrame):
    chain = [
        ("schemamap_schema_read", "schemamap_readonly"),
        ("schemamap_readonly", "schemamap_readwrite"),
        ("schemamap_readwrite", "schemamap"),
    ]
    edges = list(chain)
    roles = [f"app_role_{i:02d}" for i in range(20)]
    for i, r in enumerate(roles):
        if i < 5:
            edges.append((r, "schemamap_readonly"))
        elif i < 10:
            edges.append((r, roles[i - 5]))
        elif i < 15:
            edges.append((r, roles[i - 10]))
        else:
            edges.append((r, roles[i - 15]))
    # one diamond: two paths to the same grandparent
    edges.append(("app_role_00", "app_role_07"))
    role_edges = pd.DataFrame(edges, columns=["member", "roleof"])

    tbls = rel[rel.object_type == "r"][["schema_name", "table_name"]].reset_index(drop=True)
    grants = []
    privs = ["SELECT", "INSERT", "UPDATE", "DELETE"]
    grantees = ["schemamap_readonly", "schemamap_readwrite", "schemamap"] + roles[:8]
    for _ in range(500):
        row = tbls.iloc[int(rng.randint(0, len(tbls)))]
        grants.append(dict(
            grantee=grantees[int(rng.randint(0, len(grantees)))],
            table_schema=row.schema_name, table_name=row.table_name,
            privilege_type=privs[int(rng.randint(0, 4))],
        ))
    return role_edges, pd.DataFrame(grants).drop_duplicates().reset_index(drop=True)


def gen_app(rng: np.random.RandomState):
    n_org = 200
    orgs = pd.DataFrame(dict(
        id=np.arange(1, n_org + 1, dtype=np.int64),
        name=[f"Org {i:03d}" for i in range(1, n_org + 1)],
        created_at=pd.Timestamp("2024-01-01") + pd.to_timedelta(rng.randint(0, 365 * 24, n_org), unit="h"),
        website=[f"https://org{i:03d}.example.com" if rng.rand() > 0.2 else None for i in range(1, n_org + 1)],
    ))
    n_proj = 1000
    projects = pd.DataFrame(dict(
        id=np.arange(1, n_proj + 1, dtype=np.int64),
        organization_id=rng.randint(1, n_org + 1, n_proj).astype(np.int64),
        name=[f"Project {i:04d}" for i in range(1, n_proj + 1)],
        created_at=pd.Timestamp("2024-02-01") + pd.to_timedelta(rng.randint(0, 300 * 24, n_proj), unit="h"),
        description=[None if rng.rand() < 0.5 else f"desc {i}" for i in range(n_proj)],
    ))

    # staging variants: all-string, whitespace to trim, tags to split, ~5% violations
    so = orgs.copy()
    so["id"] = so["id"].astype(str)
    so["name"] = so["name"].map(lambda s: f"  {s} ")
    so["created_at"] = so["created_at"].dt.strftime("%Y-%m-%d %H:%M:%S")
    so["tags"] = [",".join(rng.choice(["red", "green", "blue", "gold"], size=rng.randint(1, 4), replace=False)) for _ in range(n_org)]
    bad = rng.choice(n_org, size=10, replace=False)
    so.loc[bad[:4], "name"] = " ab "            # too short after trim
    so.loc[bad[4:7], "website"] = "ftp://nope"  # bad scheme
    so.loc[bad[7:], "name"] = so.loc[bad[7] if len(bad) > 7 else 0, "name"]  # dup names

    sp = projects.copy()
    sp["id"] = sp["id"].astype(str)
    sp["organization_id"] = sp["organization_id"].astype(str)
    orphans = rng.choice(n_proj, size=20, replace=False)
    sp.loc[orphans, "organization_id"] = "99999"  # FK orphan
    sp["created_at"] = sp["created_at"].dt.strftime("%Y-%m-%d %H:%M:%S")

    tenants = pd.DataFrame(dict(
        tenant_id=[str(i) for i in range(1, 26)],
        tenant_short_name=[f"org_{i:03d}"[:10] for i in range(1, 26)],
        tenant_display_name=[f"Org {i:03d}" for i in range(1, 26)],
        tenant_locale=[["en_US", "de_DE", "fr_FR", "es_ES", "en_GB"][i % 5] for i in range(25)],
        tenant_data=[json.dumps({"website": f"https://org{i:03d}.example.com", "createdAt": "2024-01-01"}, separators=(",", ":")) for i in range(1, 26)],
    ))
    return orgs, projects, so, sp, tenants


def gen_images(rng: np.random.RandomState):
    """Opaque binary payloads + typed metadata — multimodal-column fixture.

    Payload bytes are deterministic pseudo-random; real image decoding is
    stubbed in the engine (no imaging libs in this container), so only
    byte-level properties matter.
    """
    n = 300
    payloads = [rng.bytes(int(rng.randint(200, 4000))) for _ in range(n)]
    return pd.DataFrame(dict(
        image_id=np.arange(n, dtype=np.int64),
        doc_id=rng.randint(0, 500, n).astype(np.int64),
        fmt=[["png", "jpg", "webp"][i % 3] for i in range(n)],
        payload=payloads,
    ))


def gen_clustered_embeddings():
    """Mixture-of-Gaussians ON THE SPHERE — a realistic embedding-geometry
    fixture for ANN recall evidence (the driver's synthetic embeddings are
    near-random, which no locality-exploiting index can do well on; real
    text/image embeddings cluster).

    50 spherical clusters in 64 dims with Dirichlet-skewed sizes (min 12, so
    every top-10 neighborhood is intra-cluster) and per-cluster noise scales
    in [0.05, 0.25] — tight to moderately diffuse clusters, cross-cluster
    cosine ≈ 0. Own pinned RNG (seed 7): regenerating must keep every other
    fixture byte-identical."""
    rng = np.random.RandomState(7)
    n, dims, n_clusters, min_size = 2000, 64, 50, 12
    centers = rng.normal(size=(n_clusters, dims))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    sizes = np.maximum(
        (rng.dirichlet(np.full(n_clusters, 0.8)) * n).astype(int), min_size
    )
    while sizes.sum() > n:
        sizes[sizes.argmax()] -= 1
    while sizes.sum() < n:
        sizes[sizes.argmin()] += 1
    noise = rng.uniform(0.05, 0.25, size=n_clusters)
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(int(sizes[c])):
            v = centers[c] + rng.normal(scale=noise[c], size=dims)
            v /= np.linalg.norm(v)
            rows.append((vid, c, [float(x) for x in v]))
            vid += 1
    return pd.DataFrame(rows, columns=["vec_id", "cluster", "embedding"]).astype(
        {"vec_id": np.int64, "cluster": np.int32}
    )


def gen_clustered_docs():
    """Deterministic TEXT twin of clustered_embeddings — the fixture hybrid
    (lexical + dense) retrieval is measured on: every vector gets a document
    whose tokens encode its cluster (16 draws from a 30-token per-cluster
    vocabulary + 8 draws from a 50-token shared vocabulary), so BM25 can
    recover cluster membership but NOT within-cluster ordering — exactly
    the complementary-signal shape real hybrid search exploits.

    Replays gen_clustered_embeddings() (its own pinned seed) for the
    vec_id→cluster map and uses its OWN RandomState (seed 11): regenerating
    keeps every other fixture byte-identical."""
    emb = gen_clustered_embeddings()
    rng = np.random.RandomState(11)
    rows = []
    for vid, c in zip(emb["vec_id"], emb["cluster"]):
        toks = [f"c{c}t{rng.randint(0, 30)}" for _ in range(16)]
        toks += [f"sh{rng.randint(0, 50)}" for _ in range(8)]
        rng.shuffle(toks)
        rows.append((int(vid), int(c), " ".join(toks)))
    return pd.DataFrame(rows, columns=["doc_id", "cluster", "text"]).astype(
        {"doc_id": np.int64, "cluster": np.int32}
    )


def gen_registries():
    bidi = pd.DataFrame([
        dict(name="trim_str", i18n='{"name":{"en":"Trim"}}', forward_fn_name="trim_str",
             backward_fn_name="identity", input_type="text", exact=False),
        dict(name="identity", i18n='{"name":{"en":"Identity"}}', forward_fn_name="identity",
             backward_fn_name="identity", input_type="anyelement", exact=True),
        dict(name="split_comma_array", i18n='{"name":{"en":"Split Commas To Array"}}',
             forward_fn_name="split_comma_sep_str", backward_fn_name="join_array_to_comma_sep_str",
             input_type="text", exact=True),
    ])
    i18n = {
        "en": {"models": {"organizations": "Organizations", "projects": "Projects"},
               "attributes": {"organizations": {"name": "Name", "website": "Website"},
                              "projects": {"name": "Name", "description": "Description"}}},
        "de": {"models": {"organizations": "Organisationen", "projects": "Projekte"},
               "attributes": {"organizations": {"name": "Name", "website": "Webseite"},
                              "projects": {"name": "Name", "description": "Beschreibung"}}},
    }
    return bidi, i18n


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.RandomState(42)
    rel, attr, constr, idx = gen_catalog(rng)
    role_edges, grants = gen_doctor(rng, rel)
    orgs, projects, so, sp, tenants = gen_app(rng)
    images = gen_images(rng)
    bidi, i18n = gen_registries()

    frames = dict(
        images=images,
        cat_rel=rel, cat_attr=attr, cat_constr=constr, cat_idx=idx,
        role_edges=role_edges, table_grants=grants,
        organizations=orgs, projects=projects,
        staging_organizations_csv=so, staging_projects_csv=sp,
        tenants=tenants, bidi_mapping_fns=bidi,
        clustered_embeddings=gen_clustered_embeddings(),
        clustered_docs=gen_clustered_docs(),
    )
    for name, df in frames.items():
        # Spark cannot read parquet TIMESTAMP(NANOS); write microseconds.
        df.to_parquet(
            os.path.join(OUT, f"{name}.parquet"), index=False,
            coerce_timestamps="us", allow_truncated_timestamps=True,
        )
        print(f"wrote fixtures/{name}.parquet rows={len(df)}")
    so.to_csv(os.path.join(OUT, "staging_organizations.csv"), index=False)
    sp.to_csv(os.path.join(OUT, "staging_projects.csv"), index=False)
    with open(os.path.join(OUT, "i18n.json"), "w") as f:
        json.dump(i18n, f, indent=2, sort_keys=True)
    print("fixtures complete:", len(attr), "column rows,", rel.shape[0], "tables")


if __name__ == "__main__":
    main()
