"""pg_catalog compatibility layer.

Reference: the 42 relations under
`src/frontend/src/catalog/system_catalog/pg_catalog/` (each declared there
as a SQL view over rw_catalog state — pg_class.rs:22, pg_namespace.rs:22,
pg_attribute.rs:26, pg_type.rs read function, pg_tables.rs:20 ...) plus the
session/introspection functions the binder resolves at BIND time in
`src/frontend/src/binder/expr/function/builtin_scalar.rs:442-694`
(current_database, current_schema, pg_get_userbyid, format_type,
pg_table_is_visible, has_*_privilege, pg_relation_size, version, ...) and
`src/expr/impl/src/scalar/format_type.rs:21` / the function_impl family
(`pg_get_viewdef.rs`, `pg_get_userbyid.rs`, `cast_regclass.rs`,
`pg_relation_size.rs`).

Architecture — Spark-first, zero UDFs:

* The pg_catalog RELATIONS are frontend/driver-side metadata in the
  reference (system_catalog/mod.rs keeps them on the frontend node); here
  each is materialized on demand as a tiny temp view from the engine
  catalog when a statement references it, the same strategy as the
  existing rw_catalog registration (`frontend._register_rw_catalog_views`).
  Rows are O(catalog size), never O(data).
* The compat FUNCTIONS are pure TEXT rewrites into Spark SQL performed
  before Catalyst ever sees the statement — literals for the session
  functions (the reference binds most of them as literals too:
  builtin_scalar.rs `raw_literal`), CASE tables over the catalog snapshot
  for format_type / pg_get_userbyid / pg_get_viewdef / pg_relation_size,
  so everything stays inside whole-stage codegen with no Python UDFs.

OIDs are deterministic within a statement (schemas fixed, user relations
enumerated from FirstNormalObjectId=16384 in catalog order), so
pg_class ⋈ pg_attribute ⋈ pg_namespace joins are always consistent —
PostgreSQL itself guarantees no more across object re-creation.
"""

from __future__ import annotations

import os
import re
import time

from risingwave_spark import users as _users

from risingwave_spark.functions.pgsql import _mask_strings, _unmask

# ---------------------------------------------------------------------------
# PostgreSQL type OIDs (PUBLIC catalog data: postgres pg_type.dat; the same
# table the reference transcribes in src/common/src/types/postgres_type.rs:34)
# (oid, array_oid, typname, typinput, typlen)
_BASE_TYPES = [
    (16, 1000, "bool", "boolin", 1),
    (17, 1001, "bytea", "byteain", -1),
    (20, 1016, "int8", "int8in", 8),
    (21, 1005, "int2", "int2in", 2),
    (23, 1007, "int4", "int4in", 4),
    (700, 1021, "float4", "float4in", 4),
    (701, 1022, "float8", "float8in", 8),
    (1043, 1015, "varchar", "varcharin", -1),
    (1082, 1182, "date", "date_in", 4),
    (1083, 1183, "time", "time_in", 8),
    (1114, 1115, "timestamp", "timestamp_in", 8),
    (1184, 1185, "timestamptz", "timestamptz_in", 8),
    (1186, 1187, "interval", "interval_in", 16),
    (1700, 1231, "numeric", "numeric_in", -1),
    (3802, 3807, "jsonb", "jsonb_in", -1),
]

# format_type / pg_typeof display names (reference DataType Display,
# src/common/src/types/mod.rs:120-180; arrays display as "{inner}[]")
_DISPLAY = {
    16: "boolean", 17: "bytea", 20: "bigint", 21: "smallint", 23: "integer",
    700: "real", 701: "double precision", 1043: "character varying",
    1082: "date", 1083: "time without time zone",
    1114: "timestamp without time zone", 1184: "timestamp with time zone",
    1186: "interval", 1700: "numeric", 3802: "jsonb",
    # extended-mode aliases the reference also accepts (from_oid: 25, 1009)
    25: "character varying", 2249: "record", 2278: "void",
}
for _oid, _arr, _n, _i, _l in _BASE_TYPES:
    _DISPLAY[_arr] = _DISPLAY[_oid] + "[]"
_DISPLAY[1009] = "character varying[]"

_PG_NSP, _PUBLIC_NSP, _INFO_NSP, _RW_NSP = 11, 2200, 13000, 2024
_ROOT_UID = 10  # PG's BOOTSTRAP_SUPERUSERID; the engine's single user
_FIRST_NORMAL_OID = 16384

# every relation name served by this module (the reference's full
# pg_catalog file list; each SELECTable even when the engine has no
# backing state — most are legitimately empty there too)
_EMPTY_VIEWS = {
    "pg_am": "oid int, amname string, amhandler int, amtype string",
    "pg_attrdef": "oid int, adrelid int, adnum smallint, adbin string",
    "pg_auth_members": (
        "oid int, roleid int, member int, grantor int, admin_option boolean,"
        " inherit_option boolean, set_option boolean"
    ),
    "pg_cast": "oid int, castsource int, casttarget int, castcontext string",
    "pg_collation": (
        "oid int, collname string, collnamespace int, collowner int,"
        " collprovider int, collisdeterministic boolean, collencoding int,"
        " collcollate string, collctype string, colliculocale string,"
        " collversion string"
    ),
    "pg_conversion": (
        "oid int, conname string, connamespace int, conowner int,"
        " conforencoding smallint, contoencoding smallint, conproc int,"
        " condefault boolean"
    ),
    "pg_depend": (
        "classid int, objid int, objsubid smallint, refclassid int,"
        " refobjid int, refobjsubid smallint, deptype string"
    ),
    "pg_description": (
        "objoid int, classoid int, objsubid int, description string"
    ),
    "pg_enum": (
        "oid int, enumtypid int, enumsortorder float, enumlabel string"
    ),
    "pg_extension": (
        "oid int, extname string, extowner int, extnamespace int,"
        " extrelocatable boolean, extversion string, extconfig array<int>,"
        " extcondition array<string>"
    ),
    "pg_index": (
        "indexrelid int, indrelid int, indnatts smallint,"
        " indnkeyatts smallint, indisunique boolean, indkey array<smallint>,"
        " indoption array<smallint>, indexprs string, indpred string,"
        " indisprimary boolean, indclass array<int>, indisexclusion boolean,"
        " indimmediate boolean, indisclustered boolean, indisvalid boolean,"
        " indcheckxmin boolean, indisready boolean, indislive boolean,"
        " indisreplident boolean"
    ),
    "pg_indexes": (
        "schemaname string, tablename string, indexname string,"
        " tablespace string, indexdef string"
    ),
    "pg_inherits": (
        "inhrelid int, inhparent int, inhseqno int, inhdetachpending boolean"
    ),
    "pg_language": (
        "oid int, lanname string, lanowner int, lanispl boolean,"
        " lanpltrusted boolean, lanplcallfoid int, laninline int,"
        " lanvalidator int, lanacl array<string>"
    ),
    "pg_locks": (
        "locktype string, database int, relation int, page int,"
        " tuple smallint, virtualxid string, transactionid int, classid int,"
        " objid int, objsubid smallint, virtualtransaction string, pid int,"
        " mode string, granted boolean, fastpath boolean, waitstart string"
    ),
    "pg_opclass": (
        "oid int, opcmethod int, opcname string, opcnamespace int,"
        " opcowner int, opcfamily int, opcintype int, opcdefault boolean,"
        " opckeytype int"
    ),
    "pg_operator": (
        "oid int, oprname string, oprnamespace int, oprowner int,"
        " oprkind string, oprcanmerge boolean, oprcanhash boolean,"
        " oprleft int, oprright int, oprresult int, oprcom int,"
        " oprnegate int, oprcode int, oprrest int, oprjoin int"
    ),
    "pg_partitioned_table": (
        "partrelid int, partstrat string, partnatts smallint, partdefid int,"
        " partattrs array<smallint>, partclass array<int>,"
        " partcollation array<int>, partexprs string"
    ),
    "pg_range": (
        "rngtypid int, rngsubtype int, rngmultitypid int, rngcollation int,"
        " rngsubopc int, rngcanonical string, rngsubdiff string"
    ),
    "pg_rewrite": (
        "oid int, rulename string, ev_class int, ev_type string,"
        " ev_enabled string, is_instead boolean, ev_qual string,"
        " ev_action string"
    ),
    "pg_sequence": (
        "seqrelid int, seqtypid int, seqstart bigint, seqincrement bigint,"
        " seqmax bigint, seqmin bigint, seqcache bigint, seqcycle boolean"
    ),
    "pg_sequences": (
        "schemaname string, sequencename string, sequenceowner string,"
        " increment_by bigint, last_value bigint, cycle boolean,"
        " start_value bigint, max_value bigint, min_value bigint"
    ),
    "pg_shdescription": "objoid int, classoid int, description string",
    "pg_stat_user_tables": (
        "relid int, schemaname string, relname string, seq_scan bigint,"
        " last_seq_scan timestamp, seq_tup_read bigint, idx_scan bigint,"
        " last_idx_scan timestamp, idx_tup_fetch bigint, n_tup_ins bigint,"
        " n_tup_del bigint, n_tup_hot_upd bigint, n_tup_newpage_upd bigint,"
        " n_live_tup bigint, n_dead_tup bigint, n_mod_since_analyze bigint,"
        " n_ins_since_vacuum bigint, last_vacuum timestamp,"
        " last_autovacuum timestamp, last_analyze timestamp,"
        " last_autoanalyze timestamp, vacuum_count bigint,"
        " autovacuum_count bigint, analyze_count bigint,"
        " autoanalyze_count bigint"
    ),
    "pg_tablespace": (
        "oid int, spcname string, spcowner int, spcacl array<string>,"
        " spcoptions array<string>"
    ),
    "pg_trigger": (
        "oid int, tgrelid int, tgparentid int, tgname string, tgfoid int,"
        " tgtype smallint, tgenabled string, tgisinternal boolean"
    ),
}


def _spark_oid(dt) -> tuple[int, int, int]:
    """Spark DataType → (pg type oid, typlen, attndims).

    The inverse of the reference's DataType::to_oid
    (postgres_type.rs:107). Struct → record (2249), map → jsonb-shaped
    (3802: the engine's wire formatters already serialize maps as JSON
    objects, sources/sink_format.py) — both documented divergences of
    composite typing, not of data."""
    from pyspark.sql import types as T

    if isinstance(dt, T.ArrayType):
        eoid, _, _ = _spark_oid(dt.elementType)
        arr = {o: a for o, a, _n, _i, _l in _BASE_TYPES}.get(eoid, 2277)
        return arr, -1, 1
    if isinstance(dt, T.DecimalType):
        return 1700, -1, 0
    if isinstance(dt, T.StructType):
        return 2249, -1, 0
    if isinstance(dt, T.MapType):
        return 3802, -1, 0
    if isinstance(dt, (T.DayTimeIntervalType, T.YearMonthIntervalType)):
        return 1186, 16, 0
    oid = {
        T.BooleanType: 16, T.BinaryType: 17, T.LongType: 20,
        T.ShortType: 21, T.ByteType: 21, T.IntegerType: 23,
        T.FloatType: 700, T.DoubleType: 701, T.StringType: 1043,
        T.DateType: 1082, T.TimestampNTZType: 1114, T.TimestampType: 1184,
    }.get(type(dt))
    if oid is None:
        return 705, -1, 0  # "unknown"
    ln = {o: l for o, _a, _n, _i, l in _BASE_TYPES}[oid]
    return oid, ln, 0


def _snapshot(engine) -> dict:
    """One consistent driver-side picture of the engine catalog: schema
    oids, relation oids/kinds (pg_class relkind letters per
    pg_class.rs:24-30 — sources/sinks get NULL exactly like the
    reference's CASE without a matching arm), recorded definitions."""
    schemas = [
        (_PG_NSP, "pg_catalog"), (_PUBLIC_NSP, "public"),
        (_INFO_NSP, "information_schema"), (_RW_NSP, "rw_catalog"),
    ]
    for i, s in enumerate(sorted(getattr(engine, "schemas", set()))):
        schemas.append((16000 + i, s))

    nsp_of = {s: o for o, s in schemas}

    def _owning_nsp(n: str):
        """Demangle `s__x` → (display name, schema oid): created
        schemas are REAL namespaces in the catalog views (pg_class
        relnamespace / pg_tables.schemaname track ALTER ... SET SCHEMA,
        e2e_test/ddl/alter_set_schema.slt)."""
        if "__" in n:
            prefix, base = n.split("__", 1)
            if prefix in nsp_of and base:
                return base, nsp_of[prefix]
        return n, _PUBLIC_NSP

    # real owners (reference: every catalog proto carries `owner`;
    # handler/alter_owner.rs edits it) — uid + name per engine object

    _ust = _users.load_state(engine)
    _uid_of = {n: u["oid"] for n, u in _ust["users"].items()}
    _uid_of["root"] = _ROOT_UID

    def _owner(key: str):
        n = _ust["owners"].get(key, "root")
        return _uid_of.get(n, _ROOT_UID), n

    rels: list[dict] = []  # {oid,name(engine),disp,kind,nsp,owner,user}
    oid = _FIRST_NORMAL_OID
    for names, kind in (
        (sorted(engine.tables), "r"),
        (sorted(engine.mv_handles), "m"),
        (sorted(engine.views), "v"),
        (sorted(engine.sources), None),
        (sorted(engine.sinks), None),
    ):
        for n in names:
            disp, nsp = _owning_nsp(n)
            rels.append({"oid": oid, "name": n, "disp": disp, "kind": kind,
                         "nsp": nsp, "owner": _owner(n), "user": True})
            oid += 1
    sysnames = sorted(_EMPTY_VIEWS) + [
        "pg_attribute", "pg_class", "pg_constraint", "pg_database",
        "pg_matviews", "pg_namespace", "pg_proc", "pg_roles", "pg_settings",
        "pg_shadow", "pg_stat_activity", "pg_tables", "pg_type", "pg_user",
        "pg_views",
    ]
    for i, n in enumerate(sorted(sysnames)):
        rels.append({"oid": 13100 + i, "name": n, "kind": "r", "nsp": _PG_NSP})
    for i, n in enumerate(
        ["rw_tables", "rw_materialized_views", "rw_views", "rw_sources",
         "rw_sinks", "rw_functions", "rw_secrets", "rw_connections",
         "rw_ddl_progress"]
    ):
        rels.append({"oid": 13300 + i, "name": n, "kind": "r", "nsp": _RW_NSP})

    ddl = {e["name"]: e["stmt"] for e in engine._read_catalog()}
    return {"schemas": schemas, "rels": rels, "ddl": ddl,
            "owner_of": _owner,
            "by_name": {r["name"]: r for r in rels}}


def _rel_schema(engine, name):
    """Relation schema, cached per catalog GENERATION (Engine bumps
    catalog_gen on every recorded DDL): resolving a view's schema costs
    a Catalyst analysis round trip (~8 ms), and pg_attribute touches
    every relation — at 5k relations an uncached psql `\\d` join ran
    38 s/statement in the r10 soak; cached it is O(changed relations)."""
    gen = getattr(engine, "catalog_gen", 0)
    cache = engine.__dict__.setdefault("_relschema_cache", {})
    hit = cache.get(name)
    if hit is not None and hit[0] == gen:
        return hit[1]
    try:
        sch = engine.spark.table(name).schema
    except Exception:
        sch = None
    cache[name] = (gen, sch)
    return sch


def _definition(snap: dict, name: str) -> str:
    stmt = snap["ddl"].get(name, "")
    m = re.search(r"\bAS\s+(SELECT\b.*)$", stmt, re.I | re.S)
    return m.group(1).strip() if m else ""


def _pk_cols(engine, name: str) -> list[str]:
    t = engine.tables.get(name)
    if t is None:
        return []
    pk = getattr(t, "pk", None)
    if pk is None:
        return []
    if isinstance(pk, str):
        return [c.strip() for c in pk.split(",") if c.strip()]
    return list(pk)


def _state_bytes(engine, name: str) -> int:
    """On-disk size of a relation's durable state (reference
    pg_relation_size.rs reads the table stats the compactor maintains;
    here the state parquet IS the storage)."""
    from risingwave_spark.streaming.mv import ChunkedState

    st = None
    if name in engine.tables:
        st = engine.tables[name].state
    elif name in engine.mv_handles:
        cand = getattr(engine.mv_handles[name].view, "state", None)
        if isinstance(cand, ChunkedState):
            st = cand
    if st is None:
        return 0
    total = 0
    for d in (st.values_dir, st.tombs_dir):
        if os.path.isdir(d):
            for root, _dirs, files in os.walk(d):
                total += sum(
                    os.path.getsize(os.path.join(root, f)) for f in files
                )
    return total


# ---------------------------------------------------------------------------
# view builders


def _register_views(engine, stmt: str, snap: dict) -> None:
    spark = engine.spark

    def want(name: str) -> bool:
        return re.search(rf"\b{name}\b", stmt, re.I) is not None

    def reg(name: str, rows: list, schema: str) -> None:
        spark.createDataFrame(rows or [], schema).createOrReplaceTempView(name)

    for name, schema in _EMPTY_VIEWS.items():
        if want(name):
            reg(name, [], schema)

    if want("pg_namespace"):
        reg(
            "pg_namespace",
            [(o, n, snap["owner_of"](f"__schema_{n}")[0], None)
             for o, n in snap["schemas"]],
            "oid int, nspname string, nspowner int, nspacl array<string>",
        )
    if want("pg_class"):
        # column set per pg_class.rs:22-37; relowner is the REAL owner
        # (handler/alter_owner.rs edits it, alter_owner.slt joins it
        # against pg_roles)
        reg(
            "pg_class",
            [
                (r["oid"], r.get("disp", r["name"]), r["nsp"],
                 r.get("owner", (_ROOT_UID,))[0], "p", r["kind"],
                 0, 0, 0, [], False, None)
                for r in snap["rels"]
            ],
            "oid int, relname string, relnamespace int, relowner int,"
            " relpersistence string, relkind string, relpages smallint,"
            " relam int, reltablespace int, reloptions array<string>,"
            " relispartition boolean, relpartbound string",
        )
    if want("pg_attribute"):
        rows = []
        for r in snap["rels"]:
            if not r.get("user"):
                continue
            sch = _rel_schema(engine, r["name"])
            if sch is None:
                continue
            pks = set(_pk_cols(engine, r["name"]))
            for pos, f in enumerate(sch.fields, start=1):
                toid, tlen, ndims = _spark_oid(f.dataType)
                rows.append(
                    (r["oid"], f.name, toid, ndims, tlen, pos,
                     f.name in pks, False, False, "", "", -1, None, 0)
                )
        reg(
            "pg_attribute",
            rows,
            "attrelid int, attname string, atttypid int, attndims smallint,"
            " attlen smallint, attnum smallint, attnotnull boolean,"
            " atthasdef boolean, attisdropped boolean, attidentity string,"
            " attgenerated string, atttypmod int, attoptions array<string>,"
            " attcollation int",
        )
    if want("pg_type"):
        rows = [
            (o, n, 0, a, inp, False, 0, -1, 0, ln, _PG_NSP, "b", ",", 0,
             None, None, None)
            for o, a, n, inp, ln in _BASE_TYPES
        ] + [
            (a, "_" + n, o, 0, "array_in", False, 0, -1, 0, -1, _PG_NSP,
             "b", ",", 0, None, None, None)
            for o, a, n, _inp, _ln in _BASE_TYPES
        ]
        reg(
            "pg_type",
            rows,
            "oid int, typname string, typelem int, typarray int,"
            " typinput string, typnotnull boolean, typbasetype int,"
            " typtypmod int, typcollation int, typlen int, typnamespace int,"
            " typtype string, typdelim string, typrelid int,"
            " typdefault string, typcategory string, typreceive int",
        )
    if want("pg_database"):
        dbs = ["dev"] + sorted(getattr(engine, "databases", set()))
        reg(
            "pg_database",
            [
                (16866 + i, d, _ROOT_UID, 6, "C", "C", False, True, -1, 1663,
                 None)
                for i, d in enumerate(dbs)
            ],
            "oid int, datname string, datdba int, encoding int,"
            " datcollate string, datctype string, datistemplate boolean,"
            " datallowconn boolean, datconnlimit int, dattablespace int,"
            " datacl array<string>",
        )
    if want("pg_tables"):
        # pg_tables.rs:23-38 — user tables + system tables, rw_catalog
        # schema excluded
        nsp = dict(snap["schemas"])
        reg(
            "pg_tables",
            [
                (nsp[r["nsp"]], r.get("disp", r["name"]),
                 r.get("owner", (0, "root"))[1], None)
                for r in snap["rels"]
                if r["kind"] == "r" and r["nsp"] != _RW_NSP
            ],
            "schemaname string, tablename string, tableowner string,"
            " tablespace string",
        )
    if want("pg_views"):
        reg(
            "pg_views",
            [
                (dict(snap["schemas"]).get(
                    snap["by_name"][n]["nsp"], "public"),
                 snap["by_name"][n].get("disp", n),
                 snap["owner_of"](n)[1], _definition(snap, n))
                for n in sorted(engine.views)
            ],
            "schemaname string, viewname string, viewowner string,"
            " definition string",
        )
    if want("pg_matviews"):
        reg(
            "pg_matviews",
            [
                (dict(snap["schemas"]).get(
                    snap["by_name"][n]["nsp"], "public"),
                 snap["by_name"][n].get("disp", n),
                 snap["owner_of"](n)[0], None, False, True,
                 _definition(snap, n))
                for n in sorted(engine.mv_handles)
            ],
            "schemaname string, matviewname string, matviewowner int,"
            " tablespace string, hasindexes boolean, ispopulated boolean,"
            " definition string",
        )
    if want("pg_proc"):
        # returns is recorded as the PG-name spelling from the DDL
        ret_oid = {
            "bool": 16, "boolean": 16, "int2": 21, "smallint": 21,
            "int4": 23, "int": 23, "integer": 23, "int8": 20, "bigint": 20,
            "float4": 700, "real": 700, "float8": 701,
            "double precision": 701, "double": 701, "text": 1043,
            "varchar": 1043, "string": 1043, "date": 1082,
            "timestamp": 1114, "timestamptz": 1184, "numeric": 1700,
            "decimal": 1700, "bytea": 17, "binary": 17, "jsonb": 3802,
        }
        reg(
            "pg_proc",
            [
                (17000 + i, n, _PUBLIC_NSP, _ROOT_UID, 0,
                 ret_oid.get(str(d.get("returns", "")).lower(), 1043),
                 "a" if str(d.get("kind", "")).lower() == "aggregate"
                 else "f", [])
                for i, (n, d) in enumerate(sorted(engine.functions.items()))
            ],
            "oid int, proname string, pronamespace int, proowner int,"
            " proargdefaults int, prorettype int, prokind string,"
            " proargtypes array<int>",
        )
    if want("pg_constraint"):
        rows = []
        for r in snap["rels"]:
            pks = _pk_cols(engine, r["name"])
            if not pks:
                continue
            sch = _rel_schema(engine, r["name"])
            if sch is None:
                continue
            order = {f.name: i + 1 for i, f in enumerate(sch.fields)}
            rows.append(
                (2_000_000 + r["oid"], f"{r['name']}_pkey", _PUBLIC_NSP, "p",
                 False, True, r["oid"], 0, 0, 0, 0, " ", " ", " ", True, 0,
                 True, [order[c] for c in pks if c in order], None)
            )
        reg(
            "pg_constraint",
            rows,
            "oid int, conname string, connamespace int, contype string,"
            " condeferrable boolean, convalidated boolean, conrelid int,"
            " contypid int, conindid int, conparentid int, confrelid int,"
            " confupdtype string, confdeltype string, confmatchtype string,"
            " conislocal boolean, coninhcount int, connoinherit boolean,"
            " conkey array<smallint>, confkey array<smallint>",
        )
    if want("pg_settings"):
        try:
            tz = engine.spark.conf.get("spark.sql.session.timeZone")
        except Exception:
            tz = "UTC"
        try:
            par = engine.spark.conf.get("spark.sql.shuffle.partitions")
        except Exception:
            par = ""
        reg(
            "pg_settings",
            [
                ("timezone", tz or "UTC", "session time zone", "user"),
                ("server_version", "13.14.0", "server version", "internal"),
                ("server_encoding", "UTF8", "server encoding", "internal"),
                ("client_encoding", "UTF8", "client encoding", "user"),
                ("standard_conforming_strings", "on", "literal syntax",
                 "internal"),
                ("search_path",
                 ", ".join(getattr(engine, "search_path", None)
                           or ['"$user"', "public"]),
                 "schema search order", "user"),
                ("streaming_parallelism", str(par or ""),
                 "streaming job parallelism", "user"),
            ],
            "name string, setting string, short_desc string, context string",
        )
    if want("pg_user") or want("pg_shadow") or want("pg_roles"):
        # real catalog users (reference system_catalog/pg_catalog/
        # pg_user.rs, pg_roles.rs over the meta user_info store)

        ucat = [("root", {"oid": _ROOT_UID, "is_super": True,
                          "can_create_db": True, "can_create_user": True,
                          "can_login": True, "auth": None})]
        ucat += sorted(_users.load_state(engine)["users"].items())
        if want("pg_user"):
            reg(
                "pg_user",
                [(u["oid"], n, bool(u["can_create_db"]),
                  bool(u["is_super"]), "********") for n, u in ucat],
                "usesysid int, usename string, usecreatedb boolean,"
                " usesuper boolean, passwd string",
            )
        if want("pg_shadow"):
            # PG shows the md5 verifier in pg_shadow.passwd (never a
            # plaintext — this engine stores verifiers only)
            reg(
                "pg_shadow",
                [(n, u["oid"], bool(u["can_create_db"]),
                  bool(u["is_super"]), False, False,
                  ("md5" + u["auth"]["md5"]) if u.get("auth") else None,
                  None, None) for n, u in ucat],
                "usename string, usesysid int, usecreatedb boolean,"
                " usesuper boolean, userepl boolean, usebypassrls boolean,"
                " passwd string, valuntil timestamp, useconfig array<string>",
            )
        if want("pg_roles"):
            reg(
                "pg_roles",
                [(u["oid"], n, bool(u["is_super"]), True,
                  bool(u["can_create_user"]), bool(u["can_create_db"]),
                  bool(u["can_login"]), False, -1, None, False,
                  "********") for n, u in ucat],
                "oid int, rolname string, rolsuper boolean,"
                " rolinherit boolean, rolcreaterole boolean,"
                " rolcreatedb boolean, rolcanlogin boolean,"
                " rolreplication boolean, rolconnlimit int,"
                " rolvaliduntil timestamp, rolbypassrls boolean,"
                " rolpassword string",
            )
    # ---- information_schema (reference system_catalog/
    # information_schema/{tables,columns,views,schemata,
    # table_constraints,key_column_usage}.rs — registered under
    # information_schema_* names; the qualifier rewrite in
    # rewrite_pg_compat maps the dotted spelling onto them)
    nsp_name = dict(snap["schemas"])
    if want("information_schema_tables"):
        kind_name = {"r": "BASE TABLE", "m": "MATERIALIZED VIEW",
                     "v": "VIEW"}
        reg(
            "information_schema_tables",
            [
                ("dev", nsp_name[r["nsp"]], r.get("disp", r["name"]),
                 kind_name.get(r["kind"], "SOURCE") if r.get("user")
                 else "SYSTEM TABLE",
                 "YES" if r["kind"] == "r" else "NO")
                for r in snap["rels"]
                if r["kind"] is not None
            ],
            "table_catalog string, table_schema string, table_name string,"
            " table_type string, is_insertable_into string",
        )
    if want("information_schema_columns"):
        rows = []
        for r in snap["rels"]:
            if not r.get("user"):
                continue
            sch = _rel_schema(engine, r["name"])
            if sch is None:
                continue
            for pos, f in enumerate(sch.fields, start=1):
                toid, _ln, _nd = _spark_oid(f.dataType)
                rows.append(
                    ("dev", nsp_name[r["nsp"]], r.get("disp", r["name"]),
                     f.name, None, pos,
                     "YES" if f.nullable else "NO",
                     _DISPLAY.get(toid, f.dataType.simpleString()))
                )
        reg(
            "information_schema_columns",
            rows,
            "table_catalog string, table_schema string, table_name string,"
            " column_name string, column_default string,"
            " ordinal_position int, is_nullable string, data_type string",
        )
    if want("information_schema_views"):
        reg(
            "information_schema_views",
            [
                ("dev", "public", n, _definition(snap, n))
                for n in sorted(engine.views)
            ],
            "table_catalog string, table_schema string, table_name string,"
            " view_definition string",
        )
    if want("information_schema_schemata"):
        reg(
            "information_schema_schemata",
            [("dev", n, "root", None, None, None, None)
             for _o, n in snap["schemas"]],
            "catalog_name string, schema_name string, schema_owner string,"
            " default_character_set_catalog string,"
            " default_character_set_schema string,"
            " default_character_set_name string, sql_path string",
        )
    if want("information_schema_table_constraints"):
        reg(
            "information_schema_table_constraints",
            [
                ("dev", "public", f"{r['name']}_pkey", "dev", "public",
                 r["name"], "PRIMARY KEY", "NO", "NO", "YES")
                for r in snap["rels"]
                if _pk_cols(engine, r["name"])
            ],
            "constraint_catalog string, constraint_schema string,"
            " constraint_name string, table_catalog string,"
            " table_schema string, table_name string,"
            " constraint_type string, is_deferrable string,"
            " initially_deferred string, enforced string",
        )
    if want("information_schema_key_column_usage"):
        rows = []
        for r in snap["rels"]:
            for pos, col in enumerate(_pk_cols(engine, r["name"]),
                                      start=1):
                rows.append(
                    ("dev", "public", f"{r['name']}_pkey", "dev",
                     "public", r["name"], col, pos, None)
                )
        reg(
            "information_schema_key_column_usage",
            rows,
            "constraint_catalog string, constraint_schema string,"
            " constraint_name string, table_catalog string,"
            " table_schema string, table_name string, column_name string,"
            " ordinal_position int, position_in_unique_constraint int",
        )
    if want("pg_stat_activity"):
        # the driver session + every LIVE pgwire connection (reference
        # pg_stat_activity.rs over the SessionManager; KILL targets
        # these pids)
        db = getattr(engine, "current_db", "dev")
        rows = [(os.getpid(), 16866, db, _ROOT_UID, "root",
                 "risingwave_spark", "127.0.0.1", None, -1, "active")]
        srv = getattr(engine, "_pg_server", None)
        if srv is not None:
            with srv._lock:
                sess = list(srv.sessions.values())
            uid_of = {n: u["oid"] for n, u in
                      _users.load_state(engine)["users"].items()}
            rows += [
                (s["pid"], 16866, db, uid_of.get(s["user"], _ROOT_UID),
                 s["user"], "pgwire", s["addr"][0], None,
                 s["addr"][1], s.get("state", "idle"))
                for s in sess
            ]
        reg(
            "pg_stat_activity",
            rows,
            "pid int, datid int, datname string, usesysid int,"
            " usename string, application_name string, client_addr string,"
            " client_hostname string, client_port int, state string",
        )


# ---------------------------------------------------------------------------
# function rewrites (masked text; replacements never re-contain the call)

_CALL_HEAD = r"\b({})\s*\("


def _split_top(args: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in args:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail or out:
        out.append("".join(cur))
    return [a.strip() for a in out]


def _rewrite_calls(masked: str, names: dict) -> str:
    """Replace every `fn(args)` for fn in `names` with
    names[fn](args_list). Balanced-paren scan; replacements are loop-safe
    because no replacement contains its own call head."""
    rx = re.compile(_CALL_HEAD.format("|".join(names)), re.I)
    while True:
        m = rx.search(masked)
        if m is None:
            return masked
        depth, j = 1, m.end()
        while j < len(masked) and depth:
            if masked[j] == "(":
                depth += 1
            elif masked[j] == ")":
                depth -= 1
            j += 1
        if depth:
            return masked  # unbalanced — let Spark's parser report it
        args = _split_top(masked[m.end(): j - 1])
        repl = names[m.group(1).lower()](args)
        masked = masked[: m.start()] + repl + masked[j:]


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _pg_terminate(engine):
    """pg_terminate_backend(pid) over the LIVE pgwire session registry
    (constant-pid form; non-constant args fold to FALSE)."""
    def impl(a):
        try:
            pid = int(a[0].strip()) if a else -1
        except ValueError:
            return "FALSE"
        srv = getattr(engine, "_pg_server", None)
        return "TRUE" if (srv is not None and srv.kill_session(pid)) \
            else "FALSE"
    return impl


def _null_guard(arg: str, then: str, out_type: str = "STRING") -> str:
    return (
        f"(CASE WHEN ({arg}) IS NULL THEN CAST(NULL AS {out_type}) "
        f"ELSE {then} END)"
    )


def _format_type_expr(args: list[str]) -> str:
    """format_type(oid, typemod) — the typemod is ignored exactly as in
    the reference (format_type.rs:21 'since we don't support type
    modifier'); unknown oids render '???', NULL stays NULL."""
    a = args[0] if args else "NULL"
    arms = " ".join(
        f"WHEN {oid} THEN {_sq(name)}" for oid, name in sorted(_DISPLAY.items())
    )
    return _null_guard(a, f"(CASE ({a}) {arms} ELSE '???' END)")


def _pg_typeof_expr(args: list[str]) -> str:
    """pg_typeof → Spark typeof() with names mapped to the reference's
    type display (types/mod.rs Display); composite/array names fall
    through as Spark spells them (documented divergence)."""
    e = args[0] if args else "NULL"
    pairs = [
        ("boolean", "boolean"), ("tinyint", "smallint"),
        ("smallint", "smallint"), ("int", "integer"), ("bigint", "bigint"),
        ("float", "real"), ("double", "double precision"),
        ("string", "character varying"), ("date", "date"),
        ("timestamp", "timestamp with time zone"),
        ("timestamp_ntz", "timestamp without time zone"),
        ("binary", "bytea"),
    ]
    arms = " ".join(
        f"WHEN typeof({e}) = '{k}' THEN '{v}'" for k, v in pairs
    )
    return (
        f"(CASE WHEN typeof({e}) LIKE 'decimal%' THEN 'numeric' {arms} "
        f"ELSE typeof({e}) END)"
    )


def rewrite_pg_compat(engine, stmt: str) -> str:
    """Entry point: strip the pg_catalog qualifier, register referenced
    pg_catalog relations as temp views, rewrite the compat functions to
    plain Spark SQL. Called from the frontend's ad-hoc path before
    pg_to_spark_sql (the ::regclass cast must be resolved before the
    generic ::type rewrite would mangle it)."""
    masked, lits = _mask_strings(stmt)
    masked = re.sub(r"\bpg_catalog\s*\.\s*", "", masked, flags=re.I)
    # information_schema.X → the information_schema_X temp views
    masked = re.sub(
        r"\binformation_schema\s*\.\s*(\w+)", r"information_schema_\1",
        masked, flags=re.I)

    snap = _snapshot(engine)
    _register_views(engine, masked, snap)

    # 'name'::regclass / CAST('name' AS regclass) — catalog lookup at
    # rewrite time (reference cast_regclass.rs; constants only, like the
    # reference's bind-time resolution path for EXPLAIN/psql patterns)
    def _regclass(m: re.Match) -> str:
        name = lits[int(m.group(1))].strip("'").replace("''", "'")
        if "." in name and not name.startswith("public."):
            # 's.x'::regclass → the engine's mangled name
            sch, base = name.split(".", 1)
            rel = snap["by_name"].get(f"{sch}__{base}")
        else:
            rel = snap["by_name"].get(name.split(".")[-1])
        if rel is None:
            raise ValueError(f'relation "{name}" does not exist')
        return str(rel["oid"])

    masked = re.sub(r"\x00(\d+)\x00\s*::\s*regclass\b", _regclass, masked)
    masked = re.sub(
        r"\bCAST\s*\(\s*\x00(\d+)\x00\s+AS\s+regclass\s*\)",
        _regclass, masked, flags=re.I,
    )
    if re.search(r"::\s*regclass\b|\bAS\s+regclass\b", masked, re.I):
        raise NotImplementedError(
            "regclass casts are supported for string constants only "
            "(reference cast_regclass.rs resolves names via the catalog)"
        )

    viewdef_arms = " ".join(
        f"WHEN {r['oid']} THEN {_sq(_definition(snap, r['name']))}"
        for r in snap["rels"]
        if r["kind"] in ("v", "m") and r["nsp"] == _PUBLIC_NSP
    )
    size_arms = " ".join(
        f"WHEN {r['oid']} THEN CAST({_state_bytes(engine, r['name'])} AS BIGINT)"
        for r in snap["rels"]
        if r["nsp"] == _PUBLIC_NSP
        and (r["name"] in engine.tables or r["name"] in engine.mv_handles)
    )

    def _viewdef(args):
        a = args[0] if args else "NULL"
        if not viewdef_arms:
            return f"(CASE WHEN ({a}) IS NULL THEN CAST(NULL AS STRING) END)"
        return _null_guard(a, f"(CASE ({a}) {viewdef_arms} END)")

    def _relsize(args):
        a = args[0] if args else "NULL"
        if not size_arms:
            return f"(CASE WHEN ({a}) IS NULL THEN CAST(NULL AS BIGINT) "\
                   "ELSE CAST(0 AS BIGINT) END)"
        return _null_guard(
            a,
            f"coalesce((CASE ({a}) {size_arms} END), CAST(0 AS BIGINT))",
            "BIGINT",
        )

    def _unlit(s: str) -> str | None:
        m = re.fullmatch(r"\s*\x00(\d+)\x00\s*", s)
        return (lits[int(m.group(1))].strip("'").replace("''", "'")
                if m else None)

    def _has_priv(args):
        """has_table_privilege / has_schema_privilege /
        has_database_privilege over the REAL privilege catalog
        (reference expr/impl has_privilege.rs resolves against
        user_info the same way). Constant arguments only — the
        reference binds these at frontend time too. 2-arg form
        defaults to the session user; a trailing 'WITH GRANT OPTION'
        in the privilege string checks the grant option bit."""
        vals = [_unlit(x) for x in args]
        if len(vals) == 3:
            user, obj, priv = vals
        elif len(vals) == 2:
            user = getattr(engine, "session_user", "root")
            obj, priv = vals
        else:
            return "NULL"
        if obj is None or priv is None or user is None:
            return "NULL"
        if "." in obj:
            sch, nm = obj.split(".", 1)
            obj = nm if sch == "public" else f"{sch}__{nm}"

        ok = False
        for p in priv.split(","):
            p = p.strip().upper()
            wgo = p.endswith(" WITH GRANT OPTION")
            if wgo:
                p = p[: -len(" WITH GRANT OPTION")].strip()
            if _users.has_privilege(engine, user, p, obj,
                                    with_grant_option=wgo):
                ok = True
                break
        return "TRUE" if ok else "FALSE"

    # the session search_path decides current_schema/current_schemas
    # (reference builtin_scalar.rs current_schema over SearchPath)
    from risingwave_spark.frontend import effective_search_path

    _path = effective_search_path(engine)

    _db = _sq(getattr(engine, "current_db", "dev"))

    const = {
        # builtin_scalar.rs:442-694 binds these as literals the same way
        "current_database": lambda a: _db,
        "current_catalog": lambda a: _db,
        "current_schema": lambda a: (
            _sq(_path[0]) if _path else "CAST(NULL AS STRING)"),
        "current_schemas": lambda a: (
            "array(" + ", ".join(
                [_sq("pg_catalog")] * bool(
                    a and a[0].strip().lower() == "true")
                + [_sq(s) for s in _path]) + ")"
            if (_path or (a and a[0].strip().lower() == "true"))
            else "array()"
        ),
        "current_setting": lambda a: "CAST(NULL AS STRING)",
        "version": lambda a: (
            "'PostgreSQL 13.14.0-RisingWave-2.3.0 (risingwave-spark)'"
        ),
        "pg_backend_pid": lambda a: str(os.getpid()),
        "pg_postmaster_start_time": lambda a: (
            f"timestamp_seconds({int(_start_time(engine))})"
        ),
        # real user catalog (reference pg_get_userbyid.rs over user_info)
        "pg_get_userbyid": lambda a: _null_guard(
            a[0] if a else "NULL",
            "(CASE CAST((" + (a[0] if a else "NULL")
            + ") AS INT) " + " ".join(
                f"WHEN {u['oid']} THEN {_sq(n)}"
                for n, u in sorted(
                    _users.load_state(engine)["users"].items()))
            + f" WHEN {_ROOT_UID} THEN 'root' ELSE 'unknown (OID=' || "
            "CAST((" + (a[0] if a else "NULL") + ") AS STRING) || ')' END)",
        ),
        "pg_table_is_visible": lambda a: _null_guard(
            a[0] if a else "NULL", "TRUE", "BOOLEAN"
        ),
        "pg_type_is_visible": lambda a: "TRUE",
        "pg_get_viewdef": _viewdef,
        "pg_get_indexdef": lambda a: "CAST(NULL AS STRING)",
        "pg_get_constraintdef": lambda a: "CAST(NULL AS STRING)",
        "pg_get_partkeydef": lambda a: "CAST(NULL AS STRING)",
        "pg_get_serial_sequence": lambda a: "CAST(NULL AS STRING)",
        "pg_get_expr": lambda a: "CAST(NULL AS STRING)",
        "pg_tablespace_location": lambda a: "CAST(NULL AS STRING)",
        "pg_relation_size": _relsize,
        "pg_table_size": _relsize,
        "pg_total_relation_size": _relsize,
        "pg_indexes_size": lambda a: "CAST(0 AS BIGINT)",
        "pg_stat_get_numscans": lambda a: "CAST(0 AS BIGINT)",
        "pg_encoding_to_char": lambda a: "'UTF8'",
        "pg_my_temp_schema": lambda a: "0",
        "pg_is_in_recovery": lambda a: "FALSE",
        "pg_cancel_backend": lambda a: "FALSE",
        # genuinely terminates a live pgwire session (constant pid,
        # bound at rewrite time like the reference's frontend impl)
        "pg_terminate_backend": _pg_terminate(engine),
        "has_database_privilege": _has_priv,
        "has_table_privilege": _has_priv,
        "has_any_column_privilege": _has_priv,
        "has_schema_privilege": _has_priv,
        "obj_description": lambda a: "''",
        "shobj_description": lambda a: "''",
        "col_description": lambda a: "CAST(NULL AS STRING)",
        "format_type": _format_type_expr,
        "pg_typeof": _pg_typeof_expr,
    }
    masked = _rewrite_calls(masked, const)

    # parenless session keywords (PG grammar: these are keywords, not
    # calls — current_schema also parses both ways)
    session_user = getattr(engine, "session_user", "root")
    masked = re.sub(
        r"\b(current_user|session_user|current_role)\b(?!\s*\()",
        _sq(session_user), masked, flags=re.I,
    )
    masked = re.sub(
        r"\bcurrent_schema\b(?!\s*\()",
        _sq(_path[0]) if _path else "CAST(NULL AS STRING)",
        masked, flags=re.I,
    )
    masked = re.sub(
        r"\bcurrent_database\b(?!\s*\()", _db, masked, flags=re.I
    )
    return _unmask(masked, lits)


def _start_time(engine) -> float:
    if not hasattr(engine, "_pg_start_time"):
        engine._pg_start_time = time.time()
    return engine._pg_start_time


#: statement gate used by the frontend: anything that could touch this layer
PG_COMPAT_RX = re.compile(
    r"\bpg_\w+|\binformation_schema\s*\."
    r"|\bformat_type\s*\(|::\s*regclass|\bAS\s+regclass\b"
    r"|\bcurrent_(?:database|catalog|schemas?|role|setting|user)\b"
    r"|\bsession_user\b|\bversion\s*\(\s*\)|\bobj_description\s*\("
    r"|\bshobj_description\s*\(|\bcol_description\s*\("
    r"|\bhas_\w+_privilege\s*\(",
    re.I,
)
