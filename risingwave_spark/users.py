"""User catalog + privilege system (reference
``src/frontend/src/user/user_catalog.rs``, ``user_manager.rs``,
``handler/create_user.rs:111``, ``handler/alter_user.rs``,
``handler/drop_user.rs``, ``handler/handle_privilege.rs:201`` (grant)
``:243`` (revoke), bind-time checks ``handler/privilege.rs``;
``e2e_test/ddl/privilege.slt``).

The reference persists ``UserInfo`` protos in the meta store, separate
from the object catalog; this engine mirrors that split with a
``USERS.json`` document in the warehouse (the same shape SECRETS.json
already uses).  Passwords are stored as verifiers only — an md5 hash
(what the reference's ``encrypted_password`` produces,
``user_authentication.rs``) plus a SCRAM-SHA-256 verifier
(salt/iters/StoredKey/ServerKey, RFC 5802) so the pgwire front door can
run every auth mode against catalog users without the server ever
keeping a plaintext password.
"""

from __future__ import annotations

import base64
import hashlib
import os

#: the bootstrap superuser every warehouse has (reference
#: DEFAULT_SUPER_USER / DEFAULT_SUPER_USER_ID in common/src/catalog)
ROOT_USER = "root"
ROOT_UID = 10

#: actions grantable per object kind (reference acl/mod.rs:98-113
#: ALL_AVAILABLE_*_MODES)
AVAILABLE_MODES: dict[str, frozenset] = {
    "database": frozenset({"CREATE", "CONNECT"}),
    "schema": frozenset({"CREATE", "USAGE"}),
    "table": frozenset({"SELECT", "INSERT", "UPDATE", "DELETE"}),
    # views take the TABLE mode set in the reference (ViewId →
    # ALL_AVAILABLE_TABLE_MODES, user_privilege.rs:available_prost_privilege)
    "view": frozenset({"SELECT", "INSERT", "UPDATE", "DELETE"}),
    "source": frozenset({"SELECT"}),
    "mview": frozenset({"SELECT"}),
    "sink": frozenset({"SELECT"}),
    "subscription": frozenset({"SELECT"}),
    "function": frozenset({"EXECUTE"}),
    "connection": frozenset({"USAGE"}),
}


# ---------------------------------------------------------------- state
def _users_path(engine) -> str:
    return os.path.join(engine.warehouse, "USERS.json")


def load_state(engine) -> dict:
    import json

    try:
        with open(_users_path(engine)) as f:
            return json.load(f)
    except (FileNotFoundError, ValueError):
        return {"users": {}, "privileges": [], "owners": {},
                "next_oid": 16384}


def store_state(engine, st: dict) -> None:
    import json

    os.makedirs(engine.warehouse, exist_ok=True)
    tmp = _users_path(engine) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(st, f, indent=1)
    os.replace(tmp, _users_path(engine))


# ---------------------------------------------------------------- auth
def build_auth(user: str, password: str | None) -> dict | None:
    """Password → stored verifiers (md5 per the reference's
    ``encrypted_password``; SCRAM verifier per RFC 5802 so SCRAM auth
    needs no plaintext)."""
    if not password:
        return None
    from risingwave_spark.sources.pgwire import _scram_keys

    salt = os.urandom(16)
    iters = 4096
    _salted, _ckey, stored, skey = _scram_keys(password, salt, iters)
    return {
        "md5": hashlib.md5((password + user).encode()).hexdigest(),
        "scram": {
            "salt": base64.b64encode(salt).decode(),
            "iters": iters,
            "stored_key": base64.b64encode(stored).decode(),
            "server_key": base64.b64encode(skey).decode(),
        },
    }


def get_user(engine, name: str) -> dict | None:
    if name == ROOT_USER:
        # bootstrap superuser exists even in a fresh warehouse
        st = load_state(engine)
        return st["users"].get(ROOT_USER) or {
            "oid": ROOT_UID, "is_super": True, "can_create_db": True,
            "can_create_user": True, "can_login": True, "auth": None,
        }
    return load_state(engine)["users"].get(name)


def is_super(engine, name: str) -> bool:
    u = get_user(engine, name)
    return bool(u and u.get("is_super"))


# ---------------------------------------------------------------- owners
def set_owner(engine, obj: str, owner: str) -> None:
    st = load_state(engine)
    if st["owners"].get(obj) != owner:
        st["owners"][obj] = owner
        store_state(engine, st)


def get_owner(engine, obj: str) -> str:
    return load_state(engine)["owners"].get(obj, ROOT_USER)


def drop_object(engine, obj: str) -> None:
    """Object dropped: its owner entry and every privilege row on it go
    with it (the reference's meta cascades grant removal on drop)."""
    st = load_state(engine)
    changed = st["owners"].pop(obj, None) is not None
    kept = [p for p in st["privileges"] if p["obj"] != obj]
    if len(kept) != len(st["privileges"]):
        st["privileges"], changed = kept, True
    if changed:
        store_state(engine, st)


def rename_object(engine, old: str, new: str) -> None:
    st = load_state(engine)
    changed = False
    if old in st["owners"]:
        st["owners"][new] = st["owners"].pop(old)
        changed = True
    for p in st["privileges"]:
        if p["obj"] == old:
            p["obj"] = new
            changed = True
    if changed:
        store_state(engine, st)


# ------------------------------------------------------------ privileges
def grant(engine, users: list[str], actions: list[str], obj_type: str,
          objs: list[str], grant_option: bool, granted_by: str) -> None:
    st = load_state(engine)
    for uname in users:
        if uname != ROOT_USER and uname not in st["users"]:
            raise ValueError(f"user {uname!r} does not exist")
    have = {(p["user"], p["action"], p["obj"]): p for p in st["privileges"]}
    for uname in users:
        for obj in objs:
            for action in actions:
                key = (uname, action, obj)
                if key in have:
                    if grant_option:
                        have[key]["grant_option"] = True
                    continue
                st["privileges"].append({
                    "user": uname, "action": action, "obj_type": obj_type,
                    "obj": obj, "grant_option": grant_option,
                    "granted_by": granted_by,
                })
    store_state(engine, st)


def revoke(engine, users: list[str], actions: list[str], objs: list[str],
           grant_option_only: bool) -> None:
    st = load_state(engine)
    if grant_option_only:
        # REVOKE GRANT OPTION FOR ... : the privilege stays, the
        # ability to re-grant it goes (handle_privilege.rs revoke path)
        for p in st["privileges"]:
            if (p["user"] in users and p["action"] in actions
                    and p["obj"] in objs):
                p["grant_option"] = False
    else:
        st["privileges"] = [
            p for p in st["privileges"]
            if not (p["user"] in users and p["action"] in actions
                    and p["obj"] in objs)
        ]
    store_state(engine, st)


def has_privilege(engine, user: str, action: str, obj: str,
                  *, with_grant_option: bool = False) -> bool:
    """Superuser and object owner pass every check (reference
    privilege.rs check_privileges: ``if user.is_super || item.owner ==
    user.id { continue }``)."""
    u = get_user(engine, user)
    if u is None:
        return False
    if u.get("is_super"):
        return True
    st = load_state(engine)
    if st["owners"].get(obj) == user:
        return True
    for p in st["privileges"]:
        if p["user"] == user and p["action"] == action and p["obj"] == obj:
            if not with_grant_option or p["grant_option"]:
                return True
    return False


def check(engine, user: str, action: str, obj: str, obj_kind: str) -> None:
    if not has_privilege(engine, user, action, obj):
        # the reference's exact error text (privilege.rs PermissionDenied)
        raise PermissionError(
            f"permission denied for {obj_kind} {obj.split('__')[-1]}"
        )
