"""SQL/JSON path functions — the reference's `jsonb_path_exists` /
`jsonb_path_query_first` / `jsonb_path_query_array` / `jsonb_path_match`
(`src/expr/impl/src/scalar/jsonb_path.rs`), over Spark's JSONPath
engine (`get_json_object`).

Covered path subset (the overwhelmingly common one): member access
`$.a.b`, array subscripts `$.a[0]`, wildcards `$.a[*].b`. PG's filter
expressions `? (@ > 2)` and methods (`.size()`, `.type()`) are not
translated — paths containing them raise rather than silently misread.

Divergence note (documented, matches the repo's JSON convention):
string results come back UNQUOTED (Spark's get_json_object behavior),
where PG jsonb_path_query returns jsonb with quotes. Numeric / array /
object results are identical text.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_UNSUPPORTED = re.compile(r"\?|@|\.\s*\w+\s*\(")  # filters / item methods


def _check(path: str) -> str:
    if _UNSUPPORTED.search(path):
        raise ValueError(
            f"jsonb_path: unsupported JSONPath feature in {path!r} "
            "(filter expressions / item methods are not translated)"
        )
    return path


def _col(j) -> Column:
    return F.col(j) if isinstance(j, str) else j


def jsonb_path_query_first(j, path: str) -> Column:
    """First match of the path, as text (NULL when no match)."""
    path = _check(path)  # validate before any column construction
    return F.get_json_object(_col(j), path)


def jsonb_path_exists(j, path: str) -> Column:
    """Does the path yield any item?"""
    path = _check(path)
    return F.get_json_object(_col(j), path).isNotNull()


def jsonb_path_query_array(j, path: str) -> Column:
    """All matches as a JSON array string. A wildcard path already yields
    an array from the engine; a single-item path is wrapped in [...]."""
    path = _check(path)
    raw = F.get_json_object(_col(j), path)
    if "[*]" in path:
        return raw
    return F.when(raw.isNotNull(), F.concat(F.lit("["), raw, F.lit("]")))


_MATCH = re.compile(
    r"^\s*(?P<path>\$[\w.\[\]*]*)\s*(?P<op>==|!=|<>|>=|<=|>|<)\s*(?P<lit>.+?)\s*$"
)


def jsonb_path_match(j, predicate: str) -> Column:
    """Boolean predicate path `$.a.b <op> literal` (the common
    jsonb_path_match shape). Numeric literals compare numerically,
    quoted literals as text."""
    m = _MATCH.match(predicate)
    if not m:
        raise ValueError(f"jsonb_path_match: cannot parse predicate {predicate!r}")
    path = _check(m.group("path"))
    val = F.get_json_object(_col(j), path)
    lit = m.group("lit")
    if re.fullmatch(r"-?\d+(\.\d+)?", lit):
        val = val.cast("double")
        rhs = F.lit(float(lit))
    elif lit.startswith('"') and lit.endswith('"'):
        rhs = F.lit(lit[1:-1])
    elif lit in ("true", "false"):
        val = val.cast("boolean")
        rhs = F.lit(lit == "true")
    else:
        raise ValueError(f"jsonb_path_match: unsupported literal {lit!r}")
    op = m.group("op")
    return {
        "==": val == rhs,
        "!=": val != rhs,
        "<>": val != rhs,
        ">": val > rhs,
        "<": val < rhs,
        ">=": val >= rhs,
        "<=": val <= rhs,
    }[op]
