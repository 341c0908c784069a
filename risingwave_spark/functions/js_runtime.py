"""LANGUAGE javascript UDFs: a pure-Python JavaScript interpreter.

Reference `src/expr/impl/src/udf/quickjs.rs` runs `language ==
"javascript"` UDFs under an embedded QuickJS; this container has no
quickjs, so this module interprets a practical JavaScript subset
directly — real tokenizer, Pratt parser and tree-walking evaluator,
no exec()/eval() of Python, no JS-to-Python transpilation. The
surface covers everything the reference exercises in
`e2e_test/udf/js_udf.slt`:

- scalar functions:  ``export function name(a, b) { ... }``
- table functions:   ``export function* name(n) { yield ...; }``
- aggregates:        ``export function create_state/accumulate/
  retract/finish`` (CREATE AGGREGATE ... LANGUAGE javascript)
- legacy bare bodies (no ``export``): the body IS the function body

Language subset: var/let/const, if/else, while, do-while, for
(classic / for-of / for-in), switch, try/catch/finally/throw,
functions + closures, generators (``function*``/``yield``/``yield*``),
arrow functions, template literals, ternary/logical/bitwise/equality/
relational/shift/arithmetic/exponent operators, ++/--/compound
assignment, objects (incl. shorthand + computed keys), arrays,
member/index access and assignment, spread in array literals and
calls, Math/JSON/Object/Array/Number/String globals and the common
string/array methods. Type bridge mirrors quickjs.rs: SQL NULL ↔
``null``, int/float ↔ number, decimal ↔ exact big-decimal (Python
Decimal; ``typeof`` says "bigdecimal" like the reference's BigDecimal
extension), varchar ↔ string, bytea ↔ byte array (``toString()``
joins with commas like Uint8Array), jsonb ↔ parsed object.

Documented divergences (all loud or semantically benign for UDFs):
- generator functions collect their yields EAGERLY per call (a UDF
  call site always drains the iterator; infinite generators would
  hang in quickjs's arrow bridge too, they fail fast here)
- regex literals, classes, async/await, getters/setters, labels and
  ``new`` are not implemented — they raise SyntaxError at CREATE
- number printing uses Python's shortest-round-trip repr (same
  contract as JS's ToString for every value the test surface covers)
"""

from __future__ import annotations

import json as _json
import math
from decimal import Decimal

__all__ = [
    "JSError",
    "JSSyntaxError",
    "JSRuntimeError",
    "compile_js",
    "js_str",
    "js_to_sql",
    "sql_to_js",
]


class JSError(ValueError):
    """Base for everything the interpreter raises on user JS."""


class JSSyntaxError(JSError):
    pass


class JSRuntimeError(JSError):
    pass


class _Undefined:
    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "undefined"

    def __bool__(self):
        return False


UNDEF = _Undefined()

# ------------------------------------------------------------------ lexer

_KEYWORDS = {
    "var", "let", "const", "if", "else", "while", "do", "for", "of",
    "in", "function", "return", "yield", "break", "continue", "true",
    "false", "null", "undefined", "typeof", "void", "new", "delete",
    "switch", "case", "default", "try", "catch", "finally", "throw",
    "instanceof", "class", "async", "await", "export",
}

_PUNCT = [
    ">>>=", "...", "===", "!==", "**=", "<<=", ">>=", ">>>", "&&=",
    "||=", "??=", "=>", "==", "!=", "<=", ">=", "&&", "||", "??",
    "++", "--", "+=", "-=", "*=", "/=", "%=", "&=", "|=", "^=", "**",
    "<<", ">>", "?.", "{", "}", "(", ")", "[", "]", ";", ",", "<",
    ">", "+", "-", "*", "/", "%", "&", "|", "^", "!", "~", "?", ":",
    "=", ".", "$",
]

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
            "v": "\v", "0": "\0", "'": "'", '"': '"', "`": "`",
            "\\": "\\", "\n": ""}


def _read_string(src: str, i: int, quote: str) -> tuple[str, int]:
    out = []
    i += 1
    n = len(src)
    while i < n and src[i] != quote:
        ch = src[i]
        if ch == "\\":
            i += 1
            if i >= n:
                break
            e = src[i]
            if e == "u":
                if src[i + 1:i + 2] == "{":
                    j = src.index("}", i)
                    out.append(chr(int(src[i + 2:j], 16)))
                    i = j
                else:
                    out.append(chr(int(src[i + 1:i + 5], 16)))
                    i += 4
            elif e == "x":
                out.append(chr(int(src[i + 1:i + 3], 16)))
                i += 2
            else:
                out.append(_ESCAPES.get(e, e))
            i += 1
        else:
            out.append(ch)
            i += 1
    if i >= n:
        raise JSSyntaxError("unterminated string literal")
    s = "".join(out)
    if any("\ud800" <= ch <= "\udfff" for ch in s):
        # JS strings are UTF-16: a \uD800-\uDBFF + \uDC00-\uDFFF escape
        # pair denotes one astral code point — recombine
        try:
            s = s.encode("utf-16", "surrogatepass").decode("utf-16")
        except UnicodeDecodeError:
            pass  # lone surrogate: keep as-is (JS allows it too)
    return s, i + 1


def tokenize(src: str) -> list[tuple[str, object]]:
    """→ [(kind, value)]; kinds: num str tmpl ident kw punct eof.
    Template literals tokenize as ('tmpl', [part, ...]) where parts
    alternate literal strings and token sublists for ${...} holes."""
    toks: list[tuple[str, object]] = []
    i, n = 0, len(src)
    while i < n:
        ch = src[i]
        if ch in " \t\r\n":
            i += 1
            continue
        if src.startswith("//", i):
            j = src.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if src.startswith("/*", i):
            j = src.find("*/", i + 2)
            if j < 0:
                raise JSSyntaxError("unterminated block comment")
            i = j + 2
            continue
        if ch in "'\"":
            s, i = _read_string(src, i, ch)
            toks.append(("str", s))
            continue
        if ch == "`":
            parts: list[object] = []
            buf: list[str] = []
            i += 1
            while i < n and src[i] != "`":
                if src.startswith("${", i):
                    parts.append("".join(buf))
                    buf = []
                    depth, j = 1, i + 2
                    while j < n and depth:
                        if src[j] == "{":
                            depth += 1
                        elif src[j] == "}":
                            depth -= 1
                        j += 1
                    parts.append(tokenize(src[i + 2:j - 1]))
                    i = j
                elif src[i] == "\\":
                    e = src[i + 1]
                    buf.append(_ESCAPES.get(e, e))
                    i += 2
                else:
                    buf.append(src[i])
                    i += 1
            if i >= n:
                raise JSSyntaxError("unterminated template literal")
            parts.append("".join(buf))
            toks.append(("tmpl", parts))
            i += 1
            continue
        if ch.isdigit() or (ch == "." and src[i + 1:i + 2].isdigit()):
            j = i
            if src.startswith(("0x", "0X"), i):
                j = i + 2
                while j < n and src[j] in "0123456789abcdefABCDEF":
                    j += 1
                toks.append(("num", int(src[i:j], 16)))
                i = j
                continue
            while j < n and (src[j].isdigit() or src[j] in ".eE" or
                             (src[j] in "+-" and src[j - 1] in "eE")):
                j += 1
            text = src[i:j]
            toks.append(("num",
                         int(text) if text.isdigit() else float(text)))
            i = j
            continue
        if ch.isalpha() or ch in "_$":
            j = i
            while j < n and (src[j].isalnum() or src[j] in "_$"):
                j += 1
            w = src[i:j]
            toks.append(("kw", w) if w in _KEYWORDS else ("ident", w))
            i = j
            continue
        for p in _PUNCT:
            if src.startswith(p, i):
                toks.append(("punct", p))
                i += len(p)
                break
        else:
            raise JSSyntaxError(f"unexpected character {ch!r}")
    toks.append(("eof", None))
    return toks


# ----------------------------------------------------------------- parser
# AST: tuples ('node_kind', ...). Kept positional and tiny — the
# evaluator dispatches on [0].

_ASSIGN_OPS = {"=", "+=", "-=", "*=", "/=", "%=", "**=", "&=", "|=",
               "^=", "<<=", ">>=", ">>>=", "&&=", "||=", "??="}
# binary operator → precedence (higher binds tighter)
_BINOPS = {
    "??": 1, "||": 2, "&&": 3, "|": 4, "^": 5, "&": 6,
    "==": 7, "!=": 7, "===": 7, "!==": 7,
    "<": 8, ">": 8, "<=": 8, ">=": 8, "in": 8, "instanceof": 8,
    "<<": 9, ">>": 9, ">>>": 9,
    "+": 10, "-": 10,
    "*": 11, "/": 11, "%": 11,
    "**": 12,
}


class _Parser:
    def __init__(self, toks: list[tuple[str, object]]):
        self.toks = toks
        self.i = 0
        self.fn_depth = 0  # export is legal only at module top level

    # --- token helpers
    def peek(self, k: int = 0):
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def at(self, kind: str, val=None) -> bool:
        t = self.peek()
        return t[0] == kind and (val is None or t[1] == val)

    def eat(self, kind: str, val=None):
        if not self.at(kind, val):
            raise JSSyntaxError(
                f"expected {val or kind}, got {self.peek()[1]!r}")
        t = self.toks[self.i]
        self.i += 1
        return t

    def opt(self, kind: str, val=None) -> bool:
        if self.at(kind, val):
            self.i += 1
            return True
        return False

    # --- program / statements
    def parse_program(self) -> list:
        body = []
        while not self.at("eof"):
            body.append(self.statement())
        return body

    def statement(self):
        t = self.peek()
        if t[0] == "punct" and t[1] == "{":
            return self.block()
        if t[0] == "punct" and t[1] == ";":
            self.i += 1
            return ("empty",)
        if t[0] == "kw":
            w = t[1]
            if w == "export":
                if self.fn_depth:
                    raise JSSyntaxError(
                        "export is only allowed at module top level")
                self.i += 1
                fn = self.statement()
                if fn[0] != "funcdecl":
                    raise JSSyntaxError("export supports function "
                                        "declarations only")
                return ("export", fn)
            if w in ("var", "let", "const"):
                return self.var_decl()
            if w == "if":
                return self.if_stmt()
            if w == "while":
                self.i += 1
                self.eat("punct", "(")
                cond = self.expression()
                self.eat("punct", ")")
                return ("while", cond, self.statement())
            if w == "do":
                self.i += 1
                body = self.statement()
                self.eat("kw", "while")
                self.eat("punct", "(")
                cond = self.expression()
                self.eat("punct", ")")
                self.opt("punct", ";")
                return ("dowhile", cond, body)
            if w == "for":
                return self.for_stmt()
            if w == "function":
                return self.func_decl()
            if w == "return":
                self.i += 1
                if self.at("punct", ";") or self.at("punct", "}") \
                        or self.at("eof"):
                    self.opt("punct", ";")
                    return ("return", None)
                e = self.expression()
                self.opt("punct", ";")
                return ("return", e)
            if w == "break":
                self.i += 1
                self.opt("punct", ";")
                return ("break",)
            if w == "continue":
                self.i += 1
                self.opt("punct", ";")
                return ("continue",)
            if w == "throw":
                self.i += 1
                e = self.expression()
                self.opt("punct", ";")
                return ("throw", e)
            if w == "switch":
                return self.switch_stmt()
            if w == "try":
                return self.try_stmt()
            if w in ("class", "async", "await", "new", "delete"):
                raise JSSyntaxError(
                    f"JS subset: {w!r} is not supported in UDF bodies")
        e = self.expression()
        self.opt("punct", ";")
        return ("exprstmt", e)

    def block(self):
        self.eat("punct", "{")
        body = []
        while not self.at("punct", "}"):
            body.append(self.statement())
        self.eat("punct", "}")
        return ("block", body)

    def var_decl(self, eat_semi: bool = True):
        kind = self.eat("kw")[1]
        decls = []
        while True:
            name = self.binding_target()
            init = None
            if self.opt("punct", "="):
                init = self.assignment()
            decls.append((name, init))
            if not self.opt("punct", ","):
                break
        if eat_semi:
            self.opt("punct", ";")
        return ("vardecl", kind, decls)

    def binding_target(self):
        """A declaration binding: plain name, or a (one-level)
        destructuring pattern — [a, b, ...rest] / {a, b: alias}."""
        if self.at("punct", "["):
            self.i += 1
            names = []
            while not self.at("punct", "]"):
                if self.opt("punct", "..."):
                    names.append(("rest", self.eat("ident")[1]))
                elif self.at("punct", ","):
                    names.append(None)  # hole: [, b]
                else:
                    names.append(("n", self.eat("ident")[1]))
                if not self.opt("punct", ","):
                    break
            self.eat("punct", "]")
            return ("apat", names)
        if self.at("punct", "{"):
            self.i += 1
            pairs = []  # (source key, bound name)
            while not self.at("punct", "}"):
                key = self.eat("ident")[1]
                if self.opt("punct", ":"):
                    pairs.append((key, self.eat("ident")[1]))
                else:
                    pairs.append((key, key))
                if not self.opt("punct", ","):
                    break
            self.eat("punct", "}")
            return ("opat", pairs)
        return self.eat("ident")[1]

    def if_stmt(self):
        self.eat("kw", "if")
        self.eat("punct", "(")
        cond = self.expression()
        self.eat("punct", ")")
        then = self.statement()
        alt = self.statement() if self.opt("kw", "else") else None
        return ("if", cond, then, alt)

    def for_stmt(self):
        self.eat("kw", "for")
        self.eat("punct", "(")
        init = None
        if not self.at("punct", ";"):
            if self.peek()[0] == "kw" and self.peek()[1] in (
                    "var", "let", "const"):
                init = self.var_decl(eat_semi=False)
            else:
                init = ("exprstmt", self.expression())
            # for-of / for-in: `for (let x of expr)` / `in`
            if self.peek() == ("kw", "of") or self.peek() == ("kw", "in"):
                mode = self.eat("kw")[1]
                if init[0] == "vardecl":
                    if len(init[2]) != 1 or init[2][0][1] is not None:
                        raise JSSyntaxError("bad for-of/in binding")
                    target = init[2][0][0]  # name or destructuring pat
                elif init[0] == "exprstmt" and init[1][0] == "ident":
                    target = init[1][1]
                else:
                    raise JSSyntaxError("bad for-of/in binding")
                seq = self.expression()
                self.eat("punct", ")")
                return ("forof" if mode == "of" else "forin",
                        target, seq, self.statement())
        self.eat("punct", ";")
        cond = None if self.at("punct", ";") else self.expression()
        self.eat("punct", ";")
        update = None if self.at("punct", ")") else self.expression()
        self.eat("punct", ")")
        return ("for", init, cond, update, self.statement())

    def func_decl(self):
        self.eat("kw", "function")
        is_gen = self.opt("punct", "*")
        name = self.eat("ident")[1]
        params = self.param_list()
        self.fn_depth += 1
        try:
            body = self.block()
        finally:
            self.fn_depth -= 1
        return ("funcdecl", name, params, body, is_gen)

    def param_list(self):
        self.eat("punct", "(")
        params = []
        while not self.at("punct", ")"):
            if self.opt("punct", "..."):
                params.append(("rest", self.eat("ident")[1]))
            else:
                nm = self.eat("ident")[1]
                dflt = self.assignment() if self.opt("punct", "=") else None
                params.append(("p", nm, dflt))
            if not self.opt("punct", ","):
                break
        self.eat("punct", ")")
        return params

    def switch_stmt(self):
        self.eat("kw", "switch")
        self.eat("punct", "(")
        disc = self.expression()
        self.eat("punct", ")")
        self.eat("punct", "{")
        cases = []  # (test|None, [stmts])
        while not self.at("punct", "}"):
            if self.opt("kw", "case"):
                test = self.expression()
            else:
                self.eat("kw", "default")
                test = None
            self.eat("punct", ":")
            body = []
            while not (self.at("kw", "case") or self.at("kw", "default")
                       or self.at("punct", "}")):
                body.append(self.statement())
            cases.append((test, body))
        self.eat("punct", "}")
        return ("switch", disc, cases)

    def try_stmt(self):
        self.eat("kw", "try")
        block = self.block()
        cname, cblock, fblock = None, None, None
        if self.opt("kw", "catch"):
            if self.opt("punct", "("):
                cname = self.eat("ident")[1]
                self.eat("punct", ")")
            cblock = self.block()
        if self.opt("kw", "finally"):
            fblock = self.block()
        return ("try", block, cname, cblock, fblock)

    # --- expressions
    def expression(self):
        e = self.assignment()
        if self.at("punct", ","):
            seq = [e]
            while self.opt("punct", ","):
                seq.append(self.assignment())
            return ("seq", seq)
        return e

    def assignment(self):
        arrow = self.try_arrow()
        if arrow is not None:
            return arrow
        if self.at("kw", "yield"):
            self.i += 1
            if self.opt("punct", "*"):
                return ("yieldstar", self.assignment())
            if self.at("punct", ";") or self.at("punct", ")") \
                    or self.at("punct", "}") or self.at("punct", ","):
                return ("yield", None)
            return ("yield", self.assignment())
        left = self.ternary()
        t = self.peek()
        if t[0] == "punct" and t[1] in _ASSIGN_OPS:
            self.i += 1
            right = self.assignment()
            if left[0] not in ("ident", "member", "index"):
                raise JSSyntaxError("invalid assignment target")
            return ("assign", t[1], left, right)
        return left

    def try_arrow(self):
        """Detect `x =>` / `(a, b) =>` at the current position; parse
        and return the arrow node, or None (position restored)."""
        start = self.i
        params = None
        if self.at("ident") and self.peek(1) == ("punct", "=>"):
            params = [("p", self.eat("ident")[1], None)]
        elif self.at("punct", "("):
            depth, j = 0, self.i
            while j < len(self.toks):
                t = self.toks[j]
                if t == ("punct", "("):
                    depth += 1
                elif t == ("punct", ")"):
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            if self.toks[j + 1:j + 2] == [("punct", "=>")]:
                try:
                    params = self.param_list()
                except JSSyntaxError:
                    self.i = start
                    return None
        if params is None:
            return None
        self.eat("punct", "=>")
        self.fn_depth += 1
        try:
            if self.at("punct", "{"):
                body = self.block()
                return ("func", None, params, body, False)
            expr = self.assignment()
            return ("func", None, params, ("return", expr), False)
        finally:
            self.fn_depth -= 1

    def ternary(self):
        cond = self.binary(0)
        if self.opt("punct", "?"):
            a = self.assignment()
            self.eat("punct", ":")
            b = self.assignment()
            return ("cond", cond, a, b)
        return cond

    def binary(self, min_prec: int):
        left = self.unary()
        while True:
            t = self.peek()
            op = t[1] if t[0] == "punct" else (
                t[1] if t[0] == "kw" and t[1] in ("in", "instanceof")
                else None)
            prec = _BINOPS.get(op)
            if prec is None or prec < min_prec:
                return left
            self.i += 1
            # ** is right-associative; everything else left
            nxt = prec if op == "**" else prec + 1
            right = self.binary(nxt)
            if op in ("&&", "||", "??"):
                left = ("logic", op, left, right)
            else:
                left = ("bin", op, left, right)

    def unary(self):
        t = self.peek()
        if t[0] == "punct" and t[1] in ("!", "~", "+", "-"):
            self.i += 1
            return ("unary", t[1], self.unary())
        if t[0] == "kw" and t[1] in ("typeof", "void"):
            self.i += 1
            return ("unary", t[1], self.unary())
        if t[0] == "punct" and t[1] in ("++", "--"):
            self.i += 1
            target = self.unary()
            return ("update", t[1], target, True)
        return self.postfix()

    def postfix(self):
        e = self.call_member()
        t = self.peek()
        if t[0] == "punct" and t[1] in ("++", "--"):
            self.i += 1
            return ("update", t[1], e, False)
        return e

    def call_member(self):
        e = self.primary()
        while True:
            if self.opt("punct", "."):
                name = self.toks[self.i]
                if name[0] not in ("ident", "kw"):
                    raise JSSyntaxError("expected property name")
                self.i += 1
                e = ("member", e, name[1])
            elif self.opt("punct", "?."):
                name = self.eat("ident")[1]
                e = ("optmember", e, name)
            elif self.at("punct", "["):
                self.i += 1
                idx = self.expression()
                self.eat("punct", "]")
                e = ("index", e, idx)
            elif self.at("punct", "("):
                self.i += 1
                args = []
                while not self.at("punct", ")"):
                    if self.opt("punct", "..."):
                        args.append(("spread", self.assignment()))
                    else:
                        args.append(self.assignment())
                    if not self.opt("punct", ","):
                        break
                self.eat("punct", ")")
                e = ("call", e, args)
            else:
                return e

    def primary(self):
        t = self.peek()
        if t[0] == "num":
            self.i += 1
            return ("num", t[1])
        if t[0] == "str":
            self.i += 1
            return ("str", t[1])
        if t[0] == "tmpl":
            self.i += 1
            parts = []
            for k, p in enumerate(t[1]):
                if k % 2 == 0:
                    parts.append(("str", p))
                else:
                    parts.append(_Parser(p + [("eof", None)]).expression())
            return ("tmpllit", parts)
        if t[0] == "ident":
            self.i += 1
            return ("ident", t[1])
        if t[0] == "kw":
            w = t[1]
            if w == "true":
                self.i += 1
                return ("lit", True)
            if w == "false":
                self.i += 1
                return ("lit", False)
            if w == "null":
                self.i += 1
                return ("lit", None)
            if w == "undefined":
                self.i += 1
                return ("lit", UNDEF)
            if w == "function":
                self.i += 1
                is_gen = self.opt("punct", "*")
                name = self.eat("ident")[1] if self.at("ident") else None
                params = self.param_list()
                self.fn_depth += 1
                try:
                    body = self.block()
                finally:
                    self.fn_depth -= 1
                return ("func", name, params, body, is_gen)
            if w in ("in", "of", "this"):
                self.i += 1
                return ("ident", w)
            raise JSSyntaxError(f"JS subset: {w!r} is not supported "
                                "in UDF bodies")
        if t == ("punct", "("):
            self.i += 1
            e = self.expression()
            self.eat("punct", ")")
            return e
        if t == ("punct", "["):
            self.i += 1
            items = []
            while not self.at("punct", "]"):
                if self.opt("punct", "..."):
                    items.append(("spread", self.assignment()))
                else:
                    items.append(self.assignment())
                if not self.opt("punct", ","):
                    break
            self.eat("punct", "]")
            return ("array", items)
        if t == ("punct", "{"):
            self.i += 1
            props = []  # (keyexpr|str, valueexpr)
            while not self.at("punct", "}"):
                if self.opt("punct", "..."):
                    props.append(("spread", self.assignment()))
                elif self.at("punct", "["):
                    self.i += 1
                    k = self.expression()
                    self.eat("punct", "]")
                    self.eat("punct", ":")
                    props.append((("expr", k), self.assignment()))
                else:
                    kt = self.peek()
                    if kt[0] in ("ident", "kw", "str"):
                        self.i += 1
                        key = str(kt[1])
                    elif kt[0] == "num":
                        self.i += 1
                        key = js_str(kt[1])
                    else:
                        raise JSSyntaxError("bad object key")
                    if self.opt("punct", ":"):
                        props.append((key, self.assignment()))
                    elif self.at("punct", "("):  # method shorthand
                        params = self.param_list()
                        body = self.block()
                        props.append(
                            (key, ("func", key, params, body, False)))
                    else:  # {a, b} shorthand
                        props.append((key, ("ident", key)))
                if not self.opt("punct", ","):
                    break
            self.eat("punct", "}")
            return ("object", props)
        raise JSSyntaxError(f"unexpected token {t[1]!r}")


# -------------------------------------------------------------- evaluator

class _Break(Exception):
    pass


class _Continue(Exception):
    pass


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class JSThrow(JSRuntimeError):
    def __init__(self, value):
        super().__init__(js_str(value))
        self.value = value


class Scope:
    __slots__ = ("vars", "parent")

    def __init__(self, parent: "Scope | None" = None):
        self.vars: dict = {}
        self.parent = parent

    def get(self, name: str):
        s = self
        while s is not None:
            if name in s.vars:
                return s.vars[name]
            s = s.parent
        raise JSRuntimeError(f"{name} is not defined")

    def set(self, name: str, value) -> None:
        s = self
        while s is not None:
            if name in s.vars:
                s.vars[name] = value
                return
            s = s.parent
        # JS sloppy-mode implicit global; declare in the top scope
        s = self
        while s.parent is not None:
            s = s.parent
        s.vars[name] = value

    def declare(self, name: str, value) -> None:
        self.vars[name] = value


class JSFunction:
    """A user JS function: `body` is COMPILED code (a Python closure
    tree built once at parse — see Interpreter.compile_stmt), `dflts`
    the compiled default-parameter initializers."""

    __slots__ = ("name", "params", "body", "scope", "is_gen", "dflts")

    def __init__(self, name, params, body, scope, is_gen, dflts=None):
        self.name = name or "anonymous"
        self.params = params
        self.body = body
        self.scope = scope
        self.is_gen = is_gen
        self.dflts = dflts or [None] * len(params)

    def __call__(self, *args):
        interp = _ACTIVE[-1]
        return interp.call_function(self, list(args))


#: interpreter stack — lets Python-side builtins (Array.map callbacks)
#: re-enter the active interpreter without threading it through
_ACTIVE: list["Interpreter"] = []


def js_truthy(v) -> bool:
    t = type(v)
    if t is bool:
        return v
    if t is int or t is float:
        return v != 0 and v == v
    if t is str:
        return len(v) > 0
    if v is None or v is UNDEF:
        return False
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return v != 0 and v == v  # NaN falsy
    if isinstance(v, Decimal):
        return v != 0
    if isinstance(v, str):
        return len(v) > 0
    return True  # objects/arrays/functions/bytes are truthy


def js_str(v) -> str:
    """JS ToString — the printing contract UDF results rely on."""
    if v is UNDEF:
        return "undefined"
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
        if v == int(v) and abs(v) < 1e21:
            return str(int(v))
        return repr(v)
    if isinstance(v, Decimal):
        return format(v, "f")
    if isinstance(v, str):
        return v
    if isinstance(v, (bytes, bytearray)):
        return ",".join(str(b) for b in v)  # Uint8Array.toString
    if isinstance(v, list):
        return ",".join("" if x is None or x is UNDEF else js_str(x)
                        for x in v)
    if isinstance(v, dict):
        return "[object Object]"
    if isinstance(v, JSFunction):
        return f"function {v.name}() {{ [js code] }}"
    return str(v)


def js_num(v) -> float | int:
    """JS ToNumber."""
    t = type(v)
    if t is int or t is float:
        return v
    if isinstance(v, bool):
        return 1 if v else 0
    if isinstance(v, (int, float)):
        return v
    if isinstance(v, Decimal):
        return v  # stays exact through arithmetic
    if v is None:
        return 0
    if v is UNDEF:
        return math.nan
    if isinstance(v, str):
        s = v.strip()
        if not s:
            return 0
        try:
            if s.lower().startswith(("0x", "-0x", "+0x")):
                return int(s, 16)
            return int(s)
        except ValueError:
            try:
                return float(s)
            except ValueError:
                return math.nan
    if isinstance(v, list):
        if not v:
            return 0
        if len(v) == 1:
            return js_num(v[0])
    return math.nan


def _to_int32(v) -> int:
    n = js_num(v)
    if isinstance(n, Decimal):
        n = float(n)
    if isinstance(n, float):
        if math.isnan(n) or math.isinf(n):
            return 0
        n = int(n)
    return ((n & 0xFFFFFFFF) ^ 0x80000000) - 0x80000000


def _to_uint32(v) -> int:
    n = js_num(v)
    if isinstance(n, Decimal):
        n = float(n)
    if isinstance(n, float):
        if math.isnan(n) or math.isinf(n):
            return 0
        n = int(n)
    return n & 0xFFFFFFFF


def _numeric_pair(a, b):
    """Coerce per JS arithmetic; Decimal propagates exactly against
    int/Decimal (the quickjs BigDecimal posture) and degrades to float
    against float."""
    ta, tb = type(a), type(b)
    if (ta is int or ta is float) and (tb is int or tb is float):
        return a, b  # the hot path: numbers stay numbers
    x, y = js_num(a), js_num(b)
    if isinstance(x, Decimal) or isinstance(y, Decimal):
        if isinstance(x, float) or isinstance(y, float):
            return float(x), float(y)
        return (x if isinstance(x, Decimal) else Decimal(x),
                y if isinstance(y, Decimal) else Decimal(y))
    return x, y


def js_add(a, b):
    if isinstance(a, str) or isinstance(b, str):
        return js_str(a) + js_str(b)
    if isinstance(a, list) or isinstance(b, list) or \
            isinstance(a, dict) or isinstance(b, dict):
        return js_str(a) + js_str(b)
    x, y = _numeric_pair(a, b)
    return x + y


def _js_mod(x, y):
    if isinstance(x, Decimal) and isinstance(y, Decimal):
        if y == 0:
            return math.nan
        return x - y * (x / y).to_integral_value(rounding="ROUND_DOWN")
    if isinstance(x, int) and isinstance(y, int):
        if y == 0:
            return math.nan
        r = abs(x) % abs(y)
        return r if x >= 0 else -r
    try:
        return math.fmod(x, y)
    except ValueError:
        return math.nan


def _js_div(x, y):
    if isinstance(x, Decimal) and isinstance(y, Decimal):
        if y == 0:
            return math.nan
        return x / y
    if y == 0:
        if (isinstance(x, float) and math.isnan(x)) or x == 0:
            return math.nan
        return math.inf if x > 0 else -math.inf
    return x / y


def js_strict_eq(a, b) -> bool:
    ta, tb = type(a), type(b)
    if (ta is int or ta is float) and (tb is int or tb is float):
        return a == b
    if ta is str and tb is str:
        return a == b
    if a is UNDEF or b is UNDEF:
        return a is b
    if a is None or b is None:
        return a is b
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if isinstance(a, (int, float, Decimal)) and \
            isinstance(b, (int, float, Decimal)):
        try:
            return a == b
        except Exception:  # noqa: BLE001 — NaN-ish Decimal compares
            return False
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    return a is b  # objects: identity


def js_loose_eq(a, b) -> bool:
    ta, tb = type(a), type(b)
    if (ta is int or ta is float) and (tb is int or tb is float):
        return a == b
    if ta is str and tb is str:
        return a == b
    if (a is None or a is UNDEF) and (b is None or b is UNDEF):
        return True
    if (a is None or a is UNDEF) or (b is None or b is UNDEF):
        return False
    na = isinstance(a, (int, float, Decimal)) and not isinstance(a, bool)
    nb = isinstance(b, (int, float, Decimal)) and not isinstance(b, bool)
    if na and nb:
        return js_strict_eq(a, b)
    if isinstance(a, bool):
        return js_loose_eq(1 if a else 0, b)
    if isinstance(b, bool):
        return js_loose_eq(a, 1 if b else 0)
    if na and isinstance(b, str):
        return js_strict_eq(a, js_num(b))
    if isinstance(a, str) and nb:
        return js_strict_eq(js_num(a), b)
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    return a is b


def _js_compare(op: str, a, b) -> bool:
    if isinstance(a, str) and isinstance(b, str):
        pass  # string comparison
    else:
        a, b = _numeric_pair(a, b)
        fa = float(a) if isinstance(a, Decimal) else a
        fb = float(b) if isinstance(b, Decimal) else b
        if (isinstance(fa, float) and math.isnan(fa)) or \
                (isinstance(fb, float) and math.isnan(fb)):
            return False
    if op == "<":
        return a < b
    if op == ">":
        return a > b
    if op == "<=":
        return a <= b
    return a >= b


def js_typeof(v) -> str:
    if v is UNDEF:
        return "undefined"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, Decimal):
        return "bigdecimal"  # quickjs BigDecimal extension parity
    if isinstance(v, (int, float)):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, JSFunction) or callable(v):
        return "function"
    return "object"  # null, arrays, objects, bytes


def _json_default(v):
    if v is UNDEF:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (bytes, bytearray)):
        return list(v)
    raise TypeError(f"not JSON-serializable: {type(v).__name__}")


def _js_json_stringify(v, _replacer=None, indent=None):
    if v is UNDEF or isinstance(v, JSFunction):
        return UNDEF
    kw = {"default": _json_default}
    if indent is not None and indent is not UNDEF:
        kw["indent"] = int(js_num(indent)) if not isinstance(
            indent, str) else indent
        kw["separators"] = (",", ": ")
    else:
        kw["separators"] = (",", ":")
    return _json.dumps(_strip_undef(v), **kw)


def _strip_undef(v):
    if isinstance(v, dict):
        return {k: _strip_undef(x) for k, x in v.items()
                if x is not UNDEF and not isinstance(x, JSFunction)}
    if isinstance(v, list):
        return [None if x is UNDEF else _strip_undef(x) for x in v]
    return v


class Interpreter:
    """One compiled JS module: globals hold its declared functions."""

    MAX_STEPS = 50_000_000  # fuel: runaway loops fail loud

    def __init__(self):
        self.globals = Scope()
        self.exports: dict[str, JSFunction] = {}
        self.steps = 0
        self._install_builtins()

    # ---------------------------------------------------------- builtins
    def _install_builtins(self) -> None:
        g = self.globals

        def _math_fn(f):
            return lambda *a: f(*[float(js_num(x)) if isinstance(
                js_num(x), Decimal) else js_num(x) for x in a])

        def _round(x):
            n = js_num(x)
            return math.floor(n + 0.5)  # JS half-up, not banker's

        g.declare("Math", {
            "floor": _math_fn(math.floor), "ceil": _math_fn(math.ceil),
            "round": _round, "trunc": _math_fn(math.trunc),
            "abs": lambda x: abs(js_num(x)),
            "sqrt": _math_fn(math.sqrt), "cbrt": _math_fn(
                lambda v: math.copysign(abs(v) ** (1 / 3), v)),
            "pow": lambda a, b: js_num(a) ** js_num(b),
            "exp": _math_fn(math.exp), "log": _math_fn(math.log),
            "log2": _math_fn(math.log2), "log10": _math_fn(math.log10),
            "sin": _math_fn(math.sin), "cos": _math_fn(math.cos),
            "tan": _math_fn(math.tan), "atan": _math_fn(math.atan),
            "atan2": _math_fn(math.atan2), "asin": _math_fn(math.asin),
            "acos": _math_fn(math.acos),
            "sign": lambda x: (0 if js_num(x) == 0 else
                               (1 if js_num(x) > 0 else -1)),
            "min": lambda *a: min(js_num(x) for x in a) if a else math.inf,
            "max": lambda *a: max(js_num(x) for x in a) if a else -math.inf,
            "hypot": _math_fn(math.hypot),
            "PI": math.pi, "E": math.e,
            "SQRT2": math.sqrt(2), "LN2": math.log(2),
            "LN10": math.log(10),
        })
        g.declare("JSON", {
            "stringify": _js_json_stringify,
            "parse": lambda s, *_: _json.loads(js_str(s)),
        })
        g.declare("Object", {
            "keys": lambda o: list(o.keys()) if isinstance(o, dict)
            else [js_str(i) for i in range(len(o))],
            "values": lambda o: list(o.values()) if isinstance(o, dict)
            else list(o),
            "entries": lambda o: [[k, v] for k, v in o.items()]
            if isinstance(o, dict)
            else [[js_str(i), v] for i, v in enumerate(o)],
            "assign": lambda t, *srcs: (
                [t.update(s) for s in srcs if isinstance(s, dict)], t)[1],
            "freeze": lambda o: o,
            "fromEntries": lambda pairs: {js_str(k): v for k, v in pairs},
        })
        g.declare("Array", {
            "isArray": lambda v: isinstance(v, list),
            "from": self._array_from,
            "of": lambda *a: list(a),
        })
        g.declare("Number", {
            "isInteger": lambda v: isinstance(v, int) or (
                isinstance(v, float) and v == int(v)),
            "isFinite": lambda v: isinstance(v, (int, float)) and
            not isinstance(v, bool) and math.isfinite(v),
            "isNaN": lambda v: isinstance(v, float) and math.isnan(v),
            "parseFloat": lambda s: self._parse_float(s),
            "parseInt": lambda s, base=10: self._parse_int(s, base),
            "MAX_SAFE_INTEGER": 2 ** 53 - 1,
            "MIN_SAFE_INTEGER": -(2 ** 53 - 1),
            "EPSILON": 2.0 ** -52, "NaN": math.nan,
            "POSITIVE_INFINITY": math.inf,
            "NEGATIVE_INFINITY": -math.inf,
        })
        g.declare("String", {
            "fromCharCode": lambda *a: "".join(
                chr(int(js_num(x))) for x in a),
        })
        g.declare("parseInt", self._parse_int)
        g.declare("parseFloat", self._parse_float)
        g.declare("isNaN", lambda v: (lambda n: isinstance(n, float)
                                      and math.isnan(n))(js_num(v)))
        g.declare("isFinite", lambda v: (lambda n: not isinstance(
            n, float) or math.isfinite(n))(js_num(v)))
        g.declare("NaN", math.nan)
        g.declare("Infinity", math.inf)
        g.declare("console", {"log": lambda *a: UNDEF})
        g.declare("BigDecimal",
                  lambda v="0": Decimal(js_str(v)))

        def _number_ctor(v=0):
            n = js_num(v)
            return float(n) if isinstance(n, Decimal) else n

        g.declare("NumberFn", _number_ctor)  # internal
        # callable constructors double as globals: Number('3'), String(x)
        num_ns = g.get("Number")
        g.declare("Number", _CallableNS(_number_ctor, num_ns))
        g.declare("String", _CallableNS(js_str, g.get("String")))
        g.declare("Boolean", js_truthy)
        g.declare("Error", lambda msg="": {"name": "Error",
                                           "message": js_str(msg)})
        g.declare("TypeError", lambda msg="": {"name": "TypeError",
                                               "message": js_str(msg)})
        g.declare("RangeError", lambda msg="": {"name": "RangeError",
                                                "message": js_str(msg)})

    @staticmethod
    def _parse_int(s, base=10):
        txt = js_str(s).strip()
        b = int(js_num(base)) or 10
        neg = txt.startswith("-")
        if txt[:1] in "+-":
            txt = txt[1:]
        if b == 16 and txt.lower().startswith("0x"):
            txt = txt[2:]
        digits = "0123456789abcdefghijklmnopqrstuvwxyz"[:b]
        out = ""
        for ch in txt.lower():
            if ch not in digits:
                break
            out += ch
        if not out:
            return math.nan
        v = int(out, b)
        return -v if neg else v

    @staticmethod
    def _parse_float(s):
        txt = js_str(s).strip()
        import re as _re
        m = _re.match(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", txt)
        if not m:
            return math.nan
        f = float(m.group(0))
        return int(f) if f == int(f) and "." not in m.group(0) and \
            "e" not in m.group(0).lower() else f

    def _array_from(self, it, fn=None):
        items = list(self._iterate(it))
        if fn is not None and fn is not UNDEF:
            items = [self.call_any(fn, [v, i])
                     for i, v in enumerate(items)]
        return items

    # ------------------------------------------------------------ compile
    # The AST compiles ONCE into a tree of Python closures (fn(scope));
    # execution never re-dispatches on node kinds — the tree-walking
    # per-node tuple dispatch this replaced cost ~4x on loop-heavy
    # bodies. Fuel charges per LOOP ITERATION and per FUNCTION CALL:
    # any non-terminating execution must loop or recurse, so the
    # budget still binds runaway bodies.

    def run_program(self, ast: list) -> None:
        code = [(st, self.compile_stmt(st)) for st in ast]
        _ACTIVE.append(self)
        try:
            # hoist function declarations (the slt's aggregate bodies
            # call finish before its textual definition would bind)
            for st, c in code:
                node = st[1] if st[0] == "export" else st
                if node[0] == "funcdecl":
                    c(self.globals)
            for st, c in code:
                node = st[1] if st[0] == "export" else st
                if node[0] != "funcdecl":
                    c(self.globals)
        finally:
            _ACTIVE.pop()

    # ------------------------------------------------------------- calls
    def call_function(self, fn: JSFunction, args: list):
        self.steps += 1
        if self.steps > self.MAX_STEPS:
            raise JSRuntimeError("JS fuel exhausted (runaway loop?)")
        scope = Scope(fn.scope)
        sv = scope.vars
        i = 0
        for k, p in enumerate(fn.params):
            if p[0] == "rest":
                sv[p[1]] = list(args[i:])
                i = len(args)
            else:
                v = args[i] if i < len(args) else UNDEF
                if v is UNDEF and fn.dflts[k] is not None:
                    v = fn.dflts[k](scope)
                sv[p[1]] = v
                i += 1
        sv["arguments"] = list(args)
        if fn.is_gen:
            yields: list = []
            sv["__yields__"] = yields
            try:
                fn.body(scope)
            except _Return:
                pass
            return yields
        try:
            fn.body(scope)
        except _Return as r:
            return r.value
        return UNDEF

    def call_any(self, fn, args: list):
        if isinstance(fn, JSFunction):
            return self.call_function(fn, args)
        if callable(fn):
            return fn(*args)
        raise JSRuntimeError(f"{js_str(fn)} is not a function")

    def _fuel(self) -> None:
        self.steps += 1
        if self.steps > self.MAX_STEPS:
            raise JSRuntimeError("JS fuel exhausted (runaway loop?)")

    def _mkfunc(self, node):
        """Compile a func/funcdecl node into a JSFunction factory."""
        name, params, is_gen = node[1], node[2], node[4]
        body = self.compile_stmt(node[3])
        dflts = [
            self.compile_expr(p[2]) if p[0] == "p" and p[2] is not None
            else None
            for p in params
        ]

        def mk(scope: Scope) -> JSFunction:
            return JSFunction(name, params, body, scope, is_gen, dflts)

        return mk

    # --------------------------------------------------------- statements
    def compile_stmt(self, node):
        """AST statement → fn(scope) executing it."""
        kind = node[0]
        if kind == "block":
            hoist = [self.compile_stmt(st) for st in node[1]
                     if st[0] == "funcdecl"]
            rest = [self.compile_stmt(st) for st in node[1]
                    if st[0] != "funcdecl"]

            def run_block(scope):
                inner = Scope(scope)
                for c in hoist:
                    c(inner)
                for c in rest:
                    c(inner)
            return run_block
        if kind == "exprstmt":
            c = self.compile_expr(node[1])

            def run_expr(scope):
                c(scope)
            return run_expr
        if kind == "vardecl":
            decls = [(nm, self.compile_expr(init) if init is not None
                      else None) for nm, init in node[2]]

            def run_var(scope):
                for nm, c in decls:
                    v = UNDEF if c is None else c(scope)
                    self._bind_target(nm, v, scope.vars)
            return run_var
        if kind == "if":
            cond = self.compile_expr(node[1])
            then = self.compile_stmt(node[2])
            alt = self.compile_stmt(node[3]) if node[3] is not None else None

            def run_if(scope):
                if js_truthy(cond(scope)):
                    then(scope)
                elif alt is not None:
                    alt(scope)
            return run_if
        if kind == "while":
            cond = self.compile_expr(node[1])
            body = self.compile_stmt(node[2])

            def run_while(scope):
                while js_truthy(cond(scope)):
                    self._fuel()
                    try:
                        body(scope)
                    except _Break:
                        break
                    except _Continue:
                        continue
            return run_while
        if kind == "dowhile":
            cond = self.compile_expr(node[1])
            body = self.compile_stmt(node[2])

            def run_dowhile(scope):
                while True:
                    self._fuel()
                    try:
                        body(scope)
                    except _Break:
                        break
                    except _Continue:
                        pass
                    if not js_truthy(cond(scope)):
                        break
            return run_dowhile
        if kind == "for":
            init = self.compile_stmt(node[1]) if node[1] is not None else None
            cond = self.compile_expr(node[2]) if node[2] is not None else None
            update = (self.compile_expr(node[3])
                      if node[3] is not None else None)
            body = self.compile_stmt(node[4])
            # ES6: `for (let/const ...)` gives each ITERATION a fresh
            # binding (a closure created in iteration k captures k's
            # value, not the final one); `var` shares one binding
            per_iter = (node[1] is not None and node[1][0] == "vardecl"
                        and node[1][1] in ("let", "const"))

            def run_for(scope):
                cur = Scope(scope)
                if init is not None:
                    init(cur)
                while cond is None or js_truthy(cond(cur)):
                    self._fuel()
                    try:
                        body(cur)
                    except _Break:
                        break
                    except _Continue:
                        pass
                    if per_iter:
                        # spec ForBodyEvaluation: the NEXT iteration
                        # gets a copy; the update mutates the copy, so
                        # closures keep this iteration's value
                        nxt = Scope(scope)
                        nxt.vars.update(cur.vars)
                        cur = nxt
                    if update is not None:
                        update(cur)
            return run_for
        if kind in ("forof", "forin"):
            target = node[1]
            seqc = self.compile_expr(node[2])
            body = self.compile_stmt(node[3])
            forin = kind == "forin"

            def run_forof(scope):
                seq = seqc(scope)
                if forin:
                    items = (list(seq.keys()) if isinstance(seq, dict)
                             else [js_str(i) for i in range(len(seq))]
                             if isinstance(seq, (list, str)) else [])
                else:
                    items = self._iterate(seq)
                for v in items:
                    self._fuel()
                    inner = Scope(scope)
                    self._bind_target(target, v, inner.vars)
                    try:
                        body(inner)
                    except _Break:
                        break
                    except _Continue:
                        continue
            return run_forof
        if kind == "funcdecl":
            mk = self._mkfunc(node)
            name = node[1]

            def run_funcdecl(scope):
                scope.vars[name] = mk(scope)
            return run_funcdecl
        if kind == "export":
            mk = self._mkfunc(node[1])
            name = node[1][1]

            def run_export(scope):
                fn = mk(scope)
                scope.vars[name] = fn
                self.exports[name] = fn
            return run_export
        if kind == "return":
            c = self.compile_expr(node[1]) if node[1] is not None else None

            def run_return(scope):
                raise _Return(UNDEF if c is None else c(scope))
            return run_return
        if kind == "break":
            def run_break(scope):
                raise _Break()
            return run_break
        if kind == "continue":
            def run_continue(scope):
                raise _Continue()
            return run_continue
        if kind == "throw":
            c = self.compile_expr(node[1])

            def run_throw(scope):
                raise JSThrow(c(scope))
            return run_throw
        if kind == "switch":
            disc = self.compile_expr(node[1])
            cases = [
                (self.compile_expr(t) if t is not None else None,
                 [self.compile_stmt(st) for st in body])
                for t, body in node[2]
            ]

            def run_switch(scope):
                d = disc(scope)
                inner = Scope(scope)
                matched = False
                try:
                    for test, body in cases:
                        if not matched and test is not None and \
                                js_strict_eq(d, test(inner)):
                            matched = True
                        if matched:
                            for st in body:
                                st(inner)
                    if not matched:  # default fallthrough pass
                        run = False
                        for test, body in cases:
                            if test is None:
                                run = True
                            if run:
                                for st in body:
                                    st(inner)
                except _Break:
                    pass
            return run_switch
        if kind == "try":
            block = self.compile_stmt(node[1])
            cname = node[2]
            cblock = (self.compile_stmt(node[3])
                      if node[3] is not None else None)
            fblock = (self.compile_stmt(node[4])
                      if node[4] is not None else None)

            def run_try(scope):
                try:
                    block(scope)
                except JSThrow as t:
                    if cblock is not None:
                        inner = Scope(scope)
                        if cname:
                            inner.vars[cname] = t.value
                        cblock(inner)
                    elif fblock is None:
                        raise
                finally:
                    if fblock is not None:
                        fblock(scope)
            return run_try
        if kind == "empty":
            def run_empty(scope):
                pass
            return run_empty
        raise JSRuntimeError(f"unknown statement {kind!r}")


    def _bind_target(self, target, v, vars_dict: dict) -> None:
        """Bind a declaration target: plain name or a (one-level)
        destructuring pattern from binding_target()."""
        if isinstance(target, str):
            vars_dict[target] = v
            return
        if target[0] == "apat":
            items = [] if v is None or v is UNDEF else self._iterate(v)
            i = 0
            for slot in target[1]:
                if slot is None:  # hole
                    i += 1
                    continue
                if slot[0] == "rest":
                    vars_dict[slot[1]] = list(items[i:])
                    i = len(items)
                else:
                    vars_dict[slot[1]] = (items[i] if i < len(items)
                                          else UNDEF)
                    i += 1
            return
        # opat: {key: boundname}
        src = v if isinstance(v, dict) else {}
        for key, bound in target[1]:
            vars_dict[bound] = src.get(key, UNDEF)

    def _iterate(self, seq):
        if isinstance(seq, (list, tuple)):
            return list(seq)
        if isinstance(seq, str):
            return list(seq)
        if isinstance(seq, (bytes, bytearray)):
            return list(seq)
        if isinstance(seq, dict):
            # Map-less subset: iterating an object yields its entries
            return [[k, v] for k, v in seq.items()]
        raise JSRuntimeError(f"{js_typeof(seq)} is not iterable")

    # -------------------------------------------------------- expressions
    def _compile_target(self, target):
        """Assignment target → (getter(scope), setter(scope, v))."""
        if target[0] == "ident":
            name = target[1]
            getter = self.compile_expr(target)

            def set_ident(scope, v):
                scope.set(name, v)
            return getter, set_ident
        if target[0] == "member":
            objc = self.compile_expr(target[1])
            nm = target[2]

            def get_member(scope):
                return self.get_member(objc(scope), nm)

            def set_member(scope, v):
                self.set_member(objc(scope), nm, v)
            return get_member, set_member
        if target[0] == "index":
            objc = self.compile_expr(target[1])
            idxc = self.compile_expr(target[2])

            def get_index(scope):
                return self.get_index(objc(scope), idxc(scope))

            def set_index(scope, v):
                self.set_index(objc(scope), idxc(scope), v)
            return get_index, set_index
        raise JSRuntimeError("invalid assignment target")

    def _compile_args(self, arg_nodes):
        """Call/array argument list → fn(scope) -> list (spread-aware;
        the common no-spread case stays a plain list comprehension)."""
        if not any(a[0] == "spread" for a in arg_nodes):
            argcs = [self.compile_expr(a) for a in arg_nodes]

            def plain(scope):
                return [c(scope) for c in argcs]
            return plain
        spec = [(a[0] == "spread",
                 self.compile_expr(a[1] if a[0] == "spread" else a))
                for a in arg_nodes]

        def spread(scope):
            out = []
            for is_spread, c in spec:
                if is_spread:
                    out.extend(self._iterate(c(scope)))
                else:
                    out.append(c(scope))
            return out
        return spread

    def compile_expr(self, node):
        """AST expression → fn(scope) -> value."""
        kind = node[0]
        if kind in ("num", "str", "lit"):
            v = node[1]

            def run_const(scope):
                return v
            return run_const
        if kind == "ident":
            name = node[1]

            def run_ident(scope):
                s = scope
                while s is not None:
                    vs = s.vars
                    if name in vs:
                        return vs[name]
                    s = s.parent
                raise JSRuntimeError(f"{name} is not defined")
            return run_ident
        if kind == "tmpllit":
            parts = [self.compile_expr(p) for p in node[1]]

            def run_tmpl(scope):
                return "".join(js_str(c(scope)) for c in parts)
            return run_tmpl
        if kind == "array":
            mkargs = self._compile_args(node[1])
            return mkargs
        if kind == "object":
            props = []
            for key, val in node[1]:
                if key == "spread":
                    props.append(("spread", self.compile_expr(val)))
                elif isinstance(key, tuple) and key[0] == "expr":
                    props.append(
                        ("expr", self.compile_expr(key[1]),
                         self.compile_expr(val)))
                else:
                    props.append(("k", key, self.compile_expr(val)))

            def run_obj(scope):
                out = {}
                for p in props:
                    if p[0] == "spread":
                        src = p[1](scope)
                        if isinstance(src, dict):
                            out.update(src)
                    elif p[0] == "expr":
                        out[js_str(p[1](scope))] = p[2](scope)
                    else:
                        out[p[1]] = p[2](scope)
                return out
            return run_obj
        if kind == "func":
            mk = self._mkfunc(node)
            return mk
        if kind == "seq":
            codes = [self.compile_expr(e) for e in node[1]]

            def run_seq(scope):
                v = UNDEF
                for c in codes:
                    v = c(scope)
                return v
            return run_seq
        if kind == "cond":
            c = self.compile_expr(node[1])
            a = self.compile_expr(node[2])
            b = self.compile_expr(node[3])

            def run_cond(scope):
                return a(scope) if js_truthy(c(scope)) else b(scope)
            return run_cond
        if kind == "logic":
            left = self.compile_expr(node[2])
            right = self.compile_expr(node[3])
            op = node[1]
            if op == "&&":
                def run_and(scope):
                    v = left(scope)
                    return right(scope) if js_truthy(v) else v
                return run_and
            if op == "||":
                def run_or(scope):
                    v = left(scope)
                    return v if js_truthy(v) else right(scope)
                return run_or

            def run_nullish(scope):
                v = left(scope)
                return v if v is not None and v is not UNDEF \
                    else right(scope)
            return run_nullish
        if kind == "bin":
            op = node[1]
            l = self.compile_expr(node[2])
            r = self.compile_expr(node[3])
            if op == "+":
                def run_add(scope):
                    return js_add(l(scope), r(scope))
                return run_add
            if op == "-":
                def run_sub(scope):
                    x, y = _numeric_pair(l(scope), r(scope))
                    return x - y
                return run_sub
            if op == "*":
                def run_mul(scope):
                    x, y = _numeric_pair(l(scope), r(scope))
                    return x * y
                return run_mul
            if op == "/":
                def run_div(scope):
                    x, y = _numeric_pair(l(scope), r(scope))
                    return _js_div(x, y)
                return run_div
            if op == "%":
                def run_mod(scope):
                    x, y = _numeric_pair(l(scope), r(scope))
                    return _js_mod(x, y)
                return run_mod
            if op == "==":
                def run_eq(scope):
                    return js_loose_eq(l(scope), r(scope))
                return run_eq
            if op == "!=":
                def run_ne(scope):
                    return not js_loose_eq(l(scope), r(scope))
                return run_ne
            if op == "===":
                def run_seq_eq(scope):
                    return js_strict_eq(l(scope), r(scope))
                return run_seq_eq
            if op == "!==":
                def run_sne(scope):
                    return not js_strict_eq(l(scope), r(scope))
                return run_sne
            if op in ("<", ">", "<=", ">="):
                def run_cmp(scope):
                    return _js_compare(op, l(scope), r(scope))
                return run_cmp

            def run_bin(scope):
                return self._binop(op, l(scope), r(scope))
            return run_bin
        if kind == "unary":
            op = node[1]
            if op == "typeof":
                if node[2][0] == "ident":
                    nm = node[2][1]

                    def run_typeof_ident(scope):
                        s = scope
                        while s is not None:
                            if nm in s.vars:
                                return js_typeof(s.vars[nm])
                            s = s.parent
                        return "undefined"
                    return run_typeof_ident
                c = self.compile_expr(node[2])

                def run_typeof(scope):
                    return js_typeof(c(scope))
                return run_typeof
            c = self.compile_expr(node[2])
            if op == "!":
                def run_not(scope):
                    return not js_truthy(c(scope))
                return run_not
            if op == "-":
                def run_neg(scope):
                    return -js_num(c(scope))
                return run_neg
            if op == "+":
                def run_pos(scope):
                    n = js_num(c(scope))
                    return float(n) if isinstance(n, Decimal) else n
                return run_pos
            if op == "~":
                def run_bnot(scope):
                    return ~_to_int32(c(scope))
                return run_bnot

            def run_void(scope):
                c(scope)
                return UNDEF
            return run_void
        if kind == "update":
            _, op, target, prefix = node
            get_t, set_t = self._compile_target(target)
            delta = 1 if op == "++" else -1

            def run_update(scope):
                old = js_num(get_t(scope))
                new = old + delta
                set_t(scope, new)
                return new if prefix else old
            return run_update
        if kind == "assign":
            op, target, rhs = node[1], node[2], node[3]
            get_t, set_t = self._compile_target(target)
            rc = self.compile_expr(rhs)
            if op == "=":
                def run_assign(scope):
                    v = rc(scope)
                    set_t(scope, v)
                    return v
                return run_assign
            base = op[:-1]
            if base in ("&&", "||", "??"):
                def run_logic_assign(scope):
                    cur = get_t(scope)
                    if base == "&&" and not js_truthy(cur):
                        return cur
                    if base == "||" and js_truthy(cur):
                        return cur
                    if base == "??" and cur is not None and cur is not UNDEF:
                        return cur
                    v = rc(scope)
                    set_t(scope, v)
                    return v
                return run_logic_assign
            if base == "+":
                def run_iadd(scope):
                    v = js_add(get_t(scope), rc(scope))
                    set_t(scope, v)
                    return v
                return run_iadd

            def run_compound(scope):
                v = self._binop(base, get_t(scope), rc(scope))
                set_t(scope, v)
                return v
            return run_compound
        if kind in ("member", "optmember"):
            objc = self.compile_expr(node[1])
            nm = node[2]
            opt = kind == "optmember"

            def run_member(scope):
                obj = objc(scope)
                if opt and (obj is None or obj is UNDEF):
                    return UNDEF
                return self.get_member(obj, nm)
            return run_member
        if kind == "index":
            objc = self.compile_expr(node[1])
            idxc = self.compile_expr(node[2])

            def run_index(scope):
                return self.get_index(objc(scope), idxc(scope))
            return run_index
        if kind == "call":
            callee = node[1]
            mkargs = self._compile_args(node[2])
            if callee[0] in ("member", "optmember"):
                objc = self.compile_expr(callee[1])
                nm = callee[2]
                opt = callee[0] == "optmember"

                def run_method(scope):
                    obj = objc(scope)
                    if opt and (obj is None or obj is UNDEF):
                        return UNDEF
                    return self.call_any(
                        self.get_member(obj, nm), mkargs(scope))
                return run_method
            fnc = self.compile_expr(callee)

            def run_call(scope):
                return self.call_any(fnc(scope), mkargs(scope))
            return run_call
        if kind == "yield":
            c = self.compile_expr(node[1]) if node[1] is not None else None

            def run_yield(scope):
                self._yield_into(scope,
                                 UNDEF if c is None else c(scope))
                return UNDEF
            return run_yield
        if kind == "yieldstar":
            c = self.compile_expr(node[1])

            def run_yieldstar(scope):
                for v in self._iterate(c(scope)):
                    self._yield_into(scope, v)
                return UNDEF
            return run_yieldstar
        raise JSRuntimeError(f"unknown expression {kind!r}")

    def _yield_into(self, scope: Scope, v) -> None:
        s = scope
        while s is not None:
            if "__yields__" in s.vars:
                s.vars["__yields__"].append(v)
                return
            s = s.parent
        raise JSRuntimeError("yield outside a generator function")

    def _binop(self, op: str, a, b):
        if op == "+":
            return js_add(a, b)
        if op == "-":
            x, y = _numeric_pair(a, b)
            return x - y
        if op == "*":
            x, y = _numeric_pair(a, b)
            return x * y
        if op == "/":
            x, y = _numeric_pair(a, b)
            return _js_div(x, y)
        if op == "%":
            x, y = _numeric_pair(a, b)
            return _js_mod(x, y)
        if op == "**":
            x, y = _numeric_pair(a, b)
            try:
                return x ** y
            except Exception:  # noqa: BLE001 — Decimal ** float edge
                return float(x) ** float(y)
        if op == "==":
            return js_loose_eq(a, b)
        if op == "!=":
            return not js_loose_eq(a, b)
        if op == "===":
            return js_strict_eq(a, b)
        if op == "!==":
            return not js_strict_eq(a, b)
        if op in ("<", ">", "<=", ">="):
            return _js_compare(op, a, b)
        if op == "&":
            return _to_int32(_to_int32(a) & _to_int32(b))
        if op == "|":
            return _to_int32(_to_int32(a) | _to_int32(b))
        if op == "^":
            return _to_int32(_to_int32(a) ^ _to_int32(b))
        if op == "<<":
            return _to_int32(_to_int32(a) << (_to_uint32(b) & 31))
        if op == ">>":
            return _to_int32(a) >> (_to_uint32(b) & 31)
        if op == ">>>":
            return _to_uint32(a) >> (_to_uint32(b) & 31)
        if op == "in":
            if isinstance(b, dict):
                return js_str(a) in b
            if isinstance(b, list):
                n = js_num(a)
                return isinstance(n, (int, float)) and \
                    0 <= int(n) < len(b)
            return False
        if op == "instanceof":
            return False
        raise JSRuntimeError(f"unknown operator {op!r}")

    # --------------------------------------------------- member protocol
    def get_member(self, obj, name: str):
        if obj is None or obj is UNDEF:
            raise JSRuntimeError(
                f"cannot read properties of {js_str(obj)} "
                f"(reading '{name}')")
        if isinstance(obj, dict):
            if name in obj:
                return obj[name]
            if name == "hasOwnProperty":
                return lambda k: js_str(k) in obj
            if name == "toString":
                return lambda: js_str(obj)
            return UNDEF
        if isinstance(obj, str):
            return self._str_member(obj, name)
        if isinstance(obj, list):
            return self._list_member(obj, name)
        if isinstance(obj, (bytes, bytearray)):
            if name == "length":
                return len(obj)
            if name == "toString":
                return lambda *_: js_str(obj)
            if name == "at":
                return lambda i: (obj[int(js_num(i))]
                                  if -len(obj) <= int(js_num(i)) < len(obj)
                                  else UNDEF)
            if name == "slice":
                return lambda s=0, e=None: bytes(
                    obj[int(js_num(s)):None if e is None or e is UNDEF
                        else int(js_num(e))])
            if name == "indexOf":
                return lambda v: (obj.index(int(js_num(v)))
                                  if int(js_num(v)) in obj else -1)
            if name == "includes":
                return lambda v: int(js_num(v)) in obj
            return UNDEF
        if isinstance(obj, (bool, int, float, Decimal)):
            return self._num_member(obj, name)
        if isinstance(obj, JSFunction):
            if name == "name":
                return obj.name
            if name == "length":
                return len(obj.params)
            if name == "call":
                return lambda _this=None, *a: self.call_function(
                    obj, list(a))
            if name == "apply":
                return lambda _this=None, a=None: self.call_function(
                    obj, list(a or []))
            return UNDEF
        return UNDEF

    def set_member(self, obj, name: str, v) -> None:
        if isinstance(obj, dict):
            obj[name] = v
            return
        if isinstance(obj, list) and name == "length":
            n = int(js_num(v))
            del obj[n:]
            while len(obj) < n:
                obj.append(UNDEF)
            return
        raise JSRuntimeError(
            f"cannot set property '{name}' on {js_typeof(obj)}")

    def get_index(self, obj, idx):
        if isinstance(obj, dict):
            return obj.get(js_str(idx), UNDEF)
        if isinstance(obj, (list, str, bytes, bytearray)):
            if isinstance(idx, str) and not idx.lstrip("-").isdigit():
                return self.get_member(obj, idx)
            i = int(js_num(idx))
            if 0 <= i < len(obj):
                return obj[i]
            return UNDEF
        return self.get_member(obj, js_str(idx))

    def set_index(self, obj, idx, v) -> None:
        if isinstance(obj, dict):
            obj[js_str(idx)] = v
            return
        if isinstance(obj, list):
            i = int(js_num(idx))
            if i < 0:
                raise JSRuntimeError("negative array index")
            while len(obj) <= i:
                obj.append(UNDEF)
            obj[i] = v
            return
        if isinstance(obj, bytearray):
            obj[int(js_num(idx))] = int(js_num(v)) & 0xFF
            return
        raise JSRuntimeError(f"cannot index-assign {js_typeof(obj)}")

    # ----------------------------------------------------- str methods
    def _str_member(self, s: str, name: str):
        if name == "length":
            return len(s)
        table = {
            "split": lambda sep=UNDEF, lim=UNDEF: (
                [s] if sep is UNDEF else
                (list(s) if sep == "" else s.split(js_str(sep)))[
                    :None if lim is UNDEF else int(js_num(lim))]),
            "toUpperCase": lambda: s.upper(),
            "toLowerCase": lambda: s.lower(),
            "trim": lambda: s.strip(),
            "trimStart": lambda: s.lstrip(),
            "trimEnd": lambda: s.rstrip(),
            "indexOf": lambda sub, start=0: s.find(
                js_str(sub), int(js_num(start))),
            "lastIndexOf": lambda sub: s.rfind(js_str(sub)),
            "includes": lambda sub: js_str(sub) in s,
            "startsWith": lambda sub, start=0: s.startswith(
                js_str(sub), int(js_num(start))),
            "endsWith": lambda sub: s.endswith(js_str(sub)),
            "slice": lambda a=0, b=None: s[self._slice_idx(a, len(s)):
                                           None if b is None or b is UNDEF
                                           else self._slice_idx(b, len(s))],
            "substring": lambda a=0, b=None: self._substring(s, a, b),
            "charAt": lambda i=0: s[int(js_num(i))]
            if 0 <= int(js_num(i)) < len(s) else "",
            "charCodeAt": lambda i=0: ord(s[int(js_num(i))])
            if 0 <= int(js_num(i)) < len(s) else math.nan,
            "codePointAt": lambda i=0: ord(s[int(js_num(i))])
            if 0 <= int(js_num(i)) < len(s) else UNDEF,
            "at": lambda i=0: s[int(js_num(i))]
            if -len(s) <= int(js_num(i)) < len(s) else UNDEF,
            "repeat": lambda n: s * int(js_num(n)),
            "padStart": lambda n, fill=" ": self._pad(s, n, fill, True),
            "padEnd": lambda n, fill=" ": self._pad(s, n, fill, False),
            "replace": lambda old, new: s.replace(
                js_str(old), js_str(new), 1),
            "replaceAll": lambda old, new: s.replace(
                js_str(old), js_str(new)),
            "concat": lambda *a: s + "".join(js_str(x) for x in a),
            "toString": lambda: s,
            "valueOf": lambda: s,
            "localeCompare": lambda o: (s > js_str(o)) - (s < js_str(o)),
        }
        if name in table:
            return table[name]
        if name.lstrip("-").isdigit():
            i = int(name)
            return s[i] if 0 <= i < len(s) else UNDEF
        return UNDEF

    @staticmethod
    def _slice_idx(v, n: int) -> int:
        i = int(js_num(v))
        return max(0, n + i) if i < 0 else min(i, n)

    @staticmethod
    def _substring(s: str, a, b):
        x = max(0, min(len(s), int(js_num(a))))
        y = len(s) if b is None or b is UNDEF else max(
            0, min(len(s), int(js_num(b))))
        if x > y:
            x, y = y, x
        return s[x:y]

    @staticmethod
    def _pad(s: str, n, fill, start: bool) -> str:
        width = int(js_num(n))
        f = js_str(fill) or " "
        if len(s) >= width:
            return s
        pad = (f * width)[: width - len(s)]
        return pad + s if start else s + pad

    # ---------------------------------------------------- list methods
    def _list_member(self, xs: list, name: str):
        interp = self

        def _cb(fn):
            return lambda *a: interp.call_any(fn, list(a))

        table = {
            "length": len(xs),
            "push": lambda *a: (xs.extend(a), len(xs))[1],
            "pop": lambda: xs.pop() if xs else UNDEF,
            "shift": lambda: xs.pop(0) if xs else UNDEF,
            "unshift": lambda *a: (xs.__setitem__(
                slice(0, 0), list(a)), len(xs))[1],
            "slice": lambda a=0, b=None: xs[
                self._slice_idx(a, len(xs)):
                None if b is None or b is UNDEF
                else self._slice_idx(b, len(xs))],
            "splice": lambda start=0, dc=None, *items:
                self._splice(xs, start, dc, items),
            "indexOf": lambda v: next(
                (i for i, x in enumerate(xs) if js_strict_eq(x, v)), -1),
            "lastIndexOf": lambda v: next(
                (i for i in range(len(xs) - 1, -1, -1)
                 if js_strict_eq(xs[i], v)), -1),
            "includes": lambda v: any(js_strict_eq(x, v) for x in xs),
            "join": lambda sep=",": js_str(sep).join(
                "" if x is None or x is UNDEF else js_str(x)
                for x in xs),
            "map": lambda fn: [interp.call_any(fn, [v, i, xs])
                               for i, v in enumerate(xs)],
            "filter": lambda fn: [v for i, v in enumerate(xs)
                                  if js_truthy(
                                      interp.call_any(fn, [v, i, xs]))],
            "forEach": lambda fn: ([interp.call_any(fn, [v, i, xs])
                                    for i, v in enumerate(xs)], UNDEF)[1],
            "reduce": lambda fn, *init: self._reduce(xs, fn, init),
            "some": lambda fn: any(js_truthy(
                interp.call_any(fn, [v, i, xs]))
                for i, v in enumerate(xs)),
            "every": lambda fn: all(js_truthy(
                interp.call_any(fn, [v, i, xs]))
                for i, v in enumerate(xs)),
            "find": lambda fn: next(
                (v for i, v in enumerate(xs)
                 if js_truthy(interp.call_any(fn, [v, i, xs]))), UNDEF),
            "findIndex": lambda fn: next(
                (i for i, v in enumerate(xs)
                 if js_truthy(interp.call_any(fn, [v, i, xs]))), -1),
            "concat": lambda *a: xs + [
                y for x in a
                for y in (x if isinstance(x, list) else [x])],
            "reverse": lambda: (xs.reverse(), xs)[1],
            "sort": lambda fn=None: self._sort(xs, fn),
            "flat": lambda depth=1: self._flat(xs, int(js_num(depth))),
            "flatMap": lambda fn: self._flat(
                [interp.call_any(fn, [v, i, xs])
                 for i, v in enumerate(xs)], 1),
            "fill": lambda v, s=0, e=None: self._fill(xs, v, s, e),
            "at": lambda i: xs[int(js_num(i))]
            if -len(xs) <= int(js_num(i)) < len(xs) else UNDEF,
            "keys": lambda: list(range(len(xs))),
            "values": lambda: list(xs),
            "entries": lambda: [[i, v] for i, v in enumerate(xs)],
            "toString": lambda: js_str(xs),
        }
        if name in table:
            return table[name]
        if name.lstrip("-").isdigit():
            i = int(name)
            return xs[i] if 0 <= i < len(xs) else UNDEF
        return UNDEF

    @staticmethod
    def _splice(xs: list, start, dc, items):
        n = len(xs)
        s = Interpreter._slice_idx(start, n)
        cnt = n - s if dc is None or dc is UNDEF else max(
            0, int(js_num(dc)))
        removed = xs[s:s + cnt]
        xs[s:s + cnt] = list(items)
        return removed

    def _reduce(self, xs: list, fn, init: tuple):
        it = list(enumerate(xs))
        if init:
            acc = init[0]
        else:
            if not it:
                raise JSThrow({"name": "TypeError", "message":
                               "Reduce of empty array with no "
                               "initial value"})
            (_, acc), it = it[0], it[1:]
        for i, v in it:
            acc = self.call_any(fn, [acc, v, i, xs])
        return acc

    def _sort(self, xs: list, fn):
        import functools
        if fn is None or fn is UNDEF:
            xs.sort(key=js_str)
        else:
            def cmp(a, b):
                r = js_num(self.call_any(fn, [a, b]))
                if isinstance(r, Decimal):
                    r = float(r)
                if isinstance(r, float) and math.isnan(r):
                    return 0
                return -1 if r < 0 else (1 if r > 0 else 0)
            xs.sort(key=functools.cmp_to_key(cmp))
        return xs

    def _flat(self, xs: list, depth: int) -> list:
        out = []
        for x in xs:
            if isinstance(x, list) and depth > 0:
                out.extend(self._flat(x, depth - 1))
            else:
                out.append(x)
        return out

    @staticmethod
    def _fill(xs: list, v, s, e):
        n = len(xs)
        a = Interpreter._slice_idx(s, n)
        b = n if e is None or e is UNDEF else Interpreter._slice_idx(e, n)
        for i in range(a, b):
            xs[i] = v
        return xs

    # --------------------------------------------------- number methods
    @staticmethod
    def _num_member(v, name: str):
        if name == "toString":
            def _ts(base=10):
                b = int(js_num(base))
                if b == 10 or isinstance(v, (float, Decimal)) \
                        and not float(v).is_integer():
                    return js_str(v)
                digits = "0123456789abcdefghijklmnopqrstuvwxyz"
                n = int(v)
                if n == 0:
                    return "0"
                neg, n = n < 0, abs(n)
                out = ""
                while n:
                    out = digits[n % b] + out
                    n //= b
                return ("-" if neg else "") + out
            return _ts
        if name == "toFixed":
            return lambda d=0: f"{float(v):.{int(js_num(d))}f}"
        if name == "toPrecision":
            return lambda p=6: f"{float(v):.{int(js_num(p))}g}"
        if name == "valueOf":
            return lambda: v
        return UNDEF


class _CallableNS(dict):
    """Number / String double as callable converters AND namespaces."""

    def __init__(self, fn, ns: dict):
        super().__init__(ns)
        self._fn = fn

    def __call__(self, *a):
        return self._fn(*a) if a else self._fn()


# ------------------------------------------------------------ public API

#: worker-side compile cache: an executor evaluating a JS UDF over
#: thousands of Arrow batches parses the module once, not per batch.
#: Keyed by the body text; tiny (UDF bodies), unbounded on purpose —
#: a worker only ever sees the session's registered functions.
_COMPILE_CACHE: dict[str, "Interpreter"] = {}


def compile_js(body: str) -> Interpreter:
    """Parse + run a UDF module body; returns the interpreter whose
    ``exports`` hold the ``export function`` entry points (every
    top-level function declaration is also reachable by name via
    ``get_function`` — the aggregate form and legacy bodies need it).
    Cached per body text: scalar evaluation re-enters per Arrow batch
    and must not re-parse. (Module state is shared across calls as a
    consequence — same posture as quickjs's per-node runtime.)"""
    cached = _COMPILE_CACHE.get(body)
    if cached is not None:
        return cached
    try:
        interp = Interpreter()
        ast = _Parser(tokenize(body)).parse_program()
        interp.run_program(ast)
    except RecursionError:
        # pathological nesting must fail as a clean JS error, not a
        # Python stack crash through the UDF machinery
        raise JSSyntaxError("expression nesting too deep") from None
    _COMPILE_CACHE[body] = interp
    return interp


def wrap_legacy(body: str, name: str, params: list[str],
                is_table: bool) -> str:
    """The reference's legacy form: the CREATE body IS the function
    body (js_udf.slt `int_42_legacy`, `series_legacy`). Wrap it."""
    star = "*" if is_table else ""
    return (f"export function{star} {name}({', '.join(params)}) "
            f"{{\n{body}\n}}")


def get_function(interp: Interpreter, name: str) -> JSFunction:
    fn = interp.exports.get(name)
    if fn is None:
        try:
            fn = interp.globals.get(name)
        except JSRuntimeError:
            fn = None
    if not isinstance(fn, JSFunction):
        raise ValueError(
            f"LANGUAGE javascript body must export a function named "
            f"{name!r} (exports: {sorted(interp.exports)})")
    return fn


def call_js(interp: Interpreter, fn: JSFunction, args: list):
    """Invoke with the interpreter activated (builtin callbacks and
    nested JSFunction calls re-enter through _ACTIVE)."""
    # fuel is per top-level invocation: a cached interpreter serving
    # millions of rows must not exhaust its budget cumulatively
    interp.steps = 0
    _ACTIVE.append(interp)
    try:
        return interp.call_function(fn, args)
    except (_Break, _Continue) as e:  # stray control flow = user bug
        raise JSRuntimeError(f"illegal {type(e).__name__.lower()} "
                             "outside a loop") from e
    except RecursionError:
        # unbounded JS recursion surfaces as a clean JS error (the
        # quickjs analog of InternalError: too much recursion)
        raise JSRuntimeError(
            "maximum call stack size exceeded") from None
    finally:
        _ACTIVE.pop()


# ----------------------------------------------------- SQL type bridging

def sql_to_js(v, pg_type: str):
    """SQL value → JS value per quickjs.rs's arrow bridge (js_udf.slt
    js_typeof: decimal → BigDecimal, bytea → Uint8Array-ish bytes,
    jsonb → parsed object)."""
    if v is None:
        return None
    t = pg_type.lower().split("(")[0].strip()
    if t in ("jsonb", "json"):
        return _json.loads(v) if isinstance(v, str) else v
    if t in ("decimal", "numeric"):
        return v if isinstance(v, Decimal) else Decimal(str(v))
    if t == "bytea":
        return bytes(v)
    if t in ("real", "float4", "double", "float8", "float",
             "double precision"):
        return float(v)
    if t in ("smallint", "int2", "int", "int4", "integer", "bigint",
             "int8"):
        return int(v)
    if t in ("date", "timestamp", "timestamptz", "time"):
        return str(v)
    if isinstance(v, dict):  # struct arrives as a dict via Arrow
        return dict(v)
    if isinstance(v, tuple):  # struct (Spark Row) → plain object
        try:
            return {k: sql_to_js(x, "jsonb" if isinstance(x, (dict, list))
                                 else "auto")
                    for k, x in v.asDict().items()}
        except AttributeError:
            return list(v)
    return v


def js_to_sql(v, pg_type: str):
    """JS value → SQL value for the declared RETURNS type."""
    if v is None or v is UNDEF:
        return None
    t = pg_type.lower().split("(")[0].strip()
    if t in ("jsonb", "json"):
        return _js_json_stringify(v)
    if t in ("decimal", "numeric"):
        if isinstance(v, Decimal):
            return v
        return Decimal(js_str(v))
    if t in ("smallint", "int2", "int", "int4", "integer", "bigint",
             "int8"):
        n = js_num(v)
        if isinstance(n, float):
            if math.isnan(n) or math.isinf(n):
                return None
            return int(n)
        return int(n)
    if t in ("real", "float4", "double", "float8", "float",
             "double precision"):
        return float(js_num(v))
    if t in ("varchar", "text", "character varying", "string"):
        return js_str(v)
    if t in ("boolean", "bool"):
        return js_truthy(v)
    if t == "bytea":
        if isinstance(v, (bytes, bytearray)):
            return bytes(v)
        if isinstance(v, list):
            return bytes(int(js_num(x)) & 0xFF for x in v)
        if isinstance(v, str):
            return v.encode()
    return v
