"""OSQL → Spark SQL expression shim.

The reference embeds OSQL expressions in config values — ``if`` conditions
(``OAbstractETLComponent.java:75-96``), ``field.expression``
(``OFieldTransformer.java:52,94``), ``let.expression`` (``OLetBlock.java:46``)
and ``={expr}`` interpolation (``OAbstractETLComponent.java:123-152``).

We do NOT re-implement OSQL. The engine's expression dialect is Spark SQL
(``F.expr``); this module is a thin textual compat layer for the handful of
OSQL spellings observed in the shipped reference configs (SURVEY §2.7) so
those configs can run verbatim:

    field.trim()            -> trim(field)
    field.toLowerCase()     -> lower(field)
    field.toUpperCase()     -> upper(field)
    sysdate()               -> current_timestamp()
    $a.append($b)           -> concat(a, b)
    x.substring(a, b)       -> substring(x, a+1, b-a)   (OSQL is 0-based)
    x.indexOf(y)            -> instr(x, y) - 1          (OSQL is 0-based)
    x.length()              -> length(x)
    $var                    -> literal from pipeline context variables

Anything not matched passes through untouched and must already be valid
Spark SQL.
"""

from __future__ import annotations

import re
from typing import Any

# method-call rewrites: receiver.method(args) -> function(receiver, args)
_SIMPLE_METHODS = {
    "trim": "trim",
    "toLowerCase": "lower",
    "toUpperCase": "upper",
    "length": "length",
}

_METHOD_RE = re.compile(
    # receiver: string literal | function call (1-level nesting) |
    # identifier/path | parenthesized
    r"('[^']*'|[A-Za-z_]\w*\((?:[^()]|\([^()]*\))*\)|\$?[A-Za-z_][\w.]*|\([^()]*\))\.(\w+)\("
)


def _find_call(text: str, start: int) -> tuple[str, int] | None:
    """Return (args_str, end_index_after_close_paren) for a call whose '('
    is at ``start``. Handles nested parens and single-quoted strings."""
    depth = 0
    i = start
    in_str = False
    while i < len(text):
        c = text[i]
        if in_str:
            if c == "'":
                in_str = False
        elif c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return text[start + 1 : i], i + 1
        i += 1
    return None


def translate_osql(expr: str, variables: dict[str, Any] | None = None) -> str:
    """Best-effort translation of the observed OSQL surface to Spark SQL."""
    out = expr

    # sysdate() -> current_timestamp()
    out = re.sub(r"\bsysdate\(\)", "current_timestamp()", out)

    # $var -> literal BEFORE method rewrites, so context variables become
    # values (OSQL $vars are context lookups, never column refs); unknown
    # $names fall through to bare identifiers below
    if variables:
        for name in sorted(variables, key=len, reverse=True):
            out = out.replace(f"${name}", _sql_literal(variables[name]))

    # iterate method-call rewrites until fixpoint (handles chaining)
    changed = True
    while changed:
        changed = False
        m = _METHOD_RE.search(out)
        while m:
            recv, meth = m.group(1), m.group(2)
            call = _find_call(out, m.end() - 1)
            if call is None:
                break
            args, end = call
            recv_sql = recv.lstrip("$")
            repl = None
            if meth in _SIMPLE_METHODS and not args.strip():
                repl = f"{_SIMPLE_METHODS[meth]}({recv_sql})"
            elif meth == "append":
                repl = f"concat({recv_sql}, {_strip_vars(args)})"
            elif meth == "substring":
                parts = [p.strip() for p in args.split(",")]
                if len(parts) == 2:
                    a, b = parts
                    repl = f"substring({recv_sql}, ({a}) + 1, ({b}) - ({a}))"
                elif len(parts) == 1:
                    repl = f"substring({recv_sql}, ({parts[0]}) + 1)"
            elif meth == "indexOf":
                repl = f"(instr({recv_sql}, {_strip_vars(args)}) - 1)"
            elif meth == "charAt":
                repl = f"substring({recv_sql}, ({args.strip()}) + 1, 1)"
            elif meth == "replace":
                repl = f"replace({recv_sql}, {_strip_vars(args)})"
            if repl is not None:
                out = out[: m.start()] + repl + out[end:]
                changed = True
                m = _METHOD_RE.search(out)
            else:
                m = _METHOD_RE.search(out, m.end())

    # residual $var references -> literal values from context
    if variables:
        for name in sorted(variables, key=len, reverse=True):
            out = out.replace(f"${name}", _sql_literal(variables[name]))
    return out


def _strip_vars(s: str) -> str:
    return re.sub(r"\$(\w+)", r"\1", s)


def _sql_literal(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


_INTERP_RE = re.compile(r"\$\{(\w+)\}")
_EVAL_RE = re.compile(r"^=\{(.*)\}$", re.DOTALL)


def render_value(value: Any, variables: dict[str, Any], spark=None) -> Any:
    """Resolve config-value variable syntax (``OAbstractETLComponent.java:123-152``):

    - ``"$name"`` (entire value)  -> context variable value (any type)
    - ``"...${name}..."``         -> string interpolation
    - ``"={expr}"``               -> OSQL expression evaluated once, driver-side
    - dict/list                   -> rendered recursively
    """
    if isinstance(value, dict):
        return {k: render_value(v, variables, spark) for k, v in value.items()}
    if isinstance(value, list):
        return [render_value(v, variables, spark) for v in value]
    if not isinstance(value, str):
        return value
    m = _EVAL_RE.match(value.strip())
    if m and spark is not None:
        sql = translate_osql(m.group(1), variables)
        return spark.sql(f"SELECT {sql} AS v").collect()[0][0]
    if value.startswith("$") and re.fullmatch(r"\$\w+", value):
        name = value[1:]
        if name in variables:
            return variables[name]
        return value
    return _INTERP_RE.sub(
        lambda mm: str(variables.get(mm.group(1), mm.group(0))), value
    )
