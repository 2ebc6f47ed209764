"""PromQL formatter: the ``/api/v1/format_query`` surface.

Mirrors the upstream prettier contract (promql/parser/prettier.go at the
pinned prometheus v0.307.x, mounted by the reference via web/api/v1 —
reference api/api.go:163): a node whose single-line form exceeds
``MAX_CHARACTERS_PER_LINE`` splits across lines with two-space indents;
leaf nodes and short subtrees print on one line.

One documented divergence: the upstream AST keeps explicit ``ParenExpr``
nodes, so Prometheus re-emits every paren the user wrote. Our parser
(promql/parser.py) lowers parens away, so this formatter re-inserts the
*minimal* parens required by operator precedence/associativity — the
output is always semantically identical to the input, but redundant
user parentheses are normalized away.
"""

from __future__ import annotations

from squirreldb_spark.promql.ast import (
    Aggregation,
    BinaryOp,
    FunctionCall,
    MatrixSelector,
    NumberLiteral,
    Subquery,
    Unary,
    VectorSelector,
)

MAX_CHARACTERS_PER_LINE = 100

#: binary-operator precedence (loosest binds first), per the PromQL spec
_PREC = {
    "or": 1,
    "and": 2, "unless": 2,
    "==": 3, "!=": 3, "<=": 3, ">=": 3, "<": 3, ">": 3,
    "+": 4, "-": 4,
    "*": 5, "/": 5, "%": 5, "atan2": 5,
    "^": 6,
}


def _quote(s: str) -> str:
    """Go strconv.Quote-style double-quoted string."""
    out = ['"']
    for ch in s:
        if ch == '"':
            out.append('\\"')
        elif ch == "\\":
            out.append("\\\\")
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\t":
            out.append("\\t")
        elif ch == "\r":
            out.append("\\r")
        elif ord(ch) < 0x20:
            out.append(f"\\x{ord(ch):02x}")
        else:
            out.append(ch)
    out.append('"')
    return "".join(out)


def _duration(ms: int) -> str:
    """model.Duration.String(): greedy y/w/d/h/m/s/ms decomposition."""
    if ms == 0:
        return "0s"
    sign = "-" if ms < 0 else ""
    ms = abs(ms)
    parts = []
    for unit, span in (("y", 31_536_000_000), ("w", 604_800_000),
                       ("d", 86_400_000), ("h", 3_600_000),
                       ("m", 60_000), ("s", 1000), ("ms", 1)):
        n, ms = divmod(ms, span)
        if n:
            parts.append(f"{n}{unit}")
    return sign + "".join(parts)


def _number(v: float) -> str:
    if v != v:  # NaN
        return "NaN"
    if v == float("inf"):
        return "+Inf"
    if v == float("-inf"):
        return "-Inf"
    if float(v).is_integer() and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


def _at(at_ms) -> str:
    if at_ms is None:
        return ""
    if at_ms == "start":
        return " @ start()"
    if at_ms == "end":
        return " @ end()"
    return f" @ {at_ms / 1000.0:.3f}"


def _offset(offset_ms: int) -> str:
    return f" offset {_duration(offset_ms)}" if offset_ms else ""


def _selector_core(node: VectorSelector) -> str:
    matchers = ", ".join(
        f"{m.name}{m.op}{_quote(m.value)}" for m in node.matchers
        if not (m.name == "__name__" and m.op == "=" and m.value == node.name)
    )
    name = node.name or ""
    return f"{name}{{{matchers}}}" if matchers or not name else name


def _needs_parens(child, parent_prec: int, right: bool) -> bool:
    """Minimal-paren rule: a binary child needs parens when it binds
    looser than its parent, or at equal precedence on the side the
    associativity does not cover ('^' is right-associative, every other
    operator is left-associative). A unary child needs parens only on
    the LHS of '^' — unary binds looser than the power operator
    (upstream: ``-1 ^ 2 == -(1 ^ 2)``) but tighter than everything
    else."""
    if isinstance(child, Unary):
        return parent_prec == _PREC["^"] and not right
    if not isinstance(child, BinaryOp):
        return False
    p = _PREC[child.op]
    if p < parent_prec:
        return True
    if p == parent_prec:
        power = parent_prec == _PREC["^"]
        return (right and not power) or (not right and power)
    return False


def _subquery_inner(node) -> tuple[str, bool]:
    """One-line inner of ``expr[range:step]`` with the parens PromQL
    requires around a non-atomic inner (our AST lowered them away)."""
    wrap = isinstance(node, (BinaryOp, Unary))
    s = to_promql(node)
    return (f"({s})" if wrap else s), wrap


def _child(node, parent_prec: int, right: bool = False) -> str:
    s = to_promql(node)
    return f"({s})" if _needs_parens(node, parent_prec, right) else s


def to_promql(node) -> str:
    """Canonical single-line serialization (upstream ``Expr.String()``)."""
    if isinstance(node, str):
        return _quote(node)
    if isinstance(node, bool):
        raise TypeError("bool is not a PromQL literal")
    if isinstance(node, (int, float)):
        # aggregation params (topk k, quantile q) are stored raw
        return _number(float(node))
    if isinstance(node, NumberLiteral):
        return _number(node.value)
    if isinstance(node, VectorSelector):
        return _selector_core(node) + _at(node.at_ms) + _offset(node.offset_ms)
    if isinstance(node, MatrixSelector):
        inner = node.inner
        return (
            _selector_core(inner)
            + f"[{_duration(node.range_ms)}]"
            + _at(inner.at_ms)
            + _offset(inner.offset_ms)
        )
    if isinstance(node, Subquery):
        step = _duration(node.step_ms) if node.step_ms else ""
        inner, _ = _subquery_inner(node.inner)
        return (
            inner
            + f"[{_duration(node.range_ms)}:{step}]"
            + _offset(node.offset_ms)
        )
    if isinstance(node, FunctionCall):
        return f"{node.name}({', '.join(to_promql(a) for a in node.args)})"
    if isinstance(node, Aggregation):
        head = _agg_head(node)
        param = f"{to_promql(node.param)}, " if node.param is not None else ""
        return f"{head}({param}{to_promql(node.expr)})"
    if isinstance(node, BinaryOp):
        p = _PREC[node.op]
        mods = _binop_mods(node)
        return (
            f"{_child(node.lhs, p)} {node.op}{mods} {_child(node.rhs, p, right=True)}"
        )
    if isinstance(node, Unary):
        inner = to_promql(node.expr)
        if isinstance(node.expr, BinaryOp):
            inner = f"({inner})"
        return f"{node.op}{inner}"
    raise TypeError(f"unknown AST node: {type(node).__name__}")


def _agg_head(node: Aggregation) -> str:
    """``sum``, ``sum by (a, b) ``, ``sum without (a) `` — trailing
    space exactly as upstream getAggOpStr."""
    s = node.op
    if node.without:
        s += f" without ({', '.join(node.grouping)}) "
    elif node.grouping:
        s += f" by ({', '.join(node.grouping)}) "
    return s


def _binop_mods(node: BinaryOp) -> str:
    mods = " bool" if node.bool_mode else ""
    if node.on is not None:
        mods += f" on ({', '.join(node.on)})"
    elif node.ignoring is not None:
        mods += f" ignoring ({', '.join(node.ignoring)})"
    if node.group_side:
        mods += f" group_{node.group_side} ({', '.join(node.group_labels)})"
    return mods


def _indent(level: int) -> str:
    return "  " * level


def _needs_split(node) -> bool:
    return len(to_promql(node)) > MAX_CHARACTERS_PER_LINE


def pretty(node, level: int = 0) -> str:
    """Upstream ``Node.Pretty(level)``: split nodes whose one-line form
    exceeds the line budget; leaves always print inline."""
    if isinstance(node, str) or not _needs_split(node):
        return _indent(level) + to_promql(node)
    if isinstance(node, Aggregation):
        s = _indent(level) + _agg_head(node) + "(\n"
        if node.param is not None:
            s += pretty(node.param, level + 1) + ",\n"
        s += pretty(node.expr, level + 1) + "\n" + _indent(level) + ")"
        return s
    if isinstance(node, BinaryOp):
        p = _PREC[node.op]
        lhs, rhs = node.lhs, node.rhs
        lhs_s = (
            _wrap_parens(lhs, level + 1)
            if _needs_parens(lhs, p, right=False)
            else pretty(lhs, level + 1)
        )
        rhs_s = (
            _wrap_parens(rhs, level + 1)
            if _needs_parens(rhs, p, right=True)
            else pretty(rhs, level + 1)
        )
        return (
            f"{lhs_s}\n{_indent(level)}{node.op}{_binop_mods(node)}\n{rhs_s}"
        )
    if isinstance(node, FunctionCall):
        s = _indent(level) + node.name + "(\n"
        for i, a in enumerate(node.args):
            s += pretty(a, level + 1)
            if i < len(node.args) - 1:
                s += ","
            s += "\n"
        return s + _indent(level) + ")"
    if isinstance(node, Subquery):
        step = _duration(node.step_ms) if node.step_ms else ""
        _, wrap = _subquery_inner(node.inner)
        inner = (
            _wrap_parens(node.inner, level) if wrap
            else pretty(node.inner, level)
        )
        return (
            inner
            + f"[{_duration(node.range_ms)}:{step}]"
            + _offset(node.offset_ms)
        )
    if isinstance(node, Unary):
        inner = (
            _wrap_parens(node.expr, level + 1)
            if isinstance(node.expr, BinaryOp)
            else pretty(node.expr, level + 1)
        )
        return _indent(level) + node.op + "\n" + inner
    # selectors/literals never exceed the budget in practice, but long
    # matcher sets can: print inline regardless (upstream leaf behavior)
    return _indent(level) + to_promql(node)


def _wrap_parens(node, level: int) -> str:
    return (
        _indent(level) + "(\n" + pretty(node, level + 1) + "\n"
        + _indent(level) + ")"
    )


def format_query(query: str) -> str:
    """Parse + prettify, the ``/api/v1/format_query`` contract."""
    from squirreldb_spark.promql.parser import parse

    return pretty(parse(query), 0)
