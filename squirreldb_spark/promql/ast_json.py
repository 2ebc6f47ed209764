"""``/api/v1/parse_query`` AST translation (prometheus v3.4+).

Mirrors upstream web/api/v1/translate_ast.go (mounted by the reference
through v1.NewAPI, reference api/api.go:163): every node becomes the
JSON shape PromLens/codemirror-promql consume. Function signatures come
from the upstream promql/parser function table (argTypes, variadic,
returnType), value types spelled "vector" / "matrix" / "scalar" /
"string".
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
from squirreldb_spark.promql.prettier import _number

V, M, S, STR = "vector", "matrix", "scalar", "string"

#: (argTypes, variadic, returnType) per upstream promql/parser/functions.go
_SIG: dict[str, tuple[list[str], int, str]] = {}


def _reg(names, arg_types, variadic=0, ret=V):
    for n in names:
        _SIG[n] = (list(arg_types), variadic, ret)


_reg(["abs", "absent", "ceil", "exp", "floor", "ln", "log2", "log10",
      "sqrt", "sgn", "acos", "acosh", "asin", "asinh", "atan", "atanh",
      "cos", "cosh", "sin", "sinh", "tan", "tanh", "deg", "rad",
      "sort", "sort_desc", "timestamp", "histogram_count",
      "histogram_sum"], [V])
_reg(["scalar"], [V], ret=S)
_reg(["absent_over_time", "changes", "delta", "deriv", "idelta",
      "increase", "irate", "rate", "resets"], [M])
_reg([f"{f}_over_time" for f in
      ("avg", "min", "max", "sum", "count", "last", "present", "stddev",
       "stdvar", "mad", "ts_of_max", "ts_of_min", "ts_of_last")], [M])
_reg(["quantile_over_time"], [S, M])
_reg(["histogram_quantile"], [S, V])
_reg(["histogram_fraction"], [S, S, V])
_reg(["clamp"], [V, S, S])
_reg(["clamp_max", "clamp_min"], [V, S])
_reg(["round"], [V, S], variadic=1)
_reg(["label_replace"], [V, STR, STR, STR, STR])
_reg(["label_join"], [V, STR, STR, STR], variadic=-1)
_reg(["sort_by_label", "sort_by_label_desc"], [V, STR], variadic=-1)
_reg(["predict_linear"], [M, S])
_reg(["holt_winters", "double_exponential_smoothing"], [M, S, S])
_reg(["time", "pi"], [], ret=S)
_reg(["vector"], [S])
_reg(["year", "month", "day_of_month", "day_of_week", "day_of_year",
      "days_in_month", "hour", "minute"], [V], variadic=1)

#: vector-matching cardinality names, upstream VectorMatchCardinality
_CARD = {None: "one-to-one", "left": "many-to-one", "right": "one-to-many"}

_SET_OPS = {"and", "or", "unless"}


def _is_scalar(node) -> bool:
    """Static scalar-typedness, mirroring the upstream type checker far
    enough to decide VectorMatching nil-ness."""
    if isinstance(node, NumberLiteral) or isinstance(node, (int, float)):
        return True
    if isinstance(node, FunctionCall):
        sig = _SIG.get(node.name)
        return bool(sig) and sig[2] == S
    if isinstance(node, Unary):
        return _is_scalar(node.expr)
    if isinstance(node, BinaryOp):
        return _is_scalar(node.lhs) and _is_scalar(node.rhs)
    return False


def _matchers(node: VectorSelector) -> list[dict]:
    out = []
    if node.name:
        out.append({"name": "__name__", "type": "=", "value": node.name})
    out.extend(
        {"name": m.name, "type": m.op, "value": m.value}
        for m in node.matchers
    )
    return out


def _ts_fields(at_ms) -> dict:
    if at_ms in ("start", "end"):
        return {"timestamp": None, "startOrEnd": at_ms}
    return {"timestamp": at_ms, "startOrEnd": None}


def translate_ast(node):
    """Upstream translateAST: node -> JSON-able dict (None for nil)."""
    if node is None:
        return None
    if isinstance(node, str):
        return {"type": "stringLiteral", "val": node}
    if isinstance(node, (int, float)) and not isinstance(node, bool):
        return {"type": "numberLiteral", "val": _number(float(node))}
    if isinstance(node, NumberLiteral):
        return {"type": "numberLiteral", "val": _number(node.value)}
    if isinstance(node, VectorSelector):
        return {
            "type": "vectorSelector",
            "name": node.name or "",
            "offset": node.offset_ms,
            "matchers": _matchers(node),
            **_ts_fields(node.at_ms),
        }
    if isinstance(node, MatrixSelector):
        vs = node.inner
        return {
            "type": "matrixSelector",
            "name": vs.name or "",
            "range": node.range_ms,
            "offset": vs.offset_ms,
            "matchers": _matchers(vs),
            **_ts_fields(vs.at_ms),
        }
    if isinstance(node, Subquery):
        return {
            "type": "subquery",
            "expr": translate_ast(node.inner),
            "range": node.range_ms,
            "step": node.step_ms or 0,
            "offset": node.offset_ms,
            "timestamp": None,
            "startOrEnd": None,
        }
    if isinstance(node, FunctionCall):
        sig = _SIG.get(node.name)
        if sig is None:
            raise ValueError(f'unknown function "{node.name}"')
        arg_types, variadic, ret = sig
        return {
            "type": "call",
            "func": {
                "name": node.name,
                "argTypes": arg_types,
                "variadic": variadic,
                "returnType": ret,
            },
            "args": [translate_ast(a) for a in node.args],
        }
    if isinstance(node, Aggregation):
        return {
            "type": "aggregation",
            "op": node.op,
            "expr": translate_ast(node.expr),
            "param": translate_ast(node.param),
            "grouping": list(node.grouping),
            "without": node.without,
        }
    if isinstance(node, BinaryOp):
        # upstream: every vector-vector binop carries a VectorMatching
        # (default one-to-one / many-to-many for set ops); it is nil
        # only when a scalar operand is involved
        matching = None
        if not (_is_scalar(node.lhs) or _is_scalar(node.rhs)):
            labels = list(node.on or node.ignoring or ())
            card = _CARD[node.group_side]
            if node.op in _SET_OPS and not node.group_side:
                card = "many-to-many"
            matching = {
                "card": card,
                "labels": labels,
                "on": node.on is not None,
                "include": list(node.group_labels),
            }
        return {
            "type": "binaryExpr",
            "op": node.op,
            "lhs": translate_ast(node.lhs),
            "rhs": translate_ast(node.rhs),
            "matching": matching,
            "bool": node.bool_mode,
        }
    if isinstance(node, Unary):
        return {
            "type": "unaryExpr",
            "op": node.op,
            "expr": translate_ast(node.expr),
        }
    raise TypeError(f"unsupported node type {type(node).__name__}")


def parse_query_json(query: str):
    from squirreldb_spark.promql.parser import parse

    return translate_ast(parse(query))
