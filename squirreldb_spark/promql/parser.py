"""Hand-written PromQL lexer + recursive-descent parser.

Covers the operator surface of SURVEY §2B: selectors with label matchers
and offset, range selectors with duration literals, aggregation operators
with ``by``/``without`` (prefix or postfix), the full binary-operator
precedence ladder with ``bool`` / ``on`` / ``ignoring`` /
``group_left`` / ``group_right``, function calls, and number literals.

Precedence (loosest to tightest, per the PromQL spec):
  or  <  and, unless  <  == != <= < >= >  <  + -  <  * / %  <  ^ (right)
  <  unary +/-  <  atoms
"""

from __future__ import annotations

import re

from squirreldb_spark.promql.ast import (
    Aggregation,
    BinaryOp,
    FunctionCall,
    Matcher,
    MatrixSelector,
    NumberLiteral,
    Subquery,
    Unary,
    VectorSelector,
)

#: compound durations are valid PromQL (``1h30m``, ``1m30s``) — one or
#: more (count, unit) groups, summed
_DURATION_RE = re.compile(r"^(?:\d+(?:ms|s|m|h|d|w|y))+$")
_DURATION_PART_RE = re.compile(r"(\d+)(ms|s|m|h|d|w|y)")
_DURATION_MS = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000,
                "d": 86_400_000, "w": 604_800_000, "y": 31_536_000_000}

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<duration>(?:\d+(?:ms|s|m|h|d|w|y))+)
  | (?P<number>0x[0-9a-fA-F]+|(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<string>"(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*')
  | (?P<op>=~|!~|==|!=|<=|>=|<|>|=|\+|-|\*|/|%|\^|\(|\)|\{|\}|\[|\]|,|:|@)
  | (?P<ident>[a-zA-Z_:][a-zA-Z0-9_:]*)
    """,
    re.VERBOSE,
)

AGG_OPS = {"sum", "min", "max", "avg", "count", "stddev", "stdvar",
           "topk", "bottomk", "quantile", "count_values", "group",
           "limitk", "limit_ratio"}

_CMP_OPS = {"==", "!=", "<=", ">=", "<", ">"}


class ParseError(ValueError):
    pass


def duration_ms(text: str) -> int:
    if not _DURATION_RE.match(text):
        raise ParseError(f"invalid duration {text!r}")
    return sum(
        int(n) * _DURATION_MS[u] for n, u in _DURATION_PART_RE.findall(text)
    )


#: Go escape sequences legal inside PromQL string literals
_STRING_ESCAPES = {
    "\\": "\\", '"': '"', "'": "'", "a": "\a", "b": "\b", "f": "\f",
    "n": "\n", "r": "\r", "t": "\t", "v": "\v",
}


#: exact digit counts per escape kind, as Go strconv.Unquote requires:
#: \xHH (2 hex), \uHHHH (4), \UHHHHHHHH (8), \OOO (exactly 3 octal)
_HEX_ESCAPE_RE = {
    "x": re.compile(r"[0-9a-fA-F]{2}"),
    "u": re.compile(r"[0-9a-fA-F]{4}"),
    "U": re.compile(r"[0-9a-fA-F]{8}"),
}
_OCTAL_ESCAPE_RE = re.compile(r"[0-7]{3}")


def unquote(tok: str) -> str:
    """Strip quotes AND process Go escape sequences (upstream strutil):
    ``"1\\\\.5"`` denotes the four characters ``1\\.5`` — without this,
    regex matchers containing backslashes silently match nothing.

    Strictness matches Go ``strconv.Unquote`` (what the upstream lexer
    calls): exact digit counts per escape kind, octal values capped at
    ``\\377``, ``\\U`` capped at U+10FFFF excluding surrogates — every
    violation is a ``ParseError``, never a bare ``ValueError``."""
    body = tok[1:-1]
    if "\\" not in body:
        return body
    out: list[str] = []
    i = 0
    while i < len(body):
        c = body[i]
        if c != "\\":
            out.append(c)
            i += 1
            continue
        i += 1
        if i >= len(body):
            raise ParseError("trailing backslash in string literal")
        e = body[i]
        if e in _STRING_ESCAPES:
            out.append(_STRING_ESCAPES[e])
            i += 1
        elif e in _HEX_ESCAPE_RE:
            m = _HEX_ESCAPE_RE[e].match(body, i + 1)
            if not m:
                raise ParseError(
                    f"invalid \\{e} escape in string literal: expected "
                    f"{len(_HEX_ESCAPE_RE[e].pattern) - 6} hex digits"
                )
            cp = int(m.group(), 16)
            if e == "U" and (cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF):
                raise ParseError(
                    f"invalid \\U escape in string literal: U+{cp:X} is "
                    "not a valid Unicode code point"
                )
            out.append(chr(cp))
            i = m.end()
        elif "0" <= e <= "7":
            m = _OCTAL_ESCAPE_RE.match(body, i)
            if not m:
                raise ParseError(
                    "invalid octal escape in string literal: expected "
                    "exactly 3 octal digits"
                )
            cp = int(m.group(), 8)
            if cp > 0o377:
                raise ParseError(
                    f"invalid octal escape \\{m.group()} in string "
                    "literal: value exceeds \\377"
                )
            out.append(chr(cp))
            i = m.end()
        else:
            raise ParseError(f"invalid escape \\{e} in string literal")
    return "".join(out)


def _lex(query: str) -> list[tuple[str, str]]:
    tokens, pos = [], 0
    while pos < len(query):
        m = _TOKEN_RE.match(query, pos)
        if not m:
            raise ParseError(f"unexpected character {query[pos]!r} at {pos}")
        pos = m.end()
        kind = m.lastgroup
        if kind != "ws":
            tokens.append((kind, m.group()))
    tokens.append(("eof", ""))
    return tokens


class Parser:
    def __init__(self, query: str):
        self.toks = _lex(query)
        self.i = 0

    # ------------------------------------------------------------- helpers

    def peek(self, k: int = 0) -> tuple[str, str]:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> tuple[str, str]:
        tok = self.toks[min(self.i, len(self.toks) - 1)]  # clamp at eof
        self.i += 1
        return tok

    def expect(self, text: str) -> None:
        kind, val = self.next()
        if val != text:
            raise ParseError(f"expected {text!r}, got {val!r}")

    def accept(self, text: str) -> bool:
        if self.peek()[1] == text:
            self.i += 1
            return True
        return False

    # ------------------------------------------------------------ grammar

    def parse(self):
        expr = self.expr_or()
        if self.peek()[0] != "eof":
            raise ParseError(f"trailing input at {self.peek()[1]!r}")
        return expr

    def expr_or(self):
        lhs = self.expr_and()
        while self.peek()[1] == "or" and self.peek()[0] == "ident":
            self.next()
            mods = self._matching_modifiers()
            lhs = BinaryOp("or", lhs, self.expr_and(), **mods)
        return lhs

    def expr_and(self):
        lhs = self.expr_cmp()
        while self.peek()[0] == "ident" and self.peek()[1] in ("and", "unless"):
            op = self.next()[1]
            mods = self._matching_modifiers()
            lhs = BinaryOp(op, lhs, self.expr_cmp(), **mods)
        return lhs

    def expr_cmp(self):
        lhs = self.expr_add()
        while self.peek()[1] in _CMP_OPS:
            op = self.next()[1]
            bool_mode = False
            if self.peek() == ("ident", "bool"):
                self.next()
                bool_mode = True
            mods = self._matching_modifiers()
            lhs = BinaryOp(op, lhs, self.expr_add(), bool_mode=bool_mode, **mods)
        return lhs

    def expr_add(self):
        lhs = self.expr_mul()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            mods = self._matching_modifiers()
            lhs = BinaryOp(op, lhs, self.expr_mul(), **mods)
        return lhs

    def expr_mul(self):
        lhs = self.expr_unary()
        while self.peek()[1] in ("*", "/", "%") or self.peek() == ("ident", "atan2"):
            op = self.next()[1]
            mods = self._matching_modifiers()
            lhs = BinaryOp(op, lhs, self.expr_unary(), **mods)
        return lhs

    def expr_unary(self):
        # unary binds looser than ^ (PromQL: -1^2 == -(1^2)) but tighter
        # than * / %
        if self.peek()[1] in ("-", "+"):
            op = self.next()[1]
            return Unary(op, self.expr_unary())
        return self.expr_pow()

    def expr_pow(self):
        lhs = self.expr_postfix()
        if self.peek()[1] == "^":
            self.next()
            mods = self._matching_modifiers()
            # right-assoc; rhs may carry a unary sign (2^-3)
            return BinaryOp("^", lhs, self.expr_unary(), **mods)
        return lhs

    def expr_postfix(self):
        expr = self.atom()
        while True:
            if self.peek()[1] == "[":
                self.next()
                kind, val = self.next()
                if kind != "duration":
                    raise ParseError(f"expected duration in range selector, got {val!r}")
                if self.accept(":"):
                    # subquery: expr[range:step]; empty step = eval default
                    if self.peek()[1] == "]":
                        step_ms = None
                    else:
                        kind2, val2 = self.next()
                        if kind2 != "duration":
                            raise ParseError("expected step duration in subquery")
                        step_ms = duration_ms(val2)
                    self.expect("]")
                    expr = Subquery(expr, duration_ms(val), step_ms)
                    continue
                self.expect("]")
                if not isinstance(expr, VectorSelector):
                    raise ParseError("range selector requires a vector selector")
                expr = MatrixSelector(expr, duration_ms(val))
            elif self.peek() == ("ident", "offset"):
                self.next()
                neg = self.accept("-")
                kind, val = self.next()
                if kind != "duration":
                    raise ParseError("expected duration after offset")
                off = -duration_ms(val) if neg else duration_ms(val)
                if isinstance(expr, Subquery):
                    expr = Subquery(expr.inner, expr.range_ms, expr.step_ms,
                                    off, expr.at_ms)
                elif isinstance(expr, MatrixSelector):
                    expr = MatrixSelector(
                        VectorSelector(expr.inner.name, expr.inner.matchers, off,
                                       expr.inner.at_ms),
                        expr.range_ms,
                    )
                elif isinstance(expr, VectorSelector):
                    expr = VectorSelector(expr.name, expr.matchers, off, expr.at_ms)
                else:
                    raise ParseError("offset requires a selector")
            elif self.peek()[1] == "@":
                self.next()
                # upstream grammar: AT signed_or_unsigned_number
                # (promql/parser/generated_parser.y) — "@ -60" is
                # legal, the anchor may precede the epoch
                neg = self.accept("-")
                signed = neg or (not neg and self.accept("+"))
                kind, val = self.next()
                if not signed and kind == "ident" and val in ("start", "end"):
                    # @ start() / @ end(): the query range's boundaries
                    self.expect("(")
                    self.expect(")")
                    at: object = val
                elif kind == "number":
                    at = int(float(val) * 1000) * (-1 if neg else 1)
                else:
                    raise ParseError("expected unix-seconds, start() or end() after @")
                if isinstance(expr, MatrixSelector):
                    expr = MatrixSelector(
                        VectorSelector(expr.inner.name, expr.inner.matchers,
                                       expr.inner.offset_ms, at),
                        expr.range_ms,
                    )
                elif isinstance(expr, VectorSelector):
                    expr = VectorSelector(expr.name, expr.matchers, expr.offset_ms, at)
                elif isinstance(expr, Subquery):
                    # upstream allows @ on subqueries: the whole inner
                    # window is pinned to the fixed evaluation time
                    expr = Subquery(expr.inner, expr.range_ms, expr.step_ms,
                                    expr.offset_ms, at)
                else:
                    raise ParseError("@ requires a selector or subquery")
            else:
                return expr

    def _matching_modifiers(self) -> dict:
        mods: dict = {}
        if self.peek()[0] == "ident" and self.peek()[1] in ("on", "ignoring"):
            which = self.next()[1]
            labels = self._label_list()
            mods["on" if which == "on" else "ignoring"] = labels
            if self.peek()[0] == "ident" and self.peek()[1] in ("group_left", "group_right"):
                side = self.next()[1]
                mods["group_side"] = "left" if side == "group_left" else "right"
                if self.peek()[1] == "(":
                    mods["group_labels"] = self._label_list()
        return mods

    def _label_list(self) -> tuple[str, ...]:
        self.expect("(")
        labels = []
        while not self.accept(")"):
            kind, val = self.next()
            if kind != "ident":
                raise ParseError(f"expected label name, got {val!r}")
            labels.append(val)
            if not self.accept(","):
                self.expect(")")
                break
        return tuple(labels)

    def atom(self):
        kind, val = self.peek()
        if val == "(":
            self.next()
            inner = self.expr_or()
            self.expect(")")
            return inner
        if kind == "number":
            self.next()
            return NumberLiteral(float(int(val, 16)) if val.startswith("0x") else float(val))
        if val == "{":
            return self._selector(None)
        if kind == "ident":
            if val.lower() == "inf":
                self.next()
                return NumberLiteral(float("inf"))
            if val.lower() == "nan":
                self.next()
                return NumberLiteral(float("nan"))
            if val in AGG_OPS:
                return self._aggregation()
            if self.peek(1)[1] == "(":
                return self._function_call()
            self.next()
            return self._selector(val)
        raise ParseError(f"unexpected token {val!r}")

    def _function_call(self):
        name = self.next()[1]
        self.expect("(")
        args = []
        while not self.accept(")"):
            if self.peek()[0] == "string":
                args.append(unquote(self.next()[1]))
            else:
                args.append(self.expr_or())
            if not self.accept(","):
                self.expect(")")
                break
        return FunctionCall(name, tuple(args))

    def _aggregation(self):
        op = self.next()[1]
        grouping: tuple[str, ...] = ()
        without = False
        # prefix form: sum by (a, b) (expr)
        if self.peek()[0] == "ident" and self.peek()[1] in ("by", "without"):
            without = self.next()[1] == "without"
            grouping = self._label_list()
        self.expect("(")
        param = None
        if op in ("topk", "bottomk", "quantile", "count_values",
                  "limitk", "limit_ratio"):
            if self.peek()[0] == "string":
                param = unquote(self.next()[1])
            else:
                p = self.expr_or()
                if isinstance(p, Unary) and isinstance(p.expr, NumberLiteral):
                    # limit_ratio(-0.3, v): negative ratio = complement
                    p = NumberLiteral(
                        -p.expr.value if p.op == "-" else p.expr.value
                    )
                if not isinstance(p, NumberLiteral):
                    raise ParseError(f"{op} parameter must be a literal")
                param = p.value
            self.expect(",")
        expr = self.expr_or()
        self.expect(")")
        # postfix form: sum (expr) by (a, b)
        if self.peek()[0] == "ident" and self.peek()[1] in ("by", "without"):
            without = self.next()[1] == "without"
            grouping = self._label_list()
        return Aggregation(op, expr, grouping, without, param)

    def _selector(self, name: str | None):
        matchers = []
        if self.peek()[1] == "{":
            self.next()
            while not self.accept("}"):
                _, lname = self.next()
                _, op = self.next()
                if op not in ("=", "!=", "=~", "!~"):
                    raise ParseError(f"bad matcher op {op!r}")
                kind, sval = self.next()
                if kind != "string":
                    raise ParseError("matcher value must be a string")
                matchers.append(Matcher(lname, op, unquote(sval)))
                if not self.accept(","):
                    self.expect("}")
                    break
        if name is None and not matchers:
            raise ParseError("vector selector needs a name or at least one matcher")
        return VectorSelector(name, tuple(matchers))


def parse(query: str):
    """Parse a PromQL expression into the AST."""
    return Parser(query).parse()
