"""XXH64 (seed 42, UTF-8 input) as pure DuckDB SQL — the oracle twin of
Spark's built-in ``xxhash64``.

Why this exists: the fast CDC-chunking variant (``cdc_chunks_fast``)
draws chunk boundaries from ``pmod(xxhash64(word), divisor)`` because
``xxhash64`` is the cheapest content hash Spark evaluates (native,
whole-stage-codegen'd, no string allocation — unlike the md5-hex ``_h60``
path it replaces).  DuckDB 1.0 ships no xxhash, so for the DuckDB oracle
to replay the boundary rule bit-for-bit we implement XXH64 itself in SQL.

The algorithm is public (Yann Collet's xxHash, BSD-2, widely specified);
this is a from-scratch SQL transcription of the spec, validated
bit-identical to Spark's ``xxhash64`` across length classes 0..100 bytes
and multi-byte UTF-8 (tests/test_pipeline.py).  Implementation notes:

- DuckDB integer arithmetic ERRORS on overflow rather than wrapping, so
  every wrapping 64-bit op routes through HUGEINT (128-bit) and reduces
  ``% 2^64``.  A 64x64 multiply would need 128 unsigned bits (HUGEINT is
  signed-127), so ``xmul`` splits operands into 32-bit halves — the
  classic long-multiplication identity keeps every intermediate under
  2^65.
- ``<<`` raises on overflow too, so ``xrotl`` is arithmetic:
  ``(x % 2^(64-r)) * 2^r + (x >> (64-r))`` (``>>`` on UBIGINT is a
  logical shift and always safe).
- The hash must be staged through chained CTE columns, not one nested
  expression: the avalanche steps reference their input twice
  (``x ^ (x >> s)``), so a single expression tree would double at every
  stage (~2^5 blow-up); a column reference costs nothing.
- UTF-8 bytes come from codepoint arithmetic over ``ord(substr(w,i,1))``
  (DuckDB has no blob indexing in 1.0); surrogate-free encoding up to
  4 bytes, validated on CJK + emoji.

Spark-side cost of the twin: zero — Spark uses its native ``xxhash64``.
This module is oracle-only machinery and never runs on the cluster.
"""

P1 = 11400714785074694791
P2 = 14029467366897019727
P3 = 1609587929392839161
P4 = 9650029242287828579
P5 = 2870177450012600261
M64 = 1 << 64
SEED = 42  # Spark's fixed default seed for xxhash64
A1 = (SEED + P1 + P2) % M64
A2 = (SEED + P2) % M64
A3 = SEED
A4 = (SEED - P1) % M64
H_SMALL = (SEED + P5) % M64


def _xadd(a: str, b: str) -> str:
    return f"CAST((({a})::HUGEINT + ({b})::HUGEINT) % {M64}::HUGEINT AS UBIGINT)"


def _let(v: str, body) -> str:
    """Single-evaluation binding: DuckDB has no common-subexpression
    elimination, so an operand referenced k times by an operator costs k
    evaluations of its whole subtree — nested 64-bit multiplies would go
    exponential (measured: 4 nested merge rounds = ~64x one round).  A
    one-element ``list_transform`` evaluates ``v`` exactly once and hands
    the lambda a cheap variable, i.e. a SQL ``let``."""
    return f"list_transform([({v})], _v -> {body('_v')})[1]"


def _xmul(a: str, b: int) -> str:
    """Wrapping 64-bit multiply by a CONSTANT — every multiply in XXH64
    has one constant operand (a prime or the lane-prime product), so the
    constant's 32-bit halves fold at generation time and the variable
    operand is let-bound."""
    bl, bh = b % (1 << 32), b >> 32

    def body(v: str) -> str:
        lo = f"({v} % 4294967296)::HUGEINT * {bl}"
        mid = (
            f"((({v} >> 32)::HUGEINT * {bl}"
            f" + ({v} % 4294967296)::HUGEINT * {bh}) % 4294967296)"
        )
        return (
            f"CAST((({lo}) + ({mid}) * 4294967296) % {M64}::HUGEINT"
            f" AS UBIGINT)"
        )

    return _let(a, body)


def _xxor(a: str, b: str) -> str:
    return f"xor(({a}), ({b}))"


def _xrotl(x: str, r: int) -> str:
    p_nr, p_r, s = 1 << (64 - r), 1 << r, 64 - r
    return _let(
        x,
        lambda v: (
            f"CAST((({v} % {p_nr}::UBIGINT)::HUGEINT * {p_r}"
            f" + ({v} >> {s})::HUGEINT) AS UBIGINT)"
        ),
    )


def _xround(acc: str, lane: str) -> str:
    return _xmul(_xrotl(_xadd(acc, _xmul(lane, P2)), 31), P1)


def _xmerge(h: str, acc: str) -> str:
    return _xadd(
        _xmul(_xxor(h, _xround("0::UBIGINT", acc)), P1),
        f"{P4}::UBIGINT",
    )


def _u64le(b: str, i: str) -> str:
    terms = " + ".join(
        f"({b})[({i}) + {j}]::HUGEINT * {1 << (8 * j)}" for j in range(8)
    )
    return f"CAST(({terms}) AS UBIGINT)"


def _u32le(b: str, i: str) -> str:
    terms = " + ".join(
        f"({b})[({i}) + {j}]::HUGEINT * {1 << (8 * j)}" for j in range(4)
    )
    return f"CAST(({terms}) AS UBIGINT)"


def _utf8_bytes(col: str) -> str:
    o = f"ord(substr({col}, i, 1))"
    return (
        f"flatten(list_transform(generate_series(1, length({col})), i -> CASE"
        f" WHEN {o} < 128 THEN [{o}]"
        f" WHEN {o} < 2048 THEN [192 + {o} // 64, 128 + {o} % 64]"
        f" WHEN {o} < 65536 THEN [224 + {o} // 4096, 128 + ({o} // 64) % 64,"
        f" 128 + {o} % 64]"
        f" ELSE [240 + {o} // 262144, 128 + ({o} // 4096) % 64,"
        f" 128 + ({o} // 64) % 64, 128 + {o} % 64] END))"
    )


def xxh64_long_sql(expr: str) -> str:
    """``xxhash64(bigint)`` as one DuckDB expression — Spark hashes a
    LongType as its 8 little-endian bytes (the value itself as u64,
    two's-complement for negatives), which collapses XXH64 to the n=8
    fast path: no stripes, one 8-byte word, no 4-byte/byte tails.  Used
    by operators that draw deterministic priorities from id columns
    (domain caps, hash-sampling) so the oracle replays the same
    pseudo-random order.  Every intermediate is let-bound (see module
    docstring: DuckDB re-evaluates duplicated subtrees)."""
    u = (
        f"CAST(((({expr})::HUGEINT % {M64}::HUGEINT + {M64}::HUGEINT)"
        f" % {M64}::HUGEINT) AS UBIGINT)"
    )
    h0 = (H_SMALL + 8) % M64
    k1 = _xmul(_xrotl(_xmul(u, P2), 31), P1)
    h1 = _xadd(
        _xmul(_xrotl(_xxor(f"{h0}::UBIGINT", k1), 27), P1),
        f"{P4}::UBIGINT",
    )
    av1 = _let(h1, lambda v: _xmul(_xxor(v, f"({v} >> 33)"), P2))
    av2 = _let(av1, lambda v: _xmul(_xxor(v, f"({v} >> 29)"), P3))
    return _let(
        av2,
        lambda v: (
            f"CAST(CASE WHEN xor({v}, ({v} >> 32))"
            f" >= 9223372036854775808::UBIGINT"
            f" THEN xor({v}, ({v} >> 32))::HUGEINT - {M64}::HUGEINT"
            f" ELSE xor({v}, ({v} >> 32))::HUGEINT END AS BIGINT)"
        ),
    )


def xxh64_ctes(src: str, col: str, p: str, carry: list[str]) -> str:
    """Return a CTE-chain fragment (to splice after ``WITH``) computing
    ``XXH64(utf8({col}), 42)`` over every row of CTE/table ``src`` as a
    signed BIGINT column ``{p}h`` in the final CTE ``{p}sf``, threading
    the ``carry`` columns through.  The value equals Spark's
    ``xxhash64({col})`` exactly.
    """
    cols = ", ".join(carry)
    stripe_fold = (
        f"list_reduce(list_concat("
        f" [[{A1},{A2},{A3},{A4}]::UBIGINT[]],"
        f" list_transform(generate_series(0, ({p}n // 32) - 1), k ->"
        f"  [{_u64le(p + 'b', 'k*32 + 1')}, {_u64le(p + 'b', 'k*32 + 9')},"
        f"   {_u64le(p + 'b', 'k*32 + 17')}, {_u64le(p + 'b', 'k*32 + 25')}])),"
        f" (a, w) -> [{_xround('a[1]', 'w[1]')}, {_xround('a[2]', 'w[2]')},"
        f"            {_xround('a[3]', 'w[3]')}, {_xround('a[4]', 'w[4]')}])"
    )
    h_big = _xmerge(_xmerge(_xmerge(_xmerge(
        _xadd(
            _xadd(_xrotl(f"{p}acc[1]", 1), _xrotl(f"{p}acc[2]", 7)),
            _xadd(_xrotl(f"{p}acc[3]", 12), _xrotl(f"{p}acc[4]", 18)),
        ),
        f"{p}acc[1]"), f"{p}acc[2]"), f"{p}acc[3]"), f"{p}acc[4]")
    h2 = _xadd(
        f"CASE WHEN {p}n >= 32 THEN {h_big}"
        f" ELSE {H_SMALL}::UBIGINT END",
        f"{p}n::UBIGINT",
    )
    w8_fold = (
        f"list_reduce(list_concat([{p}h2],"
        f" list_transform("
        f"  generate_series(0, ({p}n - ({p}n // 32) * 32) // 8 - 1),"
        f"  j -> {_u64le(p + 'b', '(' + p + 'n // 32) * 32 + j*8 + 1')})),"
        f" (a, w) -> "
        + _xadd(
            _xmul(_xrotl(_xxor("a", _xround("0::UBIGINT", "w")), 27),
                  P1),
            f"{P4}::UBIGINT",
        )
        + ")"
    )
    h4 = (
        f"CASE WHEN {p}n % 8 >= 4 THEN "
        + _xadd(
            _xmul(
                _xrotl(
                    _xxor(
                        f"{p}h3",
                        _xmul(_u32le(p + "b", f"({p}n // 8) * 8 + 1"),
                              P1),
                    ),
                    23,
                ),
                P2,
            ),
            P3,
        )
        + f" ELSE {p}h3 END"
    )
    b_fold = (
        f"list_reduce(list_concat([{p}h4],"
        f" list_transform(generate_series(({p}n // 4) * 4 + 1, {p}n),"
        f"  i -> {p}b[i]::UBIGINT)),"
        f" (a, bb) -> "
        + _xmul(
            _xrotl(_xxor("a", _xmul("bb", P5)), 11),
            P1,
        )
        + ")"
    )
    av1 = _xmul(_xxor(f"{p}h5", f"({p}h5 >> 33)"), P2)
    av2 = _xmul(_xxor(f"{p}h6", f"({p}h6 >> 29)"), P3)
    final = f"xor({p}h7, ({p}h7 >> 32))"
    return f"""
{p}s0 AS (SELECT {cols}, {col} AS {p}w,
          {_utf8_bytes(col)} AS {p}b FROM {src}),
{p}s1 AS (SELECT *, len({p}b) AS {p}n, {stripe_fold} AS {p}acc FROM {p}s0),
{p}s2 AS (SELECT *, {h2} AS {p}h2 FROM {p}s1),
{p}s3 AS (SELECT *, {w8_fold} AS {p}h3 FROM {p}s2),
{p}s4 AS (SELECT *, {h4} AS {p}h4 FROM {p}s3),
{p}s5 AS (SELECT *, {b_fold} AS {p}h5 FROM {p}s4),
{p}s6 AS (SELECT *, {av1} AS {p}h6 FROM {p}s5),
{p}s7 AS (SELECT *, {av2} AS {p}h7 FROM {p}s6),
{p}sf AS (SELECT {cols}, {p}w,
          CAST(CASE WHEN {final} >= 9223372036854775808::UBIGINT
               THEN {final}::HUGEINT - {M64}::HUGEINT
               ELSE {final}::HUGEINT END AS BIGINT) AS {p}h
          FROM {p}s7)"""
