"""The DuckDB XXH64 transcription must equal Spark's native xxhash64
bit-for-bit — it is the oracle half of cdc_chunks_fast's boundary rule,
so any divergence silently moves chunk boundaries in the oracle only.

Covers every XXH64 code path: the empty input, each tail class
(<4, 4..7, 8..31 bytes), the 32-byte stripe threshold and multiples,
long inputs with all three tail loops live, and multi-byte UTF-8
(2-, 3-, and 4-byte sequences — the 4-byte case exercises the
surrogate-pair handling of ``ord`` on both engines).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from squirreldb_spark.pipeline.duck_xxh64 import xxh64_ctes

EDGE_STRINGS = [
    "",                       # n=0: seed+P5 path only
    "a", "ab", "abc",         # byte-tail only
    "abcd", "abcde", "abcdefg",   # 4-byte word + byte tail
    "abcdefgh", "abcdefghi",      # 8-byte word boundary
    "a" * 7, "b" * 8, "c" * 12, "d" * 16, "e" * 20, "f" * 24, "g" * 28,
    "x" * 31, "x" * 32, "x" * 33,  # stripe threshold
    "z" * 64, "w" * 100,           # multi-stripe + full tail mix
    "hello world this is a test",
    "héllo", "héllo wörld",        # 2-byte UTF-8
    "日本語テキスト",               # 3-byte UTF-8
    "emoji 🎉 test",               # 4-byte UTF-8 (astral plane)
    "mixed héllo " + "q" * 50,
]


def test_duck_xxh64_matches_spark_bit_for_bit(spark):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"($${w}$$)" for w in EDGE_STRINGS)
        + ") v(s)"
    )
    duck = dict(
        con.execute(
            "WITH" + xxh64_ctes("t", "s", "x_", ["s"])
            + " SELECT s, x_h FROM x_sf"
        ).fetchall()
    )
    sp = {
        r.s: r.h
        for r in spark.createDataFrame([(w,) for w in EDGE_STRINGS], ["s"])
        .select("s", F.xxhash64("s").alias("h"))
        .collect()
    }
    mismatches = {w: (duck[w], sp[w]) for w in EDGE_STRINGS if duck[w] != sp[w]}
    assert not mismatches, mismatches


@pytest.mark.parametrize("n", [0, 1, 3, 4, 7, 8, 15, 31, 32, 33, 63, 64, 95])
def test_duck_xxh64_length_sweep(spark, n):
    """One string per byte-length class, varied content so lane values
    differ (catches transposed-lane bugs the repeated-char strings
    cannot)."""
    s = "".join(chr(33 + (i * 7) % 90) for i in range(n))
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT $$" + s + "$$ AS s")
    (duck,) = con.execute(
        "WITH" + xxh64_ctes("t", "s", "x_", ["s"]) + " SELECT x_h FROM x_sf"
    ).fetchone()
    (sp,) = (
        spark.createDataFrame([(s,)], ["s"])
        .select(F.xxhash64("s"))
        .first()
    )
    assert duck == sp


# ----------------------------- randomized cross-engine equality (fuzz)

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# printable-ish unicode minus surrogates (invalid in UTF-8) — covers
# ASCII, Latin-1, CJK, and astral-plane codepoints
_chars = st.characters(
    min_codepoint=1,
    max_codepoint=0x10FFFF,
    blacklist_categories=("Cs",),
)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(strings=st.lists(st.text(_chars, max_size=80), min_size=1,
                        max_size=20))
def test_duck_xxh64_fuzz_matches_spark(spark, strings):
    """Random unicode strings: the DuckDB XXH64 transcription and
    Spark's native xxhash64 must agree on every one — the randomized
    twin of the deterministic length-class sweep above."""
    sdf = spark.createDataFrame([(s,) for s in strings], ["s"])
    sp = [
        r.h for r in sdf.select(F.xxhash64("s").alias("h")).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    list(enumerate(strings)))
    duck = [
        h for _, h in con.execute(
            "WITH" + xxh64_ctes("t", "s", "x_", ["i"])
            + " SELECT i, x_h FROM x_sf ORDER BY i"
        ).fetchall()
    ]
    # Spark's collect preserves createDataFrame order for a local list,
    # and the DuckDB side orders by the threaded-through index
    assert duck == sp


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                     min_size=1, max_size=30))
def test_duck_xxh64_long_fuzz_matches_spark(spark, vals):
    from squirreldb_spark.pipeline.duck_xxh64 import xxh64_long_sql

    sdf = spark.createDataFrame([(v,) for v in vals], "x long")
    sp = [r.h for r in sdf.select(F.xxhash64("x").alias("h")).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, x BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(vals)))
    duck = [h for _, h in con.execute(
        f"SELECT i, {xxh64_long_sql('x')} FROM t ORDER BY i").fetchall()]
    assert duck == sp
