"""Local replica of the driver's correctness gate.

Runs each catalog query on Spark and its oracle on DuckDB over the same
parquet directory, normalizes both results (column order by name, row order
by all columns), and compares values. Used by tests and for pre-flight
debugging; the real gate is the driver's CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import hashlib
import math
import os

import duckdb
import pandas as pd

from squirreldb_spark.model import TABLES


def driver_hash(pdf: pd.DataFrame) -> str:
    """The driver's exact value hash: CSV text of the column-name-sorted,
    row-sorted frame. TEXTUAL — an int64 719 and a float64 719.0 hash
    differently even though they compare equal, so dtype drift between
    Spark and DuckDB results is a real failure here (it is at the
    driver's gate too)."""
    pdf = pdf[sorted(pdf.columns)].copy()
    pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
    return hashlib.md5(pdf.to_csv(index=False).encode()).hexdigest()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # widen to comparable dtypes
    for c in df.columns:
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, tol: float = 0.0) -> list[str]:
    """Return a list of mismatch descriptions (empty = match).

    ``tol`` is positional row-wise only: normalization sorts each frame
    independently, so values differing within tolerance can land in
    different row orders and report spurious diffs — which is why every
    catalog oracle rounds on BOTH sides and the gate runs at tol=0
    (hash-exact), matching the driver. Treat tol>0 as a debugging aid,
    not a correctness mode.
    """
    issues: list[str] = []
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if list(a.columns) != list(b.columns):
        return [f"columns differ: spark={list(a.columns)} duck={list(b.columns)}"]
    if len(a) != len(b):
        return [f"row count differs: spark={len(a)} duck={len(b)}"]
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f":
            both_nan = av.isna() & bv.isna()
            # (av == bv) first: equal INFINITIES subtract to NaN, which
            # would fail the tolerance test on identical values
            close = (av == bv) | ((av - bv).abs() <= tol) | both_nan
            if not close.all():
                bad = (~close).idxmax()
                issues.append(
                    f"col {c}: {int((~close).sum())} diffs, first at row {bad}: "
                    f"spark={av[bad]!r} duck={bv[bad]!r}"
                )
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                bad = (~eq).idxmax()
                issues.append(
                    f"col {c}: {int((~eq).sum())} diffs, first at row {bad}: "
                    f"spark={av[bad]!r} duck={bv[bad]!r}"
                )
    if not issues and tol == 0.0 and driver_hash(spark_pdf) != driver_hash(duck_pdf):
        issues.append(
            "driver value-hash mismatch despite equal values: dtype or "
            "text-formatting drift (e.g. int64 vs float64 column) — the "
            "driver's textual CSV hash would fail this entry"
        )
    return issues


def run_parity(spark, sf_dir: str, names: list[str] | None = None, tol: float = 0.0):
    """Yield (name, issues, n_rows) per catalog entry with an oracle."""
    from squirreldb_spark.queries import CATALOG

    con = duck_connection(sf_dir)
    for name, qd in CATALOG.items():
        if names and name not in names:
            continue
        if qd.oracle is None:
            continue
        spdf = qd.fn(spark, sf_dir).toPandas()
        dpdf = con.execute(qd.oracle).fetchdf()
        yield name, compare(spdf, dpdf, tol=tol), len(spdf)
