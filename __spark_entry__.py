"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The implementation lives in ``squirreldb_spark`` (see SURVEY.md §2 for the
operator inventory this covers); this module is just the thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from squirreldb_spark.queries import CATALOG  # noqa: E402
from squirreldb_spark.session import configure_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: PromQL-style rate() with Prometheus extrapolation
    semantics over the events stream at sf0.001."""
    configure_session(spark)
    return CATALOG["ts_rate"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(name):
        qd = CATALOG[name]

        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_session(spark)
            return qd.fn(spark, sf_dir)

        run.__name__ = f"query_{name}"
        return run

    return {name: wrap(name) for name in CATALOG}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted -> rows-only check)."""
    return {name: qd.oracle for name, qd in CATALOG.items() if qd.oracle is not None}
