"""Native PromQL engine on DataFrames.

The reference embeds the upstream prometheus/promql evaluator
(api/promql/engine.go:32-51) — it parses PromQL, walks the AST, and pulls
series through storage.Queryable. Here the whole evaluator is re-expressed
on Spark: :mod:`parser` produces an AST, :mod:`planner` lowers it to a
DataFrame program built from the ``squirreldb_spark.tsdb`` operators, and
Catalyst owns physical planning (SURVEY §3.3 "Spark lifecycle mapping").
"""

from squirreldb_spark.promql.parser import parse
from squirreldb_spark.promql.planner import PromQLEngine

__all__ = ["parse", "PromQLEngine"]
