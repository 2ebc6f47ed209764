"""squirreldb_spark — a PySpark-native time-series analytics engine.

A from-scratch re-expression of the query and data-processing capabilities of
bleemeo/squirreldb (a Prometheus-compatible TSDB backed by Cassandra) as an
idiomatic Apache Spark engine:

- the tall-narrow (labels, timestamp) -> float64 data model (SURVEY §1) becomes
  a fact DataFrame ``points`` plus a label dimension,
- the storage/dataflow operators (SURVEY §2A: interning, dedup, downsampling,
  pre-aggregation routing, retention, ...) become declarative DataFrame
  programs optimized by Catalyst,
- the PromQL operator surface (SURVEY §2B: selectors with lookback, rate with
  extrapolation, aggregation operators, vector-matching binops, ...) is
  implemented natively on DataFrames — the reference delegates this to the
  embedded prometheus/promql engine; here every operator is a composition of
  ``pyspark.sql.functions`` that stays inside whole-stage codegen,
- on top, large-scale training-data pipeline operators: deduplication
  (exact / MinHash-LSH / SimHash), similarity search over embeddings, text
  analysis, and multimodal column plumbing.

Design stance: DataFrame/SQL only; no RDDs; Python UDFs only where semantics
genuinely require sequential per-series state (Arrow-batched pandas UDFs).
"""

__version__ = "0.1.0"

from squirreldb_spark.session import get_session, configure_session

__all__ = ["get_session", "configure_session", "__version__"]
