"""Mutable labels (A31/A32): tenant-scoped virtual labels.

Reference semantics (cassandra/mutable/processor.go:52-304): a mapping
``(tenant, mutable_name, mutable_value) -> (associated_name, [values])``
lets users query ``group="mygroup"`` and have it rewritten to
``instance=~"server1|server2"`` before the index search; matched series are
then *enriched* with the mutable label on the way out.

Spark mapping (SURVEY §1.5): the mapping is a small DataFrame;

* **matcher rewrite** = resolve the mutable matcher against the mapping
  and turn it into an ``isin(values)`` filter on the associated column
  (the regex-free equivalent of the reference's escaped-regex union);
* **result enrichment** = broadcast join adding the mutable column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAPPING_SCHEMA = (
    "tenant string, mutable_name string, mutable_value string, "
    "associated_name string, associated_values array<string>"
)


def resolve_values(
    mapping: DataFrame, tenant: str, mutable_name: str, mutable_value: str
) -> tuple[str, list[str]]:
    """A31: mutable matcher -> (associated column, concrete values).

    Driver-side lookup: the mapping is tiny (config data); the reference
    does the same resolution in-process against its cached store.
    """
    rows = (
        mapping.filter(
            (F.col("tenant") == tenant)
            & (F.col("mutable_name") == mutable_name)
            & (F.col("mutable_value") == mutable_value)
        )
        .select("associated_name", "associated_values")
        .collect()
    )
    if not rows:
        return "", []
    return rows[0].associated_name, list(rows[0].associated_values)


def rewrite_filter(
    points: DataFrame,
    mapping: DataFrame,
    tenant: str,
    mutable_name: str,
    mutable_value: str,
) -> DataFrame:
    """Apply the rewritten mutable matcher as an isin() filter."""
    col, values = resolve_values(mapping, tenant, mutable_name, mutable_value)
    if not col:
        return points.limit(0)
    return points.filter(F.col(col).cast("string").isin(values))


def enrich(
    result: DataFrame, mapping: DataFrame, tenant: str, mutable_name: str
) -> DataFrame:
    """A32: attach the mutable label to result series via broadcast join
    on the associated column."""
    pairs = (
        mapping.filter(
            (F.col("tenant") == tenant) & (F.col("mutable_name") == mutable_name)
        )
        .select(
            "associated_name", "mutable_value",
            F.explode("associated_values").alias("associated_value"),
        )
    )
    rows = pairs.collect()
    if not rows:
        return result.withColumn(mutable_name, F.lit(None).cast("string"))
    col = rows[0].associated_name
    lookup = pairs.select(
        F.col("associated_value"), F.col("mutable_value").alias(mutable_name)
    )
    return result.join(
        F.broadcast(lookup),
        result[col].cast("string") == lookup["associated_value"],
        "left",
    ).drop("associated_value")
