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


def cached_rows(mapping: DataFrame):
    """The mapping rows, collected ONCE per mapping DataFrame and cached
    on it — mirroring the reference's in-process cached store
    (cassandra/mutable/processor.go keeps the mapping in memory and
    resolves against it without I/O). The mapping is config-sized by
    construction; :class:`MutableLabelStore` pre-seeds this cache so no
    Spark job ever runs for it."""
    rows = getattr(mapping, "_sq_mutable_rows", None)
    if rows is None:
        rows = mapping.select(
            "tenant", "mutable_name", "mutable_value",
            "associated_name", "associated_values",
        ).collect()
        try:
            mapping._sq_mutable_rows = rows
        except AttributeError:  # pragma: no cover
            pass
    return rows


class MutableLabelStore:
    """Management API over the mutable-label mapping (A31/A32 write side).

    The reference exposes POST/DELETE ``/mutable/names`` and
    ``/mutable/values`` (api/api.go:230-233) backed by two tables
    (cassandra/mutable/cassandra.go:78-96): per-tenant
    ``name -> associated_name`` registrations and
    ``(tenant, name, value) -> associated values`` sets. Rows live
    driver-side (config data); every mutation produces a FRESH mapping
    DataFrame with the row cache pre-seeded, so cache invalidation is
    object identity and neither the planner's matcher rewrite nor
    :func:`enrich` runs a Spark job to read the mapping.
    """

    def __init__(self, spark):
        self.spark = spark
        #: (tenant, name) -> associated_name
        self._names: dict[tuple[str, str], str] = {}
        #: (tenant, name, value) -> [associated values]
        self._values: dict[tuple[str, str, str], list[str]] = {}

    # ------------------------------------------------------- mutations

    def set_name(self, tenant: str, name: str, associated_name: str) -> None:
        """POST /mutable/names: register a mutable label name."""
        self._names[(tenant, name)] = associated_name

    def delete_name(self, tenant: str, name: str) -> None:
        """DELETE /mutable/names: drop the name and its value sets
        (the reference cascades, mutable/cassandra.go DeleteLabelNames)."""
        self._names.pop((tenant, name), None)
        for key in [k for k in self._values if k[:2] == (tenant, name)]:
            del self._values[key]

    def set_values(self, tenant: str, name: str, value: str,
                   associated_values: list[str]) -> None:
        """POST /mutable/values: bind a mutable value to concrete ones."""
        if (tenant, name) not in self._names:
            raise ValueError(f"mutable label {name!r} not registered for {tenant!r}")
        self._values[(tenant, name, value)] = list(associated_values)

    def delete_values(self, tenant: str, name: str, value: str) -> None:
        """DELETE /mutable/values."""
        self._values.pop((tenant, name, value), None)

    # ----------------------------------------------------------- reads

    def rows(self):
        from pyspark.sql import Row

        return [
            Row(
                tenant=t, mutable_name=n, mutable_value=v,
                associated_name=self._names[(t, n)],
                associated_values=list(vals),
            )
            for (t, n, v), vals in sorted(self._values.items())
        ]

    def mapping(self) -> DataFrame:
        """The current mapping as a DataFrame, row cache pre-seeded."""
        rows = self.rows()
        df = (
            self.spark.createDataFrame(rows, MAPPING_SCHEMA)
            if rows
            else self.spark.createDataFrame([], MAPPING_SCHEMA)
        )
        df._sq_mutable_rows = rows
        return df


def resolve_values(
    mapping: DataFrame, tenant: str, mutable_name: str, mutable_value: str
) -> tuple[str, list[str]]:
    """A31: mutable matcher -> (associated column, concrete values).

    Driver-side lookup through the per-DataFrame row cache
    (:func:`cached_rows`) — the same cache :func:`enrich` and the
    planner's matcher rewrite read, so a pre-seeded mapping (the
    :class:`MutableLabelStore` path) resolves with ZERO Spark jobs,
    mirroring the reference's in-process cached store
    (cassandra/mutable/processor.go).
    """
    for r in cached_rows(mapping):
        if (
            r.tenant == tenant
            and r.mutable_name == mutable_name
            and r.mutable_value == mutable_value
        ):
            return r.associated_name, list(r.associated_values)
    return "", []


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
    on the associated column.

    Reads the mapping through the per-DataFrame row cache
    (:func:`cached_rows`) — the same cache the planner's matcher rewrite
    uses — so enrichment itself runs no Spark job; the lookup side is a
    local relation built from the cached rows.
    """
    rows = [
        r for r in cached_rows(mapping)
        if r.tenant == tenant and r.mutable_name == mutable_name
    ]
    if not rows:
        return result.withColumn(mutable_name, F.lit(None).cast("string"))
    assoc_names = {r.associated_name for r in rows}
    if len(assoc_names) > 1:
        # one mutable name must rewrite onto ONE concrete label (the
        # reference's mutable_label_names table keys (tenant, name) ->
        # one associated name); silently joining on rows[0]'s column
        # would mis-enrich the rest
        raise ValueError(
            f"mutable label {mutable_name!r} maps to multiple associated "
            f"names {sorted(assoc_names)} for tenant {tenant!r}"
        )
    col = rows[0].associated_name
    # one mutable value per concrete value (smallest wins, deterministic):
    # a concrete value bound to several mutable values would otherwise
    # FAN OUT every matching result row through the join, double-counting
    # downstream aggregations — enrichment must preserve row counts
    by_assoc: dict[str, str] = {}
    for r in sorted(rows, key=lambda r: r.mutable_value):
        for av in r.associated_values:
            by_assoc.setdefault(av, r.mutable_value)
    pairs = list(by_assoc.items())
    lookup = result.sparkSession.createDataFrame(
        pairs, f"associated_value string, {mutable_name} string"
    )
    return result.join(
        F.broadcast(lookup),
        result[col].cast("string") == lookup["associated_value"],
        "left",
    ).drop("associated_value")
