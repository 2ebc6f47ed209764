"""Scoped builder persists (VERDICT r14 #5).

r14 pinned within-query intermediates in ~10 builders (broadcast
subtrees are never runtime-reuse-deduped) but left no release path:
every bench rep / catalog invocation stacked pinned tables in the
storage pool until the session died.  `pin` bounds growth to one live
copy per builder key, `release_pins` drains the registry between
queries, and Spark's CacheManager plan-dedup is respected (a same-plan
re-pin shares the entry and must NOT be unpersisted).
"""

from __future__ import annotations

from squirreldb_spark.pipeline._pins import _PINS, pin, pinned, release_pins


def _n_cached_rdds(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def test_pin_replaces_same_key_different_plan(spark):
    release_pins()
    df1 = pin("t.replace", spark.range(10).selectExpr("id * 2 as v"))
    df1.count()
    assert df1.storageLevel.useMemory
    df2 = pin("t.replace", spark.range(20).selectExpr("id * 3 as v"))
    df2.count()
    # the superseded copy was released, the new one is live
    assert not df1.storageLevel.useMemory
    assert df2.storageLevel.useMemory
    assert release_pins() == 1
    assert not df2.storageLevel.useMemory
    assert _PINS == {}


def test_pin_same_plan_keeps_shared_cache_entry(spark):
    """CacheManager dedups persists by canonicalized plan: re-invoking a
    builder with identical args re-registers the same plan.  pin() must
    not unpersist the predecessor then — it would silently unpin the new
    reference too (they share one entry)."""
    release_pins()
    a = spark.range(10).selectExpr("id * 2 as v")
    b = spark.range(10).selectExpr("id * 2 as v")  # same canonical plan
    d1 = pin("t.same", a)
    d1.count()
    pin("t.same", b)
    assert d1.storageLevel.useMemory  # shared entry still live
    release_pins()
    assert not d1.storageLevel.useMemory


def test_pinned_is_transform_compatible(spark):
    release_pins()
    df = spark.range(7).transform(pinned("t.transform"))
    df.count()
    assert df.storageLevel.useMemory
    assert release_pins() == 1


def test_builder_pins_are_released(spark, sf_dir):
    """A pinned catalog builder leaves nothing in the storage pool after
    release_pins() — the bench harness calls it between queries."""
    from squirreldb_spark.queries import CATALOG

    release_pins()
    before = _n_cached_rdds(spark)
    CATALOG["emb_hubness"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    assert _n_cached_rdds(spark) > before  # the pin materialized
    release_pins()
    assert _n_cached_rdds(spark) <= before
