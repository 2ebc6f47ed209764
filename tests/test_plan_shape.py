"""Physical-plan regression guards for the scale claims in docs/SCALE.md.

These assert plan *shape*, not timings: the range join must be a hash join
(never a nested loop / cartesian product), small sides must broadcast, and
scans must prune columns. A regression here is invisible at sf0.001 but
catastrophic at 100 TB.
"""

import pytest
from pyspark.sql import functions as F

from squirreldb_spark import model
from squirreldb_spark.tsdb import range_fns, selectors
from squirreldb_spark.queries import CATALOG, KEYS, LOOKBACK_MS, RANGE_MS, STEP_MS


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def assert_no_theta_joins(plan: str, name: str) -> None:
    """A CartesianProduct means a deliberate cross lost its broadcast hint;
    a *conditioned* BroadcastNestedLoopJoin means a range/theta predicate
    is being evaluated row-by-row against the whole build side. The only
    nested-loop shape allowed is the intentional unconditioned
    ``crossJoin(broadcast(grid))`` marker expansion (output-linear)."""
    assert "CartesianProduct" not in plan, f"{name}: CartesianProduct in plan"
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert ", Cross" in line and "..." not in line.split("Cross", 1)[1][:3], (
                f"{name}: conditioned nested-loop join: {line.strip()[:160]}"
            )


@pytest.mark.parametrize("name", [
    "ts_rate", "ts_instant_selector", "ts_avg_over_time", "ts_topk",
    "ts_binop_ratio", "ts_set_and", "ts_stitch_preagg_raw",
    "promql_rate_sum", "promql_group_left", "emb_ann_lsh", "emb_ann_ivf",
    "doc_minhash_lsh_pairs", "tpch_q5_local_supplier",
])
def test_no_theta_or_cartesian_joins(spark, sf_dir, name):
    assert_no_theta_joins(plan_of(CATALOG[name].fn(spark, sf_dir)), name)


def test_range_join_is_hash_join_on_bucket(spark, sf_dir):
    pts = model.points(spark, sf_dir)
    rs = selectors.range_select(pts, KEYS, STEP_MS, RANGE_MS)
    plan = plan_of(rs)
    assert "BroadcastHashJoin" in plan and "bucket" in plan
    assert_no_theta_joins(plan, "range_select")


def test_rate_has_single_series_shuffle(spark, sf_dir):
    """The lag hoisting claim: exactly one hashpartitioning by the series
    keys feeds the window; the range explosion adds no extra sort of
    exploded rows."""
    pts = model.points(spark, sf_dir)
    df = range_fns.extrapolated(pts, KEYS, STEP_MS, RANGE_MS,
                                is_counter=True, is_rate=True)
    plan = plan_of(df)
    # one series-window exchange + the final aggregation exchange
    assert plan.count("Window") == 1


def test_instant_selector_reads_pruned_columns(spark, sf_dir):
    df = selectors.instant_select(
        model.points(spark, sf_dir), KEYS, STEP_MS, LOOKBACK_MS
    )
    plan = plan_of(df)
    # the fact scan must not read props/event_id etc.
    assert "props" not in plan and "event_id" not in plan


def test_grid_is_broadcast_in_instant_select(spark, sf_dir):
    df = selectors.instant_select(
        model.points(spark, sf_dir), KEYS, STEP_MS, LOOKBACK_MS
    )
    assert "BroadcastExchange" in plan_of(df)


def test_bucketed_layout_aggregates_without_shuffle(spark, sf_dir, tmp_path):
    """Series-bucketed storage: a per-series aggregation over the bucketed
    table must contain NO Exchange — bucketing already hash-distributes
    by the series keys. This is the layout that removes the one wide
    shuffle from rate/selector plans at 100 TB."""
    pts = model.points(spark, sf_dir)
    model.write_bucketed_points(
        pts, "pts_bucketed_test", str(tmp_path / "bucketed"), n_buckets=8
    )
    try:
        df = (
            spark.table("pts_bucketed_test")
            .groupBy("user_id", "event_type")
            .agg(F.max("value").alias("mx"), F.count(F.lit(1)).alias("n"))
        )
        plan = plan_of(df)
        assert "Exchange" not in plan, plan[:800]
        assert df.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS pts_bucketed_test")


def test_series_interning_has_no_global_window(spark, sf_dir):
    """Hash-ID interning: the series dimension must not contain a Window
    (the old dense_rank forced every series through one task)."""
    plan = plan_of(model.series_dim(spark, sf_dir))
    assert "Window" not in plan
    # IDs are stable: recomputation yields the same ids
    a = {r.user_id * 1000 + hash(r.event_type) % 997: r.series_id
         for r in model.series_dim(spark, sf_dir).collect()}
    b = {r.user_id * 1000 + hash(r.event_type) % 997: r.series_id
         for r in model.series_dim(spark, sf_dir).limit(10_000).collect()}
    assert a == b


def test_bounded_query_filters_ts_at_scan(spark, sf_dir):
    """Time-bound pushdown: an explicitly-bounded API query must carry the
    derived ts window as a filter adjacent to the fact scan (not after a
    join/window), so only the bounded slice flows into the query."""
    from squirreldb_spark.queries import BOUND_START_MS, q_api_bounded_scan

    plan = plan_of(q_api_bounded_scan(spark, sf_dir))
    lo = BOUND_START_MS - LOOKBACK_MS
    assert f"> {lo}" in plan, "lower ts bound missing from the physical plan"
    # the bound must be applied before the grid join, i.e. inside the
    # scan-side stage: no Window/Join text between the Scan and the filter
    scan_stage = plan[plan.rindex("Scan parquet"):]
    assert str(lo) in plan[: plan.rindex("Scan parquet")] or str(lo) in scan_stage


def test_bounded_query_prunes_date_partitions(spark, sf_dir, tmp_path):
    """On the production date-partitioned layout (A9), the same bounds
    become real partition pruning: PartitionFilters on the scan."""
    from squirreldb_spark import model
    from squirreldb_spark.promql.planner import PromQLEngine
    from squirreldb_spark.queries import BOUND_END_MS, BOUND_START_MS

    store = str(tmp_path / "raw_by_date")
    pts = model.points(spark, sf_dir).withColumn(
        "date", F.expr("date_add(DATE '1970-01-01', cast(ts div 86400000 as int))")
    )
    pts.write.partitionBy("date").mode("overwrite").parquet(store)
    eng = PromQLEngine(
        spark.read.parquet(store), label_cols=tuple(KEYS),
        name_label="event_type", step_ms=STEP_MS, lookback_ms=LOOKBACK_MS,
        start_ms=BOUND_START_MS, end_ms=BOUND_END_MS,
    )
    plan = plan_of(eng.query_range("purchase"))
    seg = plan[plan.index("PartitionFilters"):][:400]
    assert "date" in seg and "isnotnull" in seg.lower(), seg


def test_tpch_q6_filters_push_to_scan(spark, sf_dir):
    plan = plan_of(CATALOG["tpch_q6_forecast_revenue"].fn(spark, sf_dir))
    # quantity/discount predicates reach the parquet scan
    assert "PushedFilters: [" in plan and "l_quantity" in plan.split(
        "PushedFilters"
    )[1][:400]


def test_dup_guard_exchange_reused_by_aggregation(spark, sf_dir):
    """The duplicate-series guard (upstream name-drop semantics) windows
    over (result labels, step_ts) — the same keys sum-by groups on, so
    the canonical sum(rate(...)) shape must run with exactly TWO hash
    exchanges: the per-series window and the shared guard/aggregation
    partitioning. A third exchange means the reuse regressed."""
    import re

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(CATALOG["promql_rate_sum"].fn(spark, sf_dir))
        n_hash = len(re.findall(r"Exchange hashpartitioning", plan))
        assert n_hash == 2, f"expected 2 hash exchanges, saw {n_hash}"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_ivf_serving_plan_has_no_training(spark, sf_dir):
    """emb_ann_ivf is serving-only: the Lloyd fold (posexplode + per-cell
    centroid re-aggregation) must not appear in the query plan."""
    plan = plan_of(CATALOG["emb_ann_ivf"].fn(spark, sf_dir))
    assert "posexplode" not in plan


def test_ivf_assignment_is_map_side(spark, sf_dir):
    """Cell assignment must be a literal-centroid argmax FOLD inside the
    corpus scan: the only hash exchanges allowed are the TWO top-k
    windows (per-(q_id, shard) partial, then the merge over shard
    winners), and the probe join must broadcast the
    (n_queries x nprobe)-row probe side. Any other hash exchange means
    the corpus is being shuffled to compute the assignment again (the
    former crossJoin + row_number shape)."""
    import re

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(CATALOG["emb_ann_ivf"].fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    keys = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert len(keys) == 2, f"expected the 2 top-k exchanges, saw {keys}"
    assert any("_shard" in k for k in keys), keys
    assert all("q_id" in k for k in keys), keys
    assert "BroadcastHashJoin" in plan


def test_ivfpq_encode_is_map_side(spark, sf_dir):
    """IVF-PQ ADC serve: cell assignment AND the m PQ codes must be
    literal folds inside the corpus scan, the probe/LUT side must
    broadcast, and the only hash exchanges allowed are the two top-k
    windows — the corpus's raw vectors never shuffle (they are dropped
    before the join; only (id, cell, codes) move)."""
    import re

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(CATALOG["emb_ann_ivfpq"].fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    keys = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert len(keys) == 2, f"expected the 2 top-k exchanges, saw {keys}"
    assert all("q_id" in k for k in keys), keys
    assert "BroadcastHashJoin" in plan


def test_range_search_zero_exchange(spark, sf_dir):
    """Fixed-radius search needs no ranking, so the whole plan is one
    corpus pass with a broadcast query side: zero hash exchanges."""
    import re

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(CATALOG["emb_range_search"].fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    keys = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert keys == [], f"radius search must not shuffle: {keys}"
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_dsir_ratio_table_broadcasts(spark, sf_dir):
    """DSIR's per-bucket log-ratio table is config-sized and must come
    back over the token stream via a broadcast join; the token stream
    itself shuffles only for the bucket aggregates and the final
    per-document sum — never on the raw term."""
    import re

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(CATALOG["doc_dsir_weights"].fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "BroadcastHashJoin" in plan
    keys = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert all("bucket" in k or "doc_id" in k for k in keys), keys
    assert sum("doc_id" in k for k in keys) == 1, keys


def test_curation_verdict_fuses_signals(spark, sf_dir):
    """The verdict's narrow-map signals (quality, lang guess, PII) must
    be columns of ONE corpus projection — composing the standalone
    operators via joins re-scans the corpus per signal and broadcasts
    corpus-sized join sides. Allowed: two scans (signals + dedup input)
    and only the dedup aggregate's content_hash exchange."""
    import re

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(CATALOG["doc_curation_verdict"].fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert plan.count("FileScan parquet") == 2, plan.count("FileScan parquet")
    keys = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert all("content_hash" in k for k in keys), keys


def test_segment_dedup_two_shuffles(spark, sf_dir):
    """Corpus-global segment dedup is exactly the C4 two-shuffle recipe:
    one exchange on the segment key (first-occurrence window), one on
    the doc id (reassembly) — anything more means an avoidable join or
    a re-shuffle crept in."""
    import re

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(CATALOG["doc_segment_dedup"].fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    keys = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert len(keys) == 2, f"expected 2 exchanges (seg window, doc agg): {keys}"
    assert any("seg" in k for k in keys), keys
    assert any("doc_id" in k for k in keys), keys


def test_segment_dedup_hashkey_text_moves_once(spark, sf_dir):
    """The hash-keyed variant's defining property: the first-occurrence
    window shuffles on xxhash64(seg), the per-doc verdict rows are the
    only other narrow exchange, and the TEXT crosses the wire exactly
    once — on the doc-table side of the verdict join. Auto-broadcast is
    disabled so the join shape is the 100 TB one (SMJ), not a test-scale
    broadcast."""
    import re

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(CATALOG["doc_segment_dedup_hashkey"].fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    keys = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert len(keys) == 3, f"expected 3 exchanges (h window, verdicts, text): {keys}"
    # the window keys on the 64-bit hash, never the segment text
    assert sum(1 for k in keys if re.search(r"\bh#", k)) == 1, keys
    assert sum(1 for k in keys if "doc_id" in k) == 2, keys
    assert not any("seg" in k or "text" in k for k in keys), keys
    # xxhash64 must be computed BELOW the window exchange (map-side)
    assert "xxhash64" in plan
    assert "SortMergeJoin" in plan


def test_pack_sequences_cumsum_is_sharded(spark, sf_dir):
    """The packing cumsum must partition by (lang, content-derived shard),
    never by lang alone — one task per language serializes the dominant
    language at corpus scale. The per-shard global token bases (a tiny
    n_langs x n_shards aggregate) must come back via a broadcast join,
    so the corpus itself moves through exactly one wide exchange."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(CATALOG["doc_pack_sequences"].fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    import re

    windows = [
        ln for ln in plan.splitlines()
        if "hashpartitioning" in ln and "lang" in ln
    ]
    assert any("shard" in ln for ln in windows), (
        "cumsum window not sharded:\n" + "\n".join(windows)
    )
    assert "BroadcastHashJoin" in plan
    # the documents scan feeds exactly one wide (lang, shard) exchange
    n_sharded = len(re.findall(r"Exchange hashpartitioning\(lang[^\n]*shard", plan))
    assert n_sharded >= 1


def test_decontaminate_broadcasts_benchmark(spark, sf_dir):
    """The benchmark n-gram set is eval-sized: every join in the plan
    must be a broadcast — a SortMergeJoin would mean the corpus is being
    shuffled by n-gram."""
    plan = plan_of(CATALOG["doc_decontaminate"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_token_budget_sample_single_stratum_shuffle(spark, sf_dir):
    plan = plan_of(CATALOG["doc_sample_budget"].fn(spark, sf_dir))
    # exactly one exchange: the stratum window; the budget filter must not
    # introduce another
    assert plan.count("Exchange hashpartitioning") == 1
    assert "lang" in plan and "source" in plan


def test_source_stats_has_no_joins(spark, sf_dir):
    # all signals come from ONE projection over documents + one groupBy;
    # a join would mean the table is being scanned more than once
    plan = plan_of(CATALOG["doc_source_stats"].fn(spark, sf_dir))
    assert "Join" not in plan


def test_unigram_vocab_is_broadcast(spark, sf_dir):
    plan = plan_of(CATALOG["doc_unigram_logprob"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert_no_theta_joins(plan, "doc_unigram_logprob")


@pytest.mark.parametrize("name", [
    "tpch_q2_min_cost_supplier", "tpch_q7_nation_volume",
    "tpch_q8_market_share", "tpch_q9_product_profit",
    "tpch_q16_supplier_counts", "tpch_q20_excess_shippers",
])
def test_new_tpch_dims_broadcast(spark, sf_dir, name):
    plan = plan_of(CATALOG[name].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert_no_theta_joins(plan, name)


def test_asof_join_is_single_exchange_no_range_join(spark, sf_dir):
    """The as-of join must be the union-tag window plan: exactly ONE
    hash exchange on the join key, and no join operator at all (a range
    join would appear as a theta BroadcastNestedLoopJoin or worse)."""
    import re
    from squirreldb_spark.queries import q_ev_asof_join

    plan = plan_of(q_ev_asof_join(spark, sf_dir))
    assert "Join" not in plan.replace("SortMergeJoin", "Join"), plan[:800]
    assert "CartesianProduct" not in plan
    # one exchange for the right-side pre-collapse groupBy is allowed,
    # but the window pass itself must reuse the user_id distribution:
    # the union's two branches each hash by user_id, nothing else
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys == {"user_id"}, keys


def test_duplicate_spans_windows_share_one_shingle_exchange(spark, sf_dir):
    """dense_rank + max-over-partition must share a single exchange+sort
    on the shingle key; only the doc-side island reduction adds more."""
    import re
    from squirreldb_spark.pipeline import dedup as pdedup

    docs = model.load_table(spark, sf_dir, "documents")
    plan = plan_of(pdedup.duplicate_spans(docs))
    n_sh = len(re.findall(r"Exchange hashpartitioning\(sh", plan))
    assert n_sh == 1, f"shingle key exchanged {n_sh} times:\n{plan[:800]}"


def test_sessionize_rollup_reuses_user_partitioning(spark, sf_dir):
    """The session window shuffles once on user_id; the (user_id,
    session_seq) rollup must NOT re-shuffle — grouping on a superset of
    the existing distribution is exchange-free."""
    import re
    from squirreldb_spark.pipeline import events as pev

    ev = model.load_table(spark, sf_dir, "events")
    plan = plan_of(pev.sessionize(ev))
    n_hash = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_hash == 1, f"expected 1 exchange, got {n_hash}:\n{plan[:800]}"


def test_pii_scrub_is_zero_shuffle(spark, sf_dir):
    from squirreldb_spark.pipeline import text as ptext

    docs = model.load_table(spark, sf_dir, "documents")
    plan = plan_of(ptext.pii_scrub(docs))
    assert "Exchange" not in plan, plan[:800]
    assert "Join" not in plan, plan[:800]


def test_diversity_sample_single_cell_exchange(spark, sf_dir):
    """Cell assignment + centrality come from a literal-centroid fold in
    the scan: the ONLY exchange is the per-cell top-k window."""
    import re
    from squirreldb_spark.pipeline import similarity as psim

    emb = model.load_table(spark, sf_dir, "embeddings")
    plan = plan_of(psim.ivf_diversity_sample(emb, cache_key=sf_dir))
    assert "posexplode" not in plan  # no training stage in the serving plan
    # two-phase top-k: first window keys by (cell, shard) so no task ever
    # sorts a whole cell; the merge window sees only the shard winners
    assert re.search(r"Exchange hashpartitioning\(cell[^\n]*_shard", plan), plan[:900]
    n_hash = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_hash == 2, f"expected 2 exchanges, got {n_hash}:\n{plan[:900]}"


def test_pq_encode_is_zero_exchange(spark, sf_dir):
    """PQ serving is a pure projection: literal-codebook argmin folds
    inside the corpus scan — no Exchange, no Join at all (cf. the
    scalar-quantize one-row broadcast; PQ needs not even that)."""
    from squirreldb_spark.pipeline import similarity as psim

    emb = model.load_table(spark, sf_dir, "embeddings")
    plan = plan_of(psim.pq_codes(emb, cache_key=sf_dir))
    assert "Exchange" not in plan, plan[:800]
    assert "Join" not in plan, plan[:800]
    assert "posexplode" not in plan  # no training stage in the encode plan


def test_winnowing_selection_is_zero_shuffle(spark, sf_dir):
    """Hashing, the sliding min and the per-doc dedup are all array HOFs
    in the scan; the only operator after it is the fingerprint explode."""
    from squirreldb_spark.pipeline import dedup as pdedup

    docs = model.load_table(spark, sf_dir, "documents")
    plan = plan_of(pdedup.winnowing_fingerprints(docs))
    assert "Exchange" not in plan, plan[:800]
    assert "Join" not in plan, plan[:800]


def test_hopping_counts_single_combiner_exchange(spark, sf_dir):
    """window() fans out inside the scan (Expand, not a join against a
    window table); the plan's ONE exchange carries partial aggregates."""
    import re
    from squirreldb_spark.pipeline import events as pev

    ev = model.load_table(spark, sf_dir, "events")
    plan = plan_of(pev.hopping_counts(ev))
    assert "Expand" in plan, plan[:800]
    assert "Join" not in plan, plan[:800]
    n_hash = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_hash == 1, f"expected 1 exchange, got {n_hash}:\n{plan[:900]}"
    assert "partial_count" in plan  # map-side combine before the exchange


def test_zipf_topk_is_take_ordered(spark, sf_dir):
    """The top-k over the vocabulary must be a TakeOrdered, never a
    global sort of the term counts."""
    from squirreldb_spark.pipeline import text as ptext

    docs = model.load_table(spark, sf_dir, "documents")
    plan = plan_of(ptext.zipf_stats(docs))
    assert "TakeOrderedAndProject" in plan, plan[:900]


def test_bigram_model_join_broadcasts(spark, sf_dir):
    """At test scale the (w1, w2) model fits the broadcast threshold, so
    scoring must not shuffle the corpus bigram stream for the join."""
    from squirreldb_spark.pipeline import text as ptext

    docs = model.load_table(spark, sf_dir, "documents")
    plan = plan_of(ptext.bigram_logprob(docs))
    assert "BroadcastHashJoin" in plan, plan[:900]
    assert_no_theta_joins(plan, "bigram_logprob")


def test_video_neardup_no_theta_joins(spark, sf_dir):
    """The pHash candidate join must stay an equi-join on (band, bv) with
    the bucket cap — never a cartesian/nested-loop pair enumeration."""
    plan = plan_of(CATALOG["mm_video_neardup"].fn(spark, sf_dir))
    assert_no_theta_joins(plan, "mm_video_neardup")


def test_session_paths_topk_is_take_ordered(spark, sf_dir):
    """The path ranking must TakeOrder the path counts, never globally
    sort them; the candidate join shapes stay equi-joins."""
    plan = plan_of(CATALOG["ev_session_paths"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan[:900]
    assert_no_theta_joins(plan, "ev_session_paths")


def test_containment_restricted_to_candidates(spark, sf_dir):
    """Containment only ever runs on the LSH candidate pair list — the
    plan must contain the banded equi-join, never a cartesian pairing."""
    plan = plan_of(CATALOG["doc_containment"].fn(spark, sf_dir))
    assert_no_theta_joins(plan, "doc_containment")


def test_tfidf_df_join_broadcasts_at_test_scale(spark, sf_dir):
    """The document-frequency model joins back BY TERM — broadcast at
    this scale, and never a theta/cartesian pairing."""
    from squirreldb_spark.pipeline import text as ptext

    docs = model.load_table(spark, sf_dir, "documents")
    plan = plan_of(ptext.tfidf_keywords(docs))
    assert "BroadcastHashJoin" in plan, plan[:900]
    assert_no_theta_joins(plan, "tfidf_keywords")


def test_token_budget_auto_shards_mega_stratum(spark):
    """VERDICT r4 #6: with n_shards="auto", a single mega-stratum must
    NOT funnel into one task — the running-sum window partitions on
    (lang, source, shard), giving >1 task for one stratum."""
    from pyspark.sql import functions as F

    from squirreldb_spark.pipeline import text

    big = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        F.lit("web").alias("source"),
        F.concat_ws(" ", F.array_repeat(F.lit("tok"), 50)).alias("text"),
    )
    out = text.token_budget_sample(big, budget=100_000, auto_shard_bytes=5_000)
    plan = plan_of(out)
    # the fixture's lang/source are literals, so Catalyst constant-folds
    # them out of the partition keys — what must remain is the
    # content-derived shard key carrying the fanout
    windows = [
        ln for ln in plan.splitlines() if "hashpartitioning" in ln
    ]
    assert any("shard" in ln for ln in windows), (
        "auto-sharded window not partitioned by shard:\n" + plan
    )
    # and the sampler really fans the stratum across shards
    n_shards = text._resolve_auto_shards(big, "text", auto_shard_bytes=5_000)
    assert n_shards > 1


def test_chunk_sliding_is_zero_shuffle(spark, sf_dir):
    """Chunking is a pure in-scan array fanout — any Exchange or Join
    here means the narrow-map claim in docs/SCALE.md regressed."""
    from squirreldb_spark.pipeline import text as ptext

    docs = model.load_table(spark, sf_dir, "documents")
    plan = plan_of(ptext.chunk_sliding(docs))
    assert "Exchange" not in plan, plan[:800]
    assert "Join" not in plan, plan[:800]


def test_split_assign_and_quality_logreg_zero_shuffle(spark, sf_dir):
    from squirreldb_spark.pipeline import text as ptext

    docs = model.load_table(spark, sf_dir, "documents")
    for fn in (ptext.split_assign, ptext.quality_logreg):
        plan = plan_of(fn(docs))
        assert "Exchange" not in plan, (fn.__name__, plan[:800])
        assert "Join" not in plan, (fn.__name__, plan[:800])


def test_novelty_has_no_self_join_on_corpus(spark, sf_dir):
    """Novelty is two natural-key aggregations + one doc-keyed join-back;
    a SortMergeJoin of two full shingle explodes (the naive self-join
    formulation) would be quadratic in hot shingles at scale."""
    from squirreldb_spark.pipeline import text as ptext

    docs = model.load_table(spark, sf_dir, "documents")
    plan = plan_of(ptext.novelty(docs))
    assert_no_theta_joins(plan, "novelty")
    # exactly one join: the config-sized novel-count join-back on doc_id
    n_joins = sum(
        1 for ln in plan.splitlines()
        if "Join" in ln and "BroadcastExchange" not in ln
    )
    assert n_joins <= 1, plan[:1200]
    # the explode itself must not be re-computed per aggregation branch:
    # both aggs hang off one Generate
    assert plan.count("Generate explode") <= 2, plan[:1200]


def test_matryoshka_prefix_scan_stays_broadcast(spark, sf_dir):
    from squirreldb_spark.pipeline import similarity as psim

    emb = model.load_table(spark, sf_dir, "embeddings")
    plan = plan_of(psim.matryoshka_recall(emb))
    assert_no_theta_joins(plan, "matryoshka_recall")


def test_anomaly_mad_reduces_before_percentiles(spark, sf_dir):
    """The day-bucket groupBy must be the FIRST exchange (the 100 TB ->
    KB reduction); med/mad join-backs broadcast."""
    from squirreldb_spark.pipeline import events as pev

    ev = model.load_table(spark, sf_dir, "events")
    plan = plan_of(pev.anomaly_mad(ev))
    assert_no_theta_joins(plan, "anomaly_mad")
    assert "BroadcastHashJoin" in plan, plan[:1200]
    assert "SortMergeJoin" not in plan, plan[:1200]


# ----------------------- vectors must never ride a shuffle (round 7)

def shuffle_exchange_outputs(df):
    """Output schema of every *shuffle* Exchange in the executed plan
    (BroadcastExchange excluded — broadcasting a bounded query/candidate
    set IS the intended way floats move; AQE initial plan included).
    An Exchange's output equals its input, so this is exactly the set of
    columns that crosses the wire in that shuffle."""
    found = []

    def walk(node):
        name = node.nodeName()
        if name == "Exchange":
            found.append([
                (node.output().apply(i).name(),
                 node.output().apply(i).dataType().simpleString())
                for i in range(node.output().size())
            ])
        for i in range(node.children().size()):
            walk(node.children().apply(i))
        if name == "AdaptiveSparkPlan":
            walk(node.initialPlan())

    walk(df._jdf.queryExecution().executedPlan())
    return found


def assert_no_vector_crosses_shuffle(df, name: str) -> None:
    """The round-6 lesson (binary_hamming_knn shipped full float vectors
    through its phase-1 top-k exchange): 'a broadcast join exists' does
    not bound shuffle WIDTH. This asserts the property directly — no
    array<double>/array<float> column appears in any shuffle Exchange's
    schema, so at production dims (~512 B/vector) every exchange stays
    ~tens of bytes per row."""
    for cols in shuffle_exchange_outputs(df):
        bad = [c for c, t in cols if t in ("array<double>", "array<float>")]
        assert not bad, (
            f"{name}: vector column(s) {bad} ride a shuffle Exchange "
            f"carrying {cols}"
        )


@pytest.mark.parametrize("name", [
    "emb_binary_hamming", "emb_cosine_knn", "emb_ann_ivf", "emb_ann_ivfpq",
    "emb_ann_ivfpq_refine", "emb_ann_lsh", "emb_range_search",
    "emb_mmr_rerank", "emb_semantic_dedup", "emb_neardup_pairs",
    "emb_diversity_sample", "emb_matryoshka_recall",
])
def test_no_vector_column_below_any_shuffle_exchange(spark, sf_dir, name):
    assert_no_vector_crosses_shuffle(CATALOG[name].fn(spark, sf_dir), name)


@pytest.mark.parametrize("variant", ["cdc_chunks", "cdc_chunks_fast"])
def test_cdc_chunking_zero_exchange(spark, sf_dir, variant):
    """Both CDC variants chunk the corpus entirely inside the scan —
    no Exchange anywhere in the plan (the boundary rule, span algebra,
    explode and chunk hash are all per-row)."""
    from squirreldb_spark.pipeline import text as ptext

    docs = model.load_table(spark, sf_dir, "documents")
    plan = plan_of(getattr(ptext, variant)(docs))
    assert "Exchange" not in plan, plan[:800]


def test_cdc_fast_boundary_scan_evaluated_once(spark, sf_dir):
    """The round-7 restage: the interpreted per-word boundary HOF must
    appear in its own projection (CollapseProject keeps non-cheap
    expressions referenced twice staged), so the word scan runs once per
    document: exactly one ArrayFilter over the token sequence, and
    exactly two xxhash64 sites total (boundary rule + chunk hash)."""
    from squirreldb_spark.pipeline import text as ptext

    docs = model.load_table(spark, sf_dir, "documents")
    plan = plan_of(ptext.cdc_chunks_fast(docs))
    assert plan.count("filter(sequence") == 1, plan[:1500]
    assert plan.count("xxhash64") == 2, plan[:1500]


def test_domain_cap_shards_before_merge(spark, sf_dir):
    """Zipf guard: the per-domain ranking must go through the two-phase
    kernel — first window keyed (source, _shard), merge window keyed
    (source) over at most shards x cap survivors."""
    import re

    from squirreldb_spark.pipeline import text as ptext

    docs = model.load_table(spark, sf_dir, "documents")
    plan = plan_of(ptext.domain_cap(docs))
    keys = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert any("_shard" in k and "source" in k for k in keys), keys
    assert_no_theta_joins(plan, "domain_cap")


def test_hll_rollup_production_exchanges_are_register_sized(spark, sf_dir):
    """self_eval=False: every exchange is keyed on register/group columns
    (partial aggregation upstream), and the raw (key, id) distinct
    shuffle never appears."""
    import re

    from squirreldb_spark.pipeline import events as pev

    ev = model.load_table(spark, sf_dir, "events")
    plan = plan_of(pev.hll_rollup(ev, self_eval=False))
    assert "Expand" not in plan
    keys = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert keys and all("user_id" not in k for k in keys), keys


def test_sample_quantiles_production_single_key_exchange(spark, sf_dir):
    """self_eval=False: the hash-sample filter runs in the scan stage, so
    only the sampled ~1/rate rows reach the single event_type ranking
    exchange; the full-data ranking path exists only under self-eval."""
    import re

    from squirreldb_spark.pipeline import events as pev

    ev = model.load_table(spark, sf_dir, "events")
    plan = plan_of(pev.hash_sample_quantiles(ev, self_eval=False))
    n_hash = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_hash == 1, plan[:1200]
    assert "xxhash64" in plan  # the sample predicate is in the plan, pre-shuffle


def test_canonical_dedup_text_never_shuffles(spark, sf_dir):
    """The dedup key is xxhash64(canonical_text): both hashes compute in
    the scan stage and only 8-byte keys cross the exchange — no string
    column in any shuffle's schema."""
    from squirreldb_spark.pipeline import text as ptext

    docs = model.load_table(spark, sf_dir, "documents")
    for cols in shuffle_exchange_outputs(ptext.canonical_dedup(docs)):
        assert all(t != "string" for _, t in cols), cols


def test_decayed_counts_single_combiner_exchange(spark, sf_dir):
    import re

    from squirreldb_spark.pipeline import events as pev

    ev = model.load_table(spark, sf_dir, "events")
    plan = plan_of(pev.decayed_counts(ev))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan[:1200]
    assert "BroadcastExchange" in plan  # the one-row reference timestamp


def test_hll_setops_production_raw_ids_stay_out_of_exchanges(spark, sf_dir):
    """self_eval=False: the only exchange touching event-sized data is
    the (key, bucket) register aggregate — user_id never crosses a
    shuffle (the hash folds in the scan)."""
    from squirreldb_spark.pipeline import events as pev

    ev = model.load_table(spark, sf_dir, "events")
    prod = pev.hll_setops(ev, self_eval=False)
    assert prod.columns == [
        "type_a", "type_b", "est_a", "est_b", "est_union", "est_inter"
    ]
    for cols in shuffle_exchange_outputs(prod):
        assert all(c != "user_id" for c, _ in cols), cols


def test_vocab_coverage_window_runs_on_freq_of_freq(spark, sf_dir):
    """The cumulative window must consume the frequency-of-frequency
    table only: exactly two hash exchanges (term count, fof regroup) —
    the vocabulary is never globally sorted, tokens never windowed."""
    import re

    from squirreldb_spark.pipeline import text as ptext

    docs = model.load_table(spark, sf_dir, "documents")
    plan = plan_of(ptext.vocab_coverage(docs))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2, plan[:1500]


def test_bm25_takeordered_and_broadcast_query(spark, sf_dir):
    from squirreldb_spark.pipeline import text as ptext

    docs = model.load_table(spark, sf_dir, "documents")
    plan = plan_of(ptext.bm25_topk(docs))
    assert "TakeOrdered" in plan, plan[:1200]
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# --- HOF lambda let-binding lint -------------------------------------------
#
# Interpreted higher-order-function lambdas have no common-subexpression
# elimination: an O(len) expression over a RAW input column inside a lambda
# body is re-evaluated once per element, turning an O(n) scan into O(n^2)
# per document (the round-7 headline bug class, found at 9 call sites:
# shingles, winnowing, chunk_sliding, Bloom _shingle_expr, ...).  The fix
# is the one-element-transform let-binding idiom (dedup.shingles).  This
# lint generalizes the eradication claim: in the ANALYZED plan of every
# catalog query, no `lambdafunction` body may apply an O(len) string/hash
# function to a non-lambda attribute reference.  Let-bound plans only ever
# apply these to `lambda` variables.

_OFFENDING_IN_LAMBDA = __import__("re").compile(
    r"\b(?:split|md5|sha1|sha2|crc32|xxhash64|sentences|lower|upper|"
    r"translate|reverse|regexp_replace|regexp_extract_all|regexp_count|"
    r"levenshtein|soundex)\(\s*(?!lambda\b)([a-zA-Z_]\w*#\d+)"
)


def _lambda_spans(plan: str):
    """Balanced-paren spans of every top-level lambdafunction(...) call."""
    spans, i, n = [], 0, len(plan)
    needle = "lambdafunction("
    while True:
        j = plan.find(needle, i)
        if j < 0:
            return spans
        depth, k = 1, j + len(needle)
        while k < n and depth:
            if plan[k] == "(":
                depth += 1
            elif plan[k] == ")":
                depth -= 1
            k += 1
        spans.append(plan[j:k])
        i = k  # top-level only: nested lambdas are inside this span


@pytest.mark.slow  # 128 s whole-catalog plan sweep (full tier)
def test_no_catalog_lambda_reevaluates_scan_width_expr(spark, sf_dir):
    """Every catalog query's analyzed plan: lambda bodies must not call an
    O(len) string/hash function on a raw (non-lambda) attribute."""
    bad = []
    for name, qd in CATALOG.items():
        plan = qd.fn(spark, sf_dir)._jdf.queryExecution().analyzed().toString()
        for span in _lambda_spans(plan):
            m = _OFFENDING_IN_LAMBDA.search(span)
            if m:
                bad.append((name, m.group(0), span[:160]))
                break
    assert not bad, "O(len) expr on raw column inside HOF lambda:\n" + "\n".join(
        f"  {n}: {hit}  ...  {ctx}" for n, hit, ctx in bad
    )


def test_source_overlap_shingle_text_never_shuffles(spark, sf_dir):
    """Round-8 weak item: the DISTINCT collapse and the self-join used
    raw shingle STRINGS as their shuffle key.  The key is now
    xxhash64(shingle), folded in the scan — the only string any shuffle
    may carry is the short source label."""
    from squirreldb_spark.pipeline import dedup as pdedup

    docs = model.load_table(spark, sf_dir, "documents")
    for cols in shuffle_exchange_outputs(pdedup.source_overlap(docs)):
        bad = [c for c, t in cols
               if t == "string" and c not in ("src", "source_a", "source_b")]
        assert not bad, (bad, cols)


def test_simhash_neardup_fingerprints_only_in_shuffles(spark, sf_dir):
    """Candidate generation shuffles (id, simhash, block) longs only —
    document text never crosses an exchange (the fingerprint folds in
    the scan's Arrow pass)."""
    from squirreldb_spark.pipeline import dedup as pdedup

    docs = model.load_table(spark, sf_dir, "documents")
    for cols in shuffle_exchange_outputs(pdedup.simhash_neardup_pairs(docs)):
        assert all(t != "string" for _, t in cols), cols


def test_bot_cadence_single_user_exchange(spark, sf_dir):
    """The lag window and the gap aggregation share ONE user_id
    partitioning — events are exchanged exactly once."""
    from squirreldb_spark.pipeline import events as pev

    import re

    ev = model.load_table(spark, sf_dir, "events")
    plan = plan_of(pev.bot_cadence(ev))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan[:1200]


def test_key_skew_takeordered_no_global_sort(spark, sf_dir):
    """Top-k comes from a distributed TakeOrdered; the only global Sort
    allowed is inside the post-limit k-row window."""
    from squirreldb_spark.pipeline import events as pev

    ev = model.load_table(spark, sf_dir, "events")
    plan = plan_of(pev.key_skew(ev))
    assert "TakeOrderedAndProject" in plan, plan[:1200]


def test_embedding_qc_no_vector_crosses_shuffle(spark, sf_dir):
    """The QC gate folds norms in the scan: only label + numeric
    partials cross its (two-phase distinct-dim) exchanges."""
    from squirreldb_spark.pipeline import similarity as psim

    emb = model.load_table(spark, sf_dir, "embeddings")
    assert_no_vector_crosses_shuffle(psim.embedding_qc(emb), "emb_qc")


def test_length_quantiles_window_runs_on_reduced_values(spark, sf_dir):
    """The order-statistic window partitions by source over the
    DISTINCT (source, n_tokens) table — no document row enters a Sort:
    every exchange carries at most (source, n_tokens, count) width."""
    from squirreldb_spark.pipeline import text as ptext

    docs = model.load_table(spark, sf_dir, "documents")
    for cols in shuffle_exchange_outputs(ptext.length_quantiles(docs)):
        names = [c for c, _ in cols]
        assert "text" not in names, cols


# --- day-bucket floor lint -------------------------------------------------
#
# Time-bucket convention (VERDICT r9 #3): epoch-ms -> bucket index must
# FLOOR the quotient on both engines.  Spark's `(ts / N).cast("long")`
# and DuckDB's `ts // N` both truncate toward zero, so pre-1970
# timestamps collapse buckets -0.x and +0.x into one double-width
# bucket 0 and shift derived weekday labels.  The repo idiom is
# `F.floor(ts / N)` / `CAST(floor(ts / N) AS BIGINT)` (peak_concurrency,
# events.py).  This source lint keeps the class from recurring in
# pipeline code, the same way the HOF-lambda lint above froze the
# O(n^2)-in-lambda class.  Scope is squirreldb_spark/pipeline/: the
# tsdb/promql grid arithmetic operates on range-clamped non-negative
# timestamps (api.py time-range clamp) where truncate == floor.

_TRUNC_BUCKET_SPARK = __import__("re").compile(
    r"/\s*(?:day_ms|hour_ms|week_ms|_DAY_MS|_HOUR_MS|_WEEK_MS|"
    r"F\.lit\(\s*(?:86_?400_?000|3_?600_?000|604_?800_?000)\s*\))"
    r"[\s)]*\.cast\(\s*['\"](?:long|int|bigint)['\"]\s*\)"
)
_TRUNC_BUCKET_SQL = __import__("re").compile(
    r"(?:epoch_ms\(\s*\w+\s*\)|\b(?:e|f|d|ev)?\.?(?:min\(ts\)|max\(ts\)|ts))"
    r"\s*//"
)


def test_pipeline_time_buckets_floor_not_truncate():
    import pathlib

    pkg = pathlib.Path(__file__).resolve().parents[1] / (
        "squirreldb_spark/pipeline"
    )
    bad = []
    for py in sorted(pkg.glob("*.py")):
        if py.name == "duck_xxh64.py":  # byte/word arithmetic, no timestamps
            continue
        for i, line in enumerate(py.read_text().splitlines(), 1):
            if _TRUNC_BUCKET_SPARK.search(line) or _TRUNC_BUCKET_SQL.search(line):
                bad.append(f"{py.name}:{i}: {line.strip()[:120]}")
    assert not bad, (
        "truncate-toward-zero time bucket (use F.floor(ts / N) / "
        "CAST(floor(ts / N) AS BIGINT)):\n" + "\n".join(bad)
    )


# --- round-10 operators ----------------------------------------------------

def test_user_concentration_window_runs_on_histogram(spark, sf_dir):
    """The unpartitioned Lorenz window must run over the DISTINCT
    activity-level histogram, never over keys: no Window node may see
    the key column, and no exchange carries more than histogram-width
    rows' columns."""
    from squirreldb_spark.pipeline import events as pevents

    df = pevents.user_concentration(model.load_table(spark, sf_dir, "events"))
    plan = plan_of(df)
    assert_no_theta_joins(plan, "ev_user_concentration")
    for line in plan.splitlines():
        if "Window " in line or line.strip().startswith("Window"):
            assert "user_id" not in line, line.strip()[:200]


def test_interarrival_lag_window_is_day_split(spark, sf_dir):
    """The data-volume lag window must partition by (event_type, day) —
    the two-level split — never by event_type alone (which would funnel
    each type through one partition at scale). Only the tiny per-day
    boundary table may window on event_type alone."""
    from squirreldb_spark.pipeline import events as pevents

    df = pevents.interarrival_profile(model.load_table(spark, sf_dir, "events"))
    plan = df._jdf.queryExecution().analyzed().toString()
    lag_specs = [
        ln for ln in plan.splitlines()
        if "lag(ts" in ln and "windowspecdefinition" in ln
    ]
    assert lag_specs, "no lag window found"
    assert any("day" in ln for ln in lag_specs), lag_specs


def test_interarrival_percentile_window_is_grid_bounded(spark, sf_dir):
    """VERDICT r10 #4: the cumulative percentile window must run over
    the QUANTIZED grid rollup (order by gq — ≤~110k rows/type by
    construction), never over raw `gap` values (unbounded distinct
    count under continuous arrivals).  The only windows ordering by the
    raw ts/gap stream are the (type, day)-split lags asserted above."""
    from squirreldb_spark.pipeline import events as pevents

    df = pevents.interarrival_profile(model.load_table(spark, sf_dir, "events"))
    plan = df._jdf.queryExecution().analyzed().toString()
    cum_specs = [
        ln for ln in plan.splitlines()
        if "sum(n" in ln and "windowspecdefinition" in ln
        # the unordered whole-partition _n_tot frame runs over the same
        # bounded grid table; only ORDERED (cumulative) specs are at risk
        and " ASC" in ln
    ]
    assert cum_specs, "no ordered cumulative window found"
    for ln in cum_specs:
        assert "gq" in ln and "gap" not in ln, ln.strip()[:200]


def test_dim_variance_no_vector_crosses_shuffle(spark, sf_dir):
    """The per-dim moment aggregate is map-side combinable: only
    (dim, partial) rows cross the exchange, never a vector."""
    from squirreldb_spark.pipeline import similarity as psim

    emb = model.load_table(spark, sf_dir, "embeddings")
    assert_no_vector_crosses_shuffle(psim.dim_variance(emb), "emb_dim_variance")


def test_pq_distortion_no_vector_crosses_shuffle(spark, sf_dir):
    """The encode is the pq_codes literal-codebook fold: the explode
    emits (s, code, d) narrow rows; no vector crosses any exchange."""
    from squirreldb_spark.pipeline import similarity as psim

    emb = model.load_table(spark, sf_dir, "embeddings")
    assert_no_vector_crosses_shuffle(
        psim.pq_distortion(emb, cache_key=sf_dir), "emb_pq_distortion"
    )


def test_lsh_s_curve_grid_join_broadcasts_and_no_text_shuffles(spark, sf_dir):
    """The 20-row grid joins the bucket rollup broadcast; the underlying
    LSH pass keeps its contract — document text never rides a shuffle."""
    from squirreldb_spark.pipeline import dedup as pdedup

    df = pdedup.lsh_s_curve(model.load_table(spark, sf_dir, "documents"))
    plan = plan_of(df)
    assert_no_theta_joins(plan, "doc_lsh_s_curve")
    for cols in shuffle_exchange_outputs(df):
        assert "text" not in [c for c, _ in cols], cols


def test_source_drift_corpus_join_never_broadcasts(spark, sf_dir):
    """VERDICT r10 #2 (inverted from r10's test): the corpus table is
    VOCAB-cardinality — 10^8-10^9 distinct tokens on a web corpus, far
    past any broadcast ceiling — so its join back onto the (source,
    word) counts must SHUFFLE on `w` (the counts are already
    register-width, so the re-key is one bounded exchange), never
    broadcast.  The bounded sides (per-source totals, 1-row corpus
    total) still broadcast, and raw text never rides a shuffle."""
    from squirreldb_spark.pipeline import text as ptext

    df = ptext.source_drift(model.load_table(spark, sf_dir, "documents"))
    plan = plan_of(df)
    assert "SortMergeJoin" in plan, plan[:1500]
    # the vocab join's build side must not appear as a broadcast: the
    # only BroadcastExchanges in the plan carry the bounded columns
    import re

    for m in re.finditer(r"BroadcastExchange[^\n]*\n[^\n]*", plan):
        assert "cn" not in m.group(0) or "_c_tot" in m.group(0), m.group(0)
    for cols in shuffle_exchange_outputs(df):
        assert "text" not in [c for c, _ in cols], cols


def test_minhash_k_sweep_no_theta_joins(spark, sf_dir):
    """Candidates come from the banded equi-join; the exact-Jaccard
    text join-back and the signature joins are all id-keyed equi-joins
    — never a cartesian/theta shape."""
    from squirreldb_spark.pipeline import dedup as pdedup

    df = pdedup.minhash_k_sweep(model.load_table(spark, sf_dir, "documents"))
    assert_no_theta_joins(plan_of(df), "doc_minhash_k_sweep")


def test_packing_efficiency_cumsum_stays_sharded(spark, sf_dir):
    """The rollup must inherit pack_sequences' sharded cumsum: the
    data-volume window partitions by (lang, shard), never lang alone."""
    from squirreldb_spark.pipeline import text as ptext

    df = ptext.packing_efficiency(model.load_table(spark, sf_dir, "documents"))
    plan = df._jdf.queryExecution().analyzed().toString()
    specs = [ln for ln in plan.splitlines()
             if "windowspecdefinition" in ln and "running_in_shard" in ln]
    assert specs and all("shard" in ln for ln in specs), specs[:2]


def test_lang_confusion_totals_broadcast(spark, sf_dir):
    """The per-label totals join back broadcast; the score fold runs in
    the scan, so raw text never rides a shuffle."""
    from squirreldb_spark.pipeline import text as ptext

    df = ptext.lang_confusion(model.load_table(spark, sf_dir, "documents"))
    assert "SortMergeJoin" not in plan_of(df)
    for cols in shuffle_exchange_outputs(df):
        assert "text" not in [c for c, _ in cols], cols


def test_funnel_windowed_joins_stay_user_keyed(spark, sf_dir):
    """Same contract as the unwindowed funnel: every per-stage join keys
    user_id (no theta shape from the window predicate — it's a filter,
    not a join condition that degrades the join to nested-loop)."""
    from squirreldb_spark.pipeline import events as pevents

    df = pevents.funnel_windowed(model.load_table(spark, sf_dir, "events"))
    assert_no_theta_joins(plan_of(df), "ev_funnel_windowed")


# ------------------------------------------------- round-11 operators


def test_repetition_profile_text_stays_in_scan(spark, sf_dir):
    """The n-gram arrays and per-doc dup fractions fold into the scan;
    the only exchange is the source-cardinality rollup — raw text (and
    any array) never rides a shuffle."""
    from squirreldb_spark.pipeline import text as ptext

    df = ptext.repetition_profile(model.load_table(spark, sf_dir, "documents"))
    for cols in shuffle_exchange_outputs(df):
        names = [c for c, _ in cols]
        assert "text" not in names, cols
        assert not [t for _, t in cols if t.startswith("array")], cols


def test_tokenizer_fertility_long_partials_only(spark, sf_dir):
    """Zero-width scan fold: the lang rollup's exchange carries only
    long count partials, never text."""
    from squirreldb_spark.pipeline import text as ptext

    df = ptext.tokenizer_fertility(model.load_table(spark, sf_dir, "documents"))
    for cols in shuffle_exchange_outputs(df):
        assert "text" not in [c for c, _ in cols], cols


def test_minhash_containment_no_theta_joins(spark, sf_dir):
    """Candidates come from the banded equi-join; signature and text
    join-backs are id-keyed equi-joins — never a cartesian shape."""
    from squirreldb_spark.pipeline import dedup as pdedup

    df = pdedup.minhash_containment(model.load_table(spark, sf_dir, "documents"))
    assert_no_theta_joins(plan_of(df), "doc_minhash_containment")


def test_centroid_drift_no_vector_crosses_shuffle(spark, sf_dir):
    """The (label, dim) moment aggregate is map-side combinable: only
    narrow partial rows cross the exchange, never a vector."""
    from squirreldb_spark.pipeline import similarity as psim

    emb = model.load_table(spark, sf_dir, "embeddings")
    assert_no_vector_crosses_shuffle(psim.centroid_drift(emb), "emb_centroid_drift")


def test_powerlaw_fit_histogram_collapse(spark, sf_dir):
    """The log-sum runs over the (type, count-level) HISTOGRAM, so no
    window exists at all and every exchange is combinable; props/text
    never ride a shuffle."""
    from squirreldb_spark.pipeline import events as pevents

    df = pevents.powerlaw_fit(model.load_table(spark, sf_dir, "events"))
    plan = plan_of(df)
    assert "Window" not in plan, plan[:1200]
    assert_no_theta_joins(plan, "ev_powerlaw_fit")


def test_survival_curve_bounded_windows_and_broadcast_scalar(spark, sf_dir):
    """The only windows run over the bounded day-bucket table (global
    orderBy day — a table of distinct duration days, not events); the
    stream-end scalar is an unconditioned broadcast cross; user-keyed
    join is a hash equi-join."""
    from squirreldb_spark.pipeline import events as pevents

    df = pevents.survival_curve(model.load_table(spark, sf_dir, "events"))
    plan = plan_of(df)
    assert_no_theta_joins(plan, "ev_survival_curve")
    for line in plan.splitlines():
        if "windowspecdefinition" in line and "lag(" not in line:
            assert "day" in line, line.strip()[:200]


def test_transition_entropy_types_squared_rollup(spark, sf_dir):
    """Inherits markov_transitions' user-window exchange; the entropy
    fold and the modal ranking run over the <= types^2 matrix; props
    never ride a shuffle."""
    from squirreldb_spark.pipeline import events as pevents

    df = pevents.transition_entropy(model.load_table(spark, sf_dir, "events"))
    assert_no_theta_joins(plan_of(df), "ev_transition_entropy")
    for cols in shuffle_exchange_outputs(df):
        assert "props" not in [c for c, _ in cols], cols


def test_split_leakage_no_theta_joins(spark, sf_dir):
    """Candidates from the banded equi-join; jaccard and split labels
    join back id-keyed; the 6-cell rollup crosses only a broadcast
    1-row total."""
    from squirreldb_spark.pipeline import dedup as pdedup

    df = pdedup.split_leakage_check(model.load_table(spark, sf_dir, "documents"))
    assert_no_theta_joins(plan_of(df), "doc_split_leakage_rate")


def test_ab_test_single_user_reduction(spark, sf_dir):
    """One user-keyed combinable reduction, a 2-row rollup and a 1-row
    broadcast cross — no window, no theta join, no props in a shuffle."""
    from squirreldb_spark.pipeline import events as pevents

    df = pevents.ab_test(model.load_table(spark, sf_dir, "events"))
    plan = plan_of(df)
    assert "Window" not in plan, plan[:1200]
    assert_no_theta_joins(plan, "ev_ab_test")


def test_cohort_ltv_window_over_cohort_matrix(spark, sf_dir):
    """The cumulative window runs over the weeks-by-weeks cohort matrix
    (ordered by week_offset), never over raw events; revenue crosses
    shuffles only as DECIMAL(18,2) partials."""
    from squirreldb_spark.pipeline import events as pevents

    df = pevents.cohort_ltv(model.load_table(spark, sf_dir, "events"))
    plan = plan_of(df)
    assert_no_theta_joins(plan, "ev_cohort_ltv")
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "week_offset" in line, line.strip()[:200]


def test_pagerank_iterations_are_hash_joins_no_text(spark, sf_dir):
    """Each power iteration is a src-keyed hash equi-join + a combinable
    dst aggregate over the checkpointed transition table — no theta
    join, and document text never crosses a shuffle (the LSH edge
    construction materializes before the loop)."""
    from squirreldb_spark.pipeline import dedup as pdedup

    df = pdedup.doc_pagerank(model.load_table(spark, sf_dir, "documents"))
    plan = plan_of(df)
    assert_no_theta_joins(plan, "doc_pagerank")
    for cols in shuffle_exchange_outputs(df):
        assert "text" not in [c for c, _ in cols], cols


def test_cusum_changepoint_windows_only_over_day_buckets(spark, sf_dir):
    """The (type, day) rollup is the only corpus-sized exchange; both
    windows (cumulative sum, argmax rank) partition by event_type over
    the bucket table; no theta joins."""
    from squirreldb_spark.pipeline import events as pevents

    df = pevents.cusum_changepoint(model.load_table(spark, sf_dir, "events"))
    plan = plan_of(df)
    assert_no_theta_joins(plan, "ev_cusum_changepoint")
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "event_type" in line, line.strip()[:200]
    for cols in shuffle_exchange_outputs(df):
        names = [c for c, _ in cols]
        assert "props" not in names and "value" not in names, names


def test_benford_single_combinable_rollup(spark, sf_dir):
    """The digit extraction is a scalar projection inside the scan; the
    (type, digit) rollup is combinable (partial_count before exchange)
    and bounds the chi-square stage at <= 9 x |types| rows."""
    from squirreldb_spark.pipeline import events as pevents

    df = pevents.benford_deviation(model.load_table(spark, sf_dir, "events"))
    plan = plan_of(df)
    assert_no_theta_joins(plan, "ev_benford")
    assert "partial_count" in plan
    for cols in shuffle_exchange_outputs(df):
        names = [c for c, _ in cols]
        assert "props" not in names and "value" not in names, names


def test_lag_autocorr_equijoin_on_bucket_grid(spark, sf_dir):
    """The per-lag pairing is an equi-join of the day-bucket table
    against its lag-exploded twin — never a theta/range join — and no
    window exists at all."""
    from squirreldb_spark.pipeline import events as pevents

    df = pevents.lag_autocorr(model.load_table(spark, sf_dir, "events"))
    plan = plan_of(df)
    assert_no_theta_joins(plan, "ev_lag_autocorr")
    assert "Window" not in plan.replace("windowspecdefinition", "")
    for cols in shuffle_exchange_outputs(df):
        names = [c for c, _ in cols]
        assert "props" not in names and "value" not in names, names


def test_hubness_closing_moments_are_register_width(spark, sf_dir):
    """The k-NN graph reuses the attested LSH bucket equi-join; after
    the in-degree rollup no exchange carries a vector — the outermost
    (final moment) exchange is register-width only."""
    from squirreldb_spark.pipeline import similarity as psim

    emb = model.load_table(spark, sf_dir, "embeddings")
    df = psim.hubness(emb)
    plan = plan_of(df)
    assert_no_theta_joins(plan, "emb_hubness")
    outs = shuffle_exchange_outputs(df)
    assert outs, "expected at least the closing aggregation exchange"
    assert all("array" not in t for _, t in outs[0]), outs[0]


def test_intrinsic_dim_broadcasts_query_block(spark, sf_dir):
    """The fixed query budget broadcasts against one corpus scan (the
    attested brute-kNN shape); the closing MLE exchange carries only
    DECIMAL/long partials."""
    from squirreldb_spark.pipeline import similarity as psim

    emb = model.load_table(spark, sf_dir, "embeddings")
    df = psim.intrinsic_dim(emb)
    plan = plan_of(df)
    assert "BroadcastExchange" in plan
    outs = shuffle_exchange_outputs(df)
    assert outs and all("array" not in t for _, t in outs[0]), outs[0]


def test_dedup_threshold_sweep_explodes_pairs_not_corpus(spark, sf_dir):
    """The sweep reuses the attested LSH chain; the threshold explode
    rides the PAIR table, the corpus total is an unconditioned
    broadcast scalar, and document text never crosses a shuffle."""
    from squirreldb_spark.pipeline import dedup as pdedup

    df = pdedup.dedup_threshold_sweep(model.load_table(spark, sf_dir, "documents"))
    plan = plan_of(df)
    assert_no_theta_joins(plan, "doc_dedup_threshold_sweep")
    for cols in shuffle_exchange_outputs(df):
        assert "text" not in [c for c, _ in cols], cols


def test_lexical_diversity_wordcount_is_only_corpus_exchange(spark, sf_dir):
    """One combinable (source, word) exchange; the per-source moment
    collapse carries DECIMAL partials only; text never shuffles."""
    from squirreldb_spark.pipeline import text as ptext

    df = ptext.lexical_diversity(model.load_table(spark, sf_dir, "documents"))
    plan = plan_of(df)
    assert_no_theta_joins(plan, "doc_lexical_diversity")
    assert "partial_count" in plan
    for cols in shuffle_exchange_outputs(df):
        assert "text" not in [c for c, _ in cols], cols


def test_kmeans_elbow_single_corpus_scan(spark, sf_dir):
    """All |ks| assignment folds are projections inside ONE corpus
    scan: exactly one parquet scan of embeddings in the evaluation
    plan, no join, no per-k rescan."""
    from squirreldb_spark.pipeline import similarity as psim

    emb = model.load_table(spark, sf_dir, "embeddings")
    df = psim.kmeans_elbow(emb)
    plan = plan_of(df)
    assert plan.count("Scan parquet") == 1, plan[:1500]
    assert "Join" not in plan, plan[:1500]


def test_term_burstiness_no_vocabulary_sort(spark, sf_dir):
    """The top-k is a TakeOrdered over the per-term rollup — no global
    Sort of the vocabulary; text never crosses a shuffle."""
    from squirreldb_spark.pipeline import text as ptext

    df = ptext.term_burstiness(model.load_table(spark, sf_dir, "documents"))
    plan = plan_of(df)
    assert "TakeOrdered" in plan, plan[:1200]
    for cols in shuffle_exchange_outputs(df):
        assert "text" not in [c for c, _ in cols], cols


def test_keyframe_select_doc_keyed_equijoins_only(spark, sf_dir):
    """Each greedy step is a doc-keyed hash equi-join against the
    bounded per-video frame set — no cross join, no payload bytes in
    any exchange."""
    from squirreldb_spark.pipeline import multimodal as pmm

    docs = model.load_table(spark, sf_dir, "documents")
    df = pmm.keyframe_select(pmm.as_binary_table(docs))
    plan = plan_of(df)
    assert_no_theta_joins(plan, "mm_keyframe_select")
    for cols in shuffle_exchange_outputs(df):
        names = [c for c, _ in cols]
        assert "payload" not in names and "text" not in names, names


def test_isotropy_no_pair_join_no_vector_exchange(spark, sf_dir):
    """The O(n²) pair sum is the sum-vector identity: the plan has NO
    join at all, and no exchange carries an array — only the per-dim
    DECIMAL partials move."""
    from squirreldb_spark.pipeline import similarity as psim

    emb = model.load_table(spark, sf_dir, "embeddings")
    df = psim.isotropy(emb)
    plan = plan_of(df)
    assert "Join" not in plan, "isotropy must not join/pair vectors"
    outs = shuffle_exchange_outputs(df)
    assert outs and all(
        "array" not in t for out in outs for _, t in out
    ), outs


def test_knn_purity_bucket_equijoin_only(spark, sf_dir):
    """The kNN graph reuses the attested hyperplane-LSH bucket
    equi-join (never all-pairs); the closing label rollup is
    register-width."""
    from squirreldb_spark.pipeline import similarity as psim

    emb = model.load_table(spark, sf_dir, "embeddings")
    df = psim.knn_label_purity(emb)
    plan = plan_of(df)
    assert_no_theta_joins(plan, "emb_knn_purity")
    outs = shuffle_exchange_outputs(df)
    assert outs and all("array" not in t for _, t in outs[0]), outs[0]


def test_topk_drift_two_phase_window(spark, sf_dir):
    """Per-week top-k runs on the shared two-phase kernel: the shard
    prefilter window keys on (week, _shard) so no task sorts a whole
    week's user set; the drift join is an equi-join."""
    from squirreldb_spark.pipeline import events as pevents

    ev = model.load_table(spark, sf_dir, "events")
    df = pevents.topk_drift(ev)
    plan = plan_of(df)
    assert_no_theta_joins(plan, "ev_topk_drift")
    assert "_shard" in plan, "two-phase shard prefilter missing"


def test_value_psi_histogram_reductions_only(spark, sf_dir):
    """Both PSI inputs are integer histograms (map-side combinable
    partial_count before the exchange); nothing corpus-sized is
    joined — the grid join keys on event_type/bin-cardinality
    tables."""
    from squirreldb_spark.pipeline import events as pevents

    ev = model.load_table(spark, sf_dir, "events")
    df = pevents.value_psi(ev)
    plan = plan_of(df)
    assert_no_theta_joins(plan, "ev_value_psi")
    assert "partial_count" in plan, "histogram must combine map-side"


def test_detector_agreement_no_text_in_exchanges(spark, sf_dir):
    """All three detectors exchange fingerprints (hashes, signature
    longs, band hashes) — the document text itself never crosses a
    shuffle."""
    from squirreldb_spark.pipeline import dedup as pdedup

    docs = model.load_table(spark, sf_dir, "documents")
    df = pdedup.detector_agreement(docs)
    plan = plan_of(df)
    assert_no_theta_joins(plan, "doc_detector_agreement")
    for out in shuffle_exchange_outputs(df):
        assert all(n != "text" for n, _ in out), out


def test_label_confusion_pair_join_is_dim_sized(spark, sf_dir):
    """The pair join runs on the labels×dims table (post-reduction);
    no exchange carries an array and no theta join appears."""
    from squirreldb_spark.pipeline import similarity as psim

    emb = model.load_table(spark, sf_dir, "embeddings")
    df = psim.label_confusion(emb)
    plan = plan_of(df)
    assert_no_theta_joins(plan, "emb_label_confusion")
    outs = shuffle_exchange_outputs(df)
    assert outs and all(
        "array" not in t for out in outs for _, t in out
    ), outs


def test_sq_bits_sweep_broadcast_stats_no_vector_shuffle(spark, sf_dir):
    """Per bit-width: min/max stats broadcast back over an unshuffled
    scan (the scalar_quantize shape) and the query block broadcasts
    (the kNN shape) — vectors never cross a shuffle exchange."""
    from squirreldb_spark.pipeline import similarity as psim

    emb = model.load_table(spark, sf_dir, "embeddings")
    df = psim.sq_bits_sweep(emb, bits_list=(8, 2))
    plan = plan_of(df)
    assert "BroadcastExchange" in plan
    for out in shuffle_exchange_outputs(df):
        assert all("array" not in t for _, t in out), out


def test_type_mix_drift_bounded_grid(spark, sf_dir):
    """Both JS inputs are map-side-combined histograms; the only cross
    is the allowed unconditioned broadcast of bounded totals."""
    from squirreldb_spark.pipeline import events as pevents

    ev = model.load_table(spark, sf_dir, "events")
    df = pevents.type_mix_drift(ev)
    plan = plan_of(df)
    assert_no_theta_joins(plan, "ev_type_mix_drift")
    assert "partial_count" in plan


def test_quality_dup_lift_no_text_in_exchanges(spark, sf_dir):
    """Quality is a narrow map fused into the scan; only fingerprints
    and flags shuffle."""
    from squirreldb_spark.pipeline import dedup as pdedup

    docs = model.load_table(spark, sf_dir, "documents")
    df = pdedup.quality_dup_lift(docs)
    plan = plan_of(df)
    assert_no_theta_joins(plan, "doc_quality_dup_lift")
    for out in shuffle_exchange_outputs(df):
        assert all(n != "text" for n, _ in out), out


def test_knn_graph_join_salted_no_bucket_window(spark, sf_dir):
    """The graph ops' candidate cap must not reintroduce a bucket-keyed
    corpus exchange (the serializing window shape): the plan has no
    Window over `bucket`, the salt column is present in the join, and
    the bucket-count side arrives via broadcast."""
    from squirreldb_spark.pipeline import similarity as psim

    emb = model.load_table(spark, sf_dir, "embeddings")
    for df in (psim.hubness(emb), psim.knn_label_purity(emb)):
        plan = plan_of(df)
        assert "_salt" in plan, "salted graph join missing"
        assert "BroadcastExchange" in plan
        for line in plan.splitlines():
            if "Window" in line and "bucket" in line:
                raise AssertionError(
                    f"bucket-keyed window reintroduced: {line.strip()[:120]}"
                )
        outs = shuffle_exchange_outputs(df)
        for out in outs:
            assert all("array" not in t for _, t in out), out


def test_hybrid_rrf_broadcast_queries_both_rankers(spark, sf_dir):
    """Both rankers broadcast the query block against one corpus scan;
    the fusion runs on config-sized rank tables; raw text never
    crosses a shuffle (the lexical side ships token sets)."""
    from squirreldb_spark.pipeline import similarity as psim

    docs = model.load_table(spark, sf_dir, "documents")
    emb = model.load_table(spark, sf_dir, "embeddings")
    df = psim.hybrid_rrf(docs, emb)
    plan = plan_of(df)
    assert_no_theta_joins(plan, "doc_hybrid_rrf")
    assert "BroadcastExchange" in plan
    for out in shuffle_exchange_outputs(df):
        assert all(n != "text" for n, _ in out), out


def test_knn_reciprocity_keeps_graph_contract(spark, sf_dir):
    """The reciprocity op reuses the kNN-graph serving shape: salted
    bucket join, no bucket-keyed window, no vector below an Exchange;
    the mutual-edge probe adds only a fingerprint-pair equi-join."""
    from squirreldb_spark.pipeline import similarity as psim

    emb = model.load_table(spark, sf_dir, "embeddings")
    df = psim.knn_reciprocity(emb)
    plan = plan_of(df)
    assert "_salt" in plan, "salted graph join missing"
    assert_no_theta_joins(plan, "emb_knn_reciprocity")
    for line in plan.splitlines():
        if "Window" in line and "bucket" in line:
            raise AssertionError(f"bucket-keyed window: {line.strip()[:120]}")
    for out in shuffle_exchange_outputs(df):
        assert all("array" not in t for _, t in out), out


def test_ood_mahalanobis_stats_broadcast_scan(spark, sf_dir):
    """The per-(label, dim) stats table broadcasts back over the
    scoring scan (labels x dims rows — never a shuffle join of the
    corpus against itself), and no embedding array crosses a shuffle
    (the exploded (id, dim, x) form is scalar-width)."""
    from squirreldb_spark.pipeline import similarity as psim

    emb = model.load_table(spark, sf_dir, "embeddings")
    df = psim.ood_mahalanobis(emb)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert_no_theta_joins(plan, "emb_ood_mahalanobis")
    for out in shuffle_exchange_outputs(df):
        assert all("array" not in t for _, t in out), out


def test_top_pc_moment_scan_is_combinable(spark, sf_dir):
    """top_pc's only corpus-sized work is the dim-pair moment scan: the
    (i, j) rollup must partially aggregate map-side (the exchange
    carries dim^2 combiner rows of scalars, never raw vectors), and
    the corpus never shuffles."""
    from squirreldb_spark.pipeline import similarity as psim

    emb = model.load_table(spark, sf_dir, "embeddings")
    df = psim.top_pc(emb)
    plan = plan_of(df)
    assert_no_theta_joins(plan, "emb_top_pc")
    vector_exchanges = 0
    for out in shuffle_exchange_outputs(df):
        names = [n for n, _ in out]
        if any("array" in t for _, t in out):
            # the ONE allowed vector exchange: the conditional
            # read-parallelism normalization (input-sized roundrobin of
            # the raw vectors when the scan has fewer partitions than
            # cores; never taken on a real corpus scan)
            vector_exchanges += 1
            assert names == ["xq"], out
            continue
        # every other shuffle is a bounded aggregate table: (i, j)
        # moment partials or the 64-row iteration folds
        assert any(n in ("i", "j") or n.startswith(("_", "sum", "count"))
                   for n in names), out
    assert vector_exchanges <= 1, "more than one vector exchange"


def test_effective_rank_single_moment_scan(spark, sf_dir):
    """effective_rank shares top_pc's one corpus pass: every shuffle
    carries (i, j) scalar moment partials (plus the one allowed
    conditional read-parallelism vector exchange) — the corpus never
    shuffles and there is NO iteration after the fold."""
    from squirreldb_spark.pipeline import similarity as psim

    emb = model.load_table(spark, sf_dir, "embeddings")
    df = psim.effective_rank(emb)
    plan = plan_of(df)
    assert_no_theta_joins(plan, "emb_effective_rank")
    vector_exchanges = 0
    for out in shuffle_exchange_outputs(df):
        names = [n for n, _ in out]
        if any("array" in t for _, t in out):
            vector_exchanges += 1
            assert names == ["xq"], out
            continue
        assert any(n in ("i", "j") or n.startswith(("_", "sum", "count"))
                   for n in names), out
    assert vector_exchanges <= 1, "more than one vector exchange"


def test_oph_no_text_or_shingles_in_exchanges(spark, sf_dir):
    """OPH: shingle strings fold to h32 IN THE SCAN; every shuffle
    carries (doc_id, bin/min) longs, band hashes, or signature longs —
    never text or shingle strings."""
    from squirreldb_spark.pipeline import dedup as pdedup

    docs = model.load_table(spark, sf_dir, "documents")
    df = pdedup.oph_neardup_pairs(docs)
    plan = plan_of(df)
    assert_no_theta_joins(plan, "doc_oph_minhash")
    for out in shuffle_exchange_outputs(df):
        assert all(n not in ("text", "sh") for n, _ in out), out


def test_phash_dct_jvm_hot_path(spark, sf_dir):
    """The DCT is pure column expressions: the only Python stage is the
    Arrow-batched decode stub (MapInPandas / ArrowEvalPython), never a
    row-at-a-time BatchEvalPython; the collision window exchanges the
    15-bit hash, not pixels."""
    from squirreldb_spark.pipeline import multimodal as pmm

    docs = model.load_table(spark, sf_dir, "documents")
    df = pmm.dct_phash(pmm.as_binary_table(docs))
    plan = plan_of(df)
    assert "BatchEvalPython" not in plan, "row-at-a-time Python in plan"
    assert_no_theta_joins(plan, "mm_phash_dct")
    for out in shuffle_exchange_outputs(df):
        assert all(n not in ("px", "pixels", "payload") for n, _ in out), out


@pytest.mark.parametrize("name", ["ev_power_mde", "ev_diff_in_diff"])
def test_experiment_folds_user_keyed_only(spark, sf_dir, name):
    """power_mde / diff_in_diff: every shuffle is the user-keyed DECIMAL
    reduction or the 2-row variant fold — values quantized, no raw
    event payload (props/event_id) crosses the wire."""
    df = CATALOG[name].fn(spark, sf_dir)
    plan = plan_of(df)
    assert_no_theta_joins(plan, name)
    for out in shuffle_exchange_outputs(df):
        assert all(n not in ("props", "event_id") for n, _ in out), out
