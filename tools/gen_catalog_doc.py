#!/usr/bin/env python
"""Generate docs/CATALOG.md from the live operator catalog.

One row per catalog entry: name, family, the first docstring sentence of
its query function. Regenerate with `python tools/gen_catalog_doc.py`
whenever entries are added; tests/test_pipeline.py asserts the doc lists
every catalog key so it cannot drift silently.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAMILIES = [
    ("ts_", "TSDB / PromQL semantics"),
    ("promql_", "PromQL string path (parser -> planner)"),
    ("api_", "Prometheus /api/v1 surface"),
    ("tpch_", "Relational (TPC-H)"),
    ("doc_", "Documents: dedup / text analysis / curation"),
    ("emb_", "Embeddings: similarity search / quantization / QC"),
    ("ev_", "Event analytics"),
    ("mm_", "Multimodal (binary payload) plumbing"),
]



#: curated one-liners for entries whose query fn is a shared factory
#: closure or a thin named wrapper without a docstring
DESCRIPTIONS = {
    "ts_resets": "PromQL resets(): counter-reset count per range window (NaN-safe).",
    "ts_changes": "PromQL changes(): value-change count per range window (NaN-safe).",
    "ts_sum_over_time": "PromQL sum_over_time over the bucketed range-selector join.",
    "ts_min_over_time": "PromQL min_over_time over the bucketed range-selector join.",
    "ts_max_over_time": "PromQL max_over_time over the bucketed range-selector join.",
    "ts_present_over_time": "PromQL present_over_time (1 when any sample in window).",
    "ts_stdvar_over_time": "PromQL stdvar_over_time (population variance per window).",
    "ts_count_over_time": "PromQL count_over_time (sample count per window).",
    "ts_last_over_time": "PromQL last_over_time (newest sample per window).",
    "ts_stddev_over_time": "PromQL stddev_over_time (population stddev per window).",
    "ts_of_max_over_time": "ts_of_max_over_time: timestamp of the window maximum (max_by struct tie-break).",
    "ts_of_min_over_time": "ts_of_min_over_time: timestamp of the window minimum.",
    "ts_of_last_over_time": "ts_of_last_over_time: timestamp of the newest sample per window.",
    "ts_quantile_over_time": "PromQL quantile_over_time with upstream-exact interpolation (collected-array quantile, not percentile_approx).",
    "ts_avg_over_time": "PromQL avg_over_time over the bucketed range-selector join.",
    "ts_downsample_5m": "A13: 5-minute min/max/avg/count pre-aggregation job.",
    "ts_instant_selector": "Instant vector selector with 5m lookback + staleness-marker semantics (one window pass per series).",
    "ts_rate": "PromQL rate(): upstream extrapolatedRate math with counter-reset correction and boundary clamps.",
    "ts_increase": "PromQL increase(): extrapolated counter delta per window.",
    "ts_delta": "PromQL delta(): extrapolated gauge difference per window.",
    "ts_irate": "PromQL irate(): last-two-samples instantaneous rate (ts, then insert-order tie-break).",
    "ts_idelta": "PromQL idelta(): last-two-samples difference.",
    "ts_agg_sum_by": "PromQL sum by(label) grouped aggregation.",
    "ts_agg_stddev_by": "PromQL stddev by(label) (population) grouped aggregation.",
    "ts_agg_quantile_by": "PromQL quantile by(label) with upstream quantile.go semantics (exact).",
    "ts_topk": "PromQL topk(): two-phase sharded per-step top-k (no global sort).",
    "ts_count_values": "PromQL count_values(): series count per distinct sample value.",
    "ts_binop_ratio": "Vector / vector arithmetic with on(...) label matching (Go division semantics).",
    "ts_binop_gt_filter": "Vector > vector comparison filter (drops non-matching samples).",
    "ts_set_and": "PromQL and: intersection on matching label signatures.",
    "ts_set_unless": "PromQL unless: left side minus signature matches.",
    "ts_set_or": "PromQL or: union with left-side precedence per signature.",
    "ts_retention": "A37 TTL retention sweep incl. per-write TTL column.",
    "ts_series_interning": "A4 series interning: 60-bit content-hash IDs, map-side, lock-free.",
    "ts_label_values": "A22 LabelValues: distinct values of one label across the corpus.",
    "ts_deriv": "PromQL deriv(): per-window least-squares slope (upstream intercept-time centering).",
    "ts_predict_linear": "PromQL predict_linear(): least-squares extrapolation t seconds ahead.",
    "ts_date_functions": "PromQL date functions (minute/hour/day_of_week/... of sample timestamps).",
    "ts_label_replace": "PromQL label_replace(): regex capture-group label rewrite.",
    "ts_label_join": "PromQL label_join(): concatenate source labels into a destination label.",
    "tpch_q1_pricing_summary": "TPC-H Q1 pricing summary report (grouped lineitem aggregates).",
    "tpch_q3_shipping_priority": "TPC-H Q3 shipping priority (3-way join + top-k by revenue).",
    "tpch_q5_local_supplier": "TPC-H Q5 local supplier volume (6-way join, region-pruned).",
    "doc_text_stats": "Per-document length/token/lexical-diversity statistics (narrow map).",
    "doc_lang_id": "Character-n-gram language-ID heuristic scored per document.",
    "doc_fingerprint": "Rolling-hash document fingerprint (zero-shuffle scan).",
    "doc_exact_dedup": "Exact dedup groups: content hash -> representative + duplicate count.",
    "doc_ngram_jaccard": "Exact word-n-gram Jaccard on LSH candidate pairs (in-row array HOFs).",
    "doc_minhash_signatures": "MinHash signatures: K permutation minima in ONE shuffle (one md5 per shingle + K linear permutations).",
    "doc_minhash_lsh_pairs": "Banded-LSH candidate pairs with the hot-bucket cap (shared-key window).",
    "doc_simhash": "SimHash fingerprints: 60 bit-sums folded in an Arrow-batched pandas pass (zero shuffle).",
    "emb_cosine_knn": "Brute-force cosine top-k (JVM-side dot products, broadcast query set).",
    "emb_ann_lsh": "Hyperplane-LSH bucketed ANN (literal plane folds in the scan).",
    "emb_neardup_pairs": "Multi-table LSH near-duplicate pairs above a cosine threshold (hot-bucket cap).",
    "mm_extract_features": "Binary-payload feature extraction via Arrow mapInPandas (decode stubbed, plumbing real).",
    "mm_resize_images": "Image resize plumbing over binary payloads (Arrow batches; decode stubbed).",
    "mm_sample_frames": "Deterministic frame sampling from video payloads (Arrow batches; decode stubbed).",
}


def first_sentence(doc):
    if not doc:
        return ""
    text = " ".join(doc.split())
    i = text.find(". ")
    if i > 0:
        return text[: i + 1]
    return text


def main() -> None:
    from squirreldb_spark.queries import CATALOG

    lines = [
        "# Operator catalog",
        "",
        "Generated by `tools/gen_catalog_doc.py` — do not edit by hand.",
        f"{len(CATALOG)} entries; every one is verified against an",
        "independent DuckDB oracle (row count + schema + value hash) at",
        "sf0.001 (pytest) and sf0.01 (driver gate).",
        "",
    ]
    for prefix, title in FAMILIES:
        names = [n for n in CATALOG if n.startswith(prefix)]
        if not names:
            continue
        lines += [f"## {title} ({len(names)})", "",
                  "| entry | what it computes |", "|---|---|"]
        for n in sorted(names):
            desc = first_sentence(CATALOG[n].fn.__doc__) or DESCRIPTIONS.get(n, "")
            desc = desc.replace("|", "\\|")
            lines.append(f"| `{n}` | {desc or '—'} |")
        lines.append("")
    other = [n for n in CATALOG if not any(n.startswith(p) for p, _ in FAMILIES)]
    assert not other, f"unclassified entries: {other}"
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "docs", "CATALOG.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {out}: {len(CATALOG)} entries")


if __name__ == "__main__":
    main()
