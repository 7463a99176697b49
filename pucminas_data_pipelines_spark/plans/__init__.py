"""Query catalog: importing this package registers every named query into
plans.registry.QUERIES / ORACLES (driver contract).

Registration order is CURATED: the driver's correctness run scores the
first 50 registry entries, so the window below carries one representative,
oracle-checked query per SURVEY.md §2 operator/category (reference O-ops,
every extended relational category, every LLM-data component) — the
hard-evidence set. Everything past slot 50 is additional depth within
already-covered categories, verified by tests/test_oracle_parity.py over
the FULL registry at sf0.01.
"""

from pucminas_data_pipelines_spark.plans import (  # noqa: F401
    aggregates,
    curation,
    events,
    features,
    graph,  # noqa: F401  (registers graph_pagerank/_triangle queries)
    llm,
    multimodal,
    mutation,
    pii,
    relational,
    sampling,
    scalars,
    setops,
    sources,
    stats,
    streaming_live,
    tpch,
    udfs,
    windows,
)
from pucminas_data_pipelines_spark.plans.registry import ORACLES, QUERIES

# ROUND-6 ROTATION (VERDICT r05 "Next round #1"): window = 5 r5-green
# canaries + 45 first-evidence slots. Priorities this round:
#   - the 11 queries rewritten onto operators/ordered.py's two-pass
#     range-partitioned prefix-sum/rank (the r5 "scale-debt" set: peak
#     concurrency, id-gap, equi-depth, KS drift, Gini, Pareto, RFM,
#     both WebDataset shard queries, Heaps curve, zipf's TakeOrdered
#     rank) — driver rows prove the rewrites, not just parity;
#   - the 2 oracle-semantics fixes (conversion-lag, velocity rule:
#     truncated-second pinning) and the 3 operator fixes (k-core
#     unforced broadcast, LPA directed-sink carry-forward, sample-bound
#     LSH S-curve calibration);
#   - then breadth per the r5 plan: text 4, joins/filters/sql 10,
#     aggregates 4, udf/udtf 3, graph triangle, mutation cdc/scd2,
#     pii 1, the 4 sources deferred from r5.
# Cumulative driver-green before this round: 164/343; a 50/50 window
# lands 209/343, leaving 134 (132 scorable + the 2 rows-only ann_*).
# ROLL-FORWARD PLAN (exact family counts, recomputed from the five
# CORRECTNESS files + this window):
#   r7 (45): stats 28 (correlation_matrix, value_histogram,
#     table_profile, iqr, observed_gate, user_anomaly_zscore, MI, chi2,
#     MAD, PSI, countmin, KMV x2, benford, autocorr, seasonality,
#     bloom, winsorized, ab_ztest, welch, crosstab, runs_test,
#     markov_entropy, ddsketch, cusum, poisson_bootstrap, multifeature
#     OLS, ab_power) + quality 5 (dim_coverage, referential_integrity,
#     temporal_consistency, source_reconciliation, expectation_suite)
#     + window 5 (cumulative_distinct, activity_streaks,
#     first_last_ignore_nulls, rolling_trend_slope, rolling_median)
#     + agg 7 (linear_regression, argminmax, boolean, bitmap_distinct,
#     grouping_id, accumulating_snapshot, variance_manual);
#   r8 (45): events 12 + dedup 7 (clusters, keep_best, containment,
#     span_redaction, prefix_filter, CDC chunks, survivorship)
#     + embedding 4 + text 6 + explode 4 + scalar 6 + sql 3 + graph 3
#     (connected_components, assortativity, jaccard_link_prediction);
#   r9 (42): join 7 + source 4 + sink 2 + mutation 3 + multimodal 3
#     + curation 6 + streaming 3 (watermark late-drop + both state
#     readers) + pii 2 + url 2 + feature 2 + project 2 + corpus card,
#     agg_percentile_interpolated, contrastive pairs, grouped kfold,
#     udf_python_rowwise, udtf_table_argument_stats.
#     NOTE for the r9 rotation: 42 first-evidence names + the 5 standing
#     canaries = 47; the window contract requires exactly 50, so pad
#     with 3 additional prior-green names (extra canaries) — after r9
#     every oracled query has a driver-green row (341 scorable; the 2
#     rows-only ann_*_topk stay out of windows by design).
# Each window keeps >=5 prior-round-green canaries on top (the contract
# test enforces it), so full coverage lands end of r9.
# PRE-CLEAR STATUS (r7): both the r8 and r9 sets above were run through
# the vanilla-session preflight compare (PREFLIGHT_NAMES=... — the exact
# driver seam) at sf0.01 in round 7: r8 45/45, r9 42/42. Round 8 rotated
# the r8 set in (window below) and re-ran the full-window preflight after
# rotation (late-r7 as-of/ordered/SCD2/LPA rewrites postdate some r7
# receipts); the r9 set was re-pre-cleared the same way this round.
#
# ROUND-5 ROTATION (VERDICT r04 "Next round #1"): the driver scores only
# the first 50 registry entries, so driver-green coverage accumulates by
# rotating a DIFFERENT representative set each round. Rounds 3+4 windows
# (50/50 and 47/50 green — CORRECTNESS_r03/_r04.json) are hard evidence;
# cumulative driver-green is 119/217. Round 5's window carries:
#   - the 3 r4 red rows, FIXED this round, re-slotted for hard evidence:
#     q12 (oracle SUMs now CAST AS BIGINT — DuckDB HUGEINT broke the
#     driver's dtype-sensitive hash) and the two scalar construction
#     suites (array outputs now to_json-serialized on both engines — the
#     driver's pandas canonicalizer cannot hash raw arrays)
#   - the 3 round-4 ★ LLM operators that were pytest-only: exact-substring
#     span dedup (Lee et al. 2022), incremental-ingestion dedup, IVF-PQ
#     ANN recall — plus curation_span_coverage_gate
#   - the round-5 family plan: remaining events (4), all streaming_live
#     (8), remaining curation (8), sampling/splits (6), set ops & sorts
#     (5), sources/sinks (7 of the remaining 11)
#   - 5 regression canaries green in CORRECTNESS_r04 (flagship scan,
#     MinHash LSH, as-of join, MERGE upsert, session window).
# Rotated-out names remain fully pinned by tests/test_oracle_parity.py
# (parametrized over ALL oracles at sf0.01).
#
# ROTATION PLAN for round 6 (keep ~5 canaries; never put the two
# rows-only ann_*_topk entries in the window): text analysis (9) +
# stats/quality (18) + multimodal (2) + joins/filters not yet green (12) +
# aggregates not yet green (5) + udf/udtf (3) + graph_triangle_count +
# mutation cdc/scd2 + pii/url (3) + the 4 sources deferred from r5
# (csv_semicolon, range_sorted, zorder, python_datasource) + llm misc
# (text_lm_quality_score, embedding_label_centroids). The late-r5 build
# added a further ~20 (registry -> 338): LPA communities, k-core,
# Jaccard link prediction, Lloyd k-means, DDSketch, CUSUM, Poisson
# bootstrap, multi-feature OLS, CEP V-pattern, sliding distinct, rolling
# median, bigram-LM perplexity, feature scaler + LOO target encoding,
# spatial grid join, expectation suite, Pareto crossing, conversion
# lags — all queue for the r6/r7 windows with the rest.
# ~51 remained after
# the r5 window was pinned; round 5 then added ~95 NEW queries (registry
# 217 -> 312: the sketch family CMS/KMV/KMV-intersect/Bloom; DPP +
# dynamic-partition overwrite + snapshot expiry + SCD2 as-of; the
# analytics sweep OHLC/Benford/Gini/autocorr/weighted-median/winsorized/
# seasonality/runs-test/Welch/A-B z/heatmap/streaks/journeys/RFM/peak-
# concurrency/outage/DAU-MAU/attribution/affinity/decay; the text/LLM
# sweep BPE-pairs/char-diversity/zipf/Heaps/PMI/fertility/OOV/
# readability/code-detection/chat-validation/CDC-chunking/seq-len/
# epoch-plan/temperature-mixture/dataset-card; prefix-filter join +
# S-curve calibration; matryoshka + contrastive + norm-gate embeddings;
# Luhn + k-anonymity; recursive CTE, GROUP BY ALL, collation, try_*,
# higher-order, grouping_id, ignore-nulls windows, iterator UDF, IPv4,
# crosstab, join hints; CSV-multiline/codec/python-writer sinks; shard
# layout + byte-range roundtrip + aspect buckets; assortativity +
# entropy-rate; watermark late-drop + reconciliation). All queue behind
# the r5 window — round 6 takes the 50 highest-leverage of the combined
# pool and the remainder rolls forward; everything is pinned by the
# full-parity suite meanwhile.
# ROTATION PLAN for round 14: first-evidence queue =
# mutation_manifest_dv_delete_during_rebucket (generation-aware
# merge-on-read DELETE through a paused migration, registered late in
# r13 after the window froze — oracled and parity-pinned) plus any
# further late-r13 registrations; re-confirmation cohort
# continues oldest-first with the REMAINING 27 r5 names (alphabetical
# from q12... onward: sample_*, scalar_array_construction_suite,
# scalar_map_construction_suite, setop_distinct/except_all/intersect/
# union_by_name, sink_append_mode, sink_compacted_files,
# sort_multi_key_nulls, source_binary_files/json/orc/schema_evolution/
# text_lines, split_train_test, streaming_*_live r5 cohort), then the
# r6 cohort. Keep the 5 canaries; never the two rows-only ann_*_topk
# names.
# ROTATION PLAN for round 13: first-evidence queue =
# mutation_manifest_rebucket_shrink (metadata-only bucket shrink) and
# streaming_manifest_cdf_replay (full-history CDF snapshot
# reconstruction) — both registered late in r12 after the window froze,
# both oracled and parity-pinned; re-confirmation cohort continues
# oldest-first with the remaining r4 names (q8_market_share,
# q9_product_profit, scalar_array_suite, scalar_arrays_zip_inline,
# scalar_bitwise_suite, scalar_codec_suite, scalar_date_calendar_suite,
# ...alphabetical), then the r5 cohort. Keep the 5 canaries; never the
# two rows-only ann_*_topk names.
DRIVER_WINDOW: list[str] = [
    # ROUND-13 ROTATION (VERDICT r12 #1, pre-declared in r12): (a) the 5
    # standing canaries, (b) FIRST driver-window evidence for the two
    # late-r12 queries (mutation_manifest_rebucket_shrink,
    # streaming_manifest_cdf_replay — the only oracled names without a
    # green CORRECTNESS row in any round) plus round 13's new
    # mutation_manifest_rebucket_concurrent_merge (generation-aware
    # mutations during an in-flight rebucket, VERDICT r12 #2), and
    # (c) 42 re-confirmation picks strictly oldest-evidence-first from
    # the cumulative CORRECTNESS_r01..r12 union: ALL 24 names whose last
    # green row dates to r4, then the alphabetically-first 18 of the r5
    # cohort. Every rotated-out name stays pinned by
    # tests/test_oracle_parity.py at two scale factors. The whole window
    # is re-run through the vanilla-session preflight
    # (.claude/skills/verify/preflight.py) after this rotation.
    # canaries (driver-green every round since r4)
    "q1_pricing_summary",
    "dedup_minhash_lsh",
    "join_asof",
    "mutation_merge_upsert",
    "events_session_window",
    # round-13 first evidence
    "mutation_manifest_rebucket_shrink",
    "streaming_manifest_cdf_replay",
    "mutation_manifest_rebucket_concurrent_merge",
    # oldest-evidence re-confirmation: last green in r4 (all 24)
    "q8_market_share",
    "q9_product_profit",
    "scalar_array_suite",
    "scalar_arrays_zip_inline",
    "scalar_bitwise_suite",
    "scalar_codec_suite",
    "scalar_date_calendar_suite",
    "scalar_date_suite",
    "scalar_json_schema",
    "scalar_map_suite",
    "scalar_map_transform_suite",
    "scalar_math_suite",
    "scalar_null_handling",
    "scalar_regexp_suite",
    "scalar_string_extended_suite",
    "scalar_string_suite",
    "scalar_variant_shredding",
    "window_distribution_family",
    "window_lag_lead",
    "window_ntile",
    "window_running_sum",
    "window_sliding_frame",
    "window_time_range_frame",
    "window_topk_orders_per_customer",
    # oldest-evidence re-confirmation: last green in r5 (first 18,
    # alphabetical; the remaining 27 queue for r14)
    "agg_freq_items_superset",
    "ann_ivf_pq_recall",
    "curation_contamination_overlap",
    "curation_doc_chunking",
    "curation_domain_mixture",
    "curation_quality_rules",
    "curation_repetition_detection",
    "curation_sequence_packing",
    "curation_shard_assignment",
    "curation_span_coverage_gate",
    "curation_token_budget_fill",
    "dedup_incremental_batch",
    "dedup_substring_spans",
    "events_first_touch_attribution",
    "events_gap_fill_ffill",
    "events_session_window_dynamic_gap",
    "events_time_weighted_avg",
    "q12_priority_by_returnflag",
]


def _reorder() -> None:
    missing = [n for n in DRIVER_WINDOW if n not in QUERIES]
    if missing:
        raise RuntimeError(f"DRIVER_WINDOW names not registered: {missing}")
    ordered = {n: QUERIES[n] for n in DRIVER_WINDOW}
    ordered.update((n, fn) for n, fn in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)
    o_ordered = {n: ORACLES[n] for n in QUERIES if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(o_ordered)


_reorder()

__all__ = ["QUERIES", "ORACLES", "DRIVER_WINDOW"]
