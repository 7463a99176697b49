"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
compact JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...} — sized to fit the archiver's
~2000-char tail window whole (test_bench_contract pins the budget).
Per-query attribution detail (steal deltas, probes, slowest-10
breakdowns, full noise ratios, full sweep timings) is written to
BENCH_DETAIL.json next to this script.

Each query is fully executed (collect of the already-small result, or a
count for large results) so the timing covers scan→shuffle→agg, not just
plan construction. A warmup run of the first query absorbs JVM/codegen
startup so per-query numbers reflect steady-state throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pucminas_data_pipelines_spark.plans import QUERIES
from pucminas_data_pipelines_spark.session import get_spark

# Headline set: the flagship relational spine plus (as implemented) the
# heaviest LLM-data operators. FROZEN since round 1 — this is the only
# longitudinal perf signal across rounds, so additions must APPEND, never
# replace (BENCH_r{N} keys must be a superset of BENCH_r{N-1}).
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q18_large_orders",
    "q9_product_profit",
    "q21_sole_blamed_supplier",
    "text_bm25_rank",
    "dedup_exact",
    "dedup_minhash_lsh",
    "knn_cosine_topk",
    "ann_ivf_topk",
    "events_tumbling_window",
    "window_topk_orders_per_customer",
    # appended r5 (the frozen r1 list above never changes — append-only):
    # the full near-dup pipeline endpoint, pairs -> connected components
    "dedup_minhash_clusters",
    # appended r5: the Lee-et-al exact-substring span operator (the most
    # expensive real-world dedup pass) and the exact PPJoin-style
    # set-similarity join — both LLM-pipeline headliners
    "dedup_substring_spans",
    "dedup_prefix_filter_join",
    # appended r5 (second batch): the iterative-ML and graph headliners —
    # distributed Lloyd rounds with row-local assignment, and the wedge
    # join behind link prediction
    "embedding_kmeans_lloyd",
    "graph_jaccard_link_prediction",
    # appended r6: two of the queries rewritten onto the two-pass
    # range-partitioned ordered analytics (operators/ordered.py) — the
    # global prefix-sum (shard layout) and the global NTILE over the
    # largest fact table (equi-depth histogram); their timings prove the
    # two-pass rewrite costs flat vs the retired single-partition window
    "multimodal_webdataset_shard_layout",
    "stats_equidepth_histogram",
    # appended r7: the three-NTILE RFM rollup, now paying ONE boundary
    # sampling action for all three tiles (compute_boundaries) — pins the
    # shared-boundary two-pass NTILE cost longitudinally
    "events_rfm_segmentation",
    # appended r7: multi-source BFS over the part co-purchase graph,
    # rewritten to frontier-only (delta) relaxation with early exit —
    # pins the per-round join volume cut longitudinally
    "graph_hop_distance_histogram",
    # appended r10: the manifest-table headliners — 30-commit-shaped
    # time-range scan through footer-stat pruning (ingest + pruned read
    # end-to-end), and the incrementally-maintained rollup refreshed
    # from manifest-fast-path CDC (merge + diff + delta-apply) — pin the
    # commit-layer costs longitudinally
    "mutation_manifest_timerange_scan",
    "mutation_incremental_rollup",
    # appended r11: the Z-order compaction + 2-D pruned rectangle scan
    # (ingest + OPTIMIZE ZORDER + three stats-pruned probes end-to-end)
    # and the MIN/MAX incrementally-maintained rollup with its targeted
    # delete-the-maximum group rescan — pin the r11 commit-layer and
    # maintenance costs longitudinally
    "mutation_manifest_zorder_scan",
    "mutation_incremental_rollup_minmax",
]


# Steady-state calibration constant: min-of-3 of _calibrate() on a quiet
# host (this VM, local[32], warm JVM — measured r7). The calibration op is
# deliberately data-independent (fixed-size range + hash shuffle, no IO),
# so the ratio measured_sec / CALIBRATION_STEADY_SEC is a pure
# machine-contention probe: BENCH_r06 recorded a 1.62x "regression" that
# re-measurement on a quiet host showed was VM noise — this field lets a
# reader separate the two without re-running anything.
CALIBRATION_STEADY_SEC = 0.33
CALIBRATION_NOISY_RATIO = 1.5


def _steal_sec() -> float:
    """Cumulative hypervisor CPU-steal seconds for this VM (/proc/stat
    cpu line, field 9). Measured r8: the host steals multi-CPU-second
    bursts (4.3 s observed in one 10 s idle window) that land 10-30 s of
    wall-stall on whichever SINGLE query is running — invisible to the
    calibration probe, which is blind between its sampling instants.
    A per-query steal delta attributes such an outlier at read time."""
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8]) / os.sysconf("SC_CLK_TCK")
    except Exception:
        return 0.0


def _calibrate(spark) -> float:
    """Fixed CPU+shuffle probe (no data dependence): min-of-3 of a 20M-row
    range -> mod-97 hash aggregate. Returns seconds."""
    from pyspark.sql import functions as F

    attempts = []
    for _ in range(3):
        start = time.perf_counter()
        (
            spark.range(0, 20_000_000, 1, 32)
            .select((F.col("id") % 97).alias("k"))
            .groupBy("k")
            .count()
            .collect()
        )
        attempts.append(time.perf_counter() - start)
    return min(attempts)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
        # local-mode default heap (1g) cannot hold the storage blocks that
        # accumulate across a 200+-query sweep (localCheckpoint'd iteration
        # state, broadcast builds) — size it like the executor it stands
        # in for; measured: the sf0.1 sweep broadcast-OOMs at 1g.
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_GRAFT_MEM", "8g")},
    )

    run_steal0 = _steal_sec()
    names = [n for n in HEADLINE if n in QUERIES]
    # warmup: one full pass absorbs JVM startup, Janino/whole-stage-codegen
    # compilation (row-independent, ~seconds per distinct plan shape) and
    # parquet footer caching, so the timed pass measures steady-state
    # throughput — the quantity that scales to the 100 TB target, where
    # compile time amortizes to noise.
    for name in names:
        QUERIES[name](spark, sf_dir).count()
    # drop any persisted intermediates (e.g. minhash signatures) so the
    # timed pass recomputes data, not just replays caches
    spark.catalog.clearCache()

    # machine-health guard (VERDICT r06 #2): probe host contention with a
    # fixed data-independent op; if the host looks loaded, wait once and
    # re-probe; if still loaded, tag the record rather than let a
    # contended VM masquerade as (or camouflage) a regression.
    calibration_sec = _calibrate(spark)
    calibration_ratio = round(calibration_sec / CALIBRATION_STEADY_SEC, 2)
    if calibration_ratio > CALIBRATION_NOISY_RATIO:
        time.sleep(20)
        calibration_sec = _calibrate(spark)
        calibration_ratio = round(calibration_sec / CALIBRATION_STEADY_SEC, 2)
    noisy_host = calibration_ratio > CALIBRATION_NOISY_RATIO

    # best-of-3 per query: the per-round numbers feed a round-over-round
    # regression signal, and single-shot timings on a shared VM carry up
    # to ~2x scheduler noise — min-of-3 reports reproducible steady-state
    # throughput (the quantity that scales) at the cost of two extra
    # passes; the per-query spread (max/min across attempts) is emitted
    # alongside so a judge can separate VM noise from real regression
    # without git archaeology.
    timings: dict[str, float] = {}
    quiet_timings: dict[str, float] = {}
    noise: dict[str, float] = {}
    headline_steal: dict[str, float] = {}
    headline_steal_min: dict[str, float] = {}
    for name in names:
        # steal is measured PER ATTEMPT (ADVICE r8): the headline is
        # min-of-3, so the slot-total delta can implicate a query whose
        # reported attempt was untouched by a burst. headline_steal_sec
        # keeps the r8 slot-total semantics for continuity;
        # headline_steal_min_attempt_sec is the delta around the attempt
        # the reported (min) timing came from — the field to read when
        # deciding whether the REPORTED number carried a burst.
        attempts = []
        attempt_steal = []
        for _ in range(3):
            s_a = _steal_sec()
            start = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.count()
            attempts.append(time.perf_counter() - start)
            attempt_steal.append(_steal_sec() - s_a)
        # quiet-host protocol in the PRIMARY record (VERDICT r11 #6):
        # best attempt whose own steal delta ~ 0 — the number that
        # needed a separate BENCH_LOCAL re-run to adjudicate in r10/r11.
        # If all 3 attempts were touched by bursts, take up to 2 extra
        # attempts hunting a quiet window; a name still absent from
        # quiet_queries means no steal-free measurement was obtainable.
        if not any(s < 0.5 for s in attempt_steal):
            for _ in range(2):
                s_a = _steal_sec()
                start = time.perf_counter()
                QUERIES[name](spark, sf_dir).count()
                attempts.append(time.perf_counter() - start)
                attempt_steal.append(_steal_sec() - s_a)
                if attempt_steal[-1] < 0.5:
                    break
        quiet = [
            a for a, s in zip(attempts, attempt_steal) if s < 0.5
        ]
        if quiet:
            quiet_timings[name] = round(min(quiet), 4)
        timings[name] = round(min(attempts[:3]), 4)
        noise[name] = round(max(attempts[:3]) / min(attempts[:3]), 2)
        stolen = sum(attempt_steal[:3])
        if stolen >= 0.5:  # only report measurements a steal burst touched
            headline_steal[name] = round(stolen, 1)
            min_idx = attempts.index(min(attempts[:3]))
            headline_steal_min[name] = round(attempt_steal[min_idx], 1)

    # steady-state full-registry sweep: one timed pass over EVERY
    # registered query (warm JVM, cold data). Coarse by design — it is the
    # breadth signal (does the whole surface stay fast), complementing the
    # headline depth signal above. Fault-isolated per query: one failing
    # query must cost one entry in sweep_failed, never the JSON line.
    sweep_failed: list[str] = []
    sweep_times: dict[str, float] = {}
    sweep_offsets: dict[str, float] = {}
    sweep_steal: dict[str, float] = {}
    sweep_probes: list[dict] = []
    # Mid-sweep calibration probes (VERDICT r07 #2): BENCH_r07 recorded a
    # 10x in-sweep outlier (dedup_prefix_filter_join 40.8 s vs its 4.3 s
    # headline) that BOTH endpoint probes missed — a spike confined to the
    # sweep's interior is invisible to start/end probes. Probing at the
    # quartile boundaries plus per-query start offsets makes any future
    # spike attributable to a time window and the queries inside it.
    items = list(QUERIES.items())
    probe_at = {len(items) // 4, len(items) // 2, (3 * len(items)) // 4}
    # Sweep-tier fixture flag (VERDICT r12 #8): live manifest-stream
    # scenarios cap their base tables at a deterministic hash subset
    # while this is set (plans/streaming_live.py _sweep_cap), bounding
    # the sweep wall as more live scenarios register. Headline queries
    # never read it; pytest and the driver correctness pass run with it
    # unset (full size vs the DuckDB oracles).
    os.environ["SPARK_GRAFT_SWEEP_TIER"] = "1"
    sweep_start = time.perf_counter()
    probe_overhead = 0.0  # keep sweep_sec comparable to pre-probe rounds
    for i, (name, fn) in enumerate(items):
        if i in probe_at:
            p_start = time.perf_counter()
            prior_overhead = probe_overhead  # overhead accrued BEFORE p_start
            p_sec = _calibrate(spark)
            probe_overhead += time.perf_counter() - p_start
            sweep_probes.append(
                {
                    # the probe runs BEFORE items[i]: queries 0..i-1 are
                    # inside the window this probe closes. offset_sec is
                    # probe-overhead-adjusted (see sweep_offsets note) so
                    # it lands on the same time axis as sweep_sec.
                    "before_query": i,
                    "offset_sec": round(p_start - sweep_start - prior_overhead, 1),
                    "ratio": round(p_sec / CALIBRATION_STEADY_SEC, 2),
                }
            )
        q_start = time.perf_counter()
        s0 = _steal_sec()
        # offsets subtract the probe overhead accumulated SO FAR (ADVICE
        # r8): sweep_sec excludes probe time, so an unadjusted wall-clock
        # offset late in the sweep could exceed sweep_sec — adjusting each
        # offset puts both on one time axis (query-work seconds since
        # sweep start).
        sweep_offsets[name] = round(q_start - sweep_start - probe_overhead, 1)
        try:
            fn(spark, sf_dir).count()
            sweep_times[name] = time.perf_counter() - q_start
            sweep_steal[name] = _steal_sec() - s0
        except Exception:
            sweep_failed.append(name)
    os.environ.pop("SPARK_GRAFT_SWEEP_TIER", None)
    # exclude the quartile probes' own runtime so sweep_sec keeps the
    # r6/r7 semantics (sum of query wall time only)
    sweep_sec = round(time.perf_counter() - sweep_start - probe_overhead, 1)
    slowest = {
        n: round(t, 2)
        for n, t in sorted(sweep_times.items(), key=lambda kv: -kv[1])[:10]
    }
    slowest_offsets = {n: sweep_offsets[n] for n in slowest}
    slowest_steal = {n: round(sweep_steal.get(n, 0.0), 1) for n in slowest}
    # cold marker (round-9 receipt): the warmup loop only runs HEADLINE,
    # so every other sweep entry is its FIRST in-session execution and may
    # carry one-time cost — measured: the python-datasource writer pays
    # ~6 s of worker fork+import on its first run (at ~0 steal) and 0.6 s
    # warm. A slowest-10 entry with cold=true and ~0 steal is that class,
    # not a regression; re-measure warm-isolated before investigating.
    slowest_cold = {n: n not in names for n in slowest}
    noisy_host_mid = any(
        p["ratio"] > CALIBRATION_NOISY_RATIO for p in sweep_probes
    )

    # second probe AFTER the timed work: contention that arrives mid-run
    # (the BENCH_r06 failure mode — the start probe read 1.28 while the
    # sweep recorded 3-5x latency-amplified streaming timings) is caught
    # by the end probe; noisy_host reflects the worse of the two.
    calibration_sec_end = _calibrate(spark)
    calibration_ratio_end = round(calibration_sec_end / CALIBRATION_STEADY_SEC, 2)
    noisy_host = (
        noisy_host
        or noisy_host_mid
        or calibration_ratio_end > CALIBRATION_NOISY_RATIO
    )

    total = round(sum(timings.values()), 4)
    # primary-line quiet map: only names whose reported (min) attempt
    # was itself steal-touched — for everything else quiet == reported
    quiet_primary = {
        n: quiet_timings[n]
        for n in quiet_timings
        if headline_steal_min.get(n, 0.0) >= 0.5
    }
    quiet_dropped = 0
    if len(quiet_primary) > 10:
        keep = sorted(
            quiet_primary,
            key=lambda n: timings[n] - quiet_primary[n],
            reverse=True,
        )[:10]
        quiet_dropped = len(quiet_primary) - 10
        quiet_primary = {n: quiet_primary[n] for n in keep}

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # RECORD SPLIT CONTRACT (VERDICT r10 #2): the driver archives only
    # the LAST ~2000 characters of stdout and tries to parse the final
    # JSON line whole — BENCH_r01..r10 all recorded `parsed: null`
    # because the single line outgrew that window and only its tail
    # survived. The record is therefore SPLIT: the primary line keeps
    # the longitudinal essentials (per-query headline timings, total,
    # sweep summary, host-noise verdict + per-query noise flags) and
    # MUST stay under the window (test_bench_contract pins a size
    # budget); every per-query attribution map (steal deltas, probe
    # arrays, slowest-10 breakdowns, full noise ratios, full sweep
    # timings) moves to BENCH_DETAIL.json next to this script.
    # Longitudinal fields still close the line (queries, value last) so
    # even a truncated tail keeps them.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(
            {
                "metric": "headline_queries_detail",
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "calibration_sec": round(calibration_sec, 3),
                "registry_sweep_slowest": slowest,
                "registry_sweep_slowest_offsets": slowest_offsets,
                "registry_sweep_slowest_steal_sec": slowest_steal,
                "registry_sweep_slowest_cold": slowest_cold,
                "registry_sweep_probes": sweep_probes,
                "headline_steal_sec": headline_steal,
                "headline_steal_min_attempt_sec": headline_steal_min,
                "quiet_queries_all": quiet_timings,
                "noise_ratio_per_query": noise,
                "registry_sweep_times": {
                    n: round(t, 2) for n, t in sweep_times.items()
                },
                "registry_sweep_offsets": sweep_offsets,
                "registry_sweep_steal_sec": {
                    n: round(v, 1) for n, v in sweep_steal.items() if v >= 0.5
                },
            },
            fh,
            indent=1,
        )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "unit": "sec",
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "detail": "BENCH_DETAIL.json",
                "calibration_ratio": calibration_ratio,
                "calibration_ratio_end": calibration_ratio_end,
                "noisy_host": noisy_host,
                "total_steal_sec": round(_steal_sec() - run_steal0, 1),
                "registry_sweep_sec": sweep_sec,
                "registry_sweep_queries": len(QUERIES),
                "registry_sweep_failed": sweep_failed,
                # noise flags, not the full map: only queries whose 3
                # attempts spread >= 1.5x (the full per-query ratios are
                # in the detail file)
                "noise_flagged": {
                    n: r for n, r in noise.items() if r >= 1.5
                },
                # quiet-host companion map (VERDICT r11 #6): per query
                # whose REPORTED min attempt carried a steal burst, the
                # best steal-free attempt — the number BENCH_LOCAL
                # re-runs existed to produce. Quiet reported numbers are
                # omitted here (quiet == reported); the full map is
                # quiet_queries_all in BENCH_DETAIL.json. Bounded at 10
                # entries for the driver's line window — quiet_dropped
                # counts any overflow (never silently truncated).
                "quiet_queries": quiet_primary,
                "quiet_dropped": quiet_dropped,
                "queries": timings,
                "value": total,
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
