"""bench.py contract guards: the frozen headline list must stay resolvable
against the registry (a rename there would silently drop the longitudinal
perf signal), and the registry must keep the driver window as its prefix."""

from __future__ import annotations

import bench
from pucminas_data_pipelines_spark import plans


def test_headline_queries_all_registered():
    missing = [n for n in bench.HEADLINE if n not in plans.QUERIES]
    assert not missing, f"headline names missing from registry: {missing}"


def test_driver_window_is_registry_prefix():
    assert list(plans.QUERIES)[: len(plans.DRIVER_WINDOW)] == plans.DRIVER_WINDOW
    assert len(plans.DRIVER_WINDOW) == 50
    # rows-only queries must stay out of the scored window
    assert all(n in plans.ORACLES for n in plans.DRIVER_WINDOW)


def test_every_registered_query_documented_in_coverage():
    """COVERAGE.md is the judge's line-by-line inventory — every registered
    query name must appear in it (individually or inside a family row)."""
    from pucminas_data_pipelines_spark import plans

    cov = open("/root/repo/COVERAGE.md").read()
    missing = [n for n in plans.QUERIES if n not in cov]
    assert not missing, f"queries missing from COVERAGE.md: {missing}"


def test_bench_emits_attribution_fields():
    """The r8 noise-attribution fields must survive refactors: the
    longitudinal BENCH keys are append-only, and the steal/offset/probe
    fields are how a reader separates a host steal burst from a real
    regression without a round-later bisect."""
    import ast
    import inspect

    src = inspect.getsource(bench.main)
    emitted = {
        k.value
        for node in ast.walk(ast.parse(src))
        if isinstance(node, ast.Dict)
        for k in node.keys
        if isinstance(k, ast.Constant) and isinstance(k.value, str)
    }
    required = {
        "metric", "value", "unit", "queries", "sf",
        "noise_ratio_per_query", "calibration_sec", "calibration_ratio",
        "calibration_ratio_end", "noisy_host",
        "registry_sweep_sec", "registry_sweep_slowest",
        "registry_sweep_slowest_offsets", "registry_sweep_slowest_steal_sec",
        "registry_sweep_probes", "headline_steal_sec",
        "headline_steal_min_attempt_sec", "registry_sweep_slowest_cold",
        "total_steal_sec",
        "registry_sweep_queries", "registry_sweep_failed",
    }
    missing = required - emitted
    assert not missing, f"bench JSON lost fields: {sorted(missing)}"


def test_bench_emits_longitudinal_fields_last():
    """The driver archives only the TAIL of bench's single JSON line
    (r7/r8 both truncated); the longitudinal fields must be the final
    keys of the record dict — noise_ratio_per_query, then queries, then
    value — so a tail-truncated archive still carries the per-query
    headline timings and the headline total."""
    import ast
    import inspect

    src = inspect.getsource(bench.main)
    record = None
    for node in ast.walk(ast.parse(src)):
        if isinstance(node, ast.Dict):
            keys = [
                k.value
                for k in node.keys
                if isinstance(k, ast.Constant) and isinstance(k.value, str)
            ]
            if "metric" in keys:
                record = keys
    assert record is not None
    assert record[-3:] == ["noise_ratio_per_query", "queries", "value"], (
        f"longitudinal fields must close the record; got tail {record[-3:]}"
    )


def test_steal_counter_reads():
    """_steal_sec must return a non-negative float on this platform and
    be monotone across two reads (cumulative counter)."""
    a = bench._steal_sec()
    b = bench._steal_sec()
    assert isinstance(a, float) and a >= 0.0
    assert b >= a
