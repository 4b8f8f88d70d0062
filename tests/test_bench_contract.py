"""bench.py stdout contract: the driver records only the final
~2000 chars of stdout and parses a JSON line from them, so the ONE
printed line must always fit regardless of how many headline queries
exist (r5's full per-query line outgrew the window and the round's
bench artifact recorded parsed: null)."""

import importlib.util
import json
import os


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod",
        os.path.join(os.path.dirname(__file__), "..", "bench.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_summary_line_fits_capture_window_at_any_query_count():
    bench = _load_bench()
    # worst case: many queries with long names and 4-digit walls
    times = {
        f"extremely_long_query_name_number_{i:04d}_with_padding": 1000.125 + i
        for i in range(500)
    }
    line = bench.summary_line(times, 0.1)
    assert len(line) < 1900
    d = json.loads(line)
    assert d["metric"] == "headline_queries_total_wall"
    assert d["n_queries"] == 500
    assert d["value"] == round(sum(times.values()), 3)
    # the slowest queries survive in the line (truncated set, sorted)
    assert all(k in times for k in d["queries"])
    if d["queries"]:
        kept_min = min(d["queries"].values())
        dropped = [v for k, v in times.items() if k not in d["queries"]]
        assert all(v <= kept_min for v in dropped)


def test_summary_line_keeps_top20_when_it_fits():
    bench = _load_bench()
    times = {f"q{i}": float(i) for i in range(50)}
    d = json.loads(bench.summary_line(times, 0.01))
    assert len(d["queries"]) == 20
    assert set(d["queries"]) == {f"q{i}" for i in range(30, 50)}


def test_summary_line_raises_loudly_when_budget_is_impossible():
    import pytest

    bench = _load_bench()
    with pytest.raises(ValueError, match="exceeds"):
        bench.summary_line({"q": 1.0}, 0.01, max_chars=10)


def test_subset_runs_never_claim_the_headline_metric():
    """pick_metric is the single routing point main() uses for the
    stdout label: full runs publish headline_queries_total_wall,
    subset runs subset_queries_total_wall, and summary_line carries
    whichever through to the JSON line."""
    bench = _load_bench()
    assert bench.pick_metric(True) == "headline_queries_total_wall"
    assert bench.pick_metric(False) == "subset_queries_total_wall"
    d = json.loads(
        bench.summary_line({"q": 1.0}, 0.01, metric=bench.pick_metric(False))
    )
    assert d["metric"] == "subset_queries_total_wall"


def test_subset_lines_do_not_point_at_the_details_artifact():
    """main() rewrites BENCH_DETAILS.json only on full runs, so a
    subset line carrying the filename would reference a stale
    artifact from an earlier full run with a different query set
    (ADVICE r6) — subset lines carry null, full lines the filename."""
    bench = _load_bench()
    sub = json.loads(
        bench.summary_line({"q": 1.0}, 0.01, metric=bench.pick_metric(False))
    )
    assert sub["queries_file"] is None
    full = json.loads(
        bench.summary_line({"q": 1.0}, 0.01, metric=bench.pick_metric(True))
    )
    assert full["queries_file"] == "BENCH_DETAILS.json"


def test_headline_exclusion_partition_is_total():
    """The HEADLINE inclusion rule is auditable, not implicit
    (VERDICT r6 item #6): every contract key is either headline or
    explicitly EXCLUDED under a declared class, with no overlap and
    no stragglers — a new contract key that lands on neither side
    fails here until it is placed."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __spark_entry__ as entry

    bench = _load_bench()
    headline = set(bench.HEADLINE)
    excluded = {k for ks in bench.EXCLUDED.values() for k in ks}
    keys = set(entry.queries())
    assert not headline & excluded, sorted(headline & excluded)
    assert headline | excluded == keys, {
        "unplaced": sorted(keys - headline - excluded),
        "stale": sorted((headline | excluded) - keys),
    }
    # no duplicate placements inside EXCLUDED either
    n = sum(len(ks) for ks in bench.EXCLUDED.values())
    assert n == len(excluded)


def test_headline_names_resolve_to_contract_queries():
    """Every HEADLINE name must exist in queries() — a renamed
    contract key would silently drop out of the bench (bench.py
    filters `n in qs`) and the round's common-subset comparison
    would shrink without anyone noticing."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __spark_entry__ as mod

    bench = _load_bench()
    qs = set(mod.queries())
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert missing == []
