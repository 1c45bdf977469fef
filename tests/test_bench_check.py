"""The driver captures only the last ~2000 chars of bench.py stdout and
parses the FINAL line (BENCH_r04.json recorded "parsed": null when the
single output line outgrew that window). These tests pin the contract:
scripts/bench_check.py replays the driver's truncation, and bench.py's
summary line stays inside the window even at the current query count."""

from __future__ import annotations

import json
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from scripts.bench_check import TAIL_CHARS, check_stdout


def _summary(n_queries=60):
    return {
        "metric": "headline_suite_seconds",
        "value": 123.456,
        "unit": "sec",
        "queries": {f"some_query_name_{i:02d}": 1.23 for i in range(n_queries)},
        "sf": "/root/testdata/sf0.1",
        "cpus": 32,
        "n_queries": n_queries,
    }


def test_parses_compact_final_line_after_noise():
    noise = "x" * 10_000 + "\n" + json.dumps({"big": "detail " * 500}) + "\n"
    line = json.dumps(_summary(), separators=(",", ":"))
    assert len(line) < TAIL_CHARS - 100  # bench.py's own headroom claim
    parsed = check_stdout(noise + line + "\n")
    assert parsed["metric"] == "headline_suite_seconds"
    assert parsed["n_queries"] == 60


def test_rejects_r4_style_overgrown_single_line():
    """The exact r4 failure mode: ONE giant JSON line whose head falls
    outside the tail window -> head-truncated -> unparseable."""
    big = dict(_summary(200), rows={f"q{i}": i for i in range(200)})
    line = json.dumps(big)
    assert len(line) > TAIL_CHARS
    with pytest.raises(SystemExit, match="does not parse"):
        check_stdout(line + "\n")


def test_rejects_missing_contract_keys():
    with pytest.raises(SystemExit, match="missing contract keys"):
        check_stdout(json.dumps({"metric": "m", "value": 1}) + "\n")


def _suite_names():
    import re

    src = open(os.path.join(_REPO, "bench.py")).read()
    return re.findall(r'bench\(\s*"([a-zA-Z0-9_]+)"', src)


def test_bench_summary_builder_stays_inside_window():
    """Run bench.py's REAL summary builder at the CURRENT suite size
    (all registered bench names, worst-case magnitudes) and assert the
    line fits the driver window — the regression the driver can't warn
    about."""
    from bench import _SUMMARY_BUDGET, build_summary

    names = _suite_names()
    assert len(names) >= 40  # sanity: the suite is still registered
    timings = {n: 999.999 for n in names}  # worst-case digit widths
    line = build_summary(timings, "/root/testdata/sf0.1", 32)
    assert len(line) <= _SUMMARY_BUDGET
    parsed = check_stdout("noise\n" + line + "\n")
    assert parsed["n_queries"] == len(names)
    assert parsed["value"] == round(sum(timings.values()), 3)


def test_bench_summary_keeps_cross_round_comparable_queries():
    """The greedy fill must never evict the r1-r3 comparable set — the
    per-query diff the judge runs against prior BENCH_r{N}.json files —
    even when the rest of the suite is costlier."""
    from bench import _COMPARABLE, build_summary

    names = _suite_names()
    # adversarial: every non-comparable query costs MORE than every
    # comparable one, so a by-cost-only fill would evict the whole set
    timings = {
        n: (1.0 if n in _COMPARABLE else 500.0) for n in names
    }
    parsed = json.loads(build_summary(timings, "/root/testdata/sf0.1", 32))
    for q in _COMPARABLE:
        if q in timings:
            assert q in parsed["queries"], q
    # and the marker reports the truncation honestly when it happens
    if len(parsed["queries"]) < len(names):
        assert parsed["queries_in_line"] == len(parsed["queries"])
        assert parsed["detail_file"] == "BENCH/bench_detail.jsonl"


def test_bench_summary_small_suite_includes_everything():
    from bench import build_summary

    timings = {f"q{i}": 1.5 for i in range(10)}
    parsed = json.loads(build_summary(timings, "/root/testdata/sf0.01", 8))
    assert set(parsed["queries"]) == set(timings)
    assert "queries_in_line" not in parsed
