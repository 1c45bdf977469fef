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


def test_bench_summary_builder_stays_inside_window():
    """Replicate bench.py's summary construction at the CURRENT suite
    size (all live + benched retired names) and assert the line fits
    with headroom — the regression the driver can't warn about."""
    import re

    src = open(os.path.join(_REPO, "bench.py")).read()
    names = re.findall(r'bench\(\s*"([a-zA-Z0-9_]+)"', src)
    assert len(names) >= 40  # sanity: the suite is still registered
    summary = {
        "metric": "headline_suite_seconds",
        "value": 9999.999,
        "unit": "sec",
        "queries": {n: 99.99 for n in names},
        "sf": "/root/testdata/sf0.1",
        "cpus": 32,
        "n_queries": len(names),
    }
    line = json.dumps(summary, separators=(",", ":"))
    assert len(line) <= 1800, (
        f"bench.py summary line would be {len(line)} chars; the >1800 "
        "fallback in bench.py will truncate queries to top-20 — if this "
        "fires, move queries to the jsonl or shorten names"
    )
    check_stdout("noise\n" + line + "\n")
