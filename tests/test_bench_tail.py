"""The bench's one-line stdout JSON is the round driver's only
per-query visibility channel. Round 11 lost 5 previously-visible
queries to the fastest-first trim ("phantom drops" in PERF_r11);
round 12 pins the driver-visible set. These tests exercise the trim
logic (`bench._tail_line`) without a Spark session."""

import json

import bench


def _fake_timings():
    # realistic: every benched query, values shaped like BENCH_LOCAL
    # (0.2-8 s); deterministic spread so trim order is stable
    return {name: round(0.2 + (i * 7 % 80) / 10.0, 3)
            for i, name in enumerate(bench.BENCH_QUERIES)}


def _line_for(timings, budget=1800):
    result = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
        "loadavg_start": [0.1, 0.2, 0.3],
        "loadavg_end": [9.1, 8.2, 7.3],
        "runs": 5,
        "driver_mem": "16g",
        "queries_sha256": "0123456789ab",
    }
    return bench._tail_line(result, timings, "0123456789ab", budget)


def test_pinned_queries_are_in_bench_list():
    missing = [q for q in bench.PINNED_TAIL
               if q not in bench.BENCH_QUERIES]
    assert missing == []


def test_pinned_set_survives_trim_within_budget():
    line = _line_for(_fake_timings())
    assert len(line) <= 1800
    parsed = json.loads(line)
    missing = [q for q in bench.PINNED_TAIL
               if q not in parsed["queries"]]
    assert missing == [], f"pinned queries evicted: {missing}"
    # bookkeeping stays consistent
    assert (parsed["queries_omitted"]
            == parsed["queries_total"] - len(parsed["queries"]))
    assert parsed["queries_sha256"] == "0123456789ab"


def test_full_line_returned_when_it_fits():
    timings = {"q3_shipping_priority": 0.5, "q_hits": 6.73}
    line = _line_for(timings, budget=100_000)
    parsed = json.loads(line)
    # untrimmed: full 3-decimal values and the env extras survive
    assert parsed["queries"] == timings
    assert "loadavg_start" in parsed and "runs" in parsed


def test_small_budget_keeps_only_pinned_queries():
    # at 300 bytes the trim reaches into the pinned set (non-pinned
    # all dropped first) but still emits a parseable envelope
    line = _line_for(_fake_timings(), budget=300)
    parsed = json.loads(line)
    assert len(line) <= 300
    assert parsed["queries"]  # some survive
    assert all(q in bench.PINNED_TAIL for q in parsed["queries"])


def test_tiny_budget_falls_back_to_minimal_line():
    line = _line_for(_fake_timings(), budget=170)
    parsed = json.loads(line)
    assert parsed["queries"] == {}
    assert parsed["queries_omitted"] == len(bench.BENCH_QUERIES)
