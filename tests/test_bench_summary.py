"""bench.compact_summary: the one-line record must stay under the
driver's ~2.2 KB tail capture no matter how many query rows rounds keep
adding (round-7 verdict item 8)."""

import json

from bench import compact_summary


def _payload(n_queries: int, n_errors: int = 0) -> dict:
    return {
        "metric": "bench_total_wall",
        "value": 123.456,
        "unit": "sec",
        "queries": {f"query_name_{i:03d}": 0.5 + i * 0.037 for i in range(n_queries)},
        "errors": {
            f"err_{i}": "SomeException: " + "x" * 200 for i in range(n_errors)
        },
        "micro_us_per_query": {"n64,d128": 4.6, "n1024,d768": 35.0},
        "local_single_query_us": 296.2,
        "sf": 0.1,
    }


def test_small_payload_untouched():
    p = _payload(10)
    line, spill = compact_summary(p)
    assert not spill
    assert json.loads(line)["queries"] == p["queries"]


def test_120_queries_under_2kb_and_lossless_overall():
    p = _payload(120)
    line, spill = compact_summary(p)
    assert len(line) < 2000
    rec = json.loads(line)  # still valid JSON
    # every row is either in the summary or the spill detail — none lost
    merged = {**rec["queries"], **spill}
    assert set(merged) == set(p["queries"])
    assert rec["queries_omitted"] == len(spill) > 0
    # the spill took the FASTEST rows; the slow tail stays in the summary
    if rec["queries"] and spill:
        assert max(spill.values()) <= min(rec["queries"].values())
    # headline fields survive degradation
    assert rec["metric"] == "bench_total_wall" and rec["sf"] == 0.1


def test_errors_shortened_before_queries_spill():
    p = _payload(20, n_errors=10)  # ~2.1 KB of error text: over threshold
    line, _spill = compact_summary(p)
    rec = json.loads(line)
    assert all(len(v) <= 60 for v in rec["errors"].values())
    assert len(line) < 2000
