"""The driver parses bench.py's LAST stdout line (VERDICT r11 #1:
BENCH_r06..r11 all recorded ``"parsed": null`` because the full
result JSON outgrew the driver's tail capture).  These tests pin the
compact-summary contract so the line can never outgrow the capture
again."""

import json

import bench


def _worst_case_result() -> dict:
    # 500 benched queries with long names — far beyond today's ~105 —
    # must NOT bloat the summary line: only the pinned flagship
    # subset is inlined.
    queries = {f"some_very_long_query_name_{i:04d}": 123.4567 for i in range(500)}
    queries.update({k: 1.2345 for k in bench._SUMMARY_QUERIES})
    return {
        "metric": "headline-suite wall time (warm, noop-sink)",
        "value": 12345.6789,
        "unit": "sec",
        "sf": 0.1,
        "queries": queries,
        "value_host_normalized": 12000.1234,
        "host_factor": 1.0123,
        "candles_per_sec": 118842.1,
        "streaming_candles_per_sec": 2586.7,
        "calibration": {
            "query": "basket",
            "median_sec": 0.7071,
            "basket": {
                name: {
                    "median_sec": 0.1234,
                    "reps_sec": [0.1111, 0.1234, 0.9999],
                }
                for name in bench._CALIBRATION_ANCHORS
            },
            "factor_detail": {
                "host_factor": 1.0123,
                "ratios": {
                    name: {
                        "ratio": 1.0123,
                        "prior_sec": 0.1219,
                        "source": "basket",
                    }
                    for name in bench._CALIBRATION_ANCHORS
                },
            },
        },
    }


def test_summary_line_is_compact_and_parseable():
    line = bench.summary_line(
        _worst_case_result(),
        "docs/bench/BENCH_r12.full.json",
    )
    assert "\n" not in line
    assert len(line.encode()) < 1024, f"summary line {len(line)}B >= 1kB"
    parsed = json.loads(line)
    assert parsed["value"] == 12345.6789
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    assert parsed["n_queries"] == 508
    assert parsed["full_json"] == "docs/bench/BENCH_r12.full.json"
    # calibration rides inline so prior_calibration's fallback works
    # even without the committed sidecar — compacted to per-anchor
    # medians (reps arrays and factor detail stay in the sidecar)
    assert parsed["calibration"]["median_sec"] == 0.7071
    assert parsed["calibration"]["anchors"] == {
        name: 0.1234 for name in bench._CALIBRATION_ANCHORS
    }
    assert "basket" not in parsed["calibration"]
    assert "factor_detail" not in parsed["calibration"]
    # flagship subset present, bulk absent
    assert set(parsed["queries"]) == set(bench._SUMMARY_QUERIES)


def test_summary_line_handles_minimal_result():
    # sf0.01 local iteration runs produce no sidecar (full_json=None)
    # and may lack optional scalars — the line must still parse.
    line = bench.summary_line({"value": 1.0, "queries": {}}, None)
    parsed = json.loads(line)
    assert parsed["full_json"] is None
    assert parsed["n_queries"] == 0
