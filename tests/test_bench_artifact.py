"""The bench driver line must stay inside the grading driver's bounded
stdout tail capture (~2000 chars).  BENCH_r04 recorded ``parsed: null``
because diagnostics (loadavg/probe_ms/streaming_stats) grew the line past
that window and its HEAD — the opening brace — was cut off.  The fix is
structural (diagnostics live in a sidecar, the line carries only the
headline payload) and this test pins it under the worst realistic load:
every query contaminated, retried, and settle-timed-out at once."""

import json

import bench


def _rec(sec, contaminated=True):
    return {"sec": sec, "retries": 3, "load": 31.99, "probe_ms": 199.9,
            "settle_timeout": True, "contaminated": contaminated}


def test_driver_line_stays_within_tail_capture():
    # 30 queries with names longer than any real one, all pathological
    names = ["kg_pipeline", "kg_pipeline_pruned"] + [
        "extremely_long_query_name_number_%02d_overflow_case" % i
        for i in range(28)]
    records = {n: _rec(123.456789) for n in names}
    stream_stats = {
        "streaming_exact_dedup": {"rows_in": 5000, "state_rows": 5000},
        "sessionize_events": {"state_rows": 1500},
    }
    clean_info = {"passes": 2, "recovered": names[:5],
                  "skipped_dirty_window": 2, "exhausted": names}

    line, diag = bench.assemble_artifacts(
        records, 122017, 1218914, "0.1", stream_stats=stream_stats,
        clean_info=clean_info, settle_timeouts=["_warmup"],
        replicate=20, cpus=32)

    assert len(line) <= bench.MAX_LINE_CHARS
    out = json.loads(line)
    assert out["metric"] == "kg_pages_per_sec"
    assert out["kg_pages"] == 122017 and out["sf"] == 0.1
    assert out["queries"]["kg_pipeline"] == 123.457
    assert out["contaminated"] is True
    assert out["diag"] == bench.DIAG_RELPATH
    # diagnostics moved off the line into the sidecar, not dropped
    assert diag["probe_ms"][names[0]] == 199.9
    assert diag["loadavg"][names[0]] == 31.99
    assert diag["outlier_retries"][names[0]] == 3
    assert diag["streaming_stats"] == stream_stats
    assert diag["clean_window"]["exhausted"] == names
    assert "_warmup" in diag["settle_timeouts"]


def test_driver_line_clean_run_shape():
    names = ["kg_pipeline", "q1_pricing_summary"]
    records = {n: {"sec": 1.0, "retries": 0, "load": 0.5,
                   "probe_ms": 105.0, "settle_timeout": False,
                   "contaminated": False} for n in names}
    line, diag = bench.assemble_artifacts(
        records, 627, 6104, "0.01", replicate=1, cpus=8)
    out = json.loads(line)
    assert "contaminated" not in out  # no stamp on clean runs
    assert out["total_sec"] == 2.0
    assert diag["contaminated_queries"] == []
