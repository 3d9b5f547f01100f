"""bench.py's compact stdout line (the only thing the driver's
~2000-char tail window parses) must carry ALL per-query timings and
the serve_warm headline — VERDICT r9 ask #4/#6 — and degrade, never
raise, if it ever overflows."""

import json


def _fake(n_queries):
    timings = {f"some_quite_long_query_name_{i:02d}": 1.234 for i in range(n_queries)}
    timings["emb_ivfpq_serve"] = 1.456
    ctx = {
        "cpu_probe_sec": 0.0402, "load1": 3.72, "cpus": 32,
        "stdin_tty": False, "stdout_tty": False,
    }
    result = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "sf": 0.1,
        "value_comparable_r2": 5.221,
        "value_noop_sink": 30.123,
        "comparable_r2_mean_warm": 5.6,
        "comparable_r2_std_warm": 0.15,
        "ivfpq_build": 2.345,
        "ivfpq_query": 1.011,
        "contended": False,
        "run_context": {"before": ctx, "after": ctx},
    }
    return result, timings


def test_compact_line_carries_every_query():
    from bench import compact_line

    result, timings = _fake(34)  # current fleet is ~32 bench queries
    line = compact_line(result, timings)
    assert len(line) < 1900
    parsed = json.loads(line)
    assert len(parsed["queries"]) == len(timings) >= 30
    assert parsed["serve_warm"] == 1.456
    assert parsed["value_comparable_r2"] == 5.221
    # lifecycle split + contention verdict (VERDICT r10 asks #5/#8)
    assert parsed["ivfpq_build"] == 2.345
    assert parsed["ivfpq_query"] == 1.011
    assert parsed["contended"] is False
    # page-cache stamp (VERDICT r11 ask #4): None/null when the result
    # predates the io probe or nothing was measurable — an unmeasured
    # run must not present as measured-warm False
    assert parsed["io_cold"] is None


def test_compact_line_carries_io_stamp():
    from bench import compact_line

    result, timings = _fake(34)
    result["io_cold"] = True
    result["run_context"]["before"] = dict(
        result["run_context"]["before"],
        io_probe_mb=17.5, io_probe_sec=0.119, io_mbps=147.0, io_cold=True,
    )
    parsed = json.loads(compact_line(result, timings))
    assert parsed["io_cold"] is True
    assert parsed["run_context"]["before"]["io_mbps"] == 147.0
    # the after side never carries io keys (probe is before-only)
    assert "io_mbps" not in parsed["run_context"]["after"]


def test_run_context_io_probe_fields(tmp_path):
    """The io probe reads the given dir's parquet and stamps
    throughput + the io_cold verdict; without a dir the context stays
    io-free (scale_probe's call sites pass nothing). Probes a
    synthesized >256 KB file rather than the box-local testdata
    (ADVICE r12 #5: a checkout without /root/testdata must not fail
    this test with a KeyError)."""
    from bench import _run_context

    (tmp_path / "probe.parquet").write_bytes(b"p" * (1 << 20))
    ctx = _run_context(io_probe_dir=str(tmp_path))
    assert ctx["io_probe_mb"] > 0
    assert ctx["io_mbps"] > 0
    assert isinstance(ctx["io_cold"], bool)
    assert "io_mbps" not in _run_context()


def test_io_probe_skips_stamp_when_nothing_measurable(tmp_path):
    """code-review r12 #2: a dir with no regular parquet file over
    256 KB must yield NO io stamp — a 0-byte probe would read 0.0 MB/s
    and permanently flag every run io_cold; Spark-written lakes whose
    *.parquet entries are DIRECTORIES must not crash the probe."""
    from bench import _io_probe, _run_context

    (tmp_path / "tiny.parquet").write_bytes(b"x" * 1024)
    (tmp_path / "lake.parquet").mkdir()  # directory entry, > getsize 0
    (tmp_path / "lake.parquet" / "part-0").write_bytes(b"y" * (512 << 10))
    assert _io_probe(str(tmp_path)) is None
    ctx = _run_context(io_probe_dir=str(tmp_path))
    assert "io_cold" not in ctx and "io_mbps" not in ctx


def test_contended_verdict_catches_core_capping():
    """The r12 episode: three consecutive benches read 6.35/9.01/8.21s
    comparable_r2 with CLEAN load1 + single-thread probes because the
    hypervisor had capped the VM to ~2 effective cores. The 8-way
    multi-core ratio is the discriminator; legacy contexts without the
    key stay classifiable."""
    from bench import contended_verdict

    clean = {"load1": 0.1, "cpu_probe_sec": 0.03, "mc_probe_ratio": 1.2}
    capped = {"load1": 0.1, "cpu_probe_sec": 0.03, "mc_probe_ratio": 4.0}
    assert contended_verdict(clean, clean) is False
    assert contended_verdict(capped, clean) is True
    assert contended_verdict(clean, capped) is True
    legacy = {"load1": 0.1, "cpu_probe_sec": 0.03}
    assert contended_verdict(legacy, legacy) is False


def test_contended_verdict_catches_frequency_drift():
    """The r12 second episode: cores present and unstarved (mc 1.05,
    load1 0.01) but each ~1.5x slower — cpu_probe_sec 0.042-0.047 vs
    the committed clean cluster 0.024-0.037 — inflating comparable_r2
    5.66 -> 8.08 s. The probe's absolute level gates it at 0.040."""
    from bench import contended_verdict

    clean = {"load1": 0.1, "cpu_probe_sec": 0.031, "mc_probe_ratio": 1.1}
    slow = {"load1": 0.1, "cpu_probe_sec": 0.047, "mc_probe_ratio": 1.1}
    assert contended_verdict(clean, clean) is False
    assert contended_verdict(slow, clean) is True
    assert contended_verdict(clean, slow) is True


def test_compact_line_degrades_instead_of_failing():
    from bench import compact_line

    result, timings = _fake(200)  # absurd fleet: must shrink, not raise
    line = compact_line(result, timings)
    assert len(line) < 1900
    parsed = json.loads(line)
    assert "value" in parsed and "serve_warm" in parsed


def test_pick_cleaner_prefers_clean_then_lower():
    """VERDICT r12 ask #5: auto-requeue commits the cleaner attempt —
    a clean verdict beats contended; same verdict falls back to the
    lower comparable-r2 subtotal (contention only inflates)."""
    from bench import pick_cleaner

    def att(contended, v):
        return {"contended": contended, "value_comparable_r2": v}

    assert pick_cleaner(att(True, 5.0), att(False, 9.0)) == 1
    assert pick_cleaner(att(False, 9.0), att(True, 5.0)) == 0
    assert pick_cleaner(att(True, 8.0), att(True, 6.0)) == 1
    assert pick_cleaner(att(True, 6.0), att(True, 8.0)) == 0
    assert pick_cleaner(att(False, 6.0), att(False, 6.0)) == 0  # tie: first


def test_compact_line_carries_requeue_marker():
    from bench import compact_line

    result, timings = _fake(34)
    result["requeue"] = {
        "attempt_kept": 2,
        "settle_sec": 120.0,
        "other_attempt": {
            "contended": True,
            "io_cold": None,
            "value": 40.0,
            "value_comparable_r2": 9.0,
            "serve_warm": 2.2,
            "run_context": result["run_context"],
        },
    }
    parsed = json.loads(compact_line(result, timings))
    assert parsed["requeue"] == {"attempt_kept": 2, "other_contended": True}
    # absent when no requeue happened
    del result["requeue"]
    assert "requeue" not in json.loads(compact_line(result, timings))


def test_main_requeues_once_on_contended(monkeypatch, capsys, tmp_path):
    """End-to-end requeue flow with _measure stubbed: a contended
    first attempt triggers exactly one settle + re-measure; the
    cleaner (second) attempt is committed with the requeue marker and
    the discarded attempt stamped alongside."""
    import bench

    ctx = {"cpu_probe_sec": 0.03, "load1": 0.2, "mc_probe_ratio": 1.1}

    def fake_result(contended, v):
        return {
            "metric": "headline_queries_total_wall",
            "value": v,
            "sf": 0.1,
            "value_comparable_r2": v,
            "value_noop_sink": v,
            "comparable_r2_mean_warm": v,
            "comparable_r2_std_warm": 0.1,
            "ivfpq_build": 1.0,
            "ivfpq_query": 0.5,
            "serve_warm": 1.2,
            "contended": contended,
            "io_cold": None,
            "run_context": {"before": ctx, "after": ctx},
        }

    calls = []

    def fake_measure(sf_dir):
        calls.append(sf_dir)
        contended = len(calls) == 1
        return fake_result(contended, 9.0 if contended else 6.0), {
            "q": 1.0, "emb_ivfpq_serve": 1.2,
        }

    slept = []
    monkeypatch.setattr(bench, "_measure", fake_measure)
    monkeypatch.setattr(bench.time, "sleep", lambda s: slept.append(s))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_SETTLE_SEC", "120")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DETAIL_DIR", str(tmp_path))
    bench.main()
    assert len(calls) == 2 and slept == [120.0]
    last = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(last)
    assert parsed["contended"] is False
    assert parsed["value_comparable_r2"] == 6.0
    assert parsed["requeue"] == {"attempt_kept": 2, "other_contended": True}
    detail = json.loads((tmp_path / "BENCH_FULL_latest.json").read_text())
    assert detail["requeue"]["other_attempt"]["contended"] is True
    assert detail["requeue"]["settle_sec"] == 120.0

    # clean first attempt: no retry, no marker
    calls.clear()
    slept.clear()

    def fake_measure_clean(sf_dir):
        calls.append(sf_dir)
        return fake_result(False, 6.0), {"q": 1.0, "emb_ivfpq_serve": 1.2}

    monkeypatch.setattr(bench, "_measure", fake_measure_clean)
    bench.main()
    assert len(calls) == 1 and slept == []
    last = capsys.readouterr().out.strip().splitlines()[-1]
    assert "requeue" not in json.loads(last)

    # requeue disabled: contended commits as-is
    calls.clear()
    monkeypatch.setattr(bench, "_measure", fake_measure)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_REQUEUE", "0")
    bench.main()
    assert len(calls) == 1 and slept == []
    last = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(last)
    assert parsed["contended"] is True and "requeue" not in parsed


def test_requeue_prints_interim_record_before_settle(
    monkeypatch, capsys, tmp_path
):
    """A harness that times bench out MID-RETRY must still capture a
    parseable record: attempt 1's detail + compact lines are printed
    (marked requeue_pending) BEFORE the settle, and a completed
    attempt 2 prints later lines that win the last-JSON-line parse."""
    import bench

    ctx = {"cpu_probe_sec": 0.03, "load1": 0.2, "mc_probe_ratio": 1.1}

    def result(contended, v):
        return {
            "metric": "headline_queries_total_wall", "value": v,
            "sf": 0.1, "value_comparable_r2": v, "value_noop_sink": v,
            "comparable_r2_mean_warm": v, "comparable_r2_std_warm": 0.1,
            "ivfpq_build": 1.0, "ivfpq_query": 0.5, "serve_warm": 1.2,
            "contended": contended, "io_cold": None,
            "run_context": {"before": ctx, "after": ctx},
        }

    calls = []

    def fake_measure(sf_dir):
        calls.append(1)
        first = len(calls) == 1
        return result(first, 9.0 if first else 6.0), {
            "q": 1.0, "emb_ivfpq_serve": 1.2,
        }

    monkeypatch.setattr(bench, "_measure", fake_measure)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DETAIL_DIR", str(tmp_path))
    monkeypatch.delenv("SPARK_GRAFT_BENCH_REQUEUE", raising=False)
    bench.main()
    lines = [
        json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ]
    # 4 JSON lines: interim detail+compact, final detail+compact
    assert len(lines) == 4
    assert lines[0]["requeue_pending"] is True  # interim detail
    assert lines[1]["requeue_pending"] is True  # interim compact
    assert lines[1]["contended"] is True
    # the LAST line (what the driver parses) is the kept clean attempt
    assert "requeue_pending" not in lines[3]
    assert lines[3]["contended"] is False
    assert lines[3]["requeue"] == {"attempt_kept": 2, "other_contended": True}


def test_compact_line_carries_sf2_subtotal():
    """VERDICT r13 ask #6: the secondary scale point's subtotal rides
    the compact line (and hence the committed BENCH_r{N} artifact);
    absent when the sf2 loop did not run (missing dir / same dir)."""
    from bench import compact_line

    result, timings = _fake(34)
    line = compact_line(result, timings)
    assert "value_sf2" not in json.loads(line)

    result["sf2"] = 0.01
    result["value_sf2"] = 23.456
    parsed = json.loads(compact_line(result, timings))
    assert parsed["sf2"] == 0.01
    assert parsed["value_sf2"] == 23.456
    assert len(compact_line(result, timings)) < 1900


def test_compact_line_carries_noop_vals_aligned():
    """VERDICT r14 ask #1: per-query noop-sink timings ride the
    compact line as a values array aligned with the queries dict's
    key order (a named dict would blow the 2000-char tail window).
    20 fake queries: the helper's names are ~7 chars longer than real
    ones, so 34 of them overflow where the real fleet does not."""
    from bench import compact_line

    result, timings = _fake(20)
    result["queries_noop_sink"] = {
        q: v * 2 for q, v in timings.items()
    }
    parsed = json.loads(compact_line(result, timings))
    assert len(parsed["noop_vals"]) == len(parsed["queries"])
    # alignment: zip(queries.keys(), noop_vals) reconstructs the dict
    for q, nv in zip(parsed["queries"], parsed["noop_vals"]):
        assert nv == round(result["queries_noop_sink"][q], 2)


def test_compact_line_carries_sf1_scale_point():
    """VERDICT r14 ask #2: the sf1-class scale point (6 heavy queries
    against the 10x replica) rides the compact line — per-query dict
    included so the driver's 8v32 comparison can attribute scaling
    per query; value_sf1 survives even if the dict must degrade."""
    import bench
    from bench import compact_line

    result, timings = _fake(20)
    assert "value_sf1" not in json.loads(compact_line(result, timings))

    result["sf1_factor"] = 10
    result["queries_sf1"] = {q: 33.123 for q in bench.SF1_QUERIES}
    result["value_sf1"] = 198.738
    parsed = json.loads(compact_line(result, timings))
    assert parsed["sf1_factor"] == 10
    assert parsed["value_sf1"] == 198.738
    assert parsed["queries_sf1"] == {
        q: 33.12 for q in bench.SF1_QUERIES
    }


def test_compact_line_carries_lowcore_stamp():
    """VERDICT r14 ask #9: the local[8] cross-check stamp — null when
    the probe was skipped/failed (distinct from measured False)."""
    from bench import compact_line

    result, timings = _fake(34)
    parsed = json.loads(compact_line(result, timings))
    assert parsed["c8_comparable_r2"] is None
    assert parsed["suspect_freq_drift"] is None

    result["c8_comparable_r2"] = 4.1
    result["suspect_freq_drift"] = True
    parsed = json.loads(compact_line(result, timings))
    assert parsed["c8_comparable_r2"] == 4.1
    assert parsed["suspect_freq_drift"] is True


def test_compact_line_degrades_sf1_dict_first():
    """Overflow drops queries_sf1 then noop_vals before ever touching
    the (contract-critical) queries dict."""
    import bench
    from bench import compact_line

    result, timings = _fake(20)
    result["queries_noop_sink"] = {q: v * 2 for q, v in timings.items()}
    result["sf1_factor"] = 10
    result["queries_sf1"] = {
        f"extremely_long_sf1_query_name_padding_{i:03d}": 12.345
        for i in range(30)
    }
    result["value_sf1"] = 370.35
    line = compact_line(result, timings)
    assert len(line) < 1950
    parsed = json.loads(line)
    assert "queries_sf1" not in parsed     # dropped first
    assert parsed["value_sf1"] == 370.35   # subtotal survives
    assert len(parsed["noop_vals"]) == len(timings)  # noop survives
    assert len(parsed["queries"]) == len(timings)
