"""r16 protocol pins (VERDICT r15 #2, ADVICE r15 #3).

The bench quiet-host gate's threshold is part of the measurement protocol:
BASELINE.md's quiet line is 1-min load <1 on the 32-CPU protocol host, and
the r15 artifact of record showed what a laxer gate costs (load-2.43 start,
1.33x mean, one spurious sub-second breach on unchanged code). Pin the
resolution rule so the gate can't silently drift back.
"""

from __future__ import annotations

import os

import bench


def test_settle_threshold_is_quiet_line_on_protocol_host(monkeypatch):
    """0.25 on the 32-CPU host — the deep-settle line the r16 re-freeze
    evidence motivated (starts at 0.75-0.92 read 1.2-1.4x the medians;
    a deeply-idle start read 1.08x)."""
    monkeypatch.delenv("BENCH_SETTLE_LOAD", raising=False)
    monkeypatch.setattr(os, "cpu_count", lambda: 32)
    assert bench._settle_threshold() == 0.25


def test_settle_threshold_scales_by_cpu(monkeypatch):
    """ADVICE r15 #3: on a smaller machine a fixed 32-CPU value would
    under-protect — load 0.25 on 8 CPUs is not deeply settled."""
    monkeypatch.delenv("BENCH_SETTLE_LOAD", raising=False)
    monkeypatch.setattr(os, "cpu_count", lambda: 8)
    assert bench._settle_threshold() == 0.0625


def test_settle_threshold_env_override(monkeypatch):
    monkeypatch.setenv("BENCH_SETTLE_LOAD", "2.5")
    assert bench._settle_threshold() == 2.5


def test_settle_threshold_ignores_empty_env(monkeypatch):
    """A set-but-empty override must fall back, not crash float('')."""
    monkeypatch.setenv("BENCH_SETTLE_LOAD", "")
    monkeypatch.setattr(os, "cpu_count", lambda: 32)
    assert bench._settle_threshold() == 0.25


def test_settle_gate_returns_immediately_below_threshold(monkeypatch):
    """The gate must never sleep on an already-quiet host (and the suite
    JSON records whatever load it launched at)."""
    monkeypatch.setattr(os, "getloadavg", lambda: (0.12, 0.3, 0.5))
    load, waited = bench._settle_host(threshold=1.0)
    assert load == 0.12 and waited == 0


def test_settle_gate_skippable_for_iteration(monkeypatch):
    monkeypatch.setenv("BENCH_NO_SETTLE", "1")
    monkeypatch.setattr(os, "getloadavg", lambda: (9.9, 9.9, 9.9))
    load, waited = bench._settle_host(threshold=1.0)
    assert load == 9.9 and waited == 0


def _write_suite(tmp_path, name, queries, load):
    import json

    p = tmp_path / name
    p.write_text(json.dumps({"queries": queries, "load_at_start": load}))
    return str(p)


def _run_pool(args, settle_load="0.25"):
    import subprocess
    import sys

    env = dict(os.environ, BENCH_SETTLE_LOAD=settle_load)
    return subprocess.run(
        [sys.executable, "scripts/pool_medians.py", *args],
        capture_output=True, text=True, env=env,
    )


def test_pool_medians_refuses_non_quiet_inputs(tmp_path):
    """The re-freeze arithmetic must not accept a contended suite — the
    whole point of the r16 protocol is that targets come only from
    quiet-gate invocations. Since r17 (ADVICE r16 #1) the refusal line IS
    bench._settle_threshold() — the gate line — not the historical <1.0."""
    a = _write_suite(tmp_path, "a.json", {"q": 0.1}, 0.2)
    b = _write_suite(tmp_path, "b.json", {"q": 0.1}, 1.8)
    r = _run_pool([a, b])
    assert r.returncode == 1 and "REFUSING" in r.stderr
    # load 0.8 was legal under the old hardcoded <1.0 but is NOT quiet
    # under the gate line — the exact under-protection ADVICE r16 #1 named
    c = _write_suite(tmp_path, "c.json", {"q": 0.1}, 0.8)
    r = _run_pool([a, c])
    assert r.returncode == 1 and "REFUSING" in r.stderr
    # the override must be explicit and on the record (a named ceiling)
    assert _run_pool([a, b, "--max-load", "2.0"]).returncode == 0
    r = _run_pool([a, b, "--allow-load"])
    assert r.returncode == 1 and "--max-load" in r.stderr
    # the refusal threshold tracks BENCH_SETTLE_LOAD (i.e. the gate line)
    assert _run_pool([a, c], settle_load="0.9").returncode == 0


def test_pool_medians_refuses_incomplete_suites(tmp_path):
    """ADVICE r16 #3: a row absent from one input would silently pool over
    fewer runs — a truncated suite must be an error, not a quieter median."""
    a = _write_suite(tmp_path, "a.json", {"q": 0.1, "r": 0.2}, 0.1)
    b = _write_suite(tmp_path, "b.json", {"q": 0.1}, 0.1)
    r = _run_pool([a, b])
    assert r.returncode == 1 and "INCOMPLETE" in r.stderr and "'r'" in r.stderr


def test_pool_medians_median_and_drift_flag(tmp_path):
    import json

    runs = [
        _write_suite(tmp_path, f"s{i}.json", {"q": v, "r": 0.1}, 0.1)
        for i, v in enumerate([0.40, 0.44, 0.46, 1.20])
    ]
    prior = tmp_path / "prior.json"
    prior.write_text(json.dumps({"q": 300, "r": 100}))
    r = _run_pool([*runs, "--prior", str(prior)])
    assert r.returncode == 0
    meds = json.loads(r.stdout.strip().splitlines()[-1])
    # median of 400/440/460/1200 = 450 — the single 1.2 s outlier is damped
    assert meds == {"q": 450, "r": 100}
    # q moved 1.5x vs prior -> flagged; r moved 1.0x -> not flagged
    table = r.stdout
    assert "**CHECK**" in table
    assert table.count("**CHECK**") == 1


def test_settle_threshold_non_numeric_env_falls_back(monkeypatch, capsys):
    """ADVICE r16 #2: a malformed BENCH_SETTLE_LOAD must not crash the
    suite before it runs — fall back loudly to the computed default."""
    monkeypatch.setenv("BENCH_SETTLE_LOAD", "0.25x")
    monkeypatch.setattr(os, "cpu_count", lambda: 32)
    monkeypatch.setattr(bench, "_WARNED_SETTLE_LOAD", False)
    assert bench._settle_threshold() == 0.25
    assert "BENCH_SETTLE_LOAD" in capsys.readouterr().err


def test_settle_threshold_non_numeric_warns_once_per_process(monkeypatch, capsys):
    """ADVICE r17 #3: the fallback warning must not repeat on every
    _settle_threshold() call — pool_medians calls it per refusal check and
    a long-lived process would spam identical lines."""
    monkeypatch.setenv("BENCH_SETTLE_LOAD", "oops")
    monkeypatch.setattr(os, "cpu_count", lambda: 32)
    monkeypatch.setattr(bench, "_WARNED_SETTLE_LOAD", False)
    assert bench._settle_threshold() == 0.25
    assert bench._settle_threshold() == 0.25
    assert capsys.readouterr().err.count("BENCH_SETTLE_LOAD") == 1


def test_pool_medians_max_load_usage_errors(tmp_path):
    """ADVICE r17 #1: --max-load as the last argument or with a
    non-numeric value is a one-line usage error (rc 1), not a traceback."""
    a = _write_suite(tmp_path, "a.json", {"q": 0.1}, load=0.0)
    b = _write_suite(tmp_path, "b.json", {"q": 0.1}, load=0.0)
    for extra in (["--max-load"], ["--max-load", "fast"]):
        r = _run_pool([a, b] + extra)
        assert r.returncode == 1
        assert "usage: --max-load" in r.stderr
        assert "Traceback" not in r.stderr


def test_pool_medians_missing_load_message_never_points_at_max_load(tmp_path):
    """ADVICE r17 #2: a suite JSON with no load_at_start is refused with a
    message saying it is never poolable — not one pointing at --max-load,
    which cannot override an unrecorded start state."""
    import json

    a = _write_suite(tmp_path, "a.json", {"q": 0.1}, load=0.0)
    nl = tmp_path / "noload.json"
    nl.write_text(json.dumps({"queries": {"q": 0.1}}))
    r = _run_pool([a, str(nl)])
    assert r.returncode == 1
    assert "never poolable" in r.stderr
    assert "--max-load" not in r.stderr
