"""bench.py supervisor mechanics: success, staged-salvage, hang-kill.

Round-3 lesson (VERDICT.md "What's weak" #1): a transient tunnel outage
must never again cost a round its measurement. These tests drive the
supervisor against a stub worker (BENCH_SELFTEST) so no TPU is needed.
"""

import json
import os
import pathlib
import subprocess
import sys

BENCH = str(pathlib.Path(__file__).resolve().parent.parent / "bench.py")


def _run(env_extra, timeout=60):
    env = dict(os.environ, BENCH_BACKOFF="0.5", **env_extra)
    return subprocess.run([sys.executable, BENCH], capture_output=True,
                          text=True, env=env, timeout=timeout)


def test_success_forwards_final_json():
    r = _run({"BENCH_SELFTEST": "ok", "BENCH_ATTEMPTS": "1"})
    assert r.returncode == 0
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["metric"] == "selftest_int8"
    assert out["vs_baseline"] == 2.0


def test_crash_after_stage_salvages_partial_metric():
    r = _run({"BENCH_SELFTEST": "crash_after_stage", "BENCH_ATTEMPTS": "2"})
    # worker crashes every attempt, but fp32 stage was recorded: supervisor
    # must still emit it and exit 0 so the driver records a number.
    assert r.returncode == 0
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["metric"] == "selftest_fp32"


def test_init_watchdog_kills_hung_worker():
    # A worker that never reports backend_up gets killed at INIT_TIMEOUT.
    # BENCH_SELFTEST=hang sleeps forever before staging anything.
    r = _run({"BENCH_SELFTEST": "hang", "BENCH_ATTEMPTS": "1",
              "BENCH_INIT_TIMEOUT": "3", "BENCH_TIMEOUT": "10"}, timeout=90)
    assert r.returncode == 1
    assert "backend init exceeded" in r.stderr


def test_salvage_prefers_deepest_attempt_not_latest():
    """A later attempt's shallower stage must not shadow an earlier
    attempt's deeper (better) staged metric."""
    r = _run({"BENCH_SELFTEST": "crash_stage_depth", "BENCH_ATTEMPTS": "2"})
    assert r.returncode == 0
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["metric"] == "selftest_int8_staged"
