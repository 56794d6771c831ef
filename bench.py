"""Headline benchmark: SqueezeNet 1.0 INT8 images/sec/chip (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md), so `vs_baseline` reports
the north-star ratio: INT8 throughput / fp32 throughput on the same chip
(target >= 2.0). Measurement is device-resident and chained on-device
(utils/timing.py) so tunnel dispatch and H2D don't pollute the number.

Supervisor/worker split (round-3 lesson: a transient tunnel outage must not
cost a round its measurement):

- ``python bench.py``            supervisor: runs the worker in a child
  process under a watchdog, retries with backoff on failure/hang, and keeps
  staged results so a late crash still yields the best number measured.
- ``python bench.py --worker``   the actual measurement (one attempt).

Watchdog stages (worker reports progress on stderr as ``@stage <name>``):
  backend_up  jax.devices() returned        (BENCH_INIT_TIMEOUT, def 420 s)
  fp32_done   fp32 throughput measured      staged to $BENCH_STAGE_FILE
  whole attempt                             (BENCH_TIMEOUT, def 1800 s)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import threading
import time

ATTEMPTS = int(os.environ.get("BENCH_ATTEMPTS", "3"))
INIT_TIMEOUT = float(os.environ.get("BENCH_INIT_TIMEOUT", "420"))
ATTEMPT_TIMEOUT = float(os.environ.get("BENCH_TIMEOUT", "1800"))
BACKOFF = tuple(
    float(s) for s in os.environ.get("BENCH_BACKOFF", "20,60").split(","))


def worker() -> None:
    stage_path = os.environ.get("BENCH_STAGE_FILE")

    def stage(name: str, payload=None) -> None:
        print(f"@stage {name}", file=sys.stderr, flush=True)
        if stage_path and payload is not None:
            with open(stage_path, "a") as f:
                f.write(json.dumps(payload) + "\n")

    selftest = os.environ.get("BENCH_SELFTEST")
    if selftest:  # exercised by tests/test_bench_supervisor.py, no TPU needed
        if selftest == "hang":
            time.sleep(3600)
        stage("backend_up")
        stage("fp32_done", {"metric": "selftest_fp32", "value": 1.0,
                            "unit": "x", "vs_baseline": 1.0})
        if selftest == "crash_after_stage":
            sys.exit(3)
        if selftest == "crash_stage_depth":
            # attempt 1 gets further (stages int8) than attempt 2; both
            # crash — salvage must pick the DEEPEST attempt, not the last
            if stage_path and stage_path.endswith(".1"):
                stage("int8_done", {"metric": "selftest_int8_staged",
                                    "value": 2.0, "unit": "x",
                                    "vs_baseline": 2.0})
            sys.exit(3)
        print(json.dumps({"metric": "selftest_int8", "value": 2.0,
                          "unit": "x", "vs_baseline": 2.0}), flush=True)
        return

    import numpy as np
    import jax

    jax.devices()  # force backend bring-up so the init watchdog is honest
    stage("backend_up")

    from onnx_rusty_inference_engine_tpu.engine import Engine
    from onnx_rusty_inference_engine_tpu.graph import import_model
    from onnx_rusty_inference_engine_tpu.models import build_squeezenet
    from onnx_rusty_inference_engine_tpu.utils.timing import engine_throughput

    # batch 256: the per-kernel gaps on the time-shared chip are a fixed
    # per-step cost, so larger batches amortize them (b64 ~18-21k img/s,
    # b128 ~33k, b256 ~36k — experiments/batch_sweep.py); serving batches
    # this size are routine for offline/throughput-oriented inference
    batch = 256
    rng = np.random.default_rng(0)
    x = rng.standard_normal((batch, 3, 224, 224)).astype(np.float32)
    graph = import_model(build_squeezenet())
    feed = {"data_0": x}

    fp32_ips = engine_throughput(Engine(graph), feed)
    stage("fp32_done", {
        "metric": f"squeezenet1.0_fp32_images_per_sec_per_chip_b{batch}",
        "value": round(fp32_ips, 2),
        "unit": "images/s/chip",
        "vs_baseline": 1.0,
    })

    from onnx_rusty_inference_engine_tpu.quant import quantize_graph

    qgraph = quantize_graph(graph, calibration_inputs=[{"data_0": x[:8]}])
    eng8 = Engine(qgraph)
    int8_ips = engine_throughput(eng8, feed)
    result = {
        "metric": f"squeezenet1.0_int8_images_per_sec_per_chip_b{batch}",
        "value": round(int8_ips, 2),
        "unit": "images/s/chip",
        "vs_baseline": round(int8_ips / fp32_ips, 3),
    }
    # MFU accounting (VERDICT r4 #5): ops/s implied by the measured
    # throughput and XLA's own cost model for the compiled program,
    # against the chip's MEASURED int8 matmul peak (128 TOP/s, PERF.md
    # "Measured hardware ceilings" — NOT the 394 datasheet number the
    # virtualized chip never reaches).
    try:
        import jax.numpy as jnp

        ins = eng8._canon_inputs({"data_0": jnp.asarray(x)})
        ca = jax.jit(eng8._fn).lower(eng8.params, ins).compile(
            ).cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops_per_call = float(ca.get("flops", 0.0))
        if flops_per_call > 0:
            tops = flops_per_call * (int8_ips / batch) / 1e12
            result["tops_implied"] = round(tops, 2)
            result["mfu_vs_measured_peak"] = round(tops / 128.0, 3)
    except Exception as e:  # cost model is best-effort, never the bench
        print(f"[worker] cost_analysis unavailable: {e}",
              file=sys.stderr, flush=True)
    stage("int8_done", result)
    print(json.dumps(result), flush=True)


def _run_attempt(stage_file: str) -> str | None:
    """One supervised worker run. Returns the final JSON line or None."""
    env = dict(os.environ, BENCH_STAGE_FILE=stage_file)
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        start_new_session=True,  # so we can kill the exact process group
    )
    state = {"backend_up": False, "last_line": None}

    def pump_err():
        assert proc.stderr is not None
        for line in proc.stderr:
            line = line.rstrip()
            if line == "@stage backend_up":
                state["backend_up"] = True
            print(f"[worker] {line}", file=sys.stderr, flush=True)

    def pump_out():
        assert proc.stdout is not None
        for line in proc.stdout:
            line = line.strip()
            if line:
                state["last_line"] = line

    terr = threading.Thread(target=pump_err, daemon=True)
    tout = threading.Thread(target=pump_out, daemon=True)
    terr.start()
    tout.start()

    start = time.monotonic()
    while proc.poll() is None:
        elapsed = time.monotonic() - start
        if not state["backend_up"] and elapsed > INIT_TIMEOUT:
            print(f"[bench] backend init exceeded {INIT_TIMEOUT:.0f}s; "
                  "killing attempt", file=sys.stderr, flush=True)
            _kill(proc)
            return None
        if elapsed > ATTEMPT_TIMEOUT:
            print(f"[bench] attempt exceeded {ATTEMPT_TIMEOUT:.0f}s; "
                  "killing attempt", file=sys.stderr, flush=True)
            _kill(proc)
            return None
        time.sleep(2.0)
    tout.join(timeout=10)
    terr.join(timeout=10)
    if proc.returncode == 0 and state["last_line"]:
        return state["last_line"]
    print(f"[bench] worker exited rc={proc.returncode}",
          file=sys.stderr, flush=True)
    return None


def _kill(proc: subprocess.Popen) -> None:
    # kill the exact process group we started (never by pattern)
    try:
        os.killpg(proc.pid, 15)
        try:
            proc.wait(timeout=15)
            return
        except subprocess.TimeoutExpired:
            pass
        os.killpg(proc.pid, 9)
        proc.wait(timeout=15)
    except (ProcessLookupError, PermissionError):
        pass


def supervise() -> int:
    fd, base = tempfile.mkstemp(prefix="bench_stage_", suffix=".jsonl")
    os.close(fd)
    stage_files = []
    try:
        for attempt in range(1, ATTEMPTS + 1):
            print(f"[bench] attempt {attempt}/{ATTEMPTS}",
                  file=sys.stderr, flush=True)
            stage_file = f"{base}.{attempt}"   # per attempt: salvage picks
            stage_files.append(stage_file)     # the DEEPEST run, not the
            line = _run_attempt(stage_file)    # most recent one
            if line is not None:
                print(line, flush=True)
                return 0
            if attempt < ATTEMPTS:
                delay = BACKOFF[min(attempt - 1, len(BACKOFF) - 1)]
                print(f"[bench] retrying in {delay:.0f}s",
                      file=sys.stderr, flush=True)
                time.sleep(delay)
        # All attempts failed: salvage the metric from the attempt that
        # got FURTHEST (stage depth), not whichever wrote last.
        best, best_depth = None, 0
        for sf in stage_files:
            try:
                lines = [ln.strip() for ln in open(sf) if ln.strip()]
            except OSError:
                continue
            if len(lines) > best_depth:
                best, best_depth = lines[-1], len(lines)
        if best is not None:
            print("[bench] all attempts failed; emitting best staged metric",
                  file=sys.stderr, flush=True)
            print(best, flush=True)
            return 0
        return 1
    finally:
        for sf in stage_files + [base]:
            try:
                os.unlink(sf)
            except OSError:
                pass


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker()
    else:
        sys.exit(supervise())
