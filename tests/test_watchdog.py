"""step_timeout watchdog: a stuck decode step (peer death leaving SPMD
survivors blocked in a collective, a wedged device tunnel) must fail
in-flight and queued futures with a clean RuntimeError instead of
hanging clients (SURVEY §5 failure detection; VERDICT r4 #8). The
multi-process injection lives in test_distributed.py; this is the
deterministic local unit: _step is replaced by a sleep."""

import time

import numpy as np
import pytest

from onnx_rusty_inference_engine_tpu.models.gpt2 import TINY
from onnx_rusty_inference_engine_tpu.serve_llm import DecodeServer


def test_watchdog_fails_stuck_step():
    srv = DecodeServer(TINY, slots=2, prompt_len=4, max_len=64,
                       autostart=False)
    srv.step_timeout = 1.0
    real_step = srv._step

    def step_then_wedge():
        # the FIRST dispatch (compile) is exempt by design — run it for
        # real, then wedge every subsequent step
        if srv._step_compiled:
            time.sleep(60)
        else:
            real_step()

    srv._step = step_then_wedge
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, TINY.vocab_size, (4,)).astype(np.int64)
               for _ in range(3)]
    # 2 slots: two admitted (in-flight), one queued — both kinds must fail
    futs = [srv.submit(p, 40) for p in prompts]
    srv.start()
    t0 = time.perf_counter()
    for f in futs:
        with pytest.raises(RuntimeError, match="step_timeout|stopped"):
            f.result(timeout=60)
    assert time.perf_counter() - t0 < 45        # failed fast, no hang
    assert srv._watchdog_fired
    with pytest.raises(RuntimeError):           # dead server rejects work
        srv.submit(prompts[0], 4)


def test_watchdog_quiet_on_healthy_server():
    srv = DecodeServer(TINY, slots=2, prompt_len=4, max_len=24,
                       autostart=False)
    srv.step_timeout = 60.0                     # generous: never fires
    srv.start()
    rng = np.random.default_rng(1)
    toks = srv.generate(
        rng.integers(0, TINY.vocab_size, (4,)).astype(np.int64), 6,
        timeout=300)
    assert len(toks) == 6
    assert not srv._watchdog_fired
    srv.stop()
