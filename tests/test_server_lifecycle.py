"""Server lifecycle: request cancellation, drain shutdown, and the
no-hanging-futures guarantee on stop()."""

from concurrent.futures import CancelledError

import numpy as np
import pytest

from onnx_rusty_inference_engine_tpu.models.gpt2 import TINY
from onnx_rusty_inference_engine_tpu.serve_llm import DecodeServer

rng = np.random.default_rng(41)


def _prompt(n=4):
    return rng.integers(0, TINY.vocab_size, (n,)).astype(np.int64)


def test_cancel_in_flight_request():
    srv = DecodeServer(TINY, slots=2, prompt_len=4, max_len=128)
    try:
        fut = srv.submit(_prompt(), 100)          # long generation
        assert srv.cancel(fut)
        with pytest.raises(CancelledError):
            fut.result(timeout=300)
        # the slot is reusable afterwards
        out = srv.submit(_prompt(), 3).result(timeout=300)
        assert len(out) == 3
    finally:
        srv.stop()
    assert not srv.cancel(fut)  # already finalized: not a live request


def test_cancel_queued_request():
    """More requests than slots: cancelling one still in the queue fails
    it without it ever occupying a slot."""
    srv = DecodeServer(TINY, slots=1, prompt_len=4, max_len=64)
    try:
        f1 = srv.submit(_prompt(), 40)
        f2 = srv.submit(_prompt(), 5)             # queued behind f1
        assert srv.cancel(f2)
        with pytest.raises(CancelledError):
            f2.result(timeout=300)
        assert f1.result(timeout=300)             # f1 unaffected
    finally:
        srv.stop()


def test_stop_fails_outstanding_futures():
    """stop() without drain must not leave callers hanging."""
    srv = DecodeServer(TINY, slots=1, prompt_len=4, max_len=128)
    f1 = srv.submit(_prompt(), 120)
    f2 = srv.submit(_prompt(), 5)                 # queued
    srv.stop()
    with pytest.raises(RuntimeError, match="server stopped"):
        f1.result(timeout=30)
    with pytest.raises(RuntimeError, match="server stopped"):
        f2.result(timeout=30)


def test_stop_drain_finishes_everything():
    srv = DecodeServer(TINY, slots=2, prompt_len=4, max_len=32)
    futs = [srv.submit(_prompt(), 6) for _ in range(5)]  # > slots: queued
    srv.stop(drain=True)
    for f in futs:
        assert len(f.result(timeout=5)) == 6      # already resolved
    assert srv.stats()["requests"] == 5


def test_submit_after_stop_raises():
    srv = DecodeServer(TINY, slots=1, prompt_len=4, max_len=16)
    srv.stop()
    with pytest.raises(RuntimeError, match="server stopped"):
        srv.submit(_prompt(), 2)


def test_oversized_top_k_is_clamped():
    """top_k > vocab must not crash the shared step (it means 'no
    filtering'), and must not take down other slots."""
    srv = DecodeServer(TINY, slots=2, prompt_len=4, max_len=16)
    try:
        out = srv.submit(_prompt(), 3, temperature=1.0, top_k=10 ** 6,
                         seed=1).result(timeout=300)
    finally:
        srv.stop()
    assert len(out) == 3


def test_multi_step_accepts_logit_bias():
    """Round-4: logit_bias rides the device loop (dense [B, V] bias rows
    in the scan); a banned token must never be emitted."""
    srv = DecodeServer(TINY, slots=2, prompt_len=4, max_len=16,
                       multi_step=2)
    try:
        base = srv.submit(_prompt(), 4).result(timeout=300)
        banned = base[0]
        out = srv.submit(_prompt(), 4,
                         logit_bias={banned: -1e9}).result(timeout=300)
        assert banned not in out
    finally:
        srv.stop()


def test_failed_chunked_admission_frees_slot():
    """ADVICE r3: if chunked admission raises mid-way (after touching
    per-slot state), the request must fail cleanly AND the slot must be
    reusable — not left occupied by a dead request."""
    srv = DecodeServer(TINY, slots=1, prompt_len=4, max_len=32,
                       chunked_prefill=True, chunk=4)
    try:
        boom = RuntimeError("cache lookup exploded")
        orig = srv._pcache_prefix

        def bad(prompt, adapter):
            raise boom

        srv._pcache_prefix = bad
        fut = srv.submit(_prompt(), 3)
        with pytest.raises(RuntimeError, match="cache lookup exploded"):
            fut.result(timeout=300)
        srv._pcache_prefix = orig
        # the single slot must be free again for the next request
        out = srv.submit(_prompt(), 3).result(timeout=300)
        assert len(out) == 3
    finally:
        srv.stop()


def test_stop_before_start_fails_queued_futures():
    """autostart=False + stop() without start(): queued futures must
    fail with RuntimeError, not hang (and join() must not raise on the
    never-started thread)."""
    srv = DecodeServer(TINY, slots=1, prompt_len=4, max_len=16,
                       autostart=False)
    fut = srv.submit(_prompt(), 2)
    srv.stop()
    with pytest.raises(RuntimeError, match="server stopped"):
        fut.result(timeout=30)
