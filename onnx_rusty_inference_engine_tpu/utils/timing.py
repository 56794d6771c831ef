"""Honest device-side timing.

Per-call wall timing over the remote-compile tunnel is unreliable (async
dispatch can overlap; block_until_ready returns optimistically fast for
cached buffers). This harness chains N iterations inside one jitted
lax.fori_loop — each iteration's input depends on the previous output — so
the device executes strictly sequentially and one dispatch covers the whole
measurement.
"""

from __future__ import annotations

import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp

__all__ = ["device_loop_timer", "engine_throughput"]


def device_loop_timer(step_fn: Callable, init_carry, iters: int = 200,
                      params=None) -> float:
    """Return seconds per iteration of step_fn (carry -> carry), measured as
    one on-device loop.

    Pass large weights via `params` (step_fn then takes (params, carry)) —
    values CLOSED OVER by step_fn are baked into the HLO as literals, which
    both bloats the program (the remote-compile tunnel rejects >~100MB
    uploads with HTTP 413) and defeats donation."""

    if params is None:
        @jax.jit
        def loop(carry):
            return jax.lax.fori_loop(0, iters, lambda _, c: step_fn(c), carry)

        args = (init_carry,)
    else:
        @jax.jit
        def loop(p, carry):
            return jax.lax.fori_loop(
                0, iters, lambda _, c: step_fn(p, c), carry)

        args = (params, init_carry)

    def sync(result):
        # block_until_ready can return optimistically through the remote
        # tunnel; fetching real bytes to host is the only hard sync.
        leaf = jax.tree_util.tree_leaves(result)[0]
        jax.device_get(leaf.ravel()[:1])

    out = loop(*args)  # compile + warm
    jax.block_until_ready(out)
    sync(out)
    t0 = time.perf_counter()
    out = loop(*args)
    jax.block_until_ready(out)
    sync(out)
    dt = time.perf_counter() - t0
    return dt / iters


def engine_throughput(engine, feed: Dict[str, jnp.ndarray], iters: int = 100
                      ) -> float:
    """Steady-state examples/sec of a compiled engine, device-resident I/O,
    sequential on-device iterations."""
    feed = {k: jax.device_put(jnp.asarray(v)) for k, v in feed.items()}
    fn = engine._fn
    first = next(iter(feed))

    def step(params, carry):
        out = fn(params, carry)
        # inject a scalar dependency so iterations serialize without
        # changing the input's value (x + 0 * f(out))
        dep = jnp.sum(next(iter(out.values())).astype(jnp.float32).ravel()[:1]) * 0
        new = dict(carry)
        new[first] = carry[first] + dep.astype(carry[first].dtype)
        return new

    sec = device_loop_timer(step, feed, iters, params=engine.params)
    batch = int(next(iter(feed.values())).shape[0])
    return batch / sec
