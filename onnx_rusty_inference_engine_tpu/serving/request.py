"""Request state and token-selection helpers for the serving stack.

Split out of the former serve_llm.py god-module (round-4 verdict item 6);
behavior is unchanged and serve_llm re-exports the public classes.
"""

from __future__ import annotations

import time
from concurrent.futures import Future
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp



class _Request:
    __slots__ = ("prompt", "max_new", "eos_id", "stop_sequences",
                 "future", "tokens", "adapter",
                 "temperature", "top_k", "top_p", "min_p", "rng", "seed",
                 "on_token", "logit_bias", "cancelled",
                 "frequency_penalty", "presence_penalty",
                 "t_enqueue")

    def __init__(self, prompt: np.ndarray, max_new: int,
                 eos_id: Optional[int] = None,
                 stop_sequences: Optional[List[List[int]]] = None,
                 adapter: int = 0,
                 temperature: float = 0.0,
                 top_k: Optional[int] = None,
                 top_p: Optional[float] = None,
                 min_p: Optional[float] = None,
                 seed: int = 0,
                 on_token=None,
                 logit_bias: Optional[Dict[int, float]] = None,
                 frequency_penalty: float = 0.0,
                 presence_penalty: float = 0.0):
        self.prompt = prompt
        self.max_new = max_new
        self.eos_id = eos_id
        self.stop_sequences = [list(q) for q in (stop_sequences or [])]
        self.adapter = int(adapter)
        self.temperature = float(temperature)
        self.top_k = top_k
        self.top_p = top_p
        self.min_p = min_p
        self.frequency_penalty = float(frequency_penalty)
        self.presence_penalty = float(presence_penalty)
        # per-request PRNG: sampling is deterministic in (seed, prompt
        # order) and independent across concurrent slots
        self.seed = int(seed)
        self.rng = np.random.default_rng(seed)
        self.on_token = on_token
        self.cancelled = False
        # additive per-token bias (OpenAI-style logit_bias): applied to
        # every selection step, greedy included; -inf-like values ban
        self.logit_bias = None
        if logit_bias:
            idx = np.fromiter((int(k) for k in logit_bias), np.int64)
            val = np.fromiter((float(v) for v in logit_bias.values()),
                              np.float64)
            self.logit_bias = (idx, val)
        self.future: Future = Future()
        self.tokens: List[int] = []
        self.t_enqueue = time.perf_counter()

    def emit(self, tok: int) -> None:
        """Append a generated token; stream it to the caller if asked.
        A broken callback must not poison the dispatcher (other slots'
        tokens ride the same step)."""
        self.tokens.append(tok)
        if self.on_token is not None:
            try:
                self.on_token(tok)
            except Exception:
                self.on_token = None


def _select_token(logits: np.ndarray, r: _Request) -> int:
    """Host-side per-request token selection: greedy at temperature 0,
    else categorical over temperature-scaled logits with optional top-k /
    nucleus / min-p filtering — the same filtering semantics as
    generate.Generator._select, per slot instead of per batch.
    frequency/presence penalties (OpenAI semantics) subtract from the
    logits of already-generated tokens before anything else, greedy
    included."""
    if (r.frequency_penalty or r.presence_penalty) and r.tokens:
        logits = logits.astype(np.float64).copy()
        seen, counts = np.unique(np.asarray(r.tokens, np.int64),
                                 return_counts=True)
        logits[seen] -= (r.frequency_penalty * counts
                         + r.presence_penalty)
    if r.logit_bias is not None:
        idx, val = r.logit_bias
        logits = logits.astype(np.float64).copy()
        logits[idx] += val
    if r.temperature == 0.0:
        return int(logits.argmax())
    l = logits.astype(np.float64) / r.temperature
    if r.top_k is not None:
        # clamp to [1, V]: an oversized top_k means "no filtering", and a
        # crash here would take down every slot sharing the step
        k = max(1, min(int(r.top_k), l.size))
        kth = np.sort(l)[-k]
        l = np.where(l >= kth, l, -np.inf)
    if r.top_p is not None:
        sl = np.sort(l)[::-1]
        probs = np.exp(sl - sl[0])
        probs /= probs.sum()
        cum = np.cumsum(probs)
        keep = cum - probs < r.top_p
        thresh = sl[keep].min() if keep.any() else sl[0]
        l = np.where(l >= thresh, l, -np.inf)
    if r.min_p is not None:
        # keep tokens whose probability >= min_p * p_max (the min-p
        # sampler): scale-invariant tail cutoff
        pm = np.exp(l - l[np.isfinite(l)].max())
        l = np.where(pm >= r.min_p, l, -np.inf)
    p = np.exp(l - l.max())
    p /= p.sum()
    return int(r.rng.choice(l.size, p=p))


def _fetch(x) -> np.ndarray:
    """Device -> host for serving bookkeeping. Direct on single-process
    arrays; on a multi-process mesh an output sharded over non-addressable
    devices is allgathered — a collective, valid because SPMD serving
    requires every process to reach the same fetches in the same order
    (deterministic admission: autostart=False + identical submissions)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable \
            and not x.is_fully_replicated:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def _bias_penalize(logits, bias, fpen, ppen, counts):
    """Shared logit epilogue of every multi_step scan body: additive
    logit_bias rows + OpenAI frequency/presence penalties from the
    per-slot generated-token histogram."""
    cf = counts.astype(jnp.float32)
    return logits + bias - (fpen[:, None] * cf + ppen[:, None] * (cf > 0))


def _device_select(logits, keys, pos, temp, tk, tp, mp):
    """On-device per-slot token selection for the multi_step scan bodies:
    [B, V] logits -> [B] tokens. Same filtering semantics as the host
    _select_token, vectorized per slot; neutral params (temp 0, tk = V,
    tp 1.0, mp 0.0) reduce a row to exact argmax. Randomness is keyed on
    (per-slot key, cache position): deterministic in (seed, prompt),
    invariant to K and to co-resident traffic."""
    V = logits.shape[-1]
    greedy = jnp.argmax(logits, axis=-1)
    l = logits / jnp.where(temp > 0, temp, 1.0)[:, None]
    sl = jnp.sort(l, axis=-1)                              # ascending
    kth = jnp.take_along_axis(sl, (V - tk)[:, None].astype(jnp.int32),
                              axis=-1)
    l = jnp.where(l >= kth, l, -jnp.inf)
    # descending sorted view of the top-k-masked row, derived from the ONE
    # sort above (masking the sorted array == sorting the masked array)
    sld = jnp.where(sl >= kth, sl, -jnp.inf)[:, ::-1]
    probs = jax.nn.softmax(sld, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = cum - probs < tp[:, None]
    # host fallback parity: an empty keep set (top_p == 0) keeps the top-1
    thresh = jnp.where(jnp.any(keep, axis=-1, keepdims=True),
                       jnp.min(jnp.where(keep, sld, jnp.inf), axis=-1,
                               keepdims=True),
                       sld[:, :1])
    l = jnp.where(l >= thresh, l, -jnp.inf)
    pm = jnp.exp(l - jnp.max(l, axis=-1, keepdims=True))
    l = jnp.where(pm >= mp[:, None], l, -jnp.inf)

    def draw(kd, p, row):
        return jax.random.categorical(jax.random.fold_in(kd, p), row)

    samp = jax.vmap(draw)(keys, pos, l)
    return jnp.where(temp > 0, samp, greedy)


def _hits_stop(r: "_Request") -> bool:
    """True when r.tokens ends with any registered stop sequence."""
    for q in r.stop_sequences:
        if q and len(r.tokens) >= len(q) and r.tokens[-len(q):] == q:
            return True
    return False

