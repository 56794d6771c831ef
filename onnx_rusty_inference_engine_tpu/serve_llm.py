"""Token-level continuous batching for decoder models (GPT-2 family).

The LLM analog of serve.InferenceServer's request batching: ONE compiled
decode program over a fixed pool of B slots runs every step; finished
sequences free their slot and newly admitted prompts are prefetched into it
while the other slots keep generating. Per-slot cache offsets are native to
the decode graph (models/gpt2.build_gpt2_decode takes pos [B]), so admission
never recompiles or stalls resident sequences — the standard
continuous-batching serving design (vLLM-style scheduling, static-shape
XLA-friendly realization).

Mechanics
---------
- prompts are right-padded to the prefill graph's length; padded positions
  write garbage K/V beyond the true prompt, but the decode graph's per-slot
  validity mask (k <= pos) hides them, and each is overwritten by the step
  that reaches it — so results are EXACTLY the isolated-generation tokens
  (asserted in tests/test_serve_llm.py).
- inactive slots park at pos = max_len - 1: their cache row is rewritten by
  that same step's Where update before anything can attend to it, so they
  never corrupt state; their logits are ignored.
- the KV cache can be INT8 (kv_dtype="int8"): the decode graph carries the
  QDQ (see build_gpt2_decode), the server quantizes prefill K/V into the
  slot with the same per-head scales it feeds the graph.
"""

from __future__ import annotations

import queue
import threading
import time
from collections import OrderedDict
from concurrent.futures import Future
from typing import Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from .engine import Engine
from .graph import import_model
from .models.gpt2 import GPT2Config, build_gpt2, build_gpt2_decode

__all__ = ["DecodeServer", "Seq2SeqServer", "SpeculativeServer"]


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


class _ServerBase:
    """Shared continuous-batching server core: slot pool, admission queue,
    dispatcher thread, request finishing, serving stats. Subclasses
    provide `_admit(slot, request)` and `_step()` (one batched decode
    dispatch over the slot pool) plus their own compiled engines/caches.

    One implementation of the loop/finish/failure-isolation logic serves
    every family (decoder-only, encoder-decoder, ASR) — the round-2
    DecodeServer/Seq2SeqServer duplication, factored."""

    def _init_sampling_state(self, slots: int, vocab: int,
                             device_multi: bool) -> None:
        """Per-slot sampling state for device-resident multi_step paths:
        the scan bodies consume these as [B] device arrays, so sampled /
        biased / penalized requests ride the same K-step dispatch as
        greedy ones. Neutral values make a slot exactly greedy.
        device_multi gates the lazy [B, V] counts/bias allocation."""
        self._vocab = int(vocab)
        self._device_multi = bool(device_multi)
        self._temp = np.zeros((slots,), np.float32)
        self._topk = np.full((slots,), vocab, np.int32)
        self._topp = np.ones((slots,), np.float32)
        self._minp = np.zeros((slots,), np.float32)
        self._fpen = np.zeros((slots,), np.float32)
        self._ppen = np.zeros((slots,), np.float32)
        self._skeys = np.zeros((slots, 2), np.uint32)
        # dense [B, V] device state, allocated lazily on the first
        # admission that needs it (counts: generated-token histogram for
        # frequency/presence penalties; bias: additive logit_bias rows)
        self._counts: Optional[jax.Array] = None
        self._bias: Optional[jax.Array] = None

    @staticmethod
    def _needs_device_sampling(r: _Request) -> bool:
        return bool(r.temperature > 0.0 or r.logit_bias is not None
                    or r.frequency_penalty or r.presence_penalty)

    def _set_slot_sampling(self, slot: int, r: _Request) -> None:
        """Write a claimed slot's sampling config into the per-slot device
        arrays the multi_step scan consumes. Neutral values reduce a slot
        to exact greedy, so one compiled program serves mixed traffic."""
        V = self._vocab
        self._temp[slot] = r.temperature
        self._topk[slot] = max(1, min(int(r.top_k), V)) if r.top_k else V
        self._topp[slot] = 1.0 if r.top_p is None else r.top_p
        self._minp[slot] = 0.0 if r.min_p is None else r.min_p
        self._fpen[slot] = r.frequency_penalty
        self._ppen[slot] = r.presence_penalty
        # threefry PRNGKey(seed) layout, computed host-side (no dispatch)
        self._skeys[slot] = (np.uint32(r.seed >> 32),
                             np.uint32(r.seed & 0xFFFFFFFF))
        if (self._device_multi and self._counts is None
                and self._needs_device_sampling(r)):
            self._counts = jnp.zeros((self.B, V), jnp.int32)
            self._bias = jnp.zeros((self.B, V), jnp.float32)
        if self._counts is not None:
            row = np.zeros((V,), np.int32)
            for t in r.tokens:  # admission-emitted tokens count too
                row[t] += 1
            self._counts = self._counts.at[slot].set(jnp.asarray(row))
            brow = np.zeros((V,), np.float32)
            if r.logit_bias is not None:
                idx, val = r.logit_bias
                brow[idx] = val.astype(np.float32)
            self._bias = self._bias.at[slot].set(jnp.asarray(brow))

    def _emit_multi_block(self, toks: np.ndarray, K: int) -> None:
        """Host bookkeeping after a K-step device block (pure decode):
        emit each active slot's K tokens in order, finishing early on
        max_new/eos/stop (overshoot tokens are discarded; the slot's
        over-advanced cache rows are dead state masked by pos on
        re-admission)."""
        self.steps += 1
        self._occupancy_sum += len(self._active())
        for s in self._active():
            r = self._req[s]
            for j in range(K):
                self._pos[s] += 1
                tok = int(toks[s, j])
                r.emit(tok)
                self._last_tok[s] = tok
                self.tokens_out += 1
                if (len(r.tokens) >= r.max_new or tok == r.eos_id
                        or _hits_stop(r)):
                    self._finish(s, r)
                    break

    def _start_dispatch(self, slots: int, autostart: bool = True) -> None:
        """Call LAST in subclass __init__ (after all slot state exists).
        autostart=False defers the dispatcher thread until start() — the
        deterministic-admission recipe: pre-queue requests first, so the
        loop admits them in submission order with no timing races (SPMD
        multi-host serving requires every process to admit identical
        requests in identical order)."""
        self.B = slots
        self._req: List[Optional[_Request]] = [None] * slots
        self._q: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._by_future: Dict[Future, _Request] = {}
        self._submit_lock = threading.Lock()
        self._running = True
        self._draining = False
        self.steps = 0
        self.tokens_out = 0
        self.requests_done = 0
        self._occupancy_sum = 0
        self._latencies: List[float] = []
        self._thread = threading.Thread(target=self._loop, daemon=True)
        if autostart:
            self._thread.start()

    def start(self) -> None:
        """Launch the dispatcher of a server built with autostart=False
        (no-op if already running; a stopped server cannot restart)."""
        if not self._thread.is_alive():
            self._thread.start()

    # -- client API ------------------------------------------------------
    def generate(self, prompt, max_new_tokens: int,
                 timeout: Optional[float] = None,
                 eos_id: Optional[int] = None,
                 **kw) -> List[int]:
        return self.submit(prompt, max_new_tokens, eos_id=eos_id,
                           **kw).result(timeout)

    def stop(self, drain: bool = False) -> None:
        """Shut the dispatcher down. drain=True finishes every admitted
        AND queued request first; drain=False (default) stops after the
        current step and FAILS outstanding futures with RuntimeError —
        callers never hang on a stopped server."""
        if drain:
            self._draining = True
        with self._submit_lock:
            # _enqueue holds this lock across its running-check + put, so
            # after this flip no new request can slip past both drains
            self._running = False
        self._q.put(None)
        if self._thread.ident is not None:  # autostart=False, never started
            self._thread.join(timeout=300 if drain else 30)
        self._drain_queue("server stopped before request was admitted")

    def _drain_queue(self, msg: str) -> None:
        # non-blocking: a still-alive dispatcher (e.g. blocked in a long
        # first compile) may be draining concurrently — get() would
        # deadlock on the race where it wins the last item
        while True:
            try:
                r = self._q.get_nowait()
            except queue.Empty:
                return
            if r is not None:
                self._fail(None, r, RuntimeError(msg))

    def cancel(self, future: Future) -> bool:
        """Request-level cancellation: the slot is freed at the next step
        boundary and the future fails with CancelledError. Queued (not
        yet admitted) requests cancel the same way. True if the future
        belongs to a live request of this server."""
        r = self._by_future.get(future)
        if r is None:
            return False
        r.cancelled = True
        return True

    def stats(self) -> Dict[str, float]:
        """Serving counters (the LLM analog of serve.ServerStats)."""
        lat = np.asarray(self._latencies) if self._latencies else np.zeros(1)
        return {
            "requests": self.requests_done,
            "decode_steps": self.steps,
            "tokens_out": self.tokens_out,
            "tokens_per_step": self.tokens_out / max(1, self.steps),
            "mean_slot_occupancy": self._occupancy_sum / max(1, self.steps)
                                   / self.B,
            "p50_latency_s": float(np.percentile(lat, 50)),
            "p99_latency_s": float(np.percentile(lat, 99)),
        }

    # -- slot lifecycle ---------------------------------------------------
    def _enqueue(self, r: _Request) -> Future:
        # lock pairs with stop()'s _running flip: either we raise, or our
        # put is in the queue before the flip and a drain will see it
        with self._submit_lock:
            if not self._running:
                raise RuntimeError("server stopped")
            self._by_future[r.future] = r
            self._q.put(r)
        return r.future

    def _clear_slot(self, slot: int) -> None:
        self._req[slot] = None
        self._pos[slot] = self.max_len - 1      # park

    def _finish(self, slot_or_none, r: _Request) -> None:
        r.future.set_result(r.tokens)
        self._by_future.pop(r.future, None)
        self.requests_done += 1
        self._latencies.append(time.perf_counter() - r.t_enqueue)
        if slot_or_none is not None:
            self._clear_slot(slot_or_none)

    def _fail(self, slot_or_none, r: _Request, exc: Exception) -> None:
        if not r.future.done():
            r.future.set_exception(exc)
        self._by_future.pop(r.future, None)
        if slot_or_none is not None:
            self._clear_slot(slot_or_none)

    def _active(self) -> List[int]:
        return [i for i, r in enumerate(self._req) if r is not None]

    # -- dispatcher -------------------------------------------------------
    def _loop(self) -> None:
        from concurrent.futures import CancelledError

        while True:
            if not self._running:
                # drain mode keeps stepping until all work completes;
                # otherwise exit now (leftovers failed below)
                if not self._draining or (not self._active()
                                          and self._q.empty()):
                    break
            # fill free slots from the queue (non-blocking when busy)
            free = [i for i, r in enumerate(self._req) if r is None]
            block = not self._active() and self._running
            for slot in free:
                try:
                    r = self._q.get(timeout=0.05 if block else 0)
                except queue.Empty:
                    break
                if r is None:
                    continue  # stop sentinel; loop head decides exit
                if r.cancelled:
                    self._fail(None, r, CancelledError())
                    continue
                try:
                    self._admit(slot, r)
                except Exception as e:  # request-level failure isolation
                    # pass the slot: a partially-claimed admission must
                    # not leave a dead request occupying it (clearing an
                    # unclaimed slot is a harmless park)
                    self._fail(slot, r, e)
                block = False
            # cancellation sweep: freed at the step boundary
            for s in self._active():
                if self._req[s].cancelled:
                    self._fail(s, self._req[s], CancelledError())
            if self._active():
                try:
                    self._step()
                except Exception as e:
                    for s in self._active():
                        self._fail(s, self._req[s], e)
        # stopped without drain: no caller may hang on a dead server
        for s in self._active():
            self._fail(s, self._req[s],
                       RuntimeError("server stopped with request in flight"))
        self._drain_queue("server stopped before request was admitted")


class DecodeServer(_ServerBase):
    """Continuous-batching generation server over a slot pool.

    Parameters
    ----------
    cfg: model config (weights are seeded; same seed == same weights as
        generate.Generator, which the tests exploit for exactness).
    slots: decode batch size B — resident sequences generated per step.
    prompt_len: prefill graph length; prompts are right-padded to it.
    max_len: fixed KV-cache length.
    kv_dtype: "float32" or "int8" (in-graph QDQ cache).
    len_buckets: ascending cache lengths ending at max_len. The decode
        step's HBM traffic scales with the CACHE length, so the pool
        runs at the smallest bucket covering what live requests still
        need — one compiled program per bucket (weights shared), cache
        rows pad/slice on switch, growth at admission, shrink at step
        boundaries (experiments/kv_len_probe.py for the economics).
    """

    def __init__(
        self,
        cfg: GPT2Config,
        *,
        slots: int = 4,
        prompt_len: int = 8,
        max_len: int = 32,
        kv_dtype: str = "float32",
        int4_weights: bool = False,
        seed: int = 0,
        mesh=None,
        param_sharding_fn=None,
        family: str = "gpt2",
        prompt_buckets: Optional[Sequence[int]] = None,
        prefill_dtype: str = "float32",
        chunked_prefill: bool = False,
        chunk: int = 8,
        multi_step: int = 0,
        prompt_cache: int = 0,
        lora_bank=None,
        lora_alpha: float = 16.0,
        autostart: bool = True,
        len_buckets: Optional[Sequence[int]] = None,
    ):
        self.cfg = cfg
        self.B = slots
        self.prompt_len = prompt_len
        self.max_len = max_len
        # int4: nibble-packed [B,H,L,hd/2] int8 cache (gpt2 builder);
        # flows through every int8 code path — only the quantize/pack
        # math and the amax/7 scales differ
        self._int4_kv = kv_dtype == "int4"
        self.kv_dtype = np.dtype(np.int8 if self._int4_kv else kv_dtype)
        self._kv_qmax = 7.0 if self._int4_kv else 127.0
        if self._int4_kv and family not in ("gpt2", "llama"):
            raise NotImplementedError(
                "int4 KV serving needs a nibble-packing decode graph "
                "(gpt2/llama only)")
        if self._int4_kv and chunked_prefill:
            raise NotImplementedError(
                "int4 KV with chunked_prefill (shadow calibration) is "
                "not implemented; use bucketed prefill")
        # prompts pad to the smallest compiled bucket >= their length:
        # one XLA program per bucket (compiled lazily on first use), so
        # short prompts don't pay full-length prefill FLOPs.
        # (chunked_prefill mode never builds prefill engines; buckets and
        # prompt_len are ignored there)
        self.prompt_buckets = tuple(sorted(prompt_buckets or (prompt_len,)))
        assert chunked_prefill or self.prompt_buckets[-1] == prompt_len

        from .models import decoder_family

        build_prefill, build_decode, int8_kv_ok = decoder_family(family)
        if self.kv_dtype == np.int8 and not int8_kv_ok:
            raise NotImplementedError(
                f"{family}: in-graph INT8 KV cache not implemented")
        # chunked prefill: ONE chunk-C decode graph serves BOTH prompt
        # ingestion (C tokens/step into a slot) and decoding (1 real
        # token/step) — no per-bucket prefill compiles, prompts of any
        # length <= max_len, mixed prefill/decode batches every step
        # (the vLLM/Sarathi-style unified loop, TPU-shaped: one program).
        self.chunked = bool(chunked_prefill)
        self.chunk = int(chunk)
        if self.chunked and self.chunk < 1:
            raise ValueError("chunk must be >= 1")
        # multi_step=K: K greedy decode steps inside ONE dispatch
        # (lax.scan over time with on-device argmax + KV carry, same
        # machinery as generate.Generator(device_loop=K)). Emitted tokens
        # are exactly the single-step stream; the tradeoffs are admission/
        # stop granularity of K tokens and discarded overshoot after a
        # slot finishes mid-block. The served-latency lever on a chip
        # where each dispatch pays a host roundtrip (PERF.md).
        self.multi_step = int(multi_step)
        # K-step device functions are compiled per CACHE LENGTH (the
        # len_buckets lever swaps static shapes): dicts keyed _cur_len
        self._multi_fns: Dict[int, object] = {}
        self._multi_sampled_fns: Dict[int, object] = {}
        self._chunked_multi_fns: Dict[int, object] = {}
        # prompt/prefix KV cache: up to `prompt_cache` prompts' presents
        # kept host-side (LRU). Bucketed-prefill mode reuses EXACT prompt
        # matches (skips the whole prefill); chunked mode reuses the
        # longest cached PREFIX (the shared-system-prompt case: only the
        # suffix streams through the chunk graph). Entries store the
        # cache-dtype KV, so replayed admissions are bit-identical.
        self.prompt_cache = int(prompt_cache)
        self._pcache: "OrderedDict[bytes, dict]" = OrderedDict()
        self.prefix_hits = 0
        self.prefix_tokens_saved = 0
        dkw = {"kv_dtype": kv_dtype} if int8_kv_ok else {}
        if self.chunked:
            dkw["chunk"] = self.chunk
        pkw = ({"past_len": 0} if family == "gpt2" else {})
        # multi-LoRA: every graph (decode, shadow, each prefill bucket)
        # gets the batched-adapter rewrite; per-slot adapter indices feed
        # the shared `lora_idx` input each step, so one compiled program
        # serves a mixed-adapter batch (lora.py)
        self._lora = lora_bank is not None

        def _attach(g):
            if not self._lora:
                return g
            from .lora import attach_lora

            return attach_lora(g, lora_bank, alpha=lora_alpha)

        # KV-length buckets: the decode step's HBM traffic scales with
        # the CACHE length, not the live sequence lengths — serving at
        # max_len when every live request fits a quarter of it wastes
        # K/V bandwidth (experiments/kv_len_probe.py quantifies). With
        # len_buckets the slot pool's cache length tracks what live
        # requests actually need: one compiled decode program per bucket
        # (weights shared on device), cache rows pad/slice on switch.
        self._len_buckets: Optional[Tuple[int, ...]] = None
        if len_buckets is not None:
            bks = tuple(sorted(int(b) for b in len_buckets))
            if not bks or bks[-1] != max_len:
                raise ValueError("len_buckets must end at max_len")
            if chunked_prefill and kv_dtype == "int8":
                raise NotImplementedError(
                    "len_buckets with the chunked int8 shadow-calibration "
                    "phase is not supported; use bucketed prefill")
            self._len_buckets = bks
        self._cur_len = self._len_buckets[0] if self._len_buckets \
            else max_len
        self.cache_resizes = 0

        def make_decode_graph(L: int):
            g = _attach(import_model(build_decode(
                cfg, batch=slots, max_len=L, seed=seed, **dkw)))
            if int4_weights:
                from .quant import quantize_weights_int4

                g = quantize_weights_int4(g)
            return g

        self._make_decode_graph = make_decode_graph
        # chunked + int8 KV: no bucketed prefill exists to calibrate the
        # per-head scales from, so steps run a SHADOW fp32 chunk graph
        # until the first request finishes prefilling; the fp32 cache is
        # then quantized once and serving continues on the int8 graph
        # (same pattern as generate.Seq2SeqGenerator)
        self._shadow_graph = None
        if self.chunked and self.kv_dtype == np.int8:
            self._shadow_graph = _attach(import_model(build_decode(
                cfg, batch=slots, max_len=max_len, seed=seed,
                chunk=self.chunk)))
            if int4_weights:
                from .quant import quantize_weights_int4

                # same weights as the int8 graph — tokens must not switch
                # models mid-stream when calibration ends
                self._shadow_graph = quantize_weights_int4(
                    self._shadow_graph)
        ekw = dict(mesh=mesh, param_sharding_fn=param_sharding_fn)
        self._ekw = ekw
        self._prefill_engines: Dict[int, Engine] = {}

        # prefill_dtype="w8a8": dynamic W8A8 matmuls on the MXU-bound
        # bucketed prefill (386k vs bf16 234k tok/s on chip, PERF.md);
        # remaining ops run bf16. Applied after the LoRA attach so the
        # adapter rewrite still finds its base MatMuls. Chunked-prefill
        # mode has no prefill engines (prompts ride the decode chunk
        # graph), so the knob would be a silent no-op there — reject it
        # rather than hand back plain decode-dtype prefill unannounced.
        if self.chunked and prefill_dtype != "float32":
            raise ValueError(
                f"prefill_dtype={prefill_dtype!r} has no effect with "
                "chunked_prefill=True (prompts ride the decode chunk "
                "graph, there are no prefill engines); drop the knob or "
                "use bucketed prefill")
        w8a8_prefill = prefill_dtype == "w8a8"
        prefill_engine_dtype = "bfloat16" if w8a8_prefill else prefill_dtype

        def make_prefill(bucket: int) -> Engine:
            g = _attach(import_model(build_prefill(
                cfg, batch=1, seq_len=bucket, with_presents=True,
                seed=seed, **pkw)))
            if int4_weights and not w8a8_prefill:
                from .quant import quantize_weights_int4

                g = quantize_weights_int4(g)
            if w8a8_prefill:
                from .quant import quantize_matmuls_w8a8

                g = quantize_matmuls_w8a8(g)
            # prefill is MXU-bound; bf16 measured 1.69x on chip (PERF.md)
            return Engine(g, dtype=prefill_engine_dtype, **ekw)

        self._make_prefill = make_prefill
        # decode engines keyed by cache length; all share ONE device
        # parameter set (the length only changes cache/static shapes)
        self._decode_engines: Dict[int, Engine] = {
            self._cur_len: Engine(make_decode_graph(self._cur_len), **ekw)}
        self._shadow = (Engine(self._shadow_graph, **ekw)
                        if self._shadow_graph is not None else None)

        cache_np = np.int8 if self.kv_dtype == np.int8 else np.float32
        # cache shapes come from the decode graph itself (GQA families carry
        # n_kv_head heads, not n_head); the shadow-calibration phase keeps
        # the cache fp32 regardless
        boot_np = np.float32 if self._shadow is not None else cache_np
        self._cache: Dict[str, jax.Array] = {
            spec.name: jnp.zeros(spec.concrete_shape(batch=slots), boot_np)
            for spec in self.decode.graph.inputs
            if spec.name.startswith("past_")}
        self._kv_scales: Optional[Dict[str, np.ndarray]] = None

        # per-slot state (dispatcher thread only)
        self._pos = np.full((slots,), max_len - 1, np.int64)  # parked
        self._last_tok = np.zeros((slots,), np.int64)
        self._pending: List[Optional[np.ndarray]] = [None] * slots
        self._adapter = np.zeros((slots,), np.int64)
        self._init_sampling_state(slots, cfg.vocab_size,
                                  bool(self.multi_step))
        # chunked × multi_step: pending prompt suffixes live ON DEVICE so
        # the K-step scan can feed chunks without host round-trips;
        # _pbuf_len mirrors each row's admitted suffix length
        self._pbuf: Optional[jax.Array] = None
        if self.chunked and self.multi_step:
            self._pbuf = jnp.zeros((slots, max_len), jnp.int32)
        self._pbuf_len = np.zeros((slots,), np.int64)
        self._start_dispatch(slots, autostart)

    @property
    def decode(self) -> Engine:
        """The decode engine for the CURRENT cache length (len_buckets:
        per-bucket programs compiled lazily, one shared parameter set)."""
        eng = self._decode_engines.get(self._cur_len)
        if eng is None:
            base = next(iter(self._decode_engines.values()))
            eng = Engine(self._make_decode_graph(self._cur_len),
                         share_params_with=base, **self._ekw)
            self._decode_engines[self._cur_len] = eng
        return eng

    # -- KV-length buckets -------------------------------------------------
    def _required_len(self) -> int:
        """Cache rows the LIVE requests still need: per slot, current
        position + un-ingested prompt + tokens left to generate."""
        need = 2
        for s in self._active():
            r = self._req[s]
            pend = 0 if self._pending[s] is None else \
                int(self._pending[s].size)
            need = max(need, int(self._pos[s]) + pend
                       + (r.max_new - len(r.tokens)))
        return need

    def _bucket_for(self, need: int) -> int:
        for b in self._len_buckets:
            if b >= need:
                return b
        return self._len_buckets[-1]

    def _resize_cache(self, target: int) -> None:
        """Switch the slot pool to a different cache length: pad (grow)
        or slice (shrink) every KV array's length axis (dim 2). Rows
        beyond every live request's final need are garbage by
        construction (attention masks by pos), so slicing is exact."""
        if target == self._cur_len:
            return
        old = self._cur_len
        for name, v in self._cache.items():
            if target > old:
                pad = [(0, 0)] * v.ndim
                pad[2] = (0, target - old)
                self._cache[name] = jnp.pad(v, pad)
            else:
                self._cache[name] = v[:, :, :target]
        self._cur_len = target
        self.cache_resizes += 1

    def _fit_cache(self, admit_need: int = 0) -> None:
        if self._len_buckets is None:
            return
        self._resize_cache(self._bucket_for(
            max(self._required_len(), admit_need)))

    def _lora_feed(self, feed: dict) -> dict:
        if self._lora:
            feed["lora_idx"] = jnp.asarray(self._adapter)
        return feed

    def _prefill_for(self, plen: int) -> tuple:
        """Smallest compiled bucket >= plen (lazy compile)."""
        bucket = next(b for b in self.prompt_buckets if b >= plen)
        if bucket not in self._prefill_engines:
            self._prefill_engines[bucket] = self._make_prefill(bucket)
        return bucket, self._prefill_engines[bucket]

    # -- client API ------------------------------------------------------
    def submit(self, prompt_ids: np.ndarray, max_new_tokens: int,
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
               presence_penalty: float = 0.0) -> Future:
        """prompt_ids: [plen] int64; plen <= prompt_len (bucketed-prefill
        mode) or <= max_len - max_new_tokens (chunked_prefill mode).
        Resolves to the list of generated token ids (greedy); generation
        stops early when eos_id is produced (the eos token is included in
        the result) or when the generated tail matches any of the given
        token-id stop sequences (the matched sequence is included).
        adapter: LoRA adapter index for this request (0 = base model);
        requires the server's lora_bank.
        temperature / top_k / top_p / seed: per-request sampling (0.0 =
        greedy). Single-step servers sample host-side from the returned
        logits (numpy, seeded per request). multi_step servers sample ON
        DEVICE inside the K-step scan: per-slot [B] parameter arrays and
        a per-slot PRNG keyed on (seed, cache position), so a request's
        stream is deterministic in (seed, prompt) and identical for any
        K and any co-resident traffic — but drawn from jax's PRNG, so
        sampled streams differ numerically from the single-step host
        sampler (same filtering semantics, different random draws)."""
        prompt_ids = np.asarray(prompt_ids).reshape(-1).astype(np.int64)
        limit = self.max_len if self.chunked else self.prompt_len
        assert 1 <= prompt_ids.size <= limit
        assert prompt_ids.size + max_new_tokens <= self.max_len
        if adapter and not self._lora:
            raise ValueError("adapter requested but server has no lora_bank")
        r = _Request(prompt_ids, max_new_tokens, eos_id, stop_sequences,
                     adapter=adapter, temperature=temperature,
                     top_k=top_k, top_p=top_p, min_p=min_p, seed=seed,
                     on_token=on_token, logit_bias=logit_bias,
                     frequency_penalty=frequency_penalty,
                     presence_penalty=presence_penalty)
        return self._enqueue(r)

    def stats(self) -> Dict[str, float]:
        s = super().stats()
        if self.prompt_cache:
            s["prefix_hits"] = self.prefix_hits
            s["prefix_tokens_saved"] = self.prefix_tokens_saved
        if self._len_buckets is not None:
            s["cache_len"] = self._cur_len
            s["cache_resizes"] = self.cache_resizes
        return s

    # -- admission --------------------------------------------------------
    def _quant_kv(self, kv: np.ndarray, name: str) -> np.ndarray:
        if self.kv_dtype != np.int8:
            return kv.astype(np.float32)
        s = self._kv_scales[name].reshape(1, -1, 1, 1)
        if self._int4_kv:
            from .quant import pack_int4_kv

            return pack_int4_kv(kv, s)
        return np.clip(np.round(kv / s), -127, 127).astype(np.int8)

    def _clear_slot(self, slot: int) -> None:
        super()._clear_slot(slot)
        self._pending[slot] = None

    # -- prompt/prefix KV cache (dispatcher thread only) -----------------
    @staticmethod
    def _pkey(prompt: np.ndarray, adapter: int) -> bytes:
        # KV rows depend on the adapter, so it is part of the identity
        return np.int64(adapter).tobytes() + prompt.tobytes()

    def _pcache_put(self, prompt: np.ndarray, adapter: int,
                    kv: Dict[str, np.ndarray],
                    last_logits: Optional[np.ndarray] = None) -> None:
        if not self.prompt_cache:
            return
        key = self._pkey(prompt, adapter)
        self._pcache[key] = {"prompt": prompt.copy(), "adapter": adapter,
                             "kv": kv, "last_logits": last_logits}
        self._pcache.move_to_end(key)
        while len(self._pcache) > self.prompt_cache:
            self._pcache.popitem(last=False)

    def _pcache_exact(self, prompt: np.ndarray,
                      adapter: int) -> Optional[dict]:
        key = self._pkey(prompt, adapter)
        e = self._pcache.get(key)
        if e is not None:
            self._pcache.move_to_end(key)
        return e

    def _pcache_prefix(self, prompt: np.ndarray, adapter: int):
        """Longest COMMON prefix between `prompt` and any same-adapter
        cached entry. KV rows are causal (row t depends only on tokens
        <= t), so any shared prefix's rows transfer exactly — the
        shared-system-prompt case. At least 1 token is left to stream
        (it produces the first-token logits). Returns (entry, n_common)
        or (None, 0)."""
        best, best_n = None, 0
        for e in self._pcache.values():
            if e["adapter"] != adapter:
                continue
            p = e["prompt"]
            n = int(min(p.size, prompt.size - 1))
            neq = np.nonzero(p[:n] != prompt[:n])[0]
            if neq.size:
                n = int(neq[0])
            if n > best_n:
                best, best_n = e, n
        if best is not None:
            self._pcache.move_to_end(
                self._pkey(best["prompt"], best["adapter"]))
        return best, best_n

    def _pcache_usable(self, e: Optional[dict]) -> bool:
        """Entry KV dtype must match the live cache (the chunked-int8
        calibration flip moves the cache fp32 -> int8 mid-serve)."""
        if e is None:
            return False
        name, q = next(iter(e["kv"].items()))
        return q.dtype == self._cache[name].dtype

    def _admit(self, slot: int, r: _Request) -> None:
        if self._len_buckets is not None:
            plen = r.prompt.size
            if self.chunked:
                need = plen + r.max_new
            else:
                bucket = next(b for b in self.prompt_buckets if b >= plen)
                need = max(bucket, plen + r.max_new)
            self._fit_cache(need)
        if self.chunked:
            # no prefill engine: the prompt streams through the chunk
            # graph C tokens per step — from position 0, or from the end
            # of the longest cached prefix (shared system prompts skip
            # their prefill FLOPs entirely). The slot is claimed LAST:
            # if the cache lookup/KV writes raise, _fail must not leave
            # a dead request occupying the slot (ADVICE r3).
            self._adapter[slot] = r.adapter
            hit, n = self._pcache_prefix(r.prompt, r.adapter)
            if n > 0 and self._pcache_usable(hit):
                for name, q in hit["kv"].items():
                    self._cache[name] = self._cache[name].at[
                        slot, :, :n].set(q[:, :n])
                self._pending[slot] = r.prompt[n:].copy()
                self._pos[slot] = n
                self.prefix_hits += 1
                self.prefix_tokens_saved += n
            else:
                self._pending[slot] = r.prompt.copy()
                self._pos[slot] = 0
            if self._pbuf is not None:
                pend = self._pending[slot]
                row = np.zeros((self.max_len,), np.int32)
                row[: pend.size] = pend
                self._pbuf = self._pbuf.at[slot].set(jnp.asarray(row))
                self._pbuf_len[slot] = pend.size
            self._set_slot_sampling(slot, r)
            self._req[slot] = r
            return
        plen = r.prompt.size
        self._adapter[slot] = r.adapter
        hit = self._pcache_exact(r.prompt, r.adapter)
        if self._pcache_usable(hit):
            for name, q in hit["kv"].items():
                self._cache[name] = self._cache[name].at[
                    slot, :, :plen].set(q)
            # select from the cached last-position logits: greedy replay
            # is identical; sampled requests draw their own stream
            first = _select_token(hit["last_logits"], r)
            self.prefix_hits += 1
            self.prefix_tokens_saved += plen
        else:
            bucket, prefill = self._prefill_for(plen)
            padded = np.zeros((1, bucket), np.int64)
            padded[0, :plen] = r.prompt
            pfeed = {"input_ids": padded}
            if self._lora:
                pfeed["lora_idx"] = np.array([r.adapter], np.int64)
            out = prefill(pfeed)
            logits = _fetch(out["logits"])  # [1, bucket, V]

            if self.kv_dtype == np.int8 and self._kv_scales is None:
                # one-time per-head calibration from the first prompt
                self._kv_scales = {}
                for i in range(self.cfg.n_layer):
                    for kind in ("key", "value"):
                        kv = _fetch(out[f"present_{kind}_{i}"])
                        amax = np.maximum(
                            np.abs(kv).max(axis=(0, 2, 3)), 1e-6)
                        self._kv_scales[f"kv_scale_{kind}_{i}"] = (
                            amax / self._kv_qmax).astype(np.float32)

            store: Dict[str, np.ndarray] = {}
            for i in range(self.cfg.n_layer):
                for kind in ("key", "value"):
                    kv = _fetch(out[f"present_{kind}_{i}"])  # [1,H,Pb,hd]
                    q = self._quant_kv(kv, f"kv_scale_{kind}_{i}")[0]
                    name = f"past_{kind}_{i}"
                    self._cache[name] = self._cache[name].at[
                        slot, :, : bucket].set(q)
                    if self.prompt_cache:
                        store[name] = q[:, :plen].copy()

            last = logits[0, plen - 1]
            first = _select_token(last, r)
            self._pcache_put(r.prompt, r.adapter, store, last.copy())
        r.emit(first)
        self.tokens_out += 1
        if (len(r.tokens) >= r.max_new or first == r.eos_id
                or _hits_stop(r)):  # done already
            self._finish(None, r)
            return
        self._set_slot_sampling(slot, r)
        self._req[slot] = r
        self._pos[slot] = plen
        self._last_tok[slot] = first

    # -- dispatcher -------------------------------------------------------
    def _get_multi_fn(self):
        if self._cur_len in self._multi_fns:
            return self._multi_fns[self._cur_len]
        decode_fn = self.decode.jitted
        int8 = self.kv_dtype == np.int8
        present_of = {
            name: name.replace("past_", "present_", 1)
            for name in (spec.name for spec in self.decode.graph.inputs)
            if name.startswith("past_")}
        K = self.multi_step
        L = self._cur_len  # parking invariant: pos stays < L in-scan

        lora = self._lora

        def multi(params, tok, pos, cache, scales, idx):
            def body(carry, _):
                tok, pos, cache = carry
                feed = {"input_ids": tok[:, None], "pos": pos}
                feed.update(cache)
                if int8:
                    feed.update(scales)
                if lora:
                    feed["lora_idx"] = idx
                out = decode_fn(params, feed)
                nxt = jnp.argmax(out["logits"][:, -1, :], axis=-1
                                 ).astype(tok.dtype)
                new_cache = {p: out[pr] for p, pr in present_of.items()}
                return (nxt, jnp.minimum(pos + 1, L - 1), new_cache), nxt

            carry, toks = jax.lax.scan(body, (tok, pos, cache), None,
                                       length=K)
            _, pos, cache = carry
            return toks.T, cache                        # toks [B, K]

        fn = jax.jit(multi)
        self._multi_fns[self._cur_len] = fn
        return fn

    def _get_multi_sampled_fn(self):
        """multi_step variant with per-slot ON-DEVICE token selection:
        sampling (temperature/top-k/top-p/min-p), additive logit bias,
        and frequency/presence penalties all live inside the K-step scan
        as [B] / [B, V] device arrays — sampled traffic keeps the
        device-loop economics instead of falling back to one dispatch
        per token. Greedy slots (neutral params) select exact argmax.

        Per-slot randomness: key = fold_in(PRNGKey(request seed), pos) —
        a function of (seed, cache position) only, so a request's stream
        is identical for any K, any admission timing, and any
        co-resident traffic (tests exploit this for K-invariance)."""
        if self._cur_len in self._multi_sampled_fns:
            return self._multi_sampled_fns[self._cur_len]
        decode_fn = self.decode.jitted
        int8 = self.kv_dtype == np.int8
        present_of = {
            name: name.replace("past_", "present_", 1)
            for name in (spec.name for spec in self.decode.graph.inputs)
            if name.startswith("past_")}
        K = self.multi_step
        L = self._cur_len  # parking invariant: pos stays < L in-scan
        lora = self._lora
        B = self.B
        select = _device_select

        def multi(params, tok, pos, cache, scales, idx, keys,
                  temp, tk, tp, mp, fpen, ppen, counts, bias):
            def body(carry, _):
                tok, pos, cache, counts = carry
                feed = {"input_ids": tok[:, None], "pos": pos}
                feed.update(cache)
                if int8:
                    feed.update(scales)
                if lora:
                    feed["lora_idx"] = idx
                out = decode_fn(params, feed)
                logits = _bias_penalize(
                    out["logits"][:, -1, :].astype(jnp.float32),
                    bias, fpen, ppen, counts)
                nxt = select(logits, keys, pos, temp, tk, tp, mp
                             ).astype(tok.dtype)
                counts = counts.at[jnp.arange(B), nxt].add(1)
                new_cache = {p: out[pr] for p, pr in present_of.items()}
                return (nxt, jnp.minimum(pos + 1, L - 1), new_cache,
                        counts), nxt

            carry, toks = jax.lax.scan(body, (tok, pos, cache, counts),
                                       None, length=K)
            _, pos, cache, counts = carry
            return toks.T, cache, counts                   # toks [B, K]

        fn = jax.jit(multi)
        self._multi_sampled_fns[self._cur_len] = fn
        return fn

    def _step_multi(self) -> None:
        """K decode steps in one dispatch; host-side bookkeeping after.
        Pure-greedy batches run the lean argmax program; batches with any
        sampled/biased/penalized slot run the sampled program (greedy
        slots in it still select exact argmax)."""
        K = self.multi_step
        scales = ({k: jnp.asarray(v) for k, v in self._kv_scales.items()}
                  if self.kv_dtype == np.int8 else {})
        sampled = any(self._needs_device_sampling(self._req[s])
                      for s in self._active())
        if sampled:
            if self._counts is None:  # replayed pcache admissions only
                self._counts = jnp.zeros((self.B, self._vocab), jnp.int32)
                self._bias = jnp.zeros((self.B, self._vocab), jnp.float32)
            multi = self._get_multi_sampled_fn()
            toks, self._cache, self._counts = multi(
                self.decode.params,
                jnp.asarray(self._last_tok.astype(np.int32)),
                jnp.asarray(self._pos.astype(np.int32)),
                self._cache, scales, jnp.asarray(self._adapter),
                jnp.asarray(self._skeys),
                jnp.asarray(self._temp), jnp.asarray(self._topk),
                jnp.asarray(self._topp), jnp.asarray(self._minp),
                jnp.asarray(self._fpen), jnp.asarray(self._ppen),
                self._counts, self._bias)
        else:
            multi = self._get_multi_fn()
            toks, self._cache = multi(
                self.decode.params,
                jnp.asarray(self._last_tok.astype(np.int32)),
                jnp.asarray(self._pos.astype(np.int32)),
                self._cache, scales, jnp.asarray(self._adapter))
        self._emit_multi_block(_fetch(toks), K)

    def _get_chunked_multi_fn(self):
        """K CHUNK steps per dispatch: the unified prefill/decode loop
        device-resident. Each scan step, per slot: if prompt tokens
        remain, feed the next C of them from the device prompt buffer
        (one-hot matmul, not gather — CLAUDE.md rule) and emit a token
        only when the chunk consumed the prompt's tail; otherwise feed
        the last emitted token as a 1-real-token decode chunk. Mode
        flags (remaining/offset) ride the scan carry, so mixed
        prefill+decode batches advance K steps in ONE dispatch.

        Selection is the same per-slot on-device sampler as
        _get_multi_sampled_fn (neutral params = exact greedy); the
        emission validity mask comes back with the tokens and the host
        replays the same arithmetic for bookkeeping."""
        if self._cur_len in self._chunked_multi_fns:
            return self._chunked_multi_fns[self._cur_len]
        decode_fn = self.decode.jitted
        int8 = self.kv_dtype == np.int8
        present_of = {
            name: name.replace("past_", "present_", 1)
            for name in (spec.name for spec in self.decode.graph.inputs)
            if name.startswith("past_")}
        K = self.multi_step
        C = self.chunk
        L = self.max_len
        CUR = self._cur_len
        lora = self._lora
        B = self.B
        select = _device_select

        def multi(params, tok, pos, rem, off, pbuf, cache, scales, idx,
                  keys, temp, tk, tp, mp, fpen, ppen, counts, bias):
            def body(carry, _):
                tok, pos, rem, off, cache, counts = carry
                prefilling = rem > 0                       # [B]
                n_feed = jnp.where(prefilling,
                                   jnp.minimum(C, rem), 1).astype(pos.dtype)
                # prompt window [B, C] via one-hot matmul (house rule:
                # never index-gather what a tiny matmul can scatter)
                want = off[:, None] + jnp.arange(C)[None, :]     # [B, C]
                onehot = (want[:, :, None]
                          == jnp.arange(L)[None, None, :])       # [B, C, L]
                window = jnp.einsum(
                    "bcl,bl->bc", onehot.astype(jnp.float32),
                    pbuf.astype(jnp.float32)).astype(tok.dtype)
                decode_ids = jnp.concatenate(
                    [tok[:, None],
                     jnp.zeros((B, C - 1), tok.dtype)], axis=1) \
                    if C > 1 else tok[:, None]
                ids = jnp.where(prefilling[:, None], window, decode_ids)

                feed = {"input_ids": ids, "pos": pos}
                feed.update(cache)
                if int8:
                    feed.update(scales)
                if lora:
                    feed["lora_idx"] = idx
                out = decode_fn(params, feed)
                logits = out["logits"].astype(jnp.float32)   # [B, C, V]
                sel_oh = (jnp.arange(C)[None, :]
                          == (n_feed - 1)[:, None])          # [B, C]
                last_logits = jnp.einsum(
                    "bc,bcv->bv", sel_oh.astype(jnp.float32), logits)
                last_logits = _bias_penalize(last_logits, bias, fpen,
                                             ppen, counts)
                nxt = select(last_logits, keys, pos, temp, tk, tp, mp
                             ).astype(tok.dtype)
                rem_after = jnp.maximum(rem - n_feed, 0)
                valid = rem_after == 0          # emitted a real token
                tok = jnp.where(valid, nxt, tok)
                counts = counts.at[jnp.arange(B), nxt].add(
                    valid.astype(counts.dtype))
                # parking invariant: parked lanes (and finished-mid-scan
                # lanes) must not drift past the cache tables — see
                # _get_ngram_multi_fn's note on the NaN-kv time bomb
                pos = jnp.minimum(pos + n_feed, CUR - 1)
                off = off + jnp.where(prefilling, n_feed, 0)
                new_cache = {p: out[pr] for p, pr in present_of.items()}
                return ((tok, pos, rem_after, off, new_cache, counts),
                        (nxt, valid))

            carry, (toks, valid) = jax.lax.scan(
                body, (tok, pos, rem, off, cache, counts), None, length=K)
            _, _, _, _, cache, counts = carry
            return toks.T, valid.T, cache, counts          # [B, K]

        fn = jax.jit(multi)
        self._chunked_multi_fns[self._cur_len] = fn
        return fn

    def _step_chunked_multi(self) -> None:
        """K chunk steps in one dispatch; host bookkeeping by replaying
        the same feed arithmetic over the returned (token, valid) grid."""
        K = self.multi_step
        multi = self._get_chunked_multi_fn()
        scales = ({k: jnp.asarray(v) for k, v in self._kv_scales.items()}
                  if self.kv_dtype == np.int8 else {})
        if self._counts is None:
            self._counts = jnp.zeros((self.B, self._vocab), jnp.int32)
            self._bias = jnp.zeros((self.B, self._vocab), jnp.float32)
        rem = np.array([0 if p is None else p.size for p in self._pending],
                       np.int32)
        off = (self._pbuf_len - rem).astype(np.int32)
        toks, valid, self._cache, self._counts = multi(
            self.decode.params,
            jnp.asarray(self._last_tok.astype(np.int32)),
            jnp.asarray(self._pos.astype(np.int32)),
            jnp.asarray(rem), jnp.asarray(off), self._pbuf,
            self._cache, scales, jnp.asarray(self._adapter),
            jnp.asarray(self._skeys),
            jnp.asarray(self._temp), jnp.asarray(self._topk),
            jnp.asarray(self._topp), jnp.asarray(self._minp),
            jnp.asarray(self._fpen), jnp.asarray(self._ppen),
            self._counts, self._bias)
        toks = _fetch(toks)                     # [B, K]
        valid = _fetch(valid)                   # [B, K]
        self.steps += 1
        self._occupancy_sum += len(self._active())
        C = self.chunk
        for s in self._active():
            r = self._req[s]
            remaining = 0 if self._pending[s] is None else \
                int(self._pending[s].size)
            fed_total = 0
            plen_done = None
            for j in range(K):
                if remaining > 0:
                    n = min(C, remaining)
                    remaining -= n
                    fed_total += n
                    self._pos[s] += n
                    if remaining > 0:
                        assert not valid[s, j]
                        continue            # still prefilling: no token
                    plen_done = int(self._pos[s])
                else:
                    self._pos[s] += 1
                assert valid[s, j]
                tok = int(toks[s, j])
                r.emit(tok)
                self._last_tok[s] = tok
                self.tokens_out += 1
                if (len(r.tokens) >= r.max_new or tok == r.eos_id
                        or _hits_stop(r)):
                    self._finish(s, r)      # overshoot discarded
                    break
            if fed_total:
                self._pending[s] = self._pending[s][fed_total:]
            if plen_done is not None and self.prompt_cache:
                self._pcache_put(r.prompt, r.adapter, {
                    name: _fetch(self._cache[name][s, :, :plen_done])
                    for name in self._cache})

    def _step(self) -> None:
        if self._len_buckets is not None:
            # shrink opportunistically: growth happened at admission, so
            # only a finished long request can lower the requirement here
            t = self._bucket_for(self._required_len())
            if t < self._cur_len:
                self._resize_cache(t)
        if self.chunked:
            # chunked × multi_step runs the device block once int8 KV
            # calibration (shadow fp32 phase) is out of the way
            if self.multi_step > 0 and not (
                    self._shadow is not None and self._kv_scales is None):
                return self._step_chunked_multi()
            return self._step_chunked()
        if self.multi_step > 0:
            return self._step_multi()
        feed = {"input_ids": jnp.asarray(self._last_tok[:, None]),
                "pos": jnp.asarray(self._pos)}
        feed.update(self._cache)
        if self.kv_dtype == np.int8:
            feed.update(self._kv_scales)
        out = self.decode(self._lora_feed(feed))
        logits = _fetch(out["logits"])  # [B,1,V]
        for i in range(self.cfg.n_layer):
            for kind in ("key", "value"):
                self._cache[f"past_{kind}_{i}"] = out[f"present_{kind}_{i}"]
        self.steps += 1
        self._occupancy_sum += len(self._active())

        for s in self._active():
            r = self._req[s]
            self._pos[s] += 1
            tok = _select_token(logits[s, 0], r)
            r.emit(tok)
            self._last_tok[s] = tok
            self.tokens_out += 1
            if (len(r.tokens) >= r.max_new or tok == r.eos_id
                    or _hits_stop(r)):
                self._finish(s, r)

    def _step_chunked(self) -> None:
        C = self.chunk
        B = self.B
        ids = np.zeros((B, C), np.int64)
        fed = np.zeros((B,), np.int64)          # real prompt tokens fed
        for s in range(B):
            r = self._req[s]
            if r is None:
                continue
            pend = self._pending[s]
            if pend is not None and pend.size > 0:
                n = int(min(C, pend.size))
                ids[s, :n] = pend[:n]
                self._pending[s] = pend[n:]
                fed[s] = n
            else:
                ids[s, 0] = self._last_tok[s]

        calibrating = (self._shadow is not None
                       and self._kv_scales is None)
        eng = self._shadow if calibrating else self.decode
        feed = {"input_ids": jnp.asarray(ids),
                "pos": jnp.asarray(self._pos), **self._cache}
        if self.kv_dtype == np.int8 and not calibrating:
            feed.update(self._kv_scales)
        out = eng(self._lora_feed(feed))
        logits = _fetch(out["logits"])          # [B, C, V]
        for i in range(self.cfg.n_layer):
            for kind in ("key", "value"):
                self._cache[f"past_{kind}_{i}"] = out[f"present_{kind}_{i}"]
        self.steps += 1
        self._occupancy_sum += len(self._active())

        prefill_done = False
        for s in self._active():
            r = self._req[s]
            if fed[s] > 0:
                self._pos[s] += fed[s]
                if self._pending[s].size > 0:
                    continue                    # still prefilling
                prefill_done = True
                if self.prompt_cache and not calibrating:
                    # prompt fully ingested: snapshot its KV rows so later
                    # requests sharing this prefix skip the prefill stream
                    plen = int(self._pos[s])
                    self._pcache_put(r.prompt, r.adapter, {
                        name: _fetch(self._cache[name][s, :, :plen])
                        for name in self._cache})
                tok = _select_token(logits[s, fed[s] - 1], r)
            else:
                self._pos[s] += 1
                tok = _select_token(logits[s, 0], r)
            r.emit(tok)
            self._last_tok[s] = tok
            self.tokens_out += 1
            if (len(r.tokens) >= r.max_new or tok == r.eos_id
                    or _hits_stop(r)):
                self._finish(s, r)

        if calibrating and prefill_done:
            # first full prompt is in the fp32 shadow cache: derive the
            # per-head scales from it and quantize the cache ONCE
            self._kv_scales = {}
            for i in range(self.cfg.n_layer):
                for kind in ("key", "value"):
                    kv = _fetch(self._cache[f"past_{kind}_{i}"])
                    amax = np.maximum(np.abs(kv).max(axis=(0, 2, 3)), 1e-6)
                    self._kv_scales[f"kv_scale_{kind}_{i}"] = (
                        amax / 127.0).astype(np.float32)
            for name in list(self._cache):
                kind = "key" if "_key_" in name else "value"
                self._cache[name] = jnp.asarray(self._quant_kv(
                    _fetch(self._cache[name]),
                    f"kv_scale_{kind}_{name.rsplit('_', 1)[1]}"))
            # the shadow engine (a full duplicate parameter set) is dead
            # from here on — release it
            self._shadow = None
            self._shadow_graph = None


class Seq2SeqServer(_ServerBase):
    """Continuous batching for encoder-decoder families
    (models.seq2seq_family: "t5" tokens->tokens, "asr" waveform->tokens).

    Per-slot CROSS-ATTENTION state is the new ingredient vs DecodeServer:
    each admitted request runs the batch-1 encoder once, and its
    cross_key_i/cross_value_i projections are written into slot s of the
    BATCHED cross tensors the shared decode graph reads every step — the
    same slot-state pattern as the self-attention cache, but static after
    admission. Decoding then proceeds exactly like DecodeServer: one
    compiled chunk=1 decode program, per-slot positions, greedy tokens.
    The admission/step/finish machinery lives in _ServerBase.

    For src_mask families (t5) the per-slot TRUE source length is fed to
    the decode graph, so cross-attention never reads padding and results
    are independent of src_len (served == isolated, exactly)."""

    def __init__(
        self,
        cfg,
        *,
        slots: int = 4,
        src_len: int = 16,
        max_len: int = 32,
        seed: int = 0,
        start_token: int = 0,
        mesh=None,
        param_sharding_fn=None,
        family: str = "t5",
        encoder_cache: int = 0,
        multi_step: int = 0,
        autostart: bool = True,
    ):
        from .models import seq2seq_family

        self.fam = seq2seq_family(family)
        self.cfg = cfg
        self.src_len = src_len
        self.enc_len = self.fam.enc_len(cfg, src_len)
        self.max_len = max_len
        self.start_token = start_token
        self.n_layers = self.fam.n_layers(cfg)
        ekw = dict(mesh=mesh, param_sharding_fn=param_sharding_fn)
        self.encoder = Engine(import_model(self.fam.build_encoder(
            cfg, batch=1, src_len=src_len, seed=seed)), **ekw)
        self.decode = Engine(import_model(self.fam.build_decode(
            cfg, batch=slots, max_len=max_len, src_len=self.enc_len,
            seed=seed)), **ekw)

        H, hd = cfg.n_head, cfg.head_dim
        self._cache = {}
        for i in range(self.n_layers):
            for kind in ("key", "value"):
                self._cache[f"past_{kind}_{i}"] = jnp.zeros(
                    (slots, H, max_len, hd), jnp.float32)
                self._cache[f"cross_{kind}_{i}"] = jnp.zeros(
                    (slots, H, self.enc_len, hd), jnp.float32)

        self._pos = np.full((slots,), max_len - 1, np.int64)
        self._last_tok = np.full((slots,), start_token, np.int64)
        self._src_lens = np.zeros((slots,), np.int64)
        # encoder-output cache: repeated sources (the same audio clip /
        # source sentence) skip the encoder entirely — their cross-K/V
        # replay from an LRU into the slot (exact; cross state is a pure
        # function of the source)
        self.encoder_cache = int(encoder_cache)
        self._enc_cache: "OrderedDict[bytes, dict]" = OrderedDict()
        self.encoder_cache_hits = 0
        # multi_step=K: K decode steps per dispatch (lax.scan over time,
        # cross-attention state static inside the scan) — the same
        # device-loop lever as DecodeServer, for encoder-decoder families
        self.multi_step = int(multi_step)
        self._multi_fn = None
        self._init_sampling_state(slots, cfg.vocab_size,
                                  bool(self.multi_step))
        self._start_dispatch(slots, autostart)

    def stats(self) -> Dict[str, float]:
        s = super().stats()
        if self.encoder_cache:
            s["encoder_cache_hits"] = self.encoder_cache_hits
        return s

    # -- client API -------------------------------------------------------
    def submit(self, src: np.ndarray, max_new_tokens: int,
               eos_id: Optional[int] = None,
               temperature: float = 0.0,
               top_k: Optional[int] = None,
               top_p: Optional[float] = None,
               min_p: Optional[float] = None,
               seed: int = 0,
               on_token=None,
               logit_bias: Optional[Dict[int, float]] = None,
               frequency_penalty: float = 0.0,
               presence_penalty: float = 0.0) -> Future:
        """src: [plen] source (int64 tokens or f32 waveform per family;
        right-padded with zeros to src_len at admission). Resolves to
        generated target token ids. Sampling knobs as DecodeServer.submit."""
        src = np.asarray(src).reshape(-1).astype(self.fam.prompt_dtype)
        assert 1 <= src.size <= self.src_len
        assert 1 <= max_new_tokens <= self.max_len
        r = _Request(src, max_new_tokens, eos_id, temperature=temperature,
                     top_k=top_k, top_p=top_p, min_p=min_p, seed=seed,
                     on_token=on_token, logit_bias=logit_bias,
                     frequency_penalty=frequency_penalty,
                     presence_penalty=presence_penalty)
        return self._enqueue(r)

    # -- dispatcher -------------------------------------------------------
    def _admit(self, slot: int, r: _Request) -> None:
        key = r.prompt.tobytes()
        hit = self._enc_cache.get(key) if self.encoder_cache else None
        if hit is not None:
            self._enc_cache.move_to_end(key)
            self.encoder_cache_hits += 1
            cross = hit
        else:
            src = np.zeros((1, self.src_len), self.fam.prompt_dtype)
            src[0, : r.prompt.size] = r.prompt
            feed = {self.fam.enc_input: src}
            if self.fam.src_mask:
                feed["src_len"] = np.array([r.prompt.size], np.int64)
            enc = self.encoder(feed)
            # keep the arrays on device for the slot write; materialize
            # to host only when an LRU entry is actually stored
            cross = {f"cross_{kind}_{i}": enc[f"cross_{kind}_{i}"][0]
                     for i in range(self.n_layers)
                     for kind in ("key", "value")}
            if self.encoder_cache:
                self._enc_cache[key] = {n: _fetch(v)
                                        for n, v in cross.items()}
                while len(self._enc_cache) > self.encoder_cache:
                    self._enc_cache.popitem(last=False)
        for name, v in cross.items():
            self._cache[name] = self._cache[name].at[slot].set(v)
        self._set_slot_sampling(slot, r)
        self._req[slot] = r
        self._pos[slot] = 0
        self._last_tok[slot] = self.start_token
        self._src_lens[slot] = r.prompt.size

    def _get_multi_fn(self):
        """K decode steps in one dispatch for the encoder-decoder case:
        self-attention KV rides the scan carry, cross-attention K/V and
        per-slot source lengths are loop constants. Token selection is
        the shared on-device per-slot sampler (_device_select) — greedy
        slots select exact argmax."""
        if self._multi_fn is not None:
            return self._multi_fn
        decode_fn = self.decode.jitted
        K = self.multi_step
        B = self.B
        L = self.max_len  # parking invariant: pos stays < L in-scan
        src_mask = self.fam.src_mask
        present_of = {
            f"past_{kind}_{i}": f"present_{kind}_{i}"
            for i in range(self.n_layers) for kind in ("key", "value")}
        select = _device_select

        def multi(params, tok, pos, past, cross, src_lens, keys,
                  temp, tk, tp, mp, fpen, ppen, counts, bias):
            def body(carry, _):
                tok, pos, past, counts = carry
                feed = {"input_ids": tok[:, None], "pos": pos}
                feed.update(past)
                feed.update(cross)
                if src_mask:
                    feed["src_len"] = src_lens
                out = decode_fn(params, feed)
                logits = _bias_penalize(
                    out["logits"][:, -1, :].astype(jnp.float32),
                    bias, fpen, ppen, counts)
                nxt = select(logits, keys, pos, temp, tk, tp, mp
                             ).astype(tok.dtype)
                counts = counts.at[jnp.arange(B), nxt].add(1)
                new_past = {p: out[pr] for p, pr in present_of.items()}
                return (nxt, jnp.minimum(pos + 1, L - 1), new_past,
                        counts), nxt

            carry, toks = jax.lax.scan(body, (tok, pos, past, counts),
                                       None, length=K)
            _, _, past, counts = carry
            return toks.T, past, counts                    # toks [B, K]

        self._multi_fn = jax.jit(multi)
        return self._multi_fn

    def _step_multi(self) -> None:
        K = self.multi_step
        multi = self._get_multi_fn()
        if self._counts is None:
            self._counts = jnp.zeros((self.B, self._vocab), jnp.int32)
            self._bias = jnp.zeros((self.B, self._vocab), jnp.float32)
        past = {k: v for k, v in self._cache.items()
                if k.startswith("past_")}
        cross = {k: v for k, v in self._cache.items()
                 if k.startswith("cross_")}
        toks, past, self._counts = multi(
            self.decode.params,
            jnp.asarray(self._last_tok.astype(np.int32)),
            jnp.asarray(self._pos.astype(np.int32)),
            past, cross, jnp.asarray(self._src_lens.astype(np.int32)),
            jnp.asarray(self._skeys),
            jnp.asarray(self._temp), jnp.asarray(self._topk),
            jnp.asarray(self._topp), jnp.asarray(self._minp),
            jnp.asarray(self._fpen), jnp.asarray(self._ppen),
            self._counts, self._bias)
        self._cache.update(past)
        self._emit_multi_block(_fetch(toks), K)

    def _step(self) -> None:
        if self.multi_step > 0:
            return self._step_multi()
        feed = {"input_ids": jnp.asarray(self._last_tok[:, None]),
                "pos": jnp.asarray(self._pos), **self._cache}
        if self.fam.src_mask:
            feed["src_len"] = jnp.asarray(self._src_lens)
        out = self.decode(feed)
        logits = _fetch(out["logits"])
        for i in range(self.n_layers):
            for kind in ("key", "value"):
                self._cache[f"past_{kind}_{i}"] = out[f"present_{kind}_{i}"]
        self.steps += 1
        self._occupancy_sum += len(self._active())
        for s in self._active():
            r = self._req[s]
            self._pos[s] += 1
            tok = _select_token(logits[s, 0], r)
            r.emit(tok)
            self._last_tok[s] = tok
            self.tokens_out += 1
            if (len(r.tokens) >= r.max_new or tok == r.eos_id
                    or _hits_stop(r)):
                self._finish(s, r)


class SpeculativeServer(_ServerBase):
    """Continuous-batching speculative decoding: every server step runs
    ONE speculation round over the whole slot pool — the draft proposes
    k-1 tokens per slot (k-1 batched draft dispatches), the target
    verifies all k in ONE chunk call, and each slot accepts its own
    greedy-matched prefix + 1 corrected token (per-slot `pos [B]` makes
    variable acceptance free). Greedy verification is LOSSLESS: served
    tokens equal the target's own greedy decode exactly, whatever the
    draft proposes — the draft only changes how many dispatches a token
    costs (tests assert served == isolated).

    Slots park at pos = max_len - k so draft steps (pos .. pos+k-2) and
    the verify chunk never index past the cache/position tables; parked
    rows are stale-but-masked exactly like DecodeServer's.

    Per-request temperature > 0 switches that slot to speculative
    REJECTION sampling (Leviathan et al.): draft token x ~ q accepted
    with prob min(1, p(x)/q(x)); on rejection the emitted token draws
    from normalize(max(p−q, 0)) — the slot's output DISTRIBUTION equals
    plain target sampling at that temperature, reproducible per request
    seed. top_k/top_p/logit_bias stay rejected (they would break the
    verification identity).

    ngram=N replaces the draft MODEL with prompt-lookup proposals: each
    slot's continuation of its last N-gram's previous occurrence in its
    own context (host-side string matching — no draft engines at all,
    zero extra dispatches per round). Greedy verification still makes
    the output exactly the target's greedy decode; acceptance just
    tracks how repetitive the text is. Greedy-only (no q distribution
    exists to rejection-sample against)."""

    def __init__(
        self,
        target_cfg,
        draft_cfg=None,
        *,
        slots: int = 4,
        prompt_len: int = 8,
        max_len: int = 64,
        k: int = 4,
        target_seed: int = 0,
        draft_seed: int = 1,
        ngram: Optional[int] = None,
        family: str = "gpt2",
        mesh=None,
        param_sharding_fn=None,
        autostart: bool = True,
        multi_step: int = 0,
    ):
        from .models import decoder_family

        build_prefill, build_decode, _ = decoder_family(family)
        self.cfg = target_cfg
        self.dcfg = draft_cfg if draft_cfg is not None else target_cfg
        assert self.dcfg.vocab_size == target_cfg.vocab_size
        self.k = int(k)
        assert self.k >= 2
        self.prompt_len = prompt_len
        self.max_len = max_len
        self.kv_dtype = np.dtype(np.float32)
        self.ngram = int(ngram) if ngram else 0

        pkw = ({"past_len": 0, "with_presents": True} if family == "gpt2"
               else {"with_presents": True})
        ekw = dict(mesh=mesh, param_sharding_fn=param_sharding_fn)
        self.t_prefill = Engine(import_model(build_prefill(
            target_cfg, batch=1, seq_len=prompt_len, seed=target_seed,
            **pkw)), **ekw)
        self.t_verify = Engine(import_model(build_decode(
            target_cfg, batch=slots, max_len=max_len, seed=target_seed,
            chunk=self.k)), **ekw)
        if self.ngram:
            self.d_prefill = self.d_decode = None
        else:
            self.d_prefill = Engine(import_model(build_prefill(
                self.dcfg, batch=1, seq_len=prompt_len, seed=draft_seed,
                **pkw)), **ekw)
            self.d_decode = Engine(import_model(build_decode(
                self.dcfg, batch=slots, max_len=max_len,
                seed=draft_seed)), **ekw)

        def _zeros(cfg):
            Hc = getattr(cfg, "n_kv_head", None) or cfg.n_head
            return {f"past_{kind}_{i}": jnp.zeros(
                (slots, Hc, max_len, cfg.head_dim), jnp.float32)
                for i in range(cfg.n_layer) for kind in ("key", "value")}

        self._t_cache = _zeros(target_cfg)
        self._d_cache = {} if self.ngram else _zeros(self.dcfg)
        self._pos = np.full((slots,), max_len - self.k, np.int64)
        self._last_tok = np.zeros((slots,), np.int64)
        self.accepted_total = 0
        self.proposed_total = 0
        # multi_step=R (ngram mode only): R whole speculation rounds —
        # device-computed prompt-lookup proposal, chunk verify, greedy
        # acceptance, context append — inside ONE lax.scan dispatch.
        # Per-slot contexts live in a device buffer for the lookup.
        self.multi_step = int(multi_step)
        if self.multi_step and not self.ngram:
            raise ValueError(
                "multi_step speculation requires ngram mode (draft-model "
                "proposals need k-1 host dispatches per round)")
        self._ctx: Optional[jax.Array] = None
        if self.multi_step:
            self._ctx = jnp.zeros((slots, max_len), jnp.int32)
        self._ctx_len = np.zeros((slots,), np.int64)
        self._ngram_multi_fn = None
        self._start_dispatch(slots, autostart)

    def stats(self) -> Dict[str, float]:
        s = super().stats()
        s["acceptance_rate"] = (self.accepted_total / self.proposed_total
                                if self.proposed_total else 0.0)
        return s

    def _clear_slot(self, slot: int) -> None:
        self._req[slot] = None
        self._pos[slot] = self.max_len - self.k    # park (see docstring)

    # -- client API ------------------------------------------------------
    def submit(self, prompt_ids: np.ndarray, max_new_tokens: int,
               eos_id: Optional[int] = None,
               stop_sequences: Optional[List[List[int]]] = None,
               on_token=None,
               temperature: float = 0.0,
               seed: int = 0, **kw) -> Future:
        if any(kw.get(p) for p in ("top_k", "top_p",
                                   "logit_bias", "adapter")):
            raise ValueError(
                "SpeculativeServer verifies exactly (greedy) or by "
                "rejection sampling (temperature); top_k/top_p/"
                "logit_bias/adapter would break that identity — use "
                "DecodeServer for them")
        if temperature and self.ngram:
            raise ValueError(
                "ngram (prompt-lookup) proposals have no q distribution "
                "to rejection-sample against — greedy only; use a draft "
                "model for sampled speculation")
        if temperature and self.multi_step:
            raise ValueError(
                "multi_step speculation is greedy-only (ngram mode)")
        prompt_ids = np.asarray(prompt_ids).reshape(-1).astype(np.int64)
        assert 1 <= prompt_ids.size <= self.prompt_len
        assert prompt_ids.size + max_new_tokens + self.k <= self.max_len
        r = _Request(prompt_ids, max_new_tokens, eos_id, stop_sequences,
                     on_token=on_token, temperature=temperature,
                     seed=seed)
        return self._enqueue(r)

    @staticmethod
    def _soft(row: np.ndarray, temperature: float) -> np.ndarray:
        z = row.astype(np.float64) / temperature
        z -= z.max()
        e = np.exp(z)
        return e / e.sum()

    # -- dispatcher ------------------------------------------------------
    def _admit(self, slot: int, r: _Request) -> None:
        plen = r.prompt.size
        padded = np.zeros((1, self.prompt_len), np.int64)
        padded[0, :plen] = r.prompt
        t_out = self.t_prefill({"input_ids": padded})
        pairs = [(self._t_cache, t_out, self.cfg)]
        if not self.ngram:
            pairs.append((self._d_cache, self.d_prefill(
                {"input_ids": padded}), self.dcfg))
        for cache, out, cfg in pairs:
            for i in range(cfg.n_layer):
                for kind in ("key", "value"):
                    kv = out[f"present_{kind}_{i}"][0]   # [H, P, hd]
                    name = f"past_{kind}_{i}"
                    cache[name] = cache[name].at[
                        slot, :, : self.prompt_len].set(kv)
        first = _select_token(_fetch(t_out["logits"])[0, plen - 1], r)
        r.emit(first)
        self.tokens_out += 1
        if (len(r.tokens) >= r.max_new or first == r.eos_id
                or _hits_stop(r)):
            self._finish(None, r)
            return
        if self._ctx is not None:
            row = np.zeros((self.max_len,), np.int32)
            row[:plen] = r.prompt
            row[plen] = first
            self._ctx = self._ctx.at[slot].set(jnp.asarray(row))
        self._req[slot] = r
        self._pos[slot] = plen
        self._last_tok[slot] = first

    def _lookup_proposal(self, r: _Request) -> List[int]:
        """Prompt-lookup: continue the most recent earlier occurrence of
        the context's final N-gram; pad/fallback with the last token
        (a bad proposal only costs acceptance, never correctness)."""
        ctx = list(r.prompt) + r.tokens
        n, k = self.ngram, self.k
        g = ctx[-n:]
        cont: List[int] = []
        for i in range(len(ctx) - n - 1, -1, -1):
            if ctx[i:i + n] == g:
                cont = [int(t) for t in ctx[i + n: i + n + k - 1]]
                break
        return (cont + [int(ctx[-1])] * (k - 1))[: k - 1]

    def _step_ngram(self) -> None:
        """One prompt-lookup speculation round: ZERO draft dispatches —
        proposals come from each slot's own context — then the same
        single target chunk-verify and greedy acceptance."""
        k = self.k
        chunk = np.repeat(self._last_tok[:, None], k, axis=1)  # [B, k]
        for s in self._active():
            chunk[s, 1:] = self._lookup_proposal(self._req[s])
        vout = self.t_verify({"input_ids": jnp.asarray(chunk),
                              "pos": jnp.asarray(self._pos),
                              **self._t_cache})
        for i in range(self.cfg.n_layer):
            for kind in ("key", "value"):
                self._t_cache[f"past_{kind}_{i}"] = vout[
                    f"present_{kind}_{i}"]
        tpred = _fetch(vout["logits"]).argmax(-1)              # [B, k]
        self.steps += 1
        self._occupancy_sum += len(self._active())
        for s in self._active():
            r = self._req[s]
            m = 0
            while m < k - 1 and chunk[s, m + 1] == tpred[s, m]:
                m += 1
            self.accepted_total += m
            self.proposed_total += k - 1
            self._pos[s] += m + 1
            self._last_tok[s] = tpred[s, m]
            for t in tpred[s, : m + 1]:
                r.emit(int(t))
                self.tokens_out += 1
                if (len(r.tokens) >= r.max_new or t == r.eos_id
                        or _hits_stop(r)):
                    self._finish(s, r)
                    break

    def _get_ngram_multi_fn(self):
        """R whole prompt-lookup speculation rounds in ONE dispatch: the
        proposal search runs on device over a per-slot context buffer
        (static n shifted equality maps + one-hot window gathers — no
        index gathers, CLAUDE.md rule), then the chunk verify, greedy
        acceptance (cumprod of the match prefix), and the context append
        (one-hot scatter) — all inside a lax.scan. The host replays the
        returned (tpred, m) grids for emission/finish bookkeeping.

        Invariant exploited: context length == pos + 1 (admission seeds
        ctx = prompt + first token with pos = plen; each round appends
        m+1 tokens and advances pos by m+1), so the scan carries no
        separate length."""
        if self._ngram_multi_fn is not None:
            return self._ngram_multi_fn
        verify_fn = self.t_verify.jitted
        present_of = {
            name: name.replace("past_", "present_", 1)
            for name in self._t_cache}
        k, n, L = self.k, self.ngram, self.max_len
        B, R = self.B, self.multi_step

        def multi(params, last, pos, cache, ctx):
            def body(carry, _):
                last, pos, cache, ctx = carry
                clen = pos + 1                                   # [B]
                # final n-gram of each context (one-hot gather)
                want = (clen - n)[:, None] + jnp.arange(n)[None, :]
                oh = want[:, :, None] == jnp.arange(L)[None, None, :]
                g = jnp.einsum("bnl,bl->bn", oh.astype(jnp.float32),
                               ctx.astype(jnp.float32)).astype(ctx.dtype)
                # match map over all window starts (n static shifts)
                W = L - n + 1
                ok = jnp.ones((B, W), bool)
                for j in range(n):
                    ok &= ctx[:, j:j + W] == g[:, j][:, None]
                idxs = jnp.arange(W)[None, :]
                ok &= idxs <= (clen - n - 1)[:, None]  # strictly earlier
                has = jnp.any(ok, axis=1)
                i = jnp.max(jnp.where(ok, idxs, -1), axis=1)     # latest
                # continuation window i+n .. i+n+k-2, padded with `last`
                tpos = (i + n)[:, None] + jnp.arange(k - 1)[None, :]
                ohc = tpos[:, :, None] == jnp.arange(L)[None, None, :]
                cont = jnp.einsum(
                    "btl,bl->bt", ohc.astype(jnp.float32),
                    ctx.astype(jnp.float32)).astype(last.dtype)
                valid = has[:, None] & (tpos < clen[:, None])
                prop = jnp.where(valid, cont, last[:, None])
                chunk = jnp.concatenate([last[:, None], prop], axis=1)

                out = verify_fn(params, {"input_ids": chunk, "pos": pos,
                                         **cache})
                cache = {p: out[pr] for p, pr in present_of.items()}
                tpred = jnp.argmax(out["logits"], axis=-1
                                   ).astype(last.dtype)          # [B, k]
                eq = chunk[:, 1:] == tpred[:, : k - 1]
                m = jnp.sum(jnp.cumprod(eq.astype(jnp.int32), axis=1),
                            axis=1)                              # [B]
                last = jnp.take_along_axis(tpred, m[:, None], axis=1)[:, 0]
                for j in range(k):                # append accepted tokens
                    w = (jnp.arange(L)[None, :] == (clen + j)[:, None]) \
                        & (j <= m)[:, None]
                    ctx = jnp.where(w, tpred[:, j][:, None].astype(
                        ctx.dtype), ctx)
                # parking invariant: pos ≤ L-k ALWAYS (docstring). Parked
                # lanes and finished-mid-scan lanes would otherwise walk
                # the verify window past the cache/position tables in
                # round ≥2 (the host replay discards their tokens, but
                # the out-of-range round's NaN kv would persist in the
                # slot's cache rows and break the NEXT request admitted
                # there — found by the chip bench, BENCH r4).
                pos = jnp.minimum(pos + m + 1, L - k)
                return (last, pos, cache, ctx), (tpred, m)

            carry, (tpreds, ms) = jax.lax.scan(
                body, (last, pos, cache, ctx), None, length=R)
            _, _, cache, ctx = carry
            # [R, B, k] -> [B, R, k]; [R, B] -> [B, R]
            return cache, ctx, jnp.moveaxis(tpreds, 0, 1), ms.T

        self._ngram_multi_fn = jax.jit(multi)
        return self._ngram_multi_fn

    def _step_ngram_multi(self) -> None:
        R, k = self.multi_step, self.k
        multi = self._get_ngram_multi_fn()
        self._t_cache, self._ctx, tpreds, ms = multi(
            self.t_verify.params,
            jnp.asarray(self._last_tok.astype(np.int32)),
            jnp.asarray(self._pos.astype(np.int32)),
            self._t_cache, self._ctx)
        tpreds = _fetch(tpreds)                    # [B, R, k]
        ms = _fetch(ms)                            # [B, R]
        self.steps += 1
        self._occupancy_sum += len(self._active())
        for s in self._active():
            r = self._req[s]
            done = False
            for rd in range(R):
                m = int(ms[s, rd])
                self.accepted_total += m
                self.proposed_total += k - 1
                self._pos[s] += m + 1
                self._last_tok[s] = int(tpreds[s, rd, m])
                for t in tpreds[s, rd, : m + 1]:
                    r.emit(int(t))
                    self.tokens_out += 1
                    if (len(r.tokens) >= r.max_new or t == r.eos_id
                            or _hits_stop(r)):
                        self._finish(s, r)   # overshoot discarded
                        done = True
                        break
                if done:
                    break

    def _step(self) -> None:
        if self.ngram:
            if self.multi_step:
                return self._step_ngram_multi()
            return self._step_ngram()
        k = self.k
        pos = self._pos.copy()
        # sampled slots draft by sampling from q (their own temperature,
        # their own PRNG); greedy slots draft by argmax — per-slot, from
        # the same batched draft dispatch
        sampled = {s: self._req[s] for s in self._active()
                   if self._req[s].temperature > 0.0}
        drafts = [self._last_tok.copy()]
        d_tok = self._last_tok.copy()
        q_dists: List[Dict[int, np.ndarray]] = []  # per j: slot -> q [V]
        for j in range(k - 1):
            feed = {"input_ids": jnp.asarray(d_tok[:, None]),
                    "pos": jnp.asarray(pos + j), **self._d_cache}
            step = self.d_decode(feed)
            for i in range(self.dcfg.n_layer):
                for kind in ("key", "value"):
                    self._d_cache[f"past_{kind}_{i}"] = step[
                        f"present_{kind}_{i}"]
            dl = np.asarray(step["logits"])[:, -1, :]
            d_tok = dl.argmax(-1).astype(np.int64)
            qj: Dict[int, np.ndarray] = {}
            for s, r in sampled.items():
                q = self._soft(dl[s], r.temperature)
                qj[s] = q
                d_tok[s] = r.rng.choice(q.size, p=q)
            q_dists.append(qj)
            drafts.append(d_tok)
        # write the LAST draft token's KV row too: a full-acceptance
        # round jumps pos past it, and an unwritten row would be attended
        # by every later draft step (same fix as SpeculativeGenerator)
        feed = {"input_ids": jnp.asarray(d_tok[:, None]),
                "pos": jnp.asarray(pos + k - 1), **self._d_cache}
        step = self.d_decode(feed)
        for i in range(self.dcfg.n_layer):
            for kind in ("key", "value"):
                self._d_cache[f"past_{kind}_{i}"] = step[
                    f"present_{kind}_{i}"]
        chunk = np.stack(drafts, axis=1)                     # [B, k]

        vout = self.t_verify({"input_ids": jnp.asarray(chunk),
                              "pos": jnp.asarray(pos), **self._t_cache})
        for i in range(self.cfg.n_layer):
            for kind in ("key", "value"):
                self._t_cache[f"past_{kind}_{i}"] = vout[
                    f"present_{kind}_{i}"]
        t_logits = _fetch(vout["logits"])                    # [B, k, V]
        tpred = t_logits.argmax(-1)                          # [B, k]
        self.steps += 1
        self._occupancy_sum += len(self._active())

        for s in self._active():
            r = self._req[s]
            if r.temperature > 0.0:
                # rejection sampling (Leviathan): accept x ~ q with prob
                # min(1, p(x)/q(x)); on rejection draw from max(p-q, 0)
                p_dists = [self._soft(t_logits[s, j], r.temperature)
                           for j in range(k)]
                out_toks = []
                m = 0
                for j in range(k - 1):
                    x = int(chunk[s, j + 1])
                    qx = q_dists[j][s][x]
                    px = p_dists[j][x]
                    if r.rng.random() < min(1.0, px / max(qx, 1e-30)):
                        out_toks.append(x)
                        m += 1
                        continue
                    res = np.maximum(p_dists[j] - q_dists[j][s], 0.0)
                    tot = res.sum()
                    if tot <= 0:  # q covers p exactly; resample p
                        res, tot = p_dists[j], 1.0
                    out_toks.append(int(r.rng.choice(res.size,
                                                     p=res / tot)))
                    break
                else:
                    # every draft accepted: bonus token from p_{k-1}
                    out_toks.append(int(r.rng.choice(
                        p_dists[k - 1].size, p=p_dists[k - 1])))
                accepted = out_toks
            else:
                m = 0
                while m < k - 1 and chunk[s, m + 1] == tpred[s, m]:
                    m += 1
                accepted = [int(t) for t in tpred[s, : m + 1]]
            self.accepted_total += m
            self.proposed_total += k - 1
            self._pos[s] += len(accepted)
            self._last_tok[s] = accepted[-1]
            for t in accepted:
                r.emit(int(t))
                self.tokens_out += 1
                if (len(r.tokens) >= r.max_new or t == r.eos_id
                        or _hits_stop(r)):
                    self._finish(s, r)
                    break
