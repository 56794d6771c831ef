"""DecodeServer: token-level continuous batching for decoder-only
families (gpt2/llama/moe + registered custom families).

See serving/__init__.py for the package map; the K-step device-resident
dispatch bodies live in decode_multi._MultiStepMixin.
"""

from __future__ import annotations

from collections import OrderedDict
from concurrent.futures import Future
from typing import Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..engine import Engine
from ..graph import import_model
from ..models.gpt2 import GPT2Config

from .base import _ServerBase
from .decode_multi import _MultiStepMixin
from .request import (
    _Request,
    _bias_penalize,
    _device_select,
    _fetch,
    _hits_stop,
    _select_token,
)

class DecodeServer(_MultiStepMixin, _ServerBase):
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
        if self._int4_kv and family not in ("gpt2", "llama", "moe"):
            raise NotImplementedError(
                "int4 KV serving needs a nibble-packing decode graph "
                "(gpt2/llama/moe only)")
        # prompts pad to the smallest compiled bucket >= their length:
        # one XLA program per bucket (compiled lazily on first use), so
        # short prompts don't pay full-length prefill FLOPs.
        # (chunked_prefill mode never builds prefill engines; buckets and
        # prompt_len are ignored there)
        self.prompt_buckets = tuple(sorted(prompt_buckets or (prompt_len,)))
        assert chunked_prefill or self.prompt_buckets[-1] == prompt_len

        from ..models import decoder_family

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
            from ..lora import attach_lora

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
            self._len_buckets = bks
        # chunked int8/int4: the shadow-calibration phase runs at
        # max_len (the shadow graph's only length); buckets engage at
        # the first step after the calibration flip (_calibrating)
        self._cur_len = max_len if (
            self.chunked and self.kv_dtype == np.int8
            or self._len_buckets is None) else self._len_buckets[0]
        self.cache_resizes = 0

        def make_decode_graph(L: int):
            g = _attach(import_model(build_decode(
                cfg, batch=slots, max_len=L, seed=seed, **dkw)))
            if int4_weights:
                from ..quant import quantize_weights_int4

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
                from ..quant import quantize_weights_int4

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
                from ..quant import quantize_weights_int4

                g = quantize_weights_int4(g)
            if w8a8_prefill:
                from ..quant import quantize_matmuls_w8a8

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
        # the cache fp32 regardless — and takes the SHADOW graph's shapes
        # (int4's packed cache halves the hd axis; the fp32 phase is
        # unpacked)
        boot_np = np.float32 if self._shadow is not None else cache_np
        shape_src = (self._shadow.graph if self._shadow is not None
                     else self.decode.graph)
        self._cache: Dict[str, jax.Array] = {
            spec.name: jnp.zeros(spec.concrete_shape(batch=slots), boot_np)
            for spec in shape_src.inputs
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

    @property
    def _calibrating(self) -> bool:
        """Chunked int8/int4 serving before the first prompt finishes:
        the fp32 shadow graph (built at max_len) is stepping, so the
        cache is pinned to max_len until the quantization flip."""
        return self._shadow is not None and self._kv_scales is None

    def _fit_cache(self, admit_need: int = 0) -> None:
        if self._len_buckets is None or self._calibrating:
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
            from ..quant import pack_int4_kv

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

    def _step(self) -> None:
        if self._len_buckets is not None and not self._calibrating:
            # shrink opportunistically: growth happened at admission, so
            # only a finished long request can lower the requirement here
            # (the calibration phase is pinned to the shadow's max_len)
            t = self._bucket_for(self._required_len())
            if t < self._cur_len:
                self._resize_cache(t)
        if self.chunked:
            # chunked × multi_step runs the device block once int8 KV
            # calibration (shadow fp32 phase) is out of the way
            if self.multi_step > 0 and not self._calibrating:
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

        calibrating = self._calibrating
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
                        amax / self._kv_qmax).astype(np.float32)
            for name in list(self._cache):
                kind = "key" if "_key_" in name else "value"
                self._cache[name] = jnp.asarray(self._quant_kv(
                    _fetch(self._cache[name]),
                    f"kv_scale_{kind}_{name.rsplit('_', 1)[1]}"))
            # the shadow engine (a full duplicate parameter set) is dead
            # from here on — release it
            self._shadow = None
            self._shadow_graph = None

