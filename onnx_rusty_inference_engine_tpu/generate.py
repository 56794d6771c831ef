"""Autoregressive generation driver for ONNX decoder models (GPT-2 family).

Two compiled XLA programs per model: a prefill graph (prompt at once,
returns presents) and a fixed-cache decode graph (one token per step,
static shapes → zero recompiles across the whole generation). The KV cache
lives on device between steps; optionally INT8-quantized (north-star
config #5) and sharded over the mesh's "model" axis by head
(parallel/sharding.py).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .engine import Engine
from .graph import import_model
from .models.gpt2 import GPT2Config, build_gpt2, build_gpt2_decode

__all__ = ["Generator"]


class Generator:
    def __init__(
        self,
        cfg: GPT2Config,
        *,
        batch: int = 1,
        prompt_len: int = 8,
        max_len: int = 32,
        seed: int = 0,
        mesh=None,
        param_sharding_fn=None,
        kv_dtype: str = "float32",
        int4_weights: bool = False,
        family: str = "gpt2",
        scan_layers: bool = False,
        fused_attention: bool = False,
        prefill_dtype: str = "float32",
        device_loop: int = 0,
        pipeline_axis: Optional[str] = None,
        lora_bank=None,
        lora_alpha: float = 16.0,
        adapter=0,
    ):
        assert max_len >= prompt_len
        self.cfg = cfg
        self.batch = batch
        self.prompt_len = prompt_len
        self.max_len = max_len
        # int4: nibble-packed [B,H,L,hd/2] int8 cache (gpt2 builder) —
        # half the KV HBM traffic of int8 on the bandwidth-bound decode
        self._int4_kv = kv_dtype == "int4"
        self.kv_dtype = np.dtype(np.int8 if self._int4_kv else kv_dtype)
        self._kv_q = self._int4_kv or self.kv_dtype == np.int8
        self._kv_qmax = 7.0 if self._int4_kv else 127.0

        from .models import decoder_family

        build_prefill, build_decode, int8_kv_ok = decoder_family(family)
        if self._int4_kv and family not in ("gpt2", "llama", "moe"):
            raise NotImplementedError(
                f"{family}: int4 KV cache needs a nibble-packing decode "
                "graph (gpt2/llama/moe only)")
        if self._kv_q and not int8_kv_ok:
            raise NotImplementedError(
                f"{family}: in-graph quantized KV cache not implemented")
        dkw = {"kv_dtype": kv_dtype} if int8_kv_ok else {}
        # scan-over-layers decode graph: ONE lax.scan over stacked weights
        # instead of n_layer inlined blocks — collapses the per-step HLO op
        # count (and with it the dispatch gaps that dominate the step on a
        # tunnel-dispatched chip, PERF.md). Cache I/O becomes stacked:
        # past_key/past_value [n_layer, B, H, max_len, hd].
        self._stacked = bool(scan_layers)
        if scan_layers:
            dkw["scan_layers"] = True
        if fused_attention:
            # one Pallas kernel per layer over the int8 cache (ops/fused.py)
            dkw["fused_attention"] = True
        pkw = ({"past_len": 0, "with_presents": True} if family == "gpt2"
               else {"with_presents": True})
        prefill_graph = import_model(
            build_prefill(cfg, batch=batch, seq_len=prompt_len, seed=seed,
                          **pkw))
        decode_graph = import_model(
            build_decode(cfg, batch=batch, max_len=max_len, seed=seed,
                         **dkw))
        # prefill_dtype="w8a8": dynamic W8A8 matmuls on the MXU-bound
        # prefill (386k vs bf16's 234k tok/s on chip — PERF.md); the
        # remaining elementwise ops run bf16 (the fastest measured
        # composition). Decode keeps its own scheme (HBM-bound: INT4
        # weight-only wins there).
        w8a8_prefill = prefill_dtype == "w8a8"
        if w8a8_prefill:
            prefill_dtype = "bfloat16"
        if int4_weights:
            from .quant import quantize_weights_int4

            if not w8a8_prefill:
                prefill_graph = quantize_weights_int4(prefill_graph)
            decode_graph = quantize_weights_int4(decode_graph)
        # multi-LoRA: batched adapter deltas on both graphs (lora.py);
        # attached AFTER int4 so the base trunk quantizes while adapters
        # stay fp32 (the bank keys match through the __w4 rename). The
        # per-row `lora_idx` feed rides every prefill/decode call.
        self._lora = lora_bank is not None
        self._lora_idx: Optional[np.ndarray] = None
        if self._lora:
            from .lora import attach_lora

            prefill_graph = attach_lora(prefill_graph, lora_bank,
                                        alpha=lora_alpha)
            decode_graph = attach_lora(decode_graph, lora_bank,
                                       alpha=lora_alpha)
            self._lora_idx = np.broadcast_to(
                np.asarray(adapter, np.int64), (batch,)).copy()
        if w8a8_prefill:
            # AFTER attach_lora: the adapter rewrite matches base MatMuls
            # by weight name; w8a8 then takes the base contraction int8
            # while the small stacked-bank matmuls stay floating
            from .quant import quantize_matmuls_w8a8

            prefill_graph = quantize_matmuls_w8a8(prefill_graph)
        # pipeline parallelism: prefill AND decode trunks GPipe-sharded
        # over mesh[pipeline_axis] — the capacity path for models beyond
        # one chip's HBM (parallel/pipeline.py). The KV cache stays
        # stacked [n_layer, B, H, max_len, hd] and pipe-sharded between
        # steps (each stage keeps only its own layers' cache).
        self._pipelined = pipeline_axis is not None
        if self._pipelined:
            from .parallel.pipeline import PipelinedDecoder

            if mesh is None:
                raise ValueError("pipeline_axis requires a mesh")
            if scan_layers or fused_attention:
                raise NotImplementedError(
                    "pipeline_axis is incompatible with scan_layers/"
                    "fused_attention")
            if w8a8_prefill:
                raise NotImplementedError(
                    "pipelined prefill supports float32/bfloat16; the "
                    "w8a8 dynamic-quant rewrite is not pipelined")
            # the repo's decoder graphs carry batch at dim 0 on every
            # input except the per-head kv_scale_* quantization scales —
            # declare that so microbatching never relies on the dim == B
            # shape coincidence (kv_scale [H] with n_head == batch)
            def _batch_inputs(g):
                return [s.name for s in g.inputs
                        if not s.name.startswith("kv_scale_")]

            self.prefill = PipelinedDecoder(
                prefill_graph, mesh, axis=pipeline_axis,
                batch_inputs=_batch_inputs(prefill_graph),
                dtype=prefill_dtype)
            self.decode = PipelinedDecoder(
                decode_graph, mesh, axis=pipeline_axis,
                batch_inputs=_batch_inputs(decode_graph))
        else:
            ekw = dict(mesh=mesh, param_sharding_fn=param_sharding_fn)
            # prefill is MXU-bound: bf16 measured 1.69x fp32 on chip
            # (PERF.md "Prefill throughput"); decode keeps its own scheme
            self.prefill = Engine(prefill_graph, dtype=prefill_dtype, **ekw)
            self.decode = Engine(decode_graph, **ekw)
        # per-(layer, kind, head) scales, calibrated from the prefill
        self._kv_scales: Optional[Dict[str, np.ndarray]] = None
        # device-resident generation: K decode steps (select + KV update)
        # inside ONE dispatch via lax.scan over time — the served-latency
        # lever on a tunnel-dispatched chip where each host->device call
        # pays ~96% idle (PERF.md). 0 = classic one-step-per-call loop.
        self.device_loop = int(device_loop)
        self._multi_cache: Dict[tuple, callable] = {}

    # -- cache quantization (INT8 KV; the decode GRAPH carries the QDQ,
    # so the cache never round-trips HBM in fp32) -----------------------
    def _store(self, kv: jax.Array, scale_name: str) -> jax.Array:
        if self._int4_kv:
            from .quant import pack_int4_kv

            s = self._kv_scales[scale_name].reshape(1, -1, 1, 1)
            return pack_int4_kv(kv, s, xp=jnp)
        if self.kv_dtype == np.int8:
            s = self._kv_scales[scale_name].reshape(1, -1, 1, 1)
            return jnp.clip(jnp.round(kv / s), -127, 127).astype(jnp.int8)
        return kv.astype(self.kv_dtype)

    # -- token selection ---------------------------------------------------
    @staticmethod
    def _select(logits: jax.Array, key, temperature: float,
                top_k: Optional[int], top_p: Optional[float],
                seen=None, repetition_penalty: float = 1.0,
                min_p: Optional[float] = None) -> jax.Array:
        """logits [B, V] -> token ids [B]. temperature == 0 is greedy;
        otherwise categorical sampling with optional top-k / nucleus /
        min-p filtering — all on device (sort/cumsum/where, no host
        sync). min_p keeps tokens with prob >= min_p * p_max.

        repetition_penalty > 1 applies the CTRL scheme to tokens already
        in the sequence (`seen` [B, V] bool): positive logits divided by
        the penalty, negative multiplied."""
        if seen is not None and repetition_penalty != 1.0:
            p = jnp.float32(repetition_penalty)
            logits = jnp.where(seen,
                               jnp.where(logits > 0, logits / p,
                                         logits * p), logits)
        if temperature == 0.0:
            return jnp.argmax(logits, axis=-1)
        l = logits / temperature
        if top_k is not None:
            kth = jnp.sort(l, axis=-1)[:, -int(top_k)][:, None]
            l = jnp.where(l >= kth, l, -jnp.inf)
        if top_p is not None:
            sl = jnp.sort(l, axis=-1)[:, ::-1]
            probs = jax.nn.softmax(sl, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            # smallest set whose mass >= top_p: keep while cum - p < p_i
            keep = cum - probs < top_p
            thresh = jnp.min(jnp.where(keep, sl, jnp.inf), axis=-1,
                             keepdims=True)
            l = jnp.where(l >= thresh, l, -jnp.inf)
        if min_p is not None:
            # scale-invariant tail cutoff: keep p >= min_p * p_max
            pm = jnp.exp(l - jnp.max(jnp.where(jnp.isfinite(l), l,
                                               -jnp.inf),
                                     axis=-1, keepdims=True))
            l = jnp.where(pm >= min_p, l, -jnp.inf)
        return jax.random.categorical(key, l, axis=-1)

    # -- device-resident multi-step decode -------------------------------
    def _multi_step_fn(self, temperature, top_k, top_p, eos_id,
                       repetition_penalty, min_p=None):
        """Compile (once per sampling config) a function running
        `device_loop` decode steps inside one XLA program: lax.scan over
        TIME, on-device token selection (same _select math as the host
        loop), in-carry KV cache. Unlike the failed scan-over-LAYERS
        (PERF.md), every iteration re-reads the SAME weights — no stacked-
        weight dynamic-slice — so the negative result does not transfer."""
        key_cfg = (temperature, top_k, top_p, eos_id,
                   repetition_penalty, min_p)
        if key_cfg in self._multi_cache:
            return self._multi_cache[key_cfg]
        K = self.device_loop
        use_pen = repetition_penalty != 1.0
        if self._pipelined:
            # the GPipe forward composes under scan: shard_map with an
            # explicit mesh traces inside the outer jit, the stacked
            # presents keep their pipe sharding through the carry, so
            # each stage's KV stays on its own devices across all K
            # steps — pipelining (capacity) and device residency
            # (dispatch economics) stack (round-4 verdict item 4)
            pipe_fn = self.decode.jitted  # f(params, feed, stacked)->(o,e)
            select = self._select
            lora_idx_p = jnp.asarray(self._lora_idx) if self._lora else None

            def multi_p(params, tok, pos, cache, scales, key, done, seen):
                def body(carry, _):
                    tok, pos, cache, key, done, seen = carry
                    feed = {"input_ids": tok[:, None], "pos": pos}
                    if lora_idx_p is not None:
                        feed["lora_idx"] = lora_idx_p
                    out, ext = pipe_fn(params, feed, {**cache, **scales})
                    logits = out["logits"][:, -1, :]
                    key, sub = jax.random.split(key)
                    if use_pen:
                        seen_ = seen.at[jnp.arange(tok.shape[0]),
                                        tok].set(True)
                    else:
                        seen_ = seen
                    nxt = select(logits, sub, temperature, top_k, top_p,
                                 seen_ if use_pen else None,
                                 repetition_penalty, min_p)
                    nxt = nxt.astype(tok.dtype)
                    if eos_id is not None:
                        nxt = jnp.where(done, eos_id, nxt)
                        done_ = done | (nxt == eos_id)
                    else:
                        done_ = done
                    new_cache = {f"past_{kind}_0": ext[f"present_{kind}_0"]
                                 for kind in ("key", "value")}
                    return (nxt, pos + 1, new_cache, key, done_,
                            seen_), nxt

                carry, toks = jax.lax.scan(
                    body, (tok, pos, cache, key, done, seen), None,
                    length=K)
                nxt, pos, cache, key, done, seen = carry
                return toks.T, pos, cache, key, done, seen

            fn = jax.jit(multi_p)
            self._multi_cache[key_cfg] = fn
            return fn
        decode_fn = self.decode.jitted          # f(params, feed) -> out
        present_of = {
            name: name.replace("past_", "present_", 1)
            for name in (spec.name for spec in self.decode.graph.inputs)
            if name.startswith("past_")}
        int8 = self.kv_dtype == np.int8
        select = self._select
        lora_idx = jnp.asarray(self._lora_idx) if self._lora else None

        def multi(params, tok, pos, cache, scales, key, done, seen):
            def body(carry, _):
                tok, pos, cache, key, done, seen = carry
                feed = {"input_ids": tok[:, None], "pos": pos}
                feed.update(cache)
                if int8:
                    feed.update(scales)
                if lora_idx is not None:
                    feed["lora_idx"] = lora_idx
                out = decode_fn(params, feed)
                logits = out["logits"][:, -1, :]
                key, sub = jax.random.split(key)
                if use_pen:
                    seen = seen.at[jnp.arange(tok.shape[0]), tok].set(True)
                nxt = select(logits, sub, temperature, top_k, top_p,
                             seen if use_pen else None,
                             repetition_penalty, min_p)
                nxt = nxt.astype(tok.dtype)
                if eos_id is not None:
                    nxt = jnp.where(done, eos_id, nxt)
                    done = done | (nxt == eos_id)
                new_cache = {p: out[pr] for p, pr in present_of.items()}
                return (nxt, pos + 1, new_cache, key, done, seen), nxt

            carry0 = (tok, pos, cache, key, done, seen)
            carry, toks = jax.lax.scan(body, carry0, None, length=K)
            nxt, pos, cache, key, done, seen = carry
            return toks.T, pos, cache, key, done, seen   # toks [B, K]

        fn = jax.jit(multi)
        self._multi_cache[key_cfg] = fn
        return fn

    # -- generation ------------------------------------------------------
    def generate(self, input_ids: np.ndarray, n_new: int,
                 return_logits: bool = False,
                 temperature: float = 0.0,
                 top_k: Optional[int] = None,
                 top_p: Optional[float] = None,
                 sample_seed: int = 0,
                 eos_id: Optional[int] = None,
                 repetition_penalty: float = 1.0,
                 min_p: Optional[float] = None,
                 ) -> Tuple[np.ndarray, Optional[list]]:
        """Decode n_new tokens. Greedy by default; temperature > 0 samples
        (optionally top-k / top-p filtered). input_ids: [B, prompt_len].

        eos_id: rows that emit it are frozen (keep emitting eos_id) and
        generation stops early once every row has finished.
        repetition_penalty: CTRL-style penalty on already-seen tokens
        (prompt + generated), applied on device."""
        B, P = input_ids.shape
        assert (B, P) == (self.batch, self.prompt_len)
        assert P + n_new <= self.max_len
        use_pen = repetition_penalty != 1.0
        seen = None
        if use_pen:
            seen = jnp.zeros((B, self.cfg.vocab_size), bool).at[
                jnp.arange(B)[:, None], jnp.asarray(input_ids)].set(True)

        key = jax.random.PRNGKey(sample_seed)
        pfeed = {"input_ids": input_ids.astype(np.int64)}
        if self._lora:
            pfeed["lora_idx"] = self._lora_idx
        out = self.prefill(pfeed)
        logits = out["logits"]
        key, sub = jax.random.split(key)
        next_tok = self._select(logits[:, -1, :], sub, temperature,
                                top_k, top_p, seen, repetition_penalty,
                                min_p)
        done = np.zeros((B,), bool)
        if eos_id is not None:
            done |= np.asarray(next_tok) == eos_id

        # calibrate per-(layer, kind, head) scales from the prefill presents
        L = self.cfg.n_layer
        if self.kv_dtype == np.int8 and self._kv_scales is None:
            self._kv_scales = {}
            for i in range(L):
                for kind in ("key", "value"):
                    kv = np.asarray(out[f"present_{kind}_{i}"])
                    amax = np.maximum(np.abs(kv).max(axis=(0, 2, 3)), 1e-6)
                    self._kv_scales[f"kv_scale_{kind}_{i}"] = (
                        amax / self._kv_qmax).astype(np.float32)
            if self._stacked:  # stacked graph takes kv_scale_key [L, H]
                self._kv_scales = {
                    f"kv_scale_{kind}": np.stack(
                        [self._kv_scales[f"kv_scale_{kind}_{i}"]
                         for i in range(L)])
                    for kind in ("key", "value")}

        # seed the fixed-size cache with the prefill presents
        cache: Dict[str, jax.Array] = {}
        for kind in ("key", "value"):
            full = []
            for i in range(L):
                kv = out[f"present_{kind}_{i}"]  # [B,H,P,hd]
                pad = self.max_len - kv.shape[2]
                kv_full = jnp.pad(kv, ((0, 0), (0, 0), (0, pad), (0, 0)))
                if self._stacked:
                    full.append(kv_full)
                else:
                    cache[f"past_{kind}_{i}"] = self._store(
                        kv_full, f"kv_scale_{kind}_{i}")
            if self._stacked:
                stacked = jnp.stack(full)  # [L,B,H,max_len,hd]
                if self.kv_dtype == np.int8:
                    s = self._kv_scales[f"kv_scale_{kind}"]
                    s = jnp.asarray(s)[:, None, :, None, None]
                    stacked = jnp.clip(jnp.round(stacked / s), -127, 127
                                       ).astype(jnp.int8)
                cache[f"past_{kind}"] = stacked.astype(
                    jnp.int8 if self.kv_dtype == np.int8 else jnp.float32)

        # pipelined decode: stack the per-layer cache ONCE; thereafter the
        # presents come back as [L, ...] arrays still sharded over the pipe
        # axis and feed straight back in — each stage's KV never leaves it
        pipe_cache: Dict[str, jax.Array] = {}
        pipe_scales: Dict[str, jax.Array] = {}
        if self._pipelined:
            for kind in ("key", "value"):
                pipe_cache[f"past_{kind}_0"] = jnp.stack(
                    [cache.pop(f"past_{kind}_{i}") for i in range(L)])
                if self.kv_dtype == np.int8:
                    pipe_scales[f"kv_scale_{kind}_0"] = jnp.stack(
                        [jnp.asarray(self._kv_scales[f"kv_scale_{kind}_{i}"])
                         for i in range(L)])

        tokens = [np.asarray(next_tok)]
        all_logits = [np.asarray(logits)] if return_logits else None

        if self.device_loop > 0 and not return_logits:
            # K steps per dispatch; the final partial block is truncated
            # on the host (the over-decoded cache rows are never returned)
            multi = self._multi_step_fn(temperature, top_k, top_p,
                                        eos_id, repetition_penalty,
                                        min_p)
            if self._pipelined:
                # shard the stacked cache/scales over the pipe axis ONCE;
                # the scan carry keeps that sharding, so each stage's KV
                # never leaves its devices across the K steps
                put = lambda d: {k: jax.device_put(  # noqa: E731
                    jnp.asarray(v), self.decode._stage_shard)
                    for k, v in d.items()}
                scales = put(pipe_scales)  # canonical stacked names
                cache_d = put(pipe_cache)
            else:
                scales = ({k: jnp.asarray(v)
                           for k, v in self._kv_scales.items()}
                          if self.kv_dtype == np.int8 else {})
                cache_d = {k: jnp.asarray(v) for k, v in cache.items()}
            tok_d = jnp.asarray(next_tok)
            pos_d = jnp.full((B,), P, dtype=jnp.int32)
            done_d = jnp.asarray(done)
            seen_d = (seen if use_pen
                      else jnp.zeros((B, 1), bool))  # placeholder carry
            remaining = n_new - 1
            while remaining > 0:
                if eos_id is not None and bool(np.asarray(done_d).all()):
                    break
                toks, pos_d, cache_d, key, done_d, seen_d = multi(
                    self.decode.params, tok_d, pos_d, cache_d, scales,
                    key, done_d, seen_d)
                toks = np.asarray(toks)           # [B, K]
                take = min(self.device_loop, remaining)
                for j in range(take):
                    tokens.append(toks[:, j])
                tok_d = jnp.asarray(toks[:, self.device_loop - 1])
                remaining -= take
            out_toks = np.stack(tokens, axis=1)[:, :n_new]
            if eos_id is not None and out_toks.shape[1] < n_new:
                pad = np.full((B, n_new - out_toks.shape[1]), eos_id,
                              out_toks.dtype)
                out_toks = np.concatenate([out_toks, pad], axis=1)
            return out_toks, None

        for t in range(n_new - 1):
            if eos_id is not None and bool(done.all()) and not return_logits:
                break  # every row frozen; remaining output is eos padding
            pos = np.full((B,), P + t, dtype=np.int64)
            feed = {"input_ids": np.asarray(next_tok)[:, None].astype(np.int64),
                    "pos": pos}
            if self._pipelined:
                if self._lora:
                    feed["lora_idx"] = self._lora_idx
                step, ext = self.decode.stacked_call(
                    feed, {**pipe_cache, **pipe_scales})
                pipe_cache = {f"past_{k}_0": ext[f"present_{k}_0"]
                              for k in ("key", "value")}
            else:
                feed.update(cache)  # int8 pasts flow straight back in
                if self.kv_dtype == np.int8:
                    feed.update(self._kv_scales)
                if self._lora:
                    feed["lora_idx"] = self._lora_idx
                step = self.decode(feed)
            step_logits = step["logits"]
            key, sub = jax.random.split(key)
            if use_pen:
                seen = seen.at[jnp.arange(B), jnp.asarray(next_tok)].set(
                    True)
            next_tok = self._select(step_logits[:, -1, :], sub,
                                    temperature, top_k, top_p, seen,
                                    repetition_penalty, min_p)
            if eos_id is not None:
                nt = np.array(next_tok)
                nt[done] = eos_id     # frozen rows keep emitting eos
                next_tok = jnp.asarray(nt)
                done |= nt == eos_id
            if self._pipelined:
                pass  # pipe_cache already updated (sharded presents)
            elif self._stacked:
                cache["past_key"] = step["present_key"]
                cache["past_value"] = step["present_value"]
            else:
                for i in range(L):
                    for kind in ("key", "value"):
                        cache[f"past_{kind}_{i}"] = step[f"present_{kind}_{i}"]
            tokens.append(np.asarray(next_tok))
            if return_logits:
                all_logits.append(np.asarray(step_logits))

        out_toks = np.stack(tokens, axis=1)
        if eos_id is not None and out_toks.shape[1] < n_new:
            pad = np.full((B, n_new - out_toks.shape[1]), eos_id,
                          out_toks.dtype)
            out_toks = np.concatenate([out_toks, pad], axis=1)
        return out_toks, all_logits


class Seq2SeqGenerator:
    """Encoder-decoder generation (seq2seq_family: "t5" tokens->tokens,
    "asr" waveform->tokens): encode once, then greedy / sampled decode
    over a fixed self-attn KV cache + static cross K/V.

    TPU-native split: the encoder (+ cross-KV projection) is ONE compiled
    program run once per request; the decode step is another, same
    per-slot `pos [B]` contract as Generator.

    kv_dtype="int8": the decoder has no prefill to calibrate from, so the
    first `calib_steps` tokens run a SHADOW fp32 decode graph to collect
    per-(layer, kind, head) amax; the fp32 cache is then quantized once
    and generation continues on the int8-QDQ graph.
    """

    def __init__(
        self,
        cfg,
        *,
        batch: int = 1,
        src_len: int = 16,
        max_len: int = 32,
        seed: int = 0,
        mesh=None,
        param_sharding_fn=None,
        kv_dtype: str = "float32",
        int4_weights: bool = False,
        calib_steps: int = 4,
        family: str = "t5",
    ):
        from .models import seq2seq_family

        self.fam = seq2seq_family(family)
        self.cfg = cfg
        self.batch = batch
        self.src_len = src_len
        self.enc_len = self.fam.enc_len(cfg, src_len)
        self.max_len = max_len
        self.kv_dtype = np.dtype(kv_dtype)
        if self.kv_dtype == np.int8 and calib_steps < 1:
            raise ValueError("int8 KV needs calib_steps >= 1 (the shadow "
                             "fp32 steps that set the scales)")
        self.calib_steps = calib_steps

        enc_graph = import_model(self.fam.build_encoder(
            cfg, batch=batch, src_len=src_len, seed=seed))
        dec_graph = import_model(self.fam.build_decode(
            cfg, batch=batch, max_len=max_len, src_len=self.enc_len,
            seed=seed, kv_dtype=kv_dtype))
        self._dec_fp32_graph = None
        if self.kv_dtype == np.int8:
            self._dec_fp32_graph = import_model(self.fam.build_decode(
                cfg, batch=batch, max_len=max_len, src_len=self.enc_len,
                seed=seed))
        if int4_weights:
            from .quant import quantize_weights_int4

            enc_graph = quantize_weights_int4(enc_graph)
            dec_graph = quantize_weights_int4(dec_graph)
            if self._dec_fp32_graph is not None:
                self._dec_fp32_graph = quantize_weights_int4(
                    self._dec_fp32_graph)
        ekw = dict(mesh=mesh, param_sharding_fn=param_sharding_fn)
        self.encoder = Engine(enc_graph, **ekw)
        self.decode = Engine(dec_graph, **ekw)
        self.decode_fp32 = (Engine(self._dec_fp32_graph, **ekw)
                            if self._dec_fp32_graph is not None else None)

    def generate(self, src_ids: np.ndarray, n_new: int,
                 start_token: int = 0,
                 return_logits: bool = False,
                 temperature: float = 0.0,
                 top_k: Optional[int] = None,
                 top_p: Optional[float] = None,
                 sample_seed: int = 0,
                 src_lengths: Optional[np.ndarray] = None):
        """Encode the source [B, src_len] (tokens or waveform, per
        family); decode n_new tokens. src_lengths [B]: true per-row
        source lengths for padding-masked families (default: full)."""
        B, S = src_ids.shape
        assert (B, S) == (self.batch, self.src_len)
        assert n_new <= self.max_len
        L = self.fam.n_layers(self.cfg)
        H, hd = self.cfg.n_head, self.cfg.head_dim
        ML = self.max_len
        int8 = self.kv_dtype == np.int8

        if int8 and n_new <= self.calib_steps:
            import logging
            logging.getLogger(__name__).warning(
                "n_new=%d <= calib_steps=%d: every step runs the shadow "
                "fp32 graph; the int8 cache never engages", n_new,
                self.calib_steps)
        if src_lengths is None:
            src_lengths = np.full((B,), S, np.int64)
        src_mask_feed = ({"src_len": src_lengths.astype(np.int64)}
                         if self.fam.src_mask else {})
        enc_feed = {self.fam.enc_input:
                    src_ids.astype(self.fam.prompt_dtype)}
        enc_feed.update(src_mask_feed)
        enc = self.encoder(enc_feed)
        cross = {k: v for k, v in enc.items() if k.startswith("cross_")}
        cross.update(src_mask_feed)

        cache = {}
        cache_dtype = np.float32  # calib phase runs fp32 even for int8
        for i in range(L):
            for kind in ("key", "value"):
                cache[f"past_{kind}_{i}"] = jnp.zeros(
                    (B, H, ML, hd), jnp.float32)

        key = jax.random.PRNGKey(sample_seed)
        next_tok = np.full((B,), start_token, dtype=np.int64)
        tokens, all_logits = [], [] if return_logits else None
        kv_scales = None
        amax = {}

        for t in range(n_new):
            feed = {"input_ids": np.asarray(next_tok)[:, None],
                    "pos": np.full((B,), t, dtype=np.int64)}
            feed.update(cross)
            feed.update(cache)
            calibrating = int8 and t < self.calib_steps
            if int8 and not calibrating:
                feed.update(kv_scales)
            eng = self.decode_fp32 if calibrating else self.decode
            step = eng(feed)
            if calibrating:
                for i in range(L):
                    for kind in ("key", "value"):
                        kv = np.asarray(step[f"present_{kind}_{i}"])
                        a = np.abs(kv).max(axis=(0, 2, 3))
                        prev = amax.get(f"{kind}_{i}")
                        amax[f"{kind}_{i}"] = (a if prev is None
                                               else np.maximum(a, prev))
            for i in range(L):
                for kind in ("key", "value"):
                    cache[f"past_{kind}_{i}"] = step[f"present_{kind}_{i}"]
            if int8 and t == self.calib_steps - 1:
                # switch: quantize the fp32 cache once, continue on int8
                kv_scales = {
                    f"kv_scale_{kind}_{i}": (np.maximum(
                        amax[f"{kind}_{i}"], 1e-6) / 127.0
                        ).astype(np.float32)
                    for i in range(L) for kind in ("key", "value")}
                for i in range(L):
                    for kind in ("key", "value"):
                        s = kv_scales[f"kv_scale_{kind}_{i}"].reshape(
                            1, -1, 1, 1)
                        kv = cache[f"past_{kind}_{i}"]
                        cache[f"past_{kind}_{i}"] = jnp.clip(
                            jnp.round(kv / s), -127, 127).astype(jnp.int8)
            logits = step["logits"]
            key, sub = jax.random.split(key)
            next_tok = Generator._select(logits[:, -1, :], sub, temperature,
                                         top_k, top_p)
            tokens.append(np.asarray(next_tok))
            if return_logits:
                all_logits.append(np.asarray(logits))

        return np.stack(tokens, axis=1), all_logits


class SpeculativeGenerator:
    """Greedy speculative decoding: a small DRAFT model proposes k tokens
    autoregressively; the TARGET model verifies all k in ONE chunk-decode
    call (build_gpt2_decode(chunk=k)) and emits the accepted prefix plus
    one corrected/bonus token. Greedy verification is LOSSLESS: the output
    equals the target's own greedy decode exactly, whatever the draft
    proposes — the draft only changes how many target calls it takes.

    TPU-native shape: three compiled programs total (target prefill,
    draft prefill+decode, target chunk-verify); per-slot positions let
    every batch row accept a different prefix length without recompiling.
    Stale cache rows past a slot's position are never attended and get
    overwritten as the position advances — no rollback step exists.
    """

    def __init__(
        self,
        target_cfg,
        draft_cfg=None,
        *,
        batch: int = 1,
        prompt_len: int = 8,
        max_len: int = 64,
        k: int = 4,
        target_seed: int = 0,
        draft_seed: int = 1,
        family: str = "gpt2",
        mesh=None,
        param_sharding_fn=None,
    ):
        from .models import decoder_family

        build_prefill, build_decode, _ = decoder_family(family)
        self.k = k
        self.batch = batch
        self.prompt_len = prompt_len
        self.max_len = max_len
        self.tcfg = target_cfg
        dcfg = draft_cfg if draft_cfg is not None else target_cfg
        self.dcfg = dcfg
        assert dcfg.vocab_size == target_cfg.vocab_size

        pkw = ({"past_len": 0, "with_presents": True} if family == "gpt2"
               else {"with_presents": True})
        ekw = dict(mesh=mesh, param_sharding_fn=param_sharding_fn)
        self.t_prefill = Engine(import_model(build_prefill(
            target_cfg, batch=batch, seq_len=prompt_len, seed=target_seed,
            **pkw)), **ekw)
        self.t_verify = Engine(import_model(build_decode(
            target_cfg, batch=batch, max_len=max_len, seed=target_seed,
            chunk=k)), **ekw)
        self.d_prefill = Engine(import_model(build_prefill(
            dcfg, batch=batch, seq_len=prompt_len, seed=draft_seed,
            **pkw)), **ekw)
        self.d_decode = Engine(import_model(build_decode(
            dcfg, batch=batch, max_len=max_len, seed=draft_seed)), **ekw)
        self.accepted_total = 0
        self.proposed_total = 0

    @staticmethod
    def _seed_cache(out, cfg, max_len):
        cache = {}
        for i in range(cfg.n_layer):
            for kind in ("key", "value"):
                kv = out[f"present_{kind}_{i}"]
                pad = max_len - kv.shape[2]
                cache[f"past_{kind}_{i}"] = jnp.pad(
                    kv, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return cache

    def generate(self, input_ids: np.ndarray, n_new: int,
                 temperature: float = 0.0, sample_seed: int = 0):
        """Decode n_new tokens per slot. temperature == 0: greedy
        verification — output is IDENTICAL to the target's own greedy
        decode. temperature > 0: speculative REJECTION sampling
        (Leviathan et al.): draft token x ~ q accepted with prob
        min(1, p(x)/q(x)); on rejection the emitted token is drawn from
        normalize(max(p - q, 0)) — the output token distribution equals
        plain sampling from the target at that temperature."""
        B, P = input_ids.shape
        assert (B, P) == (self.batch, self.prompt_len)
        assert P + n_new + self.k <= self.max_len, "raise max_len"
        k = self.k
        sampling = temperature > 0.0
        host_rng = np.random.default_rng(sample_seed)

        def soft(logits2d):
            z = np.asarray(logits2d, np.float64) / temperature
            z -= z.max(axis=-1, keepdims=True)
            e = np.exp(z)
            return e / e.sum(axis=-1, keepdims=True)

        t_out = self.t_prefill({"input_ids": input_ids.astype(np.int64)})
        t_cache = self._seed_cache(t_out, self.tcfg, self.max_len)
        d_out = self.d_prefill({"input_ids": input_ids.astype(np.int64)})
        d_cache = self._seed_cache(d_out, self.dcfg, self.max_len)

        first_logits = np.asarray(t_out["logits"][:, -1, :])
        if sampling:
            pf = soft(first_logits)
            cur = np.array([host_rng.choice(pf.shape[-1], p=pf[b])
                            for b in range(B)], dtype=np.int64)
        else:
            cur = first_logits.argmax(-1).astype(np.int64)       # [B]
        pos = np.full((B,), P, dtype=np.int64)
        emitted = [[int(c)] for c in cur]

        while min(len(e) for e in emitted) < n_new:
            # 1) draft proposes k-1 continuations of cur (so the verify
            #    chunk holds exactly k tokens: cur, d1..d_{k-1})
            drafts = [cur]
            d_tok = cur
            q_dists = []       # q_j [B, V] — dist draft token j+1 came from
            for j in range(k - 1):
                feed = {"input_ids": d_tok[:, None], "pos": pos + j}
                feed.update(d_cache)
                step = self.d_decode(feed)
                for i in range(self.dcfg.n_layer):
                    for kind in ("key", "value"):
                        d_cache[f"past_{kind}_{i}"] = step[
                            f"present_{kind}_{i}"]
                dl = np.asarray(step["logits"][:, -1, :])
                if sampling:
                    q = soft(dl)
                    q_dists.append(q)
                    d_tok = np.array([host_rng.choice(q.shape[-1], p=q[b])
                                      for b in range(B)], dtype=np.int64)
                else:
                    d_tok = dl.argmax(-1).astype(np.int64)
                drafts.append(d_tok)
            # write the LAST draft token's KV row as well (logits unused):
            # on a full-acceptance round pos jumps past position pos+k-1,
            # and without this write that row would stay zero forever and
            # be attended by every later draft step, silently degrading
            # acceptance (found by review, verified empirically)
            feed = {"input_ids": d_tok[:, None], "pos": pos + k - 1}
            feed.update(d_cache)
            step = self.d_decode(feed)
            for i in range(self.dcfg.n_layer):
                for kind in ("key", "value"):
                    d_cache[f"past_{kind}_{i}"] = step[
                        f"present_{kind}_{i}"]
            chunk = np.stack(drafts, axis=1)                     # [B, k]

            # 2) one target call verifies the whole chunk
            feed = {"input_ids": chunk, "pos": pos}
            feed.update(t_cache)
            vout = self.t_verify(feed)
            for i in range(self.tcfg.n_layer):
                for kind in ("key", "value"):
                    t_cache[f"past_{kind}_{i}"] = vout[
                        f"present_{kind}_{i}"]
            t_logits = np.asarray(vout["logits"])               # [B, k, V]
            tpred = t_logits.argmax(-1).astype(np.int64)         # [B, k]

            # 3) per-slot acceptance: greedy prefix match, or rejection
            #    sampling when temperature > 0
            new_cur = np.empty_like(cur)
            for b in range(B):
                if len(emitted[b]) >= n_new:
                    # slot already done: advance by 1 real token to keep
                    # positions consistent (its row still decoded)
                    new_cur[b] = tpred[b, 0]
                    pos[b] += 1
                    continue
                if sampling:
                    p_dists = soft(t_logits[b])                  # [k, V]
                    out_toks = []
                    m = 0
                    for j in range(k - 1):
                        x = int(chunk[b, j + 1])
                        qx = q_dists[j][b, x]
                        px = p_dists[j, x]
                        if host_rng.random() < min(1.0, px / max(qx, 1e-30)):
                            out_toks.append(x)
                            m += 1
                            continue
                        res = np.maximum(p_dists[j] - q_dists[j][b], 0.0)
                        tot = res.sum()
                        if tot <= 0:  # q covers p exactly; resample p
                            res, tot = p_dists[j], 1.0
                        out_toks.append(int(host_rng.choice(
                            res.shape[-1], p=res / tot)))
                        break
                    else:
                        # every draft accepted: bonus token from p_{k-1}
                        out_toks.append(int(host_rng.choice(
                            p_dists[k - 1].shape[-1], p=p_dists[k - 1])))
                    emitted[b].extend(out_toks)
                    new_cur[b] = out_toks[-1]
                    pos[b] += len(out_toks)
                    self.accepted_total += m
                    self.proposed_total += k - 1
                    continue
                m = 0
                while m < k - 1 and chunk[b, m + 1] == tpred[b, m]:
                    m += 1
                accepted = [int(t) for t in tpred[b, :m + 1]]
                emitted[b].extend(accepted)
                new_cur[b] = tpred[b, m]
                pos[b] += m + 1
                self.accepted_total += m
                self.proposed_total += k - 1
            cur = new_cur
            # draft cache rows past each slot's pos are stale; harmless
            # (masked) — but the draft must RE-SYNC its next decode to the
            # accepted stream, which feeding `cur` at `pos` does.

        toks = np.stack([np.asarray(e[:n_new]) for e in emitted])
        return toks, None

    @property
    def acceptance_rate(self) -> float:
        return (self.accepted_total / self.proposed_total
                if self.proposed_total else 0.0)


def _beam_loop(step_logp, reorder, tokens, scores, finished, *,
               B: int, K: int, V: int, n_new: int,
               eos_id: Optional[int], length_penalty: float,
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Shared beam bookkeeping for steps 1..n_new-1 (step 0 seeded the
    K beams). step_logp(last [B*K], t) -> log-probs [B*K, V] (and must
    stage its presents); reorder(rows [B*K]) commits the device cache
    for the chosen beams. Returns (best tokens [B, n_new], scores [B])."""
    last = tokens[:, :, -1].reshape(B * K)
    for t in range(1, n_new):
        if finished.all():
            break
        lp = step_logp(last, t).reshape(B, K, V)
        if eos_id is not None:
            # frozen beams: single eos continuation at 0 extra cost
            frozen = np.full((V,), -np.inf)
            frozen[eos_id] = 0.0
            lp = np.where(finished[:, :, None], frozen, lp)
        total = scores[:, :, None] + lp                 # [B, K, V]
        flat = total.reshape(B, K * V)
        sel = np.argsort(flat, axis=-1)[:, ::-1][:, :K]  # [B, K]
        scores = np.take_along_axis(flat, sel, axis=-1)
        src_beam = sel // V                             # [B, K]
        tok = sel % V

        tokens = np.concatenate(
            [np.take_along_axis(tokens, src_beam[:, :, None], axis=1),
             tok[:, :, None]], axis=2)
        finished = np.take_along_axis(finished, src_beam, axis=1)
        if eos_id is not None:
            finished = finished | (tok == eos_id)

        # reorder the device cache by global beam row (batch-dim take)
        reorder((np.arange(B)[:, None] * K + src_beam).reshape(-1))
        last = tok.reshape(B * K)

    return _beam_finalize(tokens, scores, n_new=n_new, eos_id=eos_id,
                          length_penalty=length_penalty)


def _beam_finalize(tokens: np.ndarray, scores: np.ndarray, *, n_new: int,
                   eos_id: Optional[int], length_penalty: float,
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Final best-beam selection shared by the host loop and the device
    scan: GNMT length penalty, argmax over beams, eos-padding to n_new."""
    B = tokens.shape[0]
    if length_penalty:
        lens = tokens.shape[2] - (0 if eos_id is None
                                  else (tokens == eos_id).sum(2))
        final = scores / np.maximum(lens, 1) ** length_penalty
    else:
        final = scores
    best = final.argmax(axis=1)                         # [B]
    out_toks = tokens[np.arange(B), best]               # [B, <=n_new]
    if out_toks.shape[1] < n_new:
        pad_tok = eos_id if eos_id is not None else 0
        out_toks = np.concatenate(
            [out_toks, np.full((B, n_new - out_toks.shape[1]),
                               pad_tok, out_toks.dtype)], axis=1)
    return out_toks, scores[np.arange(B), best]


def _beam_backtrack(top0: np.ndarray, parents: np.ndarray,
                    toks: np.ndarray) -> np.ndarray:
    """Reconstruct [B, K, T+1] beam histories from per-step parent
    pointers — the host-side half of the device beam scan (the scan
    records (src_beam, token) per step instead of reordering a token
    buffer on device)."""
    T, B, K = parents.shape
    seq = np.zeros((B, K, T + 1), np.int64)
    bi = np.arange(B)[:, None]
    cur = np.tile(np.arange(K), (B, 1))
    for t in range(T - 1, -1, -1):
        seq[:, :, t + 1] = toks[t][bi, cur]
        cur = parents[t][bi, cur]
    seq[:, :, 0] = np.take_along_axis(top0, cur, axis=1)
    return seq


def _build_device_beam_fn(decode_fn, past_names, *, B: int, K: int, V: int,
                          n_new: int, eos_id: Optional[int]):
    """One jitted program running ALL beam steps 1..n_new-1: decode,
    log-softmax, frozen-beam masking, top-K expansion, and the cache
    reorder (batch-dim take — the cheap gather class) inside a lax.scan.
    Returns (scores [B,K], finished [B,K], parents [T,B,K], toks [T,B,K]).

    Early exit is unnecessary for correctness: a finished beam's only
    continuation is eos at zero cost, so extra steps append eos without
    moving any score — exactly the host loop's break-and-pad-with-eos."""
    present_of = {n: n.replace("past_", "present_", 1) for n in past_names}
    T = n_new - 1

    def run(params, cache, const_feed, last, scores, finished, pos):
        def body(carry, _):
            last, scores, finished, cache, pos = carry
            feed = {"input_ids": last[:, None], "pos": pos}
            feed.update(cache)
            feed.update(const_feed)
            out = decode_fn(params, feed)
            lp = jax.nn.log_softmax(
                out["logits"][:, -1, :].astype(jnp.float32))
            lp = lp.reshape(B, K, V)
            if eos_id is not None:
                frozen = jnp.full((V,), -jnp.inf).at[eos_id].set(0.0)
                lp = jnp.where(finished[:, :, None], frozen, lp)
            flat = (scores[:, :, None] + lp).reshape(B, K * V)
            vals, idx = jax.lax.top_k(flat, K)
            src_beam = idx // V                          # [B, K]
            tok = idx % V
            fin = jnp.take_along_axis(finished, src_beam, axis=1)
            if eos_id is not None:
                fin = fin | (tok == eos_id)
            rows = (jnp.arange(B)[:, None] * K + src_beam).reshape(-1)
            new_cache = {n: jnp.take(out[p], rows, axis=0)
                         for n, p in present_of.items()}
            return ((tok.reshape(B * K), vals, fin, new_cache, pos + 1),
                    (src_beam, tok))

        carry, (parents, toks) = jax.lax.scan(
            body, (last, scores, finished, cache, pos), None, length=T)
        _, scores, finished, _, _ = carry
        return scores, finished, parents, toks

    return jax.jit(run)


class BeamGenerator:
    """Beam search over a decoder family (gpt2/llama/moe or a registered
    custom family).

    TPU-native realization: beams ARE batch rows. The prefill graph runs
    at batch B; its presents tile K× into a batch-B*K fixed-size decode
    cache, and every step is ONE compiled decode call over all B*K beams
    (per-slot `pos [B*K]`, the serving contract). Beam reordering is a
    batch-dim `jnp.take` on the cache — a tiny first-axis gather, NOT the
    catastrophic inner-dim gather class (CLAUDE.md); it stays on device.
    Host keeps only scores [B, K] and token history.

    eos_id: finished beams are frozen — their only continuation is eos at
    zero incremental logprob — so they compete on their final score while
    live beams keep expanding (standard beam bookkeeping).

    Scores are summed token logprobs (length_penalty: divide by
    (len)**alpha at the final selection, GNMT-style, alpha=0 = off).
    """

    def __init__(self, cfg, *, batch: int = 1, beam: int = 4,
                 prompt_len: int = 8, max_len: int = 32, seed: int = 0,
                 family: str = "gpt2", int4_weights: bool = False,
                 device_loop: bool = False):
        from .models import decoder_family

        assert beam >= 1
        # device_loop: run ALL beam steps (score/expand/reorder included)
        # inside one lax.scan — one dispatch per generate() instead of
        # one per token; bit-identical beams, ~device_loop-style speedup
        # on dispatch-bound links (the greedy lever, PERF.md)
        self.device_loop = bool(device_loop)
        self._dev_fns: Dict[tuple, object] = {}
        self.cfg, self.B, self.K = cfg, batch, beam
        self.prompt_len, self.max_len = prompt_len, max_len
        build_prefill, build_decode, _ = decoder_family(family)
        pkw = ({"past_len": 0, "with_presents": True} if family == "gpt2"
               else {"with_presents": True})
        pg = import_model(build_prefill(cfg, batch=batch,
                                        seq_len=prompt_len, seed=seed,
                                        **pkw))
        dg = import_model(build_decode(cfg, batch=batch * beam,
                                       max_len=max_len, seed=seed))
        if int4_weights:
            from .quant import quantize_weights_int4

            pg = quantize_weights_int4(pg)
            dg = quantize_weights_int4(dg)
        self.prefill = Engine(pg)
        self.decode = Engine(dg)
        self._past_names = [s.name for s in dg.inputs
                            if s.name.startswith("past_")]

    def generate(self, input_ids: np.ndarray, n_new: int,
                 eos_id: Optional[int] = None,
                 length_penalty: float = 0.0,
                 ) -> Tuple[np.ndarray, np.ndarray]:
        """-> (tokens [B, n_new], scores [B]) of each row's best beam."""
        B, K, P = self.B, self.K, self.prompt_len
        assert input_ids.shape == (B, P)
        assert P + n_new <= self.max_len
        V = self.cfg.vocab_size

        out = self.prefill({"input_ids": input_ids.astype(np.int64)})
        logp = jax.nn.log_softmax(out["logits"][:, -1, :])  # [B, V]
        logp = np.asarray(logp)
        top = np.argsort(logp, axis=-1)[:, ::-1][:, :K]     # [B, K]
        scores = np.take_along_axis(logp, top, axis=-1)     # [B, K]
        tokens = top[:, :, None]                            # [B, K, 1]
        finished = np.zeros((B, K), bool)
        if eos_id is not None:
            finished |= top == eos_id

        # tile presents K x along batch: beam rows are b*K + k
        cache: Dict[str, jax.Array] = {}
        L = self.cfg.n_layer
        for i in range(L):
            for kind in ("key", "value"):
                kv = out[f"present_{kind}_{i}"]             # [B, H, P, hd]
                pad = self.max_len - kv.shape[2]
                kv = jnp.pad(kv, ((0, 0), (0, 0), (0, pad), (0, 0)))
                cache[f"past_{kind}_{i}"] = jnp.repeat(kv, K, axis=0)

        if self.device_loop:
            key = (n_new, eos_id)
            if key not in self._dev_fns:
                self._dev_fns[key] = _build_device_beam_fn(
                    self.decode.jitted, self._past_names,
                    B=B, K=K, V=V, n_new=n_new, eos_id=eos_id)
            fscores, ffin, parents, toks = self._dev_fns[key](
                self.decode.params, cache, {},
                jnp.asarray(top.reshape(B * K).astype(np.int32)),
                jnp.asarray(scores.astype(np.float32)),
                jnp.asarray(finished),
                jnp.asarray(np.full((B * K,), P, np.int32)))
            seq = _beam_backtrack(top, np.asarray(parents),
                                  np.asarray(toks))
            return _beam_finalize(seq, np.asarray(fscores), n_new=n_new,
                                  eos_id=eos_id,
                                  length_penalty=length_penalty)

        staged: Dict[str, jax.Array] = {}

        def step_logp(last, t):
            feed = {"input_ids": last[:, None].astype(np.int64),
                    "pos": np.full((B * K,), P + t - 1, np.int64)}
            feed.update(cache)
            staged.update(self.decode(feed))
            return np.asarray(
                jax.nn.log_softmax(staged["logits"][:, -1, :]))

        def reorder(rows):
            rows_d = jnp.asarray(rows)
            for name in self._past_names:
                present = staged[name.replace("past_", "present_", 1)]
                cache[name] = jnp.take(present, rows_d, axis=0)

        return _beam_loop(step_logp, reorder, tokens, scores, finished,
                          B=B, K=K, V=V, n_new=n_new, eos_id=eos_id,
                          length_penalty=length_penalty)


class Seq2SeqBeamGenerator:
    """Beam search for the encoder-decoder families (seq2seq_family:
    "t5" tokens->tokens, "asr" waveform->tokens) — the standard
    translation/transcription decoding mode.

    Encode once at batch B; the decode graph runs at batch B*K with the
    per-request cross-attention K/V tiled K x along the batch (static
    after encoding, so tiling happens once). Step 0 feeds start_token on
    every row (all beams identical — the presents need no tiling); the
    shared `_beam_loop` then expands/reorders exactly like the decoder-
    only BeamGenerator. fp32 KV (the int8 shadow-calibration path stays
    a greedy/sampling feature)."""

    def __init__(self, cfg, *, batch: int = 1, beam: int = 4,
                 src_len: int = 16, max_len: int = 32, seed: int = 0,
                 family: str = "t5", device_loop: bool = False):
        from .models import seq2seq_family

        assert beam >= 1
        self.device_loop = bool(device_loop)
        self._dev_fns: Dict[tuple, object] = {}
        self.fam = seq2seq_family(family)
        self.cfg, self.B, self.K = cfg, batch, beam
        self.src_len = src_len
        self.enc_len = self.fam.enc_len(cfg, src_len)
        self.max_len = max_len
        self.encoder = Engine(import_model(self.fam.build_encoder(
            cfg, batch=batch, src_len=src_len, seed=seed)))
        dg = import_model(self.fam.build_decode(
            cfg, batch=batch * beam, max_len=max_len, src_len=self.enc_len,
            seed=seed))
        self.decode = Engine(dg)
        self._past_names = [s.name for s in dg.inputs
                            if s.name.startswith("past_")]

    def generate(self, src_ids: np.ndarray, n_new: int,
                 start_token: int = 0,
                 eos_id: Optional[int] = None,
                 length_penalty: float = 0.0,
                 src_lengths: Optional[np.ndarray] = None,
                 ) -> Tuple[np.ndarray, np.ndarray]:
        """-> (tokens [B, n_new], scores [B]) of each row's best beam."""
        B, K = self.B, self.K
        assert src_ids.shape == (B, self.src_len)
        assert n_new <= self.max_len
        V = self.cfg.vocab_size
        L = self.fam.n_layers(self.cfg)
        H, hd = self.cfg.n_head, self.cfg.head_dim

        if src_lengths is None:
            src_lengths = np.full((B,), self.src_len, np.int64)
        enc_feed = {self.fam.enc_input:
                    src_ids.astype(self.fam.prompt_dtype)}
        mask_feed = {}
        if self.fam.src_mask:
            enc_feed["src_len"] = src_lengths.astype(np.int64)
            from .ops.registry import index_dtype

            mask_feed["src_len"] = jnp.repeat(
                jnp.asarray(src_lengths, index_dtype()), K, axis=0)
        enc = self.encoder(enc_feed)
        cross = {k: jnp.repeat(v, K, axis=0)
                 for k, v in enc.items() if k.startswith("cross_")}
        cross.update(mask_feed)

        cache: Dict[str, jax.Array] = {
            f"past_{kind}_{i}": jnp.zeros((B * K, H, self.max_len, hd),
                                          jnp.float32)
            for i in range(L) for kind in ("key", "value")}
        staged: Dict[str, jax.Array] = {}

        def run(last, t):
            feed = {"input_ids": last[:, None].astype(np.int64),
                    "pos": np.full((B * K,), t, np.int64)}
            feed.update(cross)
            feed.update(cache)
            staged.update(self.decode(feed))
            return np.asarray(
                jax.nn.log_softmax(staged["logits"][:, -1, :]))

        # step 0: every beam row feeds start_token — rows are identical,
        # so the presents commit as-is (no tiling needed)
        lp0 = run(np.full((B * K,), start_token, np.int64), 0)
        for name in self._past_names:
            cache[name] = staged[name.replace("past_", "present_", 1)]
        lp0 = lp0.reshape(B, K, V)[:, 0]                # [B, V]
        top = np.argsort(lp0, axis=-1)[:, ::-1][:, :K]  # [B, K]
        scores = np.take_along_axis(lp0, top, axis=-1)
        tokens = top[:, :, None]
        finished = np.zeros((B, K), bool)
        if eos_id is not None:
            finished |= top == eos_id

        if self.device_loop:
            # presents from step 0 are the live cache for the scan
            dev_cache = {name: staged[name.replace("past_", "present_", 1)]
                         for name in self._past_names}
            key = (n_new, eos_id)
            if key not in self._dev_fns:
                self._dev_fns[key] = _build_device_beam_fn(
                    self.decode.jitted, self._past_names,
                    B=B, K=K, V=V, n_new=n_new, eos_id=eos_id)
            fscores, ffin, parents, toks = self._dev_fns[key](
                self.decode.params, dev_cache, cross,
                jnp.asarray(top.reshape(B * K).astype(np.int32)),
                jnp.asarray(scores.astype(np.float32)),
                jnp.asarray(finished),
                jnp.asarray(np.full((B * K,), 1, np.int32)))
            seq = _beam_backtrack(top, np.asarray(parents),
                                  np.asarray(toks))
            return _beam_finalize(seq, np.asarray(fscores), n_new=n_new,
                                  eos_id=eos_id,
                                  length_penalty=length_penalty)

        def reorder(rows):
            rows_d = jnp.asarray(rows)
            for name in self._past_names:
                present = staged[name.replace("past_", "present_", 1)]
                cache[name] = jnp.take(present, rows_d, axis=0)

        return _beam_loop(run, reorder, tokens, scores, finished,
                          B=B, K=K, V=V, n_new=n_new, eos_id=eos_id,
                          length_penalty=length_penalty)
