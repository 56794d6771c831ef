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
    ):
        assert max_len >= prompt_len
        self.cfg = cfg
        self.batch = batch
        self.prompt_len = prompt_len
        self.max_len = max_len
        self.kv_dtype = np.dtype(kv_dtype)

        from .models import decoder_family

        build_prefill, build_decode, int8_kv_ok = decoder_family(family)
        if self.kv_dtype == np.int8 and not int8_kv_ok:
            raise NotImplementedError(
                f"{family}: in-graph INT8 KV cache not implemented")
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
        if int4_weights:
            from .quant import quantize_weights_int4

            prefill_graph = quantize_weights_int4(prefill_graph)
            decode_graph = quantize_weights_int4(decode_graph)
        ekw = dict(mesh=mesh, param_sharding_fn=param_sharding_fn)
        self.prefill = Engine(prefill_graph, **ekw)
        self.decode = Engine(decode_graph, **ekw)
        # per-(layer, kind, head) scales, calibrated from the prefill
        self._kv_scales: Optional[Dict[str, np.ndarray]] = None

    # -- cache quantization (INT8 KV; the decode GRAPH carries the QDQ,
    # so the cache never round-trips HBM in fp32) -----------------------
    def _store(self, kv: jax.Array, scale_name: str) -> jax.Array:
        if self.kv_dtype == np.int8:
            s = self._kv_scales[scale_name].reshape(1, -1, 1, 1)
            return jnp.clip(jnp.round(kv / s), -127, 127).astype(jnp.int8)
        return kv.astype(self.kv_dtype)

    # -- token selection ---------------------------------------------------
    @staticmethod
    def _select(logits: jax.Array, key, temperature: float,
                top_k: Optional[int], top_p: Optional[float]) -> jax.Array:
        """logits [B, V] -> token ids [B]. temperature == 0 is greedy;
        otherwise categorical sampling with optional top-k / nucleus
        filtering — all on device (sort/cumsum/where, no host sync)."""
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
        return jax.random.categorical(key, l, axis=-1)

    # -- generation ------------------------------------------------------
    def generate(self, input_ids: np.ndarray, n_new: int,
                 return_logits: bool = False,
                 temperature: float = 0.0,
                 top_k: Optional[int] = None,
                 top_p: Optional[float] = None,
                 sample_seed: int = 0,
                 ) -> Tuple[np.ndarray, Optional[list]]:
        """Decode n_new tokens. Greedy by default; temperature > 0 samples
        (optionally top-k / top-p filtered). input_ids: [B, prompt_len]."""
        B, P = input_ids.shape
        assert (B, P) == (self.batch, self.prompt_len)
        assert P + n_new <= self.max_len

        key = jax.random.PRNGKey(sample_seed)
        out = self.prefill({"input_ids": input_ids.astype(np.int64)})
        logits = out["logits"]
        key, sub = jax.random.split(key)
        next_tok = self._select(logits[:, -1, :], sub, temperature,
                                top_k, top_p)

        # calibrate per-(layer, kind, head) scales from the prefill presents
        L = self.cfg.n_layer
        if self.kv_dtype == np.int8 and self._kv_scales is None:
            self._kv_scales = {}
            for i in range(L):
                for kind in ("key", "value"):
                    kv = np.asarray(out[f"present_{kind}_{i}"])
                    amax = np.maximum(np.abs(kv).max(axis=(0, 2, 3)), 1e-6)
                    self._kv_scales[f"kv_scale_{kind}_{i}"] = (
                        amax / 127.0).astype(np.float32)
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

        tokens = [np.asarray(next_tok)]
        all_logits = [np.asarray(logits)] if return_logits else None
        for t in range(n_new - 1):
            pos = np.full((B,), P + t, dtype=np.int64)
            feed = {"input_ids": np.asarray(next_tok)[:, None].astype(np.int64),
                    "pos": pos}
            feed.update(cache)  # int8 pasts flow straight back in
            if self.kv_dtype == np.int8:
                feed.update(self._kv_scales)
            step = self.decode(feed)
            step_logits = step["logits"]
            key, sub = jax.random.split(key)
            next_tok = self._select(step_logits[:, -1, :], sub, temperature,
                                    top_k, top_p)
            if self._stacked:
                cache["past_key"] = step["present_key"]
                cache["past_value"] = step["present_value"]
            else:
                for i in range(L):
                    for kind in ("key", "value"):
                        cache[f"past_{kind}_{i}"] = step[f"present_{kind}_{i}"]
            tokens.append(np.asarray(next_tok))
            if return_logits:
                all_logits.append(np.asarray(step_logits))

        return np.stack(tokens, axis=1), all_logits


class Seq2SeqGenerator:
    """Encoder-decoder generation (T5 family): encode once, then greedy /
    sampled decode over a fixed self-attn KV cache + static cross K/V.

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
    ):
        from .models.t5 import build_t5_decode, build_t5_encoder

        self.cfg = cfg
        self.batch = batch
        self.src_len = src_len
        self.max_len = max_len
        self.kv_dtype = np.dtype(kv_dtype)
        self.calib_steps = calib_steps

        enc_graph = import_model(build_t5_encoder(
            cfg, batch=batch, src_len=src_len, seed=seed))
        dec_graph = import_model(build_t5_decode(
            cfg, batch=batch, max_len=max_len, src_len=src_len, seed=seed,
            kv_dtype=kv_dtype))
        self._dec_fp32_graph = None
        if self.kv_dtype == np.int8:
            self._dec_fp32_graph = import_model(build_t5_decode(
                cfg, batch=batch, max_len=max_len, src_len=src_len,
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
                 sample_seed: int = 0):
        """Encode src_ids [B, src_len]; decode n_new tokens."""
        B, S = src_ids.shape
        assert (B, S) == (self.batch, self.src_len)
        assert n_new <= self.max_len
        L = self.cfg.n_layer
        H, hd = self.cfg.n_head, self.cfg.head_dim
        ML = self.max_len
        int8 = self.kv_dtype == np.int8

        enc = self.encoder({"src_ids": src_ids.astype(np.int64)})
        cross = {k: v for k, v in enc.items() if k.startswith("cross_")}

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
