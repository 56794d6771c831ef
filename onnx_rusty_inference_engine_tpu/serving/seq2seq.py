"""Seq2SeqServer: continuous batching for encoder-decoder families
(t5/asr): per-slot encoder state + decoder slot pool."""

from __future__ import annotations

from collections import OrderedDict
from concurrent.futures import Future
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..engine import Engine
from ..graph import import_model

from .base import _ServerBase
from .request import (
    _Request,
    _bias_penalize,
    _device_select,
    _fetch,
    _hits_stop,
    _select_token,
)

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
        from ..models import seq2seq_family

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

