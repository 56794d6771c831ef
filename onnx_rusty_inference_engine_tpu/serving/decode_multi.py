"""Device-resident K-step dispatch bodies for DecodeServer
(multi_step: plain decode and chunked mixed prefill/decode) — a mixin so
decode.py stays navigable."""

from __future__ import annotations


import numpy as np

import jax
import jax.numpy as jnp


from .request import _bias_penalize, _device_select, _fetch, _hits_stop

class _MultiStepMixin:
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

