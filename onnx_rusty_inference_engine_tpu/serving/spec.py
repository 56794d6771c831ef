"""SpeculativeServer: lossless speculative decoding as a serving mode
(draft-model and prompt-lookup/ngram proposals)."""

from __future__ import annotations

from concurrent.futures import Future
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..engine import Engine
from ..graph import import_model
from ..models.gpt2 import GPT2Config

from .base import _ServerBase
from .request import _Request, _fetch, _hits_stop, _select_token

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
    exists to rejection-sample against).

    multi_step=R folds R whole speculation rounds into ONE dispatch
    (lax.scan) — for BOTH proposal kinds: ngram rounds search the
    per-slot context buffer on device; draft-model rounds run the k-1
    draft steps + target verify + acceptance (greedy token-match or
    device rejection sampling) with both engines' params feeding the one
    jitted function. A host round-trip then costs R rounds, not one."""

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
        from ..models import decoder_family

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
        # multi_step=R: R whole speculation rounds inside ONE lax.scan
        # dispatch. ngram mode: device-computed prompt-lookup proposal,
        # chunk verify, greedy acceptance, context append (per-slot
        # contexts live in a device buffer for the lookup). Draft-model
        # mode: the k-1 draft steps, final draft KV write, target chunk
        # verify and acceptance (greedy or device rejection sampling)
        # all ride the same scan — both engines' params feed one jitted
        # function, so a round costs ZERO host round-trips (round-4
        # verdict item 2: the ngram path proved the pattern; this
        # removes its draft-model exclusion).
        self.multi_step = int(multi_step)
        self._ctx: Optional[jax.Array] = None
        if self.multi_step and self.ngram:
            self._ctx = jnp.zeros((slots, max_len), jnp.int32)
        self._ctx_len = np.zeros((slots,), np.int64)
        self._ngram_multi_fn = None
        self._draft_multi_fn = None
        # per-slot sampling state for the device rejection sampler
        # (neutral temp 0 = greedy lane)
        self._mtemp = np.zeros((slots,), np.float32)
        self._mkeys = np.zeros((slots, 2), np.uint32)
        self._start_dispatch(slots, autostart)

    def stats(self) -> Dict[str, float]:
        s = super().stats()
        s["acceptance_rate"] = (self.accepted_total / self.proposed_total
                                if self.proposed_total else 0.0)
        return s

    def _clear_slot(self, slot: int) -> None:
        self._req[slot] = None
        self._pos[slot] = self.max_len - self.k    # park (see docstring)
        self._mtemp[slot] = 0.0                    # parked lanes run greedy

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
        if self.multi_step and not self.ngram:
            self._mtemp[slot] = r.temperature
            self._mkeys[slot] = (np.uint32(r.seed >> 32),
                                 np.uint32(r.seed & 0xFFFFFFFF))

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

    def _get_draft_multi_fn(self):
        """R whole DRAFT-MODEL speculation rounds in ONE dispatch: the
        k-1 draft decode steps, the final draft KV write, the target
        chunk verify, and per-slot acceptance — greedy token-match or
        device rejection sampling (Leviathan) — inside a lax.scan over
        rounds. Both engines' params are arguments of the one jitted
        function, so a round costs zero host round-trips (the host-loop
        path pays k dispatches per round; PERF.md 'Speculative serving').

        Device rejection sampling: draft tokens x_j ~ q_j at the slot's
        temperature, accepted with prob min(1, p_j(x)/q_j(x)); first
        rejection emits a draw from normalize(max(p-q, 0)); full
        acceptance emits a bonus draw from p_{k-1}. Randomness is keyed
        on (per-slot seed key, cache position, draw index): deterministic
        per request, independent of co-resident traffic (the same
        contract as _device_select). Greedy lanes (temp 0) reduce to the
        exact token-match rule, so mixed traffic rides one program."""
        if self._draft_multi_fn is not None:
            return self._draft_multi_fn
        verify_fn = self.t_verify.jitted
        draft_fn = self.d_decode.jitted
        t_present = {n: n.replace("past_", "present_", 1)
                     for n in self._t_cache}
        d_present = {n: n.replace("past_", "present_", 1)
                     for n in self._d_cache}
        k, L, B, R = self.k, self.max_len, self.B, self.multi_step

        def cat(keys, pos, draw_idx, logits):
            """Per-slot categorical draw keyed (slot key, pos, draw)."""
            def one(kd, p, row):
                return jax.random.categorical(
                    jax.random.fold_in(jax.random.fold_in(kd, p),
                                       draw_idx), row)
            return jax.vmap(one)(keys, pos, logits)

        def multi(t_params, d_params, last, pos, t_cache, d_cache,
                  temp, keys):
            tcol = temp[:, None]
            safe_t = jnp.where(temp > 0, temp, 1.0)[:, None]

            def body(carry, _):
                last, pos, t_cache, d_cache = carry
                # -- draft k-1 steps (sampled lanes draw from q) --------
                d_tok = last
                chunk_cols, qs = [last], []
                for j in range(k - 1):
                    out = draft_fn(d_params,
                                   {"input_ids": d_tok[:, None],
                                    "pos": pos + j, **d_cache})
                    d_cache = {n: out[p] for n, p in d_present.items()}
                    dl = out["logits"][:, -1, :]            # [B, V]
                    ql = jax.nn.log_softmax(dl / safe_t, axis=-1)
                    qs.append(ql)
                    samp = cat(keys, pos, j, ql)
                    d_tok = jnp.where(temp > 0, samp,
                                      jnp.argmax(dl, axis=-1)
                                      ).astype(last.dtype)
                    chunk_cols.append(d_tok)
                # last draft token's KV row: a full-acceptance round
                # jumps pos past it and later steps would attend an
                # unwritten row (same fix as the host path)
                out = draft_fn(d_params, {"input_ids": d_tok[:, None],
                                          "pos": pos + k - 1, **d_cache})
                d_cache = {n: out[p] for n, p in d_present.items()}
                chunk = jnp.stack(chunk_cols, axis=1)       # [B, k]
                qlog = jnp.stack(qs, axis=1)                # [B, k-1, V]

                # -- target verify (one chunk call) ---------------------
                vout = verify_fn(t_params, {"input_ids": chunk,
                                            "pos": pos, **t_cache})
                t_cache = {n: vout[p] for n, p in t_present.items()}
                tl = vout["logits"]                         # [B, k, V]
                tpred = jnp.argmax(tl, axis=-1).astype(last.dtype)
                plog = jax.nn.log_softmax(tl / safe_t[..., None], axis=-1)

                # -- acceptance ----------------------------------------
                x = chunk[:, 1:]                            # [B, k-1]
                px = jnp.take_along_axis(
                    plog[:, : k - 1], x[..., None], axis=-1)[..., 0]
                qx = jnp.take_along_axis(qlog, x[..., None],
                                         axis=-1)[..., 0]
                # draw-index map (all disjoint for k >= 2): draft draws
                # 0..k-2, residuals 2k..3k-2, bonus 3k, uniforms 4k+1
                u = jax.vmap(lambda kd, p: jax.random.uniform(
                    jax.random.fold_in(jax.random.fold_in(kd, p),
                                       4 * k + 1),
                    (k - 1,)))(keys, pos)                   # [B, k-1]
                acc_s = jnp.log(u) < (px - qx)   # min(1, p/q) via logs
                acc_g = x == tpred[:, : k - 1]
                acc = jnp.where(tcol > 0, acc_s, acc_g)
                m = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1),
                            axis=1)                         # [B]
                # corrections: per-j residual draw max(p-q, 0) (falls
                # back to p when q covers p exactly), bonus draw from
                # p_{k-1} for full acceptance — greedy lanes use tpred
                res = jnp.maximum(jnp.exp(plog[:, : k - 1])
                                  - jnp.exp(qlog), 0.0)
                res_ok = jnp.sum(res, axis=-1, keepdims=True) > 1e-9
                rl = jnp.where(res_ok, jnp.log(jnp.maximum(res, 1e-30)),
                               plog[:, : k - 1])
                corr_cols = [cat(keys, pos, 2 * k + j, rl[:, j])
                             for j in range(k - 1)]
                corr_cols.append(cat(keys, pos, 3 * k, plog[:, k - 1]))
                corr_s = jnp.stack(corr_cols, 1).astype(last.dtype)
                corr = jnp.where(tcol > 0, corr_s, tpred)
                emit = jnp.where(jnp.arange(k)[None, :] < m[:, None],
                                 chunk[:, list(range(1, k)) + [0]], corr)
                last = jnp.take_along_axis(emit, m[:, None],
                                           axis=1)[:, 0]
                # parking clamp: see _get_ngram_multi_fn (active lanes
                # can never exceed L-k by the submit invariant)
                pos = jnp.minimum(pos + m + 1, L - k)
                return (last, pos, t_cache, d_cache), (emit, m)

            carry, (emits, ms) = jax.lax.scan(
                body, (last, pos, t_cache, d_cache), None, length=R)
            _, _, t_cache, d_cache = carry
            return t_cache, d_cache, jnp.moveaxis(emits, 0, 1), ms.T

        self._draft_multi_fn = jax.jit(multi)
        return self._draft_multi_fn

    def _step_draft_multi(self) -> None:
        R, k = self.multi_step, self.k
        multi = self._get_draft_multi_fn()
        self._t_cache, self._d_cache, emits, ms = multi(
            self.t_verify.params, self.d_decode.params,
            jnp.asarray(self._last_tok.astype(np.int32)),
            jnp.asarray(self._pos.astype(np.int32)),
            self._t_cache, self._d_cache,
            jnp.asarray(self._mtemp), jnp.asarray(self._mkeys))
        emits = _fetch(emits)                      # [B, R, k]
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
                self._last_tok[s] = int(emits[s, rd, m])
                for t in emits[s, rd, : m + 1]:
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
        if self.multi_step:
            return self._step_draft_multi()
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
