"""Continuous batching: vLLM-style slot scheduler over the jitted decoder.

The reference planned vLLM for serving/rollout (grpo_config.py:230-281,
demo_grpo.py:366-425: dedicated engine, paged KV, continuous admission,
prefix caching, recompute preemption). The TPU equivalent here keeps XLA
happy with STATIC shapes:

  * a fixed pool of C slots; new requests join at token boundaries without
    recompiling (capacity and cache lengths are static; activity is data,
    carried in masks);
  * the KV state is SPLIT into three tiers by write frequency — the design
    that keeps every hot buffer out of the decode scan's carry:
      - PROMPT pool [C, P_max]: written once at admission, READ-ONLY during
        decode windows (a plain closed-over input — XLA never copies it);
      - DECODE pool [C, N_max]: tokens from PREVIOUS windows; read-only
        in-scan, written by ONE batched per-row scatter per window;
      - WINDOW buffer [C, k]: this window's tokens — the only KV carried
        through the scan, ~1% the pool size (a [C,S] monolithic pool carried
        through lax.scan double-buffers multi-GB per step; this was the
        measured 5x gap between the slot scheduler and the static engine);
  * decode attention is one merged softmax over the three tiers (grouped
    GQA einsums, no materialized K/V repeat), per-row depth differences are
    masks, not copies — the fixed-width stand-in for paged attention;
  * admission prefills shape-bucketed request groups as ONE jitted call;
    identical prompts inside a group prefill ONCE and fan out by row-scatter
    (the same-step analogue of prefix caching);
  * cross-request prefix caching (vllm_enable_prefix_caching,
    grpo_config.py:252-258): finished slots RETAIN their prompt KV keyed by
    prompt content; an exact-match admission skips prefill entirely and
    resamples its first token from the stored last hidden state;
  * recompute preemption (the vLLM eviction story): `preempt(slot)` returns
    a continuation request whose prompt is original-prompt + generated
    tokens — re-admission re-prefills and continues the same trajectory.
"""

from __future__ import annotations

import time
from collections import OrderedDict
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bioreason_tpu.config import FusionConfig, SamplingConfig
from bioreason_tpu.models.fusion import fused_input_embeddings
from bioreason_tpu.models.qwen3 import decoder_forward, init_cache, _kv_quantize, _mlp
from bioreason_tpu.models import layers as L
from bioreason_tpu.ops.sampling import sample_logits


class Request:
    __slots__ = ("rid", "input_ids", "attention_mask", "dna_input_ids",
                 "dna_attention_mask", "max_new_tokens", "greedy", "tokens",
                 "done", "slot", "prompt_len")

    def __init__(self, rid, input_ids, attention_mask, dna_input_ids=None,
                 dna_attention_mask=None, max_new_tokens=256, greedy=False):
        self.rid = rid
        self.input_ids = np.asarray(input_ids)
        self.attention_mask = np.asarray(attention_mask)
        self.dna_input_ids = dna_input_ids
        self.dna_attention_mask = dna_attention_mask
        self.max_new_tokens = max_new_tokens
        self.greedy = greedy
        self.tokens: List[int] = []
        self.done = False
        self.slot = -1
        self.prompt_len = int(self.attention_mask.sum())

    def cache_key(self) -> bytes:
        """Prompt-content key for prefix caching (ids + mask + DNA)."""
        parts = [self.input_ids.tobytes(), self.attention_mask.tobytes()]
        if self.dna_input_ids is not None:
            parts.append(np.asarray(self.dna_input_ids).tobytes())
            parts.append(np.asarray(self.dna_attention_mask).tobytes())
        return b"|".join(parts)


class ContinuousBatcher:
    """Slot-scheduled generation over split static KV pools."""

    def __init__(self, params, fusion_cfg: FusionConfig, eos_token_id: int,
                 capacity: int = 8, max_len: int = 2048,
                 sampling: SamplingConfig = SamplingConfig(),
                 prompt_bucket: int = 128, guided=None, kv_int8: bool = False,
                 max_new: int = 256, prefix_cache: bool = False):
        """`max_len`: prompt-pool width P_max (longest admissible prompt).
        `max_new`: decode-pool depth N_max (longest admissible completion).
        `guided`: optional guided.GuidedSpec applied to EVERY request
        (batcher-level, like vLLM's engine-level guided decoding params);
        each slot tracks its own DFA state, reset on admission.
        `kv_int8`: int8 prompt/decode pools with per-(token,head) scales —
        halves pool HBM (2x the slots at fixed memory) and cache bandwidth.
        `prefix_cache`: retain finished slots' prompt KV keyed by prompt
        content; identical re-admissions skip prefill."""
        self.params = params
        self.cfg = fusion_cfg
        self.eos = eos_token_id
        self.capacity = capacity
        self.max_len = max_len
        self.max_new = max_new
        self.sampling = sampling
        self.prompt_bucket = prompt_bucket
        self.guided = guided
        self.gstate = np.zeros((capacity,), np.int32)      # per-slot DFA state
        if guided is not None:
            self._g_next_np = np.asarray(guided.next_state)
            self._g_acc_np = np.asarray(guided.accepting)
        dec = fusion_cfg.decoder
        dtype = jnp.dtype(dec.dtype)
        self.kv_int8 = kv_int8
        self.prompt_pool = init_cache(dec, capacity, max_len, dtype,
                                      quantize=kv_int8)
        self.dec_pool = init_cache(dec, capacity, max_new, dtype,
                                   quantize=kv_int8)
        # host-visible slot state (device copies are authoritative between
        # windows; mirrors advance by deterministic replay)
        self.prompt_mask = np.zeros((capacity, max_len), np.int32)
        self.positions = np.zeros((capacity,), np.int32)   # next ROPE position
        self.dec_len = np.zeros((capacity,), np.int32)     # decode-pool depth
        self.last_token = np.zeros((capacity,), np.int32)
        self.active = np.zeros((capacity,), bool)
        self.greedy_row = np.zeros((capacity,), bool)
        self._by_slot: List[Optional[Request]] = [None] * capacity
        self._rng = jax.random.PRNGKey(0)

        self.prefix_cache = prefix_cache
        self._retained: "OrderedDict[bytes, tuple]" = OrderedDict()
        self._slot_key: List[Optional[bytes]] = [None] * capacity
        if prefix_cache:
            self._last_hidden = jnp.zeros(
                (capacity + 1, dec.hidden_size), dtype)
            self._jit_keep_hidden = jax.jit(
                lambda buf, h, slots: buf.at[slots].set(
                    h.astype(buf.dtype), mode="drop"),
                donate_argnums=(0,))
            self._jit_reuse_first = jax.jit(self._reuse_first)
        self.prefill_calls = 0                 # observability + cache tests

        self._jit_prefill = jax.jit(self._prefill)
        self._jit_write = jax.jit(self._write_slot, donate_argnums=(0,))
        self._jit_multi = {}          # (window, hist width) -> jitted steps
        self._jit_first = jax.jit(self._first_tokens)
        self._jit_fix_first = jax.jit(self._fix_first)
        # pipelined mode: installs/retires patch device rows in place of
        # full mirror uploads (run_pipelined)
        self.pipelined = False
        self._patch_slots: set = set()
        self._jit_patch = jax.jit(self._patch_rows,
                                  donate_argnums=(0, 1, 2, 3, 4, 5, 6))
        # row buckets (cb): decode windows read/compute only pool rows
        # [:cb] where cb covers the highest active slot — the step's cost
        # is dominated by per-row KV reads, so a half-occupied pool decodes
        # at ~half cost. Admission fills lowest-free-first and the drain
        # phase packs live rows to the front (_pack_front), stepping cb
        # down the ladder; pool SHAPES never change (no capacity-mutating
        # compaction/restore cycle).
        self.row_buckets = sorted({capacity, max(1, capacity // 2),
                                   max(1, capacity // 4)})
        self._jit_pack = {}
        self._pending_first: List[tuple] = []    # deferred install records
        self._finished_backlog: List[Request] = []
        # device-resident decode state (see _upload_state / step_window)
        self._dev_state = None
        self._dev_greedy = None
        self._dev_dirty = True
        # optional host-side phase timers (set to a dict to enable):
        # upload / fix_first / dispatch / toks_wait / replay seconds plus
        # window count — for locating scheduling overhead vs device compute
        self.timers = None

    # -- jitted pieces ---------------------------------------------------

    def _prefill(self, params, input_ids, attention_mask, dna_ids, dna_mask):
        """A batch of prompts -> (per-layer prompt KV [K,P,..], last logits
        [K,V], last hidden [K,H]). K>1 = grouped admission (admit_many)."""
        cfg = self.cfg.decoder
        embeds = fused_input_embeddings(params, self.cfg, input_ids,
                                        dna_ids, dna_mask)
        b, p = input_ids.shape
        cache = init_cache(cfg, b, p, jnp.dtype(cfg.dtype))
        # return_hidden: only the LAST position's logits are needed (prompts
        # are left-padded) — materializing [K, P, vocab] logits costs ~5 GB
        # at K=64 x P=256 x 152k vocab and OOMs large admission batches
        hidden, cache = decoder_forward(
            params["decoder"], cfg, inputs_embeds=embeds,
            attention_mask=attention_mask,
            positions=L.positions_from_mask(attention_mask),
            cache=cache, cache_index=0, cache_mask=attention_mask,
            return_hidden=True)
        last_h = hidden[:, -1, :]
        logits = L.lm_logits(params["decoder"], last_h[:, None, :])
        return cache, logits[:, 0, :], last_h

    def _first_tokens(self, rng, logits, allow=None, gather=None):
        """First token after prefill, per row: (greedy, sampled) — the host
        picks per request. One jitted call instead of eager op dispatch.
        `gather` maps fan-out rows to prefill rows (dedupe), in-jit."""
        if gather is not None:
            logits = logits[gather]
        if allow is not None:
            logits = jnp.where(allow, logits, jnp.asarray(-1e9, logits.dtype))
        s = self.sampling
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        sampled = sample_logits(rng, logits, temperature=s.temperature,
                                top_k=s.top_k, top_p=s.top_p, greedy=False)
        return greedy, sampled

    def _reuse_first(self, rng, params, hidden, allow=None):
        """Prefix-cache hit: recompute last-position logits from the stored
        hidden state ([1,H]) and sample the first token — no prefill."""
        logits = L.lm_logits(params["decoder"], hidden[:, None, :])[:, 0, :]
        return self._first_tokens(rng, logits, allow)

    def _write_slot(self, pool, slot_kv, slots: jnp.ndarray, gather=None):
        """Scatter a prefilled [K,P] KV batch into rows `slots` of the
        prompt pool at offset 0 (quantizing on the way in when the pool is
        int8). Out-of-range slots (admission batch padding) are dropped.
        `gather` (same-batch prompt dedupe) fans row gather[j] of the
        prefill out to slots[j] — INSIDE the jit, so the fan-out is part of
        this one device call instead of dozens of eager gather ops (each
        eager dispatch pays the remote-device round trip)."""
        slots = jnp.atleast_1d(slots)
        if gather is not None:
            slot_kv = jax.tree.map(lambda x: x[gather], slot_kv)
        out = []
        for dst, kv in zip(pool, slot_kv):
            p = kv["k"].shape[1]
            if self.kv_int8:
                qk, sk = _kv_quantize(kv["k"])
                qv, sv = _kv_quantize(kv["v"])
                out.append({
                    "k": dst["k"].at[slots, :p].set(qk, mode="drop"),
                    "v": dst["v"].at[slots, :p].set(qv, mode="drop"),
                    "k_scale": dst["k_scale"].at[slots, :p].set(
                        sk.astype(dst["k_scale"].dtype), mode="drop"),
                    "v_scale": dst["v_scale"].at[slots, :p].set(
                        sv.astype(dst["v_scale"].dtype), mode="drop"),
                })
            else:
                out.append({
                    "k": dst["k"].at[slots, :p].set(
                        kv["k"].astype(dst["k"].dtype), mode="drop"),
                    "v": dst["v"].at[slots, :p].set(
                        kv["v"].astype(dst["v"].dtype), mode="drop"),
                })
        return out

    # -- the decode window (the hot loop) ---------------------------------

    def _slot_attention(self, q, pe, pmask, de, dmask, wk, wv, wmask):
        """One decode step's attention for C rows at mixed depths: merged
        softmax over the three KV tiers (prompt pool / decode pool / window
        buffer). q [C,1,Hq,D]; masks [C,*]. Grouped GQA einsums — K/V are
        never expanded to Hq heads; int8 tiers apply their scales to the
        logits/probs (exact), never materializing a dequantized copy."""
        c, _, hq, d = q.shape
        hkv = pe["k"].shape[2]
        gr = hq // hkv
        scale = d ** -0.5
        neg = jnp.finfo(jnp.float32).min
        qg = q.reshape(c, hkv, gr, d)

        def logits_block(kb, ks, mb):
            l = jnp.einsum("bhrd,bnhd->bhrn", qg, kb.astype(q.dtype),
                           preferred_element_type=jnp.float32) * scale
            if ks is not None:
                l = l * jnp.transpose(ks[..., 0], (0, 2, 1))[:, :, None, :]
            return jnp.where(mb[:, None, None, :].astype(bool), l, neg)

        lp = logits_block(pe["k"], pe.get("k_scale"), pmask)
        ld = logits_block(de["k"], de.get("k_scale"), dmask)
        lw = logits_block(wk, None, wmask)
        p_len, n_len = lp.shape[-1], ld.shape[-1]
        probs = jax.nn.softmax(jnp.concatenate([lp, ld, lw], axis=-1), axis=-1)
        pp = probs[..., :p_len]
        pd = probs[..., p_len:p_len + n_len]
        pw = probs[..., p_len + n_len:]
        if "v_scale" in pe:
            pp = pp * jnp.transpose(pe["v_scale"][..., 0], (0, 2, 1))[:, :, None, :]
        if "v_scale" in de:
            pd = pd * jnp.transpose(de["v_scale"][..., 0], (0, 2, 1))[:, :, None, :]
        out = (jnp.einsum("bhrn,bnhd->bhrd", pp.astype(q.dtype),
                          pe["v"].astype(q.dtype))
               + jnp.einsum("bhrn,bnhd->bhrd", pd.astype(q.dtype),
                            de["v"].astype(q.dtype))
               + jnp.einsum("bhrn,bnhd->bhrd", pw.astype(q.dtype),
                            wv.astype(q.dtype)))
        return out.reshape(c, 1, hq, d)

    def _multi_step(self, params, prompt_pool, dec_pool, prompt_mask,
                    last_token, positions, dec_len, active, greedy_row, rng,
                    gstate, g_next=None, g_acc=None, *, k: int, w: int,
                    cb: Optional[int] = None):
        """`k` decode steps fully on device: host<->device sync drops from
        per-token to per-window. The scan carries ONLY this window's K/V
        ([C,k] per layer) plus scalar-per-row state; the prompt pool is a
        read-only input and the decode pool is written by one batched
        scatter AFTER the scan — no multi-GB buffer rides the scan carry.
        Rows that hit EOS mid-window go inactive ON DEVICE; rows that exceed
        their max_new_tokens keep decoding until the window ends and the
        host discards the overrun (bounded by k-1 tokens; overflow writes
        drop).

        `w` (static): decode-HISTORY read width. The host knows every
        row's dec_len between windows, so attention reads only the first
        `w >= max(dec_len[active])` decode-pool columns (an in-jit slice —
        XLA never touches the rest) instead of streaming all N_max columns
        of the [C, N_max] pool every step. Early in requests' lives this
        cuts the decode step's dominant HBM traffic; the window fold-in
        scatter still targets the full pool.

        `cb` (static): ROW bucket — the scheduler keeps active slots packed
        at the front (lowest-free-first admission + drain-phase
        `_pack_front`), so the window computes/reads only pool rows [:cb]
        where cb >= 1 + highest active slot. The step's dominant cost is
        per-row KV reads, so a half-occupied pool decodes at ~half cost.
        All state writes go back into the FULL donated buffers in place —
        pool shapes never change (unlike capacity-mutating compaction).
        Returned toks are [k, cb]."""
        import dataclasses as _dc
        # decode stays on the weight-only-int8 path even when cfg.act_int8
        # is set (see the dense calls below): neutralize the flag so _mlp's
        # swiglu doesn't quantize activations either.
        cfg = _dc.replace(self.cfg.decoder, act_int8=False)
        s = self.sampling
        dtype = jnp.dtype(cfg.dtype)
        guided = g_next is not None
        c_full = last_token.shape[0]
        cb = c_full if cb is None else min(cb, c_full)
        c = cb
        hkv, d = cfg.num_kv_heads, cfg.head_dim
        full_state = (last_token, positions, dec_len, active, gstate)
        if cb < c_full:
            row = lambda x: x[:cb]
            prompt_pool = [jax.tree.map(row, e) for e in prompt_pool]
            prompt_mask = prompt_mask[:cb]
            last_token, positions, dec_len, active, gstate = map(
                row, full_state)
            greedy_row = greedy_row[:cb]

        # decode-history validity is FIXED for the whole window: this
        # window's tokens live in the window buffer, not the decode pool
        dec_view = [jax.tree.map(lambda x: x[:cb, :w], e) for e in dec_pool]
        dec_hist_mask = (jnp.arange(w)[None, :]
                         < dec_len[:, None]).astype(jnp.int32)
        win_kv = [(jnp.zeros((c, k, hkv, d), dtype),
                   jnp.zeros((c, k, hkv, d), dtype))
                  for _ in range(cfg.num_layers)]
        win_mask = jnp.zeros((c, k), jnp.int32)

        def body(carry, step_idx):
            (win_kv, win_mask, last_token, positions, active, rng,
             gstate) = carry
            was_active = active
            win_mask = jax.lax.dynamic_update_slice(
                win_mask, was_active[:, None].astype(jnp.int32), (0, step_idx))

            h = L.embed(params["decoder"]["embed"], last_token[:, None], dtype)
            pos = positions[:, None]
            new_win = []
            for i in range(cfg.num_layers):
                lp = jax.tree.map(lambda x: x[i], params["decoder"]["layers"])
                # decode denses stay on the weight-only-int8 path even when
                # cfg.act_int8 is set: decode is weights-READ-bound (the int8
                # bytes already stream into the dot), and the per-token
                # quantize ops measured a net LOSS here (shared-mode bench
                # 10.7k -> 9.8k tok/s with act8 decode). act_int8 pays only
                # in prefill, where the dots are MXU-bound.
                x = L.rmsnorm(lp["ln1"], h, cfg.rms_norm_eps)
                q, kk, vv = L.qkv_proj(lp["attn"], x, dtype,
                                       cfg.num_heads * cfg.head_dim, hkv * d)
                q = q.reshape(c, 1, cfg.num_heads, cfg.head_dim)
                kk = kk.reshape(c, 1, hkv, d)
                vv = vv.reshape(c, 1, hkv, d)
                q = L.rmsnorm(lp["attn"]["q_norm"], q, cfg.rms_norm_eps)
                kk = L.rmsnorm(lp["attn"]["k_norm"], kk, cfg.rms_norm_eps)
                q = L.apply_rope(q, pos, cfg.rope_theta)
                kk = L.apply_rope(kk, pos, cfg.rope_theta)

                wk, wv = win_kv[i]
                wk = jax.lax.dynamic_update_slice(wk, kk, (0, step_idx, 0, 0))
                wv = jax.lax.dynamic_update_slice(wv, vv, (0, step_idx, 0, 0))
                new_win.append((wk, wv))

                a = self._slot_attention(q, prompt_pool[i], prompt_mask,
                                         dec_view[i], dec_hist_mask,
                                         wk, wv, win_mask)
                h = h + L.dense(lp["attn"]["o"], a.reshape(c, 1, -1), dtype)
                x = L.rmsnorm(lp["ln2"], h, cfg.rms_norm_eps)
                h = h + _mlp(lp, cfg, x, dtype)
            win_kv = new_win

            h = L.rmsnorm(params["decoder"]["final_norm"], h, cfg.rms_norm_eps)
            row_logits = L.lm_logits(params["decoder"], h)[:, 0, :]
            if guided:
                row = g_next[gstate]
                allow = row != self.guided.dead
                allow = allow.at[:, self.guided.eos_token_id].set(g_acc[gstate])
                row_logits = jnp.where(allow, row_logits,
                                       jnp.asarray(-1e9, row_logits.dtype))
            greedy_tok = jnp.argmax(row_logits, axis=-1).astype(jnp.int32)
            rng, kk2 = jax.random.split(rng)
            sampled = sample_logits(kk2, row_logits, temperature=s.temperature,
                                    top_k=s.top_k, top_p=s.top_p, greedy=False)
            tok = jnp.where(greedy_row, greedy_tok, sampled)
            tok = jnp.where(was_active, tok, 0)
            if guided:
                gstate = jnp.where(was_active, g_next[gstate, tok], gstate)
            positions = positions + was_active.astype(positions.dtype)
            last_token = jnp.where(was_active, tok, last_token)
            active = active & (tok != self.eos)
            return ((win_kv, win_mask, last_token, positions, active, rng,
                     gstate), (tok, was_active))

        init = (win_kv, win_mask, last_token, positions, active, rng,
                gstate if guided else jnp.zeros_like(last_token))
        carry, (toks, was_active) = jax.lax.scan(
            body, init, jnp.arange(k))
        win_kv, win_mask, last_token, positions, active, rng, gstate = carry

        # fold the window into the decode pool: one batched per-row scatter
        # per layer per WINDOW (donated pool -> in-place). Garbage columns
        # (post-EOS steps) land beyond each row's final dec_len and stay
        # masked; columns past N_max drop. Under row bucketing the scatter
        # touches only rows [:cb] of the full donated pool.
        rows = jnp.arange(c)[:, None]
        cols = dec_len[:, None] + jnp.arange(k)[None, :]
        cols = jnp.where(cols < self.max_new, cols, self.max_new)  # drop row
        new_pool = []
        for entry, (wk, wv) in zip(dec_pool, win_kv):
            if self.kv_int8:
                qk, sk = _kv_quantize(wk)
                qv, sv = _kv_quantize(wv)
                new_pool.append({
                    "k": entry["k"].at[rows, cols].set(qk, mode="drop"),
                    "v": entry["v"].at[rows, cols].set(qv, mode="drop"),
                    "k_scale": entry["k_scale"].at[rows, cols].set(
                        sk.astype(entry["k_scale"].dtype), mode="drop"),
                    "v_scale": entry["v_scale"].at[rows, cols].set(
                        sv.astype(entry["v_scale"].dtype), mode="drop"),
                })
            else:
                new_pool.append({
                    "k": entry["k"].at[rows, cols].set(
                        wk.astype(entry["k"].dtype), mode="drop"),
                    "v": entry["v"].at[rows, cols].set(
                        wv.astype(entry["v"].dtype), mode="drop"),
                })
        dec_len = dec_len + jnp.sum(was_active.astype(jnp.int32), axis=0)
        if cb < c_full:
            # write the bucketed state back into the full donated buffers
            f_last, f_pos, f_dlen, f_act, f_gst = full_state
            last_token = f_last.at[:cb].set(last_token)
            positions = f_pos.at[:cb].set(positions)
            dec_len = f_dlen.at[:cb].set(dec_len)
            active = f_act.at[:cb].set(active)
            gstate = f_gst.at[:cb].set(gstate)
        return (new_pool, last_token, positions, dec_len, active, rng,
                gstate), toks

    # -- host scheduling -------------------------------------------------

    def _bucketed(self, n: int) -> int:
        b = self.prompt_bucket
        return ((max(n, 1) + b - 1) // b) * b

    def admit(self, req: Request) -> bool:
        """Prefill `req` and install it in a free slot. False if full."""
        lst = [req]
        return bool(self.admit_many(lst))

    @staticmethod
    def _pow2_bucket(k: int) -> int:
        p = 1
        while p < k:
            p *= 2
        return p

    def _free_slots(self) -> List[int]:
        """Free slots ordered so prefix-cache retained rows are used LAST
        (and evicted LRU-first when they must be)."""
        free = [int(i) for i in np.nonzero(~self.active)[0]]
        if not self.prefix_cache:
            return free
        plain = [i for i in free if self._slot_key[i] is None]
        lru = [s for key, (s, _w) in self._retained.items() if s in free]
        return plain + lru

    def _evict_retained(self, slot: int):
        key = self._slot_key[slot]
        if key is not None:
            self._retained.pop(key, None)
            self._slot_key[slot] = None

    def _install(self, req: Request, slot: int, first_tok: int,
                 mask_row: np.ndarray, width: int, g_base: int = 0):
        """Common slot bookkeeping after the first token is chosen."""
        if self.guided is not None:
            self.gstate[slot] = self._g_next_np[g_base, first_tok]
        req.slot = slot
        req.tokens.append(first_tok)
        self._by_slot[slot] = req
        self.prompt_mask[slot] = 0
        self.prompt_mask[slot, :width] = mask_row
        self.positions[slot] = req.prompt_len      # next ROPE position
        self.dec_len[slot] = 0
        self.last_token[slot] = first_tok
        self.active[slot] = True
        self.greedy_row[slot] = req.greedy
        if self.prefix_cache:
            self._evict_retained(slot)
            self._slot_key[slot] = None
        if self.pipelined:
            self._patch_slots.add(int(slot))
        if first_tok == self.eos or len(req.tokens) >= req.max_new_tokens:
            self._finish(slot)

    def admit_many(self, pending: List[Request]) -> List[Request]:
        """Admit from the FRONT of `pending` (popping admitted requests)
        until capacity is full. Requests with the same (prompt bucket, DNA
        shape) prefill as ONE batched jitted call with one slot-pool scatter
        and one first-token sample; IDENTICAL prompts within a group prefill
        once and fan out by row-scatter. Group batch sizes pad to powers of
        two (bounded compile count); padded rows scatter to an out-of-range
        slot with mode='drop'. Prefix-cache hits skip prefill entirely."""
        if self._pending_first:
            # slot accounting below needs exact state (EOS first tokens
            # free slots); normally step_window already resolved these
            self._finished_backlog.extend(self._resolve_pending())
        free = self._free_slots()
        take = pending[:len(free)]
        if not take:
            return []
        del pending[:len(take)]

        to_prefill = []
        pending_installs = []
        for r in take:
            if r.max_new_tokens > self.max_new:
                raise ValueError(f"max_new_tokens {r.max_new_tokens} exceeds "
                                 f"decode-pool depth {self.max_new}")
            if self.prefix_cache and self._try_reuse(r, free):
                continue
            to_prefill.append(r)

        groups: dict = {}
        for r in to_prefill:
            width = self._bucketed(self.input_width(r))
            if width > self.max_len:
                raise ValueError(
                    f"prompt {width} exceeds prompt-pool width {self.max_len}")
            dshape = (None if r.dna_input_ids is None
                      else tuple(np.asarray(r.dna_input_ids).shape))
            groups.setdefault((width, dshape), []).append(r)

        for (width, dshape), reqs in groups.items():
            # same-batch prompt dedupe over the WHOLE group: identical
            # (ids, mask, dna) rows prefill once; src[j] maps request j ->
            # its unique prefill row
            uniq: "OrderedDict[bytes, int]" = OrderedDict()
            src = []
            for r in reqs:
                key = r.cache_key()
                if key not in uniq:
                    uniq[key] = len(uniq)
                src.append(uniq[key])
            uniq_reqs = [None] * len(uniq)
            for r, j in zip(reqs, src):
                if uniq_reqs[j] is None:
                    uniq_reqs[j] = r

            # chunk the UNIQUE prompts into decreasing exact power-of-two
            # prefill pieces (96 -> 64+32): zero pad-row waste (a 96-row
            # prefill padded to 128 wastes 25% of the prefill FLOPs — the
            # dominant serving cost at prompt-heavy ratios) while every
            # chunk shape is already warm from warmup()'s pow2 ladder
            start = 0
            while start < len(uniq_reqs):
                rem = len(uniq_reqs) - start
                kp = self._pow2_bucket(rem)
                if kp > rem:
                    kp //= 2
                chunk = uniq_reqs[start:start + kp]
                chunk_req = [j for j, s in enumerate(src)
                             if start <= s < start + kp]
                pending_installs.append(self._build_chunk(
                    chunk, [(reqs[j], src[j] - start) for j in chunk_req],
                    width, dshape, free))
                start += kp
        # ONE host->device transfer for EVERY chunk's inputs (each
        # device_put over a tunnelled device link pays a round trip), then
        # dispatch every chunk's prefill/write/sample asynchronously. The
        # first tokens are NOT resolved here: slots install with a
        # placeholder and the next decode window patches them in ON DEVICE
        # (_jit_fix_first), so the host wait for the first-token transfer
        # overlaps the window compute instead of blocking admission.
        # Guided decoding and <=1-token requests resolve eagerly (their
        # install bookkeeping depends on the token value).
        if pending_installs:
            flat = [a for rec in pending_installs for a in rec[0]]
            flat = list(jax.device_put(tuple(flat)))
            self._rng, *keys = jax.random.split(
                self._rng, len(pending_installs) + 1)
            for rec, rk in zip(pending_installs, keys):
                n = len(rec[0])
                done_rec = self._dispatch_chunk(flat[:n], rec, rk)
                del flat[:n]
                eager = (self.guided is not None
                         or any(r.max_new_tokens <= 1
                                for r, _ in done_rec[0]))
                if eager:
                    self._resolve_install(done_rec)
                else:
                    req_src, slots, _, mask, width, _, _ = done_rec
                    for i, (r, s) in enumerate(req_src):
                        self._install_deferred(r, int(slots[i]),
                                               mask[s, :width], width)
                    self._pending_first.append(done_rec)
        if not self.pipelined:
            self._dev_dirty = True
        return take

    def _build_chunk(self, uniq_reqs, req_src, width, dshape,
                     free: List[int]):
        """Assemble one admission chunk's host-side arrays (len(uniq_reqs)
        = exact pow2 of unique prompts; fan-out rows map to slots popped
        from `free`). No device work — admit_many uploads every chunk's
        arrays in ONE device_put and then dispatches them."""
        kp = len(uniq_reqs)
        ids = np.zeros((kp, width), np.int32)
        mask = np.zeros((kp, width), np.int32)
        for i, r in enumerate(uniq_reqs):
            n = r.input_ids.shape[-1]
            ids[i, width - n:] = r.input_ids.reshape(-1)     # left pad
            mask[i, width - n:] = r.attention_mask.reshape(-1)
        if dshape is None:
            dna = dmask = None
        else:
            rows, ldna = dshape
            dna = np.zeros((kp * rows, ldna), np.int32)
            dmask = np.zeros((kp * rows, ldna), np.int32)
            for i, r in enumerate(uniq_reqs):
                dna[i * rows:(i + 1) * rows] = np.asarray(r.dna_input_ids)
                dmask[i * rows:(i + 1) * rows] = np.asarray(
                    r.dna_attention_mask)
        n_req = len(req_src)
        np_ = self._pow2_bucket(n_req)
        gather = np.zeros((np_,), np.int32)
        gather[:n_req] = [s for _, s in req_src]
        slots = np.full((np_,), self.capacity, np.int32)      # pad rows: drop
        slots[:n_req] = free[:n_req]
        del free[:n_req]
        arrays = ((ids, mask, gather, slots) if dna is None
                  else (ids, mask, dna, dmask, gather, slots))
        return (arrays, req_src, slots, mask, width)

    def _dispatch_chunk(self, dev_arrays, rec, rk):
        """Dispatch one built chunk's prefill -> in-jit KV fan-out/scatter
        -> first-token sample, WITHOUT waiting on the device. Returns the
        pending-install record `_resolve_install` finishes host-side."""
        _, req_src, slots, mask, width = rec
        if len(dev_arrays) == 4:
            ids_d, mask_d, gather_d, slots_d = dev_arrays
            dna_d = dmask_d = None
        else:
            ids_d, mask_d, dna_d, dmask_d, gather_d, slots_d = dev_arrays
        kv, last_logits, last_h = self._jit_prefill(
            self.params, ids_d, mask_d, dna_d, dmask_d)
        self.prefill_calls += 1

        self.prompt_pool = self._jit_write(self.prompt_pool, kv, slots_d,
                                           gather_d)
        if self.prefix_cache:
            self._last_hidden = self._jit_keep_hidden(
                self._last_hidden, last_h[gather_d], slots_d)
        allow = None
        if self.guided is not None:
            allow_np = self._g_next_np[0] != self.guided.dead
            allow_np[self.guided.eos_token_id] = bool(self._g_acc_np[0])
            allow = jnp.asarray(allow_np)
        greedy_toks, sampled = self._jit_first(rk, last_logits, allow,
                                               gather_d)
        return (req_src, slots, slots_d, mask, width, greedy_toks, sampled)

    def _resolve_install(self, rec):
        req_src, slots, _, mask, width, greedy_toks, sampled = rec
        greedy_toks, sampled = np.asarray(greedy_toks), np.asarray(sampled)
        for i, (r, s) in enumerate(req_src):
            tok = int(greedy_toks[i] if r.greedy else sampled[i])
            self._install(r, int(slots[i]), tok, mask[s, :width], width)

    def _install_deferred(self, req: Request, slot: int,
                          mask_row: np.ndarray, width: int):
        """Token-independent half of _install: the slot goes live with a
        placeholder last_token; the device patches the real first token in
        at the next window (_jit_fix_first) and _resolve_pending patches
        the host mirrors while that window computes."""
        req.slot = slot
        self._by_slot[slot] = req
        self.prompt_mask[slot] = 0
        self.prompt_mask[slot, :width] = mask_row
        self.positions[slot] = req.prompt_len
        self.dec_len[slot] = 0
        self.last_token[slot] = 0                  # patched on device
        self.active[slot] = True
        self.greedy_row[slot] = req.greedy
        if self.prefix_cache:
            self._evict_retained(slot)
            self._slot_key[slot] = None
        if self.pipelined:
            self._patch_slots.add(int(slot))

    def _fix_first(self, last_token, active, slots, greedy_toks, sampled,
                   greedy_row):
        """Patch one pending chunk's first tokens into the device decode
        state (device->device, no host sync): choose greedy vs sampled per
        row, set last_token, deactivate first-token-EOS rows — the same
        advance _resolve_pending replays on the host mirrors."""
        idx = jnp.clip(slots, 0, self.capacity - 1)
        tok = jnp.where(greedy_row[idx], greedy_toks, sampled)
        last_token = last_token.at[slots].set(tok, mode="drop")
        active = active.at[slots].set(tok != self.eos, mode="drop")
        return last_token, active

    def _patch_rows(self, pmask, last, pos, dlen, act, gst, greedy,
                    slots, mask_rows, last_v, pos_v, dlen_v, act_v, gst_v,
                    greedy_v):
        """Scatter per-slot decode state onto the device copies — the
        pipelined-mode replacement for _upload_state's full mirror push.
        Rows = slots touched by installs/retires since the last window;
        padding rows carry slot index == capacity and drop."""
        return (pmask.at[slots].set(mask_rows, mode="drop"),
                last.at[slots].set(last_v, mode="drop"),
                pos.at[slots].set(pos_v, mode="drop"),
                dlen.at[slots].set(dlen_v, mode="drop"),
                act.at[slots].set(act_v, mode="drop"),
                gst.at[slots].set(gst_v, mode="drop"),
                greedy.at[slots].set(greedy_v, mode="drop"))

    def _resolve_pending(self) -> List[Request]:
        """Host-side completion of deferred installs: append first tokens,
        sync mirrors, finish EOS/quota rows. Called from step_window AFTER
        the window dispatch (the transfer wait overlaps window compute) or
        from admit_many/preempt when state must be exact NOW."""
        finished = []
        for rec in self._pending_first:
            req_src, slots, _, _, _, greedy_toks, sampled = rec
            greedy_toks = np.asarray(greedy_toks)
            sampled = np.asarray(sampled)
            for i, (r, _) in enumerate(req_src):
                slot = int(slots[i])
                tok = int(greedy_toks[i] if r.greedy else sampled[i])
                r.tokens.append(tok)
                self.last_token[slot] = tok
                if tok == self.eos or len(r.tokens) >= r.max_new_tokens:
                    self._finish(slot)
                    finished.append(r)
                    self._dev_dirty = True
        self._pending_first.clear()
        return finished

    def _try_reuse(self, req: Request, free: List[int]) -> bool:
        """Prefix-cache hit path: an exact-prompt match against a retained
        slot skips prefill — first token resamples from the stored last
        hidden state, all KV already in the prompt pool."""
        key = req.cache_key()
        hit = self._retained.get(key)
        if hit is None:
            return False
        slot, width = hit
        if slot not in free:                     # row was reused meanwhile
            return False
        free.remove(slot)
        self._retained.pop(key)
        self._slot_key[slot] = None
        allow = None
        if self.guided is not None:
            allow_np = self._g_next_np[0] != self.guided.dead
            allow_np[self.guided.eos_token_id] = bool(self._g_acc_np[0])
            allow = jnp.asarray(allow_np[None, :])
        self._rng, rk = jax.random.split(self._rng)
        g_tok, s_tok = self._jit_reuse_first(
            rk, self.params, self._last_hidden[slot][None, :], allow)
        tok = int(np.asarray(g_tok)[0] if req.greedy else np.asarray(s_tok)[0])
        n = req.input_ids.shape[-1]
        mask_row = np.zeros((width,), np.int32)
        mask_row[width - n:] = req.attention_mask.reshape(-1)
        self._install(req, slot, tok, mask_row, width)
        # the row STILL holds this prompt's KV and hidden: re-retain on finish
        return True

    @staticmethod
    def input_width(req: Request) -> int:
        return req.input_ids.shape[-1]

    def _finish(self, slot: int):
        req = self._by_slot[slot]
        req.done = True
        self.active[slot] = False
        self._by_slot[slot] = None
        if self.prefix_cache:
            key = req.cache_key()
            old = self._retained.pop(key, None)
            if old is not None:
                self._slot_key[old[0]] = None
            width = self._bucketed(self.input_width(req))
            self._retained[key] = (slot, width)
            self._slot_key[slot] = key

    def preempt(self, slot: int) -> Request:
        """Recompute preemption (vLLM's eviction story for full pools):
        evict the running request in `slot`, returning a CONTINUATION
        request whose prompt is the original prompt plus everything
        generated so far. Re-admitting it re-prefills that extended prompt
        and continues the same trajectory (exact for greedy rows). The slot
        frees immediately for a higher-priority admission."""
        if self.guided is not None:
            raise NotImplementedError(
                "preemption with guided decoding needs DFA-state replay")
        if self._pending_first:
            # the continuation prompt needs the slot's first token
            self._finished_backlog.extend(self._resolve_pending())
        req = self._by_slot[slot]
        if req is None:
            raise ValueError(f"slot {slot} is not active")
        ids = req.input_ids.reshape(-1)
        msk = req.attention_mask.reshape(-1)
        real = ids[msk.astype(bool)]
        ext = np.concatenate([real, np.asarray(req.tokens, np.int32)])
        cont = Request(req.rid, ext[None, :], np.ones((1, len(ext)), np.int32),
                       req.dna_input_ids, req.dna_attention_mask,
                       max_new_tokens=req.max_new_tokens, greedy=req.greedy)
        cont.tokens = req.tokens            # shared: totals keep accumulating
        self.active[slot] = False
        self._by_slot[slot] = None
        self._dev_dirty = True
        return cont

    def step(self) -> List[Request]:
        """Advance every active slot one token; returns requests finished
        this step. The newly decoded token is appended to each request."""
        return self.step_window(1)

    def _hist_bucket(self, n: int) -> int:
        """Decode-history width bucket: smallest multiple of 32 covering
        `n`, clamped to N_max. 0 when no row has history yet (fresh pool)."""
        return min(self.max_new, ((n + 31) // 32) * 32)

    def _row_bucket(self, n: int) -> int:
        """Smallest row bucket covering the first `n` slots."""
        for b in self.row_buckets:
            if b >= n:
                return b
        return self.capacity

    def _hwm(self) -> int:
        """1 + highest active slot per the host mirrors — a safe upper
        bound on device-active rows for the NEXT window (mirrors can lag
        active-high after device-side EOS, never active-low: quota retires
        and finishes patch/upload before the next dispatch)."""
        nz = np.nonzero(self.active)[0]
        return int(nz[-1]) + 1 if len(nz) else 0

    def _get_multi(self, k: int, w: int, cb: Optional[int] = None):
        cb = self.capacity if cb is None else cb
        if (k, w, cb) not in self._jit_multi:
            import functools
            # donate the decode pool and the per-row state (all returned);
            # prompt pool/mask and greedy_row are REUSED across calls and
            # must survive. gstate is positional so its donation applies.
            self._jit_multi[(k, w, cb)] = jax.jit(
                functools.partial(self._multi_step, k=k, w=w, cb=cb),
                donate_argnums=(2, 4, 5, 6, 7, 9, 10))
        return self._jit_multi[(k, w, cb)]

    def _window_shape(self, lag: int = 0):
        """(w, cb) for the next decode window. Row buckets below capacity
        pair with the FULL history width: the row count is already small
        there, and one variant per sub-capacity bucket bounds the compile
        count (capacity pairs with the w ladder as before)."""
        cb = self._row_bucket(max(1, self._hwm()))
        if cb < self.capacity:
            return self.max_new, cb
        bound = int(self.dec_len[self.active].max(initial=0)) + lag
        return self._hist_bucket(min(bound, self.max_new)), cb

    def _upload_state(self):
        """Push the host scheduling mirrors to device. Needed only when they
        diverged from the device copies: after admissions and finishes. In
        the steady state, decode windows chain device→device and the mirrors
        evolve by deterministic replay — zero uploads."""
        self._dev_state = jax.device_put(
            (jnp.asarray(self.prompt_mask), self.last_token, self.positions,
             self.dec_len, self.active, self.gstate))
        self._dev_greedy = jax.device_put(self.greedy_row)
        self._dev_dirty = False

    def step_window(self, k: int) -> List[Request]:
        """Advance every active slot up to `k` tokens with one device call,
        ONE device→host transfer (the [k, C] token matrix), and zero
        device→host state syncs: decode state lives on device between
        windows and the host mirrors advance by replaying the tokens
        (everything but the sampled token is deterministic).

        Deferred admissions resolve HERE: their first tokens are patched
        into the device state (_jit_fix_first, device->device) before the
        window dispatch, and the host-side resolve runs while the window
        computes — admission never blocks on a first-token transfer."""
        tm = self.timers
        t0 = time.perf_counter() if tm is not None else 0.0
        finished: List[Request] = list(self._finished_backlog)
        self._finished_backlog.clear()
        if not self.active.any():
            finished.extend(self._resolve_pending())
            return finished
        w, cb = self._window_shape()
        if self._dev_state is None or self._dev_dirty:
            self._upload_state()
        if tm is not None:
            t1 = time.perf_counter()
            tm["upload"] = tm.get("upload", 0.0) + (t1 - t0)
            t0 = t1
        pmask, last, pos, dlen, act, gst = self._dev_state
        for rec in self._pending_first:
            last, act = self._jit_fix_first(last, act, rec[2], rec[5],
                                            rec[6], self._dev_greedy)
        gkw = (dict(g_next=self.guided.next_state, g_acc=self.guided.accepting)
               if self.guided is not None else {})
        carry, toks = self._get_multi(k, w, cb)(
            self.params, self.prompt_pool, self.dec_pool, pmask, last, pos,
            dlen, act, self._dev_greedy, self._rng, gst, **gkw)
        (self.dec_pool, last, pos, dlen, act, self._rng, gst) = carry
        self._dev_state = (pmask, last, pos, dlen, act, gst)
        if tm is not None:
            t1 = time.perf_counter()
            tm["dispatch"] = tm.get("dispatch", 0.0) + (t1 - t0)
            tm["windows"] = tm.get("windows", 0) + 1
            tm["rows"] = tm.get("rows", 0) + int(self.active.sum())
            t0 = t1
        if self._pending_first:
            # host mirror patch-up overlaps the dispatched window compute
            finished.extend(self._resolve_pending())
        toks = np.asarray(toks)                 # the ONE transfer
        if tm is not None:
            t1 = time.perf_counter()
            tm["toks_wait"] = tm.get("toks_wait", 0.0) + (t1 - t0)
            t0 = t1
        for step in range(k):
            act_slots = np.nonzero(self.active)[0]
            if len(act_slots) == 0:
                break
            for slot in act_slots:
                req = self._by_slot[slot]
                t = int(toks[step, slot])
                # replay the device-side per-step advance on the mirrors
                self.dec_len[slot] += 1
                self.positions[slot] += 1
                self.last_token[slot] = t
                if self.guided is not None:
                    self.gstate[slot] = self._g_next_np[self.gstate[slot], t]
                req.tokens.append(t)
                if t == self.eos or len(req.tokens) >= req.max_new_tokens:
                    finished.append(req)
                    self._finish(slot)          # mirrors diverge from device
        if finished:
            self._dev_dirty = True
        if tm is not None:
            tm["replay"] = tm.get("replay", 0.0) + (time.perf_counter() - t0)
        return finished

    def warmup(self, prompt_widths, dna_shapes=(None,), windows=(1,)):
        """Precompile the serving paths: batched admission at every
        power-of-two batch bucket for each (prompt width, DNA shape), plus
        the decode step / decode windows. Serving engines pay this once at
        startup (vLLM does the same); without it a first-seen admission
        batch size compiles MID-TRAFFIC (~30 s per shape on a remote TPU).
        All calls are state-neutral: scatters go to the out-of-range drop
        slot and no request state is touched."""
        kps, k = [], 1
        top = self._pow2_bucket(self.capacity)
        while k <= top:
            kps.append(k)
            k *= 2
        drop = jnp.full((1,), self.capacity, jnp.int32)
        for width in prompt_widths:
            width = self._bucketed(width)
            for dshape in dna_shapes:
                for kp in kps:
                    ids = jnp.zeros((kp, width), jnp.int32)
                    mask = jnp.zeros((kp, width), jnp.int32)
                    if dshape is None:
                        dna = dmask = None
                    else:
                        rows, ldna = dshape
                        dna = jnp.zeros((kp * rows, ldna), jnp.int32)
                        dmask = jnp.zeros((kp * rows, ldna), jnp.int32)
                    kv, logits, last_h = self._jit_prefill(
                        self.params, ids, mask, dna, dmask)
                    gather = jnp.arange(kp, dtype=jnp.int32)
                    self.prompt_pool = self._jit_write(
                        self.prompt_pool, kv, jnp.broadcast_to(drop, (kp,)),
                        gather)
                    if self.prefix_cache:
                        self._last_hidden = self._jit_keep_hidden(
                            self._last_hidden, last_h,
                            jnp.broadcast_to(drop, (kp,)))
                    self._rng, rk = jax.random.split(self._rng)
                    self._jit_first(rk, logits, None, gather)
        gkw = (dict(g_next=self.guided.next_state, g_acc=self.guided.accepting)
               if self.guided is not None else {})
        for kp in kps:
            # the deferred-admission device patch, one variant per chunk size
            self._jit_fix_first(
                jnp.zeros((self.capacity,), jnp.int32),
                jnp.zeros((self.capacity,), bool),
                jnp.broadcast_to(drop, (kp,)),
                jnp.zeros((kp,), jnp.int32), jnp.zeros((kp,), jnp.int32),
                jnp.zeros((self.capacity,), bool))
        for kp in kps:
            # pipelined-mode row patches, one variant per patch batch size
            sl = jnp.full((kp,), self.capacity, jnp.int32)      # all drop
            self._jit_patch(
                jnp.zeros((self.capacity, self.max_len), jnp.int32),
                jnp.zeros((self.capacity,), jnp.int32),
                jnp.zeros((self.capacity,), jnp.int32),
                jnp.zeros((self.capacity,), jnp.int32),
                jnp.zeros((self.capacity,), bool),
                jnp.zeros((self.capacity,), jnp.int32),
                jnp.zeros((self.capacity,), bool),
                sl, jnp.zeros((kp, self.max_len), jnp.int32),
                jnp.zeros((kp,), jnp.int32), jnp.zeros((kp,), jnp.int32),
                jnp.zeros((kp,), jnp.int32), jnp.zeros((kp,), bool),
                jnp.zeros((kp,), jnp.int32), jnp.zeros((kp,), bool))
        hist = []
        hb = 0
        while hb < self.max_new:
            hist.append(hb)
            hb += 32
        hist.append(self.max_new)
        for win in windows:
            win = max(1, win)
            # full-capacity windows pair with the w ladder; sub-capacity
            # row buckets pair with the full history width (_window_shape)
            shapes = ([(hb, self.capacity) for hb in hist]
                      + [(self.max_new, cbi) for cbi in self.row_buckets
                         if cbi < self.capacity])
            for hb, cbi in shapes:
                carry, _ = self._get_multi(win, hb, cbi)(
                    self.params, self.prompt_pool, self.dec_pool,
                    jnp.asarray(self.prompt_mask),
                    jnp.asarray(self.last_token),
                    jnp.asarray(self.positions), jnp.asarray(self.dec_len),
                    jnp.asarray(self.active), jnp.asarray(self.greedy_row),
                    self._rng, jnp.asarray(self.gstate), **gkw)
                self.dec_pool, self._rng = carry[0], carry[5]
        for b in self.row_buckets:
            if b < self.capacity:          # identity rows: state-neutral
                self.prompt_pool, self.dec_pool = self._get_pack(b)(
                    self.prompt_pool, self.dec_pool,
                    jnp.arange(b, dtype=jnp.int32))
        self._dev_dirty = True

    def run(self, requests: List[Request], window: int = 1) -> List[Request]:
        """Convenience driver: admit-as-capacity-allows until all finish.
        `window`: decode steps per host round trip (step_window)."""
        pending = list(requests)
        done: List[Request] = []
        while pending or self.active.any() or self._pending_first:
            done.extend(r for r in self.admit_many(pending) if r.done)
            done.extend(self.step_window(window) if window > 1 else self.step())
        done.extend(self._finished_backlog)
        self._finished_backlog.clear()
        return done

    # -- pipelined driver -------------------------------------------------

    def _apply_patches(self):
        """Push every slot touched since the last window (installs, retires)
        onto the device state with ONE row-scatter jit + one small upload —
        the pipelined replacement for _upload_state, which cannot be used
        mid-pipeline because the full mirrors lag the in-flight window."""
        if not self._patch_slots:
            return
        slots = np.fromiter(sorted(self._patch_slots), np.int32,
                            len(self._patch_slots))
        self._patch_slots.clear()
        n = len(slots)
        npad = self._pow2_bucket(n)
        sl = np.full((npad,), self.capacity, np.int32)   # pad rows: drop
        sl[:n] = slots

        def pad(v, fill=0):
            out = np.full((npad,) + v.shape[1:], fill, v.dtype)
            out[:n] = v
            return out
        host = (sl, pad(self.prompt_mask[slots]), pad(self.last_token[slots]),
                pad(self.positions[slots]), pad(self.dec_len[slots]),
                pad(self.active[slots]), pad(self.gstate[slots]),
                pad(self.greedy_row[slots]))
        dev = jax.device_put(host)                       # ONE upload
        pmask, last, pos, dlen, act, gst = self._dev_state
        (pmask, last, pos, dlen, act, gst,
         self._dev_greedy) = self._jit_patch(pmask, last, pos, dlen, act,
                                             gst, self._dev_greedy, *dev)
        self._dev_state = (pmask, last, pos, dlen, act, gst)

    def _dispatch_window(self, k: int, lag: int):
        """Dispatch one decode window WITHOUT waiting on the device.
        `lag`: steps the host mirrors trail the device by (the in-flight
        window's length) — widens the history bucket bound, since dec_len
        for rows inside that window hasn't been replayed yet."""
        self._apply_patches()
        pmask, last, pos, dlen, act, gst = self._dev_state
        for rec in self._pending_first:
            last, act = self._jit_fix_first(last, act, rec[2], rec[5],
                                            rec[6], self._dev_greedy)
        w, cb = self._window_shape(lag)
        carry, toks = self._get_multi(k, w, cb)(
            self.params, self.prompt_pool, self.dec_pool, pmask, last, pos,
            dlen, act, self._dev_greedy, self._rng, gst)
        (self.dec_pool, last, pos, dlen, act, self._rng, gst) = carry
        self._dev_state = (pmask, last, pos, dlen, act, gst)
        snap = [(int(s), self._by_slot[s])
                for s in np.nonzero(self.active)[0]]
        return (toks, snap, k)

    def _replay_window(self, inflight) -> List[Request]:
        """Host-side resolution of a window dispatched one iteration ago:
        append its tokens to the requests bound to each slot AT DISPATCH
        TIME (the slot may have been rebound to a successor since — then
        the old request's tokens still land on the old request and the
        mirrors, already reset by the install, are left alone)."""
        toks, snap, k = inflight
        toks = np.asarray(toks)                          # the ONE transfer
        finished: List[Request] = []
        for slot, req in snap:
            if req is None or req.done:
                continue
            cur = self._by_slot[slot] is req
            adv = cur and self.active[slot]
            for step in range(k):
                t = int(toks[step, slot])
                req.tokens.append(t)
                if adv:
                    self.dec_len[slot] += 1
                    self.positions[slot] += 1
                    self.last_token[slot] = t
                    if self.guided is not None:
                        self.gstate[slot] = self._g_next_np[
                            self.gstate[slot], t]
                if t == self.eos or len(req.tokens) >= req.max_new_tokens:
                    finished.append(req)
                    if cur:
                        self._finish(slot)   # retention + slot bookkeeping
                    else:
                        req.done = True      # slot already rebound
                    break
        return finished

    def _get_pack(self, b: int):
        if b not in self._jit_pack:
            def pack(prompt_pool, dec_pool, rows):
                mv = lambda x: x.at[:rows.shape[0]].set(x[rows])
                return (jax.tree.map(mv, prompt_pool),
                        jax.tree.map(mv, dec_pool))
            self._jit_pack[b] = jax.jit(pack, donate_argnums=(0, 1))
        return self._jit_pack[b]

    def _pack_front(self):
        """Drain-phase slot packing: gather the live rows to the FRONT of
        the (same-size) pools so the next windows' row bucket (cb) steps
        down the ladder. The decode step's cost is dominated by per-row KV
        reads (measured ~2.6 ms/step at 32 rows vs ~7.3 ms at 128 for the
        0.6B serving shape), so halving the read rows roughly halves the
        remaining drain cost. Cost: one in-place gather of <= bucket rows.
        Mirrors must be authoritative (no window in flight); prefix
        retention is incompatible with moving rows, so run_pipelined skips
        packing when prefix_cache is on."""
        live = np.nonzero(self.active)[0].astype(np.int32)
        n = len(live)
        b = self._row_bucket(max(1, n))
        rows = np.arange(b, dtype=np.int32)
        rows[:n] = live                    # rows[i >= n] = i: identity write
        self.prompt_pool, self.dec_pool = self._get_pack(b)(
            self.prompt_pool, self.dec_pool, jax.device_put(rows))
        for name in ("prompt_mask", "positions", "dec_len", "last_token",
                     "gstate"):
            arr = getattr(self, name)
            packed = arr[live]
            arr[:] = 0
            arr[:n] = packed
        g = self.greedy_row[live]
        self.greedy_row[:] = False
        self.greedy_row[:n] = g
        self.active[:] = False
        self.active[:n] = True
        self._by_slot = ([self._by_slot[i] for i in live]
                         + [None] * (self.capacity - n))
        self._patch_slots.clear()          # superseded by the fresh upload
        self._upload_state()

    def run_pipelined(self, requests: List[Request],
                      window: int = 8) -> List[Request]:
        """run() with one decode window always IN FLIGHT: the host resolves
        window N's tokens, admits replacements and dispatches the device
        patches while window N+1 computes — per-window host time (the
        token-matrix round trip, mirror replay, admission bookkeeping)
        disappears behind device compute instead of serializing with it.

        Admission keeps full occupancy across the pipeline bubble because
        quota finishes are PREDICTED: a slot whose request has fewer than
        `window` tokens of budget left is guaranteed free after the
        in-flight window (EOS could only free it earlier), so its successor
        is installed before that window has even resolved. The install's
        state writes queue behind the in-flight window on the device
        stream; the old request's final tokens are replayed onto the OLD
        request via the dispatch-time slot binding (_replay_window).

        Identical completions to run() for greedy rows (each slot's decode
        depends only on its own prompt/KV); sampled rows see a different
        host rng split sequence. Guided decoding needs per-token host
        resolution and falls back to run()."""
        if self.guided is not None:
            return self.run(requests, window=window)
        tm = self.timers
        clk = time.perf_counter
        pending = list(requests)
        done: List[Request] = list(self._finished_backlog)
        self._finished_backlog.clear()
        self.pipelined = True
        try:
            if self._dev_state is None or self._dev_dirty:
                self._upload_state()
            inflight = None
            while (pending or self.active.any() or self._pending_first
                   or inflight):
                if inflight is not None:
                    # retire rows that deterministically finish in flight
                    _, snap, kk = inflight
                    for slot, req in snap:
                        if (req is not None and not req.done
                                and self._by_slot[slot] is req
                                and self.active[slot]
                                and len(req.tokens) + kk
                                >= req.max_new_tokens):
                            self.active[slot] = False
                            self._patch_slots.add(slot)
                if (inflight is not None and not pending
                        and not self._pending_first
                        and not self.prefix_cache):
                    live = int(self.active.sum())
                    if (live and self._row_bucket(live)
                            < self._row_bucket(self._hwm())):
                        # drain: resolve the in-flight window (one pipeline
                        # bubble), pack live rows to the front, and step
                        # the row bucket down for the remaining windows
                        t0 = clk() if tm is not None else 0.0
                        done.extend(self._replay_window(inflight))
                        inflight = None
                        if self.active.any():
                            self._pack_front()
                        if tm is not None:
                            tm["pack"] = tm.get("pack", 0.0) + clk() - t0
                        continue
                t0 = clk() if tm is not None else 0.0
                done.extend(r for r in self.admit_many(pending) if r.done)
                if tm is not None:
                    t1 = clk()
                    tm["admit"] = tm.get("admit", 0.0) + t1 - t0
                    t0 = t1
                nxt = None
                if self.active.any() or self._pending_first:
                    nxt = self._dispatch_window(
                        window, inflight[2] if inflight else 0)
                    if tm is not None:
                        tm["windows"] = tm.get("windows", 0) + 1
                        tm["rows"] = tm.get("rows", 0) + int(self.active.sum())
                if tm is not None:
                    t1 = clk()
                    tm["dispatch"] = tm.get("dispatch", 0.0) + t1 - t0
                    t0 = t1
                if inflight is not None:
                    done.extend(self._replay_window(inflight))
                done.extend(self._resolve_pending())
                if tm is not None:
                    tm["replay"] = tm.get("replay", 0.0) + clk() - t0
                inflight = nxt
            done.extend(self._finished_backlog)
            self._finished_backlog.clear()
        finally:
            self.pipelined = False
            self._patch_slots.clear()
            self._dev_dirty = True     # mirrors are authoritative again
        return done
