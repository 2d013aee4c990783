"""Continuous batching: vLLM-style slot scheduler over the jitted decoder.

The reference planned vLLM for serving/rollout (grpo_config.py:230-281,
demo_grpo.py:366-425: dedicated engine, paged KV, continuous admission).
The TPU equivalent here keeps XLA happy with STATIC shapes:

  * a fixed pool of C slots, each owning a row of the per-layer KV cache
    [C, S_max, Hkv, D] plus host-tracked (prompt_len, generated, done);
  * ONE jitted decode step advances every active slot together — new
    requests join at token boundaries without recompiling (capacity and
    cache length are static; activity is data, carried in masks);
  * admission prefills a single request (shape-bucketed jit per prompt
    length) and writes its prompt KV into the free slot row with
    `dynamic_update_slice` — the TPU stand-in for paged-attention block
    tables, which buy nothing here because slots are fixed-width;
  * finished rows are harvested and their slots reused immediately.

Throughput model: decode cost per step is ~constant in the number of ACTIVE
slots (weights-bandwidth-bound), so admitting mid-flight requests rides for
free until C is saturated — the property continuous batching exists for.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bioreason_tpu.config import FusionConfig, SamplingConfig
from bioreason_tpu.models.fusion import fused_input_embeddings
from bioreason_tpu.models.qwen3 import decoder_forward, init_cache
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


class ContinuousBatcher:
    """Slot-scheduled generation over a shared static KV pool."""

    def __init__(self, params, fusion_cfg: FusionConfig, eos_token_id: int,
                 capacity: int = 8, max_len: int = 2048,
                 sampling: SamplingConfig = SamplingConfig(),
                 prompt_bucket: int = 128, guided=None, kv_int8: bool = False):
        """`guided`: optional guided.GuidedSpec applied to EVERY request
        (batcher-level, like vLLM's engine-level guided decoding params);
        each slot tracks its own DFA state, reset on admission.

        `kv_int8`: int8 slot-pool KV storage with per-(token,head) scales —
        halves pool HBM (2x the slots at fixed memory) and cache bandwidth."""
        self.params = params
        self.cfg = fusion_cfg
        self.eos = eos_token_id
        self.capacity = capacity
        self.max_len = max_len
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
        self.cache = init_cache(dec, capacity, max_len, dtype, quantize=kv_int8)
        # host-visible slot state (mirrored into device masks each step)
        self.cache_mask = np.zeros((capacity, max_len), np.int32)
        self.positions = np.zeros((capacity,), np.int32)   # next ROPE position
        self.next_col = np.zeros((capacity,), np.int32)    # next free cache column
        self.last_token = np.zeros((capacity,), np.int32)
        self.active = np.zeros((capacity,), bool)
        self.greedy_row = np.zeros((capacity,), bool)
        self._by_slot: List[Optional[Request]] = [None] * capacity
        self._rng = jax.random.PRNGKey(0)

        self._jit_prefill = jax.jit(self._prefill)
        self._jit_write = jax.jit(self._write_slot, donate_argnums=(0,))
        self._jit_multi = {}                  # window size -> jitted multi-step
        self._jit_first = jax.jit(self._first_tokens)
        # device-resident decode state (see _upload_state / step_window)
        self._dev_state = None
        self._dev_greedy = None
        self._dev_dirty = True

    # -- jitted pieces ---------------------------------------------------

    def _prefill(self, params, input_ids, attention_mask, dna_ids, dna_mask):
        """A batch of prompts -> (per-layer prompt KV [K,P,..], last logits
        [K,V]). K>1 = grouped admission (admit_many)."""
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
        logits = L.lm_logits(params["decoder"], hidden[:, -1:, :])
        return cache, logits[:, 0, :]

    def _first_tokens(self, rng, logits, allow=None):
        """First token after prefill, per row: (greedy, sampled) — the host
        picks per request. One jitted call instead of eager op dispatch."""
        if allow is not None:
            logits = jnp.where(allow, logits, jnp.asarray(-1e9, logits.dtype))
        s = self.sampling
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        sampled = sample_logits(rng, logits, temperature=s.temperature,
                                top_k=s.top_k, top_p=s.top_p, greedy=False)
        return greedy, sampled

    def _write_slot(self, cache, slot_kv, slots: jnp.ndarray):
        """Scatter a prefilled [K,P] KV batch into rows `slots` of the pool
        at offset 0 (quantizing on the way in when the pool is int8).
        Out-of-range slots (admission batch padding) are dropped."""
        from bioreason_tpu.models.qwen3 import _kv_quantize
        slots = jnp.atleast_1d(slots)
        out = []
        for pool, kv in zip(cache, slot_kv):
            p = kv["k"].shape[1]
            if self.kv_int8:
                qk, sk = _kv_quantize(kv["k"])
                qv, sv = _kv_quantize(kv["v"])
                out.append({
                    "k": pool["k"].at[slots, :p].set(qk, mode="drop"),
                    "v": pool["v"].at[slots, :p].set(qv, mode="drop"),
                    "k_scale": pool["k_scale"].at[slots, :p].set(
                        sk.astype(pool["k_scale"].dtype), mode="drop"),
                    "v_scale": pool["v_scale"].at[slots, :p].set(
                        sv.astype(pool["v_scale"].dtype), mode="drop"),
                })
            else:
                out.append({
                    "k": pool["k"].at[slots, :p].set(
                        kv["k"].astype(pool["k"].dtype), mode="drop"),
                    "v": pool["v"].at[slots, :p].set(
                        kv["v"].astype(pool["v"].dtype), mode="drop"),
                })
        return out

    def _multi_step(self, params, cache, last_token, positions, cache_mask,
                    write_idx, active, greedy_row, rng, gstate=None,
                    g_next=None, g_acc=None, *, k: int):
        """`k` decode steps fully on device (lax.scan): host↔device sync
        drops from per-token to per-window — the scheduling RPC overhead
        amortizes over k tokens (through the axon tunnel it otherwise
        dominates the ~5 ms decode step). Rows that hit EOS mid-window go
        inactive ON DEVICE (no wasted compute or cache pollution); rows that
        exceed their max_new_tokens keep decoding until the window ends and
        the host discards the overrun (bounded by k-1 tokens)."""
        cfg = self.cfg.decoder
        s = self.sampling
        rows = jnp.arange(self.capacity)
        guided = g_next is not None

        def body(carry, _):
            (cache, last_token, positions, cache_mask, write_idx, active,
             rng, gstate) = carry
            was_active = active
            cur = cache_mask[rows, write_idx]
            cache_mask = cache_mask.at[rows, write_idx].set(
                jnp.where(active, 1, cur))
            logits, cache = _decode_rows(
                params["decoder"], cfg, last_token[:, None],
                positions[:, None], cache, cache_mask, write_idx)
            row_logits = logits[:, 0, :]
            if guided:
                row = g_next[gstate]
                allow = row != self.guided.dead
                allow = allow.at[:, self.guided.eos_token_id].set(g_acc[gstate])
                row_logits = jnp.where(allow, row_logits,
                                       jnp.asarray(-1e9, row_logits.dtype))
            greedy_tok = jnp.argmax(row_logits, axis=-1).astype(jnp.int32)
            rng, kk = jax.random.split(rng)
            sampled = sample_logits(kk, row_logits, temperature=s.temperature,
                                    top_k=s.top_k, top_p=s.top_p, greedy=False)
            tok = jnp.where(greedy_row, greedy_tok, sampled)
            tok = jnp.where(was_active, tok, 0)
            if guided:
                gstate = jnp.where(was_active, g_next[gstate, tok], gstate)
            positions = positions + was_active.astype(positions.dtype)
            write_idx = write_idx + was_active.astype(write_idx.dtype)
            last_token = jnp.where(was_active, tok, last_token)
            active = active & (tok != self.eos)
            return ((cache, last_token, positions, cache_mask, write_idx,
                     active, rng, gstate), (tok, was_active))

        init = (cache, last_token, positions, cache_mask, write_idx, active,
                rng, gstate if guided else jnp.zeros_like(last_token))
        carry, (toks, was_active) = jax.lax.scan(body, init, None, length=k)
        return carry, toks, was_active

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

    def admit_many(self, pending: List[Request]) -> List[Request]:
        """Admit from the FRONT of `pending` (popping admitted requests)
        until capacity is full. Requests with the same (prompt bucket, DNA
        shape) prefill as ONE batched jitted call with one slot-pool scatter
        and one first-token sample — per-request admission cost collapses
        from several host↔device round trips to a few per shape group.
        Group batch sizes pad to powers of two (bounded compile count);
        padded rows scatter to an out-of-range slot with mode='drop'."""
        free = list(np.nonzero(~self.active)[0])
        take = pending[:len(free)]
        if not take:
            return []
        del pending[:len(take)]
        groups: dict = {}
        for r in take:
            width = self._bucketed(self.input_width(r))
            if width > self.max_len:
                raise ValueError(
                    f"prompt {width} exceeds slot length {self.max_len}")
            dshape = (None if r.dna_input_ids is None
                      else tuple(np.asarray(r.dna_input_ids).shape))
            groups.setdefault((width, dshape), []).append(r)

        for (width, dshape), reqs in groups.items():
            k = len(reqs)
            kp = self._pow2_bucket(k)
            ids = np.zeros((kp, width), np.int32)
            mask = np.zeros((kp, width), np.int32)
            for i, r in enumerate(reqs):
                n = r.input_ids.shape[-1]
                ids[i, width - n:] = r.input_ids.reshape(-1)     # left pad
                mask[i, width - n:] = r.attention_mask.reshape(-1)
            if dshape is None:
                dna = dmask = None
            else:
                rows, ldna = dshape
                dna = np.zeros((kp * rows, ldna), np.int32)
                dmask = np.zeros((kp * rows, ldna), np.int32)
                for i, r in enumerate(reqs):
                    dna[i * rows:(i + 1) * rows] = np.asarray(r.dna_input_ids)
                    dmask[i * rows:(i + 1) * rows] = np.asarray(
                        r.dna_attention_mask)
                dna, dmask = jnp.asarray(dna), jnp.asarray(dmask)
            kv, last_logits = self._jit_prefill(
                self.params, jnp.asarray(ids), jnp.asarray(mask), dna, dmask)
            slots = np.full((kp,), self.capacity, np.int32)  # pad rows: drop
            slots[:k] = free[:k]
            free = free[k:]
            self.cache = self._jit_write(self.cache, kv, jnp.asarray(slots))
            allow = None
            if self.guided is not None:
                allow_np = self._g_next_np[0] != self.guided.dead
                allow_np[self.guided.eos_token_id] = bool(self._g_acc_np[0])
                allow = jnp.asarray(allow_np)
            self._rng, rk = jax.random.split(self._rng)
            greedy_toks, sampled = self._jit_first(rk, last_logits, allow)
            greedy_toks, sampled = np.asarray(greedy_toks), np.asarray(sampled)
            for i, r in enumerate(reqs):
                slot = int(slots[i])
                tok = int(greedy_toks[i] if r.greedy else sampled[i])
                if self.guided is not None:
                    self.gstate[slot] = self._g_next_np[0, tok]
                r.slot = slot
                r.tokens.append(tok)
                self._by_slot[slot] = r
                self.cache_mask[slot] = 0
                self.cache_mask[slot, :width] = mask[i]
                self.positions[slot] = r.prompt_len      # next ROPE position
                self.next_col[slot] = width              # decode appends here
                self.last_token[slot] = tok
                self.active[slot] = True
                self.greedy_row[slot] = r.greedy
                if tok == self.eos or len(r.tokens) >= r.max_new_tokens:
                    self._finish(slot)
        self._dev_dirty = True
        return take

    @staticmethod
    def input_width(req: Request) -> int:
        return req.input_ids.shape[-1]

    def _finish(self, slot: int):
        req = self._by_slot[slot]
        req.done = True
        self.active[slot] = False
        self._by_slot[slot] = None
        self.cache_mask[slot] = 0

    def step(self) -> List[Request]:
        """Advance every active slot one token; returns requests finished
        this step. The newly decoded token is appended to each request."""
        return self.step_window(1)

    def _upload_state(self):
        """Push the host scheduling mirrors to device. Needed only when they
        diverged from the device copies: after admissions and finishes. In
        the steady state, decode windows chain device→device and the mirrors
        evolve by deterministic replay — zero uploads."""
        self._dev_state = jax.device_put(
            (self.last_token, self.positions, self.cache_mask, self.next_col,
             self.active, self.gstate))
        self._dev_greedy = jax.device_put(self.greedy_row)
        self._dev_dirty = False

    def step_window(self, k: int) -> List[Request]:
        """Advance every active slot up to `k` tokens with one device call,
        ONE device→host transfer (the [k, C] token matrix), and zero
        device→host state syncs: decode state lives on device between
        windows and the host mirrors advance by replaying the tokens
        (everything but the sampled token is deterministic). Falls back to
        single steps when a slot lacks k columns of cache headroom."""
        if not self.active.any():
            return []
        headroom = int(self.next_col[self.active].max())
        if headroom >= self.max_len:
            raise RuntimeError("slot overflow: raise max_len")
        if k > 1 and headroom + k > self.max_len:
            out = []
            for _ in range(k):
                out.extend(self.step_window(1))
            return out
        if k not in self._jit_multi:
            import functools
            # donate the cache AND the state tuple (all returned); greedy_row
            # (argnum 7) is reused across calls and must survive
            self._jit_multi[k] = jax.jit(
                functools.partial(self._multi_step, k=k),
                donate_argnums=(1, 2, 3, 4, 5, 6, 8, 9))
        if self._dev_state is None or self._dev_dirty:
            self._upload_state()
        last, pos, cmask, widx, act, gst = self._dev_state
        gkw = (dict(g_next=self.guided.next_state, g_acc=self.guided.accepting)
               if self.guided is not None else {})
        carry, toks, _ = self._jit_multi[k](
            self.params, self.cache, last, pos, cmask, widx, act,
            self._dev_greedy, self._rng, gstate=gst, **gkw)
        self.cache = carry[0]
        self._dev_state = (carry[1], carry[2], carry[3], carry[4], carry[5],
                           carry[7])
        self._rng = carry[6]
        toks = np.asarray(toks)                 # the ONE transfer
        finished = []
        for step in range(k):
            act_slots = np.nonzero(self.active)[0]
            if len(act_slots) == 0:
                break
            for slot in act_slots:
                req = self._by_slot[slot]
                t = int(toks[step, slot])
                # replay the device-side per-step advance on the mirrors
                self.cache_mask[slot, self.next_col[slot]] = 1
                self.next_col[slot] += 1
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
                    kv, logits = self._jit_prefill(self.params, ids, mask,
                                                   dna, dmask)
                    self.cache = self._jit_write(
                        self.cache, kv, jnp.broadcast_to(drop, (kp,)))
                    self._rng, rk = jax.random.split(self._rng)
                    self._jit_first(rk, logits, None)
        gkw = (dict(gstate=jnp.asarray(self.gstate),
                    g_next=self.guided.next_state, g_acc=self.guided.accepting)
               if self.guided is not None else {})
        for w in windows:
            w = max(1, w)
            if w not in self._jit_multi:
                import functools
                self._jit_multi[w] = jax.jit(
                    functools.partial(self._multi_step, k=w),
                    donate_argnums=(1, 2, 3, 4, 5, 6, 8, 9))
            args = (self.params, self.cache, jnp.asarray(self.last_token),
                    jnp.asarray(self.positions), jnp.asarray(self.cache_mask),
                    jnp.asarray(self.next_col), jnp.asarray(self.active),
                    jnp.asarray(self.greedy_row), self._rng)
            carry, _, _ = self._jit_multi[w](*args, **gkw)
            self.cache, self._rng = carry[0], carry[6]
        self._dev_dirty = True

    def run(self, requests: List[Request], window: int = 1) -> List[Request]:
        """Convenience driver: admit-as-capacity-allows until all finish.
        `window`: decode steps per host round trip (step_window)."""
        pending = list(requests)
        done: List[Request] = []
        while pending or self.active.any():
            done.extend(r for r in self.admit_many(pending) if r.done)
            done.extend(self.step_window(window) if window > 1 else self.step())
        return done


def _decode_rows(dec_params, cfg, token_ids, positions, cache, cache_mask,
                 write_idx):
    """decoder_forward decode step where each row writes its KV at its OWN
    cache column `write_idx` (requests are at different depths). Reuses the
    per-layer loop but scatters with per-row indices."""
    dtype = jnp.dtype(cfg.dtype)
    h = L.embed(dec_params["embed"], token_ids, dtype)
    b, t, _ = h.shape

    new_cache = []
    for i in range(cfg.num_layers):
        lp = jax.tree.map(lambda x: x[i], dec_params["layers"])
        x = L.rmsnorm(lp["ln1"], h, cfg.rms_norm_eps)
        q = L.dense(lp["attn"]["q"], x, dtype).reshape(b, t, cfg.num_heads, cfg.head_dim)
        k = L.dense(lp["attn"]["k"], x, dtype).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
        v = L.dense(lp["attn"]["v"], x, dtype).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
        q = L.rmsnorm(lp["attn"]["q_norm"], q, cfg.rms_norm_eps)
        k = L.rmsnorm(lp["attn"]["k_norm"], k, cfg.rms_norm_eps)
        q = L.apply_rope(q, positions, cfg.rope_theta)
        k = L.apply_rope(k, positions, cfg.rope_theta)

        rows = jnp.arange(b)
        entry = cache[i]
        if "k_scale" in entry:
            from bioreason_tpu.models.qwen3 import _kv_quantize
            qk, sk = _kv_quantize(k[:, 0])
            qv, sv = _kv_quantize(v[:, 0])
            entry = {
                "k": entry["k"].at[rows, write_idx].set(qk),
                "v": entry["v"].at[rows, write_idx].set(qv),
                "k_scale": entry["k_scale"].at[rows, write_idx].set(
                    sk.astype(entry["k_scale"].dtype)),
                "v_scale": entry["v_scale"].at[rows, write_idx].set(
                    sv.astype(entry["v_scale"].dtype)),
            }
        else:
            entry = {"k": entry["k"].at[rows, write_idx].set(k[:, 0].astype(entry["k"].dtype)),
                     "v": entry["v"].at[rows, write_idx].set(v[:, 0].astype(entry["v"].dtype))}
        new_cache.append(entry)

        from bioreason_tpu.models.attention import xla_attention
        a = xla_attention(q, entry["k"], entry["v"], kv_mask=cache_mask,
                          causal=False, k_scale=entry.get("k_scale"),
                          v_scale=entry.get("v_scale"))
        h = h + L.dense(lp["attn"]["o"], a.reshape(b, t, -1), dtype)
        x = L.rmsnorm(lp["ln2"], h, cfg.rms_norm_eps)
        from bioreason_tpu.models.qwen3 import _mlp
        h = h + _mlp(lp, cfg, x, dtype)

    h = L.rmsnorm(dec_params["final_norm"], h, cfg.rms_norm_eps)
    logits = L.lm_logits(dec_params, h)
    return logits, new_cache
