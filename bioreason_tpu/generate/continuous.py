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
        self._jit_step = jax.jit(self._step, donate_argnums=(1,))

    # -- jitted pieces ---------------------------------------------------

    def _prefill(self, params, input_ids, attention_mask, dna_ids, dna_mask):
        """One request's prompt -> (per-layer prompt KV [1,P,..], last logits)."""
        cfg = self.cfg.decoder
        embeds = fused_input_embeddings(params, self.cfg, input_ids,
                                        dna_ids, dna_mask)
        p = input_ids.shape[1]
        cache = init_cache(cfg, 1, p, jnp.dtype(cfg.dtype))
        logits, cache = decoder_forward(
            params["decoder"], cfg, inputs_embeds=embeds,
            attention_mask=attention_mask,
            positions=L.positions_from_mask(attention_mask),
            cache=cache, cache_index=0, cache_mask=attention_mask)
        return cache, logits[:, -1, :]

    def _write_slot(self, cache, slot_kv, slot: jnp.ndarray):
        """Copy a prefilled [1,P] KV into row `slot` of the pool at offset 0
        (quantizing on the way in when the pool is int8)."""
        from bioreason_tpu.models.qwen3 import _kv_quantize
        out = []
        for pool, kv in zip(cache, slot_kv):
            dus = jax.lax.dynamic_update_slice
            if self.kv_int8:
                qk, sk = _kv_quantize(kv["k"])
                qv, sv = _kv_quantize(kv["v"])
                out.append({
                    "k": dus(pool["k"], qk, (slot, 0, 0, 0)),
                    "v": dus(pool["v"], qv, (slot, 0, 0, 0)),
                    "k_scale": dus(pool["k_scale"],
                                   sk.astype(pool["k_scale"].dtype), (slot, 0, 0, 0)),
                    "v_scale": dus(pool["v_scale"],
                                   sv.astype(pool["v_scale"].dtype), (slot, 0, 0, 0)),
                })
            else:
                out.append({
                    "k": dus(pool["k"], kv["k"].astype(pool["k"].dtype), (slot, 0, 0, 0)),
                    "v": dus(pool["v"], kv["v"].astype(pool["v"].dtype), (slot, 0, 0, 0)),
                })
        return out

    def _step(self, params, cache, last_token, positions, cache_mask,
              write_idx, active, greedy_row, rng, gstate=None,
              g_next=None, g_acc=None):
        """One decode step over ALL capacity rows (inactive rows masked).
        Each row writes its new KV at its OWN cache column `write_idx[row]`
        (requests sit at different depths — per-row scatter, not a uniform
        dynamic_update_slice)."""
        cfg = self.cfg.decoder
        s = self.sampling
        logits, new_kv = _decode_rows(params["decoder"], cfg, last_token[:, None],
                                      positions[:, None], cache, cache_mask,
                                      write_idx)
        row_logits = logits[:, 0, :]
        if g_next is not None:
            # regex constraint (generate/guided.py): per-slot DFA state
            row = g_next[gstate]
            allow = row != self.guided.dead
            allow = allow.at[:, self.guided.eos_token_id].set(g_acc[gstate])
            row_logits = jnp.where(allow, row_logits,
                                   jnp.asarray(-1e9, row_logits.dtype))
        greedy_tok = jnp.argmax(row_logits, axis=-1).astype(jnp.int32)
        rng, k = jax.random.split(rng)
        sampled = sample_logits(k, row_logits, temperature=s.temperature,
                                top_k=s.top_k, top_p=s.top_p, greedy=False)
        tok = jnp.where(greedy_row, greedy_tok, sampled)
        tok = jnp.where(active, tok, 0)
        return tok, new_kv, rng

    # -- host scheduling -------------------------------------------------

    def _bucketed(self, n: int) -> int:
        b = self.prompt_bucket
        return ((max(n, 1) + b - 1) // b) * b

    def admit(self, req: Request) -> bool:
        """Prefill `req` and install it in a free slot. False if full."""
        free = np.nonzero(~self.active)[0]
        if len(free) == 0:
            return False
        slot = int(free[0])
        width = self._bucketed(self.input_width(req))
        if width > self.max_len:
            raise ValueError(f"prompt {width} exceeds slot length {self.max_len}")
        ids = np.zeros((1, width), np.int32)
        mask = np.zeros((1, width), np.int32)
        n = req.input_ids.shape[-1]
        ids[0, width - n:] = req.input_ids.reshape(-1)     # left pad
        mask[0, width - n:] = req.attention_mask.reshape(-1)
        dna = (None if req.dna_input_ids is None
               else jnp.asarray(req.dna_input_ids))
        dmask = (None if req.dna_attention_mask is None
                 else jnp.asarray(req.dna_attention_mask))
        kv, last_logits = self._jit_prefill(self.params, jnp.asarray(ids),
                                            jnp.asarray(mask), dna, dmask)
        self.cache = self._jit_write(self.cache, kv, jnp.asarray(slot))
        # first token comes from the prefill logits
        if self.guided is not None:
            allow = self._g_next_np[0] != self.guided.dead
            allow[self.guided.eos_token_id] = bool(self._g_acc_np[0])
            last_logits = jnp.where(jnp.asarray(allow), last_logits,
                                    jnp.asarray(-1e9, last_logits.dtype))
        self._rng, k = jax.random.split(self._rng)
        s = self.sampling
        if req.greedy:
            tok = int(jnp.argmax(last_logits[0]))
        else:
            tok = int(sample_logits(k, last_logits, temperature=s.temperature,
                                    top_k=s.top_k, top_p=s.top_p, greedy=False)[0])
        if self.guided is not None:
            self.gstate[slot] = self._g_next_np[0, tok]
        req.slot = slot
        req.tokens.append(tok)
        self._by_slot[slot] = req
        self.cache_mask[slot] = 0
        self.cache_mask[slot, :width] = mask[0]
        self.positions[slot] = req.prompt_len            # next ROPE position
        self.next_col[slot] = width                      # decode tokens append here
        self.last_token[slot] = tok
        self.active[slot] = True
        self.greedy_row[slot] = req.greedy
        if tok == self.eos or len(req.tokens) >= req.max_new_tokens:
            self._finish(slot)
        return True

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
        if not self.active.any():
            return []
        # register each pending token's cache column (after the bucketed
        # prompt region; left-pad columns stay invalid forever)
        for slot in np.nonzero(self.active)[0]:
            if self.next_col[slot] >= self.max_len:
                raise RuntimeError(f"slot {slot} overflow: raise max_len")
            self.cache_mask[slot, self.next_col[slot]] = 1
        gkw = (dict(gstate=jnp.asarray(self.gstate),
                    g_next=self.guided.next_state, g_acc=self.guided.accepting)
               if self.guided is not None else {})
        tok, new_kv, self._rng = self._jit_step(
            self.params, self.cache, jnp.asarray(self.last_token),
            jnp.asarray(self.positions), jnp.asarray(self.cache_mask),
            jnp.asarray(self.next_col), jnp.asarray(self.active),
            jnp.asarray(self.greedy_row), self._rng, **gkw)
        self.cache = new_kv
        tok = np.asarray(tok)
        finished = []
        for slot in np.nonzero(self.active)[0]:
            req = self._by_slot[slot]
            t = int(tok[slot])
            if self.guided is not None:
                self.gstate[slot] = self._g_next_np[self.gstate[slot], t]
            req.tokens.append(t)
            self.last_token[slot] = t
            self.positions[slot] += 1
            self.next_col[slot] += 1
            if t == self.eos or len(req.tokens) >= req.max_new_tokens:
                finished.append(req)
                self._finish(slot)
        return finished

    def run(self, requests: List[Request]) -> List[Request]:
        """Convenience driver: admit-as-capacity-allows until all finish."""
        pending = list(requests)
        done: List[Request] = []
        while pending or self.active.any():
            while pending and self.admit(pending[0]):
                r = pending.pop(0)
                if r.done:
                    done.append(r)
            done.extend(self.step())
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
