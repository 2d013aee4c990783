"""Jitted KV-cached generation engine: prefill + while-loop decode.

This is the TPU replacement for the reference's rollout/eval generation —
HF `model.generate(inputs_embeds=...)` (dna_llm.py:277-305) and the planned
vLLM sidecar (grpo_config.py:230-281, demo_grpo.py:366-425):

  * prefill embeds the (left-padded) prompt — including the DNA splice — and
    fills the KV cache in one batched pass;
  * decode is a `lax.while_loop` with donated cache buffers, one fused step
    per token: forward(1 token) -> top-k/top-p sample -> cache write; exits
    early once every row has emitted EOS;
  * like the reference path, returns COMPLETION ids only; callers rebuild
    prompt+completion when needed (grpo_trainer.py:588-596).

Everything (prefill + decode loop) is a single jit per (batch, prompt_len,
max_new_tokens) bucket; sampling params are static, the PRNG key is an arg.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bioreason_tpu.config import FusionConfig, SamplingConfig
from bioreason_tpu.models.fusion import fused_input_embeddings
from bioreason_tpu.models.qwen3 import decoder_forward, init_cache
from bioreason_tpu.models import layers as L
from bioreason_tpu.ops.sampling import sample_logits, completion_mask_from_eos


class GenerationEngine:
    def __init__(self, fusion_cfg: FusionConfig, eos_token_id: int,
                 pad_token_id: Optional[int] = None, mesh=None,
                 kv_int8: bool = False):
        """`mesh`: optional jax.sharding.Mesh — prompt/DNA inputs are
        device_put with the batch PartitionSpec so GSPMD keeps the rollout
        data-parallel instead of receiving replicated host arrays (the
        all-gather the reference pays through accelerate is never needed).

        `kv_int8`: store the KV cache int8 with per-(token,head) scales
        (the vLLM fp8-KV-cache role) — halves cache bandwidth, which
        dominates the decode step at large batch; ~0.4% K/V RMS error."""
        self.cfg = fusion_cfg
        self.eos_token_id = eos_token_id
        self.pad_token_id = pad_token_id if pad_token_id is not None else eos_token_id
        self.mesh = mesh
        self.kv_int8 = kv_int8
        self._jit_generate = jax.jit(
            self._generate,
            static_argnames=("max_new_tokens", "temperature", "top_k", "top_p",
                             "greedy", "group_size", "guided_dead", "guided_eos"),
        )

    def _put(self, arr, batch_dim: bool = True):
        if arr is None:
            return None
        arr = np.asarray(arr)
        if self.mesh is None:
            return jnp.asarray(arr)
        from jax.sharding import NamedSharding
        from bioreason_tpu.parallel.partition import batch_spec, _valid_spec
        from jax.sharding import PartitionSpec as P
        spec = _valid_spec(batch_spec() if batch_dim else P(), arr.shape, self.mesh)
        return jax.device_put(arr, NamedSharding(self.mesh, spec))

    # -- core jitted routine -------------------------------------------------

    def _generate(self, params, rng, input_ids, attention_mask,
                  dna_input_ids, dna_attention_mask,
                  max_new_tokens: int, temperature: float, top_k: int,
                  top_p: float, greedy: bool, group_size: int = 1,
                  g_next=None, g_acc=None, guided_dead: int = 0,
                  guided_eos: int = 0):
        cfg = self.cfg.decoder
        b, p = input_ids.shape
        dtype = jnp.dtype(cfg.dtype)
        grouped = group_size > 1

        embeds = fused_input_embeddings(params, self.cfg, input_ids,
                                        dna_input_ids, dna_attention_mask)

        # Prefill cache: prompt slots only when grouped (decode slots live in
        # a separate per-completion buffer); prompt+decode slots otherwise.
        prefill_len = p if grouped else p + max_new_tokens
        cache = init_cache(cfg, b, prefill_len, dtype, quantize=self.kv_int8)
        prompt_positions = L.positions_from_mask(attention_mask)
        cache_mask0 = (attention_mask if grouped
                       else jnp.pad(attention_mask, ((0, 0), (0, max_new_tokens))))
        logits, cache = decoder_forward(
            params["decoder"], cfg, inputs_embeds=embeds,
            attention_mask=attention_mask, positions=prompt_positions,
            cache=cache, cache_index=0, cache_mask=cache_mask0)
        # prompts are LEFT-padded: last column is the last real token for every row
        last_logits = logits[:, -1, :]

        if grouped:
            # GRPO prefix sharing: prefill ran once per UNIQUE prompt. The
            # prompt KV cache stays [B_u, P] and is READ SHARED by all G
            # completions every decode step (qwen3.decoder_decode_step_grouped)
            # — no G-fold jnp.repeat HBM copy, and 1/G the prompt-cache
            # bandwidth vs the expanded layout. Replaces the reference's
            # G-fold redundant prefill through HF generate
            # (grpo_trainer.py:579-596).
            from bioreason_tpu.models.qwen3 import (decoder_decode_step_grouped,
                                                    init_decode_cache)
            last_logits = jnp.repeat(last_logits, group_size, axis=0)
            prompt_lens = jnp.repeat(attention_mask.sum(axis=-1), group_size
                                     ).astype(jnp.int32)          # [B_u*G]
            bg = b * group_size
            dec_cache = init_decode_cache(cfg, bg, max_new_tokens, dtype,
                                          quantize=self.kv_int8)
            dec_mask0 = jnp.zeros((bg, max_new_tokens), jnp.int32)
        else:
            prompt_lens = attention_mask.sum(axis=-1).astype(jnp.int32)
            bg = b
            dec_cache, dec_mask0 = None, cache_mask0

        out_tokens = jnp.full((bg, max_new_tokens), self.pad_token_id, jnp.int32)
        done = jnp.zeros((bg,), bool)
        guided = g_next is not None
        gstate = jnp.zeros((bg,), jnp.int32)          # per-row DFA state

        def sample(rng, logits_row, gstate):
            if guided:
                # regex constraint (guided.py): gather this step's allowed-token
                # row per DFA state; EOS allowed iff the state is accepting
                row = g_next[gstate]                               # [B, V]
                allow = row != guided_dead
                allow = allow.at[:, guided_eos].set(g_acc[gstate])
                logits_row = jnp.where(allow, logits_row,
                                       jnp.asarray(-1e9, logits_row.dtype))
            return sample_logits(rng, logits_row, temperature=temperature,
                                 top_k=top_k, top_p=top_p, greedy=greedy)

        def advance(gstate, tok, done_prev):
            if not guided:
                return gstate
            return jnp.where(done_prev, gstate, g_next[gstate, tok])

        rng, k0 = jax.random.split(rng)
        tok0 = sample(k0, last_logits, gstate)
        out_tokens = out_tokens.at[:, 0].set(tok0)
        gstate = advance(gstate, tok0, done)
        done = done | (tok0 == self.eos_token_id)

        def cond(state):
            step, done, *_ = state
            return (step < max_new_tokens) & ~jnp.all(done)

        def body(state):
            step, done, out_tokens, kv, kv_mask, rng, gstate = state
            cur = jax.lax.dynamic_slice(out_tokens, (0, step - 1), (bg, 1))  # [B,1]
            positions = (prompt_lens + step - 1)[:, None]
            if grouped:
                # register slot step-1 as valid, then attend to shared prompt
                # KV + per-completion decode KV in one softmax
                kv_mask = jax.lax.dynamic_update_slice(
                    kv_mask, jnp.ones((bg, 1), kv_mask.dtype), (0, step - 1))
                step_logits, kv = decoder_decode_step_grouped(
                    params["decoder"], cfg, cur, positions,
                    cache, attention_mask, kv, step - 1, kv_mask, group_size)
            else:
                kv_mask = jax.lax.dynamic_update_slice(
                    kv_mask, jnp.ones((bg, 1), kv_mask.dtype), (0, p + step - 1))
                step_logits, kv = decoder_forward(
                    params["decoder"], cfg, input_ids=cur,
                    attention_mask=jnp.ones((bg, 1), jnp.int32),
                    positions=positions, cache=kv, cache_index=p + step - 1,
                    cache_mask=kv_mask)
            rng, k = jax.random.split(rng)
            tok = sample(k, step_logits[:, 0, :], gstate)
            gstate = advance(gstate, tok, done)
            tok = jnp.where(done, self.pad_token_id, tok)
            out_tokens = jax.lax.dynamic_update_slice(out_tokens, tok[:, None], (0, step))
            done = done | (tok == self.eos_token_id)
            return step + 1, done, out_tokens, kv, kv_mask, rng, gstate

        state = (jnp.asarray(1), done, out_tokens,
                 dec_cache if grouped else cache, dec_mask0, rng, gstate)
        _, done, out_tokens, _, _, _, _ = jax.lax.while_loop(cond, body, state)

        completion_mask = completion_mask_from_eos(out_tokens, self.eos_token_id)
        # zero out tokens after EOS (pad), matching reference postprocessing
        out_tokens = jnp.where(completion_mask.astype(bool), out_tokens, self.pad_token_id)
        return out_tokens, completion_mask

    # -- public API ----------------------------------------------------------

    def generate(self, params, input_ids, attention_mask,
                 dna_input_ids=None, dna_attention_mask=None,
                 sampling: SamplingConfig = SamplingConfig(),
                 max_new_tokens: Optional[int] = None,
                 greedy: bool = False, rng: Optional[jax.Array] = None,
                 group_size: int = 1, guided=None) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (completion_ids [B*group_size, max_new], completion_mask).

        With group_size G > 1, each input row is treated as one GRPO prompt:
        it is prefilled ONCE and G completions are sampled from the shared
        KV cache (output rows are group-contiguous).

        `guided`: optional guided.GuidedSpec — regex-constrained decoding
        (the vLLM `vllm_guided_decoding_regex` equivalent); every completion
        is a match (or, if max_new_tokens is hit first, a matchable prefix)
        of the compiled pattern."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        mnt = max_new_tokens if max_new_tokens is not None else sampling.max_new_tokens
        gkw = {}
        if guided is not None:
            gkw = dict(g_next=guided.next_state, g_acc=guided.accepting,
                       guided_dead=guided.dead, guided_eos=guided.eos_token_id)
        tokens, mask = self._jit_generate(
            params, rng,
            self._put(input_ids), self._put(attention_mask),
            self._put(dna_input_ids), self._put(dna_attention_mask),
            max_new_tokens=mnt, temperature=sampling.temperature,
            top_k=sampling.top_k, top_p=sampling.top_p, greedy=greedy,
            group_size=group_size, **gkw)
        return np.asarray(tokens), np.asarray(mask)
