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
                 pad_token_id: Optional[int] = None):
        self.cfg = fusion_cfg
        self.eos_token_id = eos_token_id
        self.pad_token_id = pad_token_id if pad_token_id is not None else eos_token_id
        self._jit_generate = jax.jit(
            self._generate,
            static_argnames=("max_new_tokens", "temperature", "top_k", "top_p",
                             "greedy", "group_size"),
        )

    # -- core jitted routine -------------------------------------------------

    def _generate(self, params, rng, input_ids, attention_mask,
                  dna_input_ids, dna_attention_mask,
                  max_new_tokens: int, temperature: float, top_k: int,
                  top_p: float, greedy: bool, group_size: int = 1):
        cfg = self.cfg.decoder
        b, p = input_ids.shape
        total = p + max_new_tokens
        dtype = jnp.dtype(cfg.dtype)

        embeds = fused_input_embeddings(params, self.cfg, input_ids,
                                        dna_input_ids, dna_attention_mask)

        cache = init_cache(cfg, b, total, dtype)
        prompt_positions = L.positions_from_mask(attention_mask)
        cache_mask0 = jnp.pad(attention_mask, ((0, 0), (0, max_new_tokens)))
        logits, cache = decoder_forward(
            params["decoder"], cfg, inputs_embeds=embeds,
            attention_mask=attention_mask, positions=prompt_positions,
            cache=cache, cache_index=0, cache_mask=cache_mask0)
        # prompts are LEFT-padded: last column is the last real token for every row
        last_logits = logits[:, -1, :]

        if group_size > 1:
            # GRPO prefix sharing: prefill ran once per UNIQUE prompt; expand
            # the cache G times (contiguous per group, matching the repeat
            # sampler's group layout) before sampling G completions each.
            # Replaces the reference's G-fold redundant prefill through
            # HF generate (grpo_trainer.py:579-596).
            cache = jax.tree.map(lambda a: jnp.repeat(a, group_size, axis=0), cache)
            last_logits = jnp.repeat(last_logits, group_size, axis=0)
            attention_mask = jnp.repeat(attention_mask, group_size, axis=0)
            cache_mask0 = jnp.repeat(cache_mask0, group_size, axis=0)
            b = b * group_size

        prompt_lens = attention_mask.sum(axis=-1).astype(jnp.int32)   # [B]
        out_tokens = jnp.full((b, max_new_tokens), self.pad_token_id, jnp.int32)
        done = jnp.zeros((b,), bool)

        def sample(rng, logits_row):
            return sample_logits(rng, logits_row, temperature=temperature,
                                 top_k=top_k, top_p=top_p, greedy=greedy)

        rng, k0 = jax.random.split(rng)
        tok0 = sample(k0, last_logits)
        out_tokens = out_tokens.at[:, 0].set(tok0)
        done = done | (tok0 == self.eos_token_id)

        def cond(state):
            step, done, *_ = state
            return (step < max_new_tokens) & ~jnp.all(done)

        def body(state):
            step, done, out_tokens, cache, cache_mask, rng = state
            cur = jax.lax.dynamic_slice(out_tokens, (0, step - 1), (b, 1))   # [B,1]
            # register the newly generated token as a valid cache slot
            cache_mask = jax.lax.dynamic_update_slice(
                cache_mask, jnp.ones((b, 1), cache_mask.dtype), (0, p + step - 1))
            positions = (prompt_lens + step - 1)[:, None]
            step_logits, cache = decoder_forward(
                params["decoder"], cfg, input_ids=cur,
                attention_mask=jnp.ones((b, 1), jnp.int32),
                positions=positions, cache=cache, cache_index=p + step - 1,
                cache_mask=cache_mask)
            rng, k = jax.random.split(rng)
            tok = sample(k, step_logits[:, 0, :])
            tok = jnp.where(done, self.pad_token_id, tok)
            out_tokens = jax.lax.dynamic_update_slice(out_tokens, tok[:, None], (0, step))
            done = done | (tok == self.eos_token_id)
            return step + 1, done, out_tokens, cache, cache_mask, rng

        state = (jnp.asarray(1), done, out_tokens, cache, cache_mask0, rng)
        _, done, out_tokens, _, _, _ = jax.lax.while_loop(cond, body, state)

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
                 group_size: int = 1) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (completion_ids [B*group_size, max_new], completion_mask).

        With group_size G > 1, each input row is treated as one GRPO prompt:
        it is prefilled ONCE and G completions are sampled from the shared
        KV cache (output rows are group-contiguous)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        mnt = max_new_tokens if max_new_tokens is not None else sampling.max_new_tokens
        tokens, mask = self._jit_generate(
            params, rng,
            jnp.asarray(input_ids), jnp.asarray(attention_mask),
            None if dna_input_ids is None else jnp.asarray(dna_input_ids),
            None if dna_attention_mask is None else jnp.asarray(dna_attention_mask),
            max_new_tokens=mnt, temperature=sampling.temperature,
            top_k=sampling.top_k, top_p=sampling.top_p, greedy=greedy,
            group_size=group_size)
        return np.asarray(tokens), np.asarray(mask)
