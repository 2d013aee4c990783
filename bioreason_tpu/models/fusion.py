"""DNA-LLM fusion model: encoder -> projection -> splice -> decoder.

TPU-native rebuild of the reference `DNALLMModel` (dna_llm.py:18-305). The
reference runs the DNA encoder under no_grad, projects, then does a ragged
regroup in Python (:163-179) and a boolean masked assignment into the text
embeddings (:216-229). Here the whole thing is ONE jitted function with
static shapes:

  1. encode all DNA sequences [S, Ld] -> last hidden [S, Ld, Hd]
     (stop_gradient: the reference de-facto never trains the DNA tower,
     dna_llm.py:121);
  2. linear projection to the text width (the only always-trainable fusion
     param, dna_llm.py:97);
  3. ragged splice WITHOUT host loops: flatten valid DNA tokens in
     (sequence-major, position-minor) order via a cumsum-scatter, then gather
     them into the `<|dna_pad|>` placeholder positions of the text embedding
     (row-major order), replacing the reference's `embeds[mask] = flat`.

Ordering invariant: the processor flattens DNA sequences batch-major
(processor.py `tokenize_dna`), so the k-th valid DNA token overall matches
the k-th `<|dna_pad|>` placeholder overall. `validate_splice` reproduces the
reference's strict count check (dna_llm.py:222-225) host-side.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bioreason_tpu.config import FusionConfig
from bioreason_tpu.models import layers as L
from bioreason_tpu.models.nt_encoder import init_encoder, encoder_forward
from bioreason_tpu.models.qwen3 import init_decoder, decoder_forward


def init_fusion(rng, cfg: FusionConfig) -> Dict:
    k_enc, k_dec, k_proj = jax.random.split(rng, 3)
    if cfg.encoder_kind == "evo2":
        from bioreason_tpu.models.evo2 import init_hyena
        encoder = init_hyena(k_enc, cfg.hyena)
        dna_hidden = cfg.hyena.hidden_size
    else:
        encoder = init_encoder(k_enc, cfg.encoder)
        dna_hidden = cfg.encoder.hidden_size
    return {
        "encoder": encoder,
        "decoder": init_decoder(k_dec, cfg.decoder),
        # nn.Linear equivalent: kernel + bias (dna_llm.py:97)
        "dna_projection": {
            "kernel": jax.random.normal(k_proj, (dna_hidden, cfg.decoder.hidden_size),
                                        jnp.float32) * dna_hidden ** -0.5,
            "bias": jnp.zeros((cfg.decoder.hidden_size,), jnp.float32),
        },
    }


def encode_dna(params: Dict, cfg: FusionConfig, dna_input_ids, dna_attention_mask,
               train_encoder: bool = False) -> jnp.ndarray:
    """DNA tower -> projected embeddings [S, Ld, H_text] (cfg.decoder dtype)."""
    if cfg.encoder_kind == "evo2":
        from bioreason_tpu.models.evo2 import hyena_forward
        hidden = hyena_forward(params["encoder"], cfg.hyena, dna_input_ids,
                               dna_attention_mask)
    else:
        hidden = encoder_forward(params["encoder"], cfg.encoder, dna_input_ids,
                                 dna_attention_mask)
    if not train_encoder:
        hidden = jax.lax.stop_gradient(hidden)
    proj = params["dna_projection"]
    dtype = jnp.dtype(cfg.decoder.dtype)
    out = hidden.astype(dtype) @ proj["kernel"].astype(dtype) + proj["bias"].astype(dtype)
    return out


def splice_embeddings(text_embeds: jnp.ndarray, input_ids: jnp.ndarray,
                      dna_embeds: jnp.ndarray, dna_mask: jnp.ndarray,
                      dna_pad_token_id: int) -> jnp.ndarray:
    """Replace `<|dna_pad|>` positions of text_embeds with the valid DNA
    embeddings, both taken in flat row-major order. Static shapes throughout.

    text_embeds [B,T,H], input_ids [B,T], dna_embeds [S,Ld,H], dna_mask [S,Ld].
    """
    b, t, h = text_embeds.shape
    s, ld, _ = dna_embeds.shape
    total = s * ld

    flat_mask = dna_mask.reshape(-1).astype(jnp.int32)          # [S*Ld]
    order = jnp.cumsum(flat_mask) - 1                            # rank among valid
    scatter_idx = jnp.where(flat_mask > 0, order, total)         # invalid -> OOB (dropped)
    dna_flat = jnp.zeros((total, h), dna_embeds.dtype).at[scatter_idx].set(
        dna_embeds.reshape(total, h), mode="drop")

    text_mask = (input_ids == dna_pad_token_id).reshape(-1)      # [B*T]
    gather_idx = jnp.clip(jnp.cumsum(text_mask.astype(jnp.int32)) - 1, 0, total - 1)
    replacement = dna_flat[gather_idx].reshape(b, t, h).astype(text_embeds.dtype)
    return jnp.where(text_mask.reshape(b, t, 1), replacement, text_embeds)


def splice_embeddings_per_item(text_embeds: jnp.ndarray, input_ids: jnp.ndarray,
                               dna_embeds: jnp.ndarray, dna_mask: jnp.ndarray,
                               dna_pad_token_id: int, per_item: int) -> jnp.ndarray:
    """Shard-friendly splice for the common case of a FIXED number of DNA
    sequences per batch item (2 for KEGG/VEP). The cumsum/scatter/gather all
    stay row-local, so under a ('data','fsdp')-sharded batch GSPMD keeps the
    whole splice data-parallel (the batch-global variant needs an all-gather
    and triggers involuntary rematerialization in the partitioner).

    dna_embeds [B*per_item, Ld, H] (batch-major, like the processor emits).
    """
    b, t, h = text_embeds.shape
    ld = dna_embeds.shape[1]
    total = per_item * ld
    dna_b = dna_embeds.reshape(b, total, h)
    mask_b = dna_mask.reshape(b, total).astype(jnp.int32)

    order = jnp.cumsum(mask_b, axis=1) - 1                        # [B, total]
    scatter_idx = jnp.where(mask_b > 0, order, total)             # OOB -> dropped
    flat = jnp.zeros((b, total, h), dna_b.dtype)
    flat = jax.vmap(lambda f, i, d: f.at[i].set(d, mode="drop"))(flat, scatter_idx, dna_b)

    text_mask = input_ids == dna_pad_token_id                     # [B, T]
    gather_idx = jnp.clip(jnp.cumsum(text_mask.astype(jnp.int32), axis=1) - 1,
                          0, total - 1)
    replacement = jnp.take_along_axis(flat, gather_idx[..., None], axis=1)
    return jnp.where(text_mask[..., None], replacement.astype(text_embeds.dtype),
                     text_embeds)


def validate_splice(input_ids: np.ndarray, dna_input_ids: Optional[np.ndarray],
                    dna_pad_token_id: int, dna_tokenizer_pad_id: int = 1) -> None:
    """Host-side strict count check (reference dna_llm.py:222-225)."""
    if dna_input_ids is None:
        return
    n_tokens = int((np.asarray(input_ids) == dna_pad_token_id).sum())
    n_features = int((np.asarray(dna_input_ids) != dna_tokenizer_pad_id).sum())
    if n_features != n_tokens:
        raise ValueError(
            f"DNA features and DNA tokens do not match: features {n_features}, "
            f"tokens: {n_tokens}")


def fusion_forward(
    params: Dict,
    cfg: FusionConfig,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    dna_input_ids: Optional[jnp.ndarray] = None,
    dna_attention_mask: Optional[jnp.ndarray] = None,
    labels: Optional[jnp.ndarray] = None,
    train_encoder: bool = False,
    train_embeddings: bool = False,
    lora_dropout_rng: Optional[jnp.ndarray] = None,
    lora_dropout_rate: float = 0.0,
    label_positions: Optional[jnp.ndarray] = None,
    label_targets: Optional[jnp.ndarray] = None,
    label_valid: Optional[jnp.ndarray] = None,
    focal_gamma: float = 0.0,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Fused forward. Returns (logits, loss or None).

    With `labels`, the loss uses the vocab-chunked fused CE (ops/fused_ce.py)
    on the final hidden states — the [B,T,V] logits are never materialized —
    and `logits` is returned as None. Call without labels to get logits.

    With `label_positions/targets/valid` (from fused_ce.gather_label_positions)
    instead of `labels`, the head matmul runs ONLY on the supervised
    positions (~T/K fewer head FLOPs at identical loss) — assistant spans
    are a small fraction of the padded width in SFT batches.
    """
    embeds = fused_input_embeddings(params, cfg, input_ids, dna_input_ids,
                                    dna_attention_mask, train_encoder)
    gathered = label_positions is not None
    if labels is None and not gathered:
        logits, _ = decoder_forward(params["decoder"], cfg.decoder,
                                    inputs_embeds=embeds, attention_mask=attention_mask)
        return logits, None

    from bioreason_tpu.ops.fused_ce import decoder_lm_loss, decoder_lm_loss_gathered
    hidden, _ = decoder_forward(params["decoder"], cfg.decoder,
                                inputs_embeds=embeds, attention_mask=attention_mask,
                                return_hidden=True,
                                lora_dropout_rng=lora_dropout_rng,
                                lora_dropout_rate=lora_dropout_rate)
    dec = params["decoder"]
    head = (dec["lm_head"]["kernel"].T if "lm_head" in dec
            else dec["embed"]["embedding"])
    h = (hidden.astype(jnp.bfloat16) if cfg.decoder.dtype == "bfloat16"
         else hidden)
    if focal_gamma > 0.0:
        # detached focal weighting (ops/fused_ce.py:_focal_weighted_mean):
        # train-time option for from-scratch SFT on template-heavy spans
        from bioreason_tpu.ops.fused_ce import (decoder_lm_loss_focal,
                                                decoder_lm_loss_focal_gathered)
        if gathered:
            loss = decoder_lm_loss_focal_gathered(
                h, head, label_positions, label_targets, label_valid,
                focal_gamma, need_embedding_grad=train_embeddings)
        else:
            loss = decoder_lm_loss_focal(
                h, head, labels, focal_gamma,
                need_embedding_grad=train_embeddings)
    elif gathered:
        loss = decoder_lm_loss_gathered(h, head, label_positions, label_targets,
                                        label_valid,
                                        need_embedding_grad=train_embeddings,
                                        save_logits=cfg.ce_save_logits)
    else:
        loss = decoder_lm_loss(h, head, labels,
                               need_embedding_grad=train_embeddings,
                               save_logits=cfg.ce_save_logits)
    return None, loss


def fused_input_embeddings(params: Dict, cfg: FusionConfig, input_ids,
                           dna_input_ids=None, dna_attention_mask=None,
                           train_encoder: bool = False) -> jnp.ndarray:
    """Text embedding lookup + DNA splice (shared by forward and generate,
    reference dna_llm.py:211-229 / :277-295). Uses the row-local splice when
    the DNA batch is an exact multiple of the text batch (fixed
    sequences-per-item — true for all KEGG/VEP pipelines), falling back to
    the batch-global splice for ragged layouts."""
    dtype = jnp.dtype(cfg.decoder.dtype)
    embeds = L.embed(params["decoder"]["embed"], input_ids, dtype)
    if dna_input_ids is not None:
        dna = encode_dna(params, cfg, dna_input_ids, dna_attention_mask, train_encoder)
        b = input_ids.shape[0]
        s = dna_input_ids.shape[0]
        if s % b == 0 and s >= b:
            embeds = splice_embeddings_per_item(embeds, input_ids, dna,
                                                dna_attention_mask,
                                                cfg.dna_pad_token_id, s // b)
        else:
            embeds = splice_embeddings(embeds, input_ids, dna,
                                       dna_attention_mask, cfg.dna_pad_token_id)
    return embeds
