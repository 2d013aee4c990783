"""DNA-only variant classifier (reference: bioreason/models/dna_only.py).

Encoder -> learned-query attention pooling -> MLP over concat(ref, alt).
The reference loops over the batch one example at a time (dna_only.py:185-191);
here ref and alt batches run through the encoder as two dense batches and the
pooling is a single batched attention — fully vectorized for the MXU.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from bioreason_tpu.config import EncoderConfig
from bioreason_tpu.models import layers as L
from bioreason_tpu.models.nt_encoder import init_encoder, encoder_forward


def init_classifier(rng, cfg: EncoderConfig, num_classes: int = 2,
                    num_pool_heads: int = 8) -> Dict:
    k_enc, k_q, k_pool, k_c1, k_c2 = jax.random.split(rng, 5)
    d = cfg.hidden_size
    kq, kk, kv, ko = jax.random.split(k_pool, 4)
    return {
        "encoder": init_encoder(k_enc, cfg),
        "pooler": {
            # learnable query vector (dna_only.py:18)
            "query": jax.random.normal(k_q, (1, 1, d), jnp.float32),
            "q": L.dense_init(kq, d, d), "k": L.dense_init(kk, d, d),
            "v": L.dense_init(kv, d, d), "o": L.dense_init(ko, d, d),
        },
        "classifier": {
            "fc1": {**L.dense_init(k_c1, 2 * d, d), "bias": jnp.zeros((d,), jnp.float32)},
            "fc2": {**L.dense_init(k_c2, d, num_classes), "bias": jnp.zeros((num_classes,), jnp.float32)},
        },
    }


def attention_pool(pool: Dict, h: jnp.ndarray, mask: jnp.ndarray,
                   num_heads: int = 8) -> jnp.ndarray:
    """Learned-query multi-head attention pooling (dna_only.py:8-39).
    h: [B,T,D], mask: [B,T] -> [B,D]."""
    b, t, d = h.shape
    nh = num_heads if d % num_heads == 0 else 1
    hd = d // nh
    dtype = h.dtype
    q = (pool["query"].astype(dtype) @ pool["q"]["kernel"].astype(dtype)).reshape(1, 1, nh, hd)
    q = jnp.broadcast_to(q, (b, 1, nh, hd))
    k = L.dense(pool["k"], h, dtype).reshape(b, t, nh, hd)
    v = L.dense(pool["v"], h, dtype).reshape(b, t, nh, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * (hd ** -0.5)
    logits = jnp.where(mask[:, None, None, :].astype(bool), logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, 1, d)
    return L.dense(pool["o"], ctx, dtype)[:, 0]


def classifier_forward(params: Dict, cfg: EncoderConfig,
                       ref_ids, alt_ids, ref_attention_mask, alt_attention_mask,
                       train_encoder: bool = False,
                       dropout_rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Returns classification logits [B, num_classes]."""
    dtype = jnp.dtype(cfg.dtype)

    def enc(ids, mask):
        h = encoder_forward(params["encoder"], cfg, ids, mask)
        if not train_encoder:
            h = jax.lax.stop_gradient(h)
        return attention_pool(params["pooler"], h, mask)

    combined = jnp.concatenate([enc(ref_ids, ref_attention_mask),
                                enc(alt_ids, alt_attention_mask)], axis=-1)
    c = params["classifier"]
    x = combined @ c["fc1"]["kernel"].astype(dtype) + c["fc1"]["bias"].astype(dtype)
    x = jax.nn.relu(x)
    if dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 0.9, x.shape)
        x = jnp.where(keep, x / 0.9, 0.0)
    return (x @ c["fc2"]["kernel"].astype(dtype) + c["fc2"]["bias"].astype(dtype)).astype(jnp.float32)
