"""Vocab-chunked cross-entropy: logits never fully materialized in HBM.

The SFT loss over a 151936-token vocab is bandwidth-bound if the [B,T,V]
fp32 logits round-trip through HBM (reference relies on HF's dense CE,
dna_llm.py:237-242). Here the LM head matmul and the log-sum-exp are fused by
scanning over vocab chunks with an online (max, sumexp, gold) accumulator —
peak memory is [B*T, chunk] instead of [B*T, V].

Backward recomputes per-chunk logits from the saved (hidden, lse) and feeds
dlogits = (softmax - onehot) straight into the two matmuls, so the full
softmax matrix is never stored either. FLOPs are ~2x the naive CE's head
FLOPs (recompute), traded for ~V/chunk less HBM traffic — a win whenever the
head is bandwidth-bound (it is, at bf16 on v5e).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

DEFAULT_CHUNK = 8192


def _chunked_lse_and_gold(h, emb, targets, chunk):
    """h [N,H] (bf16 ok), emb [V,H], targets [N] -> (lse [N], gold [N])."""
    v = emb.shape[0]
    n_chunks = (v + chunk - 1) // chunk
    v_pad = n_chunks * chunk
    emb_p = jnp.pad(emb, ((0, v_pad - v), (0, 0)))

    def body(carry, ci):
        m, s, gold = carry
        w = jax.lax.dynamic_slice(emb_p, (ci * chunk, 0), (chunk, emb.shape[1]))
        logits = jnp.dot(h, w.T, preferred_element_type=jnp.float32)   # [N, chunk]
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + ci * chunk
        logits = jnp.where(col < v, logits, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
        s = s * jnp.exp(m - m_new) + jnp.sum(jnp.exp(logits - m_new[:, None]), axis=-1)
        local = targets - ci * chunk
        in_chunk = (local >= 0) & (local < chunk)
        safe = jnp.clip(local, 0, chunk - 1)
        g = jnp.take_along_axis(logits, safe[:, None], axis=-1)[:, 0]
        gold = jnp.where(in_chunk, g, gold)
        return (m_new, s, gold), None

    n = h.shape[0]
    init = (jnp.full((n,), -jnp.inf, jnp.float32),
            jnp.zeros((n,), jnp.float32),
            jnp.zeros((n,), jnp.float32))
    (m, s, gold), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return m + jnp.log(s), gold


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_softmax_xent(hidden, embedding, targets, ignore_index=-100,
                       chunk: int = DEFAULT_CHUNK,
                       need_embedding_grad: bool = False,
                       save_logits: bool = False):
    """Mean CE over valid targets. hidden [N,H], embedding [V,H] (tied LM
    head), targets [N] with ignore_index holes. Set need_embedding_grad=False
    (default) when the head/embedding is frozen (LoRA runs): the backward then
    skips the [V,H] grad accumulator entirely.

    `save_logits=True` stores max-shifted bf16 logits [N, V_pad] as a
    residual so the backward skips the logits recompute dot (halves CE-bwd
    matmul FLOPs in the frozen-head case) at ~2 bytes/logit of HBM — the
    classic remat-vs-store trade, worth it only where the supervised-gather
    path keeps N small (bench shape: N = B*K = 1024 -> 311 MB). The shift by
    the running row max keeps the stored values ~(logits - lse), where bf16
    rounding perturbs exp() by |x|*2^-8 — negligible exactly where probs are
    large (x ~ 0) and irrelevant where they are tiny (x << 0)."""
    loss, _ = _fwd(hidden, embedding, targets, ignore_index, chunk,
                   need_embedding_grad, save_logits)
    return loss


def _fwd(hidden, embedding, targets, ignore_index, chunk,
         need_embedding_grad=False, save_logits=False):
    valid = targets != ignore_index
    safe_t = jnp.where(valid, targets, 0)
    if save_logits:
        lse, gold, shifted, shifts = _chunked_lse_gold_logits(
            hidden, embedding, safe_t, chunk)
    else:
        lse, gold = _chunked_lse_and_gold(hidden, embedding, safe_t, chunk)
        shifted = shifts = None
    nll = (lse - gold) * valid
    denom = jnp.maximum(valid.sum(), 1)
    loss = nll.sum() / denom
    return loss, (hidden, embedding, safe_t, valid, lse, denom,
                  shifted, shifts)


def _chunked_lse_gold_logits(h, emb, targets, chunk):
    """_chunked_lse_and_gold that ALSO returns the per-chunk logits stored
    bf16 after subtracting the running row max at that chunk (`shifted`
    [n_chunks, N, chunk]) plus the fp32 maxes (`shifts` [n_chunks, N]), so
    logits = shifted + shifts and exp(logits - lse) is recomputable without
    the [N,chunk]x[chunk,H] dot."""
    v = emb.shape[0]
    n_chunks = (v + chunk - 1) // chunk
    v_pad = n_chunks * chunk
    emb_p = jnp.pad(emb, ((0, v_pad - v), (0, 0)))

    def body(carry, ci):
        m, s, gold = carry
        w = jax.lax.dynamic_slice(emb_p, (ci * chunk, 0), (chunk, emb.shape[1]))
        logits = jnp.dot(h, w.T, preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + ci * chunk
        logits = jnp.where(col < v, logits, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
        s = s * jnp.exp(m - m_new) + jnp.sum(jnp.exp(logits - m_new[:, None]), axis=-1)
        local = targets - ci * chunk
        in_chunk = (local >= 0) & (local < chunk)
        safe = jnp.clip(local, 0, chunk - 1)
        g = jnp.take_along_axis(logits, safe[:, None], axis=-1)[:, 0]
        gold = jnp.where(in_chunk, g, gold)
        # bf16 storage of (logits - running max): finite everywhere the
        # column is real; -inf pads clamp to the bf16 min, and the backward
        # re-masks cols >= v anyway
        shifted = jnp.maximum(logits - m_new[:, None], -1e30).astype(jnp.bfloat16)
        return (m_new, s, gold), (shifted, m_new)

    n = h.shape[0]
    init = (jnp.full((n,), -jnp.inf, jnp.float32),
            jnp.zeros((n,), jnp.float32),
            jnp.zeros((n,), jnp.float32))
    (m, s, gold), (shifted, shifts) = jax.lax.scan(body, init,
                                                   jnp.arange(n_chunks))
    return m + jnp.log(s), gold, shifted, shifts


def _bwd(ignore_index, chunk, need_embedding_grad, save_logits, res, g):
    hidden, embedding, safe_t, valid, lse, denom, shifted, shifts = res
    v, hdim = embedding.shape
    n = hidden.shape[0]
    scale = (g / denom) * valid                                    # [N]
    n_chunks = (v + chunk - 1) // chunk
    v_pad = n_chunks * chunk
    emb_p = jnp.pad(embedding, ((0, v_pad - v), (0, 0)))

    def body(carry, ci):
        w = jax.lax.dynamic_slice(emb_p, (ci * chunk, 0), (chunk, hdim))
        col = jax.lax.broadcasted_iota(jnp.int32, (n, chunk), 1) + ci * chunk
        if save_logits:
            logits = (shifted[ci].astype(jnp.float32) + shifts[ci][:, None])
        else:
            logits = jnp.dot(hidden, w.T, preferred_element_type=jnp.float32)
        probs = jnp.exp(jnp.where(col < v, logits, -jnp.inf) - lse[:, None])
        onehot = (col == safe_t[:, None]).astype(jnp.float32)
        dlogits = (probs - onehot) * scale[:, None]                 # [N, chunk]
        if need_embedding_grad:
            dh, demb = carry
            dw = jnp.dot(dlogits.T, hidden.astype(jnp.float32),
                         preferred_element_type=jnp.float32)        # [chunk, H]
            demb = jax.lax.dynamic_update_slice(
                demb, dw + jax.lax.dynamic_slice(demb, (ci * chunk, 0), (chunk, hdim)),
                (ci * chunk, 0))
            carry_out = (dh + jnp.dot(dlogits, w.astype(jnp.float32),
                                      preferred_element_type=jnp.float32), demb)
        else:
            dh = carry
            carry_out = dh + jnp.dot(dlogits, w.astype(jnp.float32),
                                     preferred_element_type=jnp.float32)
        return carry_out, None

    if need_embedding_grad:
        init = (jnp.zeros((n, hdim), jnp.float32),
                jnp.zeros((v_pad, hdim), jnp.float32))
        (dh, demb), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
        demb = demb[:v].astype(embedding.dtype)
    else:
        dh, _ = jax.lax.scan(body, jnp.zeros((n, hdim), jnp.float32),
                             jnp.arange(n_chunks))
        demb = jnp.zeros_like(embedding)
    return dh.astype(hidden.dtype), demb, None


fused_softmax_xent.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def chunked_token_logps(hidden, embedding, targets, chunk: int = DEFAULT_CHUNK,
                        need_embedding_grad: bool = False):
    """Per-token log p(target) without materializing [N,V] logits.

    hidden [N,H], embedding/head [V,H], targets [N] -> logps [N].
    The GRPO per-token-logp primitive (replaces the reference's
    selective_log_softmax over dense logits, demo_grpo.py:477-487) at
    151936-vocab scale.
    """
    logps, _ = _logps_fwd(hidden, embedding, targets, chunk, need_embedding_grad)
    return logps


def _logps_fwd(hidden, embedding, targets, chunk, need_embedding_grad):
    lse, gold = _chunked_lse_and_gold(hidden, embedding, targets, chunk)
    return gold - lse, (hidden, embedding, targets, lse)


def _logps_bwd(chunk, need_embedding_grad, res, g):
    hidden, embedding, targets, lse = res
    v, hdim = embedding.shape
    n = hidden.shape[0]
    n_chunks = (v + chunk - 1) // chunk
    v_pad = n_chunks * chunk
    emb_p = jnp.pad(embedding, ((0, v_pad - v), (0, 0)))

    def body(carry, ci):
        w = jax.lax.dynamic_slice(emb_p, (ci * chunk, 0), (chunk, hdim))
        logits = jnp.dot(hidden, w.T, preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + ci * chunk
        probs = jnp.exp(jnp.where(col < v, logits, -jnp.inf) - lse[:, None])
        onehot = (col == targets[:, None]).astype(jnp.float32)
        dlogits = (onehot - probs) * g[:, None]                    # [N, chunk]
        if need_embedding_grad:
            dh, demb = carry
            dw = jnp.dot(dlogits.T, hidden.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
            demb = jax.lax.dynamic_update_slice(
                demb, dw + jax.lax.dynamic_slice(demb, (ci * chunk, 0), (chunk, hdim)),
                (ci * chunk, 0))
            return (dh + jnp.dot(dlogits, w.astype(jnp.float32),
                                 preferred_element_type=jnp.float32), demb), None
        return carry + jnp.dot(dlogits, w.astype(jnp.float32),
                               preferred_element_type=jnp.float32), None

    if need_embedding_grad:
        (dh, demb), _ = jax.lax.scan(
            body, (jnp.zeros((n, hdim), jnp.float32),
                   jnp.zeros((v_pad, hdim), jnp.float32)), jnp.arange(n_chunks))
        demb = demb[:v].astype(embedding.dtype)
    else:
        dh, _ = jax.lax.scan(body, jnp.zeros((n, hdim), jnp.float32),
                             jnp.arange(n_chunks))
        demb = jnp.zeros_like(embedding)
    return dh.astype(hidden.dtype), demb, None


chunked_token_logps.defvjp(_logps_fwd, _logps_bwd)


def decoder_lm_loss(hidden, embedding, labels, ignore_index=-100,
                    chunk: int = DEFAULT_CHUNK, need_embedding_grad: bool = False,
                    save_logits: bool = False):
    """Shifted causal LM loss on final-norm hidden states [B,T,H] with a tied
    embedding head — drop-in for cross_entropy_loss(logits, labels) without
    the [B,T,V] logits."""
    b, t, hdim = hidden.shape
    h = hidden[:, :-1].reshape(-1, hdim)
    y = labels[:, 1:].reshape(-1)
    return fused_softmax_xent(h, embedding, y, ignore_index, chunk,
                              need_embedding_grad, save_logits)


def gather_label_positions(labels, bucket: int = 64):
    """Host-side: compress [B,T] labels to the supervised positions only.

    SFT batches supervise the assistant span — typically ~1/6 of the padded
    width — while the LM head runs the full 151936-vocab matmul at EVERY
    position. Returns (positions [B,K], targets [B,K], valid [B,K]) where
    positions index the hidden state PREDICTING each target (i.e. t for
    label t+1) and K is the max per-row count rounded up to `bucket` (stable
    jit shapes). Feed to `decoder_lm_loss_gathered`; the loss is numerically
    identical to `decoder_lm_loss`, at ~T/K of the head FLOPs.
    """
    import numpy as np
    labels = np.asarray(labels)
    shifted = labels[:, 1:]
    valid_bt = shifted != -100
    counts = valid_bt.sum(axis=1)
    k = max(int(counts.max()), 1)
    k = ((k + bucket - 1) // bucket) * bucket
    b = labels.shape[0]
    positions = np.zeros((b, k), np.int32)
    targets = np.zeros((b, k), np.int32)
    valid = np.zeros((b, k), np.int32)
    for i in range(b):
        idx = np.nonzero(valid_bt[i])[0]
        positions[i, :len(idx)] = idx          # hidden index t predicts t+1
        targets[i, :len(idx)] = shifted[i, idx]
        valid[i, :len(idx)] = 1
    return positions, targets, valid


def decoder_lm_loss_gathered(hidden, embedding, positions, targets, valid,
                             chunk: int = DEFAULT_CHUNK,
                             need_embedding_grad: bool = False,
                             save_logits: bool = False):
    """Shifted causal LM loss over pre-gathered supervised positions
    (see gather_label_positions). hidden [B,T,H]; positions/targets/valid
    [B,K]. Same mean-over-valid semantics as decoder_lm_loss."""
    b, t, hdim = hidden.shape
    h = jnp.take_along_axis(hidden, positions[..., None].astype(jnp.int32),
                            axis=1)                                 # [B,K,H]
    y = jnp.where(valid.astype(bool), targets, -100)
    return fused_softmax_xent(h.reshape(-1, hdim), embedding,
                              y.reshape(-1), -100, chunk,
                              need_embedding_grad, save_logits)

# ---------------------------------------------------------------------------
# Focal-weighted LM loss (detached weights)
# ---------------------------------------------------------------------------

def _focal_weighted_mean(logps, valid, gamma):
    """loss = sum(w * CE) / sum(w) with w = stop_grad((1 - p)^gamma).

    Detached focal weighting (Lin et al. 2017, weight-only variant): fitted
    tokens (p -> 1) contribute ~zero loss AND gradient, so optimization
    concentrates on the unfit ones. Exists for from-scratch SFT on
    template-heavy corpora: a KEGG reasoning span is ~250 deterministic
    template tokens plus ~4 input-dependent ones, and with plain mean-CE the
    informative gradient is ~1.5% of the batch signal — measured stuck at
    chance for 1800 steps at bench scale while val loss read 0.009
    (tools/diagnose_quality.py, r5). The weighted MEAN (not sum) keeps the
    step size on the laggards constant as the easy mass fits. gamma=0
    reduces exactly to mean CE. The reference has no counterpart (it
    finetunes pretrained towers where the template is already fit).
    """
    ce = -logps
    p = jnp.exp(jnp.minimum(logps, 0.0))
    w = jax.lax.stop_gradient((1.0 - p) ** gamma) * valid
    return (w * ce).sum() / jnp.maximum(w.sum(), 1e-6)


def decoder_lm_loss_focal(hidden, embedding, labels, gamma,
                          ignore_index=-100, chunk: int = DEFAULT_CHUNK,
                          need_embedding_grad: bool = False):
    """Focal-weighted variant of decoder_lm_loss (same shift semantics)."""
    b, t, hdim = hidden.shape
    h = hidden[:, :-1].reshape(-1, hdim)
    y = labels[:, 1:].reshape(-1)
    valid = (y != ignore_index).astype(jnp.float32)
    logps = chunked_token_logps(h, embedding, jnp.where(y == ignore_index, 0, y),
                                chunk, need_embedding_grad)
    return _focal_weighted_mean(logps, valid, gamma)


def decoder_lm_loss_focal_gathered(hidden, embedding, positions, targets,
                                   valid, gamma, chunk: int = DEFAULT_CHUNK,
                                   need_embedding_grad: bool = False):
    """Focal-weighted variant of decoder_lm_loss_gathered."""
    b, t, hdim = hidden.shape
    h = jnp.take_along_axis(hidden, positions[..., None].astype(jnp.int32),
                            axis=1)                                 # [B,K,H]
    logps = chunked_token_logps(h.reshape(-1, hdim), embedding,
                                targets.reshape(-1), chunk,
                                need_embedding_grad)
    return _focal_weighted_mean(logps, valid.reshape(-1).astype(jnp.float32),
                                gamma)
