"""Shared neural-net building blocks (pure-functional, param-pytree style).

Params are plain nested dicts of jnp arrays; every block has an `init_*`
function returning the param subtree and an apply function taking it. Master
params stay float32; compute happens in the config dtype (bf16 on TPU).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def dense_init(rng, in_dim: int, out_dim: int, scale: Optional[float] = None,
               bias: bool = False):
    """He/LeCun-style normal init (stddev 1/sqrt(in_dim) unless overridden).

    `bias=True` adds a zero-initialized bias leaf — needed to represent real
    HF ESM/NT-v2 checkpoints, whose q/k/v/o and MLP denses carry biases
    (reference loads them via AutoModelForMaskedLM, dna_llm.py:79-83)."""
    std = scale if scale is not None else in_dim ** -0.5
    p = {"kernel": jax.random.normal(rng, (in_dim, out_dim), jnp.float32) * std}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), jnp.float32)
    return p


def _w8a8_dot(x, kern, dtype):
    """W8A8 matmul on the int8 MXU path (v5e: 394 int8 TOPS vs 197 bf16
    TFLOP/s): dynamic symmetric per-token activation quantization against
    the kernel's static per-output-channel scales —
    y = (x_q @ w_q) * (sx * sw), the standard vLLM int8 serving scheme.
    Exact rescale (scales factor out of the dot); quantization error is the
    opt-in serving accuracy trade (DecoderConfig.act_int8)."""
    sx = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32) / 127.0
    sx = jnp.maximum(sx, 1e-12)
    xq = jnp.clip(jnp.rint(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    yi = jax.lax.dot_general(xq, kern["q"],
                             (((xq.ndim - 1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    # apply the fp32 scales to the int32 accumulator BEFORE the dtype cast:
    # yi reaches ~1.6e7, so casting to bf16 first would add ~2^-8 relative
    # rounding on top of the quantization error for no benefit
    y = yi.astype(jnp.float32) * sx * kern["scale"][..., 0, :].astype(jnp.float32)
    return y.astype(dtype)


def dense(params, x, dtype=jnp.bfloat16, lora_dropout=None, act8=False):
    """Linear layer; adds a bias when the param dict carries a `bias` leaf and
    transparently applies a LoRA adapter when it carries `lora_a`/`lora_b`
    leaves (see train/lora.py): y = x@W [+ b] + (x@A)@B * scale.

    `lora_dropout`: optional (rng_key, rate) applying inverted dropout to the
    ADAPTER input only (PEFT lora_dropout semantics; reference uses 0.05,
    train_dna_qwen.py LoraConfig).

    Frozen kernels may be stored int8 (see train/quant.py): a dict
    {"q": int8 [..,in,out], "scale": f32 [..,1,out]} is dequantized to the
    compute dtype here — inside the layer scan, so peak HBM holds one
    layer's bf16 copy while the resident weights stay at half bf16 size.
    `act8=True` (serving opt-in, cfg.act_int8) instead quantizes the
    activations per token and runs the dot on the int8 MXU (_w8a8_dot)."""
    x = x.astype(dtype)
    kern = params["kernel"]
    if isinstance(kern, dict):
        if act8:
            y = _w8a8_dot(x, kern, dtype)
        else:
            w = kern["q"].astype(dtype) * kern["scale"].astype(dtype)
            y = x @ w
    else:
        w = kern.astype(dtype)
        y = x @ w
    if "bias" in params:
        y = y + params["bias"].astype(dtype)
    d = lora_delta(params, x, dtype, lora_dropout)
    return y if d is None else y + d


def lora_delta(params, x, dtype=jnp.bfloat16, lora_dropout=None):
    """The LoRA adapter contribution (x@A)@B * scale, or None when `params`
    carries no adapter. Split out of `dense` so fused-projection layouts
    (fuse_projections: base kernels concatenated into one qkv/gateup leaf,
    adapters left per-projection) can apply adapters to the split outputs."""
    if not params or "lora_a" not in params:
        return None
    a = params["lora_a"].astype(dtype)
    b = params["lora_b"].astype(dtype)
    xl = x.astype(dtype)
    if lora_dropout is not None:
        key, rate = lora_dropout
        keep = jax.random.bernoulli(key, 1.0 - rate, xl.shape)
        xl = jnp.where(keep, xl / (1.0 - rate), jnp.zeros_like(xl))
    return ((xl @ a) @ b) * params["lora_scale"].astype(dtype)


def qkv_proj(attn, x, dtype, q_dim: int, kv_dim: int,
             drops=(None, None, None), act8=False):
    """Attention input projections -> (q, k, v) [..., q_dim/kv_dim/kv_dim].

    Takes the FUSED path when the param dict carries a `qkv` leaf
    (fuse_projections): one [in, q_dim+2*kv_dim] dot instead of three
    small-N dots — small-N matmuls underfill the MXU pipeline (measured on
    v5e: a [16k,1024]x[1024,1024] dot runs ~4x slower per FLOP than
    [16k,1024]x[1024,3072]), so widening N is pure win for prefill/training.
    Per-projection LoRA adapters stay unfused and are added to the splits."""
    if "qkv" in attn:
        y = dense(attn["qkv"], x, dtype, None, act8)
        q = y[..., :q_dim]
        k = y[..., q_dim:q_dim + kv_dim]
        v = y[..., q_dim + kv_dim:q_dim + 2 * kv_dim]
        outs = []
        for name, base, dr in (("q", q, drops[0]), ("k", k, drops[1]),
                               ("v", v, drops[2])):
            d = lora_delta(attn.get(name), x, dtype, dr)
            outs.append(base if d is None else base + d)
        return tuple(outs)
    return (dense(attn["q"], x, dtype, drops[0], act8),
            dense(attn["k"], x, dtype, drops[1], act8),
            dense(attn["v"], x, dtype, drops[2], act8))


def embed_init(rng, vocab: int, dim: int, std: float = 0.02):
    return {"embedding": jax.random.normal(rng, (vocab, dim), jnp.float32) * std}


def embed(params, ids, dtype=jnp.bfloat16):
    e = params["embedding"]
    if isinstance(e, dict):
        # int8 embedding (train/quant.py, per-vocab-row scales): gather int8
        # rows, then rescale — reads 1/2 the bytes of bf16
        rows = jnp.take(e["q"], ids, axis=0).astype(dtype)
        scale = jnp.take(e["scale"], ids, axis=0).astype(dtype)     # [..., 1]
        return rows * scale
    return jnp.take(e.astype(dtype), ids, axis=0)


def lm_logits(dec_params, h):
    """Vocabulary logits from final hidden states [B, T, H] -> [B, T, V] f32.

    Handles the tied-embedding and separate-lm_head layouts, each in float
    or int8 ({"q", "scale"}) storage; for int8 the scale is applied to the
    f32 logits AFTER the matmul (per-vocab-channel), so the int8 weights
    stream straight into the MXU operand conversion."""
    if "lm_head" in dec_params:
        kern = dec_params["lm_head"]["kernel"]
        if isinstance(kern, dict):
            logits = jnp.einsum("bth,hv->btv", h, kern["q"].astype(h.dtype),
                                preferred_element_type=jnp.float32)
            return logits * kern["scale"].reshape(-1).astype(jnp.float32)
        return jnp.einsum("bth,hv->btv", h, kern.astype(h.dtype),
                          preferred_element_type=jnp.float32)
    e = dec_params["embed"]["embedding"]
    if isinstance(e, dict):
        logits = jnp.einsum("bth,vh->btv", h, e["q"].astype(h.dtype),
                            preferred_element_type=jnp.float32)
        return logits * e["scale"].reshape(-1).astype(jnp.float32)
    return jnp.einsum("bth,vh->btv", h, e.astype(h.dtype),
                      preferred_element_type=jnp.float32)


def rmsnorm_init(dim: int):
    return {"scale": jnp.ones((dim,), jnp.float32)}


def rmsnorm(params, x, eps: float = 1e-6):
    """RMSNorm computed in fp32, returned in the input dtype."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(var + eps)
    return (y * params["scale"]).astype(dtype)


def layernorm_init(dim: int):
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def layernorm(params, x, eps: float = 1e-12):
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * params["scale"] + params["bias"]).astype(dtype)


def swiglu_init(rng, dim: int, hidden: int, bias: bool = False):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {"gate": dense_init(k1, dim, hidden, bias=bias),
            "up": dense_init(k2, dim, hidden, bias=bias),
            "down": dense_init(k3, hidden, dim, bias=bias)}


def swiglu(params, x, dtype=jnp.bfloat16, lora_dropout=None, act8=False):
    def drop(i):
        if lora_dropout is None:
            return None
        key, rate = lora_dropout
        return (jax.random.fold_in(key, i), rate)
    if "gateup" in params:
        # fused gate+up (fuse_projections): one 2*hidden-wide dot; LoRA
        # adapters stay per-projection on the splits (see qkv_proj)
        y = dense(params["gateup"], x, dtype, None, act8)
        g, u = jnp.split(y, 2, axis=-1)
        dg = lora_delta(params.get("gate"), x, dtype, drop(0))
        du = lora_delta(params.get("up"), x, dtype, drop(1))
        g = g if dg is None else g + dg
        u = u if du is None else u + du
    else:
        g = dense(params["gate"], x, dtype, drop(0), act8)
        u = dense(params["up"], x, dtype, drop(1), act8)
    return dense(params["down"], jax.nn.silu(g) * u, dtype, drop(2), act8)


def moe_init(rng, dim: int, num_experts: int, hidden: int):
    """Mixture-of-Experts FFN (Qwen3-MoE family): linear router + a bank of
    SwiGLU experts stored as stacked [E, in, out] kernels (one leaf per
    projection, so expert parallelism is just a PartitionSpec on axis 0)."""
    kr, kg, ku, kd = jax.random.split(rng, 4)
    std_in, std_h = dim ** -0.5, hidden ** -0.5
    return {
        "router": dense_init(kr, dim, num_experts),
        "experts": {
            "gate": jax.random.normal(kg, (num_experts, dim, hidden), jnp.float32) * std_in,
            "up": jax.random.normal(ku, (num_experts, dim, hidden), jnp.float32) * std_in,
            "down": jax.random.normal(kd, (num_experts, hidden, dim), jnp.float32) * std_h,
        },
    }


def moe_apply(params, x, top_k: int, norm_topk_prob: bool = True,
              dtype=jnp.bfloat16, capacity_factor: float = 1.25):
    """GShard-style capacity-based MoE dispatch (the canonical TPU/GSPMD
    formulation: dispatch/combine one-hot einsums, experts batched on a
    leading E axis that shards over the 'model' mesh axis).

    Router math mirrors HF Qwen3MoeSparseMoeBlock: softmax over ALL experts
    in fp32, top-k, optional re-normalization of the kept probabilities
    (`norm_topk_prob`). Tokens beyond an expert's capacity
    C = ceil(capacity_factor * k * N / E) are dropped (contribute zero) —
    set capacity_factor >= E/k for provably-lossless routing."""
    b, t, h = x.shape
    n = b * t
    xf = x.reshape(n, h).astype(dtype)
    gate_bank = params["experts"]["gate"]
    e = (gate_bank["q"] if isinstance(gate_bank, dict) else gate_bank).shape[0]

    logits = dense(params["router"], xf, dtype)                  # [N, E]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    vals, idx = jax.lax.top_k(probs, top_k)                      # [N, k]
    if norm_topk_prob:
        vals = vals / jnp.maximum(vals.sum(-1, keepdims=True), 1e-9)

    onehot = jax.nn.one_hot(idx, e, dtype=jnp.float32)           # [N, k, E]
    assign = onehot.sum(1)                                       # [N, E] 0/1
    gates = (onehot * vals[..., None]).sum(1)                    # [N, E]

    cap = max(top_k, int(np.ceil(capacity_factor * top_k * n / e)))
    pos = jnp.cumsum(assign, axis=0) - 1.0                       # [N, E]
    keep = assign * (pos < cap)
    disp = jax.nn.one_hot(pos.astype(jnp.int32), cap, dtype=dtype) \
        * keep[..., None].astype(dtype)                          # [N, E, C]

    def bank(name):
        # expert banks may be int8-stored (train/quant.py: per-(expert,
        # out-channel) scales); the convert+rescale fuses into the einsum
        node = params["experts"][name]
        if isinstance(node, dict):
            return node["q"].astype(dtype) * node["scale"].astype(dtype)
        return node.astype(dtype)

    ein = jnp.einsum("nec,nh->ech", disp, xf)                    # [E, C, H]
    g = jnp.einsum("ech,ehi->eci", ein, bank("gate"))
    u = jnp.einsum("ech,ehi->eci", ein, bank("up"))
    y = jax.nn.silu(g) * u
    oe = jnp.einsum("eci,eih->ech", y, bank("down"))             # [E, C, H]
    comb = (disp.astype(jnp.float32) * gates[..., None]).astype(dtype)
    out = jnp.einsum("nec,ech->nh", comb, oe)
    return out.reshape(b, t, h)


def gelu_mlp_init(rng, dim: int, hidden: int, bias: bool = False):
    k1, k2 = jax.random.split(rng)
    return {"up": dense_init(k1, dim, hidden, bias=bias),
            "down": dense_init(k2, hidden, dim, bias=bias)}


def gelu_mlp(params, x, dtype=jnp.bfloat16, lora_dropout=None, act8=False):
    # exact (erf) gelu: HF ESM uses F.gelu default, not the tanh approximation
    if lora_dropout is not None:
        key, rate = lora_dropout
        drop_up = (jax.random.fold_in(key, 0), rate)
        drop_down = (jax.random.fold_in(key, 1), rate)
    else:
        drop_up = drop_down = None
    up = dense(params["up"], x, dtype, drop_up, act8)
    return dense(params["down"], jax.nn.gelu(up, approximate=False), dtype,
                 drop_down, act8)


# ---------------------------------------------------------------------------
# Rotary position embeddings (NeoX rotate-half convention, used by both Qwen3
# and the NT/ESM rotary variant).
# ---------------------------------------------------------------------------

def rope_frequencies(head_dim: int, theta: float) -> jnp.ndarray:
    return 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))


def apply_rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """x: [B, T, n_heads, head_dim]; positions: [B, T] int32."""
    head_dim = x.shape[-1]
    freqs = rope_frequencies(head_dim, theta)                       # [hd/2]
    angles = positions[..., None].astype(jnp.float32) * freqs       # [B, T, hd/2]
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def remat(fn, cfg):
    """Per-layer rematerialization wrapper honoring cfg.remat/remat_policy:
    'full' recomputes everything (min memory), 'dots' saves matmul outputs
    and recomputes only elementwise ops (near remat-off speed at a fraction
    of the activation memory — the HBM/FLOPs trade on the MXU)."""
    if not cfg.remat:
        return fn
    if getattr(cfg, "remat_policy", "full") == "dots":
        return jax.checkpoint(
            fn, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    return jax.checkpoint(fn)


def positions_from_mask(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """Position ids robust to LEFT padding: cumsum of the mask minus one,
    clipped at zero (pads get position 0 but are masked out anyway)."""
    return jnp.clip(jnp.cumsum(attention_mask, axis=-1) - 1, 0, None).astype(jnp.int32)
