"""Evo2/StripedHyena-2 operator + importer parity.

The reference binds to the `evo2` package (CUDA/FP8 kernels,
/root/reference/bioreason/models/dna_llm.py:86-90); no checkpoint assets
exist in this environment, so parity is pinned two ways:

  1. an independent NumPy (fp64) oracle of the SH2 block math — gated conv
     with short depthwise filter, se/mr/li filter flavors (explicit,
     decay-modulated, modal implicit), D skip, gated gelu MLP;
  2. the vortex-style weight importer (utils/hf_import.import_evo2):
     handcrafted `blocks.N.*` state dict -> params -> forward must match the
     oracle, including the complex-pole -> (logit-magnitude, phase)
     conversion and the fused Wqkv split.

Also checks causality of every flavor and the `blocks.N.mlp.l3` tap
(pre-residual MLP output, the reference's forward-hook semantics,
dna_llm.py:127-146).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bioreason_tpu.config import HyenaConfig
from bioreason_tpu.models.evo2 import hyena_forward, init_hyena
from bioreason_tpu.utils.hf_import import import_evo2

D, I, V, HEADS, T, B = 16, 24, 32, 2, 12, 2
SHORT, SE_LEN, MR_LEN, ORDER = 3, 5, 8, 3
FLAVORS = ("se", "mr", "li", "attn")


def _make_vortex_state(seed=0, vocab=V):
    rng = np.random.default_rng(seed)

    def w(*shape, s=0.25):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    state = {"embedding_layer.weight": w(vocab, D), "norm.scale": 1 + 0.1 * w(D)}
    for i, fl in enumerate(FLAVORS):
        p = f"blocks.{i}"
        state[f"{p}.pre_norm.scale"] = 1 + 0.1 * w(D)
        state[f"{p}.post_norm.scale"] = 1 + 0.1 * w(D)
        state[f"{p}.mlp.l1.weight"] = w(I, D)
        state[f"{p}.mlp.l2.weight"] = w(I, D)
        state[f"{p}.mlp.l3.weight"] = w(D, I)
        if fl == "attn":
            state[f"{p}.inner_mha_cls.Wqkv.weight"] = w(3 * D, D)
            state[f"{p}.inner_mha_cls.out_proj.weight"] = w(D, D)
            continue
        state[f"{p}.projections.weight"] = w(3 * D, D)
        state[f"{p}.filter.short_filter_weight"] = w(3 * D, 1, SHORT)
        state[f"{p}.filter.D"] = w(D)
        state[f"{p}.out_filter_dense.weight"] = w(D, D)
        if fl == "se":
            state[f"{p}.filter.h"] = w(D, SE_LEN)
        elif fl == "mr":
            state[f"{p}.filter.h"] = w(D, MR_LEN)
            state[f"{p}.filter.decay"] = np.exp(
                -np.abs(w(D, 1)) * np.arange(MR_LEN)[None]).astype(np.float32)
        else:  # li: raw complex poles inside the unit disk + residues
            mag = rng.uniform(0.3, 0.95, (D, ORDER))
            ang = rng.uniform(-np.pi, np.pi, (D, ORDER))
            poles = np.stack([mag * np.cos(ang), mag * np.sin(ang)], -1)
            state[f"{p}.filter.poles"] = poles[:, :, None, :].astype(np.float32)
            state[f"{p}.filter.residues"] = w(D, ORDER, 1, 2, s=0.3)
    return state


# --------------------------- NumPy oracle (fp64) ---------------------------

def _rms(x, scale, eps=1e-6):
    return x / np.sqrt((x ** 2).mean(-1, keepdims=True) + eps) * scale


def _causal_conv_np(x, h):
    """x [B,T,C], h [C,L] -> direct causal depthwise conv (unambiguous loop)."""
    _, t, _ = x.shape
    l = h.shape[-1]
    out = np.zeros_like(x)
    for ti in range(t):
        for tau in range(min(l, ti + 1)):
            out[:, ti] += x[:, ti - tau] * h[:, tau]
    return out


def _li_taps_np(poles, residues, t_len):
    """Raw complex poles/residues -> filter taps, fp64."""
    poles = poles.reshape(poles.shape[0], poles.shape[1], 2)
    residues = residues.reshape(residues.shape[0], residues.shape[1], 2)
    pc = poles[..., 0] + 1j * poles[..., 1]
    rc = residues[..., 0] + 1j * residues[..., 1]
    t = np.arange(t_len)
    taps = np.real((rc[..., None] * pc[..., None] ** t[None, None])).sum(1)
    return taps  # [C, T]


def _oracle_forward(state, ids, tap=None):
    h = state["embedding_layer.weight"][ids].astype(np.float64)
    b, t, _ = h.shape
    tapped = None
    for i, fl in enumerate(FLAVORS):
        p = f"blocks.{i}"
        x = _rms(h, state[f"{p}.pre_norm.scale"])
        if fl == "attn":
            wqkv = state[f"{p}.inner_mha_cls.Wqkv.weight"]
            q = (x @ wqkv[:D].T).reshape(b, t, HEADS, D // HEADS)
            k = (x @ wqkv[D:2 * D].T).reshape(b, t, HEADS, D // HEADS)
            v = (x @ wqkv[2 * D:].T).reshape(b, t, HEADS, D // HEADS)

            def rope(z, theta=10000.0):
                d = z.shape[-1]
                inv = 1.0 / (theta ** (np.arange(0, d, 2) / d))
                ang = np.arange(t)[:, None] * inv[None]
                cos, sin = np.cos(ang)[None, :, None], np.sin(ang)[None, :, None]
                z1, z2 = np.split(z, 2, -1)
                return np.concatenate([z1 * cos - z2 * sin, z2 * cos + z1 * sin], -1)

            q, k = rope(q), rope(k)
            logits = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(D // HEADS)
            mask = np.tril(np.ones((t, t), bool))
            logits = np.where(mask[None, None], logits, -1e30)
            probs = np.exp(logits - logits.max(-1, keepdims=True))
            probs /= probs.sum(-1, keepdims=True)
            a = np.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, D)
            h = h + a @ state[f"{p}.inner_mha_cls.out_proj.weight"].T
        else:
            z = x @ state[f"{p}.projections.weight"].T
            sf = state[f"{p}.filter.short_filter_weight"][:, 0, :]
            z = _causal_conv_np(z, sf)
            x2, x1, v = np.split(z, 3, axis=-1)
            g = x1 * v
            if fl == "se":
                taps = state[f"{p}.filter.h"]
            elif fl == "mr":
                taps = state[f"{p}.filter.h"] * state[f"{p}.filter.decay"]
            else:
                taps = _li_taps_np(state[f"{p}.filter.poles"],
                                   state[f"{p}.filter.residues"], t)
            inner = _causal_conv_np(g, taps) + g * state[f"{p}.filter.D"]
            y = x2 * inner
            h = h + y @ state[f"{p}.out_filter_dense.weight"].T

        x = _rms(h, state[f"{p}.post_norm.scale"])
        from scipy.special import erf
        gelu = lambda z: 0.5 * z * (1 + erf(z / np.sqrt(2)))
        g1 = gelu(x @ state[f"{p}.mlp.l1.weight"].T)
        u1 = x @ state[f"{p}.mlp.l2.weight"].T
        mlp_out = (g1 * u1) @ state[f"{p}.mlp.l3.weight"].T
        h = h + mlp_out
        if tap is not None and i == tap:
            tapped = mlp_out
    if tapped is not None:
        return tapped
    return _rms(h, state["norm.scale"])


def _cfg(tap=-1):
    return HyenaConfig(
        vocab_size=V, hidden_size=D, intermediate_size=I, num_layers=len(FLAVORS),
        num_heads=HEADS, short_filter_len=SHORT, se_filter_len=SE_LEN,
        medium_filter_len=MR_LEN, li_order=ORDER, layer_flavors=FLAVORS,
        mlp_activation="gelu", remat=False, attention_impl="xla",
        dtype="float32", embedding_tap_layer=tap)


class TestEvo2Import:
    @pytest.fixture(scope="class")
    def imported(self):
        state = _make_vortex_state()
        params, flavors = import_evo2(state)
        return state, params, flavors

    def test_flavor_derivation(self, imported):
        _, _, flavors = imported
        assert flavors == FLAVORS

    def test_forward_matches_numpy_oracle(self, imported):
        state, params, _ = imported
        ids = np.random.default_rng(1).integers(0, V, (B, T)).astype(np.int32)
        oracle = _oracle_forward(state, ids)
        params = jax.tree.map(jnp.asarray, params)
        with jax.default_matmul_precision("highest"):
            got = hyena_forward(params, _cfg(), jnp.asarray(ids))
        np.testing.assert_allclose(np.asarray(got), oracle, atol=1e-4, rtol=1e-4)

    def test_tap_is_preresidual_mlp_output(self, imported):
        """blocks.N.mlp.l3 tap == that Linear's output (forward-hook
        semantics), NOT the post-residual hidden state."""
        state, params, _ = imported
        ids = np.random.default_rng(2).integers(0, V, (B, T)).astype(np.int32)
        oracle = _oracle_forward(state, ids, tap=2)
        params = jax.tree.map(jnp.asarray, params)
        with jax.default_matmul_precision("highest"):
            got = hyena_forward(params, _cfg(tap=2), jnp.asarray(ids))
        np.testing.assert_allclose(np.asarray(got), oracle, atol=1e-4, rtol=1e-4)

    def test_every_flavor_is_causal(self):
        """Changing tokens at position >= t must not affect outputs < t,
        for each operator flavor (se conv, mr fft conv, li modal fft conv,
        attention)."""
        cfg = _cfg()
        params = init_hyena(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(3)
        ids = rng.integers(0, V, (1, T)).astype(np.int32)
        out1 = np.asarray(hyena_forward(params, cfg, jnp.asarray(ids)))
        ids2 = ids.copy()
        ids2[0, T // 2:] = (ids2[0, T // 2:] + 1) % V
        out2 = np.asarray(hyena_forward(params, cfg, jnp.asarray(ids2)))
        np.testing.assert_allclose(out1[0, :T // 2], out2[0, :T // 2],
                                   atol=1e-5, rtol=1e-5)
        assert np.abs(out1[0, T // 2:] - out2[0, T // 2:]).max() > 1e-6

    def test_li_filter_gradients_finite(self):
        """Modal-filter params train: grads flow through the FFT conv and the
        pole materialization without NaNs."""
        cfg = _cfg()
        params = init_hyena(jax.random.PRNGKey(1), cfg)
        ids = np.random.default_rng(4).integers(0, V, (B, T)).astype(np.int32)

        def loss(p):
            return (hyena_forward(p, cfg, jnp.asarray(ids)) ** 2).mean()

        grads = jax.grad(loss)(params)
        leaves = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        li_block = grads["blocks"][2]["hyena"]["filter"]
        assert np.abs(np.asarray(li_block["poles"])).max() > 0
        assert np.abs(np.asarray(li_block["residues"])).max() > 0


class TestEvo2PretrainedFusion:
    def test_end_to_end_evo2_fusion(self, tmp_path):
        """Evo2 checkpoint dir -> load_pretrained_fusion(evo2_dir=...) ->
        fused forward with the char tokenizer and the mlp.l3 tap (the
        reference's Evo2 configuration, sh_train_dna_qwen.sh Evo2 runs)."""
        import torch
        import tests.test_pretrained as tp
        from bioreason_tpu.utils.pretrained import load_pretrained_fusion
        from bioreason_tpu.data import BioProcessor
        from bioreason_tpu.models.fusion import fusion_forward

        qwen_dir = str(tmp_path / "qwen"); (tmp_path / "qwen").mkdir()
        tp._make_qwen3_dir(qwen_dir)
        evo_dir = str(tmp_path / "evo2"); (tmp_path / "evo2").mkdir()
        state = _make_vortex_state(vocab=512)   # byte-level char tokenizer ids
        torch.save({k: torch.tensor(v) for k, v in state.items()},
                   evo_dir + "/evo2_tiny.pt")

        cfg, params, tok, dna_tok = load_pretrained_fusion(
            qwen_dir, max_length_text=1024, max_length_dna=32,
            evo2_dir=evo_dir, dna_embedding_layer=2)
        assert cfg.encoder_kind == "evo2"
        assert cfg.hyena.layer_flavors == FLAVORS
        assert cfg.hyena.embedding_tap_layer == 2
        assert dna_tok.pad_id == 1              # char tokenizer pad parity

        proc = BioProcessor(tok, dna_tok)
        out = proc(text=["<|im_start|>user\n<|dna_start|><|dna_pad|><|dna_end|>"
                         " q<|im_end|>\n<|im_start|>assistant\n"],
                   batch_dna_sequences=[["ACGTACGTAC"]],
                   max_length_text=1024, max_length_dna=32)
        import jax.numpy as jnp
        logits, _ = fusion_forward(
            params, cfg, jnp.asarray(out.input_ids),
            jnp.asarray(out.attention_mask), jnp.asarray(out.dna_input_ids),
            jnp.asarray(out.dna_attention_mask))
        assert np.isfinite(np.asarray(logits)).all()


class TestEvo2Int8:
    def test_quantized_evo2_forward_close(self):
        """int8 storage composes with the Evo2 tower: dense kernels quantize
        (consumed via layers.dense), hyena filter params (h/poles/residues,
        non-'kernel' leaves) stay float; forward stays close to fp32."""
        import jax
        import jax.numpy as jnp
        from bioreason_tpu.models.evo2 import init_hyena, hyena_forward
        from bioreason_tpu.train.quant import quantize_frozen_int8

        cfg = _cfg()
        params = init_hyena(jax.random.PRNGKey(0), cfg)
        q = quantize_frozen_int8({"encoder": params})["encoder"]
        # filters untouched, projections quantized
        blk = next(b for b in q["blocks"] if "hyena" in b)
        assert isinstance(blk["hyena"]["in_proj"]["kernel"], dict)
        assert not isinstance(blk["hyena"]["short_filter"], dict)
        assert not any(isinstance(v, dict) and "q" in v
                       for v in blk["hyena"]["filter"].values())
        ids = np.random.default_rng(0).integers(0, V, (2, 16)).astype(np.int32)
        mask = np.ones((2, 16), np.int32)
        ref = hyena_forward(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
        got = hyena_forward(q, cfg, jnp.asarray(ids), jnp.asarray(mask))
        err = float(jnp.abs(got.astype(jnp.float32)
                            - ref.astype(jnp.float32)).max())
        scale = float(jnp.abs(ref.astype(jnp.float32)).max())
        assert err < 0.05 * scale + 0.05, (err, scale)
