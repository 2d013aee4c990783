"""Reference-format SFT checkpoint ingestion (utils/ref_ckpt.py).

The round-trip gate VERDICT r2 asked for: export a repo SFT tree to the
reference DNALLMModel.state_dict() layout (reason.py:422-540 formats),
re-ingest, bit-identical.
"""

import numpy as np
import pytest

import jax

from bioreason_tpu.config import FusionConfig
from bioreason_tpu.data import ByteTextTokenizer
from bioreason_tpu.models import init_fusion
from bioreason_tpu.utils.ref_ckpt import (export_reference_sft,
                                          load_reference_sft,
                                          split_reference_state)

TOK = ByteTextTokenizer()


@pytest.fixture(scope="module")
def tree_and_cfg():
    cfg = FusionConfig.tiny(text_vocab=TOK.vocab_size,
                            dna_pad_token_id=TOK.dna_pad_id)
    params = jax.tree.map(np.asarray,
                          init_fusion(jax.random.PRNGKey(0), cfg))
    return params, cfg


def _assert_trees_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), f"{path}: {set(a)} != {set(b)}"
        for k in a:
            _assert_trees_equal(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32),
                                      err_msg=path)


class TestRoundTrip:
    def test_raw_state_dict_roundtrip(self, tree_and_cfg, tmp_path):
        """format #3: raw DNALLMModel.state_dict() file -> bit-identical."""
        import torch
        params, cfg = tree_and_cfg
        flat = export_reference_sft(params, cfg)
        f = tmp_path / "pytorch_model.bin"
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in flat.items()}, str(f))
        back = load_reference_sft(str(f), cfg)
        for comp in ("decoder", "encoder", "dna_projection"):
            _assert_trees_equal(params[comp], back[comp], comp)

    def test_lightning_deepspeed_roundtrip(self, tree_and_cfg, tmp_path):
        """format #2: Lightning container + _forward_module.model. prefixes
        (the DeepSpeed-strategy dump reason.py:456 strips)."""
        import torch
        params, cfg = tree_and_cfg
        flat = export_reference_sft(params, cfg, lightning=True)
        f = tmp_path / "epoch=2.ckpt"
        torch.save({"state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                                   for k, v in flat.items()}}, str(f))
        back = load_reference_sft(str(f), cfg)
        for comp in ("decoder", "encoder", "dna_projection"):
            _assert_trees_equal(params[comp], back[comp], comp)


class TestPeftMerge:
    def test_lora_keys_merge_into_base(self, tree_and_cfg):
        """PEFT-wrapped keys (text_model.base_model.model...base_layer /
        lora_A/lora_B) merge as W += scale * B@A — functional
        merge_and_unload (reason.py:446)."""
        params, cfg = tree_and_cfg
        flat = export_reference_sft(params, cfg)
        h = cfg.decoder.hidden_size
        qdim = cfg.decoder.num_heads * cfg.decoder.head_dim
        rng = np.random.default_rng(0)
        r = 2
        A = rng.normal(size=(r, h)).astype(np.float32)      # [r, in]
        B = rng.normal(size=(qdim, r)).astype(np.float32)   # [out, r]
        key = "text_model.model.layers.0.self_attn.q_proj"
        wrapped = {}
        for k, v in flat.items():
            if k == f"{key}.weight":
                pk = key.replace("text_model.", "text_model.base_model.model.")
                wrapped[f"{pk}.base_layer.weight"] = v
                wrapped[f"{pk}.lora_A.default.weight"] = A
                wrapped[f"{pk}.lora_B.default.weight"] = B
            else:
                wrapped[k] = v
        comps = split_reference_state(wrapped, lora_scale=0.5)
        got = comps["text_model"][f"model.layers.0.self_attn.q_proj.weight"]
        want = flat[f"{key}.weight"] + 0.5 * (B @ A)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_non_tower_keys_ignored(self, tree_and_cfg):
        params, cfg = tree_and_cfg
        flat = export_reference_sft(params, cfg)
        flat["optimizer.state.step"] = np.zeros(1)
        flat["lr_schedulers"] = np.zeros(1)
        comps = split_reference_state(flat)
        assert set(comps) == {"text_model", "dna_model", "dna_projection"}
