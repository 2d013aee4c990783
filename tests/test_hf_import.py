import jax
import numpy as np

from bioreason_tpu.config import DecoderConfig
from bioreason_tpu.models import init_decoder, decoder_forward
from bioreason_tpu.utils.hf_import import (import_qwen3, export_decoder_to_hf,
                                           import_with_map, NT_V2_RULES)
import jax.numpy as jnp


def test_qwen3_roundtrip_preserves_forward():
    cfg = DecoderConfig.tiny()
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    hf_state = export_decoder_to_hf(params, cfg)
    # HF convention check: projection weights are [out, in]
    assert hf_state["model.layers.0.self_attn.q_proj.weight"].shape == (
        cfg.num_heads * cfg.head_dim, cfg.hidden_size)
    reimported = import_qwen3(hf_state, cfg)
    ids = jnp.arange(10)[None, :] % cfg.vocab_size
    l1, _ = decoder_forward(params, cfg, input_ids=ids)
    l2, _ = decoder_forward(reimported, cfg, input_ids=ids)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_generic_map_importer_stacks_layers():
    rng = np.random.default_rng(0)
    state = {
        "esm.embeddings.word_embeddings.weight": rng.normal(size=(16, 8)).astype(np.float32),
        "esm.encoder.layer.0.attention.self.query.weight": rng.normal(size=(8, 8)).astype(np.float32),
        "esm.encoder.layer.1.attention.self.query.weight": rng.normal(size=(8, 8)).astype(np.float32),
        "esm.encoder.emb_layer_norm_after.weight": np.ones(8, np.float32),
        "esm.encoder.emb_layer_norm_after.bias": np.zeros(8, np.float32),
    }
    params = import_with_map(state, NT_V2_RULES)
    assert params["embed"]["embedding"].shape == (16, 8)
    assert params["layers"]["attn"]["q"]["kernel"].shape == (2, 8, 8)
    np.testing.assert_array_equal(
        params["layers"]["attn"]["q"]["kernel"][1],
        state["esm.encoder.layer.1.attention.self.query.weight"].T)
