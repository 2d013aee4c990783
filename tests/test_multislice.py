"""Multi-slice (pod) mesh recipe: data over DCN, fsdp/model inside a slice.

No multi-slice hardware exists here, so the slice-major layout is exercised
by partitioning the 8 virtual CPU devices into fake 'slices' via the
injectable slice_key (parallel/mesh.py:make_multislice_mesh) and running a
real sharded computation + SFT step on the resulting mesh. The grouping
itself (slice_index attr on real TPU slices) is the only untested line.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bioreason_tpu.config import (FusionConfig, LoRAConfig, MeshConfig,
                                  OptimConfig, SFTConfig)
from bioreason_tpu.parallel import make_multislice_mesh
from bioreason_tpu.parallel.partition import batch_spec


def _fake_two_slices():
    devs = jax.devices()
    ids = {d.id: i for i, d in enumerate(devs)}
    # first half of the devices = "slice 0", second half = "slice 1"
    return make_multislice_mesh(MeshConfig(fsdp=2, model=1), devices=devs,
                                slice_key=lambda d: ids[d.id] >= len(devs) // 2)


class TestMultisliceMesh:
    def test_layout_slice_major(self):
        mesh = _fake_two_slices()
        assert dict(mesh.shape) == {"data": 4, "fsdp": 2, "model": 1}
        # leading data axis is slice-major: first two rows from slice 0
        flat = mesh.devices.reshape(4, 2)
        first_half = {d.id for d in flat[:2].ravel()}
        assert first_half == {d.id for d in jax.devices()[:4]}

    def test_sharded_reduction_runs(self):
        mesh = _fake_two_slices()
        from jax.sharding import NamedSharding
        x = np.arange(32, dtype=np.float32).reshape(8, 4)
        xs = jax.device_put(x, NamedSharding(mesh, batch_spec()))
        got = jax.jit(lambda a: a.sum())(xs)
        assert float(got) == x.sum()

    def test_sft_step_on_multislice_mesh(self):
        from bioreason_tpu.data import BioProcessor, ByteTextTokenizer, KmerTokenizer
        from bioreason_tpu.data.collate import sft_collate
        from bioreason_tpu.data.kegg import (format_kegg_for_dna_llm,
                                             synthetic_kegg_items)
        from bioreason_tpu.train.sft import SFTTrainer

        tok = ByteTextTokenizer()
        proc = BioProcessor(tok, KmerTokenizer())
        mesh = _fake_two_slices()
        fusion = FusionConfig.tiny(text_vocab=tok.vocab_size,
                                   dna_pad_token_id=tok.dna_pad_id)
        cfg = SFTConfig(batch_size=8, max_length_dna=64,
                        optim=OptimConfig(total_steps=4),
                        lora=LoRAConfig(r=4, alpha=8))
        trainer = SFTTrainer(fusion, cfg, mesh=mesh)
        items = [format_kegg_for_dna_llm(it)
                 for it in synthetic_kegg_items(8, seq_len=48, seed=0)]
        batch = sft_collate(items, proc, max_length_text=512, max_length_dna=64)
        m = trainer.train_step(batch)
        assert np.isfinite(m["loss"])
