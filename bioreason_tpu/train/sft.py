"""SFT trainer: LoRA fine-tuning of the fusion model under pjit.

Rebuilds the reference `DNALLMFineTuner` Lightning module
(train_dna_qwen.py:45-411) as one jitted, donated, mesh-sharded train step:

  * LoRA over the text tower (all linear layers, lm_head/embeds excluded),
    frozen DNA tower, trainable projection (reference :136-177);
  * AdamW + cosine 10%-warmup + clip 1.0 (reference :393-411, :1002);
  * bf16 compute / fp32 master params;
  * DDP / ZeRO-2 (reference :989-1005 + ds_config_stage2.json) realized as:
    params replicated over 'data' (sharded over 'fsdp'/'model' per the
    partition rules), optimizer state sharded over 'data' (zero2 specs) —
    XLA emits the reduce-scatter/all-gather that DeepSpeed does by hand.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bioreason_tpu.config import FusionConfig, SFTConfig, MeshConfig
from bioreason_tpu.models.fusion import init_fusion, fusion_forward, validate_splice
from bioreason_tpu.parallel.mesh import make_mesh
from bioreason_tpu.parallel.partition import (
    partition_rules_fusion, shardings_for_params, batch_spec, zero2_sharding,
    _valid_spec)
from bioreason_tpu.train import trainable as T
from bioreason_tpu.train.lora import attach_lora
from bioreason_tpu.train.optim import make_optimizer

BATCH_KEYS = ("input_ids", "attention_mask", "dna_input_ids", "dna_attention_mask",
              "label_positions", "label_targets", "label_valid")


class SFTTrainer:
    def __init__(self, fusion_cfg: FusionConfig, cfg: SFTConfig,
                 mesh: Optional[Mesh] = None, params: Optional[Dict] = None,
                 rng: Optional[jax.Array] = None):
        self.fusion_cfg = fusion_cfg
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(MeshConfig())
        rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)

        self._sp_mesh = None
        if (str(fusion_cfg.encoder.attention_impl).startswith("sp")
                or (fusion_cfg.hyena is not None
                    and str(fusion_cfg.hyena.attention_impl).startswith("sp"))):
            # long-DNA sequence parallelism (parallel/sp.py + sp_hyena.py):
            # THIS trainer's mesh is activated only for the dynamic extent of
            # its own step calls (parallel.sp.sequence_sharding scope), so a
            # second trainer/mesh in the same process can't cross-trace
            self._sp_mesh = self.mesh

        if params is None:
            params = init_fusion(rng, fusion_cfg)
        if cfg.lora is not None:
            params = attach_lora(jax.random.fold_in(rng, 1), params, cfg.lora)
            trainable_regex = T.LORA_TRAINABLE
        else:
            trainable_regex = T.FULL_FINETUNE
        if not cfg.freeze_encoder:
            trainable_regex = f"({trainable_regex})|(^encoder/)"

        if cfg.frozen_dtype == "int8":
            # QLoRA-style int8 storage for the frozen towers (train/quant.py):
            # adapters stay fp32 and attach above; kernels become
            # {q, scale} subtrees dequantized inside the layer scan
            if cfg.lora is None or not cfg.freeze_encoder:
                raise ValueError("frozen_dtype='int8' requires LoRA with a "
                                 "frozen encoder (quantized weights don't train)")
            from bioreason_tpu.train.quant import quantize_frozen_int8
            params = quantize_frozen_int8(params)

        self._pp = cfg.pp_micro > 0 and self.mesh.shape.get("model", 1) > 1
        if cfg.pp_micro > 0 and cfg.frozen_dtype == "int8":
            raise ValueError("pp_micro with int8 frozen weights is untested; "
                             "use bf16 frozen weights under PP")
        rules = partition_rules_fusion(pp=self._pp)
        params = jax.device_put(params, shardings_for_params(params, rules, self.mesh))

        self.partition = T.make_partition(params, trainable_regex)
        self.train_leaves, self.frozen_leaves = T.split(self.partition, params)
        if cfg.frozen_dtype:
            # frozen leaves carry no optimizer state and are cast to compute
            # dtype every step anyway — store them directly in that dtype
            # (halves base-model HBM vs fp32 masters). In int8 mode the
            # quantized kernels are already int8; the remaining float leaves
            # (embedding, norms, quant scales) go to bf16.
            fd = jnp.dtype("bfloat16" if cfg.frozen_dtype == "int8"
                           else cfg.frozen_dtype)
            self.frozen_leaves = [
                l.astype(fd) if (hasattr(l, "dtype") and l.dtype == jnp.float32
                                 and l.ndim >= 2) else l
                for l in self.frozen_leaves]

        self.tx, self.schedule = make_optimizer(cfg.optim)
        if cfg.grad_accum_steps > 1:
            # gradient accumulation (reference accumulate_grad_batches,
            # train_dna_qwen.py:1001): optimizer applies every N micro-steps
            self.tx = optax.MultiSteps(self.tx, cfg.grad_accum_steps)
        opt_shapes = jax.eval_shape(self.tx.init, self.train_leaves)
        opt_shardings = jax.tree.map(lambda s: zero2_sharding(s, self.mesh), opt_shapes)
        self.opt_state = jax.jit(self.tx.init, out_shardings=opt_shardings)(self.train_leaves)

        self.step = 0
        self._rng = jax.random.fold_in(rng, 2)     # per-step lora-dropout keys
        self._jit_step = jax.jit(self._train_step, donate_argnums=(0, 2))
        self._jit_eval = jax.jit(self._eval_step)

    # ------------------------------------------------------------------

    def _train_step(self, train_leaves, frozen_leaves, opt_state, batch, rng):
        lora_rate = self.cfg.lora.dropout if self.cfg.lora is not None else 0.0

        def loss_fn(train):
            params = T.combine(self.partition, train, frozen_leaves)
            _, loss = fusion_forward(
                params, self.fusion_cfg,
                batch["input_ids"], batch["attention_mask"],
                batch.get("dna_input_ids"), batch.get("dna_attention_mask"),
                label_positions=batch["label_positions"],
                label_targets=batch["label_targets"],
                label_valid=batch["label_valid"],
                train_encoder=not self.cfg.freeze_encoder,
                train_embeddings=self.cfg.lora is None,
                lora_dropout_rng=rng if lora_rate > 0.0 else None,
                lora_dropout_rate=lora_rate,
                focal_gamma=self.cfg.focal_gamma)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(train_leaves)
        updates, opt_state = self.tx.update(grads, opt_state, train_leaves)
        train_leaves = optax.apply_updates(train_leaves, updates)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return train_leaves, opt_state, metrics

    def _eval_step(self, train_leaves, frozen_leaves, batch):
        params = T.combine(self.partition, train_leaves, frozen_leaves)
        _, loss = fusion_forward(
            params, self.fusion_cfg,
            batch["input_ids"], batch["attention_mask"],
            batch.get("dna_input_ids"), batch.get("dna_attention_mask"),
            label_positions=batch["label_positions"],
            label_targets=batch["label_targets"],
            label_valid=batch["label_valid"])
        return loss

    def _device_batch(self, batch: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
        validate_splice(batch["input_ids"], batch.get("dna_input_ids"),
                        self.fusion_cfg.dna_pad_token_id)
        if "label_positions" not in batch:
            # compress labels to supervised positions host-side: the 151936-
            # vocab head then runs on ~1/6 of the padded width at identical
            # loss (ops/fused_ce.py:gather_label_positions)
            from bioreason_tpu.ops.fused_ce import gather_label_positions
            pos, tgt, val = gather_label_positions(batch["labels"])
            batch = {**batch, "label_positions": pos, "label_targets": tgt,
                     "label_valid": val}
        from bioreason_tpu.parallel.sp import sequence_sharding_enabled, sequence_spec
        out = {}
        for k in BATCH_KEYS:
            v = batch.get(k)
            if v is None:
                continue
            arr = np.asarray(v)
            if k == "dna_input_ids":
                # under sequence parallelism the DNA token axis is sharded
                # so encoder activations scale as S/n per device
                spec = (sequence_spec() if sequence_sharding_enabled()
                        and arr.ndim == 2 else P())
            elif k == "dna_attention_mask":
                # REPLICATED, even under SP: the mask has two consumers with
                # conflicting layouts (the batch-parallel splice count and
                # the sequence-sharded attention/conv masks). Feeding it
                # pre-sharded on the sequence axis made the GSPMD partitioner
                # emit an involuntary-full-rematerialization transform
                # (spmd_partitioner.cc:652); from replicated every consumer
                # reshards with a free local slice. The mask is [rows, S]
                # int32 — replication is noise next to the activations.
                spec = P()
            else:
                spec = batch_spec()
            spec = _valid_spec(spec, arr.shape, self.mesh)
            out[k] = jax.device_put(arr, NamedSharding(self.mesh, spec))
        return out

    # ------------------------------------------------------------------

    def _sp_scope(self):
        from bioreason_tpu.parallel.sp import sequence_sharding
        return sequence_sharding(self._sp_mesh)

    def _pp_scope(self):
        from bioreason_tpu.parallel.pp import pipeline_sharding
        return pipeline_sharding(self.mesh if self._pp else None,
                                 n_micro=self.cfg.pp_micro)

    def train_step(self, batch: Dict[str, Any]) -> Dict[str, float]:
        with self._sp_scope(), self._pp_scope():
            db = self._device_batch(batch)
            self._rng, step_rng = jax.random.split(self._rng)
            self.train_leaves, self.opt_state, metrics = self._jit_step(
                self.train_leaves, self.frozen_leaves, self.opt_state, db,
                step_rng)
        self.step += 1
        metrics = {k: float(v) for k, v in metrics.items()}
        metrics["lr"] = float(self.schedule(self.step))
        return metrics

    def eval_step(self, batch: Dict[str, Any]) -> float:
        with self._sp_scope(), self._pp_scope():
            db = self._device_batch(batch)
            return float(self._jit_eval(self.train_leaves, self.frozen_leaves,
                                        db))

    @property
    def params(self) -> Dict:
        """Full (reassembled) parameter tree."""
        return T.combine(self.partition, self.train_leaves, self.frozen_leaves)

    # -- resume (reference: manual Lightning ckpt_path resume,
    #    train_dna_qwen.py:975-982; here params + optimizer + step) ---------

    def save(self, path: str, extra_metadata: Optional[Dict] = None,
             block: bool = True, params_only: bool = False):
        """block=False hands the write to a background AsyncSaver: the loop
        only pays for an on-device snapshot copy (donation-safe); call
        `finish_saves()` (or the next save) to join.

        params_only=True drops the optimizer state (keeps the {'params': …}
        wrapper so load_checkpoint's full-state unwrap still applies) — for
        best-k retention checkpoints, which only ever feed evals or the
        GRPO stage (fresh optimizer): at 0.6B full-finetune this is 2.6 GB
        instead of 7.8 GB per blocking orbax write on the single host core
        (r5: the full-state writes were the SFT wall)."""
        from bioreason_tpu.train.checkpoint import AsyncSaver, save_checkpoint
        state = ({"params": self.params} if params_only
                 else {"params": self.params, "opt_state": self.opt_state})
        if block:
            save_checkpoint(path, state, step=self.step, stage="sft",
                            extra_metadata=extra_metadata)
            return
        if not hasattr(self, "_async_saver"):
            self._async_saver = AsyncSaver()
        self._async_saver.save(path, state, step=self.step, stage="sft",
                               extra_metadata=extra_metadata)

    def finish_saves(self):
        if hasattr(self, "_async_saver"):
            self._async_saver.wait()

    def restore(self, path: str) -> "SFTTrainer":
        from bioreason_tpu.train.checkpoint import load_checkpoint, load_metadata
        state = load_checkpoint(path, like={"params": self.params,
                                           "opt_state": self.opt_state})
        train, frozen = T.split(self.partition, state["params"])
        self.train_leaves, self.frozen_leaves = train, frozen
        self.opt_state = jax.tree.map(
            lambda like, new: jnp.asarray(new),
            self.opt_state, state["opt_state"])
        self.step = int(load_metadata(path).get("step", 0))
        return self
