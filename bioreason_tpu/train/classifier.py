"""DNA-only classifier trainer (reference: train_dna_only.py:22-270).

CE loss over ref/alt sequence pairs; two learning-rate groups (classifier lr,
encoder at 0.1x — reference :226-270); `train_just_classifier` freezes the
encoder entirely (reference dna_only.py:133). Inline accuracy/P/R/F1 (macro)
per step mirror the reference's logged metrics (:96-191).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding

from bioreason_tpu.config import EncoderConfig, MeshConfig, OptimConfig
from bioreason_tpu.models.classifier import init_classifier, classifier_forward
from bioreason_tpu.parallel.mesh import make_mesh
from bioreason_tpu.parallel.partition import (partition_rules_encoder,
                                              shardings_for_params, batch_spec,
                                              _valid_spec)
from bioreason_tpu.train import trainable as T
from bioreason_tpu.train.optim import make_optimizer


def multiclass_prf(preds: np.ndarray, labels: np.ndarray, num_classes: int):
    """Macro precision/recall/F1 + accuracy."""
    precisions, recalls, f1s = [], [], []
    for c in range(num_classes):
        tp = int(((preds == c) & (labels == c)).sum())
        fp = int(((preds == c) & (labels != c)).sum())
        fn = int(((preds != c) & (labels == c)).sum())
        p = tp / max(tp + fp, 1)
        r = tp / max(tp + fn, 1)
        precisions.append(p)
        recalls.append(r)
        f1s.append(2 * p * r / max(p + r, 1e-8))
    acc = float((preds == labels).mean()) if len(labels) else 0.0
    return {"accuracy": acc, "precision": float(np.mean(precisions)),
            "recall": float(np.mean(recalls)), "f1": float(np.mean(f1s))}


class ClassifierTrainer:
    def __init__(self, cfg: EncoderConfig, num_classes: int,
                 optim: OptimConfig = OptimConfig(learning_rate=1e-3),
                 train_just_classifier: bool = True,
                 encoder_lr_scale: float = 0.1,
                 mesh: Optional[Mesh] = None, params: Optional[Dict] = None,
                 rng: Optional[jax.Array] = None, seed: int = 0):
        self.cfg = cfg
        self.num_classes = num_classes
        self.train_just_classifier = train_just_classifier
        self.mesh = mesh if mesh is not None else make_mesh(MeshConfig())
        rng = rng if rng is not None else jax.random.PRNGKey(seed)
        if params is None:
            params = init_classifier(rng, cfg, num_classes)
        rules = [(r"^encoder/" + pat, spec) for pat, spec in partition_rules_encoder()]
        params = jax.device_put(params, shardings_for_params(params, rules, self.mesh))

        regex = T.CLASSIFIER_HEAD if train_just_classifier else r".*"
        self.partition = T.make_partition(params, regex)
        self.train_leaves, self.frozen_leaves = T.split(self.partition, params)

        self.tx, self.schedule = make_optimizer(optim)
        if not train_just_classifier:
            # two-group lr: encoder updates scaled by encoder_lr_scale
            paths = T.trainable_paths(self.partition)
            scale_leaves = [encoder_lr_scale if p.startswith("encoder") else 1.0
                            for p in paths]
            base_tx = self.tx
            scaler = optax.masked(
                optax.scale(encoder_lr_scale),
                [s != 1.0 for s in scale_leaves])
            self.tx = optax.chain(base_tx, scaler)
        self.opt_state = self.tx.init(self.train_leaves)

        self.step_count = 0
        self._jit_step = jax.jit(self._train_step, donate_argnums=(0, 2))
        self._jit_eval = jax.jit(self._eval_step)

    def _loss(self, params, batch):
        logits = classifier_forward(
            params, self.cfg, batch["ref_ids"], batch["alt_ids"],
            batch["ref_attention_mask"], batch["alt_attention_mask"],
            train_encoder=not self.train_just_classifier)
        onehot = jax.nn.one_hot(batch["labels"], self.num_classes)
        loss = optax.softmax_cross_entropy(logits, onehot).mean()
        return loss, logits

    def _train_step(self, train_leaves, frozen_leaves, opt_state, batch):
        def loss_fn(train):
            params = T.combine(self.partition, train, frozen_leaves)
            return self._loss(params, batch)
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(train_leaves)
        updates, opt_state = self.tx.update(grads, opt_state, train_leaves)
        train_leaves = optax.apply_updates(train_leaves, updates)
        return train_leaves, opt_state, loss, jnp.argmax(logits, -1)

    def _eval_step(self, train_leaves, frozen_leaves, batch):
        params = T.combine(self.partition, train_leaves, frozen_leaves)
        loss, logits = self._loss(params, batch)
        return loss, jnp.argmax(logits, -1)

    def _put(self, batch):
        out = {}
        for k, v in batch.items():
            arr = np.asarray(v)
            spec = _valid_spec(batch_spec(), arr.shape, self.mesh)
            out[k] = jax.device_put(arr, NamedSharding(self.mesh, spec))
        return out

    def train_step(self, batch: Dict[str, Any]) -> Dict[str, float]:
        db = self._put(batch)
        self.train_leaves, self.opt_state, loss, preds = self._jit_step(
            self.train_leaves, self.frozen_leaves, self.opt_state, db)
        self.step_count += 1
        m = multiclass_prf(np.asarray(preds), np.asarray(batch["labels"]), self.num_classes)
        m["loss"] = float(loss)
        return m

    def eval_step(self, batch: Dict[str, Any]) -> Dict[str, float]:
        db = self._put(batch)
        loss, preds = self._jit_eval(self.train_leaves, self.frozen_leaves, db)
        m = multiclass_prf(np.asarray(preds), np.asarray(batch["labels"]), self.num_classes)
        m["loss"] = float(loss)
        return m

    @property
    def params(self) -> Dict:
        return T.combine(self.partition, self.train_leaves, self.frozen_leaves)
