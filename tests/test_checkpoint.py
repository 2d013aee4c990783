"""Checkpoint subsystem: top-k retention + async-save failure surfacing.

Reference parity: Lightning ModelCheckpoint(save_top_k=2,
monitor='val_loss_epoch', save_last=True) (train_dna_qwen.py:962-971).
"""

import os

import numpy as np
import pytest

from bioreason_tpu.train.checkpoint import (AsyncSaver, TopKKeeper,
                                            load_checkpoint, save_checkpoint)


class TestTopKKeeper:
    def _save_fn(self, payload):
        def fn(path):
            os.makedirs(path, exist_ok=True)
            with open(os.path.join(path, "v.txt"), "w") as f:
                f.write(str(payload))
        return fn

    def test_keeps_best_k_prunes_worse(self, tmp_path):
        keeper = TopKKeeper(str(tmp_path / "best"), k=2)
        assert keeper.update(3.0, self._save_fn("a"), step=1)
        assert keeper.update(1.0, self._save_fn("b"), step=2)
        # 2.0 beats 3.0 -> replaces it
        assert keeper.update(2.0, self._save_fn("c"), step=3)
        # 5.0 is worse than both kept -> nothing written
        assert keeper.update(5.0, self._save_fn("d"), step=4) is None
        kept = sorted(os.listdir(tmp_path / "best"))
        assert kept == ["best-step2", "best-step3", "index.json"]
        assert keeper.best_path().endswith("best-step2")

    def test_max_mode(self, tmp_path):
        keeper = TopKKeeper(str(tmp_path / "best"), k=1, mode="max")
        keeper.update(0.5, self._save_fn("a"), step=1)
        keeper.update(0.9, self._save_fn("b"), step=2)
        assert keeper.update(0.1, self._save_fn("c"), step=3) is None
        assert keeper.best_path().endswith("best-step2")

    def test_survives_restart(self, tmp_path):
        root = str(tmp_path / "best")
        k1 = TopKKeeper(root, k=2)
        k1.update(3.0, self._save_fn("a"), step=1)
        k1.update(1.0, self._save_fn("b"), step=2)
        k2 = TopKKeeper(root, k=2)            # new process resumes the index
        assert k2.best_path().endswith("best-step2")
        k2.update(0.5, self._save_fn("c"), step=9)
        assert sorted(os.listdir(root)) == ["best-step2", "best-step9",
                                            "index.json"]


class TestAsyncSaver:
    def test_roundtrip(self, tmp_path):
        params = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
        s = AsyncSaver()
        s.save(str(tmp_path / "ck"), params, step=3)
        s.wait()
        back = load_checkpoint(str(tmp_path / "ck"), like=params)
        np.testing.assert_array_equal(back["w"], params["w"])

    def test_background_failure_surfaces(self, tmp_path):
        """A failed background write must raise at the next wait()/save()
        instead of silently dropping the checkpoint (ADVICE r2)."""
        target = tmp_path / "blocked"
        target.write_text("a file where a directory must go")
        s = AsyncSaver()
        s.save(str(target), {"w": np.zeros(2)}, step=1)
        with pytest.raises(RuntimeError, match="async checkpoint save failed"):
            s.wait()
        # the error is consumed: the saver is reusable afterwards
        s.save(str(tmp_path / "ok"), {"w": np.zeros(2)}, step=2)
        s.wait()


class TestFullStateUnwrap:
    def test_bare_params_from_full_state(self, tmp_path):
        """trainer.save writes FULL state ({params, opt_state}); the best-k
        and --save_every checkpoints therefore carry that wrapper. Reading
        one with a bare params `like` (generative eval of a best-k
        checkpoint, cli/reason.py --sft_checkpoint handoff) must unwrap the
        params subtree instead of raising a structure mismatch."""
        params = {"decoder": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}}
        full = {"params": params,
                "opt_state": {"mu": np.ones((2, 3), np.float32)}}
        save_checkpoint(str(tmp_path / "ck"), full, step=5, stage="sft")
        back = load_checkpoint(str(tmp_path / "ck"), like=params)
        assert set(back.keys()) == {"decoder"}
        np.testing.assert_array_equal(back["decoder"]["w"],
                                      params["decoder"]["w"])

    def test_missing_leaves_raise_for_fallback(self, tmp_path):
        """If `like` carries leaves the full-state file lacks (LoRA abstract
        vs a full-finetune checkpoint), the unwrap path must raise so callers
        can fall back to the right `like` (cli/reason.py try/except)."""
        params = {"decoder": {"w": np.ones((2, 2), np.float32)}}
        full = {"params": params, "opt_state": {"mu": np.ones(2, np.float32)}}
        save_checkpoint(str(tmp_path / "ck"), full, step=1, stage="sft")
        like = {"decoder": {"w": np.ones((2, 2), np.float32),
                            "lora_a": np.ones((2, 1), np.float32)}}
        with pytest.raises(Exception):
            load_checkpoint(str(tmp_path / "ck"), like=like)
