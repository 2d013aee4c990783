"""CLI smoke tests (slow; enable with BIOREASON_SLOW=1).

In-process invocations of the three entry points on tiny configs, covering
the dataset_type variants and the LLM-only mode.
"""

import os

import pytest

pytestmark = pytest.mark.skipif(not os.environ.get("BIOREASON_SLOW"),
                                reason="slow: set BIOREASON_SLOW=1")

COMMON = ["--decoder", "tiny", "--encoder", "tiny", "--cpu_devices", "8",
          "--batch_size", "2", "--max_length_dna", "64", "--max_steps", "2",
          "--n_synthetic", "12", "--bucket", "64"]


def test_sft_kegg(tmp_path):
    from bioreason_tpu.cli.train_sft import main
    main(COMMON + ["--checkpoint_dir", str(tmp_path), "--log_dir", str(tmp_path)])


def test_sft_vep_llm_only(tmp_path):
    from bioreason_tpu.cli.train_sft import main
    main(COMMON + ["--dataset_type", "variant_effect_coding", "--llm_only",
                   "--checkpoint_dir", str(tmp_path), "--log_dir", str(tmp_path)])


def test_classifier(tmp_path):
    from bioreason_tpu.cli.train_dna_only import main
    main(["--encoder", "tiny", "--cpu_devices", "8", "--batch_size", "2",
          "--max_length_dna", "64", "--max_steps", "2", "--n_synthetic", "16",
          "--checkpoint_dir", str(tmp_path), "--log_dir", str(tmp_path)])


def test_grpo_with_ignored_vllm_flag(tmp_path):
    from bioreason_tpu.cli.reason import main
    main(COMMON[:2] + ["--encoder", "tiny", "--cpu_devices", "8",
                       "--num_generations", "2", "--batch_size", "4",
                       "--max_steps", "1", "--max_completion_length", "8",
                       "--max_length_dna", "64", "--n_synthetic", "12",
                       "--use_vllm", "true",
                       "--checkpoint_dir", str(tmp_path), "--log_dir", str(tmp_path)])
