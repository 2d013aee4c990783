"""Regression: every public module must import cleanly FIRST (no circular
package-init dependencies), checked in fresh subprocesses."""

import subprocess
import sys

import pytest

MODULES = [
    "bioreason_tpu.train.grpo",       # engine-first chain (was circular)
    "bioreason_tpu.generate.engine",
    "bioreason_tpu.models",
    "bioreason_tpu.serve",
    "bioreason_tpu.cli.train_sft",
    "bioreason_tpu.cli.reason",
    "bioreason_tpu.cli.train_dna_only",
]


@pytest.mark.parametrize("module", MODULES)
def test_fresh_import(module):
    r = subprocess.run([sys.executable, "-c", f"import {module}"],
                       capture_output=True, text=True, timeout=240)
    assert r.returncode == 0, r.stderr[-800:]
