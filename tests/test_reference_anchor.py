"""Staging tests for the cross-framework accuracy anchor harness
(scripts/reference_anchor.py). Gated on the reference checkout being
present (this host mounts it at /root/reference; NV_REFERENCE_DIR
overrides). --prepare-only exercises everything except the actual
torch training: the scratch staging, the dependency stand-ins, the
exported CIFAR-format batches, the generated config/runner, and — for
the etinynet cell — the surgical dedent of the upstream duplicate-target
crash (reference evaluate.py etinynet branch), whose pattern guard must
fail loudly if the upstream layout ever changes."""

import os
import pickle
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path(os.environ.get("NV_REFERENCE_DIR", "/root/reference"))

pytestmark = pytest.mark.skipif(
    not (REFERENCE / "train.py").exists(),
    reason="reference checkout not present",
)


def _prepare(tmp_path, *args):
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "reference_anchor.py"),
         "--workdir", str(tmp_path / "anchor"), "--prepare-only",
         "--train-size", "128", "--test-size", "64", *args],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    return tmp_path / "anchor", out.stdout


def test_prepare_nnue_cell(tmp_path):
    workdir, stdout = _prepare(tmp_path, "--optimizer", "adam")
    cfg = (workdir / "config" / "train_anchor.py").read_text()
    assert 'optimizer_type = "adam"' in cfg
    assert "learning_rate = 0.001" in cfg
    assert 'train_model(cfg, "nnue")' in (
        workdir / "run_anchor_train.py").read_text()
    # the exported batches are genuine CIFAR pickle layout
    with open(workdir / "data" / "raw" / "cifar-10-batches-py"
              / "data_batch_1", "rb") as f:
        batch = pickle.load(f)
    assert batch[b"data"].shape[1] == 3072
    # stand-ins staged
    for dep in ("wandb.py", "albumentations/__init__.py",
                "torchvision/datasets.py", "nnue_runpod_service.py"):
        assert (workdir / dep).exists(), dep
    # nnue cell must NOT patch the reference
    assert (workdir / "evaluate.py").read_text() == (
        REFERENCE / "evaluate.py").read_text()


def test_prepare_etinynet_cell_patches_eval_bug(tmp_path):
    workdir, stdout = _prepare(
        tmp_path, "--model", "etinynet", "--variant", "0.75")
    assert "patched staged evaluate.py" in stdout
    cfg = (workdir / "config" / "train_anchor.py").read_text()
    assert 'etinynet_variant = "0.75"' in cfg
    assert "learning_rate = 0.1" in cfg
    assert 'train_model(cfg, "etinynet")' in (
        workdir / "run_anchor_train.py").read_text()
    staged = (workdir / "evaluate.py").read_text()
    original = (REFERENCE / "evaluate.py").read_text()
    # the nested (per-image) duplicate-target block is gone; the
    # dedented once-per-batch form is present; nothing else changed
    from scripts.reference_anchor import _ETINY_EVAL_BUG

    assert _ETINY_EVAL_BUG in original, (
        "upstream layout changed — patch guard must be re-derived"
    )
    assert _ETINY_EVAL_BUG not in staged
    dedented = "\n".join(
        line[4:] if line.strip() else line
        for line in _ETINY_EVAL_BUG.split("\n"))
    assert dedented in staged
    assert staged == original.replace(_ETINY_EVAL_BUG, dedented)
