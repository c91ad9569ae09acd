"""Training-stack tests: schedules, checkpoints, logging, utils, and a REAL
2-epoch training run (upstream tests/test_actual_training.py analog) with
the engine precompile skipped via NV_SKIP_ENGINE.
"""

import json
import os
from pathlib import Path

import jax
import numpy as np
import pytest

from nnue_vision_tpu.training.checkpoint import (
    CheckpointManager,
    load_checkpoint,
    save_checkpoint,
)
from nnue_vision_tpu.training.logging import Run, early_log, init_run
from nnue_vision_tpu.training.optim import create_optimizer, get_lr
from nnue_vision_tpu.training.utils import (
    check_for_nonfinite,
    check_disk_space,
    generate_run_name,
    get_git_info,
)


class LRCfg:
    learning_rate = 1.0
    warmup_iters = 10
    lr_decay_iters = 110
    min_lr = 0.1
    decay_lr = True
    use_cyclical_lr = False
    cyclical_lr_period = 50
    cyclical_lr_amplitude = 0.1


def test_get_lr_warmup_cosine():
    cfg = LRCfg()
    # 1-based linear warmup
    assert get_lr(0, cfg=cfg) == pytest.approx(0.1)
    assert get_lr(9, cfg=cfg) == pytest.approx(1.0)
    # cosine midpoint: min + 0.5*(max-min)
    assert get_lr(60, cfg=cfg) == pytest.approx(0.55, abs=1e-6)
    # past decay → min_lr
    assert get_lr(200, cfg=cfg) == pytest.approx(0.1)
    # monotone decreasing through the decay phase
    values = [get_lr(i, cfg=cfg) for i in range(10, 111)]
    assert all(a >= b - 1e-12 for a, b in zip(values, values[1:]))


def test_get_lr_cyclical():
    cfg = LRCfg()
    cfg.use_cyclical_lr = True
    cfg.decay_lr = False
    vals = [get_lr(i, cfg=cfg) for i in range(10, 60)]
    assert max(vals) > 1.0  # modulated above base
    assert min(vals) >= cfg.min_lr


def test_create_optimizer_types():
    class Cfg:
        learning_rate = 0.01
        weight_decay = 1e-4
        momentum = 0.9
        optimizer_type = "sgd"
        max_grad_norm = 1.0
        use_cosine_scheduler = True
        max_epochs = 2
        decay_lr = True
        use_cyclical_lr = False

    opt = create_optimizer(Cfg(), steps_per_epoch=5)
    params = {"w": np.ones(3, np.float32)}
    state = opt.init(params)
    grads = {"w": np.full(3, 10.0, np.float32)}  # will be clipped
    updates, _ = opt.update(grads, state, params)
    assert np.all(np.isfinite(np.asarray(updates["w"])))

    Cfg.optimizer_type = "adam"
    opt = create_optimizer(Cfg(), steps_per_epoch=5)
    state = opt.init(params)
    updates, _ = opt.update(grads, state, params)
    assert np.all(np.isfinite(np.asarray(updates["w"])))


def test_checkpoint_roundtrip(tmp_path):
    from nnue_vision_tpu.models.nnue import GridFeatureSet, NNUEConfig, nnue_init

    cfg = NNUEConfig(feature_set=GridFeatureSet(4, 4), l1_size=16, l2_size=8,
                     l3_size=4, num_classes=3, input_size=16)
    params = nnue_init(jax.random.PRNGKey(0), cfg)
    path = tmp_path / "m.ckpt"
    save_checkpoint(path, model_type="nnue", model_config=cfg, params=params,
                    epoch=3, metrics={"val_f1": 0.5})
    payload = load_checkpoint(path)
    assert payload["model_type"] == "nnue"
    assert payload["epoch"] == 3
    assert payload["model_config"]["l1_size"] == 16
    np.testing.assert_array_equal(payload["params"]["ft_w"],
                                  np.asarray(params["ft_w"]))


def test_checkpoint_manager_best_policy(tmp_path):
    from nnue_vision_tpu.models.nnue import GridFeatureSet, NNUEConfig, nnue_init

    cfg = NNUEConfig(feature_set=GridFeatureSet(4, 4), l1_size=16, l2_size=8,
                     l3_size=4, num_classes=3, input_size=16)
    params = nnue_init(jax.random.PRNGKey(0), cfg)
    mgr = CheckpointManager(str(tmp_path), "runA")
    p1 = mgr.save_best(model_type="nnue", model_config=cfg, params=params,
                       epoch=0, metrics={"val_f1": 0.4})
    assert p1 is not None and p1.exists()
    # worse metric → not saved
    assert mgr.save_best(model_type="nnue", model_config=cfg, params=params,
                         epoch=1, metrics={"val_f1": 0.3}) is None
    # better metric → saved
    assert mgr.save_best(model_type="nnue", model_config=cfg, params=params,
                         epoch=2, metrics={"val_f1": 0.6}) is not None
    assert mgr.best_metric == 0.6


def test_local_run_tracker(tmp_path, monkeypatch):
    monkeypatch.delenv("WANDB_API_KEY", raising=False)
    run = Run("test_project", {"a": 1}, log_dir=str(tmp_path))
    run.log({"train/loss": 1.5}, step=0)
    run.log({"train/loss": 1.2}, step=1)
    run.finish()
    lines = [json.loads(l) for l in
             (run.dir / "metrics.jsonl").read_text().splitlines()]
    assert lines[0]["train/loss"] == 1.5 and lines[1]["step"] == 1
    assert (run.dir / "config.json").exists()


def test_early_log_replay(tmp_path, monkeypatch, capsys):
    monkeypatch.delenv("WANDB_API_KEY", raising=False)
    from nnue_vision_tpu.training import logging as logmod

    early_log("before init")
    run = init_run("p", {}, log_dir=str(tmp_path))
    logmod.replay_early_logs()
    run.finish()
    assert "before init" in (run.dir / "log.txt").read_text()


def test_nonfinite_detection():
    good = {"a": np.ones(3, np.float32)}
    assert check_for_nonfinite(good) is None
    bad = {"a": np.array([1.0, np.nan, np.inf], np.float32),
           "b": np.ones(2, np.int32)}
    msg = check_for_nonfinite(bad, where="grads")
    assert msg is not None and "1 NaN" in msg and "1 Inf" in msg
    assert msg.startswith("[grads]")


def test_run_name_and_git_info():
    info = get_git_info()
    assert "commit" in info and "dirty" in info
    name = generate_run_name("nnue", "cfg", note="my note")
    assert name.startswith("nnue-cfg-")
    assert " " not in name


def test_disk_space_check():
    state = check_disk_space()
    assert state["free_gb"] > 0 and state["total_gb"] > 0


def test_actual_training_two_epochs(tmp_path, monkeypatch):
    """Run train_model() for real: 2 epochs, 24 synthetic samples, engine
    precompile skipped (NV_SKIP_ENGINE), local run tracking."""
    monkeypatch.setenv("NV_SKIP_ENGINE", "1")
    monkeypatch.delenv("WANDB_API_KEY", raising=False)
    monkeypatch.chdir(tmp_path)

    from config import load_config
    from nnue_vision_tpu.training.loop import train_model

    repo = Path(__file__).resolve().parent.parent
    cfg = load_config(str(repo / "config" / "train_nnue_test.py"))
    cfg.max_epochs = 2
    cfg.max_samples_per_split = 24
    cfg.log_dir = str(tmp_path / "logs")

    rc = train_model(cfg, "nnue")
    assert rc == 0
    # checkpoints + metrics landed
    ckpts = list((tmp_path / "logs" / "checkpoints").rglob("best_model.ckpt"))
    assert ckpts, "no best checkpoint written"
    metrics_files = list((tmp_path / "logs" / "runs").rglob("metrics.jsonl"))
    assert metrics_files
    records = [json.loads(l) for l in metrics_files[0].read_text().splitlines()]
    keys = {k for r in records for k in r}
    for expected in ("train/loss", "val/f1", "compiled/f1", "test/f1"):
        assert expected in keys, f"missing metric stream {expected}"


def test_training_uses_fused_input_pipeline(tmp_path, monkeypatch, capsys):
    """The flagship production shape (NNUE + light tier + device-resident
    data) must route batches through the fused Pallas input kernel
    (interpret mode on the CPU test platform) and still train: finite
    losses, checkpoints, the fused-pipeline log line."""
    monkeypatch.setenv("NV_SKIP_ENGINE", "1")
    monkeypatch.delenv("WANDB_API_KEY", raising=False)
    monkeypatch.chdir(tmp_path)

    from config import load_config
    from nnue_vision_tpu.training.loop import train_model

    repo = Path(__file__).resolve().parent.parent
    cfg = load_config(str(repo / "config" / "train_nnue_test.py"))
    cfg.max_epochs = 1
    cfg.max_samples_per_split = 32
    cfg.use_augmentation = True
    cfg.augmentation_strength = "light"  # the fused tier
    cfg.steps_per_dispatch = 2  # 8 batches of 4 → scan chunks of 2
    cfg.max_devices = 1  # fused path is the single-device input pipeline
    cfg.log_dir = str(tmp_path / "logs")

    rc = train_model(cfg, "nnue")
    assert rc == 0
    assert "fused input pipeline active" in capsys.readouterr().out
    metrics_files = list((tmp_path / "logs" / "runs").rglob("metrics.jsonl"))
    records = [json.loads(l) for l in metrics_files[0].read_text().splitlines()]
    losses = [r["train/loss"] for r in records if "train/loss" in r]
    assert losses and all(np.isfinite(losses))
