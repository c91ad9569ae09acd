"""Orbax async step-checkpoint backend (opt-in; VERDICT r1 item 10 /
ROADMAP #8). The pickle best-model file stays the canonical
serialize.py-readable artifact; Orbax adds async pod-scale step
checkpoints + resume."""

import jax
import numpy as np
import pytest

from nnue_vision_tpu.models.nnue import GridFeatureSet, NNUEConfig, nnue_init
from nnue_vision_tpu.training.checkpoint import OrbaxStepCheckpointer
from nnue_vision_tpu.training.optim import create_optimizer
from nnue_vision_tpu.training.step import make_train_state

CFG = NNUEConfig(feature_set=GridFeatureSet(4, 4), l1_size=16, l2_size=8,
                 l3_size=4, num_classes=3, input_size=16)


class OptCfg:
    learning_rate = 0.01
    weight_decay = 0.0
    momentum = 0.9
    optimizer_type = "sgd"
    max_grad_norm = 1.0
    use_cosine_scheduler = False
    max_epochs = 1
    decay_lr = False
    use_cyclical_lr = False


def test_orbax_roundtrip_preserves_structure(tmp_path):
    optimizer = create_optimizer(OptCfg(), steps_per_epoch=1)
    state = make_train_state(nnue_init(jax.random.PRNGKey(0), CFG), optimizer)

    ck = OrbaxStepCheckpointer(tmp_path / "orbax", max_to_keep=2)
    ck.save(0, params=state.params, opt_state=state.opt_state,
            metadata={"model_type": "nnue", "epoch": 0, "val_f1": 0.5})
    ck.wait()

    restored, meta = ck.restore(
        target={"params": state.params, "opt_state": state.opt_state,
                "batch_stats": None},
    )
    assert meta["model_type"] == "nnue" and meta["epoch"] == 0
    # params bit-identical
    for k in state.params:
        np.testing.assert_array_equal(
            np.asarray(restored["params"][k]), np.asarray(state.params[k])
        )
    # optax structure preserved (NamedTuples, not plain nests)
    assert jax.tree_util.tree_structure(
        restored["opt_state"]
    ) == jax.tree_util.tree_structure(state.opt_state)
    ck.close()


def test_orbax_retention_and_latest(tmp_path):
    optimizer = create_optimizer(OptCfg(), steps_per_epoch=1)
    state = make_train_state(nnue_init(jax.random.PRNGKey(1), CFG), optimizer)
    ck = OrbaxStepCheckpointer(tmp_path / "orbax", max_to_keep=2)
    for step in range(4):
        ck.save(step, params=state.params, metadata={"epoch": step})
    ck.wait()
    assert ck.latest_step() == 3
    steps = sorted(ck.manager.all_steps())
    assert len(steps) <= 2 and steps[-1] == 3  # retention enforced
    ck.close()


def test_orbax_restore_empty_raises(tmp_path):
    ck = OrbaxStepCheckpointer(tmp_path / "orbax")
    with pytest.raises(FileNotFoundError):
        ck.restore()
    ck.close()


def test_train_model_orbax_backend_and_resume(tmp_path, monkeypatch):
    """End-to-end: train 2 epochs with the orbax backend, then re-run with
    resume=True — the second run restores and skips straight past the
    trained epochs (start_epoch == max_epochs → zero train steps)."""
    monkeypatch.setenv("NV_SKIP_ENGINE", "1")
    import nnue_vision_tpu.training.loop as loop_mod

    class Cfg:
        name = "orbax-e2e"
        project_name = "test"
        dataset_name = "synthetic"
        batch_size = 16
        num_workers = 0
        max_epochs = 2
        synthetic_size = 64
        grid_size = 4
        num_features_per_square = 4
        l1_size = 16
        l2_size = 8
        l3_size = 4
        num_classes = 10
        input_size = 32
        learning_rate = 0.005
        weight_decay = 0.0
        momentum = 0.9
        optimizer_type = "sgd"
        max_grad_norm = 1.0
        use_cosine_scheduler = False
        decay_lr = False
        use_cyclical_lr = False
        use_augmentation = False
        augmentation_strength = "light"
        steps_per_dispatch = 2
        keep_alive = True
        log_dir = str(tmp_path)
        seed = 0
        checkpoint_backend = "orbax"
        orbax_dir = str(tmp_path / "orbax")
        resume = False

    assert loop_mod.train_model(Cfg(), "nnue") == 0

    ck = OrbaxStepCheckpointer(tmp_path / "orbax")
    assert ck.latest_step() == 1  # epochs 0 and 1 saved
    ck.close()

    # resume run: must restore epoch 1 and run no further train epochs
    calls = {"scanned": 0, "gathered": 0}
    real_scanned = loop_mod.scanned_train_steps
    real_gathered = loop_mod.gathered_train_step

    def counting_scanned(*a, **kw):
        calls["scanned"] += 1
        return real_scanned(*a, **kw)

    def counting_gathered(*a, **kw):
        calls["gathered"] += 1
        return real_gathered(*a, **kw)

    monkeypatch.setattr(loop_mod, "scanned_train_steps", counting_scanned)
    monkeypatch.setattr(loop_mod, "gathered_train_step", counting_gathered)

    cfg2 = Cfg()
    cfg2.resume = True
    assert loop_mod.train_model(cfg2, "nnue") == 0
    assert calls["scanned"] == 0 and calls["gathered"] == 0, (
        "resume re-ran already-completed epochs"
    )
