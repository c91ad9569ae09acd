"""Two-phase (progressive) quantization wiring: with ef_warmup_epochs=W the
train loop runs the first W epochs with the CONTINUOUS engine-structured
model (engine_friendly=True, ef_quantizers=False) and the rest with the
quantizers on, sharing params/stats across the switch (VERDICT r1 item 5).
Heavy compute is mocked out — this tests the wiring."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def test_ef_warmup_switches_config(tmp_path, monkeypatch):
    import nnue_vision_tpu.training.loop as loop_mod

    seen_flags = []

    def flag(model_cfg):
        return (model_cfg.engine_friendly, model_cfg.ef_quantizers)

    def fake_scanned(state, di, dl, idx, key, *, model_type, model_cfg,
                     optimizer, strength, augment):
        seen_flags.append(flag(model_cfg))
        k = idx.shape[0]
        return state, {"loss": jnp.ones((k,)), "accuracy": jnp.ones((k,))}

    def fake_gathered(state, di, dl, idx, key, *, model_type, model_cfg,
                      optimizer, strength, augment):
        seen_flags.append(flag(model_cfg))
        return state, {"loss": jnp.ones(()), "accuracy": jnp.ones(())}

    eval_flags = []

    def fake_eval(params, batch_stats, loader, *, model_type, model_cfg):
        eval_flags.append(flag(model_cfg))
        return 1.0, {"f1": 0.5, "acc": 0.5}

    def fake_int8(params, batch_stats, loader, *, model_type, model_cfg,
                  use_pallas=False):
        eval_flags.append(flag(model_cfg))
        return {"f1": 0.5, "acc": 0.5, "ms_per_sample": 0.0,
                "latent_density": 0.0}

    monkeypatch.setenv("NV_SKIP_ENGINE", "1")
    monkeypatch.setattr(loop_mod, "scanned_train_steps", fake_scanned)
    monkeypatch.setattr(loop_mod, "gathered_train_step", fake_gathered)
    monkeypatch.setattr(loop_mod, "train_step", fake_gathered)
    monkeypatch.setattr(loop_mod, "evaluate_model", fake_eval)
    monkeypatch.setattr(loop_mod, "evaluate_int8_sim", fake_int8)

    class Cfg:
        name = "two-phase-test"
        project_name = "test"
        dataset_name = "synthetic"
        batch_size = 8
        num_workers = 0
        max_epochs = 3
        ef_warmup_epochs = 2
        synthetic_size = 32
        etinynet_variant = "micro"
        engine_friendly = True
        num_classes = 10
        input_size = 32
        learning_rate = 0.001
        weight_decay = 0.0
        momentum = 0.9
        optimizer_type = "adam"
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

    assert loop_mod.train_model(Cfg(), "etinynet") == 0

    # 3 epochs × 2 dispatches: epochs 0-1 continuous-ef, epoch 2 quantized;
    # engine structure (engine_friendly) holds for BOTH phases
    warm, quant = (True, False), (True, True)
    assert len(seen_flags) == 6, seen_flags
    assert seen_flags == [warm] * 4 + [quant] * 2
    # per-epoch evals (train+val float, compiled) follow the same schedule
    assert eval_flags[:3] == [warm] * 3
    assert eval_flags[-4:-1] == [quant] * 3  # last epoch's evals (+ final test)


def test_continuous_ef_shares_pytree_with_quantized(rng):
    """The warmup function and the quantized function must share params and
    batch_stats structure exactly — the mid-run switch is a config swap."""
    from nnue_vision_tpu.models.etinynet import (
        EtinyNetConfig, etinynet_apply, etinynet_init,
    )

    qcfg = EtinyNetConfig(variant="micro", num_classes=4, input_size=32,
                          engine_friendly=True)
    wcfg = dataclasses.replace(qcfg, ef_quantizers=False)
    params, stats = etinynet_init(jax.random.PRNGKey(0), qcfg)
    x = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))

    logits_w, ns_w = etinynet_apply(params, stats, x, wcfg, train=True)
    logits_q, ns_q = etinynet_apply(params, stats, x, qcfg, train=True)
    assert (jax.tree_util.tree_structure(ns_w)
            == jax.tree_util.tree_structure(ns_q))
    # same function family, different values (quantizers round)
    assert logits_w.shape == logits_q.shape
    # the continuous model must be differentiable end to end
    g = jax.grad(
        lambda p: etinynet_apply(p, stats, x, wcfg, train=True)[0].sum()
    )(params)
    assert np.isfinite(float(jax.tree_util.tree_leaves(g)[0].sum()))


def test_ef_warmup_ignored_without_engine_friendly():
    """ef_warmup_epochs on a non-ef config must be a no-op (cfg_for
    always returns the original config)."""
    from nnue_vision_tpu.models.etinynet import EtinyNetConfig

    cfg = EtinyNetConfig(variant="micro", engine_friendly=True)
    warm = dataclasses.replace(cfg, ef_quantizers=False)
    assert warm.ef_quantizers is False and cfg.ef_quantizers is True
    assert warm.variant == cfg.variant


def test_nnue_qat_warmup_switches_rounding(tmp_path, monkeypatch):
    """With qat=True and ef_warmup_epochs=W, NNUE trains the first W epochs
    with qat_rounding=False (clamped continuous model) and the rest with
    full fake-quant; the optimizer restarts at the switch."""
    import nnue_vision_tpu.training.loop as loop_mod

    seen = []

    def flag(model_cfg):
        return (model_cfg.qat, model_cfg.qat_rounding)

    def fake_scanned(state, di, dl, idx, key, *, model_type, model_cfg,
                     optimizer, strength, augment):
        seen.append(flag(model_cfg))
        k = idx.shape[0]
        return state, {"loss": jnp.ones((k,)), "accuracy": jnp.ones((k,))}

    def fake_gathered(state, di, dl, idx, key, *, model_type, model_cfg,
                      optimizer, strength, augment):
        seen.append(flag(model_cfg))
        return state, {"loss": jnp.ones(()), "accuracy": jnp.ones(())}

    def fake_eval(params, batch_stats, loader, *, model_type, model_cfg):
        return 1.0, {"f1": 0.5, "acc": 0.5}

    def fake_int8(params, batch_stats, loader, *, model_type, model_cfg,
                  use_pallas=False):
        return {"f1": 0.5, "acc": 0.5, "ms_per_sample": 0.0,
                "latent_density": 0.0}

    monkeypatch.setenv("NV_SKIP_ENGINE", "1")
    monkeypatch.setattr(loop_mod, "scanned_train_steps", fake_scanned)
    monkeypatch.setattr(loop_mod, "gathered_train_step", fake_gathered)
    monkeypatch.setattr(loop_mod, "train_step", fake_gathered)
    monkeypatch.setattr(loop_mod, "evaluate_model", fake_eval)
    monkeypatch.setattr(loop_mod, "evaluate_int8_sim", fake_int8)

    class Cfg:
        name = "nnue-two-phase-test"
        project_name = "test"
        dataset_name = "synthetic"
        batch_size = 8
        num_workers = 0
        max_epochs = 3
        ef_warmup_epochs = 2
        synthetic_size = 32
        qat = True
        grid_size = 4
        num_features_per_square = 4
        l1_size = 16
        l2_size = 8
        l3_size = 4
        num_classes = 10
        input_size = 32
        learning_rate = 0.001
        weight_decay = 0.0
        momentum = 0.9
        optimizer_type = "adam"
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

    assert loop_mod.train_model(Cfg(), "nnue") == 0
    warm, quant = (True, False), (True, True)
    assert len(seen) == 6, seen
    assert seen == [warm] * 4 + [quant] * 2


def test_nnue_qat_rounding_off_is_continuous(rng):
    """qat_rounding=False keeps the clamp ranges but removes the rounding:
    the function is continuous in the weights (distinct nearby weights give
    distinct outputs) while full QAT snaps them to the 1/64 grid."""
    from nnue_vision_tpu.models.nnue import (
        GridFeatureSet, NNUEConfig, nnue_apply, nnue_init,
    )

    cfg = NNUEConfig(feature_set=GridFeatureSet(4, 4), l1_size=16,
                     l2_size=8, l3_size=4, num_classes=3, input_size=12,
                     qat=True)
    wcfg = dataclasses.replace(cfg, qat_rounding=False)
    params = nnue_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.random((4, 12, 12, 3), dtype=np.float32))

    # a sub-1/128 weight nudge is invisible to the rounding but not to the
    # continuous warmup model
    p2 = dict(params)
    p2["out_b"] = params["out_b"] + 1e-4
    q1, q2 = nnue_apply(params, x, cfg), nnue_apply(p2, x, cfg)
    w1, w2 = nnue_apply(params, x, wcfg), nnue_apply(p2, x, wcfg)
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))
    assert not np.array_equal(np.asarray(w1), np.asarray(w2))
